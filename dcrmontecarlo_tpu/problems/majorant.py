"""Two-level local delta-tracking majorant.

The global majorant ``Problem.sigma_bar`` (reference ``buildModifiedSigma``,
``WoStSolver.py:130-136``) prices EVERY ball in the domain at the worst
``sigma'`` anywhere: on the 1000 m notebook model the air-interface and
anomaly-edge sigmoids set ``sigma_bar ~ 2.8e-3`` — a ~19 m collision mean
free path — while ``sigma'`` is ``~1e-5`` over 93% of the domain, so >99%
of interior events are null collisions and far-field walkers diffuse at
19 m steps instead of flying ballistically.

The fix is a TWO-LEVEL majorant: confine the high-``sigma'`` load inside a
few explicit axis-aligned boxes (plus an optional full-width horizontal
band), with a small ``sigma_bar_bg`` valid everywhere OUTSIDE them. Each
step then chooses, deterministically from the walker position, between

* the full star radius with the global majorant, and
* a radius shrunk to the distance-to-regions with the background majorant
  (the shrunk ball excludes every region, so ``sigma_bar_bg`` bounds
  ``sigma'`` on it),

picking whichever offers more expected progress
``min(radius, 1/sqrt(sigma_bar))``. Both choices are valid delta-tracking
realizations for their ball (the per-step identity holds for any radius
below the star bound, with any ball-wide majorant), so the estimator stays
exactly unbiased — only the step-length distribution changes.

``derive_local_majorant`` builds the regions automatically from the same
coefficient grid scan that prices the global majorant (connected components
of high-load cells -> bounding boxes; components spanning the full width
-> a band), with the same grid-resolution caveat the global scan already
carries.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

__all__ = ["LocalMajorant", "derive_local_majorant"]


@dataclass(frozen=True)
class LocalMajorant:
    """High-``sigma'`` containment regions + the background majorant.

    Attributes:
        boxes: ``((x0, x1, y0, y1), ...)`` axis-aligned boxes — every cell
            whose ``sigma'`` load exceeds the background lies inside one.
        bands: ``((y_lo, y_hi), ...)`` full-width horizontal bands
            (typical for air-interface / layer sigmoids of DCR models);
            kept SEPARATE per layer — merging separated layers into one
            band would cover the gap between them and silently disable
            the far-field speedup exactly on layered-earth geometry.
        sigma_bar_bg: majorant valid at every point outside all regions
            (same ``max - min(min, 0)`` pricing as the global scan).
    """

    boxes: Tuple = ()
    bands: Tuple = ()
    sigma_bar_bg: float = 0.0

    def distance(self, x, y):
        """Distance from ``(x, y)`` to the nearest region (0 inside).

        jnp-traceable and shape-preserving; a handful of selects per
        region, so it unrolls into the fused walker step at register
        cost (no tables, no gathers).
        """
        import jax.numpy as jnp

        d = jnp.full_like(jnp.asarray(x, jnp.float32), 3e38)
        for (x0, x1, y0, y1) in self.boxes:
            dx = jnp.maximum(jnp.maximum(jnp.float32(x0) - x,
                                         x - jnp.float32(x1)), 0.0)
            dy = jnp.maximum(jnp.maximum(jnp.float32(y0) - y,
                                         y - jnp.float32(y1)), 0.0)
            d = jnp.minimum(d, jnp.sqrt(dx * dx + dy * dy))
        for (y_lo, y_hi) in self.bands:
            dd = jnp.maximum(jnp.float32(y_lo) - y, y - jnp.float32(y_hi))
            d = jnp.minimum(d, dd)
        return jnp.maximum(d, 0.0)


def derive_local_majorant(
    values: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    global_sigma_bar: float,
    max_boxes: int = 8,
    margin_cells: float = 1.5,
    band_width_frac: float = 0.85,
    extra_points=None,
) -> Optional[LocalMajorant]:
    """Build containment regions from a ``sigma'`` grid scan.

    Args:
        values: ``(nx, ny)`` grid of ``sigma'`` (non-finite entries are
            treated as maximal load and always contained).
        xs, ys: grid coordinates.
        global_sigma_bar: the already-priced global majorant; used to
            decide whether localization is worth enabling.
        extra_points: optional ``(qx, qy, qv)`` off-grid ``sigma'``
            samples (the extrema-refinement pass of
            ``Problem._refine_sigma_extrema``); those falling OUTSIDE
            the chosen regions tighten the background-majorant pricing
            the same way the refinement tightens the global one — the
            base grid alone aliases shell tails that leak past the box
            margins.

    Returns ``None`` when localization cannot help: load spread evenly,
    regions would cover most of the domain, or the leftover background
    is not materially below the global majorant.
    """
    import scipy.ndimage as ndi

    v = np.asarray(values, np.float64)
    bad = ~np.isfinite(v)
    load = np.abs(np.where(bad, 0.0, v))
    vmax = load.max()
    if not (vmax > 0):
        return None
    dx = abs(xs[1] - xs[0])
    dy = abs(ys[1] - ys[0])
    width = xs[-1] - xs[0]
    mx = margin_cells * dx
    my = margin_cells * dy

    # contain cells carrying more than a few percent of the peak load
    # (plus every non-finite cell); the exact cut only moves work between
    # sigma_bar_bg and region size
    mask = (load > 0.02 * vmax) | bad
    if mask.mean() > 0.5:
        return None  # load everywhere: nothing to localize

    labels, n_comp = ndi.label(mask)
    boxes, bands = [], []
    for i in range(1, n_comp + 1):
        cells = np.argwhere(labels == i)
        x_cells = xs[cells[:, 0]]
        y_cells = ys[cells[:, 1]]
        if (x_cells.max() - x_cells.min()) > band_width_frac * width:
            bands.append((y_cells.min() - my, y_cells.max() + my))
            continue
        boxes.append((float(x_cells.min() - mx), float(x_cells.max() + mx),
                      float(y_cells.min() - my), float(y_cells.max() + my)))
    if len(boxes) > max_boxes:
        # merge into one bounding box rather than give up
        cells = np.argwhere(mask)
        x_cells, y_cells = xs[cells[:, 0]], ys[cells[:, 1]]
        boxes = [(float(x_cells.min() - mx), float(x_cells.max() + mx),
                  float(y_cells.min() - my), float(y_cells.max() + my))]
    out = ~mask
    if not out.any():
        return None
    v_out = v[out]
    bg_mx = float(v_out.max())
    bg_mn = float(v_out.min())
    if extra_points is not None and len(extra_points[0]):
        qx = np.asarray(extra_points[0], np.float64)
        qy = np.asarray(extra_points[1], np.float64)
        qv = np.asarray(extra_points[2], np.float64)
        outside = np.isfinite(qv)
        for (x0, x1, y0, y1) in boxes:
            outside &= ~((qx >= x0) & (qx <= x1) & (qy >= y0) & (qy <= y1))
        for (y_lo, y_hi) in bands:
            outside &= ~((qy >= y_lo) & (qy <= y_hi))
        if outside.any():
            bg_mx = max(bg_mx, float(qv[outside].max()))
            bg_mn = min(bg_mn, float(qv[outside].min()))
    sb_bg = max(bg_mx - min(bg_mn, 0.0), 0.0)
    if sb_bg > 0.5 * global_sigma_bar:
        return None  # background barely below global: not worth the selects
    return LocalMajorant(
        boxes=tuple(boxes),
        bands=tuple((float(b[0]), float(b[1])) for b in bands),
        sigma_bar_bg=sb_bg,
    )
