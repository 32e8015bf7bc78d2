"""Multiple importance sampling combinator (parity with reference C6).

The reference ships an MIS scaffold (``MultipleImportanceSampler2D``,
``solvers/utils.py:220-286``) that the solver never calls; it is kept here
for API parity and future variance-reduction work, rebuilt functionally so
it composes with jit/vmap: distributions are ``(sample_fn, pdf_fn)`` pairs
over the ball radius, and the combiner returns ``(r, index, weight)`` with
the balance heuristic ``w_i = c_i p_i / sum_j c_j p_j``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["RadialDistribution", "uniform_radial", "mis_sample"]


class RadialDistribution(NamedTuple):
    """A radial distribution on the ball of radius R.

    sample: ``(R, u1, u2) -> r``; pdf: ``(r, R) -> density``.
    """

    sample: Callable
    pdf: Callable


def uniform_radial() -> RadialDistribution:
    """Uniform radius on [0, R] (reference ``UniformDistribution2D``,
    ``solvers/utils.py:198-217``)."""
    return RadialDistribution(
        sample=lambda R, u1, u2: u1 * R,
        pdf=lambda r, R: jnp.where((r >= 0) & (r <= R), 1.0 / R, 0.0),
    )


def mis_sample(
    dists: Sequence[RadialDistribution],
    weights: Sequence[float],
    R,
    u_select,
    u1,
    u2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw one radius by MIS over ``dists`` (balance heuristic).

    Batched and branchless: every distribution is sampled, ``u_select``
    picks one per lane, and the balance-heuristic weight
    ``w_i p_i(r) / sum_j w_j p_j(r)`` is computed at the chosen sample
    (reference ``solvers/utils.py:241-286``).

    Returns:
        ``(r, chosen_index, mis_weight)``.
    """
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.sum(w)
    cum = jnp.cumsum(w)
    # choose index per lane
    idx = jnp.sum((u_select[..., None] > cum[None, :]).astype(jnp.int32), axis=-1)
    # float32 cumsum can end slightly below 1.0, letting u_select select
    # one past the end (same clip as GaussianMixture.sample)
    idx = jnp.clip(idx, 0, len(dists) - 1)
    samples = jnp.stack([d.sample(R, u1, u2) for d in dists], axis=-1)
    r = jnp.take_along_axis(samples, idx[..., None], axis=-1)[..., 0]
    pdfs = jnp.stack([d.pdf(r, R) for d in dists], axis=-1)
    weighted = w[None, :] * pdfs
    denom = jnp.sum(weighted, axis=-1)
    chosen = jnp.take_along_axis(weighted, idx[..., None], axis=-1)[..., 0]
    mis_w = jnp.where(denom > 0, chosen / jnp.maximum(denom, 1e-30), 0.0)
    return r, idx, mis_w
