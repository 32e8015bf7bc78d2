"""Generate the pinned cylinder-oracle artifact (validation/pins/).

Pins the author-independent closed-form reference (validation/cylinder.py
— Rayleigh multipole / image series for a line-current dipole over a
buried cylinder under an insulating surface) for the two notebook-like
contrasts, plus the two slow-to-recompute companions the MC gate needs:

* ``bc_grid`` — the regularized series on a 257^2 domain grid (the MC
  problem's Dirichlet boundary values ride a bilinear interpolant of
  this grid);
* ``delta_smooth`` — FDM(smoothed sigmoid cylinder) - FDM(sharp
  cylinder) at 401^2, same bc: the modelling delta between the sharp
  analytic geometry and the sigmoid field the MC solver actually runs
  (discretization error cancels in the same-grid difference).

Everything else in ``tests/test_cylinder_oracle.py`` is recomputed live
(the series itself costs < 1 s; the point of the gate is that its
reference MATH is independent, so the slow-marked regeneration test
re-derives this whole file and asserts it matches).

Run from the repo root:  python tools/gen_cylinder_pins.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# geometry shared with tests/test_cylinder_oracle.py (single conductor /
# resistor anomaly of the notebook model, same dipole, same domain)
CENTER = (-120.0, -80.0)
RADIUS = 60.0
SIGMA0 = 1e-2
SURFACE_Y = 1.0
SOURCES = [((-200.0, -9.0), 1.0), ((200.0, -9.0), -1.0)]
WIDTH = 5.0
SHARPNESS = 0.1
DOMAIN = ((-500.0, 500.0), (-1000.0, SURFACE_Y))
CONTRASTS = {"conductor": 1e-1, "resistor": 1e-3}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dcrmontecarlo_tpu.problems.fields import smooth_circle
    from dcrmontecarlo_tpu.validation.cylinder import (
        CylinderHalfspace,
        regularize_sources,
    )
    from dcrmontecarlo_tpu.validation.fdm import fdm_solve

    el = np.stack([np.arange(-400.0, 401.0, 40.0), np.full(21, -0.1)], 1)
    gx = np.linspace(-500.0, 500.0, 257)
    gy = np.linspace(-1000.0, SURFACE_Y, 257)
    GX, GY = np.meshgrid(gx, gy, indexing="ij")
    gpts = np.stack([GX.ravel(), GY.ravel()], 1)

    def source_np(X, Y):
        n = 1.0 / (2 * np.pi * WIDTH * WIDTH)
        out = 0.0
        for (sx, sy), cur in SOURCES:
            out = out + cur * n * np.exp(
                -((X - sx) ** 2 + (Y - sy) ** 2) / (2 * WIDTH * WIDTH))
        return out

    out = {"electrodes": el, "gx": gx, "gy": gy,
           "generated": np.bytes_(time.strftime("%Y-%m-%d"))}
    for name, s1 in CONTRASTS.items():
        u_reg = regularize_sources(
            lambda s, s1=s1: CylinderHalfspace(
                CENTER, RADIUS, SIGMA0, s1, SURFACE_Y, s),
            SOURCES, WIDTH, SURFACE_Y)
        t0 = time.time()
        out[f"ref_{name}"] = u_reg(el)
        out[f"bc_grid_{name}"] = u_reg(gpts).reshape(GX.shape).astype(
            np.float32)
        print(f"{name}: series + grid {time.time() - t0:.0f} s")

        bump = smooth_circle(CENTER, RADIUS, SHARPNESS)

        def alpha_smooth(X, Y, s1=s1, bump=bump):
            import jax.numpy as jnp

            return (np.asarray(bump(jnp.asarray(X), jnp.asarray(Y)))
                    * (s1 - SIGMA0) + SIGMA0)

        def alpha_sharp(X, Y, s1=s1):
            return np.where(
                (X - CENTER[0]) ** 2 + (Y - CENTER[1]) ** 2 < RADIUS ** 2,
                s1, SIGMA0)

        def bc_np(X, Y, u_reg=u_reg):
            o = np.zeros_like(X)
            m = ((np.abs(X - DOMAIN[0][0]) < 1e-9)
                 | (np.abs(X - DOMAIN[0][1]) < 1e-9)
                 | (np.abs(Y - DOMAIN[1][0]) < 1e-9))
            o[m] = u_reg(np.stack([X[m], Y[m]], 1))
            return o

        t0 = time.time()
        f_sm = fdm_solve(DOMAIN, alpha_smooth, source_np, neumann_top=True,
                         bc=bc_np, nx=401, ny=401)
        f_sh = fdm_solve(DOMAIN, alpha_sharp, source_np, neumann_top=True,
                         bc=bc_np, nx=401, ny=401)
        out[f"delta_smooth_{name}"] = f_sm(el) - f_sh(el)
        out[f"fdm_sharp_401_{name}"] = f_sh(el)
        print(f"{name}: FDM pair {time.time() - t0:.0f} s; "
              f"delta range [{out[f'delta_smooth_{name}'].min():.2f}, "
              f"{out[f'delta_smooth_{name}'].max():.2f}]")

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dcrmontecarlo_tpu", "validation",
        "pins", "cylinder_oracle.npz")
    np.savez_compressed(dest, **out)
    print("wrote", dest)


if __name__ == "__main__":
    main()
