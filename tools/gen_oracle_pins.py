"""Generate the pinned flagship oracle artifact (round-4 verdict item 8).

Builds the notebook flagship model (the reference's SimPEG cross-check
model, ``tests/testNotebook.ipynb`` cell 17) and solves it with BOTH
in-repo discretizations at several resolutions, pinning the 21 electrode
potentials to ``dcrmontecarlo_tpu/validation/pins/notebook_oracle.npz``:

* ``fdm_201 / fdm_401 / fdm_801`` — finite-volume oracle
  (``validation/fdm.py``)
* ``fem_201 / fem_401``           — nodal P1 FEM oracle
  (``validation/fem.py``)
* ``richardson``                  — (4 u_801 − u_401)/3, the
  grid-bias-cancelled FDM limit used by the offset studies
* ``dv_401 / dv_richardson``      — adjacent dipole voltages

Why pinned: the flagship CI gate used to rebuild two 401^2 sparse solves
per run (several minutes of the suite's budget) for numbers that only
change when the model or the oracle code changes. The gate now loads this
pin; ``tests/test_fdm_oracle.py::test_notebook_oracle_pins_regenerate``
(slow-marked) regenerates the 401^2 values and compares, so drift in
either oracle or the model is still caught — and the pinned numbers are
diffable in review.

Usage: ``python tools/gen_oracle_pins.py`` (CPU, ~2-4 min; forces the CPU
platform itself).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def electrode_potentials(nx_list, fem_list):
    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.validation import fdm_solve, fem_solve

    survey, electrodes = notebook_survey()
    prob = survey.build_problem()
    alpha_v = jax.vmap(lambda x, y: prob.alpha(x, y))
    src_v = jax.vmap(lambda x, y: prob.source(x, y))

    def alpha_np(X, Y):
        return np.asarray(alpha_v(
            X.ravel().astype(np.float32),
            Y.ravel().astype(np.float32))).reshape(X.shape)

    def source_np(X, Y):
        return np.asarray(src_v(
            X.ravel().astype(np.float32),
            Y.ravel().astype(np.float32))).reshape(X.shape)

    bounds = ((-500.0, 500.0), (-1000.0, 1.0))
    el = np.asarray(electrodes, np.float32)
    out = {"electrodes": el}
    for n in nx_list:
        t0 = time.perf_counter()
        out[f"fdm_{n}"] = fdm_solve(
            bounds=bounds, alpha=alpha_np, source=source_np,
            neumann_top=True, nx=n, ny=n)(el)
        print(f"fdm {n}^2: {time.perf_counter() - t0:.1f}s", flush=True)
    for n in fem_list:
        t0 = time.perf_counter()
        out[f"fem_{n}"] = fem_solve(
            bounds=bounds, alpha=alpha_np, source=source_np,
            neumann_top=True, nx=n, ny=n)(el)
        print(f"fem {n}^2: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main():
    out = electrode_potentials([201, 401, 801], [201, 401])
    out["richardson"] = (4.0 * out["fdm_801"] - out["fdm_401"]) / 3.0
    out["dv_401"] = out["fdm_401"][:-1] - out["fdm_401"][1:]
    out["dv_richardson"] = out["richardson"][:-1] - out["richardson"][1:]
    out["generated"] = np.bytes_(b"2026-08-19 tools/gen_oracle_pins.py")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dcrmontecarlo_tpu", "validation", "pins", "notebook_oracle.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    print("wrote", path)
    for k, v in out.items():
        if k.startswith(("fdm", "fem", "rich")):
            print(f"  {k}: [{np.min(v):.3f}, {np.max(v):.3f}]")


if __name__ == "__main__":
    main()
