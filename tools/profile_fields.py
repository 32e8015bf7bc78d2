"""Ablate per-step field evals on the headline bench (PROFILING ONLY).

sigma' and alpha only touch walker WEIGHTS (trajectories are
field-independent in delta tracking with roulette off), so stubbing them
keeps total_steps identical — a clean cost isolation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(stub_sigma=False, stub_alpha=False, stub_bc=False):
    import jax

    from dcrmontecarlo_tpu.models import geophysical_scenario
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver

    survey, electrodes = geophysical_scenario(sharpness=0.5)
    problem = survey.build_problem()
    if stub_sigma:
        problem.sigma_prime = lambda x, y: 0.01 + 0.0 * x
    if stub_alpha:
        problem.alpha_c = lambda x, y: 100.0 + 0.0 * x
    if stub_bc:
        problem.bc_dirichlet = lambda x, y: 0.0 * x
    electrodes = np.asarray(electrodes, np.float32).copy()
    electrodes[:, 1] = -0.5
    solver = WoStSolver(problem, SolverOptions(
        target_slots=1 << 21, min_quota=32, rejection_rounds=2))
    fn = solver._build_solve_fn(n_points=electrodes.shape[0],
                                n_walks=1 << 19, max_steps=500, eps=0.9)
    pts = np.asarray(electrodes)
    out = fn(pts, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    steps = 0.0
    t0 = time.perf_counter()
    for rep in range(3):
        out = fn(pts, jax.random.PRNGKey(rep + 1))
        jax.block_until_ready(out.total_steps)
        steps += float(out.total_steps)
    dt = time.perf_counter() - t0
    print(f"stub_sigma={stub_sigma} stub_alpha={stub_alpha} "
          f"stub_bc={stub_bc}: {steps / dt / 1e9:.3f} G steps/s "
          f"(t={dt:.2f}s steps={steps:.3g})", flush=True)


if __name__ == "__main__":
    run()
    run(stub_sigma=True)
    run(stub_sigma=True, stub_alpha=True)
    run(stub_sigma=True, stub_alpha=True, stub_bc=True)
