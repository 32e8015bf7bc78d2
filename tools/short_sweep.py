"""Short-walk preset tuning sweep (round-5 verdict item 2).

The launch-bound regime: walks last ~10 steps, lanes carry ~3 walks, and
a Pallas block only exits when EVERY lane drains — so block runtime is
the max over lanes of total-walk length, a straggler-amplified multiple
of the ~30-step mean. Levers swept here:

* pallas_block_rows: fewer lanes per block = tighter straggler max and
  earlier per-block exits;
* target_slots: fewer slots = more walks per lane = cross-walk
  straggler amortization (relative spread of the per-lane sum shrinks);
* compaction="pack" (in-graph lane packing; disables adaptive
  single-launch) vs adaptive off-pack.

Run ON TPU from the repo root (do NOT set PYTHONPATH):
    python tools/short_sweep.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
    from dcrmontecarlo_tpu.solver import SolverOptions

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + 2.0 * y)
    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.4, 0.6]], np.float32)
    n_walks = 1 << 21
    repeats = 5

    configs = []
    for rows in (8, 16, 32, 64):
        configs.append(dict(pallas_block_rows=rows, target_slots=1 << 21,
                            min_quota=8))
    for slots in (1 << 19, 1 << 20):
        configs.append(dict(pallas_block_rows=16, target_slots=slots,
                            min_quota=8))
    configs.append(dict(pallas_block_rows=16, target_slots=1 << 19,
                        min_quota=32))
    configs.append(dict(pallas_block_rows=16, target_slots=1 << 21,
                        min_quota=8, compaction="pack"))
    configs.append(dict(pallas_block_rows=64, target_slots=1 << 21,
                        min_quota=8, compaction="pack"))

    for cfg in configs:
        solver = WoStSolver(prob, SolverOptions(**cfg))
        t0 = time.perf_counter()
        solver.solve(pts, n_walks=n_walks, max_steps=200, eps=1e-3, seed=0)
        compile_t = time.perf_counter() - t0
        fn = solver._build_solve_fn(len(pts), n_walks, 200, 1e-3)
        out = fn(jax.numpy.asarray(pts), jax.random.PRNGKey(0))
        jax.block_until_ready(out.total_steps)
        steps_total = 0.0
        t0 = time.perf_counter()
        for rep in range(repeats):
            out = fn(jax.numpy.asarray(pts), jax.random.PRNGKey(rep + 1))
            jax.block_until_ready(out.total_steps)
            steps_total += float(out.total_steps)
        dt = time.perf_counter() - t0
        print(f"{cfg}: {steps_total / dt / 1e9:.3f} G steps/s "
              f"({dt / repeats * 1e3:.0f} ms/rep, compile {compile_t:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
