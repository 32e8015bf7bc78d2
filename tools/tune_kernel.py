"""Post-round-3 re-sweep of pallas_inner_steps x pallas_block_rows."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def run(rows, inner):
    import jax
    from dcrmontecarlo_tpu.models import geophysical_scenario
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver
    survey, electrodes = geophysical_scenario(sharpness=0.5)
    problem = survey.build_problem()
    electrodes = np.asarray(electrodes, np.float32).copy()
    electrodes[:, 1] = -0.5
    solver = WoStSolver(problem, SolverOptions(
        target_slots=1 << 21, min_quota=32, rejection_rounds=2,
        pallas_block_rows=rows, pallas_inner_steps=inner))
    fn = solver._build_solve_fn(n_points=electrodes.shape[0],
                                n_walks=1 << 19, max_steps=500, eps=0.9)
    pts = np.asarray(electrodes)
    out = fn(pts, jax.random.PRNGKey(0)); jax.block_until_ready(out)
    steps = 0.0; t0 = time.perf_counter()
    for rep in range(3):
        out = fn(pts, jax.random.PRNGKey(rep + 1))
        jax.block_until_ready(out.total_steps); steps += float(out.total_steps)
    dt = time.perf_counter() - t0
    print(f"rows={rows} inner={inner}: {steps/dt/1e9:.3f} G (t={dt:.2f}s)",
          flush=True)

if __name__ == "__main__":
    for rows, inner in [(128, 256), (128, 512), (256, 256), (64, 256),
                        (128, 128), (256, 512)]:
        run(rows, inner)
