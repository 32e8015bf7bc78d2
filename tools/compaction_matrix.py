"""The compaction matrix: {off, pack, shrink} x three regimes, one run.

Round-4 verdict weak #6 / next #7: three compaction states (False,
"pack", True=host shrink) interact with the adaptive single-launch
default (compaction="pack" disables adaptive — solver/wost.py), and no
single committed TPU measurement compared them end-to-end. This tool
produces THE pinned table (CLAUDE.md / THEORY.md):

  sustained   bench.py full-preset workload (DCR survey, 500-step walks,
              2^19 walks, roulette 0.05) — metric: walker-steps/s
  short       bench.py short-preset workload (harmonic square, ~10-step
              walks, pipelined dispatch) — metric: walker-steps/s
  straggler   flagship notebook accuracy workload WITHOUT roulette
              (2500 walks x 6000 steps; the heavy walk-length tail
              compaction was built for) — metric: s/solve

All three arms run bit-identical walks within a column (the pack and
shrink gates in tests/test_pallas_walk.py / test_parallel.py), so
wall-clock alone decides. Each arm retraces; compile time is excluded.

usage: python tools/compaction_matrix.py [sustained short straggler]
Do NOT set PYTHONPATH (breaks axon registration).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [("off", False), ("pack", "pack"), ("shrink", True)]


def _time_solver(solver, pts, n_walks, max_steps, eps, reps, pipelined):
    import jax

    solver.solve(pts, n_walks=n_walks, max_steps=max_steps, eps=eps, seed=999)
    fn = solver._build_solve_fn(len(pts), n_walks, max_steps, eps)
    out = fn(jax.numpy.asarray(pts), jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    if pipelined:  # the short-walk production pattern (bench.py)
        outs = [fn(jax.numpy.asarray(pts), jax.random.PRNGKey(r + 1))
                for r in range(reps)]
        steps = sum(float(jax.device_get(o.total_steps)) for o in outs)
    else:
        steps = 0.0
        for r in range(reps):
            out = fn(jax.numpy.asarray(pts), jax.random.PRNGKey(r + 1))
            jax.block_until_ready(out.total_steps)
            steps += float(out.total_steps)
    dt = time.perf_counter() - t0
    return steps, dt


def sustained(arm, roulette=None):
    from dcrmontecarlo_tpu.models import geophysical_scenario
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver

    survey, electrodes = geophysical_scenario(sharpness=0.5)
    problem = survey.build_problem()
    pts = np.asarray(electrodes, np.float32).copy()
    pts[:, 1] = -0.5
    solver = WoStSolver(problem, SolverOptions(
        target_slots=1 << 21, min_quota=32, rejection_rounds=1,
        roulette_threshold=roulette, compaction=arm))
    steps, dt = _time_solver(solver, pts, 1 << 19, 500, 0.9, 3, False)
    return steps / dt, "steps/s"


def sustained_roul(arm):
    # does in-graph packing recover the roulette-drained blocks that cost
    # the steps/s metric 1.875 -> 1.52 G (2026-08-21, CLAUDE.md)?
    return sustained(arm, roulette=0.05)


def short(arm):
    from dcrmontecarlo_tpu import Problem, WoStSolver, square_loop
    from dcrmontecarlo_tpu.solver import SolverOptions

    prob = Problem(dirichlet=square_loop(1.0),
                   bc_dirichlet=lambda x, y: x + 2.0 * y)
    solver = WoStSolver(prob, SolverOptions(
        target_slots=1 << 19, pallas_block_rows=16, min_quota=32,
        compaction=arm))
    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.4, 0.6]], np.float32)
    steps, dt = _time_solver(solver, pts, 1 << 21, 200, 1e-3, 10, True)
    return steps / dt, "steps/s"


def straggler(arm):
    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.survey.dcr import survey_default_options

    survey, electrodes = notebook_survey()
    survey.source_mis = True
    survey.local_majorant = "auto"
    opts = survey_default_options(target_slots=65536,
                                  roulette_threshold=None,
                                  compaction=arm)
    solver = survey.make_solver(options=opts)
    pts = np.asarray(electrodes, np.float32)
    t0 = None
    times = []
    solver_run = lambda seed: survey.run(
        pts, n_walks=2500, max_steps=6000, eps=1.0, seed=seed,
        solver=solver)
    solver_run(999)  # compile
    for seed in range(4):
        t0 = time.perf_counter()
        solver_run(seed)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), "s/solve"


def main():
    # args: regime or regime:arm1,arm2 (e.g. "sustained:pack,shrink")
    regimes = sys.argv[1:] or ["sustained", "short", "straggler"]
    table = {}
    for spec in regimes:
        name, _, armsel = spec.partition(":")
        fn = {"sustained": sustained, "sustained-roul": sustained_roul,
              "short": short, "straggler": straggler}[name]
        arms = ([(a, dict(ARMS)[a]) for a in armsel.split(",")]
                if armsel else ARMS)
        for label, arm in arms:
            t0 = time.perf_counter()
            try:
                val, unit = fn(arm)
            except Exception as e:  # record, keep sweeping
                val, unit = None, f"ERROR {type(e).__name__}: {e}"
            table[f"{name}/{label}"] = (val, unit)
            print(f"{name:10s} {label:7s} "
                  f"{val if val is None else f'{val:.4g}':>12} {unit}  "
                  f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)
    print(json.dumps({k: v for k, v in table.items()}))


if __name__ == "__main__":
    main()
