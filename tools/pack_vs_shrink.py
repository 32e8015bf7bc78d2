"""Compaction A/B on the straggler-bound notebook accuracy workload.

CLAUDE.md round-3 queue: the sharded Pallas path honors compaction via
in-graph lane PACKING (parallel/mesh.py::pack — active lanes sort to
leading blocks, drained blocks hit the kernel early exit, walks stay
bit-identical), while the single-device path uses the host-loop SHRINK
(re-launch on a smaller slot array, banked stats). If pack is close to
shrink, it could become a cheap always-on default for straggler tails:
it needs no solver reuse and no retrace, where shrink retraces per
shrink size.

Measures wall-clock per solve (solver reused, compile excluded) on the
flagship C18 notebook survey for:
  shrink      single-device solver, compaction=True  (host-loop shrink)
  none        single-device solver, compaction=False (control)
  pack        1-device ShardedWoStSolver, compaction=True  (in-graph pack)
  shard-none  1-device ShardedWoStSolver, compaction=False (shard control)

usage: python tools/pack_vs_shrink.py [WALKS] [REPS] [MAX_STEPS]
  NB_CPU=1 to force CPU (debug only; numbers are then meaningless).

Do NOT set PYTHONPATH (breaks axon registration); the script inserts
the repo root itself.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NB_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax
    if os.environ.get("NB_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.parallel import ShardedWoStSolver, make_mesh
    from dcrmontecarlo_tpu.survey.dcr import survey_default_options

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    MS = int(sys.argv[3]) if len(sys.argv) > 3 else 6000

    survey, electrodes = notebook_survey()
    survey.source_mis = True
    prob = survey.build_problem()
    pts = np.asarray(electrodes, np.float32)

    def run(label, solver):
        # compile + warm
        solver.solve(pts, n_walks=W, max_steps=MS, eps=1.0, seed=999)
        times, meds = [], []
        for seed in range(REPS):
            t0 = time.perf_counter()
            res = solver.solve(pts, n_walks=W, max_steps=MS, eps=1.0,
                               seed=seed)
            times.append(time.perf_counter() - t0)
            meds.append(float(np.median(np.asarray(res.stderr))))
        print(f"{label:11s} t/solve {np.mean(times):7.2f}s "
              f"(min {min(times):.2f}) med-stderr {np.mean(meds):.3f}",
              flush=True)
        return float(np.mean(times))

    t = {}
    for label, compact in (("shrink", True), ("none", False)):
        opts = survey_default_options(compaction=compact)
        t[label] = run(label, survey.make_solver(options=opts))
    mesh = make_mesh(1)
    for label, compact in (("pack", True), ("shard-none", False)):
        opts = survey_default_options(compaction=compact)
        t[label] = run(label, ShardedWoStSolver(prob, mesh, opts))

    print(f"\npack vs shrink: {t['pack'] / t['shrink']:.2f}x "
          f"(shrink {t['shrink']:.2f}s, pack {t['pack']:.2f}s); "
          f"compaction win on this workload: shrink "
          f"{t['none'] / t['shrink']:.1f}x, pack "
          f"{t['shard-none'] / t['pack']:.1f}x")


main()
