"""Per-channel correlation diagnosis of CRN on the notebook survey."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def collect(crn, n_seeds=12):
    import jax
    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver
    survey, electrodes = notebook_survey()
    opts = SolverOptions(target_slots=1 << 17, common_random_numbers=crn,
                         roulette_threshold=0.05, robin_correction=False)
    problem = survey.build_problem()
    solver = WoStSolver(problem, opts)
    pts = np.asarray(electrodes, np.float32).copy()
    pts[:, 1] = survey.surface_y - survey.electrode_nudge
    solver.solve(pts, n_walks=4096, max_steps=6000, eps=1.0, seed=999)
    V = []
    for seed in range(n_seeds):
        res = solver.solve(pts, n_walks=4096, max_steps=6000, eps=1.0,
                           seed=seed)
        V.append(np.asarray(res.mean).ravel())
    return np.stack(V)  # (seeds, n_el)

for crn in (False, True):
    V = collect(crn)
    Vc = V - V.mean(0)
    n_el = V.shape[1]
    corr = []
    for i in range(n_el - 1):
        a, b = Vc[:, i], Vc[:, i + 1]
        c = (a * b).mean() / max(1e-12, a.std() * b.std())
        corr.append(c)
    dv_std = (V[:, :-1] - V[:, 1:]).std(0)
    v_std = V.std(0)
    print(f"CRN={crn}:")
    print("  V std    :", np.round(v_std, 1))
    print("  corr(i,i+1):", np.round(corr, 2))
    print("  dV std   :", np.round(dv_std, 1))
    print(f"  median V std {np.median(v_std):.1f}, median dV std "
          f"{np.median(dv_std):.1f}", flush=True)
