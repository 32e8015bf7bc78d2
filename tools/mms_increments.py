"""Martingale-increment audit: E[est_{t+1}-est_t | pre-step state bucket].

est_t = walk_acc + atten*u_exact(x_t) (live) / acc_sum (done) is a
martingale under an unbiased step operator, so every bucket mean must be
zero. Bucketing is by PRE-step state (valid conditioning).
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dcrmontecarlo_tpu.geometry import Polyline
    from dcrmontecarlo_tpu.models import autodiff_manufactured
    from dcrmontecarlo_tpu.solver import SolverOptions, WoStSolver
    from dcrmontecarlo_tpu.solver.state import init_state

    Lm, c0 = 10.0, 2.0
    w = 0.6 * Lm

    def um(x, y):
        return (100.0 * jnp.sin(jnp.pi * (x + Lm/2) / Lm)
                * jnp.cos(jnp.pi * y / (2*Lm)))

    def alpham(x, y):
        return jnp.exp(-c0 * jnp.tanh(-y / w)) + 0.0*x

    probm, u_ex = autodiff_manufactured(
        um, alpha=alpham,
        dirichlet=Polyline.from_points(
            [[-Lm/2, 0.], [-Lm/2, -Lm], [Lm/2, -Lm], [Lm/2, 0.]]),
        neumann=Polyline.from_points([[-Lm/2, 0.], [Lm/2, 0.]]))

    mode = sys.argv[3] if len(sys.argv) > 3 else "chain"
    kw = {"robin_correction": "chain", "rejection_rounds": 2}
    if mode == "intchord":
        kw["robin_interior"] = "chord"
    elif mode == "rej64":
        kw["rejection_rounds"] = 64
    elif mode == "rej8":
        kw["rejection_rounds"] = 8
    elif mode == "off":
        kw["robin_correction"] = False
    elif mode == "threefry":
        kw["rng"] = "threefry"
    s = WoStSolver(probm, SolverOptions(
        backend="xla", target_slots=1 << 15,
        boundary_snap=0.01, **kw))
    step = s._make_step_core(eps=0.02, max_steps=60000)

    W = 1 << 18
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    SEED0 = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    px0, py0 = 0.0, 0.0

    NB = 6  # buckets: 0 far-interior, 1 near-wall interior, 2 onb |x|<2.5,
    #          3 onb |x|>=2.5, 4 onb stepidx==0 (pristine), 5 completing

    def run(key):
        p0x = jnp.full((W,), px0, jnp.float32)
        p0y = jnp.full((W,), py0, jnp.float32)
        ob_a = jnp.ones((W,), bool)
        nx_a = jnp.zeros((W,), jnp.float32)
        ny_a = jnp.full((W,), -1.0, jnp.float32)
        st = init_state(p0x, p0y, jnp.ones((W,), jnp.int32))
        st = st._replace(on_bdry=ob_a, nx=nx_a, ny=ny_a)

        def est_of(st):
            u1 = um(st.px, st.py)
            live = st.n_done < 1
            return jnp.where(live, st.walk_acc[0] + st.atten * u1,
                             st.acc_sum[0])

        def body(carry, t):
            st = carry
            pre_est = est_of(st)
            pre_ob = st.on_bdry
            pre_py = st.py
            pre_live = st.n_done < 1
            st1, d = step(st, p0x, p0y, key,
                          p0ob=ob_a, p0nx=nx_a, p0ny=ny_a)
            inc = jnp.where(pre_live, est_of(st1) - pre_est, 0.0)
            r_pre = d["radius"]
            near = jnp.abs(pre_py) < r_pre
            bucket = jnp.where(
                pre_ob,
                jnp.where(t == 0, 4,
                          jnp.where(jnp.abs(st.px) < 2.5, 2, 3)),
                jnp.where(near, 1, 0))
            done_now = (st1.n_done >= 1) & pre_live
            bucket = jnp.where(done_now, 5, bucket)
            # per-bucket sums this step
            sums = jnp.zeros((NB,)).at[bucket].add(
                jnp.where(pre_live, inc, 0.0))
            sqs = jnp.zeros((NB,)).at[bucket].add(
                jnp.where(pre_live, inc * inc, 0.0))
            cns = jnp.zeros((NB,)).at[bucket].add(
                pre_live.astype(jnp.float32))
            return st1, (sums, sqs, cns)

        st, (sums, sqs, cns) = jax.lax.scan(body, st, jnp.arange(K))
        return sums.sum(0), sqs.sum(0), cns.sum(0)

    run_j = jax.jit(run)

    per_seed = []
    tot = np.zeros((3, NB))
    for seed in range(S):
        key = jax.random.PRNGKey((SEED0 + seed) * 7919 + 13)
        sm, sq, cn = run_j(key)
        sm = np.asarray(sm, np.float64); cn = np.asarray(cn, np.float64)
        per_seed.append(sm / np.maximum(cn, 1))
        tot += [sm, np.asarray(sq, np.float64), cn]
    per_seed = np.stack(per_seed)
    names = ["far-int", "near-int", "onb|x|<2.5", "onb|x|>2.5",
             "onb-pristine", "completing"]
    print(f"mode={mode} W={W} K={K} seeds={S}", flush=True)
    for i in range(NB):
        if tot[2, i] == 0:
            continue
        m = tot[0, i] / tot[2, i]
        sem = per_seed[:, i].std(ddof=1) / np.sqrt(S)
        # total contribution to walk bias = mean * (visits per walk)
        vpw = tot[2, i] / W / S
        print(f"  {names[i]:13s} n/walk {vpw:7.2f} mean-inc {m:+.5f} "
              f"+- {sem:.5f}  (walk-bias contrib {m*vpw:+.4f})", flush=True)


main()
