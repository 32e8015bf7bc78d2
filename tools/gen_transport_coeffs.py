"""Generate dcrmontecarlo_tpu/sampling/_transport_coeffs.py.

Fits the screened-radius TRANSPORT MAP used by ``screened_sampler=
"transport"`` (sampling/radial.py::sample_screened_radius_transport):

    s = S(v; z),  v = sqrt(u) / (sqrt(u) + sqrt(1-u))  for u ~ U(0,1)

where S approximates the warped inverse CDF F^{-1}(m(v); z) of the screened
Green's radial density p(s; z) ~ s [K0(zs) - (K0(z)/I0(z)) I0(zs)] on
(0,1), m(v) = v^2/(v^2+(1-v)^2) (rational smoothstep: closed-form inverse,
quadratic endpoint contact absorbing the quantile function's sqrt
singularities at u -> 0, 1). The map is a Chebyshev tensor: degree DV in
(2v-1) x degree DZ in omega = affine((z-2)/(z+2)) over z in [Z_LO, Z_SW].
Above Z_SW the sampler switches to the EXACT closed-form free-density draw
(x = -ln(u1 u2) sqrt(1-u0^2) ~ x K0(x), the sech^2-mixture identity) with
importance weight (1 - c I0/K0)/N, so no fit is needed there; below Z_LO
the map is evaluated at Z_LO and the weight absorbs the O(z^2) shape
difference. Monotonicity of S in v (S' > 0 with margin) is VERIFIED on a
dense grid here, which makes the proposal density q = m'(v)/S'(v) valid
everywhere, and the per-draw importance weight w = p/q exactly unbiased
for every z.

Calibration (this script prints it; 2026-08-18 run):
  * worst-z E[(w-1)^2] ~ 7e-5 (at the z ~ 11.5 seam), <= 2e-6 typical;
  * min_v S' ~ 0.035 across omega in [-1, 1].

Regenerate with:  python tools/gen_transport_coeffs.py
"""

import os
import sys

import numpy as np
from numpy.polynomial import chebyshev as C
from scipy.special import i0e, k0e

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

Z_LO = 0.125
Z_SW = 11.5
A_RAT = 2.0
DV = 28
DZ = 12
PRUNE = 1e-7   # drop |B_ij| below this (re-verified after pruning)


def omega_of_z(z):
    r = (z - A_RAT) / (z + A_RAT)
    r0 = (Z_LO - A_RAT) / (Z_LO + A_RAT)
    r1 = (Z_SW - A_RAT) / (Z_SW + A_RAT)
    return 2.0 * (r - r0) / (r1 - r0) - 1.0


def exact_cdf(z, n_s=40001):
    s = np.concatenate([
        np.geomspace(1e-9, 1e-3, 2000, endpoint=False),
        np.linspace(1e-3, 1.0, n_s),
    ])
    x = z * s
    log_c = np.log(k0e(z) / i0e(z)) - 2.0 * z
    g = np.exp(-x) * (k0e(x) - i0e(x) * np.exp(np.minimum(log_c + 2.0 * x, 700.0)))
    dens = np.maximum(s * g, 0.0)
    cdf = np.concatenate(
        [[0.0], np.cumsum(0.5 * (dens[1:] + dens[:-1]) * np.diff(s))])
    cdf /= cdf[-1]
    return s, cdf


def m_warp(v):
    a = v * v
    b = (1 - v) ** 2
    return a / (a + b)


def mp_warp(v):
    a = v * v
    b = (1 - v) ** 2
    return 2 * v * (1 - v) / (a + b) ** 2


def p_true(s, z):
    x = z * s
    log_c = np.log(k0e(z) / i0e(z)) - 2.0 * z
    g = np.exp(-x) * (k0e(x) - i0e(x) * np.exp(np.minimum(log_c + 2.0 * x, 700.0)))
    # series-safe 1 - 1/I0(z)
    if z < 0.25:
        t = z * z * 0.25
        ssum = t * (1.0 + t * (0.25 + t / 36.0))
        n = ssum / (1.0 + ssum)
    else:
        n = 1.0 - np.exp(-z) / i0e(z)
    return np.maximum(z * z * s * g, 0.0) / n


def fit(n_z=192, n_v=2401):
    zs = np.exp(np.linspace(np.log(Z_LO), np.log(Z_SW), n_z))
    ws = omega_of_z(zs)
    v = 0.5 * (1 - np.cos(np.pi * np.arange(n_v + 1) / n_v))
    rows = []
    for z in zs:
        sg, cdf = exact_cdf(z)
        rows.append(np.interp(m_warp(v), cdf, sg))
    S = np.stack(rows)
    tv = 2 * v - 1
    coef_v = np.linalg.lstsq(C.chebvander(tv, DV), S.T, rcond=None)[0]
    B = np.linalg.lstsq(C.chebvander(ws, DZ), coef_v.T, rcond=None)[0].T
    return B


def eval_T(B, v, w):
    Tw = C.chebvander(np.atleast_1d(w), B.shape[1] - 1)[0]
    c = B @ Tw
    tv = 2 * v - 1
    return C.chebval(tv, c), C.chebval(tv, C.chebder(c)) * 2.0


def verify(B):
    # monotonicity with margin
    vs = np.linspace(0, 1, 40001)
    min_ds = np.inf
    for w in np.linspace(-1, 1, 801):
        _, ds = eval_T(B, vs, w)
        min_ds = min(min_ds, ds.min())
    # weight quality across z (including clamp + seam + free branch)
    u = (np.arange(200001) + 0.5) / 200001
    su, cu = np.sqrt(u), np.sqrt(1 - u)
    v = su / (su + cu)
    worst = 0.0
    report = []
    for z in [1e-6, 0.01, 0.125, 0.35, 1.0, 2.0, 3.5, 6.0, 9.0, 10.5,
              11.0, 11.5]:
        z_eff = min(max(z, Z_LO), Z_SW)
        s, ds = eval_T(B, v, float(omega_of_z(np.array([z_eff]))[0]))
        q = mp_warp(v) / np.maximum(ds, 1e-30)
        w_is = np.where((s >= 1.0) | (s <= 0), 0.0,
                        p_true(np.clip(s, 1e-9, 1.0), z) / q)
        m2 = np.mean((w_is - 1) ** 2)
        worst = max(worst, m2)
        report.append((z, np.mean(w_is), m2))
    return min_ds, worst, report


def main():
    B = fit()
    B = np.where(np.abs(B) < PRUNE, 0.0, B)
    min_ds, worst, report = verify(B)
    nnz = int((B != 0).sum())
    print(f"coeffs: {B.shape} nnz={nnz}/{B.size}")
    print(f"min S' = {min_ds:.5f} (must be > 0.01)")
    for z, mw, m2 in report:
        print(f"  z={z:9.3g}: E[w]={mw:.6f} E[(w-1)^2]={m2:.2e}")
    print(f"worst E[(w-1)^2] = {worst:.2e} (must be < 2e-4)")
    assert min_ds > 0.01, "transport map not monotone with margin"
    assert worst < 2e-4, "transport map weight spread too large"

    out = os.path.join(REPO, "dcrmontecarlo_tpu", "sampling",
                       "_transport_coeffs.py")
    with open(out, "w") as f:
        f.write('"""GENERATED by tools/gen_transport_coeffs.py — do not '
                'edit.\n\nChebyshev tensor coefficients of the screened-'
                'radius transport map\n(see sampling/radial.py::'
                'sample_screened_radius_transport). Verified at\n'
                f'generation: min_v S\' = {min_ds:.5f}, worst-z '
                f'E[(w-1)^2] = {worst:.2e}.\n"""\n\n')
        f.write(f"Z_LO = {Z_LO!r}\nZ_SW = {Z_SW!r}\nA_RAT = {A_RAT!r}\n")
        r0 = (Z_LO - A_RAT) / (Z_LO + A_RAT)
        r1 = (Z_SW - A_RAT) / (Z_SW + A_RAT)
        f.write(f"OMEGA_R0 = {r0!r}\nOMEGA_R1 = {r1!r}\n\n")
        f.write("# COEFFS[i][j]: T_i(2v-1) x T_j(omega); row-major tuples\n")
        f.write("COEFFS = (\n")
        for row in B:
            f.write("    (" + ", ".join(f"{float(x)!r}" for x in row)
                    + "),\n")
        f.write(")\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
