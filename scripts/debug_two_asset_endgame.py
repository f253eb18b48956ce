"""Instrumented reproduction of the two-asset f64-endgame divergence on TPU.

The boehl host_inner f32 phase floors at ‖F‖ ≈ 8.1e-7; BOTH full-precision
endgame operators (emulated-f64 AD jvp and central-difference) then make no
progress for one outer and produce non-finite y in the next. This script
drives the endgame by hand with per-sweep prints (rnorm, |y|, alpha, ray,
finiteness, first bad period) to localize the failure. The floor iterate is
cached to /tmp/hank2_floor.npy so re-runs skip the f32 phase.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_two_asset_endgame.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.ops.linalg import make_reusable_solver, rayleigh_quotient
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import _boehl_alpha, make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, Jbar = get_or_solve(model)
Tm1 = model.compspec.T - 1
endog = model.vars_of_type("endogenous")
n_endog = len(endog)
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)

F_j = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
solve_j = jax.jit(make_reusable_solver(Jbar))
m32 = cast_model(model, jnp.float32)
F32 = make_full_residual_fn(m32, cast_ss(ss0, jnp.float32),
                            cast_ss(ssT, jnp.float32),
                            cast_paths(exog, jnp.float32))
jvp32 = jax.jit(lambda x, v: jax.jvp(
    F32, (x.astype(jnp.float32),), (v.astype(jnp.float32),))[1]
    .astype(jnp.float64))

def first_bad(v):
    bad = np.flatnonzero(~np.isfinite(np.asarray(v)))
    if bad.size == 0:
        return None
    i = int(bad[0])
    return f"idx {i} = t{i // n_endog}/{endog[i % n_endog]} ({bad.size} bad)"


FLOOR = "/tmp/hank2_floor.npy"
if os.path.exists(FLOOR):
    x = jnp.asarray(np.load(FLOOR))
    print("loaded floor iterate", flush=True)
else:
    # f32 phase to the floor (5 outers, as measured). y0 = x0 exactly as
    # the production run loop (y = 0 is NOT equivalent: see endgame below).
    x, y = x0, x0
    Fx = F_j(x)
    best, x_best = float(jnp.linalg.norm(Fx)), x
    for outer in range(5):
        tol = max(1e-5 * float(jnp.linalg.norm(solve_j(Fx))), 1e-300)
        rnorm, it = float("inf"), 0
        while rnorm > tol and it < 100:
            Lxy = jvp32(x, y)
            R = solve_j(Fx - Lxy)
            ray = rayleigh_quotient(solve_j(Lxy), y)
            alpha = _boehl_alpha(ray)
            y = y + alpha * R
            rnorm = float(jnp.linalg.norm(R))
            it += 1
            print(f"  [f32 o{outer+1} s{it}] rnorm={rnorm:.3e} "
                  f"|y|={float(jnp.linalg.norm(y)):.3e} "
                  f"ray={float(ray):.3e} a={float(alpha):.3f}", flush=True)
            if not np.isfinite(rnorm):
                print(f"  f32 NaN: Lxy bad: {first_bad(Lxy)}", flush=True)
                break
        x = x - y
        Fx = F_j(x)
        fn = float(jnp.linalg.norm(Fx))
        print(f"[f32] outer {outer+1}: |F| = {fn:.3e} (+{it})", flush=True)
        if fn < best:
            best, x_best = fn, x
    x = x_best
    np.save(FLOOR, np.asarray(x))

Fx = F_j(x)
fnorm = float(jnp.linalg.norm(Fx))
print(f"floor |F| = {fnorm:.6e}", flush=True)

fd_h = 1e-5


def jvp_fd(x, v):
    vn = float(jnp.linalg.norm(v))
    if vn == 0.0 or not np.isfinite(vn):
        return jnp.zeros_like(x)
    u = v * (1.0 / vn)
    Fp = F_j(x + fd_h * u)
    Fm = F_j(x - fd_h * u)
    fp = bool(jnp.all(jnp.isfinite(Fp)))
    fm = bool(jnp.all(jnp.isfinite(Fm)))
    if not (fp and fm):
        print(f"  !! F at perturbed point non-finite (plus={fp}, minus={fm})",
              flush=True)
    return (Fp - Fm) * (vn / (2.0 * fd_h))


# Endgame: two outers max, verbose per sweep.
y = jnp.zeros_like(x)
for outer in range(2):
    tol = max(1e-5 * float(jnp.linalg.norm(solve_j(Fx))), 1e-300)
    print(f"[endgame outer {outer+1}] tol = {tol:.3e}", flush=True)
    rnorm, it = float("inf"), 0
    while rnorm > tol and it < 40:
        t0 = time.perf_counter()
        Lxy = jvp_fd(x, y)
        R = solve_j(Fx - Lxy)
        ray = rayleigh_quotient(solve_j(Lxy), y)
        alpha = _boehl_alpha(ray)
        y = y + alpha * R
        rnorm = float(jnp.linalg.norm(R))
        it += 1
        print(f"  sweep {it}: rnorm={rnorm:.3e} |y|={float(jnp.linalg.norm(y)):.3e} "
              f"ray={float(ray):.3e} alpha={float(alpha):.3f} "
              f"|Lxy|={float(jnp.linalg.norm(Lxy)):.3e} "
              f"({time.perf_counter()-t0:.2f}s)", flush=True)
        bad = first_bad(y)
        if bad:
            print(f"  y non-finite: {bad}", flush=True)
            print(f"  Lxy bad: {first_bad(Lxy)}; R bad: {first_bad(R)}",
                  flush=True)
            sys.exit(1)
    x_new = x - y
    F_new = F_j(x_new)
    fn = float(jnp.linalg.norm(F_new))
    print(f"[endgame outer {outer+1}] |F| = {fn:.6e} (+{it} sweeps)", flush=True)
    # Line probe: does ANY step along y descend?
    for s in (0.5, 0.25, 0.1):
        fs = float(jnp.linalg.norm(F_j(x - s * y)))
        print(f"  probe |F(x - {s}y)| = {fs:.6e}", flush=True)
    if fn < fnorm:
        x, Fx, fnorm = x_new, F_new, fn
    y = jnp.zeros_like(x)
