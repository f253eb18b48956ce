"""Decompose the KS T=300 solve wall-clock on the current backend.

Times the primitives (fused f32 JVP sweep, XLA f32/f64 sweeps, f64 residual,
J̄ triangular solve) and then the full newton_krylov solve with per-outer
records, so the optimization target is visible.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_profile_solve.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.ops.linalg import make_reusable_solver
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn, make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

f32 = jnp.float32


def med(fn, *a, n=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    T = 300
    Tm1 = T - 1
    model = load_model("krusell_smith", T=T)
    ss0, ssT, Jbar = get_or_solve(model)
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
    exog = {"Z": exogenousZ(Tm1, rho=0.8, z_start=1.0, z_end=2.0)}

    F64 = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
    print(f"F64 residual eval:        {med(F64, x_ss)*1e3:8.1f} ms")

    F32 = jax.jit(make_full_residual_fn(
        cast_model(model, f32), cast_ss(ss0, f32), cast_ss(ssT, f32),
        cast_paths(exog, f32)))
    x32 = x_ss.astype(f32)
    print(f"F32 residual eval:        {med(F32, x32)*1e3:8.1f} ms")

    v = jnp.full_like(x_ss, 1e-3)
    jvp64 = jax.jit(lambda x, u: jax.jvp(F64, (x,), (u,))[1])
    print(f"XLA f64 JVP sweep:        {med(jvp64, x_ss, v)*1e3:8.1f} ms")
    jvp32 = jax.jit(lambda x, u: jax.jvp(F32, (x,), (u,))[1])
    print(f"XLA f32 JVP sweep:        {med(jvp32, x32, v.astype(f32))*1e3:8.1f} ms")

    fused = make_fused_jvp_dir(model, ss0, ssT, exog,
                               interpret=jax.default_backend() == "cpu")
    fused_j = jax.jit(fused)
    t_fused = med(fused_j, x_ss, v)
    print(f"fused f32 JVP sweep:      {t_fused*1e3:8.1f} ms")
    # Roofline/MFU: how far the measured sweep sits from the chip's own
    # bounds (not just from XLA) — see scripts/roofline.py.
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import ks_sweep_counts, report
    report("ks_fused_jvp_roofline", ks_sweep_counts(200, 7, Tm1), t_fused)

    from hank_tpu.ops.fused_sweep import make_fused_residual_fn
    R32 = jax.jit(make_fused_residual_fn(
        model, ss0, ssT, exog, interpret=jax.default_backend() == "cpu"))
    print(f"fused f32 residual eval:  {med(R32, x_ss)*1e3:8.1f} ms")

    from hank_tpu.ops.fused_ds import make_ds_residual_fn, supports_ds_residual
    if supports_ds_residual(model):
        Rds = jax.jit(make_ds_residual_fn(
            model, ss0, ssT, exog, interpret=jax.default_backend() == "cpu"))
        print(f"fused ds residual eval:   {med(Rds, x_ss)*1e3:8.1f} ms "
              f"(|ds-f64| = {float(jnp.max(jnp.abs(Rds(x_ss) - F64(x_ss)))):.1e})")

    solve_jbar = make_reusable_solver(Jbar)
    b = F64(x_ss)
    print(f"Jbar triangular solve:    {med(jax.jit(solve_jbar), b)*1e3:8.1f} ms")

    records = []
    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov", direction_dtype=f32,
                              eps=1e-8, records=records)
    x, info = solver(x_ss)
    jax.block_until_ready(x)
    records.clear()
    t0 = time.perf_counter()
    ts = [t0]
    x, info = solver(x_ss)
    jax.block_until_ready(x)
    total = time.perf_counter() - t0
    print(f"\nfull solve: {total:.3f} s, outers={int(info['iterations'])}, "
          f"|F|={float(info['residual_norm']):.2e}")
    for r in records:
        print("  ", r)


if __name__ == "__main__":
    main()
