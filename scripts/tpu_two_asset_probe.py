"""Instrumented two-asset TPU bring-up: compile/run each stage separately.

The full-size two-asset T=300 program stalled in remote AOT compile in
round 2 (>85 min). This script isolates WHERE the time goes by compiling
and timing each piece in sequence, printing progress lines as it goes:

  1. get_or_solve (artifact-cached SS + J-bar; prints cache status)
  2. F(x) f64 residual: compile, then run            [scan + joint lottery]
  3. f32 direction JVP sweep: compile, then run
  4. newton_krylov nk_step: compile via a 1-outer solve
  5. full solve to 1e-8 (warm)

Supports --T and --scale to bisect shapes (scale divides the grid sizes).

TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/tpu_two_asset_probe.py [--T 300] [--scale 1]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def stamp(msg, t0=[None]):
    now = time.perf_counter()
    if t0[0] is None:
        t0[0] = now
    print(f"[{now - t0[0]:8.1f}s] {msg}", flush=True)


def main(T: int, scale: int):
    import dataclasses

    from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
    from hank_tpu.model.structures import HeterogeneityDimension, generate_exog_paths
    from hank_tpu.models import load_model
    from hank_tpu.models.hank_two_asset import access_process
    from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
    from hank_tpu.solvers.newton import make_full_residual_fn, make_path_solver
    from hank_tpu.utils.checkpoint import get_or_solve, load_jacobian

    stamp(f"backend={jax.default_backend()} T={T} scale=1/{scale}")
    model = load_model("hank_two_asset", T=T)
    if scale > 1:
        n_b, n_a, n_e = 40 // scale, 20 // scale, 5
        liq = HeterogeneityDimension(
            "liquid", "endogenous", n_b,
            jnp.asarray(make_double_exponential_grid(0.0, 120.0, n_b)),
            None, "B")
        ill = HeterogeneityDimension(
            "illiquid", "endogenous", n_a,
            jnp.asarray(make_double_exponential_grid(0.0, 200.0, n_a)),
            None, "A")
        Pi, _, z = rouwenhorst(n_e, 0.966, 0.283)
        inc = HeterogeneityDimension(
            "income", "exogenous", n_e, jnp.asarray(z), jnp.asarray(Pi), None)
        g, P = access_process(2, 0.10)
        acc = HeterogeneityDimension(
            "access", "exogenous", 2, jnp.asarray(g), jnp.asarray(P), None)
        model = dataclasses.replace(
            model, heterogeneity={"liquid": liq, "illiquid": ill,
                                  "income": inc, "access": acc})
    stamp(f"state shape {model.state_shape()}; jbar cached: "
          f"{load_jacobian(model) is not None}")

    ss0, ssT, Jbar = get_or_solve(model)
    stamp("steady states + J-bar ready")

    Tm1 = model.compspec.T - 1
    exog = generate_exog_paths(model, Tm1)
    endog = model.vars_of_type("endogenous")
    x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)

    F = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
    r = F(x0)
    jax.block_until_ready(r)
    stamp(f"f64 residual compiled+ran, |F(x_ss)| = {float(jnp.linalg.norm(r)):.3e}")
    t0 = time.perf_counter()
    jax.block_until_ready(F(x0))
    stamp(f"f64 residual warm: {time.perf_counter() - t0:.3f}s")

    f32 = jnp.float32
    F32 = jax.jit(make_full_residual_fn(
        cast_model(model, f32), cast_ss(ss0, f32), cast_ss(ssT, f32),
        cast_paths(exog, f32)))
    x32 = x0.astype(f32)
    v32 = jnp.full_like(x32, 1e-3)
    jvp32 = jax.jit(lambda x, u: jax.jvp(F32, (x,), (u,))[1])
    jax.block_until_ready(jvp32(x32, v32))
    stamp("f32 JVP sweep compiled+ran")
    t0 = time.perf_counter()
    jax.block_until_ready(jvp32(x32, v32))
    stamp(f"f32 JVP sweep warm: {time.perf_counter() - t0:.3f}s")

    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=f32, eps=1e-8, verbose=True)
    x, info = solver(x0)
    jax.block_until_ready(x)
    stamp(f"solve #1 (incl. compile): outers={int(info['iterations'])}, "
          f"|F|={float(info['residual_norm']):.3e}")
    t0 = time.perf_counter()
    x, info = solver(x0)
    jax.block_until_ready(x)
    stamp(f"solve warm: {time.perf_counter() - t0:.3f}s, "
          f"|F|={float(info['residual_norm']):.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=300)
    ap.add_argument("--scale", type=int, default=1)
    a = ap.parse_args()
    main(a.T, a.scale)
