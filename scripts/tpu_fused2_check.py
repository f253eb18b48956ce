"""Compile + correctness + perf check of the fused two-asset sweep on TPU.

Times one JVP direction sweep: fused backward kernel (+ XLA forward) vs the
all-XLA jvp, and checks agreement at the f32 direction level. Round-4
reference points: XLA jvp sweep ~1.5 s warm (BASELINE.md roofline table,
binding term 2.5 ms/step serial latency); kernel target <= 150 ms.

TPU:  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fused2_check.py
CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/tpu_fused2_check.py        (interpret mode, tiny T)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.ops.fused_sweep2 import make_fused2_jvp_dir
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn
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
    on_tpu = jax.default_backend() != "cpu"
    T = 300 if on_tpu else 12
    model = load_model("hank_two_asset", T=T)
    if not on_tpu:
        from tests.test_hank_two_asset import build_small_two_asset

        model = build_small_two_asset(T=T)
        from tests.conftest import solve_ss_cached

        ss0 = ssT = solve_ss_cached(model)
    else:
        ss0, ssT, _ = get_or_solve(model)
    Tm1 = model.compspec.T - 1
    exog = generate_exog_paths(model, Tm1)
    endog = model.vars_of_type("endogenous")
    x = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
    rng = np.random.default_rng(0)
    x = x + 0.002 * jnp.asarray(rng.normal(size=x.shape))
    v = jnp.asarray(rng.normal(size=x.shape))

    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss0, f32),
                                cast_ss(ssT, f32), cast_paths(exog, f32))
    xla_jvp = jax.jit(lambda xx, vv: jax.jvp(F32, (xx,), (vv,))[1])
    fused = jax.jit(make_fused2_jvp_dir(model, ss0, ssT, exog,
                                        interpret=not on_tpu))

    out = {"backend": jax.default_backend(), "T": T}
    t0 = time.perf_counter()
    ref = jax.block_until_ready(xla_jvp(x.astype(f32), v.astype(f32)))
    out["xla_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    got = jax.block_until_ready(fused(x, v))
    out["fused_compile_s"] = round(time.perf_counter() - t0, 1)
    scale = float(jnp.max(jnp.abs(ref)))
    out["max_abs_diff"] = float(jnp.max(jnp.abs(got - ref)))
    out["ref_scale"] = scale
    out["agree"] = bool(out["max_abs_diff"] < 5e-5 * max(scale, 1.0))
    out["xla_sweep_ms"] = round(med(xla_jvp, x.astype(f32), v.astype(f32))
                                * 1e3, 1)
    out["fused_sweep_ms"] = round(med(fused, x, v) * 1e3, 1)
    out["speedup"] = round(out["xla_sweep_ms"] / out["fused_sweep_ms"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
