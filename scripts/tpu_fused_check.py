"""TPU check: fused sweep kernel compiles, matches XLA, and its speed.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fused_check.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hank_tpu.models import load_model
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

f32 = jnp.float32


def main():
    T = 300
    model = load_model("krusell_smith", T=T)
    ss0, ssT, Jbar = get_or_solve(model)
    Tm1 = T - 1
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, T, dtype=jnp.float64)}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)

    rng = np.random.default_rng(0)
    x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
    v = jnp.asarray(rng.normal(size=x_ss.shape))

    # Reference XLA f32 jvp
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss0, f32),
                                cast_ss(ssT, f32), cast_paths(exog, f32))
    jvp32 = jax.jit(lambda xx, vv: jax.jvp(F32, (xx,), (vv,))[1])
    t0 = time.perf_counter(); ref = jax.block_until_ready(jvp32(x.astype(f32), v.astype(f32)))
    print(f"xla f32 jvp compile+run: {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(jvp32(x.astype(f32), v.astype(f32)))
        ts.append(time.perf_counter()-t0)
    print(f"xla f32 jvp: {1e3*np.median(ts):.2f} ms")

    # Fused kernel
    jvp_fused = jax.jit(make_fused_jvp_dir(model, ss0, ssT, exog))
    t0 = time.perf_counter(); out = jax.block_until_ready(jvp_fused(x, v))
    print(f"fused jvp compile+run: {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(10):
        t0 = time.perf_counter(); jax.block_until_ready(jvp_fused(x, v))
        ts.append(time.perf_counter()-t0)
    print(f"fused jvp: {1e3*np.median(ts):.2f} ms")

    err = float(jnp.max(jnp.abs(out.astype(f32) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"max abs err {err:.3e} (scale {scale:.3e}, rel {err/scale:.2e})")


if __name__ == "__main__":
    main()
