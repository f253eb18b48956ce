"""Standalone reproducer: v5e batch-width-dependent vmapped-JVP miscompile.

Round-3 finding (BASELINE.md): the vmapped MIXED-PRECISION direction program
of the KS T=300 solve — an f32 jvp through two lax.scans whose tail is
promoted to emulated f64 — returns WRONG tangents when compiled at batch
width 256, while the identical computation compiled at width 64 (or run on
CPU) is correct. With IDENTICAL row inputs the B=256 program returned a
row-0 tangent of norm ~1.4e4 where the B=64 program returns ~2.9e5. The
isolated f32 jvp, the isolated f64 matvec, and the plain f32 sweep were all
healthy at B=256 — only the composite mixed program miscompiles.

This script reproduces the signature WITHOUT the hank_tpu package: a
reversed f32 scan (EGM-like interpolation step) + forward f32 scan, tail
promoted to f64, jvp'd, vmapped, compiled at widths 64 and 256 with
identical rows. Healthy backends print agree=True for every width.

Run: env PYTHONPATH=/root/.axon_site python scripts/repro_b256_miscompile.py
(CPU: env JAX_PLATFORMS=cpu python scripts/repro_b256_miscompile.py)
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

T, N, K = 300, 1400, 596      # KS-sized: T periods, states, search dim
rng = np.random.default_rng(0)
grid = jnp.asarray(np.sort(rng.uniform(0, 200, N)))
W0 = jnp.asarray(rng.uniform(0.5, 1.5, N))


def pipeline(x_lo):
    """f32 scans + f64 tail — the mixed-precision direction map shape."""
    x32 = x_lo.astype(jnp.float32)
    g32 = grid.astype(jnp.float32)

    def bstep(v, xt):                      # backward: interp-like EGM step
        q = jnp.clip(v * (1.0 + 0.01 * xt), g32[0], g32[-1])
        idx = jnp.clip(jnp.sum(g32[None, :] < q[:, None], axis=1), 1, N - 1)
        lo, hi = g32[idx - 1], g32[idx]
        t = (q - lo) / (hi - lo)
        v_new = (1 - t) * v[idx - 1] + t * v[idx]
        return v_new, jnp.mean(v_new)

    xs = jnp.repeat(x32, (T - 1) // K + 1)[: T - 1]
    v_end, _ = jax.lax.scan(bstep, W0.astype(jnp.float32), xs, reverse=True)

    def fstep(d, xt):                      # forward: mixing step
        d_new = 0.99 * d + 0.01 * jnp.roll(d, 1) * (1.0 + xt)
        return d_new, jnp.dot(d_new, v_end)

    _, aggs = jax.lax.scan(fstep, v_end / jnp.sum(v_end), xs)
    # f64 tail (assemble/residual promotion in the real solver)
    a64 = aggs.astype(jnp.float64)
    a64 = jnp.tile(a64, K // a64.shape[0] + 1)[:K]
    return a64 - jnp.mean(a64) + x_lo.astype(jnp.float64) ** 2


def jvp_row(x, v):
    return jax.jvp(pipeline, (x,), (v,))[1]


x_row = jnp.asarray(rng.uniform(0.9, 1.1, K))
v_row = jnp.asarray(rng.uniform(-1, 1, K))

out = {"backend": jax.default_backend()}
ref = None
for B in (1, 64, 256):
    xb = jnp.broadcast_to(x_row, (B, K))
    vb = jnp.broadcast_to(v_row, (B, K))
    fn = jax.jit(jax.vmap(jvp_row))
    tb = np.asarray(fn(xb, vb))
    norms = np.linalg.norm(tb, axis=1)
    out[f"B{B}_row0_norm"] = float(norms[0])
    out[f"B{B}_row_spread"] = float(norms.max() - norms.min())
    if ref is None:
        ref = norms[0]
    out[f"B{B}_agree"] = bool(abs(norms[0] - ref) <= 1e-3 * abs(ref)
                              and out[f"B{B}_row_spread"] <= 1e-3 * abs(ref))
print(json.dumps(out), flush=True)
if not all(v for k, v in out.items() if k.endswith("_agree")):
    raise SystemExit("MISCOMPILE SIGNATURE REPRODUCED: batch-width-dependent "
                     "tangents (see BASELINE.md round-3 post-mortem)")
print("all widths agree — no miscompilation on this backend/toolchain")
