"""Measure emulated-f64 op accuracy on the TPU backend vs libm/numpy.

Round-3 findings on v5e (BASELINE.md two-asset post-mortem): elementwise
ops (pow/log/exp/rsqrt/div) round at ~1e-15 relative; matmul at ~1.2e-10;
einsum/matvec at ~5e-13; sum/cumsum at ~1e-14. precision="highest" does
not change the matmul error (the emulated-f64 GEMM itself is the limit).

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_f64_op_probe.py
"""
import time, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from functools import partial
t0=time.time()
rng = np.random.default_rng(7)
print("devices:", jax.devices(), flush=True)
def rel(a, b):
    a=np.asarray(a); return float(np.max(np.abs(a-b)/np.maximum(np.abs(b),1e-30)))
v = rng.standard_normal(4096); w = rng.standard_normal(4096)
A = rng.standard_normal((256,256)); B = rng.standard_normal((256,256))
H = rng.standard_normal((10,40,48)); V = rng.standard_normal((10,48))
C = rng.standard_normal((1495,1495)); x = rng.standard_normal(1495)
out = {}
out["dot4096"] = rel(jax.jit(jnp.dot)(jnp.asarray(v), jnp.asarray(w)), v@w)
out["dot4096_highest"] = rel(jax.jit(partial(jnp.dot, precision="highest"))(jnp.asarray(v), jnp.asarray(w)), v@w)
out["matmul256"] = rel(jax.jit(jnp.matmul)(jnp.asarray(A), jnp.asarray(B)), A@B)
out["matmul256_highest"] = rel(jax.jit(partial(jnp.matmul, precision="highest"))(jnp.asarray(A), jnp.asarray(B)), A@B)
out["einsum_eqk_ek"] = rel(jax.jit(lambda h,z: jnp.einsum("eqk,ek->eq",h,z))(jnp.asarray(H), jnp.asarray(V)), np.einsum("eqk,ek->eq",H,V))
out["einsum_highest"] = rel(jax.jit(lambda h,z: jnp.einsum("eqk,ek->eq",h,z,precision="highest"))(jnp.asarray(H), jnp.asarray(V)), np.einsum("eqk,ek->eq",H,V))
out["sum4096"] = rel(jax.jit(jnp.sum)(jnp.asarray(v)), v.sum())
out["cumsum"] = rel(jax.jit(jnp.cumsum)(jnp.asarray(v)), v.cumsum())
out["matvec1495"] = rel(jax.jit(lambda M,z: M@z)(jnp.asarray(C), jnp.asarray(x)), C@x)
for k, vv in out.items():
    print(f"{k}: max rel err {vv:.3e}", flush=True)
print("elapsed", round(time.time()-t0,1), flush=True)

# ── Round-5 extension: elementwise transcendental/dual-op accuracy AND BIAS
# (the docstring's round-3 "elementwise ~1e-15" claim was recorded from an
# earlier session; the committed probe only measured contractions. The
# round-5 W-path dumps show a ~1e-9/step ONE-SIDED bias in the backward
# recursion on v5e, so per-op signed bias is what matters now.) ──────────────
vals = np.abs(rng.standard_normal(65536)) + 0.05
big = np.exp(rng.uniform(-20, 20, 65536))          # W-like: spans decades
ops = {
    "rsqrt": (lambda x: jax.lax.rsqrt(x), lambda x: 1.0 / np.sqrt(x)),
    "sqrt": (jnp.sqrt, np.sqrt),
    "div": (lambda x: 1.0 / x, lambda x: 1.0 / x),
    "mul_selfsq": (lambda x: x * x, lambda x: x * x),
    "pow_gamma": (lambda x: x ** -0.64, lambda x: x ** -0.64),
    "log": (jnp.log, np.log),
    "exp_small": (lambda x: jnp.exp(-x), lambda x: np.exp(-x)),
}
for name, (jf, nf) in ops.items():
    for tag, arr in (("unit", vals), ("decades", big)):
        got = np.asarray(jax.jit(jf)(jnp.asarray(arr)))
        ref = nf(arr)
        r = (got - ref) / np.maximum(np.abs(ref), 1e-300)
        print(f"{name}/{tag}: maxrel {np.abs(r).max():.3e} "
              f"bias {r.mean():.3e}", flush=True)
# Chained FMA bias (the unrolled expectation form): 25 scalar*map adds.
acc = jnp.zeros(65536)
accn = np.zeros(65536)
for i in range(25):
    c = 0.04 * (1 + 0.01 * i)
    acc = acc + c * jnp.asarray(vals)
    accn = accn + c * vals
r = (np.asarray(jax.block_until_ready(acc)) - accn) / np.abs(accn)
print(f"fma_chain25: maxrel {np.abs(r).max():.3e} bias {r.mean():.3e}",
      flush=True)
