"""Round-5 forensics: is TPU emulated-f64 accuracy lost under FUSION?

Per-op probes measure ~1e-14 max rel error and ~2e-15 bias for every
elementwise op (tpu_f64_op_probe.py round-5 extension), yet the backward W
recursion deviates ~1.3e-9 PER STEP from CPU — identically for the
hat-GEMM and gather lowerings, i.e. the source is shared elementwise code.
Hypothesis: XLA:TPU emulates f64 as float-float (ds) op sequences, and an
optimization pass (algebraic simplification / fusion-level excess-precision
rules) weakens the emulation when ops are FUSED — so isolated ops measure
fine while compiled composites drift.

Test: elementwise composite chains representative of the Bellman step's
no-access branch, evaluated (a) as ONE jitted program and (b) eagerly
(op-by-op dispatch, no cross-op fusion), against numpy f64.
Also: one jitted step of the REAL two-asset Bellman operator (per-step
deviation ground truth), dumped for cross-backend comparison.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_fusion_probe.py --out /tmp/r5_fusion_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_fusion_probe.py --out /tmp/r5_fusion_cpu.npz
"""
import argparse
import json

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--out", required=True)
a = ap.parse_args()

rng = np.random.default_rng(17)
out = {}

# ── 1. Elementwise composite chain (the no-access EGM branch's op mix) ────
W = np.abs(rng.standard_normal((40, 20, 5))) * np.exp(
    rng.uniform(-8, 1, (40, 20, 5)))            # marginal-value-like decades
b = np.linspace(0.0, 120.0, 40)[:, None, None]
inc = np.abs(rng.standard_normal((1, 20, 5))) + 0.3
r = 0.0037


def chain(Wv, bv, incv):
    y = jax.lax.rsqrt(Wv)
    c = y * (1.5 - 0.5 * Wv * y * y)            # _crra_inv_marg at gamma=2
    implied = (c + bv - incv) / (1.0 + r)
    up = 1.0 / (c * c)                          # _crra_marg
    vb = (1.0 + r) * up
    return implied * 0.5 + vb * 0.25            # keep everything live


def chain_np(Wv, bv, incv):
    y = 1.0 / np.sqrt(Wv)
    c = y * (1.5 - 0.5 * Wv * y * y)
    implied = (c + bv - incv) / (1.0 + r)
    up = 1.0 / (c * c)
    vb = (1.0 + r) * up
    return implied * 0.5 + vb * 0.25


ref = chain_np(W, b, inc)
jitted = np.asarray(jax.jit(chain)(jnp.asarray(W), jnp.asarray(b),
                                   jnp.asarray(inc)))
eager = np.asarray(chain(jnp.asarray(W), jnp.asarray(b), jnp.asarray(inc)))
for tag, got in (("jit", jitted), ("eager", eager)):
    rr = (got - ref) / np.maximum(np.abs(ref), 1e-300)
    out[f"chain_{tag}_maxrel"] = float(np.abs(rr).max())
    out[f"chain_{tag}_bias"] = float(rr.mean())

# ── 2. 299-step scanned contraction of the composite ─────────────────────
beta = 0.98


def scan_f(y0):
    def step(y, _):
        z = jax.lax.rsqrt(y)
        c = z * (1.5 - 0.5 * y * z * z)
        y_new = beta * (0.3 + 0.7 * (1.0 / (c * c)))
        return y_new, ()
    yT, _ = jax.lax.scan(step, y0, None, length=299)
    return yT


y0 = np.abs(rng.standard_normal(4096)) + 0.2
got = np.asarray(jax.jit(scan_f)(jnp.asarray(y0)))
yn = y0.copy()
for _ in range(299):
    z = 1.0 / np.sqrt(yn)
    c = z * (1.5 - 0.5 * yn * z * z)
    yn = beta * (0.3 + 0.7 * (1.0 / (c * c)))
rr = (got - yn) / np.abs(yn)
out["scan299_maxrel"] = float(np.abs(rr).max())
out["scan299_bias"] = float(rr.mean())

# ── 3. One REAL Bellman step (jitted), dumped for cross-backend diff ─────
from hank_tpu.models import load_model           # noqa: E402
from hank_tpu.utils.checkpoint import get_or_solve  # noqa: E402

model = load_model("hank_two_asset", T=300)
ss0, ssT, _ = get_or_solve(model)
xv = {k: jnp.asarray(float(ssT.vars[k])) for k in model.var_names()}
step1 = jax.jit(lambda V: model.value_fn(V, xv, model))
res = step1(ssT.value)
arrs = {f"step_{k}": np.asarray(v) for k, v in res.items()}
np.savez_compressed(a.out, **arrs)
print(json.dumps(out), flush=True)
print("saved", a.out, flush=True)
