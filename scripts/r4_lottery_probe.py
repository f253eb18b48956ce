"""Accuracy + speed of 2-D joint-lottery lowerings on TPU emulated f64.

The exact-lowerings residual program (config.exact_lowerings) currently
gates only the INTERPOLATION paths; the forward block's joint lottery
still lowers to `_lottery_apply_2d_dense` — an emulated-f64 einsum that
the round-3 op probe measured at ~1.2e-10 relative per step. Over 299
forward steps that can dominate the two-asset residual floor. This probe
measures, at the real two-asset shapes, each candidate lowering against
an exact numpy scatter:

- einsum  : `_lottery_apply_2d_dense` (production TPU path)
- mulsum  : same one-hot algebra via broadcast-multiply + jnp.sum
            reductions (reduce ops measured ~1e-14 on TPU f64)
- scatter : 4-corner at[].add
- exog    : `exog_apply` tensordot (the Π mixing matmul)

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_lottery_probe.py
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r4_lottery_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import hank_tpu  # noqa: F401  (x64 on)
from hank_tpu.ops.transition import (_lottery_apply_2d_dense, lottery_weights)

rng = np.random.default_rng(3)
n_b, n_a, F = 40, 20, 10
bgrid = np.sort(rng.uniform(0, 120, n_b)); bgrid[0] = 0.0
agrid = np.sort(rng.uniform(0, 300, n_a)); agrid[0] = 0.0
D = rng.dirichlet(np.ones(n_b * n_a * F)).reshape(n_b, n_a, F)
pol_b = rng.uniform(0, 120, (n_b, n_a, F))
pol_a = rng.uniform(0, 300, (n_b, n_a, F))

jb_np = np.clip(np.searchsorted(bgrid, pol_b, side="left"), 1, n_b - 1)
wb_np = np.clip((pol_b - bgrid[jb_np - 1])
                / (bgrid[jb_np] - bgrid[jb_np - 1]), 0, 1)
ja_np = np.clip(np.searchsorted(agrid, pol_a, side="left"), 1, n_a - 1)
wa_np = np.clip((pol_a - agrid[ja_np - 1])
                / (agrid[ja_np] - agrid[ja_np - 1]), 0, 1)

ref = np.zeros((n_b, n_a, F))
for db in (0, 1):
    for da in (0, 1):
        w = (wb_np if db else 1 - wb_np) * (wa_np if da else 1 - wa_np)
        np.add.at(ref, (jb_np - 1 + db, ja_np - 1 + da,
                        np.broadcast_to(np.arange(F), w.shape)), w * D)

jD = jnp.asarray(D)
jb = jnp.asarray(jb_np.astype(np.int32))
wb = jnp.asarray(wb_np)
ja = jnp.asarray(ja_np.astype(np.int32))
wa = jnp.asarray(wa_np)
idx_w = ((jb, wb), (ja, wa))


@jax.jit
def v_einsum(D):
    return _lottery_apply_2d_dense(idx_w, D, (n_b, n_a))


@jax.jit
def v_mulsum(D):
    tb = jnp.arange(n_b, dtype=jb.dtype)
    ta = jnp.arange(n_a, dtype=ja.dtype)
    Sb = (jnp.where(jb[..., None] - 1 == tb, 1.0 - wb[..., None], 0.0)
          + jnp.where(jb[..., None] == tb, wb[..., None], 0.0))
    Sa = (jnp.where(ja[..., None] - 1 == ta, 1.0 - wa[..., None], 0.0)
          + jnp.where(ja[..., None] == ta, wa[..., None], 0.0))
    X = Sb * D[..., None]                     # (b, a, f, j)
    # (b, a, f, j, m) summed over (b, a) — reductions, not dot_general.
    return jnp.sum(X[..., :, None] * Sa[..., None, :], axis=(0, 1))


@jax.jit
def v_scatter(D):
    out = jnp.zeros_like(D)
    f_idx = jnp.broadcast_to(jnp.arange(F), D.shape)
    for db in (0, 1):
        for da in (0, 1):
            w = (wb if db else 1 - wb) * (wa if da else 1 - wa)
            out = out.at[jb - 1 + db, ja - 1 + da, f_idx].add(w * D)
    return out


variants = {"einsum": lambda: np.asarray(v_einsum(jD)),
            "mulsum": lambda: np.moveaxis(np.asarray(v_mulsum(jD)), 0, -1),
            "scatter": lambda: np.asarray(v_scatter(jD))}

print("backend:", jax.default_backend(), flush=True)
outs = {}
for name, fn in variants.items():
    t0 = time.time()
    try:
        out = fn()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    compile_t = time.time() - t0
    outs[name] = out
    dev = np.abs(out - ref).max()
    t0 = time.time()
    for _ in range(20):
        out = fn()
    dt = (time.time() - t0) / 20
    print(f"{name:8s} maxdev={dev:.3e}  {dt*1e3:7.2f} ms/step "
          f"(compile {compile_t:.1f}s)", flush=True)

# exog mixing accuracy (tensordot with the 10x10 Pi)
Pi = rng.dirichlet(np.ones(F), size=F)
ref_e = np.tensordot(ref, Pi, axes=([2], [0]))
je = jax.jit(lambda d: jnp.tensordot(d, jnp.asarray(Pi), axes=([2], [0])))
dev_e = np.abs(np.asarray(je(jnp.asarray(ref))) - ref_e).max()
print(f"exog tensordot maxdev={dev_e:.3e}", flush=True)
