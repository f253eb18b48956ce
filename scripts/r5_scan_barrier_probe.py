"""Round-5 forensics, part 3: can we make the SCANNED Bellman step as
accurate as the python-unrolled one?

`r5_scan_step_probe.py` results (TPU vs CPU, K=9 Bellman steps at fixed SS
prices, median relative W deviation):
  loop9 (python-unrolled in jit)   4.6e-14   <- clean
  scan9 (lax.scan)                 1.2e-8    <- ~1.3e-9/step one-sided bias
  scan1                            1.1e-14   <- loop elided, clean
  scan3                            4.2e-9
  scan9 unroll=9 / unroll=3        1.9e-7    <- WORSE (max 3.9e-7 ~ f32 eps)
CPU: all variants agree to 7e-13. The max deviations sitting at f32-epsilon
scale say XLA:TPU demotes some f64-emulated intermediate to f32 when the
step body is compiled in a scan/unrolled-scan context (standalone it is
exact to 1e-14).

This probe tests candidate production fixes, all K=9 steps:
  scan_barrier      optimization_barrier on the carry at body END
  scan_barrier_in   optimization_barrier on the carry at body START
  fori9             lax.fori_loop instead of scan
  while9            lax.while_loop instead of scan
  scan_noxs         scan with xs=None (prices closed over)
  loop9             control (clean baseline)
  scan9             control (dirty baseline)

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_scan_barrier_probe.py --out /tmp/r5_barrier_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_scan_barrier_probe.py --out /tmp/r5_barrier_cpu.npz
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.utils.checkpoint import get_or_solve

ap = argparse.ArgumentParser()
ap.add_argument("--out", required=True)
ap.add_argument("--k", type=int, default=9)
a = ap.parse_args()

model = load_model("hank_two_asset", T=300)
ss0, ssT, _ = get_or_solve(model)
names = model.var_names()
row = jnp.asarray([float(ssT.vars[n]) for n in names])
K = a.k


def step_fn(V, r):
    xv = {n: r[i] for i, n in enumerate(names)}
    return model.value_fn(V, xv, model)["Value"]


@jax.jit
def loop9(V):
    for _ in range(K):
        V = step_fn(V, row)
    return V


@jax.jit
def scan9(V):
    xs = jnp.broadcast_to(row, (K, row.shape[0]))
    v, _ = jax.lax.scan(lambda v, r: (step_fn(v, r), ()), V, xs)
    return v


@jax.jit
def scan_barrier(V):
    xs = jnp.broadcast_to(row, (K, row.shape[0]))

    def body(v, r):
        v = step_fn(v, r)
        return jax.lax.optimization_barrier(v), ()

    v, _ = jax.lax.scan(body, V, xs)
    return v


@jax.jit
def scan_barrier_in(V):
    xs = jnp.broadcast_to(row, (K, row.shape[0]))

    def body(v, r):
        v = jax.lax.optimization_barrier(v)
        return step_fn(v, r), ()

    v, _ = jax.lax.scan(body, V, xs)
    return v


@jax.jit
def fori9(V):
    return jax.lax.fori_loop(0, K, lambda i, v: step_fn(v, row), V)


@jax.jit
def while9(V):
    def cond(c):
        return c[0] < K

    def body(c):
        return (c[0] + 1, step_fn(c[1], row))

    return jax.lax.while_loop(cond, body, (0, V))[1]


@jax.jit
def scan_noxs(V):
    v, _ = jax.lax.scan(lambda v, _: (step_fn(v, row), ()), V, None, length=K)
    return v


out = {}
for name, fn in [
    ("loop9", loop9),
    ("scan9", scan9),
    ("scan_barrier", scan_barrier),
    ("scan_barrier_in", scan_barrier_in),
    ("fori9", fori9),
    ("while9", while9),
    ("scan_noxs", scan_noxs),
]:
    out[name] = np.asarray(fn(ssT.value))
    print(name, "done", flush=True)
np.savez_compressed(a.out, **out)
print("saved", a.out, flush=True)
