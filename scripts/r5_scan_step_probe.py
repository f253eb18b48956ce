"""Round-5 forensics: does the Bellman step lose f64 accuracy INSIDE lax.scan?

One standalone jitted Bellman step matches CPU to ~1e-14 median
(`r5_fusion_probe.py`), yet after 9 steps of the scanned backward recursion
the W path deviates ~1.2e-8 median (`r5_wpath_probe.py`) — and a toy
299-step scan of elementwise ops is clean (3e-14). Suspect: compilation
context — inside the scan body (or simply in a larger program) XLA:TPU
makes fusion/layout choices that weaken the f64 emulation of some op in
the REAL step.

Variants, all 9 iterations of model.value_fn at FIXED steady-state prices:
  loop9: python-unrolled inside one jit (no scan)
  scan9: lax.scan with a broadcast xs row
Run on CPU and TPU; compare dumps.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_scan_step_probe.py --out /tmp/r5_scanstep_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_scan_step_probe.py --out /tmp/r5_scanstep_cpu.npz
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


@jax.jit
def loop9(V):
    for _ in range(K):
        xv = {n: row[i] for i, n in enumerate(names)}
        V = model.value_fn(V, xv, model)["Value"]
    return V


def make_scan(k, unroll):
    @jax.jit
    def f(V):
        xs = jnp.broadcast_to(row, (k, row.shape[0]))
        def step(v, r):
            xv = {n: r[i] for i, n in enumerate(names)}
            return model.value_fn(v, xv, model)["Value"], ()
        v, _ = jax.lax.scan(step, V, xs, unroll=unroll)
        return v
    return f


out = {
    "loop9": np.asarray(loop9(ssT.value)),
    "scan9": np.asarray(make_scan(K, 1)(ssT.value)),
    # Growth curve: is the loss per while-iteration (carry boundary)?
    "scan1": np.asarray(make_scan(1, 1)(ssT.value)),
    "scan3": np.asarray(make_scan(3, 1)(ssT.value)),
    # unroll=K removes the while loop entirely; unroll=3 divides boundary
    # crossings by 3 — the candidate production fix if the boundary is the
    # trigger.
    "scan9_unroll9": np.asarray(make_scan(K, K)(ssT.value)),
    "scan9_unroll3": np.asarray(make_scan(K, 3)(ssT.value)),
}
np.savez_compressed(a.out, **out)
print("saved", a.out, flush=True)
