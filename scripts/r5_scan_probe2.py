"""Round-5 forensics, part 4: scan-context vs constant-folding.

`r5_scan_step_probe` found the REAL two-asset Bellman step deviates
~1.3e-9/step under `lax.scan` on TPU but is clean (4.6e-14) python-unrolled
— and `r5_synth_scan_probe` found a synthetic elementwise chain is clean in
EVERY loop context. Two competing explanations:

  (H1) scan-context demotion: XLA:TPU weakens f64 emulation when compiling
       While-loop bodies.
  (H2) constant folding: in the unrolled probe the SS prices were
       compile-time constants, so every price-dependent / V-independent
       array (income maps, accrual queries, hat weight matrices) was folded
       on the HOST in exact f64; under scan they are computed on-device
       where some op class rounds one-sidedly. The scan is innocent.

Discriminating variants (K Bellman steps of the real two-asset model at
fixed SS prices, W compared across backends):

  loop_const    python-unrolled, prices as jit CONSTANTS     (H1: clean, H2: clean)
  loop_traced   python-unrolled, prices as jit ARGUMENTS     (H1: clean, H2: dirty)
  scan          lax.scan, prices as scanned xs               (dirty control)
  scan_noxs_c   lax.scan, prices as jit constants closed over(H2: dirty — loop body
                still computes price-derived arrays on device ... unless XLA
                hoists them out of the loop as loop invariants and folds)
  fori          lax.fori_loop, prices as jit arguments
  while         lax.while_loop, prices as jit arguments
  scan_exact    lax.scan, prices as arguments, exact_lowerings trace
  loop_traced_exact  python-unrolled, arguments, exact_lowerings trace

Run on BOTH backends; the CPU run is the reference.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_scan_probe2.py --out /tmp/r5_probe2_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_scan_probe2.py --out /tmp/r5_probe2_cpu.npz
Then: python scripts/r5_scan_probe2.py --compare /tmp/r5_probe2_tpu.npz /tmp/r5_probe2_cpu.npz
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--out")
ap.add_argument("--k", type=int, default=9)
ap.add_argument("--compare", nargs=2)
a = ap.parse_args()

if a.compare:
    t = np.load(a.compare[0])
    c = np.load(a.compare[1])
    ref = c["loop_const"]
    out = {}
    for k in t.files:
        rr = np.abs(t[k] - c[k]) / np.maximum(np.abs(c[k]), 1e-300)
        out[k] = {"med_vs_cpu_same": float(np.median(rr)),
                  "max_vs_cpu_same": float(rr.max())}
    print(json.dumps(out, indent=1))
    raise SystemExit

from hank_tpu.config import exact_lowerings  # noqa: E402
from hank_tpu.models import load_model  # noqa: E402
from hank_tpu.utils.checkpoint import get_or_solve  # noqa: E402

model = load_model("hank_two_asset", T=300)
ss0, ssT, _ = get_or_solve(model)
names = model.var_names()
row_np = np.asarray([float(ssT.vars[n]) for n in names])
row = jnp.asarray(row_np)
K = a.k


def step_fn(V, r):
    xv = {n: r[i] for i, n in enumerate(names)}
    return model.value_fn(V, xv, model)["Value"]


@jax.jit
def loop_const(V):
    for _ in range(K):
        V = step_fn(V, row)
    return V


@jax.jit
def loop_traced(V, r):
    for _ in range(K):
        V = step_fn(V, r)
    return V


@jax.jit
def scan(V, r):
    xs = jnp.broadcast_to(r, (K, r.shape[0]))
    v, _ = jax.lax.scan(lambda v, rr: (step_fn(v, rr), ()), V, xs)
    return v


@jax.jit
def scan_noxs_c(V):
    v, _ = jax.lax.scan(lambda v, _: (step_fn(v, row), ()), V, None, length=K)
    return v


@jax.jit
def fori(V, r):
    return jax.lax.fori_loop(0, K, lambda i, v: step_fn(v, r), V)


@jax.jit
def while_(V, r):
    return jax.lax.while_loop(lambda c: c[0] < K,
                              lambda c: (c[0] + 1, step_fn(c[1], r)),
                              (0, V))[1]


with exact_lowerings(True):
    # trace-time flag: trace NOW via lower() so the context applies
    scan_exact = jax.jit(scan.__wrapped__).lower(ssT.value, row).compile()
    loop_traced_exact = jax.jit(
        loop_traced.__wrapped__).lower(ssT.value, row).compile()

out = {}
for name, fn, args in [
    ("loop_const", loop_const, (ssT.value,)),
    ("loop_traced", loop_traced, (ssT.value, row)),
    ("scan", scan, (ssT.value, row)),
    ("scan_noxs_c", scan_noxs_c, (ssT.value,)),
    ("fori", fori, (ssT.value, row)),
    ("while", while_, (ssT.value, row)),
    ("scan_exact", scan_exact, (ssT.value, row)),
    ("loop_traced_exact", loop_traced_exact, (ssT.value, row)),
]:
    out[name] = np.asarray(fn(*args))
    print(name, "done", flush=True)
np.savez_compressed(a.out, **out)
print("saved", a.out, flush=True)
