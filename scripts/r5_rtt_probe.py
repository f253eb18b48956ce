"""Round-5 forensics, part 8: axon tunnel RTT vs device time.

The kernel phase probe showed the fused KS sweep costs ~27-30 ms ALMOST
REGARDLESS of its content (backward-only == forward-only == full ==
elementwise-gutted) — a fixed per-call cost, suspected to be the axon
remote-execution round trip, not device compute. The roofline's
"serial-latency bound, 47 µs/step" attribution would then be wrong: the
true on-device kernel time is the PIPELINED cost.

Measures, with host-fetch timing (jax.block_until_ready does not
synchronize raw pallas outputs through axon):
  1. trivial-program RTT: jit(x+1) on an (8,) array
  2. sequential kernel cost: fetch after every call (1 RTT per call)
  3. pipelined kernel cost: enqueue K calls, fetch once (device time/call
     + 1 RTT / K) — requires each call's INPUT independent of the last
     output, which matches the probe's replay pattern

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_rtt_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.utils.checkpoint import get_or_solve


def t_host_fetch(fn, *args, n=7, pipeline=1):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])   # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))


x8 = jnp.arange(8.0)
triv = jax.jit(lambda x: x + 1.0)
rtt = t_host_fetch(triv, x8)
print(f"trivial jit call + fetch: {rtt*1e3:.2f} ms", flush=True)

T = 300
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), T - 1)
v = jnp.full_like(x, 1e-3)
t = jnp.arange(1, T, dtype=jnp.float64)
exog = {"Z": 1.0 + 0.1 * 0.8 ** t}
sweep = jax.jit(make_fused_jvp_dir(model, ss0, ssT, exog))

seq = t_host_fetch(sweep, x, v)
print(f"fused sweep, sequential (1 fetch/call): {seq*1e3:.2f} ms", flush=True)
for K in (4, 16):
    pip = t_host_fetch(sweep, x, v, pipeline=K)
    print(f"fused sweep, pipelined x{K}: {pip*1e3:.2f} ms/call", flush=True)

# f64 exact residual program (the two-asset endgame's cost driver analogue,
# here the KS f64 residual): same decomposition
from hank_tpu.solvers.newton import make_full_residual_fn  # noqa: E402
F = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
seqF = t_host_fetch(F, x)
print(f"KS f64 residual, sequential: {seqF*1e3:.2f} ms", flush=True)
pipF = t_host_fetch(F, x, pipeline=8)
print(f"KS f64 residual, pipelined x8: {pipF*1e3:.2f} ms/call", flush=True)
