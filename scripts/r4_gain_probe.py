"""Measure the backward recursion's noise gain (two-asset model, CPU).

Mechanism test for the round-3 TPU residual floor: perturb the terminal
value by eps*randn and measure how the policy deviation GROWS through the
299-step backward recursion. A gain ≫ 1 means per-op rounding compounds
(the portfolio split's 1/g' feeds value noise back into the envelopes);
the round-4 reformulation (noise-insensitive envelope evaluation) should
bring the gain down to O(1).

CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
     python scripts/r4_gain_probe.py [--eps 1e-12] [--T 300]
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.blocks.backward import backward_iteration
from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.utils.checkpoint import get_or_solve

ap = argparse.ArgumentParser()
ap.add_argument("--eps", type=float, default=1e-12)
ap.add_argument("--T", type=int, default=300)
ap.add_argument("--x")
a = ap.parse_args()

model = load_model("hank_two_asset", T=a.T)
exog = generate_exog_paths(model, a.T - 1)
ss0, ssT, _ = get_or_solve(model)

if a.x:
    x = jnp.asarray(np.load(a.x))
else:
    import numpy as _np
    ssvals = _np.array([float(ssT.vars[n])
                        for n in model.vars_of_type("endogenous")])
    x = jnp.asarray(_np.tile(ssvals, a.T - 1))

bck = jax.jit(lambda v: backward_iteration(x, exog, model, ssT.vars, v))
v0 = jnp.asarray(ssT.value)
rng = np.random.default_rng(0)
dv = jnp.asarray(rng.standard_normal(v0.shape)) * a.eps

p0 = bck(v0)
p1 = bck(v0 + dv)
print(f"terminal value perturbation: {a.eps:.1e} (uniform randn)")
for k in p0:
    d = np.abs(np.asarray(p0[k]) - np.asarray(p1[k]))
    # deviation at late t (few steps from terminal) vs early t (many steps)
    print(f"{k}: dev@t=T-2 {d[-1].max():.3e}  t=150 {d[150].max():.3e}  "
          f"t=0 {d[0].max():.3e}  gain(t=0) {d[0].max()/a.eps:.1f}x")
