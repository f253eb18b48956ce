"""Round-5 forensics: decompose the two-asset TPU residual floor by channel.

The round-4 mystery (VERDICT Weak #1): the χ-regularizer caps the split
root's noise amplification at δa*/s ≤ (ε/W̄)/(2χ), yet the measured TPU
floor (‖F_tpu(x*)‖ = 6.2e-6) did not move under exact lowerings of every
backward interpolation AND the income expectation. Round-5 finding from the
round-4 stage dumps (/tmp/r4c_stages_*.npz): the FORWARD distribution block
(`ops/transition.lottery_apply[_multi]`, `exog_apply`) never consulted
`config.exact_lowerings` — on TPU it always contracts via emulated-f64 MXU
GEMMs (~1.2e-10 per-step rounding, `tpu_f64_op_probe.py`), a channel SHARED
by F and F_exact, which is exactly why their floors are identical to 5
digits.

This script runs ON CPU (native f64): it injects deterministic pseudo-noise
of a chosen relative size at a chosen pipeline stage and evaluates
‖F(x*)‖ at the CPU ground-truth root. Matching the injected channel's
magnitude to the measured TPU floor attributes the floor quantitatively.

CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python scripts/r5_noise_decompose.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

import hank_tpu.models.hank_two_asset as h2
import hank_tpu.ops.transition as tr
from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve


def noisify(rel):
    """Deterministic, value-keyed pseudo-noise: x -> x·(1 + rel·sin(ω x)).

    sin of a fast phase gives an effectively random sign/magnitude in
    [-rel, rel] per element while staying a pure traced function (works
    under jit/scan, reproducible)."""
    def f(x):
        return x * (1.0 + rel * jnp.sin(1.0e7 * x))
    return f


model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, _ = get_or_solve(model)
x = jnp.asarray(np.load("/tmp/hank2_xstar.npy"))

orig_joint = tr.lottery_apply_multi
orig_exog = tr.exog_apply
# The parser execs the model function file into its OWN module
# (`model/parser.py:_load_function_module`), so the ValueFunction the model
# actually calls does not read hank_tpu.models.hank_two_asset's globals —
# patch the namespace the model's value_fn resolves names in.
vf_globals = model.value_fn.__globals__
orig_expect = vf_globals["_expect_income"]

CASES = [
    ("baseline", None, 0.0),
    # Channel B: forward-block contraction rounding (per forward step).
    ("joint_lottery", "joint", 1.2e-10),
    ("joint_lottery_5e13", "joint", 5e-13),
    ("exog_mix", "exog", 5e-13),
    # Channel A: backward W-surface rounding (per Bellman step), amplified
    # through the χ-capped split. 5e-13 ≈ the hat-GEMM einsum class
    # (default program); 1e-15 ≈ the gather/elementwise class (exact).
    ("W_expect_5e13", "W", 5e-13),
    ("W_expect_1e15", "W", 1e-15),
    ("W_expect_1.2e10", "W", 1.2e-10),
]

out = {}
for name, stage, rel in CASES:
    tr.lottery_apply_multi = orig_joint
    tr.exog_apply = orig_exog
    vf_globals["_expect_income"] = orig_expect
    if stage == "joint":
        nz = noisify(rel)
        tr.lottery_apply_multi = lambda p, D, g, _nz=nz: _nz(orig_joint(p, D, g))
    elif stage == "exog":
        nz = noisify(rel)
        tr.exog_apply = lambda D, t, k, _nz=nz: _nz(orig_exog(D, t, k))
    elif stage == "W":
        nz = noisify(rel)
        vf_globals["_expect_income"] = \
            lambda Vm, Pi, _nz=nz: _nz(orig_expect(Vm, Pi))
    F = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
    v = np.asarray(F(x))
    out[name] = {"norm": float(np.linalg.norm(v)),
                 "max": float(np.abs(v).max())}
    print(name, out[name], flush=True)

tr.lottery_apply_multi = orig_joint
tr.exog_apply = orig_exog
vf_globals["_expect_income"] = orig_expect
print(json.dumps(out), flush=True)
