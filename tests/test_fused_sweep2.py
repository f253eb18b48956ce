"""Fused two-asset sweep kernel vs the XLA jvp-through-scans path.

The backward Pallas kernel (`ops/fused_sweep2.py`) must reproduce
`jax.jvp` of the f32 two-asset equilibrium map to f32 roundoff — same
floors, clips, split-FOC root, envelope-combo and boundary tangent
conventions as `models/hank_two_asset.py::ValueFunction`. Runs in Pallas
interpret mode on CPU with the XLA reference forced onto the hat-interp
lowerings (the TPU production path the kernel mirrors); the non-interpret
TPU compile + perf check is scripts/tpu_fused2_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.ops.fused_sweep2 import (make_fused2_jvp_dir,
                                       supports_fused_sweep2)
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn
from tests.conftest import solve_ss_cached
from tests.test_hank_two_asset import build_small_two_asset

f32 = jnp.float32


@pytest.fixture(scope="module")
def setup():
    model = build_small_two_asset()
    ss = solve_ss_cached(model)
    Tm1 = model.compspec.T - 1
    exog = {"G": 0.005 * 0.8 ** jnp.arange(1, model.compspec.T)}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    return model, ss, exog, x_ss


def test_supports_predicate():
    assert supports_fused_sweep2(build_small_two_asset(T=8))
    from hank_tpu.models import load_model
    assert not supports_fused_sweep2(load_model("krusell_smith", T=8))


def test_fused2_jvp_matches_xla(setup, monkeypatch):
    """Kernel jvp == XLA jvp on the hat lowerings, to f32 roundoff.

    HANK_TPU_BILINEAR/INTERP pin the XLA reference to the hat paths the
    kernel mirrors (the TPU defaults; on this CPU suite the defaults would
    be the gather forms — ulp-equivalent on interiors but distinct programs).
    """
    monkeypatch.setenv("HANK_TPU_BILINEAR", "hat")
    monkeypatch.setenv("HANK_TPU_INTERP", "hat")
    model, ss, exog, x_ss = setup
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    jvp_dir = make_fused2_jvp_dir(model, ss, ss, exog, interpret=True)

    rng = np.random.default_rng(7)
    for trial in range(3):
        x = x_ss + 0.005 * jnp.asarray(rng.normal(size=x_ss.shape))
        v = jnp.asarray(rng.normal(size=x_ss.shape))
        ref = jax.jvp(F32, (x.astype(f32),), (v.astype(f32),))[1]
        out = jvp_dir(x, v)
        scale = float(jnp.max(jnp.abs(ref)))
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 5e-5 * max(scale, 1.0), (trial, err, scale)


def test_fused2_forward_kernel_matches_xla(setup, monkeypatch):
    """Forward Pallas kernel (flat-state separable-GEMM joint lottery) ==
    jvp of `forward_iteration` — same policies in, aggregate paths out."""
    monkeypatch.setenv("HANK_TPU_BILINEAR", "hat")
    monkeypatch.setenv("HANK_TPU_INTERP", "hat")
    model, ss, exog, x_ss = setup
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    jvp_pallas = make_fused2_jvp_dir(model, ss, ss, exog, interpret=True,
                                     forward="pallas")
    jvp_xlafwd = make_fused2_jvp_dir(model, ss, ss, exog, interpret=True,
                                     forward="xla")
    rng = np.random.default_rng(11)
    x = x_ss + 0.005 * jnp.asarray(rng.normal(size=x_ss.shape))
    v = jnp.asarray(rng.normal(size=x_ss.shape))
    ref = jax.jvp(F32, (x.astype(f32),), (v.astype(f32),))[1]
    a = jvp_xlafwd(x, v)
    b = jvp_pallas(x, v)
    scale = float(jnp.max(jnp.abs(ref)))
    # kernel-vs-kernel: the two forwards consume identical policies, so
    # they must agree even more tightly than either does with `ref`.
    assert float(jnp.max(jnp.abs(b - a))) < 2e-5 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(b - ref))) < 5e-5 * max(scale, 1.0)


def test_fused2_kernels_have_no_64bit_vectors(setup):
    """Mosaic layout-inference guard (see conftest helper): the first v5e
    compile of this kernel pair CHECK-crashed on f64 vectors bred by
    unpinned literals (_hat_q's where(b, 1.0, 0.0); jnp.eye's i64 iota)."""
    from tests.conftest import assert_no_64bit_vectors_in_kernels
    model, ss, exog, x_ss = setup
    fused = make_fused2_jvp_dir(model, ss, ss, exog, interpret=False)
    assert_no_64bit_vectors_in_kernels(fused, x_ss, jnp.ones_like(x_ss))
