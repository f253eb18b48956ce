"""Batched fused sweep kernels vs the single-path kernel and XLA JVPs.

The batched kernel pair must reproduce `fused_sweep_jvp` row-for-row (same
floors/clips — only the batching layout differs) and `jax.jvp` of the f32
equilibrium map per ensemble row (rows carry DIFFERENT shock paths).
Interpret mode on CPU; the TPU compile/perf check is
scripts/measure_ensemble.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.ops.fused_sweep import fused_sweep_jvp
from hank_tpu.ops.fused_sweep_batch import (fused_sweep_jvp_batch,
                                            kernel_batch_width,
                                            make_fused_jvp_batch)
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn

f32 = jnp.float32


@pytest.fixture(scope="module")
def setup(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    Tm1 = model.compspec.T - 1
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    return model, ss, x_ss


def _price_batch(model, ss, B, seed=0):
    """Random per-path (r, w) price paths + tangents near the SS."""
    Tm1 = model.compspec.T - 1
    rng = np.random.default_rng(seed)
    r0, w0 = float(ss.vars["r"]), float(ss.vars["w"])
    r_b = r0 * (1.0 + 0.02 * rng.normal(size=(B, Tm1)))
    w_b = w0 * (1.0 + 0.02 * rng.normal(size=(B, Tm1)))
    dr_b = 0.01 * rng.normal(size=(B, Tm1))
    dw_b = 0.01 * rng.normal(size=(B, Tm1))
    return tuple(jnp.asarray(a, f32) for a in (r_b, w_b, dr_b, dw_b))


def test_batch_matches_single_rowwise(setup):
    model, ss, _ = setup
    model32 = cast_model(model, f32)
    ss32 = cast_ss(ss, f32)
    wealth = model32.endog_dims()[0]
    prod = model32.exog_dims()[0]
    p = model.params
    kw = dict(beta=float(p["β"]), gamma=float(p["γ"]),
              borrow_cons=float(p["borrow_cons"]), interpret=True)
    B = 3
    r_b, w_b, dr_b, dw_b = _price_batch(model, ss, B)
    batch = fused_sweep_jvp_batch(r_b, w_b, dr_b, dw_b, ss32.value, ss32.D,
                                  wealth.grid, prod.grid, prod.transition,
                                  **kw)
    for b in range(B):
        single = fused_sweep_jvp(r_b[b], w_b[b], dr_b[b], dw_b[b],
                                 ss32.value, ss32.D, wealth.grid,
                                 prod.grid, prod.transition, **kw)
        for got, ref in zip(batch, single):
            # Same math, different summation order (static-FMA mixing vs
            # MXU dot): f32 roundoff-level agreement.
            scale = float(jnp.max(jnp.abs(ref))) + 1e-12
            assert float(jnp.max(jnp.abs(got[b] - ref))) < 2e-5 * max(scale, 1.0)


def test_batch_chunking_ragged(setup, monkeypatch):
    """B=5 through forced width-2 chunks (ragged tail) == unchunked."""
    import hank_tpu.ops.fused_sweep_batch as fsb

    model, ss, _ = setup
    model32 = cast_model(model, f32)
    ss32 = cast_ss(ss, f32)
    wealth = model32.endog_dims()[0]
    prod = model32.exog_dims()[0]
    p = model.params
    kw = dict(beta=float(p["β"]), gamma=float(p["γ"]),
              borrow_cons=float(p["borrow_cons"]), interpret=True)
    args = _price_batch(model, ss, 5, seed=2)
    full = fused_sweep_jvp_batch(*args, ss32.value, ss32.D, wealth.grid,
                                 prod.grid, prod.transition, **kw)
    monkeypatch.setattr(fsb, "kernel_batch_width", lambda na, B: 2)
    chunked = fused_sweep_jvp_batch(*args, ss32.value, ss32.D, wealth.grid,
                                    prod.grid, prod.transition, **kw)
    for got, ref in zip(chunked, full):
        assert float(jnp.max(jnp.abs(got - ref))) == 0.0


def test_kernel_batch_width_vmem_rule():
    # Round-4 rule: budget for the ~8 (B, n_a, n_a) forward-lottery
    # intermediates the register allocator actually keeps live (the first
    # width-64 compile at n_a_pad=256 died at 135.5M/128M vmem spill slots).
    assert kernel_batch_width(256, 64) == 16
    assert kernel_batch_width(512, 64) == 4
    assert kernel_batch_width(512, 8) == 4
    assert kernel_batch_width(1024, 64) == 1
    assert kernel_batch_width(256, 2) == 2


def test_jvp_batch_matches_xla_per_row(setup):
    """make_fused_jvp_batch == per-row jax.jvp of the f32 residual map,
    with DIFFERENT shock paths per row."""
    model, ss, x_ss = setup
    Tm1 = model.compspec.T - 1
    B = 3
    rng = np.random.default_rng(4)
    rhos = [0.7, 0.8, 0.9]
    exog_batch = {"Z": jnp.asarray(
        [1.0 + 0.1 * rhos[b] ** np.arange(1, Tm1 + 1) for b in range(B)])}
    x_b = jnp.asarray(x_ss)[None] * (1.0 + 0.005 * rng.normal(
        size=(B, x_ss.shape[0])))
    v_b = jnp.asarray(rng.normal(size=(B, x_ss.shape[0])))

    jvp_batch = make_fused_jvp_batch(model, ss, ss, interpret=True)
    out = jvp_batch(x_b, v_b, exog_batch)

    for b in range(B):
        exog = {"Z": exog_batch["Z"][b]}
        F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                    cast_ss(ss, f32), cast_paths(exog, f32))
        ref = jax.jvp(F32, (x_b[b].astype(f32),), (v_b[b].astype(f32),))[1]
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out[b] - ref))) < 3e-5 * max(scale, 1.0)


def test_solve_ensemble_host_fused_matches_xla(ks_small, ks_small_ss):
    """The batched-kernel ensemble solve (fused='pallas', interpret on CPU)
    converges and matches the vmapped-XLA direction path."""
    from hank_tpu.parallel.ensemble import solve_ensemble_host
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss = ks_small, ks_small_ss
    T = model.compspec.T
    Tm1 = T - 1
    B = 4
    t = jnp.arange(1, T, dtype=jnp.float64)
    rhos = 0.5 + 0.4 * jnp.arange(B, dtype=jnp.float64) / B
    exog_b = {"Z": 1.0 + 0.05 * rhos[:, None] ** t[None, :]}
    x0 = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), Tm1)
    Jbar = get_steady_state_jacobian(ss, model)

    x_pal, info_pal = solve_ensemble_host(x0, Jbar, exog_b, model, ss, ss,
                                          eps=1e-9, fused="pallas")
    assert bool(jnp.all(info_pal["residual_norm"] < 1e-9))
    x_xla, _ = solve_ensemble_host(x0, Jbar, exog_b, model, ss, ss,
                                   eps=1e-9, fused="xla")
    assert float(jnp.max(jnp.abs(x_pal - x_xla))) < 1e-7


def test_batch_kernels_have_no_64bit_vectors(setup):
    """Mosaic layout-inference guard (conftest helper) for the batched pair."""
    from tests.conftest import assert_no_64bit_vectors_in_kernels
    model, ss, x_ss = setup
    B = 2
    Tm1 = model.compspec.T - 1
    exog_b = {"Z": jnp.asarray(
        [1.0 + 0.1 * rho ** np.arange(1, Tm1 + 1) for rho in (0.7, 0.9)])}
    x_b = jnp.tile(x_ss[None], (B, 1))
    v_b = jnp.ones_like(x_b)
    jvp_batch = make_fused_jvp_batch(model, ss, ss, interpret=False)
    assert_no_64bit_vectors_in_kernels(jvp_batch, x_b, v_b, exog_b)
