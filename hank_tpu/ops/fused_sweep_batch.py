"""Batched fused primal+tangent household sweeps (ensemble DP path).

Round-3 verdict item 3: the B=64 ensemble SOLVE paid 10x per-path cost
because every lockstep Richardson sweep ran as vmapped XLA scans — the
fused single-path kernel (`ops/fused_sweep.py`) is unusable under vmap
(a Pallas batching rule would re-trace it per row). This module batches
the kernel itself: one pair of Pallas kernels advances ALL B paths one
period per grid step, so the ~50 us fixed per-step cost (launch/loop
sequencing — the binding term per scripts/roofline.py; the VPU flops are
~2 us) is paid once per period for the whole batch instead of once per
period per path.

Design (vs the single-path kernel, whose per-step math this mirrors 1:1):

- TWO kernels with `grid=(T-1,)` instead of one kernel with an internal
  fori_loop: the backward EGM kernel streams per-period policy blocks
  (1, n_e, B, n_a) OUT to HBM, the forward lottery kernel streams them
  back IN. Single-path keeps (T-1, n_e, n_a) policy scratch in VMEM
  (~4.3 MB); batched that is B x 137 MB at KS size — only HBM can hold
  it, and Pallas grid-block streaming is exactly the mechanism (the
  ~0.5 MB/step DMA is ~0.6 us against 819 GB/s, hidden behind compute).
  Carries (V, dV / D, dD) persist across grid steps in VMEM scratch
  (TPU grids are sequential), initialized under `pl.when(step == 0)`.
- Per-e UNROLLED Python loop over (B, n_a) 2-D tiles instead of 3-D
  (n_e, B, n_a) tensor ops: row-generic helpers (`_bracket`,
  `_gather_lanes`) are reused with rows = paths, the exogenous mixing
  E = Pi V becomes n_e^2 compile-time-constant FMAs on (B, n_a) maps
  (Pi and the e-grid are STATIC floats — they are model data, known at
  build time), and no Mosaic 3-D dot/transpose lowering is exercised.
- Per-path prices enter as (T-1, B, 1) VMEM arrays sliced one period per
  grid step — the batched generalization of the single-path kernel's
  SMEM scalar paths.
- The forward lottery still builds (B, n_a, n_a) hat tensors per e; VMEM
  bounds the batch width per kernel call (`kernel_batch_width`), and the
  wrapper chunks larger ensembles over sequential kernel-pair calls.

Semantics contract: identical to `fused_sweep_jvp` per path (same floors,
clips, boundary conventions — tests/test_fused_batch.py asserts equality
against the single-path kernel and the XLA JVP). Reference hot primitive:
/root/reference/NewtonRaphson.jl:95 (one JVP of the equilibrium map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hank_tpu.ops.fused_sweep import (_VREG_LANES, _bracket, _bucket_Tm1,
                                      _fused_price_hook, _gather_lanes,
                                      supports_fused_sweep)

f32 = jnp.float32
i32 = jnp.int32


def kernel_batch_width(n_a_pad: int, B: int) -> int:
    """Largest per-kernel-call batch width the forward lottery fits in VMEM.

    The binding allocation is the per-e (B, n_a, n_a) hat construction:
    ~4 live f32 intermediates (measured on the single-path kernel: the
    512-lane large-grid KS runs ~31 MB of scoped VMEM = 4 temps) against
    a ~90 MB budget (of the v5e core's 128 MB, leaving room for carries,
    streamed blocks and double-buffering). Power-of-two widths keep the
    sublane tiling whole.
    """
    # Round-4 real-TPU measurement: the first B=64 compile at n_a_pad=256
    # died with "Ran out of memory in memory space vmem. Used 135.52M of
    # 128.00M — register allocator spill slots in _sweep_chunk" (the
    # previous 4-temps estimate with a 90 MB budget picked width 64). The
    # register allocator keeps ~8 (B, n_a, n_a) f32 intermediates of the
    # forward lottery live across the unrolled e-loop, so budget for 8 and
    # leave half the 128 MB core for carries/streamed blocks/double
    # buffering.
    budget = 60e6
    per_b = 8 * n_a_pad * n_a_pad * 4.0
    w = int(budget / per_b)
    width = 1
    while width * 2 <= min(w, 64):
        width *= 2
    return min(width, B)


def _make_bwd_kernel(B: int, n_a: int, n_e: int, pi, egrid,
                     beta: float, gamma: float, borrow_cons: float,
                     n_real: int):
    """Backward dual EGM kernel, grid over t (reversed): one period for all
    B paths per grid step; per-period policies stream out to HBM blocks.

    pi / egrid are tuples of python floats — compile-time constants.
    """
    inv_g = -1.0 / gamma

    def kernel(r_ref, w_ref, dr_ref, dw_ref,      # (1, B, 1) period blocks
               vT_ref,                            # (n_e, B, n_a)
               grid_ref,                          # (B, n_a)
               pol_ref, dpol_ref,                 # out blocks (1, n_e, B, n_a)
               V_scr, dV_scr):                    # scratch (n_e, B, n_a)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for e in range(n_e):
                V_scr[e] = vT_ref[e]
                dV_scr[e] = jnp.zeros((B, n_a), f32)

        grid2 = grid_ref[:, :]
        lane_real = jax.lax.broadcasted_iota(i32, (B, n_a), 1) \
            < jnp.asarray(n_real, i32)
        r = r_ref[0]                               # (B, 1)
        w = w_ref[0]
        dr = dr_ref[0]
        dw = dw_ref[0]
        inv1r = 1.0 / (1.0 + r)

        V = [V_scr[e] for e in range(n_e)]
        dV = [dV_scr[e] for e in range(n_e)]
        for e in range(n_e):
            # 1. Expectation over e' — Pi row as static FMA coefficients.
            E = pi[e][0] * V[0]
            dE = pi[e][0] * dV[0]
            for f in range(1, n_e):
                E = E + pi[e][f] * V[f]
                dE = dE + pi[e][f] * dV[f]
            live = E > 1e-12
            E = jnp.maximum(E, 1e-12)
            dE = jnp.where(live, dE, 0.0)

            # 2. Euler inversion c = (beta E)^(-1/gamma).
            c = (beta * E) ** inv_g
            dc = inv_g * c / E * dE

            # 3. Implied current wealth on the endogenous grid.
            labor = egrid[e]
            implied = (c - w * labor + grid2) * inv1r
            dimplied = (dc - dw * labor) * inv1r - implied * (dr * inv1r)
            implied = jnp.where(lane_real, implied, jnp.asarray(1e30, f32))
            dimplied = jnp.where(lane_real, dimplied, jnp.asarray(0.0, f32))

            # 4. Interpolate the savings policy onto the exogenous grid.
            idx = _bracket(implied, grid2, n_a)
            one = jnp.asarray(1, i32)
            lo, dlo, vlo = _gather_lanes(idx - one, implied, dimplied, grid2)
            hi, dhi, vhi = _gather_lanes(idx, implied, dimplied, grid2)
            den = hi - lo
            safe = jnp.where(den > 0, den, 1.0)
            tw_raw = (grid2 - lo) / safe
            interior = (tw_raw > 0.0) & (tw_raw < 1.0) & (den > 0)
            tw = jnp.clip(tw_raw, 0.0, 1.0)
            dtw = jnp.where(interior, -(dlo + tw * (dhi - dlo)) / safe, 0.0)
            pol = vlo + tw * (vhi - vlo)
            dpol = dtw * (vhi - vlo)

            # 5. Borrowing constraint (clip kills the tangent when binding).
            unbound = pol > borrow_cons
            pol = jnp.maximum(pol, borrow_cons)
            dpol = jnp.where(unbound, dpol, 0.0)

            # 6. Consumption + marginal value on the exogenous grid.
            cg_raw = (1.0 + r) * grid2 + w * labor - pol
            cg_live = cg_raw > 1e-12
            cg = jnp.maximum(cg_raw, 1e-12)
            dcg = jnp.where(cg_live, dr * grid2 + dw * labor - dpol, 0.0)
            cpow = cg ** (-gamma)
            V_scr[e] = (1.0 + r) * cpow
            dV_scr[e] = dr * cpow + (1.0 + r) * (-gamma) * cpow / cg * dcg

            pol_ref[0, e] = pol
            dpol_ref[0, e] = dpol

    return kernel


def _make_fwd_kernel(B: int, n_a: int, n_e: int, pi, egrid,
                     n_real: int):
    """Forward dual hat-basis lottery kernel, grid over t: per-period policy
    blocks stream back in; distribution carries live in VMEM scratch."""

    def kernel(r_ref, w_ref, dr_ref, dw_ref,       # (1, B, 1) period blocks
               d0_ref,                             # (n_e, B, n_a)
               grid_ref, glo_ref, ghi_ref,         # (B, n_a) static tables
               iup_ref, idn_ref,
               pol_ref, dpol_ref,                  # in blocks (1, n_e, B, n_a)
               agg_ref, dagg_ref,                  # out blocks (1, B, 1)
               aggc_ref, daggc_ref,
               D_scr, dD_scr):                     # scratch (n_e, B, n_a)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for e in range(n_e):
                D_scr[e] = d0_ref[e]
                dD_scr[e] = jnp.zeros((B, n_a), f32)

        grid2 = grid_ref[:, :]
        glo = glo_ref[:, :]
        ghi = ghi_ref[:, :]
        iup = iup_ref[:, :]
        idn = idn_ref[:, :]
        g_bot = grid2[:, 0:1]
        g_top = grid2[:, n_real - 1:n_real]
        r = r_ref[0]
        w = w_ref[0]
        dr = dr_ref[0]
        dw = dw_ref[0]

        # Endogenous (within-e) lottery push per e: (B, n_a, n_a) hat tensor
        # — the VMEM-binding allocation (see kernel_batch_width).
        D_half = []
        dD_half = []
        pols = []
        dpols = []
        for e in range(n_e):
            pol = pol_ref[0, e]
            dpol = dpol_ref[0, e]
            pols.append(pol)
            dpols.append(dpol)
            D = D_scr[e]
            dD = dD_scr[e]
            p = jnp.minimum(jnp.maximum(pol, g_bot), g_top)
            pb = p[:, :, None]                      # (B, a_from, 1)
            up = (pb - glo[:, None, :]) * iup[:, None, :]
            down = (ghi[:, None, :] - pb) * idn[:, None, :]
            falling = down < up
            hat_raw = jnp.where(falling, down, up)
            sup = hat_raw > 0.0
            hat = jnp.maximum(hat_raw, 0.0)
            slope = jnp.where(sup,
                              jnp.where(falling, -idn[:, None, :],
                                        iup[:, None, :]),
                              jnp.asarray(0.0, f32))
            D_half.append(jnp.sum(hat * D[:, :, None], axis=1))
            dD_half.append(jnp.sum(hat * dD[:, :, None]
                                   + slope * (dpol * D)[:, :, None], axis=1))

        # Exogenous mixing D'[e'] = sum_e Pi[e, e'] D_half[e] — static FMAs.
        agg = None
        dagg = None
        aggc = None
        daggc = None
        for e in range(n_e):
            D_new = pi[0][e] * D_half[0]
            dD_new = pi[0][e] * dD_half[0]
            for f in range(1, n_e):
                D_new = D_new + pi[f][e] * D_half[f]
                dD_new = dD_new + pi[f][e] * dD_half[f]
            D_scr[e] = D_new
            dD_scr[e] = dD_new

            pol = pols[e]
            dpol = dpols[e]
            a_term = jnp.sum(pol * D_new, axis=1, keepdims=True)   # (B, 1)
            da_term = jnp.sum(dpol * D_new + pol * dD_new, axis=1,
                              keepdims=True)
            labor = egrid[e]
            cg_raw = (1.0 + r) * grid2 + w * labor - pol
            cg_live = cg_raw > 1e-12
            cg = jnp.maximum(cg_raw, 1e-12)
            dcg = jnp.where(cg_live, dr * grid2 + dw * labor - dpol, 0.0)
            c_term = jnp.sum(cg * D_new, axis=1, keepdims=True)
            dc_term = jnp.sum(dcg * D_new + cg * dD_new, axis=1,
                              keepdims=True)
            agg = a_term if agg is None else agg + a_term
            dagg = da_term if dagg is None else dagg + da_term
            aggc = c_term if aggc is None else aggc + c_term
            daggc = dc_term if daggc is None else daggc + dc_term

        agg_ref[0] = agg
        dagg_ref[0] = dagg
        aggc_ref[0] = aggc
        daggc_ref[0] = daggc

    return kernel


@functools.partial(jax.jit, static_argnames=("pi", "eg", "beta", "gamma",
                                             "borrow_cons", "interpret"))
def _sweep_chunk(r_b, w_b, dr_b, dw_b, V_T, D0, grid,
                 *, pi: tuple, eg: tuple, beta: float, gamma: float,
                 borrow_cons: float, interpret: bool = False):
    """One kernel-pair call over a (B_chunk, T-1) price batch.

    pi / eg: the Markov matrix and e-grid as nested tuples of python floats
    — STATIC (compile-time FMA constants in the kernels). They are model
    data, concrete at build time; extracting them here would fail under an
    enclosing trace, so callers do it eagerly (`_static_markov`).
    """
    B, Tm1 = r_b.shape
    n_a, n_e = V_T.shape
    na_pad = -(-n_a // _VREG_LANES) * _VREG_LANES
    pad_n = na_pad - n_a
    grid32 = grid.astype(f32)
    V32 = V_T.T.astype(f32)                        # (n_e, n_a)
    D32 = D0.T.astype(f32)
    if pad_n:
        step = grid32[-1] - grid32[-2]
        grid32 = jnp.concatenate(
            [grid32, grid32[-1] + step * jnp.arange(1, pad_n + 1, dtype=f32)])
        V32 = jnp.concatenate([V32, jnp.ones((n_e, pad_n), f32)], axis=1)
        D32 = jnp.concatenate([D32, jnp.zeros((n_e, pad_n), f32)], axis=1)
    glo = jnp.concatenate([grid32[:1] - (grid32[1] - grid32[0]), grid32[:-1]])
    ghi = jnp.concatenate([grid32[1:], grid32[-1:] + (grid32[-1] - grid32[-2])])
    iup = 1.0 / (grid32 - glo)
    idn = 1.0 / (ghi - grid32)
    tile_b = lambda v: jnp.tile(v[None, :], (B, 1))        # noqa: E731
    tile_eb = lambda m: jnp.tile(m[:, None, :], (1, B, 1))  # noqa: E731

    col = lambda p: p.astype(f32).T[:, :, None]            # noqa: E731  (Tm1, B, 1)
    r_c, w_c, dr_c, dw_c = col(r_b), col(w_b), col(dr_b), col(dw_b)

    # Index maps must return i32 everywhere: under jax_enable_x64 a python
    # literal 0 traces as an i64 constant and Mosaic fails to legalize the
    # map's mixed-type func.return (first real-TPU compile of these
    # kernels, 2026-08-19; the single-path kernels use whole-array specs
    # and never hit it). The zero must be DERIVED from the i32 index arg
    # (`i * 0`) — index maps may not capture traced constants.
    price_rev = pl.BlockSpec((1, B, 1),
                             lambda i, T=Tm1: (T - 1 - i, i * 0, i * 0))
    price_fwd = pl.BlockSpec((1, B, 1), lambda i: (i, i * 0, i * 0))
    full3 = pl.BlockSpec((n_e, B, na_pad), lambda i: (i * 0,) * 3)
    full2 = pl.BlockSpec((B, na_pad), lambda i: (i * 0,) * 2)
    pol_rev = pl.BlockSpec((1, n_e, B, na_pad),
                           lambda i, T=Tm1: (T - 1 - i, i * 0, i * 0, i * 0))
    pol_fwd = pl.BlockSpec((1, n_e, B, na_pad),
                           lambda i: (i, i * 0, i * 0, i * 0))
    out_fwd = pl.BlockSpec((1, B, 1), lambda i: (i, i * 0, i * 0))

    bwd = _make_bwd_kernel(B, na_pad, n_e, pi, eg,
                           float(beta), float(gamma), float(borrow_cons), n_a)
    pol, dpol = pl.pallas_call(
        bwd,
        grid=(Tm1,),
        out_shape=(jax.ShapeDtypeStruct((Tm1, n_e, B, na_pad), f32),) * 2,
        in_specs=[price_rev] * 4 + [full3, full2],
        out_specs=(pol_rev, pol_rev),
        scratch_shapes=[pltpu.VMEM((n_e, B, na_pad), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r_c, w_c, dr_c, dw_c, tile_eb(V32), tile_b(grid32))

    fwd = _make_fwd_kernel(B, na_pad, n_e, pi, eg, n_a)
    agg, dagg, aggc, daggc = pl.pallas_call(
        fwd,
        grid=(Tm1,),
        out_shape=(jax.ShapeDtypeStruct((Tm1, B, 1), f32),) * 4,
        in_specs=[price_fwd] * 4 + [full3] + [full2] * 5 + [pol_fwd] * 2,
        out_specs=(out_fwd,) * 4,
        scratch_shapes=[pltpu.VMEM((n_e, B, na_pad), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r_c, w_c, dr_c, dw_c, tile_eb(D32), tile_b(grid32),
      tile_b(glo), tile_b(ghi), tile_b(iup), tile_b(idn), pol, dpol)

    tr = lambda a: a[:, :, 0].T                    # noqa: E731  (B, Tm1)
    return tr(agg), tr(dagg), tr(aggc), tr(daggc)


def _static_markov(Pi, e_grid):
    """Markov matrix + e-grid as nested python-float tuples (must be called
    on CONCRETE arrays — i.e. outside any trace, at build time)."""
    import numpy as np

    pi = tuple(tuple(float(v) for v in row) for row in np.asarray(Pi))
    eg = tuple(float(v) for v in np.asarray(e_grid).reshape(-1))
    return pi, eg


def fused_sweep_jvp_batch(r_b, w_b, dr_b, dw_b, V_T, D0, grid, e_grid, Pi,
                          *, beta: float, gamma: float, borrow_cons: float,
                          interpret: bool = False):
    """Batched JVP of the household map: (B, T-1) price paths + tangents ↦
    (B, T-1) aggregate savings/consumption paths + tangents.

    Chunks the batch over sequential kernel-pair calls when the forward
    lottery's VMEM need exceeds the per-call budget (`kernel_batch_width`);
    a ragged tail is padded with row 0 and trimmed. Pi / e_grid must be
    concrete (they become compile-time kernel constants) — call this outside
    jit, or build a closure via `make_fused_jvp_batch`.
    """
    pi, eg = _static_markov(Pi, e_grid)
    B = r_b.shape[0]
    n_a = V_T.shape[0]
    na_pad = -(-n_a // _VREG_LANES) * _VREG_LANES
    Bc = kernel_batch_width(na_pad, B)
    kw = dict(pi=pi, eg=eg, beta=beta, gamma=gamma, borrow_cons=borrow_cons,
              interpret=interpret)
    if Bc >= B:
        return _sweep_chunk(r_b, w_b, dr_b, dw_b, V_T, D0, grid, **kw)
    outs = []
    for i in range(0, B, Bc):
        lo, hi = i, min(i + Bc, B)
        pad = Bc - (hi - lo)

        def cut(a, lo=lo, hi=hi, pad=pad):
            part = a[lo:hi]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.broadcast_to(part[:1], (pad, *part.shape[1:]))])
            return part

        res = _sweep_chunk(cut(r_b), cut(w_b), cut(dr_b), cut(dw_b),
                           V_T, D0, grid, **kw)
        outs.append(tuple(o[:hi - lo] for o in res))
    return tuple(jnp.concatenate([o[j] for o in outs]) for j in range(4))


def make_fused_jvp_batch(model, ss_initial, ss_ending,
                         interpret: bool = False):
    """Batched fused direction sweep for ensembles.

    Returns jvp_batch(x_b, v_b, exog_batch) -> f32 (B, n_F): the directional
    derivative of F at each ensemble row, with the household JVP in the
    batched Pallas kernels and the cheap price-map/assembly/residual JVPs in
    vmapped XLA — the batched analogue of `fused_sweep._build_fused.jvp_dir`
    (exog paths vary per row here, so the price hook is vmapped per row).
    """
    from hank_tpu.blocks.assemble import assemble_full_xmat, residuals
    from hank_tpu.ops.precision import cast_model, cast_ss

    model32 = cast_model(model, f32)
    ss0 = cast_ss(ss_initial, f32)
    ssT = cast_ss(ss_ending, f32)
    cs = model.compspec
    Tm1 = cs.T - 1
    het = model.vars_of_type("heterogeneous")
    policy_var = model.endog_dims()[0].policy_var
    extra = [k for k in het if k != policy_var]
    assert len(extra) <= 1
    c_key = extra[0] if extra else None
    wealth = model32.endog_dims()[0]
    prod = model32.exog_dims()[0]
    p = model.params
    hook = _fused_price_hook(model)

    def price_map(xx, ex32):
        r, s = hook(xx.reshape(Tm1, cs.n_endog), ex32, model32)
        return jnp.stack([r.astype(f32), s.astype(f32)])

    Tm1_pad = _bucket_Tm1(Tm1)
    n_pad = Tm1_pad - Tm1
    x_ss_row = jnp.asarray(
        [ssT.vars[k] for k in model.vars_of_type("endogenous")], f32)[None, :]

    def ss_prices(exog_batch):
        exog_ss = {k: jnp.asarray(ssT.vars[k], f32)[None]
                   for k in exog_batch}
        r_ssv, s_ssv = hook(x_ss_row, exog_ss, model32)
        return (jnp.asarray(r_ssv, f32).reshape(-1)[0],
                jnp.asarray(s_ssv, f32).reshape(-1)[0])

    def tail(xx, aggs, ex32):
        x_mat = assemble_full_xmat(xx, aggs, ex32, model32,
                                   ss0.vars, ssT.vars)
        return residuals(x_mat, model32)

    def jvp_batch(x_b, v_b, exog_batch):
        x32 = x_b.astype(f32)
        v32 = v_b.astype(f32)
        ex32 = {k: pth.astype(f32) for k, pth in exog_batch.items()}
        rs, drs = jax.vmap(
            lambda xx, vv, ex: jax.jvp(lambda z: price_map(z, ex),
                                       (xx,), (vv,)))(
            x32, v32, ex32)                       # (B, 2, Tm1) each
        if n_pad:
            r_ss, s_ss = ss_prices(exog_batch)
            B = x_b.shape[0]
            padp = lambda a, v: jnp.concatenate(          # noqa: E731
                [a, jnp.full((B, n_pad), v, f32)], axis=1)
            r_p, s_p = padp(rs[:, 0], r_ss), padp(rs[:, 1], s_ss)
            dr_p, ds_p = padp(drs[:, 0], 0.0), padp(drs[:, 1], 0.0)
        else:
            r_p, s_p, dr_p, ds_p = rs[:, 0], rs[:, 1], drs[:, 0], drs[:, 1]
        agg, dagg, aggc, daggc = fused_sweep_jvp_batch(
            r_p, s_p, dr_p, ds_p,
            ssT.value, ss0.D, wealth.grid, prod.grid, prod.transition,
            beta=float(p["β"]), gamma=float(p["γ"]),
            borrow_cons=float(p["borrow_cons"]), interpret=interpret)

        def tail_one(xx, vv, ag, dag, agc, dagc, ex):
            aggs = {policy_var: ag[:Tm1]}
            daggs = {policy_var: dag[:Tm1]}
            if c_key is not None:
                aggs[c_key] = agc[:Tm1]
                daggs[c_key] = dagc[:Tm1]
            return jax.jvp(lambda z, a: tail(z, a, ex),
                           (xx, aggs), (vv, daggs))[1]

        return jax.vmap(tail_one)(x32, v32, agg, dagg, aggc, daggc, ex32)

    return jvp_batch


def supports_fused_batch(model) -> bool:
    """Gate: same structural contract as the single-path fused sweep."""
    return supports_fused_sweep(model)
