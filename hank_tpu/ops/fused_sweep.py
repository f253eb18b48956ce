"""Fused primal+tangent household-sweep Pallas kernel (KS-family models).

The Boehl path solver's hot primitive is one JVP sweep of the full
equilibrium map (`NewtonRaphson.jl:95`): a backward EGM recursion over T-1
periods followed by a forward distribution push-forward, differentiated in
one direction. Under XLA each scan step pays a fixed per-step overhead
(~100 µs at KS size), which floors the sweep at ~60 ms.

This kernel runs BOTH recursions — with dual-number (primal, tangent)
arithmetic — inside ONE Pallas kernel. Policies, distributions, the grid,
the Markov matrix and all tangents stay in VMEM for the whole T-loop;
the only HBM traffic is the (T-1, 2) aggregate-price inputs and the
(T-1,) aggregate outputs.

Layout: household states are (n_e, n_a) — productivity on sublanes
(n_e ≤ 8 fits one sublane tile), wealth on lanes (n_a padded to 128).
All per-step tensors are 2-D; the only 3-D intermediates are the
compare-reduce bracket searches and the one-hot lottery/gather
contractions (Mosaic constraints: ≥2-D iota, no >2-D gathers — endpoint
gathers are one-hot masked reductions sharing a single mask).

Scope: models with ONE endogenous and ONE exogenous household dimension
whose Bellman step is the CANONICAL one-asset CRRA EGM
(`KrusellSmith.jl:43-83`):

    E   = max(V' Πᵀ, 1e-12)                 (expectation over e')
    c   = (β E)^(−1/γ)                      (Euler inversion)
    a   = (c − s·e + a') / (1+r)            (implied wealth)
    a'  = max(interp(a ↦ grid), borrow_cons)
    c*  = max((1+r)·a + s·e − a', 1e-12)    (budget)
    V   = (1+r)·c*^(−γ)                     (envelope)

parameterized by TWO per-period prices: the return `r` and the effective
wage `s` multiplying the exogenous productivity/endowment grid. A model
opts in by defining `fused_prices(xp, exog_paths, model) -> (r_path,
s_path)` next to its `ValueFunction` — mapping its endogenous columns +
exogenous paths onto (r, s). Krusell-Smith: (r, w); one-asset HANK:
(r, Y − r·B̄) (taxes fund bond interest). The 500-pt ZLB variant shares
the KS hook. `supports_fused_sweep` gates on the hook + structure.

The kernel aggregates BOTH the savings policy and the consumption policy
(models with a consumption heterogeneous variable, e.g. hank_one_asset's
C, need the second output; KS ignores it). Semantics match
`ops/egm.interp_columns`, `ops/transition.lottery_apply` + `exog_apply`
and `blocks/forward.forward_iteration` exactly (same floors, same clip
conventions, same boundary gradient zeros), so the kernel can be swapped
under `make_path_solver`'s direction sweeps with no numerical drift beyond
f32 roundoff.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
i32 = jnp.int32


def _bracket(knots_row: jnp.ndarray, queries: jnp.ndarray, n: int) -> jnp.ndarray:
    """idx[e, q] = #{k : knots[e, k] < queries[e, q]}, clipped to [1, n-1].

    One 3-D compare + reduce (the vectorized searchsorted of
    `ops/transition.searchsorted_left`).
    """
    lt = knots_row[:, None, :] < queries[:, :, None]        # (n_e, n_q, n_k)
    # No bool->int cast: Mosaic's convert_element_type helper recurses on it
    # (observed RecursionError on v5e); an int select lowers natively.
    # dtypes pinned to int32 throughout: with jax_enable_x64 an unpinned
    # integer sum / python-int scalar materializes as int64, which Mosaic's
    # convert_element_type helper cannot lower (observed RecursionError).
    cnt = jnp.sum(jnp.where(lt, jnp.asarray(1, i32), jnp.asarray(0, i32)),
                  axis=-1, dtype=i32)
    return jnp.minimum(jnp.maximum(cnt, jnp.asarray(1, i32)),
                       jnp.asarray(n - 1, i32))


# Lane-gather lowering inside the kernel: "mask" (default) is the one-hot
# masked-reduction form — compile-verified on v5e (31 ms vs 59 ms XLA at KS
# 200x7 T=300). "dyn" tiles the table into 128-lane vreg chunks and uses
# tpu.dynamic_gather per chunk (in-vreg gathers verified on v5e via
# scripts/tpu_gather_probe.py). Read at call time (a module-import-time
# snapshot silently ignored HANK_TPU_GATHER set after import) and validated.
def _gather_mode() -> str:
    mode = os.environ.get("HANK_TPU_GATHER", "mask")
    if mode not in ("mask", "dyn"):
        raise ValueError(
            f"HANK_TPU_GATHER={mode!r}: expected 'mask' or 'dyn'")
    return mode

_VREG_LANES = 128


def _take_lanes_vreg(table, idx):
    """out[r, q] = table[r, idx[r, q]] via lax.gather, single-vreg operands.

    lax.gather is used directly (take_along_axis upcasts indices to the x64
    default int64, which Mosaic cannot lower); PROMISE_IN_BOUNDS skips the
    clamp ops (indices are pre-clipped).
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        table, idx[..., None], dimension_numbers=dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _gather_lanes(idx, *arrays):
    """[a[e, idx[e,q]] for a in arrays] — lane gather along the last axis.

    "dyn": per-(output-chunk × table-chunk) single-vreg dynamic gathers +
    range selects — O(n_q/128 · n_k/128) tiny vector ops per array.
    "mask": one shared one-hot mask + masked reductions — O(n_q·n_k) 3-D
    work, portable to Mosaic versions without dynamic_gather.
    """
    if _gather_mode() == "dyn":
        R, Q = idx.shape
        C = arrays[0].shape[-1]
        CH = _VREG_LANES
        nq = (Q + CH - 1) // CH
        nc = (C + CH - 1) // CH
        def pad_to(z, width, fill):
            w = z.shape[-1]
            if w == width:
                return z
            return jnp.concatenate(
                [z, jnp.full((R, width - w), fill, z.dtype)], axis=-1)

        outs = []
        for a in arrays:
            cols = []
            for q in range(nq):
                q0, q1 = q * CH, min((q + 1) * CH, Q)
                idx_q = pad_to(idx[:, q0:q1], CH, 0)       # (R, CH)
                acc = jnp.zeros((R, CH), a.dtype)
                for c in range(nc):
                    c0, c1 = c * CH, min((c + 1) * CH, C)
                    tbl = pad_to(a[:, c0:c1], CH, 0)       # (R, CH)
                    local = jnp.clip(idx_q - jnp.asarray(c0, i32),
                                     jnp.asarray(0, i32),
                                     jnp.asarray(c1 - c0 - 1, i32))
                    got = _take_lanes_vreg(tbl, local)
                    sel = (idx_q >= c0) & (idx_q < c1)
                    acc = jnp.where(sel, got, acc)
                cols.append(acc[:, :q1 - q0])
            outs.append(jnp.concatenate(cols, axis=-1) if nq > 1 else cols[0])
        return outs
    n_k = arrays[0].shape[-1]
    k_ids = jax.lax.broadcasted_iota(i32, (*idx.shape, n_k), idx.ndim)
    mask = (k_ids == idx[..., None])
    return [jnp.sum(jnp.where(mask, a[:, None, :], 0.0), axis=-1)
            for a in arrays]


def _unroll_factor() -> int:
    """Per-step time-loop unroll for the fused kernels (HANK_TPU_UNROLL).

    The KS sweep is bound by the fixed per-step sequencing cost
    (~47 µs/step of a ~15 µs/step vector workload — BASELINE.md roofline);
    unrolling U kernel steps per fori_loop iteration amortizes the loop
    control/layout overhead across U periods. Default 1 (off) until a
    measured win; the compiled kernel is per-U (new Mosaic shape =
    one remote AOT compile), so flip it deliberately.
    """
    u = int(os.environ.get("HANK_TPU_UNROLL", "1"))
    if u < 1 or u > 8:
        raise ValueError(f"HANK_TPU_UNROLL={u}: expected 1..8")
    return u


def _make_fused_sweep_kernel(Tm1: int, n_a: int, n_e: int,
                             beta: float, gamma: float, borrow_cons: float,
                             n_real: int, unroll: int = 1):
    """Kernel body: backward dual EGM scan then forward dual lottery scan.

    `n_a` is the VMEM lane width (padded to a multiple of 128 by the caller
    so every lane op is full-vreg — Mosaic cannot lower several ops on
    partial tail chunks, and the "dyn" gather tiles by whole vregs);
    `n_real` is the true grid size. Pad lanes carry zero mass (D pads = 0)
    and a strictly-increasing grid extension, so the only contamination
    channel is the endogenous-knot bracket search — masked below by forcing
    pad knots to +BIG.
    """
    inv_g = -1.0 / gamma

    def kernel(r_ref, w_ref, dr_ref, dw_ref,          # SMEM (Tm1,) price paths
               vT_ref, d0_ref,                        # VMEM (n_e, n_a)
               grid_ref,                               # VMEM (n_e, n_a) — the
               # wealth grid pre-broadcast over e OUTSIDE the kernel: lane
               # slices of an in-kernel (1, n_a) broadcast lower to a
               # sublane vector.broadcast Mosaic cannot legalize.
               egrid_ref,                              # VMEM (n_e, 1)
               pi_ref,                                 # VMEM (n_e, n_e)
               glo_ref, ghi_ref,                       # VMEM (n_e, n_a): grid
               # shifted down/up one lane (hat-basis neighbors, built outside)
               iup_ref, idn_ref,                       # VMEM (n_e, n_a):
               # 1/(g−g_lo), 1/(g_hi−g) — static hat slopes
               agg_ref, dagg_ref,                      # out VMEM (Tm1, 1): savings agg
               aggc_ref, daggc_ref,                    # out VMEM (Tm1, 1): consumption agg
               pol_scr, dpol_scr):                     # scratch (Tm1, n_e, n_a)
        grid2 = grid_ref[:, :]
        labor = egrid_ref[:, :]                        # (n_e, 1)
        Pi = pi_ref[:, :]
        lane_real = jax.lax.broadcasted_iota(i32, (n_e, n_a), 1) \
            < jnp.asarray(n_real, i32)

        # ── Backward dual EGM recursion: t = Tm1-1 … 0 ────────────────────
        # Semantics: models/krusell_smith.py::ValueFunction (KrusellSmith.jl:43-83).
        def bstep_at(t, carry):
            V, dV = carry
            r = r_ref[t]
            w = w_ref[t]
            dr = dr_ref[t]
            dw = dw_ref[t]

            # 1. Expectation over e' (MXU) + infeasibility floor.
            E = jnp.dot(Pi, V, preferred_element_type=f32)
            dE = jnp.dot(Pi, dV, preferred_element_type=f32)
            live = E > 1e-12
            E = jnp.maximum(E, 1e-12)
            dE = jnp.where(live, dE, 0.0)

            # 2. Euler inversion c = (βE)^(-1/γ).
            c = (beta * E) ** inv_g
            dc = inv_g * c / E * dE

            # 3. Implied current wealth on the endogenous grid.
            inv1r = 1.0 / (1.0 + r)
            implied = (c - w * labor + grid2) * inv1r
            dimplied = (dc - dw * labor) * inv1r - implied * (dr * inv1r)
            # Pad lanes must never win the knot bracket search: force them
            # above every real query (real implied-wealth values are far
            # below 1e30) with zero tangent. Literals pinned to f32: under
            # jax_enable_x64 a bare python float traces as f64 and Mosaic
            # cannot legalize the resulting tpu.truncf f64->f32.
            implied = jnp.where(lane_real, implied, jnp.asarray(1e30, f32))
            dimplied = jnp.where(lane_real, dimplied, jnp.asarray(0.0, f32))

            # 4. Interpolate the savings policy onto the exogenous grid
            #    (ops/egm.interp_columns: knots=implied, vals=grid).
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
            Vn = (1.0 + r) * cpow
            dVn = dr * cpow + (1.0 + r) * (-gamma) * cpow / cg * dcg

            pol_scr[pl.ds(t, 1)] = pol[None]
            dpol_scr[pl.ds(t, 1)] = dpol[None]
            return Vn, dVn

        # int32 loop bounds: under jax_enable_x64 a python-int bound makes the
        # traced index int64, which mismatches Mosaic's i32 loop carry.
        # With unroll > 1 the main loop advances `unroll` periods per
        # iteration (amortizing per-step sequencing overhead) and the
        # static remainder steps run outside the loop.
        def _run_loop(step_at, reverse, init):
            n_iter = Tm1 // unroll
            def body(j, carry):
                i0 = j * jnp.asarray(unroll, i32)
                for k in range(unroll):
                    i = i0 + jnp.asarray(k, i32)
                    t = jnp.asarray(Tm1 - 1, i32) - i if reverse else i
                    carry = step_at(t, carry)
                return carry
            carry = jax.lax.fori_loop(jnp.asarray(0, i32),
                                      jnp.asarray(n_iter, i32), body, init)
            # Static remainder steps: python-int period indices (a concrete
            # jnp scalar in `pl.ds` trips the ref-transform pytree wrapper
            # during non-interpret kernel tracing — observed on v5e).
            for i in range(n_iter * unroll, Tm1):
                carry = step_at(Tm1 - 1 - i if reverse else i, carry)
            return carry

        _run_loop(bstep_at, True,
                  (vT_ref[:, :], jnp.zeros((n_e, n_a), f32)))

        # ── Forward dual push-forward: t = 0 … Tm1-1 ──────────────────────
        # Semantics: ops/transition.lottery_apply + exog_apply,
        # blocks/forward.forward_iteration (ForwardIteration.jl:297-308).
        # The Young lottery is evaluated in HAT-BASIS form
        # (ops/transition.hat_basis_weights): mass from state a to grid bin
        # b is hat_b(pol[a]) — pure f32 broadcast-FMA work against the
        # STATIC grid rows (glo/ghi/iup/idn precomputed outside), replacing
        # the int bracket search + one-hot masks + 4 masked reductions.
        glo = glo_ref[:, :]
        ghi = ghi_ref[:, :]
        iup = iup_ref[:, :]
        idn = idn_ref[:, :]
        g_bot = grid2[:, 0:1]
        g_top = grid2[:, n_real - 1:n_real]

        def fstep_at(t, carry):
            D, dD = carry
            pol = pol_scr[t]
            dpol = dpol_scr[t]
            r = r_ref[t]
            w = w_ref[t]
            dr = dr_ref[t]
            dw = dw_ref[t]

            # hat[e, a, b] = clip(min(up, down), 0, ·) with
            #   up   = (p − g_{b-1}) / (g_b − g_{b-1})
            #   down = (g_{b+1} − p) / (g_{b+1} − g_b)
            # p clipped into the REAL grid range (flat boundary lottery —
            # pad bins get zero mass; tangents die at the clip exactly as
            # the masked-lottery "interior" convention did).
            p = jnp.minimum(jnp.maximum(pol, g_bot), g_top)
            pb = p[:, :, None]                          # (e, a_from, 1)
            up = (pb - glo[:, None, :]) * iup[:, None, :]
            down = (ghi[:, None, :] - pb) * idn[:, None, :]
            falling = down < up
            hat_raw = jnp.where(falling, down, up)
            sup = hat_raw > 0.0
            hat = jnp.maximum(hat_raw, 0.0)
            # d hat / d p on the active branch, zero off-support and at the
            # borrowing-constraint / top clips (dpol is zeroed there by the
            # EGM clip upstream, but the explicit mask keeps the convention
            # aligned with the XLA interior mask).
            slope = jnp.where(sup,
                              jnp.where(falling, -idn[:, None, :],
                                        iup[:, None, :]),
                              jnp.asarray(0.0, f32))

            D_half = jnp.sum(hat * D[:, :, None], axis=1)
            dD_half = jnp.sum(hat * dD[:, :, None]
                              + slope * (dpol * D)[:, :, None], axis=1)

            # Exogenous mixing D'[e', b] = Σ_e Pi[e, e'] D_half[e, b] (MXU).
            PiT = Pi.T
            D_new = jnp.dot(PiT, D_half, preferred_element_type=f32)
            dD_new = jnp.dot(PiT, dD_half, preferred_element_type=f32)

            agg_ref[pl.ds(t, 1), :] = jnp.sum(pol * D_new).reshape(1, 1)
            dagg_ref[pl.ds(t, 1), :] = jnp.sum(
                dpol * D_new + pol * dD_new).reshape(1, 1)

            # Consumption aggregate: recompute c from the budget with the
            # SAME period-t prices the backward step used (cheaper than two
            # more (Tm1, n_e, n_a) scratch buffers). Pad lanes carry zero
            # mass in D_new, so their (finite) c values contribute nothing.
            cg_raw = (1.0 + r) * grid2 + w * labor - pol
            cg_live = cg_raw > 1e-12
            cg = jnp.maximum(cg_raw, 1e-12)
            dcg = jnp.where(cg_live, dr * grid2 + dw * labor - dpol, 0.0)
            aggc_ref[pl.ds(t, 1), :] = jnp.sum(cg * D_new).reshape(1, 1)
            daggc_ref[pl.ds(t, 1), :] = jnp.sum(
                dcg * D_new + cg * dD_new).reshape(1, 1)
            return D_new, dD_new

        _run_loop(fstep_at, False,
                  (d0_ref[:, :], jnp.zeros((n_e, n_a), f32)))

    return kernel


@functools.partial(jax.jit, static_argnames=("beta", "gamma", "borrow_cons",
                                             "interpret", "unroll"))
def fused_sweep_jvp(r_path, w_path, dr_path, dw_path,
                    V_T, D0, grid, e_grid, Pi,
                    *, beta: float, gamma: float, borrow_cons: float,
                    interpret: bool = False, unroll: int = 1):
    """JVP of the household map (r, w paths) ↦ aggregate-KD path, fused.

    Args (all cast to f32; state arrays in (n_a, n_e) convention — they are
    transposed to the kernel's (n_e, n_a) layout here):
      r_path, w_path, dr_path, dw_path: (T-1,) price paths + tangents.
      V_T: terminal marginal value (n_a, n_e) (zero tangent — the terminal
        condition is the fixed ending SS, `BackwardIteration.jl:84-85`).
      D0: initial distribution (n_a, n_e) (zero tangent).
      grid, e_grid: wealth / productivity grids; Pi: (n_e, n_e) row-stochastic.

    Returns (agg, dagg, aggc, daggc): the (T-1,) aggregate paths of the
    savings and consumption policies and their directional derivatives.
    """
    Tm1 = r_path.shape[0]
    n_a, n_e = V_T.shape
    # Pad the lane (wealth) axis to whole 128-lane vregs: partial tail
    # chunks hit Mosaic lowering gaps and defeat the "dyn" gather tiling.
    # Pads: grid extended strictly increasing (never wins a bracket search
    # against real queries), V pads = 1 (any positive finite), D pads = 0
    # (zero mass — pads cannot contribute to aggregates).
    na_pad = -(-n_a // _VREG_LANES) * _VREG_LANES
    pad_n = na_pad - n_a
    grid32 = grid.astype(f32)
    V32 = V_T.T.astype(f32)
    D32 = D0.T.astype(f32)
    if pad_n:
        step = grid32[-1] - grid32[-2]
        grid32 = jnp.concatenate(
            [grid32, grid32[-1] + step * jnp.arange(1, pad_n + 1, dtype=f32)])
        V32 = jnp.concatenate([V32, jnp.ones((n_e, pad_n), f32)], axis=1)
        D32 = jnp.concatenate([D32, jnp.zeros((n_e, pad_n), f32)], axis=1)
    # Static hat-basis rows for the forward lottery (fstep): grid neighbors
    # and inverse segment widths, pre-broadcast over e (in-kernel sublane
    # broadcasts of freshly-built rows are a Mosaic legalization hazard).
    glo = jnp.concatenate([grid32[:1] - (grid32[1] - grid32[0]), grid32[:-1]])
    ghi = jnp.concatenate([grid32[1:], grid32[-1:] + (grid32[-1] - grid32[-2])])
    iup = 1.0 / (grid32 - glo)
    idn = 1.0 / (ghi - grid32)
    tile_e = lambda v: jnp.tile(v[None, :], (n_e, 1))  # noqa: E731
    kernel = _make_fused_sweep_kernel(Tm1, na_pad, n_e,
                                      float(beta), float(gamma),
                                      float(borrow_cons), n_a, unroll=unroll)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    agg, dagg, aggc, daggc = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((Tm1, 1), f32) for _ in range(4)),
        in_specs=[smem] * 4 + [vmem] * 9,
        out_specs=(vmem,) * 4,
        scratch_shapes=[pltpu.VMEM((Tm1, n_e, na_pad), f32),
                        pltpu.VMEM((Tm1, n_e, na_pad), f32)],
        # The hat-basis fstep materializes (n_e, n_a, n_a) 3-D intermediates;
        # at 512 lanes that is ~31 MB of scoped VMEM — past the 16 MB XLA
        # default but well inside the v5e core's 128 MB (measured OOM on the
        # 500-pt large-grid KS without this).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r_path.astype(f32), w_path.astype(f32),
      dr_path.astype(f32), dw_path.astype(f32),
      V32, D32, tile_e(grid32),
      e_grid.astype(f32)[:, None], Pi.astype(f32),
      tile_e(glo), tile_e(ghi), tile_e(iup), tile_e(idn))
    return agg[:, 0], dagg[:, 0], aggc[:, 0], daggc[:, 0]


def _fused_price_hook(model):
    """The model's `fused_prices(xp, exog_paths, model)` hook, or None.

    Defined in the same module as the model's `ValueFunction` (the model
    function file — the user surface). Defining it is the model author's
    declaration that the Bellman step IS the canonical one-asset CRRA EGM
    of this kernel (module docstring) under the returned (r, s) prices —
    the correctness contract `test_fused_sweep.py` checks per model.
    """
    import sys

    mod = sys.modules.get(getattr(model.value_fn, "__module__", ""))
    return getattr(mod, "fused_prices", None)


def supports_fused_sweep(model) -> bool:
    """True iff `model` declares the canonical one-asset EGM price hook and
    has the matching structure (one endogenous + one exogenous household
    dim, CRRA params, savings [+ optional consumption] heterogeneous vars).
    """
    if _fused_price_hook(model) is None:
        return False
    if not (len(model.endog_dims()) == 1 and len(model.exog_dims()) == 1
            and {"β", "γ", "borrow_cons"} <= set(model.params)):
        return False
    het = model.vars_of_type("heterogeneous")
    policy_var = model.endog_dims()[0].policy_var
    return policy_var in het and len(het) <= 2


# Horizon buckets: the kernel is compiled at the smallest bucketed Tm1 ≥ the
# request (for Tm1 > 32) and shorter solves pad the price path with the
# ENDING-steady-state prices — extra backward steps iterate the SS Bellman
# at its own fixed point (V stays V_ss up to f32 roundoff; tangents stay
# exactly zero since the pad tangents are zero), and the extra forward steps
# are sliced off. One compiled kernel then serves every horizon up to the
# bucket — compile cache hits instead of a fresh 10-25 min remote AOT per T
# (299 = the default T=300 config; tests at tiny T keep exact shapes).
_T_BUCKETS = (64, 299, 599, 1199)


def _bucket_Tm1(Tm1: int) -> int:
    if Tm1 <= 32:
        return Tm1
    for b in _T_BUCKETS:
        if Tm1 <= b:
            return b
    return Tm1


def _build_fused(model, ss_initial, ss_ending, exog_paths,
                 interpret: bool = False):
    """Shared builder for the fused-kernel equilibrium-map entry points.

    Returns (jvp_dir, residual32):
      jvp_dir(x, v) -> f32 directional derivative of F at x along v, with
        the household JVP in the fused kernel and the (cheap) assembly +
        residual JVP in XLA — exact chain-rule composition of
        `make_full_residual_fn` (`NewtonRaphson.jl:77-83`).
      residual32(x) -> f32 F(x) primal via the same kernel (zero tangent) —
        ~3.5x faster than the emulated-f64 XLA residual on TPU; used by the
        mixed-residual outer schedule far from convergence.
    """
    from hank_tpu.blocks.assemble import assemble_full_xmat, residuals
    from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss

    model32 = cast_model(model, f32)
    ss0 = cast_ss(ss_initial, f32)
    ssT = cast_ss(ss_ending, f32)
    exog32 = cast_paths(exog_paths, f32)

    cs = model.compspec
    Tm1 = cs.T - 1
    het = model.vars_of_type("heterogeneous")
    policy_var = model.endog_dims()[0].policy_var
    extra = [k for k in het if k != policy_var]
    assert len(extra) <= 1, (
        "fused sweep aggregates the savings policy plus at most one "
        "consumption variable")
    c_key = extra[0] if extra else None
    wealth = model32.endog_dims()[0]
    prod = model32.exog_dims()[0]
    p = model.params
    hook = _fused_price_hook(model)

    def price_map(xx):
        r, s = hook(xx.reshape(Tm1, cs.n_endog), exog32, model32)
        return jnp.stack([r.astype(f32), s.astype(f32)])

    # Horizon-bucket padding uses the ENDING-steady-state prices, computed
    # through the same hook on the SS variable values.
    Tm1_pad = _bucket_Tm1(Tm1)
    n_pad = Tm1_pad - Tm1
    x_ss_row = jnp.asarray([ssT.vars[k] for k in model.vars_of_type("endogenous")],
                           f32)[None, :]
    exog_ss = {k: jnp.asarray(ssT.vars[k], f32)[None] for k in exog32}
    r_ssv, s_ssv = hook(x_ss_row, exog_ss, model32)
    r_ss = jnp.full((n_pad,), jnp.asarray(r_ssv, f32).reshape(-1)[0])
    s_ss = jnp.full((n_pad,), jnp.asarray(s_ssv, f32).reshape(-1)[0])
    zeros_pad = jnp.zeros((n_pad,), f32)

    unroll = _unroll_factor()

    def sweep(x32, v32):
        rs, drs = jax.jvp(price_map, (x32,), (v32,))
        agg, dagg, aggc, daggc = fused_sweep_jvp(
            jnp.concatenate([rs[0], r_ss]),
            jnp.concatenate([rs[1], s_ss]),
            jnp.concatenate([drs[0], zeros_pad]),
            jnp.concatenate([drs[1], zeros_pad]),
            ssT.value, ss0.D, wealth.grid, prod.grid, prod.transition,
            beta=float(p["β"]), gamma=float(p["γ"]),
            borrow_cons=float(p["borrow_cons"]), interpret=interpret,
            unroll=unroll)
        aggs = {policy_var: agg[:Tm1]}
        daggs = {policy_var: dagg[:Tm1]}
        if c_key is not None:
            aggs[c_key] = aggc[:Tm1]
            daggs[c_key] = daggc[:Tm1]
        return aggs, daggs

    def tail(xx, aggs):
        x_mat = assemble_full_xmat(xx, aggs, exog32, model32,
                                   ss0.vars, ssT.vars)
        return residuals(x_mat, model32)

    def jvp_dir(x, v):
        x32 = x.astype(f32)
        v32 = v.astype(f32)
        aggs, daggs = sweep(x32, v32)
        return jax.jvp(tail, (x32, aggs), (v32, daggs))[1]

    def residual32(x):
        x32 = x.astype(f32)
        aggs, _ = sweep(x32, jnp.zeros_like(x32))
        return tail(x32, aggs)

    return jvp_dir, residual32


def make_fused_jvp_dir(model, ss_initial, ss_ending, exog_paths,
                       interpret: bool = False):
    """jvp_dir(x, v) via the fused kernel (see `_build_fused`)."""
    return _build_fused(model, ss_initial, ss_ending, exog_paths,
                        interpret=interpret)[0]


def make_fused_residual_fn(model, ss_initial, ss_ending, exog_paths,
                           interpret: bool = False):
    """F32(x) primal residual via the fused kernel (see `_build_fused`)."""
    return _build_fused(model, ss_initial, ss_ending, exog_paths,
                        interpret=interpret)[1]
