"""Fused double-single (two-f32) residual kernel: f64-class F(x) at f32 cost.

The newton endgame must measure residuals of size ~1e-9 built from O(1)
aggregates — below f32 resolution. On TPU the f64 evaluation is software-
emulated (~124 ms at KS 200×7 T=300, BASELINE.md round-2 ledger). This
kernel evaluates the household block of F(x) — the backward EGM recursion
and the forward distribution push-forward, the full cost of a residual —
in double-single arithmetic (`ops/ds.py`): every quantity is an
unevaluated f32 pair (hi, lo) carrying ~48 mantissa bits, all ops native
f32 VPU adds/muls. Absolute accuracy of the aggregate paths is ~1e-11,
two decades below the 1e-9 target; the cheap residual tail (assembly +
equation evaluation over the (n_v, T) aggregate matrix) runs in emulated
f64 outside the kernel where its cost is negligible.

Structure mirrors `ops/fused_sweep.py` (same layout, same floors/clips,
same pad-lane conventions — see that module's docstring for the Mosaic
constraints) with the dual-number (primal, tangent) arithmetic replaced by
double-single (hi, lo) arithmetic. Branch decisions at continuous kinks
(hat-basis support, min-of-lines crossover) use hi-only compares — both
branches agree at the switch point, so an f32-level decision error is a
second-order (O(eps^2)) value error; the bracket search and the clip
decisions compare exactly in ds.

Scope: the `supports_fused_sweep` family (canonical one-asset CRRA EGM via
the `fused_prices` hook) with INTEGER risk aversion γ — the Euler
inversion c = (βE)^(−1/γ) and the envelope c^(−γ) are then Newton-
refinable from f32 seeds in pure ds arithmetic (`ds.inv_nroot`,
`ds.powi_neg`); no correctly-rounded transcendental is required.

Parity: replaces the reference's native-f64 residual evaluation
(`NewtonRaphson.jl:91`, Float64 throughout) with a TPU-native equivalent
of the same accuracy class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hank_tpu.ops import ds
from hank_tpu.ops.fused_sweep import (_T_BUCKETS, _bucket_Tm1,
                                      _fused_price_hook, _VREG_LANES,
                                      supports_fused_sweep)

f32 = jnp.float32
f64 = jnp.float64
i32 = jnp.int32


def _split_const(v: float):
    """Exact ds split of a Python float into two f32 literals (numpy: the
    split happens at trace time on static values)."""
    import numpy as np

    hi = float(np.float32(v))
    return np.float32(hi), np.float32(v - hi)


def _pair(hi_ref, lo_ref):
    return hi_ref[:, :], lo_ref[:, :]


def _sum_mid(pair, m: int):
    """ds sum over axis 1 of an (e, m, b) pair → (e, b).

    m ≤ 8: unrolled size-1 sublane slices. Larger m (a multiple of 128 by
    construction): fold 128-wide chunks, then binary halving down to 8,
    then the unrolled tail — every slice offset/size stays a multiple of 8
    until the final unroll (sublane-tile-aligned for Mosaic).
    """
    hi, lo = pair
    while m > 8:
        if m > 128 and m % 256 and m % 128 == 0:
            # odd number of 128-chunks: fold the last chunk into the first
            h0 = ds.add((hi[:, :128, :], lo[:, :128, :]),
                        (hi[:, m - 128:, :], lo[:, m - 128:, :]))
            hi = jnp.concatenate([h0[0], hi[:, 128:m - 128, :]], axis=1)
            lo = jnp.concatenate([h0[1], lo[:, 128:m - 128, :]], axis=1)
            m -= 128
        else:
            h = m // 2
            hi, lo = ds.add((hi[:, :h, :], lo[:, :h, :]),
                            (hi[:, h:, :], lo[:, h:, :]))
            m = h
    acc = (hi[:, 0, :], lo[:, 0, :])
    for k in range(1, m):
        acc = ds.add(acc, (hi[:, k, :], lo[:, k, :]))
    return acc


def _fold_lanes_128(pair, n_a: int):
    """ds-fold the lane axis of an (e, n_a) pair into 128 lanes (n_a a
    multiple of 128). The final 128→1 reduction happens OUTSIDE the kernel
    in f64 (sub-vreg lane slices are a Mosaic hazard; 128 values/period is
    negligible HBM traffic)."""
    hi, lo = pair
    while n_a > 128:
        h = n_a // 2
        hi, lo = ds.add((hi[:, :h], lo[:, :h]), (hi[:, h:], lo[:, h:]))
        n_a = h
    return hi, lo


def _sum_rows(pair, n_e: int):
    """ds sum over axis 0 of an (e, b) pair → (1, b) (unrolled rows)."""
    hi, lo = pair
    acc = (hi[0:1, :], lo[0:1, :])
    for k in range(1, n_e):
        acc = ds.add(acc, (hi[k:k + 1, :], lo[k:k + 1, :]))
    return acc


def _bracket_ds(k_hi, k_lo, q_hi, q_lo, n: int):
    """idx[e, q] = #{j : knots[e, j] < queries[e, q]} with EXACT ds
    comparison (lexicographic on normalized pairs), clipped to [1, n-1].
    Mirrors `fused_sweep._bracket`."""
    kh = k_hi[:, None, :]
    kl = k_lo[:, None, :]
    qh = q_hi[:, :, None]
    ql = q_lo[:, :, None]
    lt = (kh < qh) | ((kh == qh) & (kl < ql))
    cnt = jnp.sum(jnp.where(lt, jnp.asarray(1, i32), jnp.asarray(0, i32)),
                  axis=-1, dtype=i32)
    return jnp.minimum(jnp.maximum(cnt, jnp.asarray(1, i32)),
                       jnp.asarray(n - 1, i32))


def _gather_lanes_mask(idx, *arrays):
    """One-hot masked-reduction lane gather (the fused_sweep "mask" mode;
    the shared mask amortizes over all gathered hi/lo arrays)."""
    n_k = arrays[0].shape[-1]
    k_ids = jax.lax.broadcasted_iota(i32, (*idx.shape, n_k), idx.ndim)
    mask = (k_ids == idx[..., None])
    return [jnp.sum(jnp.where(mask, a[:, None, :], 0.0), axis=-1)
            for a in arrays]


def _make_fused_ds_kernel(Tm1: int, n_a: int, n_e: int,
                          beta: float, gamma: int, borrow_cons: float,
                          n_real: int, Tm1_real: int):
    """Kernel body: backward ds EGM scan, then forward ds lottery scan.

    Outputs are 128-lane ds partial sums per period (see `_fold_lanes_128`);
    the caller finishes Σ over the 128 lanes in f64.

    Horizon-bucket periods t ≥ Tm1_real are IDENTITY on the backward carry:
    an extra EGM step at the SS prices moves V by the SS solve's VFI
    tolerance (~1e-6), which the f32 direction kernel tolerates but would
    systematically poison an f64-class residual (observed: 2e-7 residual
    error on a bucket-padded small model). Skipping the carry update makes
    the first real period see the exact terminal condition — the unpadded
    math. Forward pad steps need no guard: they run after every real
    period, and their aggregates are sliced off by the caller.
    """
    bc_hi, bc_lo = _split_const(borrow_cons)
    beta_hi, beta_lo = _split_const(beta)

    def kernel(r_hi_ref, r_lo_ref, w_hi_ref, w_lo_ref,   # SMEM (Tm1,)
               vT_hi_ref, vT_lo_ref, d0_hi_ref, d0_lo_ref,
               g_hi_ref, g_lo_ref,                        # (n_e, n_a) grid
               eg_hi_ref, eg_lo_ref,                      # (n_e, 1) labor
               pi_hi_ref, pi_lo_ref,                      # (n_e, n_e)
               piT_hi_ref, piT_lo_ref,
               glo_hi_ref, glo_lo_ref, ghi_hi_ref, ghi_lo_ref,
               iup_hi_ref, iup_lo_ref, idn_hi_ref, idn_lo_ref,
               agg_hi_ref, agg_lo_ref,                    # out (Tm1, 128)
               aggc_hi_ref, aggc_lo_ref,                  # out (Tm1, 128)
               polh_scr, poll_scr):                       # (Tm1, n_e, n_a)
        grid = _pair(g_hi_ref, g_lo_ref)
        labor = _pair(eg_hi_ref, eg_lo_ref)               # (n_e, 1)
        Pi = _pair(pi_hi_ref, pi_lo_ref)
        PiT = _pair(piT_hi_ref, piT_lo_ref)
        lane_real = jax.lax.broadcasted_iota(i32, (n_e, n_a), 1) \
            < jnp.asarray(n_real, i32)
        tiny = (jnp.asarray(1e-12, f32), jnp.asarray(0.0, f32))

        def price(hi_ref, lo_ref, t):
            """SMEM scalar read splat to an (n_e, 1) ds pair: tpu.bitcast
            (inside every ds product) only legalizes on vectors, so scalar
            prices must become sublane vectors before any ds.mul."""
            return (jnp.full((n_e, 1), hi_ref[t], f32),
                    jnp.full((n_e, 1), lo_ref[t], f32))

        beta_p = (jnp.full((n_e, 1), beta_hi, f32),
                  jnp.full((n_e, 1), beta_lo, f32))

        def expect(V, P):
            """E[e, a] = Σ_k P[e, k]·V[k, a] in ds — 3-D broadcast products
            (the hat-contraction op class) + unrolled mid-axis ds sum."""
            prod = ds.mul((P[0][:, :, None], P[1][:, :, None]),
                          (V[0][None, :, :], V[1][None, :, :]))
            return _sum_mid(prod, n_e)

        # ── Backward ds EGM recursion: t = Tm1-1 … 0 ──────────────────────
        # Semantics: fused_sweep bstep / models/krusell_smith.py
        # (KrusellSmith.jl:43-83), clip-for-clip.
        def bstep(i, carry):
            V = carry
            t = jnp.asarray(Tm1 - 1, i32) - i
            r = price(r_hi_ref, r_lo_ref, t)
            w = price(w_hi_ref, w_lo_ref, t)

            # 1. Expectation over e' + infeasibility floor (exact compare).
            E = expect(V, Pi)
            E = ds.where(ds.gt(E, tiny), E, tiny)

            # 2. Euler inversion c = (βE)^(−1/γ) (Newton-refined ds root).
            u = ds.mul(E, beta_p)
            c = ds.inv_nroot(u, gamma)

            # 3. Implied current wealth on the endogenous grid.
            one_r = ds.add_single(r, jnp.asarray(1.0, f32))
            inv1r = ds.recip(one_r)
            we = ds.mul(w, labor)                          # (n_e, 1)
            implied = ds.mul(ds.add(ds.sub(c, we), grid), inv1r)
            big = (jnp.asarray(1e30, f32), jnp.asarray(0.0, f32))
            implied = ds.where(lane_real, implied, big)

            # 4. Interpolate the savings policy onto the exogenous grid.
            idx = _bracket_ds(implied[0], implied[1], grid[0], grid[1], n_a)
            one = jnp.asarray(1, i32)
            lo_h, lo_l, vlo_h, vlo_l = _gather_lanes_mask(
                idx - one, implied[0], implied[1], grid[0], grid[1])
            hi_h, hi_l, vhi_h, vhi_l = _gather_lanes_mask(
                idx, implied[0], implied[1], grid[0], grid[1])
            knot_lo = (lo_h, lo_l)
            knot_hi = (hi_h, hi_l)
            den = ds.sub(knot_hi, knot_lo)
            zero = ds.zeros_like(den[0])
            one_ds = (jnp.ones_like(den[0]), jnp.zeros_like(den[0]))
            pos = ds.gt(den, zero)
            safe = ds.where(pos, den, one_ds)
            tw = ds.div(ds.sub(grid, knot_lo), safe)
            tw = ds.where(pos, ds.minimum(ds.maximum(tw, zero), one_ds), zero)
            pol = ds.add((vlo_h, vlo_l),
                         ds.mul(tw, ds.sub((vhi_h, vhi_l), (vlo_h, vlo_l))))

            # 5. Borrowing constraint (exact ds compare).
            bc = (jnp.full_like(pol[0], bc_hi), jnp.full_like(pol[0], bc_lo))
            pol = ds.maximum(pol, bc)

            # 6. Consumption + marginal value on the exogenous grid.
            res = ds.add(ds.mul(one_r, grid), we)          # (1+r)·a + w·e
            cg = ds.sub(res, pol)
            cg = ds.where(ds.gt(cg, tiny), cg, tiny)
            Vn = ds.mul(one_r, ds.powi_neg(cg, gamma))

            polh_scr[pl.ds(t, 1)] = pol[0][None]
            poll_scr[pl.ds(t, 1)] = pol[1][None]
            if Tm1_real == Tm1:
                return Vn
            return ds.where(t < jnp.asarray(Tm1_real, i32), Vn, V)

        jax.lax.fori_loop(jnp.asarray(0, i32), jnp.asarray(Tm1, i32), bstep,
                          _pair(vT_hi_ref, vT_lo_ref))

        # ── Forward ds push-forward: t = 0 … Tm1-1 ────────────────────────
        # Hat-basis Young lottery (fused_sweep fstep / ops/transition
        # .hat_basis_weights), in ds.
        glo = _pair(glo_hi_ref, glo_lo_ref)
        ghi = _pair(ghi_hi_ref, ghi_lo_ref)
        iup = _pair(iup_hi_ref, iup_lo_ref)
        idn = _pair(idn_hi_ref, idn_lo_ref)
        g_bot = (g_hi_ref[:, 0:1], g_lo_ref[:, 0:1])
        g_top = (g_hi_ref[:, n_real - 1:n_real], g_lo_ref[:, n_real - 1:n_real])

        def exp3(p):
            return p[0][:, None, :], p[1][:, None, :]

        def fstep(t, carry):
            D = carry
            pol = (polh_scr[t], poll_scr[t])
            r = price(r_hi_ref, r_lo_ref, t)
            w = price(w_hi_ref, w_lo_ref, t)

            p = ds.minimum(ds.maximum(pol, g_bot), g_top)
            pb = (p[0][:, :, None], p[1][:, :, None])      # (e, a_from, 1)
            up = ds.mul(ds.sub(pb, exp3(glo)), exp3(iup))
            down = ds.mul(ds.sub(exp3(ghi), pb), exp3(idn))
            # hi-only compares: hat is continuous at both kinks (line
            # crossover; zero clip), so an f32-level decision error is a
            # second-order value error.
            falling = down[0] < up[0]
            hat = ds.where(falling, down, up)
            sup = hat[0] > 0.0
            z3 = jnp.zeros_like(hat[0])
            hat = ds.where(sup, hat, (z3, z3))

            Db = (D[0][:, :, None], D[1][:, :, None])
            D_half = _sum_mid(ds.mul(hat, Db), n_a)        # (e, b)
            D_new = expect(D_half, PiT)

            # Aggregates against the post-transition distribution (the
            # fused_sweep convention): fold lanes to 128 in ds; the final
            # 128→1 sum happens outside in f64.
            one_r = ds.add_single(r, jnp.asarray(1.0, f32))
            we = ds.mul(w, labor)
            cg = ds.sub(ds.add(ds.mul(one_r, grid), we), pol)
            cg = ds.where(ds.gt(cg, tiny), cg, tiny)

            pa = _fold_lanes_128(_sum_rows(ds.mul(pol, D_new), n_e), n_a)
            ca = _fold_lanes_128(_sum_rows(ds.mul(cg, D_new), n_e), n_a)
            agg_hi_ref[pl.ds(t, 1), :] = pa[0]
            agg_lo_ref[pl.ds(t, 1), :] = pa[1]
            aggc_hi_ref[pl.ds(t, 1), :] = ca[0]
            aggc_lo_ref[pl.ds(t, 1), :] = ca[1]
            return D_new

        jax.lax.fori_loop(jnp.asarray(0, i32), jnp.asarray(Tm1, i32), fstep,
                          _pair(d0_hi_ref, d0_lo_ref))

    return kernel


def _make_fused_ds_kernel_debug(*args):
    """Debug wrapper: also exports the ds policy scratch (hi, lo) so TPU/CPU
    validation scripts can compare per-period policies against the f64
    blocks (`scripts/` bring-up; not on the solve path)."""
    inner = _make_fused_ds_kernel(*args)

    def kernel(*refs):
        # pallas ref order: inputs..., outputs..., scratch...
        polh_scr, poll_scr = refs[-2:]
        polh_out, poll_out = refs[-4:-2]
        inner(*refs[:-4], polh_scr, poll_scr)
        polh_out[...] = polh_scr[...]
        poll_out[...] = poll_scr[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("beta", "gamma", "borrow_cons",
                                             "Tm1_real", "interpret", "debug"))
def fused_ds_residual_sweep(r_path, w_path, V_T, D0, grid, e_grid, Pi,
                            *, beta: float, gamma: int, borrow_cons: float,
                            Tm1_real: int | None = None,
                            interpret: bool = False, debug: bool = False):
    """(r, w) f64 price paths ↦ f64 aggregate savings/consumption paths,
    evaluated in double-single inside one Pallas kernel.

    Args are f64 (split into ds pairs here; grids/transition/terminal value
    are the exact f64 steady-state arrays). Returns (agg, aggc): (T-1,) f64
    aggregate paths with ~1e-11 absolute accuracy.
    """
    Tm1 = r_path.shape[0]
    n_a, n_e = V_T.shape
    na_pad = -(-n_a // _VREG_LANES) * _VREG_LANES
    pad_n = na_pad - n_a
    g64 = grid.astype(f64)
    V64 = V_T.T.astype(f64)
    D64 = D0.T.astype(f64)
    if pad_n:
        step = g64[-1] - g64[-2]
        g64 = jnp.concatenate(
            [g64, g64[-1] + step * jnp.arange(1, pad_n + 1, dtype=f64)])
        V64 = jnp.concatenate([V64, jnp.ones((n_e, pad_n), f64)], axis=1)
        D64 = jnp.concatenate([D64, jnp.zeros((n_e, pad_n), f64)], axis=1)
    glo64 = jnp.concatenate([g64[:1] - (g64[1] - g64[0]), g64[:-1]])
    ghi64 = jnp.concatenate([g64[1:], g64[-1:] + (g64[-1] - g64[-2])])
    iup64 = 1.0 / (g64 - glo64)
    idn64 = 1.0 / (ghi64 - g64)
    Pi64 = Pi.astype(f64)

    def tile_ds(v64):
        hi, lo = ds.from_f64(v64)
        return (jnp.tile(hi[None, :], (n_e, 1)), jnp.tile(lo[None, :], (n_e, 1)))

    def pair2(x64):
        return ds.from_f64(x64)

    g_p = tile_ds(g64)
    glo_p = tile_ds(glo64)
    ghi_p = tile_ds(ghi64)
    iup_p = tile_ds(iup64)
    idn_p = tile_ds(idn64)
    V_p = pair2(V64)
    D_p = pair2(D64)
    eg_p = pair2(e_grid.astype(f64)[:, None])
    pi_p = pair2(Pi64)
    piT_p = pair2(Pi64.T)
    r_p = pair2(r_path.astype(f64))
    w_p = pair2(w_path.astype(f64))

    make = _make_fused_ds_kernel_debug if debug else _make_fused_ds_kernel
    kernel = make(Tm1, na_pad, n_e, float(beta), int(gamma),
                  float(borrow_cons), n_a,
                  Tm1 if Tm1_real is None else int(Tm1_real))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((Tm1, 128), f32) for _ in range(4)]
    if debug:
        out_shape += [jax.ShapeDtypeStruct((Tm1, n_e, na_pad), f32)] * 2
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[smem] * 4 + [vmem] * 20,
        out_specs=(vmem,) * len(out_shape),
        scratch_shapes=[pltpu.VMEM((Tm1, n_e, na_pad), f32),
                        pltpu.VMEM((Tm1, n_e, na_pad), f32)],
        # ds doubles every live temporary (hi+lo) and two_prod holds ~6
        # partial products — the (n_e, n_a, n_a) interpolation/lottery
        # intermediates then overflow the 16 MiB default scoped-vmem
        # budget (measured 19.9 MiB at 200×7 T=300). v5e has 128 MiB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r_p[0], r_p[1], w_p[0], w_p[1],
      V_p[0], V_p[1], D_p[0], D_p[1],
      g_p[0], g_p[1], eg_p[0], eg_p[1],
      pi_p[0], pi_p[1], piT_p[0], piT_p[1],
      glo_p[0], glo_p[1], ghi_p[0], ghi_p[1],
      iup_p[0], iup_p[1], idn_p[0], idn_p[1])
    agg = jnp.sum(outs[0].astype(f64) + outs[1].astype(f64), axis=1)
    aggc = jnp.sum(outs[2].astype(f64) + outs[3].astype(f64), axis=1)
    if debug:
        pol = outs[4].astype(f64) + outs[5].astype(f64)
        return agg, aggc, pol, outs[0], outs[1]
    return agg, aggc


def supports_ds_residual(model) -> bool:
    """The fused-sweep family with integer risk aversion (see module doc)."""
    return supports_fused_sweep(model) and float(model.params["γ"]).is_integer()


def make_ds_residual_fn(model, ss_initial, ss_ending, exog_paths,
                        interpret: bool = False):
    """F_ds(x) → f64 residual with ~1e-11 absolute accuracy at ~f32 cost.

    Drop-in for the emulated-f64 `make_full_residual_fn` F in the solver
    endgame: the household sweep runs in the ds kernel, the price map and
    the residual tail (assembly + equations over the tiny (n_v, T) matrix)
    in true/emulated f64 where their cost is negligible.
    """
    from hank_tpu.blocks.assemble import assemble_full_xmat, residuals

    cs = model.compspec
    Tm1 = cs.T - 1
    het = model.vars_of_type("heterogeneous")
    policy_var = model.endog_dims()[0].policy_var
    extra = [k for k in het if k != policy_var]
    assert len(extra) <= 1
    c_key = extra[0] if extra else None
    wealth = model.endog_dims()[0]
    prod = model.exog_dims()[0]
    p = model.params
    hook = _fused_price_hook(model)

    # Horizon-bucket padding with ending-SS prices (fused_sweep convention:
    # extra backward steps sit at the SS Bellman fixed point; extra forward
    # steps are sliced off).
    Tm1_pad = _bucket_Tm1(Tm1)
    n_pad = Tm1_pad - Tm1
    endog = model.vars_of_type("endogenous")
    x_ss_row = jnp.asarray([ss_ending.vars[k] for k in endog], f64)[None, :]
    exog_ss = {k: jnp.asarray(ss_ending.vars[k], f64)[None] for k in exog_paths}
    r_ssv, s_ssv = hook(x_ss_row, exog_ss, model)
    r_ss = jnp.full((n_pad,), jnp.asarray(r_ssv, f64).reshape(-1)[0])
    s_ss = jnp.full((n_pad,), jnp.asarray(s_ssv, f64).reshape(-1)[0])

    def _sweep(r_full, s_full):
        return fused_ds_residual_sweep(
            r_full, s_full,
            ss_ending.value, ss_initial.D, wealth.grid, prod.grid,
            prod.transition,
            beta=float(p["β"]), gamma=int(p["γ"]),
            borrow_cons=float(p["borrow_cons"]), Tm1_real=Tm1,
            interpret=interpret)

    if interpret:
        # Interpret mode (CPU tests) MUST NOT inline the kernel's ds ops
        # into an enclosing jit graph: XLA:CPU's algebraic simplifier
        # (`algsimp`) rewrites the error-free transforms and silently
        # degrades the residual to ~1e-7 (bisected:
        # --xla_disable_hlo_passes=algsimp restores 1e-12 agreement; the
        # sweep under its OWN jit is unaffected). A pure_callback executes
        # the standalone-jitted sweep from the host, fencing the enclosing
        # graph's optimizer out. Mosaic (real TPU) has no such pass — the
        # kernel measured 2.7e-11 on v5e — so the fence is interpret-only.
        _sweep_device = _sweep

        def _sweep(r_full, s_full):
            import numpy as np

            shape = jax.ShapeDtypeStruct((int(Tm1_pad),), f64)

            def host(r, s):
                a, c = _sweep_device(jnp.asarray(r), jnp.asarray(s))
                return np.asarray(a), np.asarray(c)

            return jax.pure_callback(host, (shape, shape), r_full, s_full)

    def F_ds(x):
        x64 = x.astype(f64)
        r, s = hook(x64.reshape(Tm1, cs.n_endog), exog_paths, model)
        agg, aggc = _sweep(jnp.concatenate([r.astype(f64), r_ss]),
                           jnp.concatenate([s.astype(f64), s_ss]))
        aggs = {policy_var: agg[:Tm1]}
        if c_key is not None:
            aggs[c_key] = aggc[:Tm1]
        x_mat = assemble_full_xmat(x64, aggs, exog_paths, model,
                                   ss_initial.vars, ss_ending.vars)
        return residuals(x_mat, model)

    return F_ds
