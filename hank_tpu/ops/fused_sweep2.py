"""Fused primal+tangent TWO-ASSET household sweep (Pallas, single path).

Round-4 item 2: the two-asset Calvo-access Bellman step
(`models/hank_two_asset.py::ValueFunction`) runs under XLA as ~10 chained
interpolation stages per period; at 40x20x5x2 each step costs ~2.5 ms of
serial per-op latency and the T=300 JVP sweep ~1.5 s — 110x off the serial
light-speed bound (scripts/roofline.py) and the whole reason the north-star
config's TPU solve barely beats the same-code CPU. This module runs the
BACKWARD dual recursion (and, stage 2, the forward dual push) inside Pallas
kernels where a step is ~100 us of VPU/MXU work.

Design notes (hard-won Mosaic constraints, see also ops/fused_sweep.py):

- Per-(e, acc) household surfaces are (128, 128) f32 VMEM maps in one of
  two layouts: L1 = (b on sublanes, a on lanes), L2 = transposed. Valid
  regions are (n_b, n_a); pads carry strictly-increasing grid extensions /
  zero mass / +BIG knots so they never win brackets or contribute mass.
- Static-knot interpolations build hat weights H[q, k] with the TRACED
  query as a (128, 1) COLUMN (lane-broadcast of a column is
  Mosaic-legal) against PRE-BROADCAST static knot tables (128, 128)
  passed in from outside; the contraction against a surface is then a
  plain NN matmul (queries x knots) @ (knots x lanes).
- TRACED-knot interpolations (the EGM inversions) reuse the proven
  `_bracket` + `_gather_lanes` mask-gather pattern from the 1-asset
  kernel (knots and queries share rows, knots on lanes).
- Sublane-broadcast of a traced ROW is not legalizable as a vector op;
  where a traced row must fill sublanes the kernel uses an MXU outer
  product ones_col @ row (`scripts/r4_mosaic_probe.py` verifies this and
  every other pattern class this module leans on — run it after any
  Mosaic/toolchain bump).
- The portfolio-split root is found by BISECTION + Newton polish on the
  (penalty-regularized) FOC gap g(a') (models/hank_two_asset.py:g_fun)
  instead of the XLA path's analytic breakpoint method: the breakpoint
  pass needs segmented lane reductions Mosaic lacks, while a bisection
  step is two hat builds + one (128,128,128) MXU dot. Both roots are
  f32-exact after the polish; tangents use the same implicit-function
  step as the XLA path (stop-gradient root, one Newton step, exact
  directional slope).

Semantics contract: per-period outputs match `ValueFunction` (hat-interp
TPU path) under f32 to roundoff; `tests/test_fused_sweep2.py` asserts
equality against `jax.jvp` of the XLA pipeline in interpret mode.
Reference hot primitive: /root/reference/NewtonRaphson.jl:95 (one JVP of
the equilibrium map); the model class itself is one the reference cannot
run (/root/reference/ForwardIteration.jl:267-269).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hank_tpu.ops.fused_sweep import (_VREG_LANES, _bracket, _bucket_Tm1,
                                      _gather_lanes)

f32 = jnp.float32
i32 = jnp.int32

_N = 128          # padded square map size (sublanes = lanes = 128)
_N_SPLIT = 23     # bisection iterations (320 / 2^23 << f32 ulp at the top)
_N_NEWTON = 2     # Newton polish iterations after bisection


def _pad_grid(g: np.ndarray, n: int) -> np.ndarray:
    """Extend a strictly-increasing grid to length n (uniform last step)."""
    g = np.asarray(g, np.float64)
    step = g[-1] - g[-2]
    ext = g[-1] + step * np.arange(1, n - len(g) + 1)
    return np.concatenate([g, ext]).astype(np.float32)


def _hat_tables(grid: np.ndarray):
    """Static hat-basis neighbor tables for a padded lane-knot vector."""
    glo = np.concatenate([[2 * grid[0] - grid[1]], grid[:-1]])
    ghi = np.concatenate([grid[1:], [2 * grid[-1] - grid[-2]]])
    return glo.astype(np.float32), ghi.astype(np.float32)


def _bc(row: np.ndarray) -> np.ndarray:
    """(128,) -> (128, 128) static lane-table broadcast (built on host)."""
    return np.broadcast_to(np.asarray(row, np.float32)[None, :], (_N, _N)).copy()


# ───────────────────────── in-kernel dual helpers ──────────────────────────
# Dual numbers are (value, tangent) tuples of same-shape f32 arrays. The
# tangent rules mirror jax.jvp of the corresponding XLA expressions exactly
# (including where/clip/max tangent-kill conventions).


def _d_maxconst(x, dx, c):
    """max(x, c) with constant c: tangent passes iff x > c."""
    return jnp.maximum(x, c), jnp.where(x > c, dx, 0.0)


def _d_inv_marg2(W, dW):
    """(W)^(-1/2) via rsqrt + one Newton polish — the gamma = 2 algebraic
    form of models/hank_two_asset._crra_inv_marg, dual-propagated through
    the SAME composite so tangents match jax.jvp of the XLA path."""
    y = jax.lax.rsqrt(W)
    dy = -0.5 * y * y * y * dW
    u = 1.5 - 0.5 * W * y * y
    du = -0.5 * (dW * y * y + 2.0 * W * y * dy)
    return y * u, dy * u + y * du


def _d_marg2(c, dc):
    """c^(-2) = 1/(c*c) (gamma = 2 _crra_marg), dual."""
    inv = 1.0 / (c * c)
    return inv, -2.0 * inv / c * dc


def _hat_q(q, dq, kn, glo, ghi, k0: float, kN: float):
    """Hat weights H[..., k] + tangent for STATIC lane-knots at traced
    queries. q broadcastable against the static tables (column (128,1)
    against (128,128), or (R,Q,1) against (R,1,K)-style 3-D). Conventions
    match models/hank_two_asset._hat_weights_and_deriv: flat clip outside
    [k0, kN], dH zero outside the OPEN interval and on exact knots."""
    p = jnp.clip(q, k0, kN)
    up = (p - glo) / (kn - glo)
    down = (ghi - p) / (ghi - kn)
    H = jnp.maximum(jnp.minimum(up, down), 0.0)
    interior = (q > k0) & (q < kN)
    rising = interior & (glo < p) & (p < kn)
    falling = interior & (kn < p) & (p < ghi)
    # Literals pinned to f32: jnp.where(bool, 1.0, 0.0) has no array operand
    # to infer dtype from, so under jax_enable_x64 both branches trace as
    # f64 vectors — Mosaic's vector-layout inference CHECK-crashes on any
    # 64-bit vector (measured on v5e: "bitwidth_ <= 32" abort).
    onef = jnp.asarray(1.0, f32)
    zerof = jnp.asarray(0.0, f32)
    dHdq = (jnp.where(rising, onef, zerof) / (kn - glo)
            - jnp.where(falling, onef, zerof) / (ghi - kn))
    return H, dHdq * dq


def _lane_red(x):
    """Sum over lanes -> (rows, 1)."""
    return jnp.sum(x, axis=-1, keepdims=True)


def _nn(a, b):
    return jnp.dot(a, b, preferred_element_type=f32)


def _outer_bc(row):
    """MXU sublane-broadcast of a traced (1, 128) row -> (128, 128)."""
    return _nn(jnp.ones((_N, 1), f32), row)


def _col2row(col):
    """(128, 1) -> (1, 128) via a TN dot against the identity.

    The identity is built from i32 iotas (jnp.eye's internal iota is int64
    under jax_enable_x64 — a 64-bit vector Mosaic cannot lay out)."""
    rows = jax.lax.broadcasted_iota(i32, (_N, _N), 0)
    cols = jax.lax.broadcasted_iota(i32, (_N, _N), 1)
    eye = jnp.where(rows == cols, jnp.asarray(1.0, f32),
                    jnp.asarray(0.0, f32))
    return jax.lax.dot_general(col, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)


def _transpose(x):
    return jnp.transpose(x)


def _make_bwd2_kernel(Tm1: int, n_b: int, n_a: int, n_e: int, n_s: int,
                      pi, eg, *, beta: float, lam: float, chi: float,
                      borrow_cons: float, b0: float, btop: float,
                      a0: float, atop: float, s0: float, stop: float,
                      s1: float, nb_pad: int, na_pad: int):
    """Backward dual Bellman kernel, grid over t (reversed).

    Mirrors models/hank_two_asset.ValueFunction stage by stage (gamma = 2
    algebraic CRRA forms, hat-interp lowerings); every tangent rule below
    reproduces jax.jvp of the corresponding XLA expression including
    where/clip tangent-kill conventions. pi / eg are python-float tuples
    (compile-time constants). nb_pad/na_pad: output-block sublane sizes.
    """

    def kernel(r_ref, ra_ref, w_ref, tau_ref,          # SMEM (Tm1,)
               dr_ref, dra_ref, dw_ref, dtau_ref,
               vT_ref,                                  # (2, n_e, 2, N, N) L1
               A_KN, A_GLO, A_GHI,                      # (N, N) a-knots on lanes
               B_KN, B_GLO, B_GHI,                      # (N, N) b-knots on lanes
               S_KN, S_GLO, S_GHI,                      # (N, N) s-knots on lanes
               BGRID_SUB,                               # (N, N) bgrid on sublanes
               AGRID_COL, S2_COL,                       # (N, 1)
               HMID_B, HMID_A,                          # (N, N) static mid hats
               BIG_KN,                                  # (N, N) huge increasing
               pbn_ref, dpbn_ref, cn_ref, dcn_ref,      # out (1,n_e,na_pad,N) L2
               pba_ref, dpba_ref, paa_ref, dpaa_ref,    # out (1,n_e,nb_pad,N) L1
               ca_ref, dca_ref,
               V_scr, dV_scr):                          # scratch (2,n_e,2,N,N)
        step = pl.program_id(0)
        t = jnp.asarray(Tm1 - 1, i32) - step

        @pl.when(step == 0)
        def _init():
            for surf in range(2):
                for e in range(n_e):
                    for acc in range(2):
                        V_scr[surf, e, acc] = vT_ref[surf, e, acc]
                        dV_scr[surf, e, acc] = jnp.zeros((_N, _N), f32)

        r = r_ref[t]
        ra = ra_ref[t]
        w = w_ref[t]
        tau = tau_ref[t]
        dr = dr_ref[t]
        dra = dra_ref[t]
        dw = dw_ref[t]
        dtau = dtau_ref[t]
        inv1r = 1.0 / (1.0 + r)

        lane_b = jax.lax.broadcasted_iota(i32, (_N, _N), 1) < jnp.asarray(n_b, i32)

        # ── Stage A: access mixing + income expectation + floors ───────────
        mixes = []                                       # per e: 4 duals
        for e in range(n_e):
            vb0, vb1 = V_scr[0, e, 0], V_scr[0, e, 1]
            va0, va1 = V_scr[1, e, 0], V_scr[1, e, 1]
            dvb0, dvb1 = dV_scr[0, e, 0], dV_scr[0, e, 1]
            dva0, dva1 = dV_scr[1, e, 0], dV_scr[1, e, 1]
            mixes.append(((1.0 - lam) * vb0 + lam * vb1,
                          (1.0 - lam) * dvb0 + lam * dvb1,
                          (1.0 - lam) * va0 + lam * va1,
                          (1.0 - lam) * dva0 + lam * dva1))

        Wb, dWb, Wa, dWa = [], [], [], []
        for e in range(n_e):
            eb = pi[e][0] * mixes[0][0]
            deb = pi[e][0] * mixes[0][1]
            ea = pi[e][0] * mixes[0][2]
            dea = pi[e][0] * mixes[0][3]
            for fi in range(1, n_e):
                eb = eb + pi[e][fi] * mixes[fi][0]
                deb = deb + pi[e][fi] * mixes[fi][1]
                ea = ea + pi[e][fi] * mixes[fi][2]
                dea = dea + pi[e][fi] * mixes[fi][3]
            wbv, dwbv = _d_maxconst(beta * eb, beta * deb, 1e-12)
            wav, dwav = _d_maxconst(beta * ea, beta * dea, 1e-12)
            Wb.append(wbv)
            dWb.append(dwbv)
            Wa.append(wav)
            dWa.append(dwav)

        for e in range(n_e):
            wb_e, dwb_e, wa_e, dwa_e = Wb[e], dWb[e], Wa[e], dWa[e]
            pre = (1.0 - tau) * w
            dpre = -dtau * w + (1.0 - tau) * dw
            y_e = jnp.maximum(pre, 1e-9) * eg[e]
            dy_e = jnp.where(pre > 1e-9, dpre, 0.0) * eg[e]

            # ── NO-ACCESS branch ───────────────────────────────────────────
            # Capped accrual point (a function of a only): column queries.
            a_raw_c = (1.0 + ra) * AGRID_COL[:, :]
            a_next_c = jnp.minimum(a_raw_c, atop)
            capped_c = a_raw_c >= atop
            da_next_c = jnp.where(capped_c, 0.0, dra * AGRID_COL[:, :])

            Hn, dHn_dq = _hat_q(a_next_c, 1.0, A_KN[:, :], A_GLO[:, :],
                                A_GHI[:, :], a0, atop)
            dHn = dHn_dq * da_next_c
            W2 = jnp.concatenate([wb_e, wa_e], axis=0)          # (2N, N)
            dW2 = jnp.concatenate([dwb_e, dwa_e], axis=0)
            nt = (((1,), (1,)), ((), ()))
            Wn = jax.lax.dot_general(W2, Hn, nt, preferred_element_type=f32)
            dWn = (jax.lax.dot_general(dW2, Hn, nt, preferred_element_type=f32)
                   + jax.lax.dot_general(W2, dHn, nt,
                                         preferred_element_type=f32))
            wb_n, wa_n = Wn[:_N], Wn[_N:]                       # (N, N) L1
            dwb_n, dwa_n = dWn[:_N], dWn[_N:]

            c_end_n, dc_end_n = _d_inv_marg2(wb_n, dwb_n)
            payoutL = (1.0 + ra) * A_KN[:, :] - jnp.minimum(
                (1.0 + ra) * A_KN[:, :], atop)
            dpayoutL = jnp.where((1.0 + ra) * A_KN[:, :] >= atop,
                                 dra * A_KN[:, :], 0.0)
            implied = (c_end_n + BGRID_SUB[:, :] - payoutL - y_e) * inv1r
            dimplied = ((dc_end_n - dpayoutL - dy_e) * inv1r
                        - implied * (dr * inv1r))
            impliedT = _transpose(implied)                      # L2 (a, b)
            dimpliedT = _transpose(dimplied)
            impliedT = jnp.where(lane_b, impliedT, jnp.asarray(1e30, f32))
            dimpliedT = jnp.where(lane_b, dimpliedT, jnp.asarray(0.0, f32))

            na_p = na_pad
            imT = impliedT[:na_p]
            dimT = dimpliedT[:na_p]
            BKq = B_KN[:na_p]
            idx = _bracket(imT, BKq, n_b)
            one = jnp.asarray(1, i32)
            lo, dlo, vlo = _gather_lanes(idx - one, imT, dimT, BKq)
            hi, dhi, vhi = _gather_lanes(idx, imT, dimT, BKq)
            den = hi - lo
            safe = jnp.where(den > 0, den, 1.0)
            tw_raw = (BKq - lo) / safe
            interior = (tw_raw > 0.0) & (tw_raw < 1.0) & (den > 0)
            tw = jnp.clip(tw_raw, 0.0, 1.0)
            dtw = jnp.where(interior, -(dlo + tw * (dhi - dlo)) / safe, 0.0)
            pol_bn = vlo + tw * (vhi - vlo)
            dpol_bn = dtw * (vhi - vlo)
            unb = (pol_bn > borrow_cons) & (pol_bn < btop)
            pol_bn = jnp.clip(pol_bn, borrow_cons, btop)
            dpol_bn = jnp.where(unb, dpol_bn, 0.0)

            payout_c = ((1.0 + ra) * AGRID_COL[:na_p]
                        - jnp.minimum((1.0 + ra) * AGRID_COL[:na_p], atop))
            dpayout_c = jnp.where((1.0 + ra) * AGRID_COL[:na_p] >= atop,
                                  dra * AGRID_COL[:na_p], 0.0)
            cn_raw = (1.0 + r) * BKq + payout_c + y_e - pol_bn
            dcn_raw = dr * BKq + dpayout_c + dy_e - dpol_bn
            c_n = jnp.maximum(cn_raw, 1e-12)
            dc_n = jnp.where(cn_raw > 1e-12, dcn_raw, 0.0)
            up_n, dup_n = _d_marg2(c_n, dc_n)
            vb_n_new = (1.0 + r) * up_n
            dvb_n_new = dr * up_n + (1.0 + r) * dup_n

            # Wa at (pol_b_n, a_next): interp the a_next-interped surface
            # along b at the traced policy (static b-knots, 3-D hats).
            wa_nT = _transpose(wa_n)[:na_p]                     # (na_p, N)
            dwa_nT = _transpose(dwa_n)[:na_p]
            H3, dH3_dq = _hat_q(pol_bn[:, :, None], 1.0,
                                B_KN[:na_p][:, None, :],
                                B_GLO[:na_p][:, None, :],
                                B_GHI[:na_p][:, None, :], b0, btop)
            dH3 = dH3_dq * dpol_bn[:, :, None]
            wa_at = jnp.sum(H3 * wa_nT[:, None, :], axis=-1)
            dwa_at = jnp.sum(dH3 * wa_nT[:, None, :]
                             + H3 * dwa_nT[:, None, :], axis=-1)
            va_margin = jnp.where(capped_c[:na_p], 0.0, wa_at)
            dva_margin = jnp.where(capped_c[:na_p], 0.0, dwa_at)
            va_n_new = (1.0 + ra) * va_margin
            dva_n_new = dra * va_margin + (1.0 + ra) * dva_margin

            # ── ACCESS branch (s-space columns) ────────────────────────────
            s2c = S2_COL[:, :]
            if chi > 0.0:
                wsum = wb_e + wa_e
                dwsum = dwb_e + dwa_e
                t1m = _nn(HMID_B[:, :], wsum)
                dt1m = _nn(HMID_B[:, :], dwsum)
                wmid = _lane_red(HMID_A[:, :] * t1m)
                dwmid = _lane_red(HMID_A[:, :] * dt1m)
                smax = jnp.maximum(s2c, s1)
                pen = chi * wmid / smax
                dpen = chi * dwmid / smax
            else:
                pen = jnp.zeros((_N, 1), f32)
                dpen = jnp.zeros((_N, 1), f32)

            G = wb_e - wa_e
            dG = dwb_e - dwa_e

            def g_primal(a_c):
                qb = s2c - a_c
                Hb, _ = _hat_q(qb, 1.0, B_KN[:, :], B_GLO[:, :], B_GHI[:, :],
                               b0, btop)
                Ha, _ = _hat_q(a_c, 1.0, A_KN[:, :], A_GLO[:, :], A_GHI[:, :],
                               a0, atop)
                t1 = _nn(Hb, G)
                return _lane_red(Ha * t1) + pen * (a_c - 0.5 * s2c)

            g_lo_v = g_primal(jnp.zeros((_N, 1), f32))
            g_hi_v = g_primal(s2c)

            def bisect(_, carry):
                lo_c, hi_c = carry
                mid = 0.5 * (lo_c + hi_c)
                neg = g_primal(mid) < 0
                return (jnp.where(neg, mid, lo_c), jnp.where(neg, hi_c, mid))

            lo_c, hi_c = jax.lax.fori_loop(
                jnp.asarray(0, i32), jnp.asarray(_N_SPLIT, i32), bisect,
                (jnp.zeros((_N, 1), f32), s2c))
            a_it = 0.5 * (lo_c + hi_c)

            def g_with_slope(a_c):
                qb = s2c - a_c
                Hb, dHb_dq = _hat_q(qb, 1.0, B_KN[:, :], B_GLO[:, :],
                                    B_GHI[:, :], b0, btop)
                Ha, dHa_dq = _hat_q(a_c, 1.0, A_KN[:, :], A_GLO[:, :],
                                    A_GHI[:, :], a0, atop)
                t1 = _nn(Hb, G)
                gv = _lane_red(Ha * t1) + pen * (a_c - 0.5 * s2c)
                gp = (_lane_red(dHa_dq * t1)
                      - _lane_red(Ha * _nn(dHb_dq, G)) + pen)
                return gv, gp, Hb, Ha

            for _ in range(_N_NEWTON):
                gv, gp, _, _ = g_with_slope(a_it)
                a_it = jnp.clip(a_it - gv / jnp.maximum(gp, 1e-10),
                                lo_c, hi_c)

            # Implicit-function step at the (primal-frozen) root — the same
            # one-Newton-at-stop_gradient form as the XLA path.
            g_at, g_a, Hb_r, Ha_r = g_with_slope(a_it)
            g_a = jnp.maximum(g_a, 1e-10)
            raw_root = a_it - g_at / g_a
            a_root = jnp.clip(raw_root, 0.0, s2c)
            dg_at = (_lane_red(Ha_r * _nn(Hb_r, dG))
                     + dpen * (a_it - 0.5 * s2c))
            da_root = jnp.where((raw_root > 0.0) & (raw_root < s2c),
                                -dg_at / g_a, 0.0)
            a_star = jnp.where(g_lo_v >= 0, 0.0,
                               jnp.where(g_hi_v <= 0, s2c, a_root))
            da_star = jnp.where(g_lo_v >= 0, 0.0,
                                jnp.where(g_hi_v <= 0, 0.0, da_root))
            b_star = s2c - a_star
            db_star = -da_star

            # Envelope surfaces + slopes at the split (shared hat builds).
            Hb_s, dHb_dq = _hat_q(b_star, 1.0, B_KN[:, :], B_GLO[:, :],
                                  B_GHI[:, :], b0, btop)
            Ha_s, dHa_dq = _hat_q(a_star, 1.0, A_KN[:, :], A_GLO[:, :],
                                  A_GHI[:, :], a0, atop)
            Wpair = jnp.concatenate([wb_e, wa_e], axis=1)       # (N, 2N)
            dWpair = jnp.concatenate([dwb_e, dwa_e], axis=1)
            T1 = _nn(Hb_s, Wpair)
            T1d = _nn(Hb_s, dWpair)
            T1b = _nn(dHb_dq, Wpair)
            T1bd = _nn(dHb_dq, dWpair)

            outs = []
            for sl in (slice(0, _N), slice(_N, 2 * _N)):
                t1, t1d, t1b, t1bd = T1[:, sl], T1d[:, sl], T1b[:, sl], T1bd[:, sl]
                dt1 = t1d + db_star * t1b
                val = _lane_red(Ha_s * t1)
                dval = _lane_red(Ha_s * dt1) + da_star * _lane_red(dHa_dq * t1)
                v_db = _lane_red(Ha_s * t1b)
                dv_db = (da_star * _lane_red(dHa_dq * t1b)
                         + _lane_red(Ha_s * t1bd))
                v_da = _lane_red(dHa_dq * t1)
                dv_da = _lane_red(dHa_dq * dt1)
                outs.append((val, dval, v_db, dv_db, v_da, dv_da))
            (wb_s, dwb_s, wb_db, dwb_db, wb_da, dwb_da) = outs[0]
            (wa_s, dwa_s, wa_db, dwa_db, wa_da, dwa_da) = outs[1]

            wbp = wb_da - wb_db
            dwbp = dwb_da - dwb_db
            wap = wa_da - wa_db
            dwap = dwa_da - dwa_db
            gp_s = wbp - wap
            dgp_s = dwbp - dwap
            ok = ((a_star > 0.0) & (a_star < s2c)
                  & (wbp >= 0.0) & (wap <= 0.0) & (gp_s > 1e-10))
            mden = jnp.where(ok, gp_s, 1.0)
            dmden = jnp.where(ok, dgp_s, 0.0)
            num = wbp * wa_s - wap * wb_s
            dnum = dwbp * wa_s + wbp * dwa_s - dwap * wb_s - wap * dwb_s
            M = num / mden
            dM = (dnum - M * dmden) / mden
            W_s = jnp.where(ok, M, jnp.maximum(wb_s, wa_s))
            dW_s = jnp.where(ok, dM, jnp.where(wb_s > wa_s, dwb_s, dwa_s))

            c_end_s, dc_end_s = _d_inv_marg2(W_s, dW_s)
            w_kn = c_end_s + s2c                                 # (N, 1)
            dw_kn = dc_end_s

            # On-grid cash-on-hand + savings policy (traced s-knots).
            coh = ((1.0 + r) * BGRID_SUB[:, :] + (1.0 + ra) * A_KN[:, :] + y_e)
            dcoh = dr * BGRID_SUB[:, :] + dra * A_KN[:, :] + dy_e
            lane_s = jax.lax.broadcasted_iota(i32, (_N, _N), 1) \
                < jnp.asarray(n_s, i32)
            KN_BC = _outer_bc(_col2row(w_kn))
            dKN_BC = _outer_bc(_col2row(dw_kn))
            KN_BC = jnp.where(lane_s, KN_BC, BIG_KN[:, :])
            dKN_BC = jnp.where(lane_s, dKN_BC, 0.0)

            nb_p = nb_pad
            coh_b = coh[:nb_p]
            dcoh_b = dcoh[:nb_p]
            KNb = KN_BC[:nb_p]
            dKNb = dKN_BC[:nb_p]
            idx_s = _bracket(KNb, coh_b, n_s)
            lo2, dlo2, s_lo = _gather_lanes(idx_s - one, KNb, dKNb, S_KN[:nb_p])
            hi2, dhi2, s_hi = _gather_lanes(idx_s, KNb, dKNb, S_KN[:nb_p])
            den2 = hi2 - lo2
            safe2 = jnp.where(den2 > 0, den2, 1.0)
            twr = (coh_b - lo2) / safe2
            inter2 = (twr > 0.0) & (twr < 1.0) & (den2 > 0)
            tw2 = jnp.clip(twr, 0.0, 1.0)
            dtw2 = jnp.where(inter2,
                             (dcoh_b - dlo2 - tw2 * (dhi2 - dlo2)) / safe2, 0.0)
            pol_s = s_lo + tw2 * (s_hi - s_lo)
            dpol_s = dtw2 * (s_hi - s_lo)
            pos = pol_s > 0.0
            pol_s = jnp.maximum(pol_s, 0.0)
            dpol_s = jnp.where(pos, dpol_s, 0.0)

            # Split of on-grid savings: a' = interp(a*(s); s2) at pol_s.
            H3s, dH3s_dq = _hat_q(pol_s[:, :, None], 1.0,
                                  S_KN[:nb_p][:, None, :],
                                  S_GLO[:nb_p][:, None, :],
                                  S_GHI[:nb_p][:, None, :], s0, stop)
            dH3s = dH3s_dq * dpol_s[:, :, None]
            AST = _outer_bc(_col2row(a_star))[:nb_p]
            dAST = _outer_bc(_col2row(da_star))[:nb_p]
            paa_raw = jnp.sum(H3s * AST[:, None, :], axis=-1)
            dpaa_raw = jnp.sum(dH3s * AST[:, None, :]
                               + H3s * dAST[:, None, :], axis=-1)
            hi_b = jnp.minimum(pol_s, atop)
            dhi_b = jnp.where(pol_s < atop, dpol_s, 0.0)
            lo_ok = paa_raw > 0.0
            paa1 = jnp.maximum(paa_raw, 0.0)
            dpaa1 = jnp.where(lo_ok, dpaa_raw, 0.0)
            up_ok = paa1 < hi_b
            pol_aa = jnp.minimum(paa1, hi_b)
            dpol_aa = jnp.where(up_ok, dpaa1, dhi_b)

            pb_raw = pol_s - pol_aa
            dpb_raw = dpol_s - dpol_aa
            unb2 = (pb_raw > borrow_cons) & (pb_raw < btop)
            pol_ba = jnp.clip(pb_raw, borrow_cons, btop)
            dpol_ba = jnp.where(unb2, dpb_raw, 0.0)
            ca_raw = coh_b - pol_ba - pol_aa
            dca_raw = dcoh_b - dpol_ba - dpol_aa
            c_a = jnp.maximum(ca_raw, 1e-12)
            dc_a = jnp.where(ca_raw > 1e-12, dca_raw, 0.0)
            up_a, dup_a = _d_marg2(c_a, dc_a)
            vb_a_new = (1.0 + r) * up_a
            dvb_a_new = dr * up_a + (1.0 + r) * dup_a
            va_a_new = (1.0 + ra) * up_a
            dva_a_new = dra * up_a + (1.0 + ra) * dup_a

            # ── writes + carries ───────────────────────────────────────────
            pbn_ref[0, e] = pol_bn
            dpbn_ref[0, e] = dpol_bn
            cn_ref[0, e] = c_n
            dcn_ref[0, e] = dc_n
            pba_ref[0, e] = pol_ba
            dpba_ref[0, e] = dpol_ba
            paa_ref[0, e] = pol_aa
            dpaa_ref[0, e] = dpol_aa
            ca_ref[0, e] = c_a
            dca_ref[0, e] = dc_a

            zpad_a = jnp.zeros((_N - na_pad, _N), f32)
            zpad_b = jnp.zeros((_N - nb_pad, _N), f32)
            padA = lambda x: jnp.concatenate([x, zpad_a], axis=0)  # noqa: E731
            padB = lambda x: jnp.concatenate([x, zpad_b], axis=0)  # noqa: E731
            V_scr[0, e, 0] = _transpose(padA(vb_n_new))
            dV_scr[0, e, 0] = _transpose(padA(dvb_n_new))
            V_scr[1, e, 0] = _transpose(padA(va_n_new))
            dV_scr[1, e, 0] = _transpose(padA(dva_n_new))
            V_scr[0, e, 1] = padB(vb_a_new)
            dV_scr[0, e, 1] = padB(dvb_a_new)
            V_scr[1, e, 1] = padB(va_a_new)
            dV_scr[1, e, 1] = padB(dva_a_new)

    return kernel


def _np_hat(q: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Host-side hat weights H[q, k] over a padded lane-knot grid (clip to
    the REAL top: grid[:n_real] semantics are handled by passing kN)."""
    glo, ghi = _hat_tables(grid)
    p = np.clip(q, grid[0], None)[:, None]
    up = (p - glo[None, :]) / (grid - glo)[None, :]
    down = (ghi[None, :] - p) / (ghi - grid)[None, :]
    return np.maximum(np.minimum(up, down), 0.0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fused2_kernel_call(r_p, ra_p, w_p, tau_p, dr_p, dra_p, dw_p, dtau_p,
                        vT, statics, *, meta, interpret: bool = False):
    """One backward-kernel launch. `meta` is the static tuple from
    `_fused2_meta`; `statics` the tuple of prepared static tables."""
    (Tm1, n_b, n_a, n_e, n_s, pi, eg, beta, lam, chi, borrow_cons,
     b0, btop, a0, atop, s0, stp, s1, nb_pad, na_pad) = meta
    kernel = _make_bwd2_kernel(
        Tm1, n_b, n_a, n_e, n_s, pi, eg, beta=beta, lam=lam, chi=chi,
        borrow_cons=borrow_cons, b0=b0, btop=btop, a0=a0, atop=atop,
        s0=s0, stop=stp, s1=s1, nb_pad=nb_pad, na_pad=na_pad)

    # SMEM (Tm1,) price paths need explicit i32-zero index maps too — the
    # default 1-D map's literal 0 is i64 under x64 (func.return(%0): (i64)).
    smem = pl.BlockSpec((Tm1,), lambda i: (i * 0,),
                        memory_space=pltpu.SMEM)
    # Full-array VMEM inputs still need EXPLICIT index maps under a grid:
    # the default map emits literal 0s, which trace as i64 under
    # jax_enable_x64 and fail Mosaic's func.return legalization (the
    # round-4 batch-kernel lesson, commit "Fix batched-kernel index maps").
    # All zeros are derived from the i32 index arg (i * 0).
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i, nd=arr.ndim: (i * 0,) * nd)
    blkA = pl.BlockSpec((1, n_e, na_pad, _N),
                        lambda i, T=Tm1: (T - 1 - i, i * 0, i * 0, i * 0))
    blkB = pl.BlockSpec((1, n_e, nb_pad, _N),
                        lambda i, T=Tm1: (T - 1 - i, i * 0, i * 0, i * 0))
    outsA = (jax.ShapeDtypeStruct((Tm1, n_e, na_pad, _N), f32),) * 4
    outsB = (jax.ShapeDtypeStruct((Tm1, n_e, nb_pad, _N), f32),) * 6
    return pl.pallas_call(
        kernel,
        grid=(Tm1,),
        out_shape=outsA + outsB,
        in_specs=[smem] * 8 + [full(vT)] + [full(s) for s in statics],
        out_specs=(blkA,) * 4 + (blkB,) * 6,
        scratch_shapes=[pltpu.VMEM((2, n_e, 2, _N, _N), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(r_p.astype(f32), ra_p.astype(f32), w_p.astype(f32), tau_p.astype(f32),
      dr_p.astype(f32), dra_p.astype(f32), dw_p.astype(f32),
      dtau_p.astype(f32), vT, *statics)


def _fused2_setup(model):
    """Static tables + meta for the kernel, from concrete model data."""
    liquid = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    income = model.heterogeneity["income"]
    access = model.heterogeneity["access"]
    n_b, n_a, n_e = liquid.n, illiq.n, income.n
    if n_b > _N or n_a > _N:
        raise ValueError(
            f"fused two-asset kernel supports n_b, n_a <= {_N} "
            f"(got n_b={n_b}, n_a={n_a})")
    if n_e > 8:
        raise ValueError(
            f"fused two-asset kernel supports n_e <= 8 income states "
            f"(got n_e={n_e}): the income expectation unrolls over e "
            "in-kernel")
    bgrid = np.asarray(liquid.grid, np.float64)
    agrid = np.asarray(illiq.grid, np.float64)
    s_grid = bgrid * ((bgrid[-1] + agrid[-1]) / bgrid[-1])
    n_s = n_b
    bp = _pad_grid(bgrid, _N)
    ap = _pad_grid(agrid, _N)
    sp = _pad_grid(s_grid, _N)
    bglo, bghi = _hat_tables(bp)
    aglo, aghi = _hat_tables(ap)
    sglo, sghi = _hat_tables(sp)
    # Static mid-point hat matrices for the penalty scale (queries 0.5*s).
    hmid_b = _np_hat(np.clip(0.5 * sp, bp[0], bgrid[-1]), bp)
    hmid_a = _np_hat(np.clip(0.5 * sp, ap[0], agrid[-1]), ap)
    big = (1e30 * (1.0 + np.arange(_N))).astype(np.float32)

    statics = tuple(jnp.asarray(x) for x in (
        _bc(ap), _bc(aglo), _bc(aghi),
        _bc(bp), _bc(bglo), _bc(bghi),
        _bc(sp), _bc(sglo), _bc(sghi),
        np.broadcast_to(bp[:, None], (_N, _N)).copy(),      # BGRID_SUB
        ap[:, None].copy(), sp[:, None].copy(),             # AGRID_COL, S2_COL
        hmid_b, hmid_a, _bc(big),
    ))

    p = model.params
    if float(p["γ"]) != 2.0:
        raise ValueError("fused two-asset kernel implements the gamma = 2 "
                         "algebraic CRRA forms (models/hank_two_asset.py)")
    pi = tuple(tuple(float(v) for v in row)
               for row in np.asarray(income.transition))
    eg = tuple(float(v) for v in np.asarray(income.grid).reshape(-1))
    lam = float(np.asarray(access.transition)[0, 1])
    nb_pad = -(-n_b // 8) * 8
    na_pad = -(-n_a // 8) * 8
    meta_tail = (float(p["β"]), lam, float(p.get("portfolio_reg", 0.0)),
                 float(p["borrow_cons"]),
                 float(bgrid[0]), float(bgrid[-1]),
                 float(agrid[0]), float(agrid[-1]),
                 float(s_grid[0]), float(s_grid[-1]), float(s_grid[1]),
                 nb_pad, na_pad)
    return statics, (n_b, n_a, n_e, n_s, pi, eg) + meta_tail


def fused2_policies_jvp(r_p, ra_p, w_p, tau_p, dr_p, dra_p, dw_p, dtau_p,
                        value_T, model, interpret: bool = False):
    """Backward dual sweep: price paths + tangents -> full policy paths +
    tangents as {B, A, C} dicts of (T-1, n_b, n_a, n_e, 2) arrays.

    value_T: terminal packed value (2, n_b, n_a, n_e, 2) (ending SS). The
    no-access illiquid policy a' = min((1+ra)a, a_max) is recomputed here
    from the ra path (it depends on no household state but a).
    """
    statics, meta_full = _fused2_setup(model)
    n_b, n_a, n_e, n_s = meta_full[:4]
    meta = (int(r_p.shape[0]),) + meta_full
    nb_pad, na_pad = meta[-2], meta[-1]

    illiq = model.heterogeneity["illiquid"]
    agrid32 = jnp.asarray(np.asarray(illiq.grid), f32)
    atop = float(np.asarray(illiq.grid)[-1])

    # Terminal value -> kernel layout (2, n_e, 2, N, N) L1 (b-sub, a-lane).
    vT = jnp.transpose(value_T.astype(f32), (0, 3, 4, 1, 2))
    vT = jnp.pad(vT, ((0, 0), (0, 0), (0, 0),
                      (0, _N - n_b), (0, _N - n_a)))

    outs = _fused2_kernel_call(r_p, ra_p, w_p, tau_p,
                               dr_p, dra_p, dw_p, dtau_p,
                               vT, statics, meta=meta, interpret=interpret)
    pbn, dpbn, cn, dcn, pba, dpba, paa, dpaa, ca, dca = outs
    Tm1 = r_p.shape[0]

    # L2 blocks (T, e, a, b) -> (T, b, a, e); L1 blocks (T, e, b, a) -> same.
    l2 = lambda x: jnp.transpose(x[:, :, :n_a, :n_b], (0, 3, 2, 1))  # noqa: E731
    l1 = lambda x: jnp.transpose(x[:, :, :n_b, :n_a], (0, 2, 3, 1))  # noqa: E731

    ra32 = ra_p.astype(f32)
    dra32 = dra_p.astype(f32)
    a_raw = (1.0 + ra32)[:, None] * agrid32[None, :]
    a_next = jnp.minimum(a_raw, atop)                     # (T-1, n_a)
    da_next = jnp.where(a_raw >= atop, 0.0,
                        dra32[:, None] * agrid32[None, :])
    bshape = (Tm1, n_b, n_a, n_e)
    pol_an = jnp.broadcast_to(a_next[:, None, :, None], bshape)
    dpol_an = jnp.broadcast_to(da_next[:, None, :, None], bshape)

    stack = lambda nacc, acc: jnp.stack([nacc, acc], axis=-1)  # noqa: E731
    policies = {"B": stack(l2(pbn), l1(pba)),
                "A": stack(pol_an, l1(paa)),
                "C": stack(l2(cn), l1(ca))}
    dpolicies = {"B": stack(l2(dpbn), l1(dpba)),
                 "A": stack(dpol_an, l1(dpaa)),
                 "C": stack(l2(dcn), l1(dca))}
    return policies, dpolicies


def _fused2_price_hook(model):
    import sys

    mod = sys.modules.get(getattr(model.value_fn, "__module__", ""))
    return getattr(mod, "fused2_prices", None)


def supports_fused_sweep2(model) -> bool:
    """Gate: the shipped Calvo-access two-asset structure (two endogenous
    dims, income + i.i.d. access exogenous dims, gamma = 2 CRRA) with the
    model module declaring the `fused2_prices` hook."""
    if _fused2_price_hook(model) is None:
        return False
    if not (len(model.endog_dims()) == 2 and len(model.exog_dims()) == 2):
        return False
    p = model.params
    if not ({"β", "γ", "borrow_cons"} <= set(p)) or float(p["γ"]) != 2.0:
        return False
    het = model.vars_of_type("heterogeneous")
    return {"B", "A", "C"} <= set(het)


def make_fused2_jvp_dir(model, ss_initial, ss_ending, exog_paths,
                        interpret: bool = False, forward: str = "pallas"):
    """jvp_dir(x, v) with the two-asset household JVP in the backward
    Pallas kernel and the distribution push + assembly/residual JVP in XLA
    — the two-asset analogue of `fused_sweep.make_fused_jvp_dir`.

    forward: "pallas" (default) pushes the distribution in the forward
    Pallas kernel (`fused2_forward_jvp`); "xla" keeps the
    `forward_iteration` jvp (fallback while probing new backends, and the
    cross-check reference for tests).
    """
    from hank_tpu.blocks.assemble import assemble_full_xmat, residuals
    from hank_tpu.blocks.forward import forward_iteration
    from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss

    model32 = cast_model(model, f32)
    ss0 = cast_ss(ss_initial, f32)
    ssT = cast_ss(ss_ending, f32)
    exog32 = cast_paths(exog_paths, f32)
    cs = model.compspec
    Tm1 = cs.T - 1
    hook = _fused2_price_hook(model)

    def price_map(xx):
        r, ra, w, tau = hook(xx.reshape(Tm1, cs.n_endog), exog32, model32)
        return jnp.stack([r.astype(f32), ra.astype(f32),
                          w.astype(f32), tau.astype(f32)])

    Tm1_pad = _bucket_Tm1(Tm1)
    n_pad = Tm1_pad - Tm1
    x_ss_row = jnp.asarray(
        [ssT.vars[k] for k in model.vars_of_type("endogenous")], f32)[None, :]
    exog_ss = {k: jnp.asarray(ssT.vars[k], f32)[None] for k in exog32}
    ss_prices = hook(x_ss_row, exog_ss, model32)
    pads = [jnp.full((n_pad,), jnp.asarray(v, f32).reshape(-1)[0])
            for v in ss_prices]
    zpad = jnp.zeros((n_pad,), f32)

    def tail(xx, aggs):
        x_mat = assemble_full_xmat(xx, aggs, exog32, model32,
                                   ss0.vars, ssT.vars)
        return residuals(x_mat, model32)

    def _run(x, v):
        x32 = x.astype(f32)
        v32 = v.astype(f32)
        ps, dps = jax.jvp(price_map, (x32,), (v32,))
        args = [jnp.concatenate([ps[i], pads[i]]) for i in range(4)]
        dargs = [jnp.concatenate([dps[i], zpad]) for i in range(4)]
        policies, dpolicies = fused2_policies_jvp(
            *args, *dargs, ssT.value, model32, interpret=interpret)
        policies = {k: p_[:Tm1] for k, p_ in policies.items()}
        dpolicies = {k: p_[:Tm1] for k, p_ in dpolicies.items()}
        if forward == "pallas":
            aggs, daggs = fused2_forward_jvp(policies, dpolicies,
                                             ss0.D, model32,
                                             interpret=interpret)
        else:
            aggs, daggs = jax.jvp(
                lambda pol: forward_iteration(pol, model32,
                                              ss0.D.astype(f32)),
                (policies,), (dpolicies,))
        return jax.jvp(tail, (x32, aggs), (v32, daggs))

    def jvp_dir(x, v):
        return _run(x, v)[1]

    def residual32(x):
        return _run(x, jnp.zeros_like(x))[0]

    jvp_dir._residual32 = residual32
    return jvp_dir


# ───────────────────────── forward (distribution) kernel ────────────────────
# Flat-state design: per (e, acc) group the distribution lives as a (1024, 1)
# column over flattened states s = b*n_a + a (800 real). One period is, per
# group, a separable-GEMM joint lottery:
#     D2'[i, j] = sum_s hat_i(pol_b[s]) * hat_j(pol_a[s]) * D[s]
#               = dot_TN(HB, D ⊙ HA)          (contract the 1024 sublanes)
# followed by a static-GEMM layout flatten back to a column
#     F1 = EFAT @ D2'   (EFAT[s, i] = 1 iff i == b(s));  D'[s] = Σ_j MSEL⊙F1
# and compile-time-constant income/access mixing FMAs. Tangents add two more
# TN GEMMs (surface tangent + lottery-slope terms). Aggregates are
# mass-weighted lane reductions emitted per period.


def _make_fwd2_kernel(Tm1: int, n_b: int, n_a: int, n_e: int,
                      pi, lam: float, *, b0: float, btop: float,
                      a0: float, atop: float):
    """Forward dual lottery kernel, grid over t. Policy blocks stream in as
    (1, n_e, 1024, 1) flat columns per branch; D carries live in VMEM."""
    S = 8 * _N                                    # 1024 flat-state slots

    def kernel(pbn_ref, dpbn_ref, pan_ref, dpan_ref, cn_ref, dcn_ref,
               pba_ref, dpba_ref, paa_ref, dpaa_ref, ca_ref, dca_ref,
               d0_ref,                             # (n_e, 2, S, 1)
               BKN, BGLO, BGHI,                    # (S, N) static b-knot tables
               AKN, AGLO, AGHI,                    # (S, N) static a-knot tables
               EFAT, MSEL,                         # (S, N) static flatteners
               aggB_ref, daggB_ref, aggA_ref, daggA_ref,   # out (1, 1)
               aggC_ref, daggC_ref,
               D_scr, dD_scr):                     # scratch (n_e, 2, S, 1)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for e in range(n_e):
                for acc in range(2):
                    D_scr[e, acc] = d0_ref[e, acc]
                    dD_scr[e, acc] = jnp.zeros((S, 1), f32)

        tn = (((0,), (0,)), ((), ()))

        def push(pol_b, dpol_b, pol_a, dpol_a, D, dD):
            """One group's joint-lottery push -> flat (S, 1) column pair."""
            HB, HBdq = _hat_q(pol_b, 1.0, BKN[:, :], BGLO[:, :], BGHI[:, :],
                              b0, btop)
            HA, HAdq = _hat_q(pol_a, 1.0, AKN[:, :], AGLO[:, :], AGHI[:, :],
                              a0, atop)
            U = D * HA
            dU = dD * HA + (D * dpol_a) * HAdq
            D2 = jax.lax.dot_general(HB, U, tn, preferred_element_type=f32)
            dD2 = (jax.lax.dot_general(HB, dU, tn, preferred_element_type=f32)
                   + jax.lax.dot_general(HBdq * dpol_b, U, tn,
                                         preferred_element_type=f32))
            flat = lambda M: _lane_red(MSEL[:, :] * _nn(EFAT[:, :], M))  # noqa: E731
            return flat(D2), flat(dD2)

        halves = []                                # per (e): summed-over-acc
        pols = []
        for e in range(n_e):
            pb_n, dpb_n = pbn_ref[0, e], dpbn_ref[0, e]
            pa_n, dpa_n = pan_ref[0, e], dpan_ref[0, e]
            c_n, dc_n = cn_ref[0, e], dcn_ref[0, e]
            pb_a, dpb_a = pba_ref[0, e], dpba_ref[0, e]
            pa_a, dpa_a = paa_ref[0, e], dpaa_ref[0, e]
            c_a, dc_a = ca_ref[0, e], dca_ref[0, e]
            h0, dh0 = push(pb_n, dpb_n, pa_n, dpa_n,
                           D_scr[e, 0], dD_scr[e, 0])
            h1, dh1 = push(pb_a, dpb_a, pa_a, dpa_a,
                           D_scr[e, 1], dD_scr[e, 1])
            halves.append((h0 + h1, dh0 + dh1))
            pols.append(((pb_n, dpb_n, pa_n, dpa_n, c_n, dc_n),
                         (pb_a, dpb_a, pa_a, dpa_a, c_a, dc_a)))

        aggB = jnp.zeros((1, 1), f32)
        daggB = jnp.zeros((1, 1), f32)
        aggA = jnp.zeros((1, 1), f32)
        daggA = jnp.zeros((1, 1), f32)
        aggC = jnp.zeros((1, 1), f32)
        daggC = jnp.zeros((1, 1), f32)
        for e in range(n_e):
            mixed = pi[0][e] * halves[0][0]
            dmixed = pi[0][e] * halves[0][1]
            for fi in range(1, n_e):
                mixed = mixed + pi[fi][e] * halves[fi][0]
                dmixed = dmixed + pi[fi][e] * halves[fi][1]
            for acc, wgt in ((0, 1.0 - lam), (1, lam)):
                Dn = wgt * mixed
                dDn = wgt * dmixed
                D_scr[e, acc] = Dn
                dD_scr[e, acc] = dDn
                pb, dpb, pa, dpa, cc, dcc = pols[e][acc]
                red = lambda x: jnp.sum(x, axis=0, keepdims=True).reshape(1, 1)  # noqa: E731
                aggB += red(pb * Dn)
                daggB += red(dpb * Dn + pb * dDn)
                aggA += red(pa * Dn)
                daggA += red(dpa * Dn + pa * dDn)
                aggC += red(cc * Dn)
                daggC += red(dcc * Dn + cc * dDn)

        # Outputs are FULL (Tm1, 1) blocks revisited every grid step (the
        # TPU lowering rejects (1, 1) blocks: the last two block dims must
        # be (8k, 128k) or the whole array); each step writes its own row —
        # the same dynamic-sublane store the 1-asset kernel uses.
        aggB_ref[pl.ds(step, 1), :] = aggB
        daggB_ref[pl.ds(step, 1), :] = daggB
        aggA_ref[pl.ds(step, 1), :] = aggA
        daggA_ref[pl.ds(step, 1), :] = daggA
        aggC_ref[pl.ds(step, 1), :] = aggC
        daggC_ref[pl.ds(step, 1), :] = daggC

    return kernel


def _fwd2_statics(model):
    liquid = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    n_b, n_a = liquid.n, illiq.n
    S = 8 * _N
    bp = _pad_grid(np.asarray(liquid.grid, np.float64), _N)
    ap = _pad_grid(np.asarray(illiq.grid, np.float64), _N)
    bglo, bghi = _hat_tables(bp)
    aglo, aghi = _hat_tables(ap)
    bcS = lambda row: np.broadcast_to(row[None, :], (S, _N)).copy()  # noqa: E731
    s_idx = np.arange(S)
    b_of_s = s_idx // n_a
    a_of_s = s_idx % n_a
    valid = b_of_s < n_b
    efat = np.zeros((S, _N), np.float32)
    efat[s_idx[valid], b_of_s[valid]] = 1.0
    msel = np.zeros((S, _N), np.float32)
    msel[s_idx[valid], a_of_s[valid]] = 1.0
    return tuple(jnp.asarray(x) for x in (
        bcS(bp), bcS(bglo), bcS(bghi), bcS(ap), bcS(aglo), bcS(aghi),
        efat, msel))


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fwd2_kernel_call(flat_pols, d0, statics, *, meta, interpret=False):
    (Tm1, n_b, n_a, n_e, pi, lam, b0, btop, a0, atop) = meta
    S = 8 * _N
    kernel = _make_fwd2_kernel(Tm1, n_b, n_a, n_e, pi, lam,
                               b0=b0, btop=btop, a0=a0, atop=atop)
    # Explicit index maps everywhere (i32 zeros derived from the index arg —
    # the default full-array map's literal 0s trace as i64 under x64 and
    # fail Mosaic func.return legalization; see _fused2_kernel_call).
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i, nd=arr.ndim: (i * 0,) * nd)
    pol_blk = pl.BlockSpec((1, n_e, S, 1),
                           lambda i: (i, i * 0, i * 0, i * 0))
    out_blk = pl.BlockSpec((Tm1, 1), lambda i: (i * 0, i * 0))
    return pl.pallas_call(
        kernel,
        grid=(Tm1,),
        out_shape=(jax.ShapeDtypeStruct((Tm1, 1), f32),) * 6,
        in_specs=[pol_blk] * 12 + [full(d0)] + [full(s) for s in statics],
        out_specs=(out_blk,) * 6,
        scratch_shapes=[pltpu.VMEM((n_e, 2, S, 1), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*flat_pols, d0, *statics)


def fused2_forward_jvp(policies, dpolicies, D0, model,
                       interpret: bool = False):
    """Dual distribution push + aggregation in the forward Pallas kernel.

    policies/dpolicies: {B, A, C} dicts of (T-1, n_b, n_a, n_e, 2) paths
    (from `fused2_policies_jvp`). Returns (aggs, daggs) dicts of (T-1,)
    aggregate paths — semantics of `blocks/forward.forward_iteration` under
    jvp (same boundary-clipped Young lottery, i.i.d.-access + income mixing,
    aggregate-after-update convention)."""
    liquid = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    income = model.heterogeneity["income"]
    access = model.heterogeneity["access"]
    n_b, n_a, n_e = liquid.n, illiq.n, income.n
    S = 8 * _N
    Tm1 = next(iter(policies.values())).shape[0]

    def flat(p):                                   # (T-1, b, a, e) per acc
        x = jnp.transpose(p, (0, 3, 1, 2)).reshape(Tm1, n_e, n_b * n_a, 1)
        return jnp.pad(x.astype(f32), ((0, 0), (0, 0),
                                       (0, S - n_b * n_a), (0, 0)))

    flat_pols = []
    for key in ("B", "A", "C"):
        for acc in (0, 1):
            flat_pols.append(flat(policies[key][..., acc]))
            flat_pols.append(flat(dpolicies[key][..., acc]))
    # Kernel arg order: (pbn, dpbn, pan, dpan, cn, dcn, pba, dpba, ...):
    # regroup from (B0,dB0,B1,dB1, A0,dA0,A1,dA1, C0,dC0,C1,dC1).
    ix = [0, 1, 4, 5, 8, 9, 2, 3, 6, 7, 10, 11]
    flat_pols = tuple(flat_pols[i] for i in ix)

    d0 = jnp.transpose(D0.astype(f32), (2, 3, 0, 1)).reshape(
        n_e, 2, n_b * n_a, 1)
    d0 = jnp.pad(d0, ((0, 0), (0, 0), (0, S - n_b * n_a), (0, 0)))

    statics = _fwd2_statics(model)
    pi = tuple(tuple(float(v) for v in row)
               for row in np.asarray(income.transition))
    lam = float(np.asarray(access.transition)[0, 1])
    bgrid = np.asarray(liquid.grid)
    agrid = np.asarray(illiq.grid)
    meta = (Tm1, n_b, n_a, n_e, pi, lam,
            float(bgrid[0]), float(bgrid[-1]),
            float(agrid[0]), float(agrid[-1]))
    outs = _fwd2_kernel_call(flat_pols, d0, statics, meta=meta,
                             interpret=interpret)
    aggB, daggB, aggA, daggA, aggC, daggC = [o[:, 0] for o in outs]
    return ({"B": aggB, "A": aggA, "C": aggC},
            {"B": daggB, "A": daggA, "C": daggC})


def make_fused2_residual_fn(model, ss_initial, ss_ending, exog_paths,
                            interpret: bool = False):
    """F32(x) primal residual via the fused two-asset kernel pair (zero
    tangent) — the mixed-schedule counterpart of
    `fused_sweep.make_fused_residual_fn`."""
    return make_fused2_jvp_dir(model, ss_initial, ss_ending, exog_paths,
                               interpret=interpret)._residual32
