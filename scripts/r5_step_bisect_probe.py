"""Round-5 forensics, part 5: bisect the Bellman-step bias to an intermediate.

`r5_scan_probe2` proved the ~1.3e-9/step one-sided W bias appears whenever
the PRICES are traced arguments (python-unrolled loops deviate identically
to lax.scan; constant prices are clean in every loop context — XLA folds
the price-derived arrays on the host). The per-op probes (traced inputs)
are all ~1e-15, so the culprit is a composite. This probe re-runs ONE
two-asset Bellman step (a structural copy of
`models/hank_two_asset.ValueFunction` instrumented to return every named
intermediate) with traced prices, on both backends, and diffs each
intermediate — the first ~1e-9 deviation localizes the bias.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_step_bisect_probe.py --out /tmp/r5_bisect_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_step_bisect_probe.py --out /tmp/r5_bisect_cpu.npz
Then: python scripts/r5_step_bisect_probe.py --compare /tmp/r5_bisect_tpu.npz /tmp/r5_bisect_cpu.npz
"""
import argparse
import json

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--out")
ap.add_argument("--compare", nargs=2)
a = ap.parse_args()

if a.compare:
    t = np.load(a.compare[0])
    c = np.load(a.compare[1])
    rows = []
    for k in t.files:
        rr = np.abs(t[k] - c[k]) / np.maximum(np.abs(c[k]), 1e-300)
        rows.append((float(np.median(rr)), float(rr.max()), k))
    for med, mx, k in rows:
        print(f"{k:16s} med {med:.3e}  max {mx:.3e}")
    raise SystemExit

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hank_tpu.models import load_model  # noqa: E402
from hank_tpu.models.hank_two_asset import (  # noqa: E402
    _bilinear, _bilinear2_gather, _crra_inv_marg, _crra_marg, _expect_income,
    _interp_fixed_axis1_gather, _interp_val_slope)
from hank_tpu.ops.egm import interp_columns  # noqa: E402
from hank_tpu.ops.precision import one_minus  # noqa: E402
from hank_tpu.utils.checkpoint import get_or_solve  # noqa: E402

model = load_model("hank_two_asset", T=300)
ss0, ssT, _ = get_or_solve(model)

liquid = model.heterogeneity["liquid"]
illiq = model.heterogeneity["illiquid"]
income = model.heterogeneity["income"]
access = model.heterogeneity["access"]
bgrid, agrid = liquid.grid, illiq.grid
Pi = income.transition
lam = access.transition[0, 1]
n_b, n_a, n_e = liquid.n, illiq.n, income.n
p = model.params
beta, gamma = p["β"], p["γ"]
chi = float(p.get("portfolio_reg", 0.0))


def step_intermediates(value_next, r, ra, tau, w):
    """Gather-lowering copy of ValueFunction (models/hank_two_asset.py:385),
    returning every named intermediate."""
    out = {}
    bilinear, interp_vs = _bilinear, _interp_val_slope
    bilinear2, interp_fix1 = _bilinear2_gather, _interp_fixed_axis1_gather

    y_e = jnp.maximum(one_minus(tau) * w, 1e-9) * income.grid
    out["y_e"] = y_e
    Vb_next, Va_next = value_next[0], value_next[1]
    Vb_mix = (1.0 - lam) * Vb_next[..., 0] + lam * Vb_next[..., 1]
    Va_mix = (1.0 - lam) * Va_next[..., 0] + lam * Va_next[..., 1]
    Wb = jnp.maximum(beta * _expect_income(Vb_mix, Pi), 1e-12)
    Wa = jnp.maximum(beta * _expect_income(Va_mix, Pi), 1e-12)
    out["Wb"] = Wb
    out["Wa"] = Wa

    a_raw = (1.0 + ra) * agrid
    a_next = jnp.minimum(a_raw, agrid[-1])
    payout = a_raw - a_next
    capped = a_raw >= agrid[-1]
    inc_n = payout[None, :, None] + y_e[None, None, :]
    out["a_next"] = a_next
    out["inc_n"] = inc_n
    WW = jnp.stack([Wb, Wa], axis=-1)
    W_n = interp_fix1(WW, agrid, a_next)
    Wb_n, Wa_n = W_n[..., 0], W_n[..., 1]
    out["Wb_n"] = Wb_n
    c_end_n = _crra_inv_marg(Wb_n, gamma)
    out["c_end_n"] = c_end_n
    implied_b = (c_end_n + bgrid[:, None, None] - inc_n) / (1.0 + r)
    out["implied_b"] = implied_b
    flat = lambda z: z.reshape(n_b, n_a * n_e)  # noqa: E731
    pol_b_n = interp_columns(
        bgrid, flat(implied_b),
        jnp.broadcast_to(bgrid[:, None, None],
                         implied_b.shape).reshape(n_b, -1))
    pol_b_n = jnp.clip(pol_b_n.reshape(n_b, n_a, n_e),
                       p["borrow_cons"], bgrid[-1])
    out["pol_b_n"] = pol_b_n
    c_n = jnp.maximum((1.0 + r) * bgrid[:, None, None] + inc_n - pol_b_n,
                      1e-12)
    out["c_n"] = c_n

    s_grid = bgrid * ((bgrid[-1] + agrid[-1]) / bgrid[-1])
    n_s = n_b
    s2 = jnp.broadcast_to(s_grid[:, None], (n_s, n_e))
    G = Wb - Wa
    out["G"] = G
    if chi > 0.0:
        mid = 0.5 * s2
        wsum_mid, _, _ = bilinear(Wb + Wa, bgrid, agrid, mid, mid)
        pen_slope = chi * wsum_mid / jnp.maximum(s2, s_grid[1])
        out["pen_slope"] = pen_slope
    else:
        pen_slope = None

    def g_fun(a_s):
        b_s = s2 - a_s
        gv, g_db, g_da = bilinear(G, bgrid, agrid, b_s, a_s)
        gp = g_da - g_db
        if pen_slope is not None:
            gv = gv + pen_slope * (a_s - 0.5 * s2)
            gp = gp + pen_slope
        return gv, gp

    a_knots = jnp.broadcast_to(agrid[:, None, None], (n_a, n_s, n_e))
    b_knots = s2[None] - jnp.broadcast_to(bgrid[:, None, None],
                                          (n_b, n_s, n_e))
    cand = jnp.concatenate([jnp.zeros((1, n_s, n_e), s2.dtype),
                            a_knots, b_knots, s2[None]], axis=0)
    cand = jnp.clip(cand, 0.0, s2[None])
    g_cand, _ = g_fun(cand)
    out["g_cand_mid"] = g_cand[g_cand.shape[0] // 2]
    g_lo, g_hi = g_cand[0], g_cand[-1]
    neg = g_cand < 0
    big = jnp.asarray(jnp.finfo(s2.dtype).max, s2.dtype)
    lo = jnp.max(jnp.where(neg, cand, -big), axis=0)
    hi = jnp.min(jnp.where(neg, big, cand), axis=0)
    g0 = jnp.max(jnp.where(neg, g_cand, -big), axis=0)
    g1 = jnp.min(jnp.where(neg, big, g_cand), axis=0)
    has_neg = jnp.any(neg, axis=0)
    has_pos = jnp.any(~neg, axis=0)
    lo = jnp.where(has_neg, lo, 0.0)
    g0 = jnp.where(has_neg, g0, -1.0)
    hi = jnp.where(has_pos, hi, s2)
    g1 = jnp.where(has_pos, g1, 1.0)
    out["lo"] = lo
    out["hi"] = hi

    h = hi - lo
    gm, _ = g_fun(0.5 * (lo + hi))
    a0 = g0
    a1c = -3.0 * g0 + 4.0 * gm - g1
    a2c = 2.0 * g0 - 4.0 * gm + 2.0 * g1
    disc = jnp.maximum(a1c * a1c - 4.0 * a2c * a0, 0.0)
    sgn = jnp.where(a1c >= 0, 1.0, -1.0)
    q = -0.5 * (a1c + sgn * jnp.sqrt(disc))
    u_a = a0 / jnp.where(jnp.abs(q) > 0, q, 1.0)
    u_b = q / jnp.where(jnp.abs(a2c) > 0, a2c, 1.0)
    in01 = (u_a >= 0.0) & (u_a <= 1.0) & (jnp.abs(q) > 0)
    u = jnp.clip(jnp.where(in01, u_a, u_b), 0.0, 1.0)
    a_iter = jnp.where(h > 0, lo + u * h, lo)
    a_iter = jax.lax.stop_gradient(a_iter)
    g_at, g_a = g_fun(a_iter)
    g_a = jnp.maximum(jax.lax.stop_gradient(g_a), 1e-10)
    a_star = jnp.clip(a_iter - g_at / g_a, 0.0, s2)
    a_star = jnp.where(g_lo >= 0, 0.0, jnp.where(g_hi <= 0, s2, a_star))
    b_star = s2 - a_star
    out["a_star"] = a_star

    w_ba, w_db, w_da = bilinear2(WW, bgrid, agrid, b_star, a_star)
    wb_s, wa_s = w_ba[..., 0], w_ba[..., 1]
    wb_db, wa_db = w_db[..., 0], w_db[..., 1]
    wb_da, wa_da = w_da[..., 0], w_da[..., 1]
    wbp = wb_da - wb_db
    wap = wa_da - wa_db
    gp_s = wbp - wap
    combo_ok = ((a_star > 0.0) & (a_star < s2)
                & (wbp >= 0.0) & (wap <= 0.0) & (gp_s > 1e-10))
    M_combo = (wbp * wa_s - wap * wb_s) / jnp.where(combo_ok, gp_s, 1.0)
    W_s = jnp.where(combo_ok, M_combo, jnp.maximum(wb_s, wa_s))
    out["W_s"] = W_s

    c_end_s = _crra_inv_marg(W_s, gamma)
    w_knots = c_end_s + s2
    out["w_knots"] = w_knots
    w_grid = ((1.0 + r) * bgrid[:, None, None]
              + (1.0 + ra) * agrid[None, :, None] + y_e[None, None, :])
    out["w_grid"] = w_grid
    wq = w_grid.reshape(n_b * n_a, n_e)
    pol_s = jnp.clip(interp_columns(wq, w_knots, s2), 0.0, None)
    out["pol_s"] = pol_s
    pol_a_a = interp_columns(pol_s, s2, a_star)
    pol_a_a = jnp.clip(pol_a_a, 0.0, jnp.minimum(pol_s, agrid[-1]))
    pol_b_a = jnp.clip(pol_s - pol_a_a, p["borrow_cons"], bgrid[-1])
    c_a = jnp.maximum(wq - pol_b_a - pol_a_a, 1e-12)
    out["pol_a_a"] = pol_a_a
    out["c_a"] = c_a

    up_n = _crra_marg(c_n, gamma)
    up_a = _crra_marg(c_a.reshape(n_b, n_a, n_e), gamma)
    Wa_n_at_b, _ = interp_vs(Wa_n, bgrid, pol_b_n, axis=0)
    Va_margin_n = jnp.where(capped[None, :, None], 0.0, Wa_n_at_b)
    out["Vb_n_new"] = (1.0 + r) * up_n
    out["Va_n_new"] = (1.0 + ra) * Va_margin_n
    out["Vb_a_new"] = (1.0 + r) * up_a
    out["Va_a_new"] = (1.0 + ra) * up_a
    return out


names = model.var_names()
sv = {n: float(ssT.vars[n]) for n in names}
fn = jax.jit(step_intermediates)
res = fn(ssT.value, jnp.asarray(sv["r"]), jnp.asarray(sv["ra"]),
         jnp.asarray(sv["tau"]), jnp.asarray(sv["w"]))
np.savez_compressed(a.out, **{k: np.asarray(v) for k, v in res.items()})
print("saved", a.out, flush=True)
print(json.dumps({"backend": jax.default_backend()}), flush=True)
