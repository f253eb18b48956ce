"""Round-4 probe: localize the TPU two-asset per-step noise + test fixes.

Runs ONE Bellman step of the two-asset model at steady-state inputs and dumps
every candidate formulation of the portfolio-split root a*:

- W continuation built with the production einsum ("baf,ef->bae") vs an
  UNROLLED elementwise contraction over e' (TPU emulated-f64 einsum rounds at
  ~5e-13, elementwise at ~1e-15 — scripts/tpu_f64_op_probe.py findings);
- FOC gap g evaluated as interp(Wb) − interp(Wa) (production) vs a SINGLE
  interpolation of the precomputed difference surface G = Wb − Wa ("G-surface":
  near the root the local values of G are ~g'·h small, so interpolation error
  is relative to that small scale instead of |W|, and the root shift drops from
  err·|W|/g' to ~err·h);
- gather vs hat-basis bilinear lowerings.

Usage:
  TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_step_probe.py --out /tmp/r4_step_tpu.npz
  CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
       python scripts/r4_step_probe.py --out /tmp/r4_step_cpu.npz
  cmp: ... python scripts/r4_step_probe.py --compare /tmp/r4_step_cpu.npz /tmp/r4_step_tpu.npz
"""
import argparse
import sys

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--out")
ap.add_argument("--compare", nargs=2)
a = ap.parse_args()

if a.compare:
    c = np.load(a.compare[0])
    t = np.load(a.compare[1])
    for k in c.keys():
        d = np.max(np.abs(c[k] - t[k]))
        scale = max(np.max(np.abs(c[k])), 1e-30)
        print(f"{k:24s} maxdev={d:.3e}  (scale {scale:.2e})")
    sys.exit(0)

import jax
import jax.numpy as jnp

from hank_tpu.models import load_model
from hank_tpu.models import hank_two_asset as m2
from hank_tpu.utils.checkpoint import get_or_solve

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

xv = {k: jnp.asarray(v) for k, v in ssT.vars.items()}
value_next = jnp.asarray(ssT.value)

K = m2._SPLIT_SCAN_K
BIS = m2._SPLIT_BISECT_ITERS
POL = m2._SPLIT_POLISH_ITERS


def contract_unrolled(V):
    """E over e': Σ_f V[..., f]·Pi[e, f] as elementwise multiply-adds."""
    acc = V[..., 0:1] * Pi[None, None, :, 0]
    for f in range(1, n_e):
        acc = acc + V[..., f:f + 1] * Pi[None, None, :, f]
    return acc


def make_W(kind):
    Vb_next, Va_next = value_next[0], value_next[1]
    Vb_mix = (1.0 - lam) * Vb_next[..., 0] + lam * Vb_next[..., 1]
    Va_mix = (1.0 - lam) * Va_next[..., 0] + lam * Va_next[..., 1]
    if kind == "ein":
        Wb = jnp.maximum(beta * jnp.einsum("baf,ef->bae", Vb_mix, Pi), 1e-12)
        Wa = jnp.maximum(beta * jnp.einsum("baf,ef->bae", Va_mix, Pi), 1e-12)
    else:
        Wb = jnp.maximum(beta * contract_unrolled(Vb_mix), 1e-12)
        Wa = jnp.maximum(beta * contract_unrolled(Va_mix), 1e-12)
    return Wb, Wa


def solve_split(Wb, Wa, bilinear, use_G):
    """Replicates models/hank_two_asset.py:326-392 with a pluggable g."""
    s_grid = bgrid * ((bgrid[-1] + agrid[-1]) / bgrid[-1])
    n_s = n_b
    s2 = jnp.broadcast_to(s_grid[:, None], (n_s, n_e))
    if use_G:
        G = Wb - Wa

        def g_fun(a_s):
            b_s = s2 - a_s
            gv, g_db, g_da = bilinear(G, bgrid, agrid, b_s, a_s)
            return gv, g_da - g_db
    else:
        def g_fun(a_s):
            b_s = s2 - a_s
            wb, wb_db, _ = bilinear(Wb, bgrid, agrid, b_s, a_s)
            wa, _, wa_da = bilinear(Wa, bgrid, agrid, b_s, a_s)
            return wb - wa, -wb_db - wa_da

    frac = jnp.linspace(0.0, 1.0, K, dtype=s2.dtype)
    a_scan = frac[:, None, None] * s2
    g_scan, _ = g_fun(a_scan)
    g_lo, g_hi = g_scan[0], g_scan[-1]
    i_lo = jnp.clip(jnp.sum(g_scan < 0, axis=0) - 1, 0, K - 2)
    lo = jnp.take_along_axis(a_scan, i_lo[None], axis=0)[0]
    hi = jnp.take_along_axis(a_scan, i_lo[None] + 1, axis=0)[0]

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        g, _ = g_fun(mid)
        neg = g < 0
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, BIS, bisect, (lo, hi))
    width = hi - lo
    p_lo = jnp.maximum(lo - width, 0.0)
    p_hi = jnp.minimum(hi + width, s2)

    def polish(_, a_s):
        g, gp = g_fun(a_s)
        return jnp.clip(a_s - g / jnp.maximum(gp, 1e-10), p_lo, p_hi)

    a_iter = jax.lax.fori_loop(0, POL, polish, 0.5 * (lo + hi))
    a_star = jnp.where(g_lo >= 0, 0.0, jnp.where(g_hi <= 0, s2, a_iter))
    return a_star


out = {}
Wb_e, Wa_e = jax.jit(lambda: make_W("ein"))()
Wb_u, Wa_u = jax.jit(lambda: make_W("unr"))()
out["Wb_ein"], out["Wa_ein"] = np.asarray(Wb_e), np.asarray(Wa_e)
out["Wb_unr"], out["Wa_unr"] = np.asarray(Wb_u), np.asarray(Wa_u)
out["G_ein"] = np.asarray(Wb_e - Wa_e)
out["G_unr"] = np.asarray(Wb_u - Wa_u)

variants = {
    "astar_2i_ein_gat": ("ein", m2._bilinear, False),
    "astar_G_ein_gat": ("ein", m2._bilinear, True),
    "astar_2i_unr_gat": ("unr", m2._bilinear, False),
    "astar_G_unr_gat": ("unr", m2._bilinear, True),
    "astar_G_unr_hat": ("unr", m2._bilinear_hat, True),
    "astar_2i_ein_hat": ("ein", m2._bilinear_hat, False),
}
for name, (wk, bil, useG) in variants.items():
    Wb, Wa = (Wb_e, Wa_e) if wk == "ein" else (Wb_u, Wa_u)
    out[name] = np.asarray(jax.jit(
        lambda Wb=Wb, Wa=Wa, bil=bil, useG=useG: solve_split(Wb, Wa, bil, useG))())

# full production step (backend-default lowerings) for reference
res = jax.jit(lambda v: m2.ValueFunction(v, xv, model))(value_next)
for k in ("B", "A", "C"):
    out[f"pol_{k}"] = np.asarray(res[k])
out["val"] = np.asarray(res["Value"])

np.savez_compressed(a.out, **out)
print("saved", a.out, "backend", jax.default_backend(), flush=True)
