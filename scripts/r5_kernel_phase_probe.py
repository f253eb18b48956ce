"""Round-5 KS kernel decomposition: where do the 48 µs/step go?

The fused KS sweep measures 28.7 ms at T=300 (200x7, 598 kernel steps);
time-loop unroll=4 only buys 4% — the cost is per-step tensor work, not
loop control. This probe compiles PRUNED variants of the kernel (same
shapes, pieces of the step body removed) and times them on hardware to
attribute the per-step cost:

  full        control (mirrors ops/fused_sweep.py at unroll=1)
  bwd_only    backward EGM recursion only (forward loop skipped)
  fwd_only    forward lottery only (backward loop writes pol=grid rows)
  bwd_nogather backward with bracket search but interp replaced by
              elementwise mix of implied rows (isolates _gather_lanes)
  bwd_elem    backward with bracket+gather replaced (pure elementwise EGM)
  fwd_nohat   forward with the per-step hat construction replaced by a
              STATIC hat matrix (isolates the (e,a,a) FMA construction)

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_kernel_phase_probe.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hank_tpu.ops.fused_sweep import _bracket, _gather_lanes

f32 = jnp.float32
i32 = jnp.int32

Tm1, n_a, n_e = 299, 256, 7   # padded KS shapes (200 -> 256 lanes)
N_REAL = 200
BETA, GAMMA, BC = 0.98, 2.0, 0.0


def make_kernel(variant: str):
    inv_g = -1.0 / GAMMA

    def kernel(r_ref, w_ref, dr_ref, dw_ref,
               vT_ref, d0_ref, grid_ref, egrid_ref, pi_ref,
               glo_ref, ghi_ref, iup_ref, idn_ref,
               agg_ref, dagg_ref, aggc_ref, daggc_ref,
               pol_scr, dpol_scr):
        grid2 = grid_ref[:, :]
        labor = egrid_ref[:, :]
        Pi = pi_ref[:, :]
        lane_real = jax.lax.broadcasted_iota(i32, (n_e, n_a), 1) \
            < jnp.asarray(N_REAL, i32)

        def bstep(t, carry):
            V, dV = carry
            r = r_ref[t]
            w = w_ref[t]
            dr = dr_ref[t]
            dw = dw_ref[t]
            E = jnp.dot(Pi, V, preferred_element_type=f32)
            dE = jnp.dot(Pi, dV, preferred_element_type=f32)
            live = E > 1e-12
            E = jnp.maximum(E, 1e-12)
            dE = jnp.where(live, dE, 0.0)
            c = (BETA * E) ** inv_g
            dc = inv_g * c / E * dE
            inv1r = 1.0 / (1.0 + r)
            implied = (c - w * labor + grid2) * inv1r
            dimplied = (dc - dw * labor) * inv1r - implied * (dr * inv1r)
            implied = jnp.where(lane_real, implied, jnp.asarray(1e30, f32))
            dimplied = jnp.where(lane_real, dimplied, jnp.asarray(0.0, f32))

            if variant == "bwd_elem":
                pol = jnp.maximum(implied * 0.9, BC)
                dpol = dimplied * 0.9
            elif variant == "bwd_nogather":
                idx = _bracket(implied, grid2, n_a)
                fidx = idx.astype(f32) * (1.0 / n_a)
                pol = jnp.maximum(implied * fidx, BC)
                dpol = dimplied * fidx
            else:
                idx = _bracket(implied, grid2, n_a)
                one = jnp.asarray(1, i32)
                lo, dlo, vlo = _gather_lanes(idx - one, implied, dimplied,
                                             grid2)
                hi, dhi, vhi = _gather_lanes(idx, implied, dimplied, grid2)
                den = hi - lo
                safe = jnp.where(den > 0, den, 1.0)
                tw_raw = (grid2 - lo) / safe
                interior = (tw_raw > 0.0) & (tw_raw < 1.0) & (den > 0)
                tw = jnp.clip(tw_raw, 0.0, 1.0)
                dtw = jnp.where(interior, -(dlo + tw * (dhi - dlo)) / safe,
                                0.0)
                pol = vlo + tw * (vhi - vlo)
                dpol = dtw * (vhi - vlo)
                unbound = pol > BC
                pol = jnp.maximum(pol, BC)
                dpol = jnp.where(unbound, dpol, 0.0)

            cg_raw = (1.0 + r) * grid2 + w * labor - pol
            cg_live = cg_raw > 1e-12
            cg = jnp.maximum(cg_raw, 1e-12)
            dcg = jnp.where(cg_live, dr * grid2 + dw * labor - dpol, 0.0)
            cpow = cg ** (-GAMMA)
            Vn = (1.0 + r) * cpow
            dVn = dr * cpow + (1.0 + r) * (-GAMMA) * cpow / cg * dcg
            pol_scr[pl.ds(t, 1)] = pol[None]
            dpol_scr[pl.ds(t, 1)] = dpol[None]
            return Vn, dVn

        def loop(step, reverse, init):
            def body(j, carry):
                t = jnp.asarray(Tm1 - 1, i32) - j if reverse else j
                return step(t, carry)
            return jax.lax.fori_loop(jnp.asarray(0, i32),
                                     jnp.asarray(Tm1, i32), body, init)

        if variant == "fwd_only":
            pol_scr[...] = jnp.broadcast_to(grid2 * 0.9,
                                            (Tm1, n_e, n_a)).astype(f32)
            dpol_scr[...] = jnp.zeros((Tm1, n_e, n_a), f32)
        else:
            loop(bstep, True, (vT_ref[:, :], jnp.zeros((n_e, n_a), f32)))

        glo = glo_ref[:, :]
        ghi = ghi_ref[:, :]
        iup = iup_ref[:, :]
        idn = idn_ref[:, :]
        g_bot = grid2[:, 0:1]
        g_top = grid2[:, N_REAL - 1:N_REAL]

        def fstep(t, carry):
            D, dD = carry
            pol = pol_scr[t]
            dpol = dpol_scr[t]
            r = r_ref[t]
            w = w_ref[t]
            dr = dr_ref[t]
            dw = dw_ref[t]
            if variant == "fwd_nohat":
                # static hat: replaces the per-step (e,a,b) construction
                hat = jnp.broadcast_to(iup[:, None, :] * 0.01,
                                       (n_e, n_a, n_a))
                slope = hat
            else:
                p = jnp.minimum(jnp.maximum(pol, g_bot), g_top)
                pb = p[:, :, None]
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
            D_half = jnp.sum(hat * D[:, :, None], axis=1)
            dD_half = jnp.sum(hat * dD[:, :, None]
                              + slope * (dpol * D)[:, :, None], axis=1)
            PiT = Pi.T
            D_new = jnp.dot(PiT, D_half, preferred_element_type=f32)
            dD_new = jnp.dot(PiT, dD_half, preferred_element_type=f32)
            agg_ref[pl.ds(t, 1), :] = jnp.sum(pol * D_new).reshape(1, 1)
            dagg_ref[pl.ds(t, 1), :] = jnp.sum(
                dpol * D_new + pol * dD_new).reshape(1, 1)
            cg = jnp.maximum((1.0 + r) * grid2 + w * labor - pol, 1e-12)
            dcg = dr * grid2 + dw * labor - dpol
            aggc_ref[pl.ds(t, 1), :] = jnp.sum(cg * D_new).reshape(1, 1)
            daggc_ref[pl.ds(t, 1), :] = jnp.sum(
                dcg * D_new + cg * dD_new).reshape(1, 1)
            return D_new, dD_new

        if variant == "bwd_only":
            agg_ref[...] = jnp.zeros((Tm1, 1), f32)
            dagg_ref[...] = jnp.zeros((Tm1, 1), f32)
            aggc_ref[...] = jnp.zeros((Tm1, 1), f32)
            daggc_ref[...] = jnp.zeros((Tm1, 1), f32)
            # keep pol_scr live
            agg_ref[pl.ds(0, 1), :] = jnp.sum(pol_scr[0]).reshape(1, 1)
        else:
            loop(fstep, False, (d0_ref[:, :], jnp.zeros((n_e, n_a), f32)))

    return kernel


def run(variant):
    rng = np.random.default_rng(3)
    grid = np.linspace(0.0, 200.0, n_a).astype(np.float32)
    glo = np.concatenate([grid[:1] - (grid[1] - grid[0]), grid[:-1]])
    ghi = np.concatenate([grid[1:], grid[-1:] + (grid[-1] - grid[-2])])
    iup = 1.0 / (grid - glo)
    idn = 1.0 / (ghi - grid)
    tile = lambda v: np.tile(v[None, :], (n_e, 1)).astype(np.float32)  # noqa
    V = (np.abs(rng.standard_normal((n_e, n_a))) + 0.5).astype(np.float32)
    D = np.abs(rng.standard_normal((n_e, n_a))).astype(np.float32)
    D /= D.sum()
    e_grid = np.linspace(0.5, 1.5, n_e).astype(np.float32)[:, None]
    Pi = np.full((n_e, n_e), 1.0 / n_e, np.float32)
    r = np.full((Tm1,), 0.02, np.float32)
    w = np.full((Tm1,), 1.0, np.float32)
    dr = np.full((Tm1,), 1e-3, np.float32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(variant),
        out_shape=tuple(jax.ShapeDtypeStruct((Tm1, 1), f32) for _ in range(4)),
        in_specs=[smem] * 4 + [vmem] * 9,
        out_specs=(vmem,) * 4,
        scratch_shapes=[pltpu.VMEM((Tm1, n_e, n_a), f32),
                        pltpu.VMEM((Tm1, n_e, n_a), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    fn = jax.jit(lambda *a: call(*a))
    args = [jnp.asarray(x) for x in
            (r, w, dr, dr, V, D, tile(grid), e_grid, Pi,
             tile(glo), tile(ghi), tile(iup), tile(idn))]
    # Timing fetches an output to the HOST each iteration:
    # jax.block_until_ready on raw pallas outputs does NOT synchronize
    # through the axon remote-execution plugin (measured: 0.07 ms
    # "block_until_ready" vs 29.5 ms with a host fetch for the same call).
    t0 = time.perf_counter()
    np.asarray(fn(*args)[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        ts.append(time.perf_counter() - t0)
    return {"variant": variant, "compile_s": round(compile_s, 1),
            "ms": round(float(np.median(ts)) * 1e3, 2)}


if __name__ == "__main__":
    out = []
    for v in ("full", "bwd_only", "fwd_only", "bwd_nogather", "bwd_elem",
              "fwd_nohat"):
        res = run(v)
        out.append(res)
        print(json.dumps(res), flush=True)
    print(json.dumps(out), flush=True)
