"""Analytic roofline / machine-utilization estimates for the hot sweeps.

"Fast" must mean fast against the CHIP, not just against XLA (round-3
verdict item 8): this script counts the flops and memory traffic of one
fused JVP sweep analytically from the kernel structure and model dims,
measures (or takes) the wall-clock, and reports achieved throughput
against TPU v5e peaks plus the serial-latency bound that actually binds.

v5e peaks used (public board specs + microarchitectural estimates):
  HBM bandwidth      819 GB/s
  MXU bf16           197 TFLOP/s
  MXU f32            ~49 TFLOP/s  (3-pass bf16x decomposition, upper bound)
  VPU f32            ~3.9 TFLOP/s (8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz)
  VMEM               ~16 MB/core  (pallas guide) — the sweep's scratch
                     (T-1, n_e, n_a_pad) f32 x2 ~= 4.3 MB at KS 200x7 T=300
                     fits, so the scan carries NO per-step HBM traffic.

Counting model for the fused one-asset sweep (ops/fused_sweep.py kernel):
  backward step:  2 MXU dots (n_e^2 x n_a MACs each) + ~45 VPU ops on
                  (n_e, n_a_pad) maps (Euler inversion, implied wealth,
                  bracket search ~log2(n_a) compares via the vreg gather,
                  interp, constraint, marginal value — primal AND tangent).
  forward step:   hat-basis lottery on (n_e, n_a_pad, n_a_pad): ~8 ops to
                  build hat/slope + ~6 ops for the two contractions
                  (D_half, dD_half FMAs), 2 MXU dots (n_e^2 x n_a), ~20
                  VPU ops of aggregates. The n_e*n_a^2 term dominates
                  everything else by ~2 orders of magnitude.
  serial depth:   2*(T-1) dependent fori_loop steps — the real constraint.

Run on TPU (measures the sweep):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
Offline (uses a recorded time, e.g. from BENCH_r03 / measure_configs):
  python scripts/roofline.py --sweep-ms 28.0 --no-measure
"""
import argparse
import json

HBM_BW = 819e9            # B/s
MXU_BF16 = 197e12         # FLOP/s
MXU_F32 = MXU_BF16 / 4    # FLOP/s, 3-pass decomposition upper bound
VPU_F32 = 3.9e12          # FLOP/s, estimate (see module docstring)
VMEM_BYTES = 16 * 2**20


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def ks_sweep_counts(n_a: int, n_e: int, Tm1: int) -> dict:
    """Flops / bytes / serial depth of ONE fused primal+tangent sweep."""
    na = _pad128(n_a)
    # VPU flops (f32). Constants from the op-by-op count in the docstring.
    bwd_vpu = 45 * n_e * na
    fwd_vpu = (8 + 6) * n_e * na * na + 20 * n_e * na
    # MXU MACs -> 2 flops each; 2 dots per phase per step (primal+tangent).
    mxu = 2 * 2 * (n_e * n_e * na) * 2
    steps = Tm1
    vpu_flops = steps * (bwd_vpu + fwd_vpu)
    mxu_flops = steps * 2 * mxu
    # HBM traffic: price paths in/out + aggregates out; scratch and carries
    # live in VMEM for the whole kernel (checked against VMEM_BYTES below).
    hbm = 4 * Tm1 * 4 + 4 * Tm1 * 4      # 4 SMEM paths + 4 output columns
    hbm += 8 * n_e * na * 4              # V_T, D0, grids, Pi, hat tables in
    scratch = 2 * Tm1 * n_e * na * 4     # pol/dpol scratch
    return {
        "n_a_pad": na, "serial_steps": 2 * steps,
        "vpu_flops": vpu_flops, "mxu_flops": mxu_flops,
        "hbm_bytes": hbm, "vmem_scratch_bytes": scratch,
        "scratch_fits_vmem": scratch + 10 * n_e * na * 4 < VMEM_BYTES,
    }


def two_asset_sweep_counts(n_b: int, n_a: int, n_e: int, n_acc: int,
                           Tm1: int) -> dict:
    """One two-asset JVP sweep (XLA path, models/hank_two_asset.py).

    Per Bellman step the hot terms are batched BILINEAR evaluations of the
    (n_b, n_a)-lattice W / G surfaces at (n_states = n_b*n_a*n_e*n_acc)
    query points (~40 VPU ops each incl. the two bracket one-hot dot
    reductions of length n_b / n_a), repeated for:
      split root: K = n_a + n_b + 2 breakpoint pass + 1 midpoint pass
      envelope/value update: ~6 more surface evaluations
    plus the exogenous-mix einsum (n_states * n_e * n_acc MACs) and the
    forward 4-corner joint lottery (~30 ops / state incl. hat weights).
    Primal+tangent doubles everything (JVP).
    """
    n_states = n_b * n_a * n_e * n_acc
    bilinear_cost = 40 + 2 * (n_b + n_a)      # incl. bracket reductions
    evals_per_step = (n_a + n_b + 2) + 1 + 6
    bwd_vpu = 2 * n_states * evals_per_step * bilinear_cost
    mix = 2 * 2 * n_states * n_e * n_acc
    fwd_vpu = 2 * n_states * 30
    steps = Tm1
    return {
        "n_states": n_states, "serial_steps": 2 * steps,
        "vpu_flops": steps * (bwd_vpu + fwd_vpu),
        "mxu_flops": steps * mix,
        "hbm_bytes": steps * 6 * n_states * 4,   # policies/dists spill per step (XLA scan)
        "vmem_scratch_bytes": 0, "scratch_fits_vmem": True,
    }


def report(name: str, c: dict, measured_s: float) -> dict:
    total_flops = c["vpu_flops"] + c["mxu_flops"]
    t_vpu = c["vpu_flops"] / VPU_F32
    t_mxu = c["mxu_flops"] / MXU_F32
    t_hbm = c["hbm_bytes"] / HBM_BW
    light_speed = max(t_vpu + t_mxu, t_hbm)
    out = {
        "sweep": name,
        "measured_ms": round(measured_s * 1e3, 2),
        "total_gflop": round(total_flops / 1e9, 2),
        "achieved_gflops": round(total_flops / measured_s / 1e9, 1),
        "vpu_pct_peak": round(100 * c["vpu_flops"] / measured_s / VPU_F32, 1),
        "hbm_gbs": round(c["hbm_bytes"] / measured_s / 1e9, 2),
        "hbm_pct_peak": round(100 * c["hbm_bytes"] / measured_s / HBM_BW, 2),
        "light_speed_ms": round(light_speed * 1e3, 3),
        "headroom_x": round(measured_s / light_speed, 1),
        "serial_steps": c["serial_steps"],
        "us_per_step": round(measured_s * 1e6 / c["serial_steps"], 1),
        "scratch_fits_vmem": c["scratch_fits_vmem"],
        "binding": "vpu+mxu compute" if t_vpu + t_mxu >= t_hbm else "hbm",
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep-ms", type=float, default=None,
                    help="recorded KS fused-sweep ms (skip measuring)")
    ap.add_argument("--two-asset-ms", type=float, default=None,
                    help="recorded two-asset JVP sweep ms")
    ap.add_argument("--no-measure", action="store_true")
    args = ap.parse_args()

    T = 300
    ks = ks_sweep_counts(n_a=200, n_e=7, Tm1=T - 1)
    ta = two_asset_sweep_counts(n_b=40, n_a=20, n_e=5, n_acc=2, Tm1=T - 1)

    ks_ms = args.sweep_ms
    ta_ms = args.two_asset_ms
    if not args.no_measure and (ks_ms is None or ta_ms is None):
        import time
        import jax
        import jax.numpy as jnp
        import numpy as np
        from hank_tpu.models import load_model
        from hank_tpu.utils.checkpoint import get_or_solve

        def med(fn, *a, n=5):
            jax.block_until_ready(fn(*a))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*a))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        if ks_ms is None:
            from hank_tpu.models.krusell_smith import exogenousZ
            from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
            model = load_model("krusell_smith", T=T)
            ss0, ssT, _ = get_or_solve(model)
            endog = model.vars_of_type("endogenous")
            x = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), T - 1)
            exog = {"Z": exogenousZ(T - 1, rho=0.8, z_start=1.0, z_end=2.0)}
            fused = jax.jit(make_fused_jvp_dir(
                model, ss0, ssT, exog,
                interpret=jax.default_backend() == "cpu"))
            ks_ms = med(fused, x, jnp.full_like(x, 1e-3)) * 1e3
        if ta_ms is None:
            from hank_tpu.model.structures import generate_exog_paths
            from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
            from hank_tpu.solvers.newton import make_full_residual_fn
            f32 = jnp.float32
            model2 = load_model("hank_two_asset", T=T)
            ss0, ssT, _ = get_or_solve(model2)
            exog2 = generate_exog_paths(model2, T - 1)
            endog = model2.vars_of_type("endogenous")
            x2 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), T - 1)
            F32 = jax.jit(make_full_residual_fn(
                cast_model(model2, f32), cast_ss(ss0, f32), cast_ss(ssT, f32),
                cast_paths(exog2, f32)))
            jvp32 = jax.jit(lambda xx, u: jax.jvp(F32, (xx,), (u,))[1])
            x2f = x2.astype(f32)
            ta_ms = med(jvp32, x2f, jnp.full_like(x2f, 1e-3)) * 1e3

    if ks_ms is not None:
        report("ks_200x7_T300_fused_jvp", ks, ks_ms / 1e3)
    if ta_ms is not None:
        report("hank2_40x20x5x2_T300_xla_jvp", ta, ta_ms / 1e3)


if __name__ == "__main__":
    main()
