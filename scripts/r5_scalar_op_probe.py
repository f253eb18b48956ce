"""Round-5 forensics, part 6: which SCALAR f64 op loses precision on axon?

`r5_step_bisect_probe` pinned the backward-recursion bias to
y_e = max((1-tau)·w, 1e-9)·income.grid deviating UNIFORMLY at 4.43e-8
relative (f32-epsilon scale) when tau/w are traced scalars — while
(1+ra)·agrid is clean at 1e-16. Array per-op probes are all ~1e-15, so
the axon emulated-f64 path must treat some scalar/small-array op class
differently. This measures every sub-expression shape variant.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_scalar_op_probe.py
"""
import json

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

tau = 0.181243817238974
w = 2.1871236482193487
ra = 0.0412387461238476
grid5 = np.array([0.1312, 0.4141, 1.0, 2.4142, 7.6123])
grid20 = np.exp(np.linspace(-2, 3, 20))

jt = jnp.asarray(tau)
jw = jnp.asarray(w)
jra = jnp.asarray(ra)
g5 = jnp.asarray(grid5)
g20 = jnp.asarray(grid20)

cases = {
    # scalar-scalar chains
    "sub_scalar": (jax.jit(lambda t: 1.0 - t), (jt,), 1.0 - tau),
    "mul_scalars": (jax.jit(lambda t, ww: t * ww), (jt, jw), tau * w),
    "sub_mul": (jax.jit(lambda t, ww: (1.0 - t) * ww), (jt, jw),
                (1.0 - tau) * w),
    "add1_scalar": (jax.jit(lambda x: 1.0 + x), (jra,), 1.0 + ra),
    "div_scalar": (jax.jit(lambda x: 1.0 / (1.0 + x)), (jra,),
                   1.0 / (1.0 + ra)),
    "max_scalar": (jax.jit(lambda t, ww: jnp.maximum((1.0 - t) * ww, 1e-9)),
                   (jt, jw), max((1.0 - tau) * w, 1e-9)),
    # scalar × small array
    "smul_g5": (jax.jit(lambda t, ww, g: (1.0 - t) * ww * g), (jt, jw, g5),
                (1.0 - tau) * w * grid5),
    "smul_g5_assoc": (jax.jit(lambda t, ww, g: ((1.0 - t) * ww) * g),
                      (jt, jw, g5), ((1.0 - tau) * w) * grid5),
    "smul_g20": (jax.jit(lambda x, g: (1.0 + x) * g), (jra, g20),
                 (1.0 + ra) * grid20),
    "sexpr_g20": (jax.jit(lambda t, ww, g: (1.0 - t) * ww * g),
                  (jt, jw, g20), (1.0 - tau) * w * grid20),
    # the exact y_e form
    "y_e_form": (jax.jit(
        lambda t, ww, g: jnp.maximum((1.0 - t) * ww, 1e-9) * g),
        (jt, jw, g5), max((1.0 - tau) * w, 1e-9) * grid5),
    # scalar chain kept as (1,1) 2-D array
    "y_e_2d": (jax.jit(
        lambda t, ww, g: (jnp.maximum((1.0 - t.reshape(1, 1))
                                      * ww.reshape(1, 1), 1e-9)
                          * g[None, :])[0]),
        (jt, jw, g5), max((1.0 - tau) * w, 1e-9) * grid5),
    # eager (unjitted) scalar chain
}

out = {}
for name, (fn, args, ref) in cases.items():
    got = np.asarray(fn(*args))
    rr = np.abs(got - np.asarray(ref)) / np.maximum(np.abs(ref), 1e-300)
    out[name] = float(np.max(rr))
    print(f"{name:16s} maxrel {out[name]:.3e}", flush=True)

# eager variants (no jit — per-op dispatch)
e1 = np.asarray(jnp.maximum((1.0 - jt) * jw, 1e-9) * g5)
rr = np.abs(e1 - max((1.0 - tau) * w, 1e-9) * grid5) / np.abs(e1)
print(f"{'y_e_eager':16s} maxrel {float(rr.max()):.3e}", flush=True)
print(json.dumps(out), flush=True)
