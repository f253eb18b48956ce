"""Round-5 forensics, part 7: map the broken scalar-subtract emulation.

`r5_scalar_op_probe` pinned the bias to jitted `1.0 - tau` (literal minus
traced f64 scalar) rounding at ~1.8e-8 (f32 scale) on axon, while scalar
add/mul/div and the eager form are exact. This maps the broken set —
operand order, literal value, shapes, negate, jnp.subtract, x-y traced
pairs — to design the production workaround.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_scalar_sub_map.py
"""
import json

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

t = 0.181243817238974
u = 2.1871236482193487
jt = jnp.asarray(t)
ju = jnp.asarray(u)
g5 = np.array([0.1312, 0.4141, 1.0, 2.4142, 7.6123])
jg5 = jnp.asarray(g5)
g128 = np.exp(np.linspace(-2, 3, 128))
jg128 = jnp.asarray(g128)
g256 = np.exp(np.linspace(-2, 3, 256))
jg256 = jnp.asarray(g256)

cases = {
    "lit_sub_s": (lambda x: 1.0 - x, (jt,), 1.0 - t),
    "lit2_sub_s": (lambda x: 2.0 - x, (jt,), 2.0 - t),
    "lit_pi_sub_s": (lambda x: 3.141592653589793 - x, (jt,),
                     3.141592653589793 - t),
    "s_sub_lit": (lambda x: x - 1.0, (jt,), t - 1.0),
    "s_sub_s": (lambda x, y: x - y, (jt, ju), t - u),
    "neg_s": (lambda x: -x, (jt,), -t),
    "lit_add_neg": (lambda x: 1.0 + (-x), (jt,), 1.0 - t),
    "neg_sub_rev": (lambda x: -(x - 1.0), (jt,), 1.0 - t),
    "jnp_sub": (lambda x: jnp.subtract(jnp.asarray(1.0), x), (jt,), 1.0 - t),
    "lit_sub_1d": (lambda x: (1.0 - x.reshape(1))[0], (jt,), 1.0 - t),
    "lit_sub_g5": (lambda g: 1.0 - g * 0.1, (jg5,), 1.0 - g5 * 0.1),
    "lit_sub_g128": (lambda g: 1.0 - g * 0.1, (jg128,), 1.0 - g128 * 0.1),
    "lit_sub_g256": (lambda g: 1.0 - g * 0.1, (jg256,), 1.0 - g256 * 0.1),
    "g5_sub_g5": (lambda g: g - g[::-1] * 0.3, (jg5,), g5 - g5[::-1] * 0.3),
    "g256_sub": (lambda g: g - g[::-1] * 0.3, (jg256,),
                 g256 - g256[::-1] * 0.3),
    "s_add_s": (lambda x, y: x + y, (jt, ju), t + u),
    "lit_add_s": (lambda x: 1.0 + x, (jt,), 1.0 + t),
    "s_mul_lit": (lambda x: x * 0.98, (jt,), t * 0.98),
    "fma_like": (lambda x, y: 1.0 - x * y * 0.1, (jt, ju), 1.0 - t * u * 0.1),
    # chains: does one clean op 'launder' the dirt?
    "sub_then_mul_s": (lambda x, y: (1.0 - x) * y, (jt, ju), (1.0 - t) * u),
    "mul_then_sub": (lambda x, y: 1.0 - (x * y), (jt, ju), 1.0 - t * u),
}

out = {}
for name, (fn, args, ref) in cases.items():
    got = np.asarray(jax.jit(fn)(*args))
    rr = np.abs(got - np.asarray(ref)) / np.maximum(np.abs(ref), 1e-300)
    out[name] = float(np.max(rr))
    print(f"{name:16s} maxrel {out[name]:.3e}", flush=True)
print(json.dumps(out), flush=True)
