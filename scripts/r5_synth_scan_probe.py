"""Round-5 forensics, part 3b: synthetic scan-context f64-emulation probe.

Companion to `r5_scan_barrier_probe.py` that needs NO model artifacts: a
299-step contraction of the Bellman-like elementwise composite (rsqrt /
Newton-refine / reciprocal-square mix from `r5_fusion_probe.py` part 2),
compared against numpy f64, across loop-primitive / barrier candidates.

If the synthetic chain reproduces the one-sided per-step bias that the real
two-asset Bellman step shows under `lax.scan` on TPU (r5_scan_step_probe:
median 1.3e-9/step, clean when python-unrolled), this probe identifies a
production fix without waiting for the SS artifact cache.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_synth_scan_probe.py
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/r5_synth_scan_probe.py
"""
import json

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = 299
BETA = 0.98


def step(y):
    z = jax.lax.rsqrt(y)
    c = z * (1.5 - 0.5 * y * z * z)
    return BETA * (0.3 + 0.7 * (1.0 / (c * c)))


@jax.jit
def loopK(y):
    for _ in range(K):
        y = step(y)
    return y


@jax.jit
def scanK(y):
    y, _ = jax.lax.scan(lambda v, _: (step(v), ()), y, None, length=K)
    return y


@jax.jit
def scan_barrier(y):
    def body(v, _):
        return jax.lax.optimization_barrier(step(v)), ()
    y, _ = jax.lax.scan(body, y, None, length=K)
    return y


@jax.jit
def scan_barrier_in(y):
    def body(v, _):
        return step(jax.lax.optimization_barrier(v)), ()
    y, _ = jax.lax.scan(body, y, None, length=K)
    return y


@jax.jit
def foriK(y):
    return jax.lax.fori_loop(0, K, lambda i, v: step(v), y)


@jax.jit
def whileK(y):
    return jax.lax.while_loop(lambda c: c[0] < K,
                              lambda c: (c[0] + 1, step(c[1])), (0, y))[1]


def main():
    rng = np.random.default_rng(17)
    y0 = np.abs(rng.standard_normal(4096)) + 0.2

    yn = y0.copy()
    for _ in range(K):
        z = 1.0 / np.sqrt(yn)
        c = z * (1.5 - 0.5 * yn * z * z)
        yn = BETA * (0.3 + 0.7 * (1.0 / (c * c)))

    out = {"backend": jax.default_backend()}
    for name, fn in [("loopK", loopK), ("scanK", scanK),
                     ("scan_barrier", scan_barrier),
                     ("scan_barrier_in", scan_barrier_in),
                     ("foriK", foriK), ("whileK", whileK)]:
        got = np.asarray(fn(jnp.asarray(y0)))
        rr = (got - yn) / np.abs(yn)
        out[name] = {"maxrel": float(np.abs(rr).max()),
                     "medrel": float(np.median(np.abs(rr))),
                     "bias": float(rr.mean())}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
