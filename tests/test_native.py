"""Native C++ dual-number library vs JAX forward-mode AD."""

import numpy as np
import pytest

from hank_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:  # pragma: no cover — toolchain missing
        pytest.skip(f"native build unavailable: {e}")


def _jax_reference(which, x):
    import jax
    import jax.numpy as jnp

    if which == "rosenbrock":
        def f(v):
            return jnp.sum((1 - v[:-1]) ** 2 + 100.0 * (v[1:] - v[:-1] ** 2) ** 2)
    else:
        def f(v):
            n = v.shape[0]
            return (-20.0 * jnp.exp(-0.2 * jnp.sqrt(jnp.sum(v**2) / n))
                    - jnp.exp(jnp.sum(jnp.cos(2 * jnp.pi * v)) / n)
                    + 20.0 + jnp.exp(1.0))
    return np.asarray(f(jnp.asarray(x))), np.asarray(jax.grad(f)(jnp.asarray(x)))


@pytest.mark.parametrize("which", ["ackley", "rosenbrock"])
@pytest.mark.parametrize("chunk", [1, 4, 8])
def test_native_gradient_matches_jax(lib, which, chunk):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, size=37)
    val_ref, grad_ref = _jax_reference(which, x)
    assert abs(native.value(which, x) - float(val_ref)) < 1e-10
    g = native.gradient(which, x, chunk=chunk)
    assert np.allclose(g, grad_ref, atol=1e-9)


def test_native_bench_runs(lib):
    s = native.bench("rosenbrock", chunk=8, n=100, iters=10)
    assert 0 < s < 1.0
