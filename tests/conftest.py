"""Test configuration: run on CPU with 8 virtual devices for sharding tests.

Must set XLA flags before jax initializes (standard JAX fake-mesh testing;
SURVEY §4 — the reference has no distributed tests, ours do).
"""

import os

# Force CPU regardless of environment (the axon TPU tunnel may be preset in
# JAX_PLATFORMS; unit tests run on the virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ks_small():
    """Small Krusell-Smith instance (fast: n_a=40, n_e=5, T=40)."""
    import dataclasses

    from hank_tpu.models import load_model

    model = load_model("krusell_smith", T=40)
    # Shrink the grids for speed.
    from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
    import jax.numpy as jnp
    from hank_tpu.model.structures import HeterogeneityDimension

    wealth = HeterogeneityDimension(
        name="wealth", dim_type="endogenous", n=40,
        grid=jnp.asarray(make_double_exponential_grid(0.0, 200.0, 40)),
        transition=None, policy_var="KD")
    Pi, _, z = rouwenhorst(5, 0.966, 0.283)
    prod = HeterogeneityDimension(
        name="productivity", dim_type="exogenous", n=5,
        grid=jnp.asarray(z), transition=jnp.asarray(Pi), policy_var=None)
    return dataclasses.replace(
        model, heterogeneity={"wealth": wealth, "productivity": prod})


@pytest.fixture(scope="session")
def ks_small_ss(ks_small):
    """Steady states of the small KS model (solved once per session)."""
    from hank_tpu.solvers.steady_state import get_steady_states

    return get_steady_states(ks_small)
