"""Test configuration: run on CPU with 8 virtual devices for sharding tests.

Must set XLA flags before jax initializes (standard JAX fake-mesh testing;
SURVEY §4 — the reference has no distributed tests, ours do). Steady states
are solved once and cached on disk (~/.cache/hank_tpu), so the first full test
run is slow and later runs are fast.
"""

import os
import sys

# Force CPU + 8 virtual devices regardless of environment. The container's
# sitecustomize (axon TPU plugin) imports jax and initializes backends at
# interpreter startup AND overrides XLA_FLAGS, so flags set here are too
# late — re-exec the interpreter once with the axon trigger removed and the
# right environment in place at startup.
_flags = os.environ.get("XLA_FLAGS", "")
_needs_env = (os.environ.get("JAX_PLATFORMS") != "cpu"
              or "xla_force_host_platform_device_count" not in _flags
              or os.environ.get("PALLAS_AXON_POOL_IPS"))
_under_pytest = "PYTEST_VERSION" in os.environ or "pytest" in sys.argv[0]
if _needs_env and _under_pytest and os.environ.get("_HANK_TPU_TEST_REEXEC") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)   # disable axon sitecustomize
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["_HANK_TPU_TEST_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


def build_small_ks(T: int, n_a: int = 40, n_e: int = 5):
    """Small Krusell-Smith instance for tests."""
    from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
    from hank_tpu.model.structures import HeterogeneityDimension
    from hank_tpu.models import load_model

    model = load_model("krusell_smith", T=T)
    wealth = HeterogeneityDimension(
        name="wealth", dim_type="endogenous", n=n_a,
        grid=jnp.asarray(make_double_exponential_grid(0.0, 200.0, n_a)),
        transition=None, policy_var="KD")
    Pi, _, z = rouwenhorst(n_e, 0.966, 0.283)
    prod = HeterogeneityDimension(
        name="productivity", dim_type="exogenous", n=n_e,
        grid=jnp.asarray(z), transition=jnp.asarray(Pi), policy_var=None)
    return dataclasses.replace(
        model, heterogeneity={"wealth": wealth, "productivity": prod})


def solve_ss_cached(model, label="initial"):
    from hank_tpu.solvers.steady_state import find_ss
    from hank_tpu.utils.checkpoint import load_steady_state, save_steady_state

    spec = model.ss_initial if label == "initial" else model.ss_ending
    ss = load_steady_state(model, label)
    if ss is None:
        ss = find_ss(model, spec, label)
        save_steady_state(ss, model, label)
    return ss


@pytest.fixture(scope="session")
def ks_small():
    """Small KS at T=12 (fast path/Jacobian tests)."""
    return build_small_ks(T=12)


@pytest.fixture(scope="session")
def ks_small_ss(ks_small):
    """Initial steady state of the small KS model (disk-cached)."""
    return solve_ss_cached(ks_small)


def assert_no_64bit_vectors_in_kernels(fn, *args):
    """Trace `fn(*args)` and assert no Pallas kernel contains a 64-bit
    VECTOR value.

    Under jax_enable_x64, unpinned literals breed f64/i64 vectors inside
    kernel bodies (jnp.where(bool, 1.0, 0.0) with no array operand;
    jnp.eye's internal int64 iota) — interpret mode runs them happily, but
    Mosaic's vector-layout inference CHECK-crashes on ANY 64-bit vector
    ("bitwidth_ <= 32" abort, measured on v5e). Scalar i64 (ref indices
    from python ints) is fine — only shaped avals are checked.
    """
    hits = []

    def scan(jx):
        for eqn in jx.eqns:
            for var in list(eqn.invars) + list(eqn.outvars):
                av = getattr(var, "aval", None)
                if (av is not None and hasattr(av, "dtype")
                        and av.dtype.itemsize == 8 and getattr(av, "shape", ())):
                    import jax._src.source_info_util as siu
                    hits.append((eqn.primitive.name, str(av.dtype),
                                 tuple(av.shape), siu.summarize(eqn.source_info)))
            for v in eqn.params.values():
                if hasattr(v, "eqns"):
                    scan(v)
                elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                    scan(v.jaxpr)

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                inner = eqn.params["jaxpr"]
                scan(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
            for v in eqn.params.values():
                if hasattr(v, "eqns"):
                    walk(v)
                elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                    walk(v.jaxpr)

    walk(jax.jit(fn).trace(*args).jaxpr.jaxpr)
    assert not hits, f"64-bit vectors inside Pallas kernels: {hits[:8]}"
