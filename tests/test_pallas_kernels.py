"""Pallas fused forward-scan kernel vs the XLA scan (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
from hank_tpu.ops.pallas_kernels import forward_scan_pallas
from hank_tpu.ops.transition import exog_apply, lottery_apply


def test_forward_scan_pallas_matches_xla():
    import jax

    n_a, n_e, T = 24, 4, 11
    rng = np.random.default_rng(0)
    grid = jnp.asarray(make_double_exponential_grid(0.0, 50.0, n_a), dtype=jnp.float32)
    Pi, _, _ = rouwenhorst(n_e, 0.9, 0.3)
    Pi = jnp.asarray(Pi, dtype=jnp.float32)
    pols = jnp.asarray(
        np.sort(rng.uniform(0, 52, size=(T, n_a, n_e)), axis=1), dtype=jnp.float32)
    D0 = rng.uniform(0.1, 1.0, size=(n_a, n_e))
    D0 = jnp.asarray(D0 / D0.sum(), dtype=jnp.float32)

    agg_p, dlast_p = forward_scan_pallas(pols, D0, grid, Pi, interpret=True)

    def step(d, p):
        dn = exog_apply(lottery_apply(p, d, grid, dense=True), [Pi], 1)
        return dn, jnp.sum(p * dn)

    dlast_x, agg_x = jax.lax.scan(step, D0, pols)
    assert np.allclose(np.asarray(agg_p), np.asarray(agg_x), atol=1e-4)
    assert np.allclose(np.asarray(dlast_p), np.asarray(dlast_x), atol=1e-6)
    assert abs(float(dlast_p.sum()) - 1.0) < 1e-5
