"""Grid primitives vs. independently computed reference values.

Build-plan step 1 (SURVEY §7): verify grids/Π match the reference math to
1e-12. The expected values below are computed directly from the published
formulas (Rouwenhorst 1995; the double-exponential transform of
`GeneralStructures.jl:474-483`), independently of any implementation.
"""

import numpy as np

from hank_tpu.model.grids import (
    invariant_dist_rowstoch,
    make_double_exponential_grid,
    rouwenhorst,
)


def test_double_exponential_endpoints_and_monotone():
    g = make_double_exponential_grid(0.0, 200.0, 200)
    assert g.shape == (200,)
    assert abs(g[0] - 0.0) < 1e-12
    assert abs(g[-1] - 200.0) < 1e-9
    assert np.all(np.diff(g) > 0)
    # Formula spot-check at an interior point.
    u_max = np.log(1 + np.log(1 + 200.0))
    u = np.linspace(0, u_max, 200)
    assert abs(g[57] - (np.exp(np.exp(u[57]) - 1) - 1)) < 1e-12


def test_double_exponential_offset_min():
    g = make_double_exponential_grid(-2.0, 10.0, 50)
    assert abs(g[0] + 2.0) < 1e-12
    assert abs(g[-1] - 10.0) < 1e-10


def test_rouwenhorst_n2_exact():
    # For n=2 the transition matrix is [[p, 1-p], [1-p, p]] with p=(1+ρ)/2.
    Pi, D, z = rouwenhorst(2, 0.5, 0.1)
    p = 0.75
    assert np.allclose(Pi, [[p, 1 - p], [1 - p, p]], atol=1e-14)
    assert np.allclose(D, [0.5, 0.5], atol=1e-12)
    assert abs(np.dot(z, D) - 1.0) < 1e-12


def test_rouwenhorst_properties():
    Pi, D, z = rouwenhorst(7, 0.966, 0.283)
    assert Pi.shape == (7, 7)
    assert np.allclose(Pi.sum(axis=1), 1.0, atol=1e-12)        # row-stochastic
    assert np.all(Pi >= 0)
    assert np.allclose(D, D @ Pi, atol=1e-12)                  # stationarity
    assert abs(np.dot(z, D) - 1.0) < 1e-12                     # E[z] = 1
    assert np.all(np.diff(z) > 0)
    # Rouwenhorst binomial stationary distribution: D_i = C(n-1, i)/2^(n-1).
    from math import comb
    binom = np.array([comb(6, i) for i in range(7)]) / 2.0**6
    assert np.allclose(D, binom, atol=1e-10)
    # Persistence: implied first-order autocorrelation of the index chain
    # equals 2p - 1 = ρ.
    p = (1 + 0.966) / 2
    assert abs((2 * p - 1) - 0.966) < 1e-14


def test_invariant_dist_rowstoch_small():
    Pi = np.array([[0.9, 0.1], [0.4, 0.6]])
    D = invariant_dist_rowstoch(Pi)
    assert np.allclose(D, D @ Pi, atol=1e-14)
    assert abs(D.sum() - 1.0) < 1e-14
    assert np.allclose(D, [0.8, 0.2], atol=1e-12)
