"""Double-single arithmetic accuracy vs real f64 (CPU reference).

The ds representation must deliver ~2^-47 relative accuracy from f32 parts
— the foundation of the df32 residual path (`ops/fused_ds.py`) that lets
the TPU endgame measure 1e-9 residuals without emulated f64.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.ops import ds

RNG = np.random.default_rng(7)


def _rand(n=4096, lo=-1e3, hi=1e3):
    return jnp.asarray(RNG.uniform(lo, hi, n), dtype=jnp.float64)


def _rel_err(got_ds, want_f64):
    got = np.asarray(ds.to_f64(got_ds), dtype=np.float64)
    want = np.asarray(want_f64, dtype=np.float64)
    scale = np.maximum(np.abs(want), 1e-30)
    return np.max(np.abs(got - want) / scale)


def test_split_roundtrip_exact():
    x = _rand()
    hi, lo = ds.from_f64(x)
    # hi + lo reproduces x to the ds ulp (~2^-48 of |x|)
    err = np.max(np.abs(np.asarray(ds.to_f64((hi, lo)) - x))
                 / np.maximum(np.abs(np.asarray(x)), 1e-30))
    assert err < 2e-15
    # and the parts are normalized: |lo| <= ulp(hi)/2
    assert np.all(np.abs(np.asarray(lo)) <= np.spacing(np.abs(np.asarray(hi, dtype=np.float32))) / 2 + 1e-38)


@pytest.mark.parametrize("op,jop", [
    (ds.add, lambda a, b: a + b),
    (ds.sub, lambda a, b: a - b),
    (ds.mul, lambda a, b: a * b),
    (ds.div, lambda a, b: a / b),
])
def test_binary_ops(op, jop):
    a64, b64 = _rand(), _rand(lo=0.5, hi=1e3)
    got = np.asarray(ds.to_f64(op(ds.from_f64(a64), ds.from_f64(b64))))
    want = np.asarray(jop(a64, b64))
    # Error scaled by the operand magnitude for +/- (cancellation can make
    # result-relative error unbounded for ANY pairwise scheme; the solver
    # needs absolute accuracy from O(1) operands, which this bounds) and by
    # the result magnitude for * and / (no cancellation channel there).
    if op in (ds.mul, ds.div):
        scale = np.maximum(np.abs(want), 1e-30)
    else:
        scale = np.maximum(np.abs(np.asarray(a64)) + np.abs(np.asarray(b64)),
                           1e-30)
    assert np.max(np.abs(got - want) / scale) < 1e-13


def test_cancellation_is_captured():
    # The whole point: (a + eps) - a must recover eps, which plain f32
    # cannot (a ~ 1, eps ~ 1e-9 is below the f32 ulp of a).
    a64 = _rand(lo=1.0, hi=2.0)
    eps = 1e-9
    diff = ds.sub(ds.from_f64(a64 + eps), ds.from_f64(a64))
    got = np.asarray(ds.to_f64(diff))
    assert np.max(np.abs(got - eps) / eps) < 1e-4


def test_mul_single_and_add_single():
    a64 = _rand()
    s = jnp.asarray(RNG.uniform(-2, 2, a64.shape), dtype=jnp.float32)
    got = ds.mul_single(ds.from_f64(a64), s)
    assert _rel_err(got, a64 * s.astype(jnp.float64)) < 1e-13
    got = ds.add_single(ds.from_f64(a64), s)
    want = a64 + s.astype(jnp.float64)
    assert _rel_err(got, want) < 1e-10  # cancellation can lose rel digits


@pytest.mark.parametrize("gamma", [1, 2, 3, 4])
def test_inv_nroot(gamma):
    u64 = _rand(lo=1e-3, hi=1e3)
    got = ds.inv_nroot(ds.from_f64(u64), gamma)
    assert _rel_err(got, u64 ** (-1.0 / gamma)) < 1e-12


@pytest.mark.parametrize("gamma", [1, 2, 3])
def test_powi_neg(gamma):
    u64 = _rand(lo=1e-2, hi=1e2)
    got = ds.powi_neg(ds.from_f64(u64), gamma)
    assert _rel_err(got, u64 ** (-float(gamma))) < 1e-12


def test_sqrt():
    u64 = _rand(lo=1e-6, hi=1e6)
    got = ds.sqrt(ds.from_f64(u64))
    assert _rel_err(got, np.sqrt(np.asarray(u64))) < 1e-13
    # exact zero short-circuits (no 0/0)
    z = ds.sqrt((jnp.zeros(4, jnp.float32), jnp.zeros(4, jnp.float32)))
    assert np.all(np.asarray(z[0]) == 0.0) and np.all(np.isfinite(z[1]))


def test_comparisons_exact_below_f32():
    # Pairs differing only in the lo part must order correctly.
    a64 = _rand(lo=1.0, hi=2.0)
    b64 = a64 + 1e-12
    a, b = ds.from_f64(a64), ds.from_f64(b64)
    assert np.all(np.asarray(ds.lt(a, b)))
    assert not np.any(np.asarray(ds.lt(b, a)))
    m = ds.maximum(a, b)
    assert _rel_err(m, np.asarray(b64)) < 1e-14


def test_matches_f64_chain():
    # A composite expression shaped like the EGM step: c = (beta*E)^(-1/2),
    # implied = (c - w*e + g) / (1+r).
    E = _rand(lo=0.1, hi=50.0)
    g = _rand(lo=0.0, hi=100.0)
    beta, w, e_, r = 0.98, 1.3, 0.7, 0.04
    # Parameters must enter as ds constants — an f32-rounded beta would bias
    # every downstream value at ~3e-8 relative (the kernel splits all
    # params/prices exactly for this reason).
    c_ds = ds.inv_nroot(ds.mul(ds.from_f64(E), ds.const(beta, E)), 2)
    num = ds.add(ds.add(c_ds, ds.const(-w * e_, E)), ds.from_f64(g))
    got = np.asarray(ds.to_f64(
        ds.mul(num, ds.recip(ds.const(1.0 + r, num[0])))))
    want = np.asarray(((beta * E) ** -0.5 - w * e_ + g) / (1.0 + r))
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 2e-12
