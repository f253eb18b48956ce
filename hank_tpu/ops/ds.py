"""Double-single (two-float32) arithmetic: f64-class accuracy on f32 units.

TPU v5e has no f64 ALU — XLA *emulates* f64 elementwise ops in software,
and the emulated residual evaluation costs ~124 ms at KS 200×7 T=300
(BASELINE.md round-2 ledger) versus ~20 ms for the fused f32 kernel. The
solver's endgame, however, must measure residuals of size ~1e-9 built from
O(1) quantities — far below f32 resolution (cancellation in LHS − RHS).

This module represents a real number as an unevaluated sum `hi + lo` of two
f32 values with |lo| ≤ ulp(hi)/2 (a "double-single"), giving ~48 mantissa
bits (~6e-15 relative) — comfortably enough to measure 1e-9 residuals —
using only native f32 add/mul, which are IEEE correctly-rounded on the TPU
VPU. Division, rsqrt and powers never rely on correctly-rounded hardware:
they seed from the approximate f32 op and Newton-refine in error-free
ds arithmetic, so 2-ulp-sloppy TPU division/transcendentals cannot leak
into the result.

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP v2 §4.2.2; the double-double arithmetic of Briggs/Bailey/
Hida/Li): `two_sum`, Dekker `split`/`two_prod` (no FMA primitive is
exposed through jnp; the 12-bit split makes all partial products exact in
f32, so the algorithm is correct whether or not XLA contracts to FMA).

All functions operate elementwise on pytrees of equal-shape f32 arrays and
are Pallas-kernel-safe (array-array ops and weakly-typed Python-float
literals only — nothing that traces to f64 under jax_enable_x64).

A ds number is a plain tuple `(hi, lo)`.

Parity note: this subsystem replaces the reference's reliance on native
f64 CPU arithmetic for residual evaluation (`NewtonRaphson.jl:91` runs in
Float64) with a TPU-native equivalent of the same accuracy class.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Mask clearing the low 12 bits of the f32 mantissa (bitmask split).
_HI_MASK = -4096  # 0xFFFFF000 as int32


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth): s = fl(a+b), e exact."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """a = hi + lo with hi, lo having <= 12 significant bits each.

    BITMASK split (truncate the low 12 mantissa bits through an integer
    view), NOT the classical Dekker multiplicative split. The Dekker form
    `t = 4097*a; hi = t - (t - a)` is destroyed by FMA contraction: XLA:CPU's
    LLVM backend (fp-contract=fast) fuses `t - a` into `fma(4097, a, -a)`,
    which skips the rounding the split depends on — observed breaking
    `two_prod` graph-dependently under jit (exact in eager mode). The
    bitmask form has no mul-add pattern to contract, is exact for every
    finite a including the 1e30 pad-lane sentinel, and is cheaper (integer
    AND + subtract). `a - hi` is exact: lo is the discarded low 12 bits.
    """
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(_HI_MASK), jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """a · b = p + e with |error| ≲ 2 ulp² — FMA-contraction-immune.

    The classical Dekker form (`p = fl(a·b); e = ((ah·bh − p) + …)`)
    REQUIRES consumers to see the correctly-rounded p. XLA:CPU's LLVM
    backend compiles with fp-contract=fast and freely rematerializes the
    `mul` inside each fusion, contracting it into the consuming add/sub as
    an FMA over the UNROUNDED product — observed producing eps_f32-level
    errors graph-dependently under jit (eager stays exact; an
    optimization_barrier does not survive to the fusion pass, and no XLA
    flag disables the contraction).

    This form never references a rounded full product: all four partial
    products of the ≤12-bit split halves are EXACTLY representable in f32,
    so contracting any of them into an add is value-neutral
    (fl(exact + c) either way), and the partial sums use add-only
    `two_sum`, which has no mul to contract. The result is not bit-exact
    Dekker (p is fl of the dominant partial sums, e carries ~2 ulp² of
    rounding from the low accumulation) but keeps ds.mul in the same
    ~2^-47-relative error class as the cross-term truncation already does.

    Operands are broadcast to their common shape BEFORE the split:
    Mosaic's `tpu.bitcast` only accepts vectors, so a scalar operand
    (an SMEM price read, a split constant, `inv_nroot`'s 1/γ) must be
    splat to the vector shape it will broadcast to anyway. Value-neutral
    outside Pallas; scalar·scalar stays scalar (fine under plain XLA,
    callers inside kernels must pre-splat — see fused_ds).
    """
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
    if jnp.shape(a) != shape:
        a = jnp.broadcast_to(a, shape)
    if jnp.shape(b) != shape:
        b = jnp.broadcast_to(b, shape)
    ah, al = split(a)
    bh, bl = split(b)
    s, e1 = two_sum(ah * bl, al * bh)
    p, e2 = two_sum(ah * bh, s)
    e = (e1 + e2) + al * bl
    return quick_two_sum(p, e)


# ── ds constructors / converters ────────────────────────────────────────────

def from_f64(x):
    """Split an f64 (or f32) array into a ds pair. The hi part is the f32
    rounding of x; lo captures the next 24 bits."""
    hi = jnp.asarray(x).astype(jnp.float32)
    lo = (jnp.asarray(x, dtype=jnp.float64) - hi.astype(jnp.float64)) \
        .astype(jnp.float32) if jnp.asarray(x).dtype == jnp.float64 \
        else jnp.zeros_like(hi)
    return hi, lo


def to_f64(d):
    """Evaluate the unevaluated sum in f64 (exact: both parts convert
    losslessly)."""
    return d[0].astype(jnp.float64) + d[1].astype(jnp.float64)


def zeros_like(x):
    z = jnp.zeros_like(x)
    return z, z


def const(value, like):
    """ds constant broadcast against `like` (a Python float; split exactly
    through f64). Always returns f32 pairs — ds numbers are f32 by
    contract (`split` bitcasts through int32), whatever dtype `like` has."""
    hi = jnp.float32(value)
    lo = jnp.float32(value - float(hi))
    shape = jnp.shape(like)
    return jnp.full(shape, hi, jnp.float32), jnp.full(shape, lo, jnp.float32)


# ── ds arithmetic ───────────────────────────────────────────────────────────

def add(x, y):
    """ds + ds (the accurate double-double add: two two_sums + two
    renormalizations). Error ~2^-47·(|x| + |y|) absolute — under heavy
    cancellation the RESULT-relative error can be larger, which is exactly
    the regime the residual cares about: what matters there is absolute
    error ≪ 1e-9 from O(1) operands, which this delivers with ~100x
    margin."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    return quick_two_sum(s, e)


def sub(x, y):
    return add(x, (-y[0], -y[1]))


def neg(x):
    return -x[0], -x[1]


def add_single(x, s):
    """ds + f32."""
    h, e = two_sum(x[0], s)
    e = e + x[1]
    return quick_two_sum(h, e)


def mul(x, y):
    """ds · ds."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def mul_single(x, s):
    """ds · f32 (s a plain f32 array/scalar)."""
    p, e = two_prod(x[0], s)
    e = e + x[1] * s
    return quick_two_sum(p, e)


def div(x, y):
    """ds / ds. The f32 hardware quotient only SEEDS q1; the remainder is
    computed error-free, so a sloppy (non-correctly-rounded) TPU divide
    costs accuracy only in the O(eps^2) third term."""
    q1 = x[0] / y[0]
    r = sub(x, mul_single(y, q1))
    q2 = (r[0] + r[1]) / y[0]
    return quick_two_sum(q1, q2)


def recip(y):
    one = jnp.ones_like(y[0])
    return div((one, jnp.zeros_like(one)), y)


def powi(x, n: int):
    """ds integer power, n >= 1 (binary exponentiation of ds muls)."""
    assert n >= 1
    result = None
    base = x
    while n:
        if n & 1:
            result = base if result is None else mul(result, base)
        n >>= 1
        if n:
            base = mul(base, base)
    return result


def inv_nroot(u, gamma: int, iters: int = 2):
    """c = u^(-1/gamma) for integer gamma >= 1, u > 0.

    f32 seed + `iters` Newton steps on f(c) = u·c^gamma − 1 carried in ds:
        c ← c · (1 + (1 − u·c^gamma)/gamma)
    Each step squares the relative error (seed ~1e-6 even with sloppy TPU
    pow → 1e-12 → ds floor), and u·c^gamma is evaluated in ds so the
    correction itself is accurate. gamma = 1 short-circuits to recip.
    """
    if gamma == 1:
        return recip(u)
    c = (u[0] ** jnp.float32(-1.0 / gamma), jnp.zeros_like(u[0]))
    inv_g = jnp.float32(1.0 / gamma)
    for _ in range(iters):
        ucg = mul(u, powi(c, gamma))
        corr = mul_single(sub((jnp.ones_like(ucg[0]), jnp.zeros_like(ucg[0])),
                              ucg), inv_g)
        c = mul(c, add_single(corr, jnp.float32(1.0)))
    return c


def powi_neg(x, gamma: int):
    """x^(-gamma) for integer gamma >= 1 (marginal utility)."""
    return recip(powi(x, gamma))


def sqrt(x):
    """ds sqrt for x >= 0 (the two-asset analytic quadratic FOC root).

    f32 hardware sqrt seeds s; the Karp-Markstein correction
    e = (x − s²)/(2s) is evaluated with an error-free s² (two_prod), so a
    sloppy TPU rsqrt/sqrt costs accuracy only at O(eps²). x = 0 (and any
    negative rounding dust clamped by the caller) short-circuits to 0 to
    avoid 0/0."""
    s = jnp.sqrt(jnp.maximum(x[0], jnp.float32(0.0)))
    s2 = two_prod(s, s)
    r = sub(x, s2)
    e = (r[0] + r[1]) / jnp.maximum(s + s, jnp.float32(1e-30))
    out = quick_two_sum(s, e)
    zero = jnp.zeros_like(s)
    safe = s > 0.0
    return jnp.where(safe, out[0], zero), jnp.where(safe, out[1], zero)


# ── selects / comparisons ───────────────────────────────────────────────────

def where(mask, x, y):
    return jnp.where(mask, x[0], y[0]), jnp.where(mask, x[1], y[1])


def lt(x, y):
    """Exact ds x < y (lexicographic on normalized pairs)."""
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def gt(x, y):
    return lt(y, x)


def maximum(x, y):
    return where(lt(x, y), y, x)


def minimum(x, y):
    return where(lt(x, y), x, y)
