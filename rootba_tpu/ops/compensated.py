"""Compensated float32 accumulation (error-free transforms).

TPU float64 is software-emulated and an order of magnitude slower than
f32, so the fast path runs everything in float32 (the reference's
rootba-32 mode). The two places where plain f32 accumulation can
distort the LM trust-region logic at venice/final scale (SURVEY §7.6
"hard part (c)") are

  * the CG dot products (rho, p'q and the Nash q1 = -x'(b+r) model
    value, reference cg/conjugate_gradient.hpp:113-295), and
  * the model cost decrease l_diff = -sum (J inc)'(r + 0.5 J inc)
    (reference landmark_block_base.ipp:213-284) whose sum over tens of
    millions of observation terms cancels catastrophically near
    convergence, feeding rho = f_diff/l_diff step acceptance.

These helpers compute sums/dots with double-float (hi, lo) carry using
Knuth's TwoSum and Dekker's TwoProduct: the result is accurate to
~2^-48 relative, at ~4x the elementwise flops of a plain reduction
(bandwidth-bound ~2-3x traffic; negligible against the surrounding
stages). All shapes are static; the tree reduction unrolls into
log2(n) vectorized levels, XLA-fusible, no data-dependent control
flow.
"""

from __future__ import annotations

import jax.numpy as jnp


def two_sum(a, b):
    """Error-free sum: a + b = s + err exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Dekker split into hi/lo halves with non-overlapping mantissas.

    Factor 2^ceil(p/2)+1: p=24 for f32 -> 2^12+1; p=53 for f64 -> 2^27+1.
    """
    factor = 4097.0 if a.dtype == jnp.float32 else 134217729.0
    c = jnp.asarray(factor, a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + err exactly (Dekker TwoProduct)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _df_reduce(hi, lo):
    """Tree-reduce (hi, lo) component arrays to one double-float scalar
    pair; log2(n) vectorized two_sum levels."""
    hi = hi.ravel()
    lo = lo.ravel()
    n = hi.shape[0]
    # pad once to a power of two so every level splits evenly
    n2 = 1 << max(int(n - 1).bit_length(), 0) if n > 1 else 1
    if n2 != n:
        hi = jnp.concatenate([hi, jnp.zeros((n2 - n,), hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros((n2 - n,), lo.dtype)])
    while hi.shape[0] > 1:
        m = hi.shape[0] // 2
        s, e = two_sum(hi[:m], hi[m:])
        lo = lo[:m] + lo[m:] + e
        hi = s
    return hi[0], lo[0]


def comp_sum2(x):
    """Compensated sum of an array: returns the double-float pair
    (hi, lo) with x.sum() = hi + lo to ~2^-48 relative accuracy."""
    return _df_reduce(x, jnp.zeros_like(x))


def comp_sum(x):
    """Compensated sum collapsed back to the input dtype (the lo part
    still corrects the rounding of the tree itself: the result is the
    correctly-rounded f32 of the exact sum in almost all cases)."""
    hi, lo = comp_sum2(x)
    return hi + lo


def comp_dot(a, b):
    """Compensated dot product: TwoProduct per element, double-float
    tree sum. Returns a scalar in the input dtype."""
    p, e = two_prod(a.ravel(), b.ravel())
    hi, lo = _df_reduce(p, e)
    return hi + lo
