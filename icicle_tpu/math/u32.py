"""uint32 helper primitives shared by the limb kernels.

TPUs have native 32-bit integer lanes but no widening 32x32->64 multiply, so the
high half of a product is reconstructed from 16x16->32 partials. All helpers are
shape-polymorphic jnp functions usable inside jit and Pallas kernels alike.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
# plain python int: folds as a literal in jaxprs (a jnp.uint32 scalar is a 0-d
# device array, which Pallas kernels would have to capture as an input)
MASK16 = 0xFFFF


def mullo(a, b):
    """Low 32 bits of a*b (native wraparound multiply)."""
    return (a * b).astype(U32)


def mulhilo(a, b):
    """(hi, lo) of the 64-bit product of two uint32 arrays, via 16-bit partials."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid accumulates at most 2^16-1 + 2*(2^16-1) < 2^18: safe in uint32
    mid = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def mulhi(a, b):
    return mulhilo(a, b)[0]


def addc(a, b, cin=None):
    """(sum, carry_out) of a+b(+cin) in uint32, carry as uint32 0/1."""
    s = a + b
    carry = (s < a).astype(U32)
    if cin is not None:
        s2 = s + cin
        carry = carry + (s2 < s).astype(U32)
        s = s2
    return s, carry


def subb(a, b, bin_=None):
    """(diff, borrow_out) of a-b(-bin) in uint32, borrow as uint32 0/1."""
    d = a - b
    borrow = (a < b).astype(U32)
    if bin_ is not None:
        d2 = d - bin_
        borrow = borrow + (d < bin_).astype(U32)
        d = d2
    return d, borrow
