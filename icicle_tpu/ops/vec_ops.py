"""Vector ops over field-element tensors (reference F1: include/icicle/vec_ops.h).

Array convention: an element tensor has shape ``batch_dims + (size,) + limb_shape``
where ``limb_shape`` is ``()`` for single-word fields, ``(L,)`` otherwise. The
reference's ``batch_size``/``columns_batch`` describe flat host buffers; here
batch is just leading axes (use :func:`from_flat`/:func:`to_flat` at the
ICICLE-layout boundary — columns_batch corresponds to a transposed 2D layout,
vec_ops.h:33-35).

All ops are registered with the dispatcher under ``vec_ops.<name>`` and jitted
per field; the "xla" backend is the bit-exactness reference. Elementwise chains
fuse in XLA, so there is no Pallas variant for these — the TPU-native fast path
*is* the fused jnp graph.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field
from icicle_tpu.runtime.config import VecOpsConfig
from icicle_tpu.runtime import dispatcher

_DEFAULT = VecOpsConfig()


def _vec_axis(f: Field) -> int:
    return -1 - len(f.limb_shape)


# -- elementwise --------------------------------------------------------------

def vector_add(f: Field, a, b, cfg: VecOpsConfig = _DEFAULT):
    return dispatcher.dispatch("vec_ops.add", cfg.backend)(f, a, b)


def vector_sub(f: Field, a, b, cfg: VecOpsConfig = _DEFAULT):
    return dispatcher.dispatch("vec_ops.sub", cfg.backend)(f, a, b)


def vector_mul(f: Field, a, b, cfg: VecOpsConfig = _DEFAULT):
    return dispatcher.dispatch("vec_ops.mul", cfg.backend)(f, a, b)


def vector_div(f: Field, a, b, cfg: VecOpsConfig = _DEFAULT):
    return dispatcher.dispatch("vec_ops.div", cfg.backend)(f, a, b)


def vector_inv(f: Field, a, cfg: VecOpsConfig = _DEFAULT):
    return dispatcher.dispatch("vec_ops.inv", cfg.backend)(f, a)


def vector_accumulate(f: Field, a, b, cfg: VecOpsConfig = _DEFAULT):
    """a += b, functional (reference vector_accumulate)."""
    return vector_add(f, a, b, cfg)


dispatcher.register_impl("vec_ops.add", "xla", lambda f, a, b: f.add(a, b))
dispatcher.register_impl("vec_ops.sub", "xla", lambda f, a, b: f.sub(a, b))
dispatcher.register_impl("vec_ops.mul", "xla", lambda f, a, b: f.mul(a, b))
dispatcher.register_impl("vec_ops.div", "xla", lambda f, a, b: f.mul(a, f.inv(b)))
dispatcher.register_impl("vec_ops.inv", "xla", lambda f, a: f.inv(a))


# -- scalar (x) vector ---------------------------------------------------------

def _bcast_scalar(f: Field, scalar, vec):
    """Broadcast one element (or (batch,)+limb element batch) against vec."""
    s = jnp.asarray(scalar, dtype=jnp.uint32)
    want = len(vec.shape)
    while len(s.shape) < want:
        axis = len(s.shape) - len(f.limb_shape)
        s = jnp.expand_dims(s, axis)
    return s


def scalar_add_vec(f: Field, scalar, vec, cfg: VecOpsConfig = _DEFAULT):
    return f.add(_bcast_scalar(f, scalar, vec), vec)


def scalar_sub_vec(f: Field, scalar, vec, cfg: VecOpsConfig = _DEFAULT):
    """scalar - vec elementwise (reference scalar_sub_vec semantics)."""
    return f.sub(_bcast_scalar(f, scalar, vec), vec)


def scalar_mul_vec(f: Field, scalar, vec, cfg: VecOpsConfig = _DEFAULT):
    return f.mul(_bcast_scalar(f, scalar, vec), vec)


# -- reductions ----------------------------------------------------------------

def vector_sum(f: Field, a, cfg: VecOpsConfig = _DEFAULT):
    """Field sum along the vector axis (reference vector_sum)."""
    axis = _vec_axis(f)
    n = a.shape[axis]
    # log-tree reduction with modular adds (overflow-safe, unlike jnp.sum)
    x = jnp.moveaxis(a, axis, 0)
    size = 1
    while size < n:
        size *= 2
    if size != n:
        pad = jnp.zeros((size - n,) + x.shape[1:], dtype=jnp.uint32)
        x = jnp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = f.add(x[:half], x[half:])
    return x[0]


def vector_product(f: Field, a, cfg: VecOpsConfig = _DEFAULT):
    """Field product along the vector axis (reference vector_product)."""
    axis = _vec_axis(f)
    n = a.shape[axis]
    x = jnp.moveaxis(a, axis, 0)
    size = 1
    while size < n:
        size *= 2
    if size != n:
        one = f.const(1, batch_shape=(size - n,) + x.shape[1:len(x.shape) - len(f.limb_shape)])
        x = jnp.concatenate([x, one.astype(jnp.uint32)], axis=0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = f.mul(x[:half], x[half:])
    return x[0]


# -- structural ops --------------------------------------------------------------

def bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    assert 1 << logn == n, "bit_reverse requires a power-of-two size"
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def bit_reverse(f: Field, a, cfg: VecOpsConfig = _DEFAULT):
    """Bit-reversal permutation along the vector axis (reference bit_reverse)."""
    axis = _vec_axis(f)
    n = a.shape[axis]
    perm = jnp.asarray(bit_reverse_indices(n))
    return jnp.take(a, perm, axis=a.ndim + axis if axis < 0 else axis)


def slice_vec(f: Field, a, offset: int, stride: int, size_out: int,
              cfg: VecOpsConfig = _DEFAULT):
    """out[i] = in[offset + i*stride] (reference slice, vec_ops.h)."""
    axis = a.ndim + _vec_axis(f)
    idx = offset + stride * jnp.arange(size_out)
    return jnp.take(a, idx, axis=axis)


def highest_non_zero_idx(f: Field, a, cfg: VecOpsConfig = _DEFAULT):
    """Index of the highest non-zero element, -1 if all zero (reference
    highest_non_zero_idx)."""
    axis = a.ndim + _vec_axis(f)
    nz = ~(f.is_zero(a) if f.limb_shape else (a == 0))
    n = a.shape[axis]
    pos = jnp.arange(n, dtype=jnp.int32)
    shape = [1] * nz.ndim
    shape[axis] = n
    pos = pos.reshape(shape)
    best = jnp.max(jnp.where(nz, pos, -1), axis=axis)
    return best


# -- polynomial helpers ------------------------------------------------------

def polynomial_eval(f: Field, coeffs, domain, cfg: VecOpsConfig = _DEFAULT):
    """Evaluate coefficient vector(s) on a domain (reference polynomial_eval):
    Horner's rule scanned over the coefficient axis, vectorized over the domain."""
    caxis = coeffs.ndim + _vec_axis(f)
    cs = jnp.moveaxis(coeffs, caxis, 0)  # (ncoeff, batch..., limbs)
    # acc shape: batch... x domain
    dn = domain.shape[domain.ndim + _vec_axis(f)]
    batch_shape = cs.shape[1:len(cs.shape) - len(f.limb_shape)]
    acc = jnp.zeros(batch_shape + (dn,) + f.limb_shape, dtype=jnp.uint32)
    dom = domain  # broadcast against batch dims

    def step(acc, c):
        c = jnp.expand_dims(c, axis=len(batch_shape))  # add domain axis
        return f.add(f.mul(acc, dom), c), None

    acc, _ = jax.lax.scan(step, acc, cs[::-1])
    return acc


def polynomial_division(f: Field, numerator, denominator):
    """Dense long division: returns (quotient, remainder)
    (reference polynomial_division, vec_ops.h; CPU impl cpu_vec_ops.cpp).

    Degrees are taken from array sizes; trailing (high-order) zeros allowed in
    the numerator but the denominator's last element must be its true leading
    coefficient.
    """
    n = numerator.shape[numerator.ndim + _vec_axis(f)]
    d = denominator.shape[denominator.ndim + _vec_axis(f)]
    if d > n:
        return f.zeros((1,)), numerator
    qlen = n - d + 1
    dlead_inv = f.inv(denominator[..., d - 1, :] if f.limb_shape else denominator[..., d - 1])
    rem = numerator
    quot = jnp.zeros(numerator.shape[:numerator.ndim + _vec_axis(f)] + (qlen,) + f.limb_shape,
                     dtype=jnp.uint32)

    def body(i, state):
        rem, quot = state
        k = qlen - 1 - i  # current quotient power
        lead = jax.lax.dynamic_index_in_dim(rem, k + d - 1, axis=rem.ndim + _vec_axis(f),
                                            keepdims=False)
        q = f.mul(lead, dlead_inv)
        quot = jax.lax.dynamic_update_index_in_dim(
            quot, q, k, axis=quot.ndim + _vec_axis(f))
        # rem[k : k+d] -= q * denominator
        sub = f.mul(jnp.expand_dims(q, axis=q.ndim - len(f.limb_shape)), denominator)
        seg = jax.lax.dynamic_slice_in_dim(rem, k, d, axis=rem.ndim + _vec_axis(f))
        seg = f.sub(seg, sub)
        rem = jax.lax.dynamic_update_slice_in_dim(rem, seg, k, axis=rem.ndim + _vec_axis(f))
        return rem, quot

    rem, quot = jax.lax.fori_loop(0, qlen, body, (rem, quot))
    raxis = rem.ndim + _vec_axis(f)
    rem = jax.lax.slice_in_dim(rem, 0, max(d - 1, 1), axis=raxis)
    return quot, rem


# -- ICICLE flat-layout boundary ------------------------------------------------

def from_flat(f: Field, flat, size: int, batch_size: int = 1, columns_batch: bool = False):
    """Flat ICICLE buffer -> (batch, size) element tensor.

    columns_batch=True means element i of vector j sits at flat[i*batch + j]
    (column-major, vec_ops.h:33-35)."""
    arr = jnp.asarray(flat)
    if columns_batch:
        arr = arr.reshape((size, batch_size) + f.limb_shape)
        arr = jnp.moveaxis(arr, 1, 0)
    else:
        arr = arr.reshape((batch_size, size) + f.limb_shape)
    return arr


def to_flat(f: Field, arr, columns_batch: bool = False):
    if columns_batch:
        arr = jnp.moveaxis(arr, 0, 1)
    return arr.reshape((-1,) + f.limb_shape)


# -- program execution (reference execute_program, registered via
#    cpu_vec_ops.cpp:678 over CpuProgramExecutor) ---------------------------------

def execute_program(f: Field, program, data: list, cfg: VecOpsConfig = _DEFAULT):
    """Run a Program over parameter vectors in place semantics.

    `data` holds `program.nof_parameters` equal-size vectors; input slots feed
    the program, output slots are REPLACED by the program outputs (the
    reference mutates the output-parameter buffers). Returns the new list.
    """
    outputs = program.execute(f, data)
    out = list(data)
    # outputs map to the parameter slots the lambda overwrote, which the
    # Program records in order; predefined programs overwrite the tail slots.
    n_out = len(outputs)
    for i, val in enumerate(outputs):
        out[program.nof_parameters - n_out + i] = val
    return out
