"""Batched min reductions.

TPU-native replacements for the reference's SIMD vector kernels
(vector.hxx): ``min`` (vector.hxx:289-313), ``min_except``
(vector.hxx:315-323) and ``two_min`` (min + second min, vector.hxx:348-449)
— the workhorse of Potts messages — expressed as XLA reductions so they
fuse into surrounding elementwise work.
"""
from __future__ import annotations

import jax.numpy as jnp


def two_min(x: jnp.ndarray, axis: int = -1):
    """(min, second_min, argmin) along ``axis`` (vector.hxx:348-449).

    ``second_min`` is the minimum over all entries except the (first)
    argmin position.  For axes of length 1 the second min is +inf-like
    (max of dtype is avoided; uses the masked value itself).
    """
    m = jnp.min(x, axis=axis, keepdims=True)
    am = jnp.argmin(x, axis=axis, keepdims=True)
    idx = jnp.arange(x.shape[axis])
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    idx = idx.reshape(shape)
    big = jnp.finfo(x.dtype).max
    masked = jnp.where(idx == am, big, x)
    s = jnp.min(masked, axis=axis, keepdims=True)
    return (jnp.squeeze(m, axis), jnp.squeeze(s, axis), jnp.squeeze(am, axis))


def min_except_index(x: jnp.ndarray, entry: jnp.ndarray) -> jnp.ndarray:
    """out[m] = x[m, entry[m]] - min over k != entry[m] of x[m, k].

    Scalar min-marginal of a single-entry binary indicator (the
    graph-matching equality message's variable space)."""
    rows = jnp.arange(x.shape[0])
    val = x[rows, entry]
    big = jnp.finfo(x.dtype).max
    masked = jnp.where(jnp.arange(x.shape[1])[None, :] == entry[:, None], big, x)
    other = jnp.min(masked, axis=1)
    return val - other


def min_except(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """out[..., i] = min over j != i of x[..., j] (vector.hxx:315-323),
    computed for every i via the two-min trick."""
    m, s, am = two_min(x, axis=axis)
    m = jnp.expand_dims(m, axis)
    s = jnp.expand_dims(s, axis)
    am = jnp.expand_dims(am, axis)
    idx = jnp.arange(x.shape[axis])
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    idx = idx.reshape(shape)
    return jnp.where(idx == am, s, m)
