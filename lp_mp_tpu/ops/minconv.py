"""Batched min-(sum-)convolution.

Reference: ``min_convolution::min_conv_naive`` / ``min_conv_Bussieck_et_al``
/ ``arg_min_conv_Bussieck_et_al`` (behavior pinned by test/min_conv.cpp).
Bussieck et al.'s output-sensitive algorithm is a CPU trick built on
sorting; on TPU the dense formulation is the right shape.

    out[s] = min_{i + j = s} a[i] + b[j]

TPU shape (round 5): the reduction runs over the SECOND argument's width
``m`` as ``m`` static shifted-slice terms of ``a`` — pure pad+slice
streams the VPU eats, instead of the previous [.., n, S] lane-axis gather
(jnp.take along the minor axis lowers to a per-element gather on TPU).
Callers keep the smaller vector second (the DP steps pass the per-variable
label costs, width <= #labels).
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.inf


def _shifted(a: jnp.ndarray, j: int, out_size: int) -> jnp.ndarray:
    """term[s] = a[s - j] with +inf outside [0, n)."""
    n = a.shape[-1]
    pad_lo = j
    pad_hi = max(0, out_size - j - n)
    ap = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((pad_lo, pad_hi),),
                 constant_values=_BIG)
    return ap[..., :out_size]


def min_conv(a: jnp.ndarray, b: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Min-convolution along the last axis, batched over leading axes.

    a: [..., n], b: [..., m] -> out: [..., out_size] with
    out[..., s] = min over j of b[..., j] + a[..., s - j] (inf where empty).
    """
    m = b.shape[-1]
    out = jnp.full(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
                   + (out_size,), _BIG, a.dtype)
    for j in range(min(m, out_size)):
        out = jnp.minimum(out, _shifted(a, j, out_size) + b[..., j:j + 1])
    return out


def arg_min_conv(a: jnp.ndarray, b: jnp.ndarray, out_size: int):
    """(values, argmin_i): also returns the minimizing index into ``a``
    (arg_min_conv_Bussieck_et_al analogue)."""
    m = b.shape[-1]
    terms = jnp.stack([_shifted(a, j, out_size) + b[..., j:j + 1]
                       for j in range(min(m, out_size))], axis=0)
    j_min = jnp.argmin(terms, axis=0)
    vals = jnp.min(terms, axis=0)
    s = jnp.arange(out_size)
    return vals, s - j_min
