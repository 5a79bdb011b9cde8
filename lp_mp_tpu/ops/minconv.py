"""Batched min-(sum-)convolution.

Reference: ``min_convolution::min_conv_naive`` / ``min_conv_Bussieck_et_al``
/ ``arg_min_conv_Bussieck_et_al`` (behavior pinned by test/min_conv.cpp).
Bussieck et al.'s output-sensitive algorithm is a CPU trick built on
sorting; on TPU the dense formulation is the right shape: materialize the
[n, S] matrix of shifted additions and min-reduce — one fused XLA kernel,
batched over leading axes.

    out[s] = min_{i + j = s} a[i] + b[j]
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.inf


def min_conv(a: jnp.ndarray, b: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Min-convolution along the last axis, batched over leading axes.

    a: [..., n], b: [..., m] -> out: [..., out_size] with
    out[..., s] = min over i of a[..., i] + b[..., s - i] (inf where empty).
    """
    n = a.shape[-1]
    s_idx = jnp.arange(out_size)                       # [S]
    i_idx = jnp.arange(n)                              # [n]
    j = s_idx[None, :] - i_idx[:, None]                # [n, S]
    valid = (j >= 0) & (j < b.shape[-1])
    jc = jnp.clip(j, 0, b.shape[-1] - 1)
    # gather b at [..., n, S]
    bg = jnp.take(b, jc.reshape(-1), axis=-1).reshape(b.shape[:-1] + (n, out_size))
    vals = a[..., :, None] + jnp.where(valid, bg, _BIG)
    return jnp.min(vals, axis=-2)


def arg_min_conv(a: jnp.ndarray, b: jnp.ndarray, out_size: int):
    """(values, argmin_i): also returns the minimizing index into ``a``
    (arg_min_conv_Bussieck_et_al analogue)."""
    n = a.shape[-1]
    s_idx = jnp.arange(out_size)
    i_idx = jnp.arange(n)
    j = s_idx[None, :] - i_idx[:, None]
    valid = (j >= 0) & (j < b.shape[-1])
    jc = jnp.clip(j, 0, b.shape[-1] - 1)
    bg = jnp.take(b, jc.reshape(-1), axis=-1).reshape(b.shape[:-1] + (n, out_size))
    vals = a[..., :, None] + jnp.where(valid, bg, _BIG)
    return jnp.min(vals, axis=-2), jnp.argmin(vals, axis=-2)
