"""Uniform affine group quantization math (asymmetric, weight-only INT4).

Functional JAX re-design of the reference quantizer
(/root/reference/paroquant/optim/quant.py:6-13 for the STE primitives and
/root/reference/paroquant/optim/quantizer.py:10-24,86-117 for the group
quantizer semantics). Bit-careful points preserved from the reference:

- per-group min/max init: scale = clamp(max-min, 1e-5) / qmax, zero_point = min/scale
- pseudo-quantize runs in float32, scale clamped to [1e-5, 1e5]
- round_zero_point = clamp(-round(zero_point), qmin, qmax)
- STE gradients through round and clamp

Unlike the reference's nn.Module, quantizer state here is a plain pytree
(`QuantizerParams`) so it jits, vmaps and shards transparently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def round_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (reference quant.py:6-8)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def clamp_ste(x: jax.Array, min: float | None = None, max: float | None = None) -> jax.Array:
    """Clamp with straight-through gradient (reference quant.py:11-13)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, min, max) - x)


class QuantizerParams(NamedTuple):
    """Learnable per-group quantization parameters.

    Shapes follow the reference layout (quantizer.py:45-47): for a weight of
    shape [O, I] with G = I // group_size groups per row, both tensors are
    [O * G, 1] float32.
    """

    scale: jax.Array
    zero_point_float: jax.Array


def calc_scales_and_zero_points(
    weight: jax.Array, group_size: int, n_bits: int
) -> QuantizerParams:
    """Min/max asymmetric init per group (reference quantizer.py:10-24)."""
    assert weight.ndim == 2, weight.shape
    assert weight.shape[-1] % group_size == 0, (weight.shape, group_size)
    qmax = 2**n_bits - 1
    x = weight.astype(jnp.float32).reshape(-1, group_size)
    min_val = jnp.min(x, axis=1, keepdims=True)
    max_val = jnp.max(x, axis=1, keepdims=True)
    scale = clamp_ste(max_val - min_val, min=1e-5) / qmax
    zero_point = min_val / scale
    return QuantizerParams(scale=scale, zero_point_float=zero_point)


def pseudo_quantize(
    x: jax.Array,
    n_bits: int,
    group_size: int,
    params: QuantizerParams | None = None,
) -> jax.Array:
    """Quantize-dequantize round trip with STE (reference quantizer.py:86-117).

    `x` is [O, I]; math runs in float32 and the result is cast back to x.dtype.
    When `params` is None, scale/zero-point are derived from x itself (the
    "static" path used before the quantizer params become learnable).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    qmin, qmax = 0, 2**n_bits - 1
    if params is None:
        params = calc_scales_and_zero_points(xf, group_size, n_bits)
    scale = clamp_ste(params.scale.astype(jnp.float32), min=1e-5, max=1e5)
    round_zero_point = clamp_ste(-round_ste(params.zero_point_float.astype(jnp.float32)), qmin, qmax)
    dim1, dim2 = xf.shape
    xg = xf.reshape(-1, group_size)
    x_int = round_ste(xg / scale)
    x_int = x_int + round_zero_point
    x_int = clamp_ste(x_int, qmin, qmax)
    x_dequant = (x_int - round_zero_point) * scale
    return x_dequant.reshape(dim1, dim2).astype(dtype)


def quantize_to_int(
    rotated_weight: jax.Array,
    params: QuantizerParams,
    n_bits: int,
    group_size: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Final (hard) quantization for checkpoint export.

    Mirrors the reference converter math (cli/convert.py:158-191): given the
    already rotated+scaled weight [O, I] and learned scale/zp, returns

      q      int32  [O, I]      in [0, 2^bits)
      scales float32 [O, G]
      zeros  int32  [O, G]      the *rounded* zero points in [0, 2^bits)

    such that dequant(q) = (q - zeros) * scales per group.
    """
    out_features, in_features = rotated_weight.shape
    qmax = 2**n_bits - 1
    n_groups = in_features // group_size
    w = rotated_weight.astype(jnp.float32).reshape(-1, group_size)
    scale = jnp.clip(params.scale.astype(jnp.float32), 1e-5, 1e5)
    zeros = jnp.clip(-jnp.round(params.zero_point_float.astype(jnp.float32)), 0, qmax)
    q = jnp.clip(jnp.round(w / scale) + zeros, 0, qmax).astype(jnp.int32)
    return (
        q.reshape(out_features, in_features),
        scale.reshape(out_features, n_groups),
        zeros.astype(jnp.int32).reshape(out_features, n_groups),
    )


def dequantize_int(
    q: jax.Array, scales: jax.Array, zeros: jax.Array, group_size: int,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Inverse of quantize_to_int: q [O, I], scales/zeros [O, G] -> [O, I]."""
    out_features, in_features = q.shape
    qg = q.reshape(out_features, -1, group_size).astype(jnp.float32)
    w = (qg - zeros[..., None].astype(jnp.float32)) * scales[..., None].astype(jnp.float32)
    return w.reshape(out_features, in_features).astype(dtype)
