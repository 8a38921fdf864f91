"""Runtime quantized-linear: rotation + INT4 dequant + matmul.

TPU-native counterpart of the reference inference module
(/root/reference/paroquant/inference/backends/transformers/modules.py:57-71,
which launches a rotation CUDA kernel then an AWQ GEMM kernel per linear).
Here the layer is a plain pytree (`QuantizedLinear`) and the forward is a
single fused computation:

    y = rotate(x * inv_channel_scales) @ dequant(qweight)        (+ bias)

with the per-group rotation matrices *pre-composed* at load time and the
inverse channel scales folded into them, so the hot path is:

    y[., o] = sum_g (x_g @ M_g^T) @ (q_g - z_g) * s_g

Execution strategies (`mode`):
  - "fused":  one Pallas kernel (kernels/rot_matmul.py) — rotation, unpack,
              dequant, matmul in one HBM pass.
  - "xla":    einsum rotation + jnp dequant matmul (XLA-fused; CPU-friendly
              fallback and the reference implementation for kernel tests).
  - "pseudo": dense effective bf16 weight precomputed once (debug/eval parity).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rotation as rot_ops
from .packing import pack_wq_tpu, unpack_wq_tpu


class QuantizedLinear(NamedTuple):
    """Pytree for one quantized linear layer (all arrays device-ready).

    Shapes (I = in_features, O = out_features, G = I // group_size, S = group
    size, Ght = number of rotation groups == G):
      qweight uint8 [I//2, O]   PARO-TPU packed int4 (see ops/packing.py)
      scales  f32   [G, O]      per-group dequant scales
      zeros   f32   [G, O]      per-group rounded zero points (0..15)
      rot     f32   [G, S, S]   composed rotation matrices with 1/channel_scale
                                folded in: M_g = R_g @ diag(inv_s_g)
      bias    f32   [O] | None
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: jax.Array
    rot: jax.Array
    bias: jax.Array | None

    @property
    def group_size(self) -> int:
        return self.rot.shape[-1]

    @property
    def in_features(self) -> int:
        return self.scales.shape[0] * self.group_size

    @property
    def out_features(self) -> int:
        return self.qweight.shape[1]


def make_quantized_linear(
    q: np.ndarray,
    scales: np.ndarray,
    zeros: np.ndarray,
    pairs: np.ndarray,
    theta: np.ndarray,
    inv_channel_scales: np.ndarray,
    group_size: int,
    bias: np.ndarray | None = None,
    rot_dtype: jnp.dtype = jnp.float32,
    n_bits: int = 4,
) -> QuantizedLinear:
    """Build the runtime pytree from interchange-format tensors.

    q int [O, I]; scales/zeros [O, G]; pairs int [K, I]; theta [K, I//2];
    inv_channel_scales [I] (the checkpoint's `channel_scales`, which the
    reference stores already inverted — cli/convert.py:264-266).
    """
    O, I = q.shape
    form = rot_ops.pairs_to_permutation(np.asarray(pairs), group_size)
    form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form))
    R = rot_ops.build_rotation_matrices(
        jnp.asarray(theta, jnp.float32), form, group_size, dtype=jnp.float32
    )  # [G, S, S]
    inv_s = jnp.asarray(inv_channel_scales, jnp.float32).reshape(-1, group_size)
    M = R * inv_s[:, None, :]  # fold diag(inv_s) on the input side
    return QuantizedLinear(
        qweight=jnp.asarray(pack_wq_tpu(np.asarray(q).T, n_bits, group_size)),
        scales=jnp.asarray(scales, jnp.float32).T,
        zeros=jnp.asarray(zeros, jnp.float32).T,
        rot=M.astype(rot_dtype),
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
    )


def dequantized_weight(layer: QuantizedLinear, dtype=jnp.float32) -> jax.Array:
    """Dequantized rotated weight Wd [I, O] (no rotation folded)."""
    q = unpack_wq_tpu(layer.qweight, layer.in_features, layer.group_size)  # [I, O]
    G = layer.scales.shape[0]
    S = layer.group_size
    qg = q.reshape(G, S, -1).astype(jnp.float32)
    w = (qg - layer.zeros[:, None, :]) * layer.scales[:, None, :]
    return w.reshape(q.shape).astype(dtype)


def effective_weight(layer: QuantizedLinear, dtype=jnp.float32) -> jax.Array:
    """Dense effective weight We [I, O] with rotation+scales folded ("pseudo").

    y = x @ We  with  We = M_blockdiag^T @ Wd.
    """
    wd = dequantized_weight(layer, jnp.float32)  # [I, O]
    G, S, _ = layer.rot.shape
    wg = wd.reshape(G, S, -1)
    we = jnp.einsum(
        "gij,gjo->gio", jnp.swapaxes(layer.rot.astype(jnp.float32), 1, 2), wg,
        preferred_element_type=jnp.float32,
    )
    return we.reshape(wd.shape).astype(dtype)


def _forward_xla(layer: QuantizedLinear, x: jax.Array) -> jax.Array:
    """Reference (non-Pallas) forward: einsum rotation then dequant matmul."""
    G, S, _ = layer.rot.shape
    shape = x.shape
    xg = x.reshape(-1, G, S)
    xr = jnp.einsum(
        "gij,bgj->bgi", layer.rot.astype(jnp.float32), xg.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(-1, G * S)
    wd = dequantized_weight(layer, jnp.float32)
    y = jnp.dot(xr.astype(x.dtype), wd.astype(x.dtype), preferred_element_type=jnp.float32)
    return y.reshape(*shape[:-1], -1).astype(x.dtype)


@partial(jax.jit, static_argnames=("mode",))
def quantized_linear_forward(
    layer: QuantizedLinear, x: jax.Array, mode: str = "xla"
) -> jax.Array:
    """Apply the quantized linear to x [..., I] -> [..., O]."""
    if mode == "xla":
        y = _forward_xla(layer, x)
    elif mode == "fused":
        from ..kernels.rot_matmul import rot_w4_matmul

        shape = x.shape
        y2 = rot_w4_matmul(
            x.reshape(-1, shape[-1]), layer.rot, layer.qweight, layer.scales, layer.zeros
        )
        y = y2.reshape(*shape[:-1], -1).astype(x.dtype)
    else:
        raise ValueError(f"unknown mode: {mode}")
    if layer.bias is not None:
        y = y + layer.bias.astype(y.dtype)
    return y
