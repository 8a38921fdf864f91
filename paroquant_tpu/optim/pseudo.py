"""Differentiable pseudo-quantized linear for calibration.

JAX counterpart of the reference's PseudoQuantizedLinear
(/root/reference/paroquant/optim/qlinear.py:13-235). The quantization
simulation is identical math:

    W_hat = (1/s) * R^T( Q( R(s * W) ) )          (qlinear.py:89-123)

with STE gradients through Q, plain autodiff through the rotation stages
(replacing the reference's hand-written CUDA backward, cuda/autograd.py:19-61
— tested equivalent in tests/test_rotation.py), and dummy-pair angles masked
to zero inside the forward (equivalent to the reference's post-step
reset_angles_by_mask, qlinear.py:224-226, but purely functional).

State is a flax.struct dataclass so trainable/static fields jit cleanly.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quant
from ..ops import rotation as rot_ops


@flax.struct.dataclass
class PseudoQuantLinear:
    # trainable
    weight: jax.Array  # [O, I] f32
    channel_scales: jax.Array  # [I] f32
    theta: jax.Array  # [K, I//2] f32
    q_scale: jax.Array | None  # [O*G, 1] f32 (stage-2 learnable) or None
    q_zero_point: jax.Array | None  # [O*G, 1] f32 or None
    bias: jax.Array | None  # [O]
    # fixed
    mask: jax.Array  # [K, I//2] bool
    pairs: jax.Array  # [K, I] int32
    perm: jax.Array  # [K, I] int32
    sign: jax.Array  # [K, I] f32
    theta_idx: jax.Array  # [K, I] int32
    # static
    n_bits: int = flax.struct.field(pytree_node=False, default=4)
    group_size: int = flax.struct.field(pytree_node=False, default=128)

    PARAM_FIELDS = {
        "weight": ("weight",),
        "bias": ("bias",),
        "angles": ("theta",),
        "channel_scales": ("channel_scales",),
        "quantizer": ("q_scale", "q_zero_point"),
    }

    @property
    def form(self) -> rot_ops.PermutationForm:
        return rot_ops.PermutationForm(self.perm, self.sign, self.theta_idx)

    @property
    def rotation_params(self) -> rot_ops.RotationParams:
        return rot_ops.RotationParams(self.pairs, self.theta, self.mask)


def make_pseudo_linear(
    weight: np.ndarray | jax.Array,  # [O, I]
    rotation: rot_ops.RotationParams,
    *,
    bias: np.ndarray | jax.Array | None = None,
    channel_scales: np.ndarray | jax.Array | None = None,
    n_bits: int = 4,
    group_size: int = 128,
) -> PseudoQuantLinear:
    w = jnp.asarray(weight, jnp.float32)
    O, I = w.shape
    perm, sign, theta_idx = rot_ops.pairs_to_permutation(
        np.asarray(rotation.pairs), group_size
    )
    return PseudoQuantLinear(
        weight=w,
        channel_scales=(
            jnp.ones((I,), jnp.float32)
            if channel_scales is None
            else jnp.asarray(channel_scales, jnp.float32)
        ),
        theta=jnp.asarray(rotation.theta, jnp.float32),
        q_scale=None,
        q_zero_point=None,
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        mask=jnp.asarray(rotation.mask),
        pairs=jnp.asarray(rotation.pairs, jnp.int32),
        perm=jnp.asarray(perm),
        sign=jnp.asarray(sign),
        theta_idx=jnp.asarray(theta_idx),
        n_bits=n_bits,
        group_size=group_size,
    )


def rotated_scaled_weight(lin: PseudoQuantLinear) -> jax.Array:
    """R(s * W) — the tensor the quantizer sees (qlinear.py:146-160)."""
    theta = rot_ops.effective_theta(lin.rotation_params)
    w = lin.weight * lin.channel_scales[None, :]
    return rot_ops.apply_rotation_stages(w, theta, lin.form)


def init_quantizer(lin: PseudoQuantLinear) -> PseudoQuantLinear:
    """Attach learnable quantizer params initialized from the current rotated
    weight (reference set_optim_enabled(quantizer=True), qlinear.py:139-160)."""
    w_rot = rotated_scaled_weight(lin)
    qp = quant.calc_scales_and_zero_points(w_rot, lin.group_size, lin.n_bits)
    return lin.replace(q_scale=qp.scale, q_zero_point=qp.zero_point_float)


def pseudo_quantized_weight(lin: PseudoQuantLinear) -> jax.Array:
    """W_hat [O, I]: scale -> rotate -> quant -> unrotate -> unscale."""
    theta = rot_ops.effective_theta(lin.rotation_params)
    w = lin.weight * lin.channel_scales[None, :]
    w = rot_ops.apply_rotation_stages(w, theta, lin.form)
    if lin.q_scale is not None:
        params = quant.QuantizerParams(lin.q_scale, lin.q_zero_point)
        w = quant.pseudo_quantize(w, lin.n_bits, lin.group_size, params)
    else:
        w = quant.pseudo_quantize(w, lin.n_bits, lin.group_size)
    w = rot_ops.apply_rotation_stages(w, theta, lin.form, inverse=True)
    return w / lin.channel_scales[None, :]


def pseudo_linear_forward(lin: PseudoQuantLinear, x: jax.Array) -> jax.Array:
    w_hat = pseudo_quantized_weight(lin)
    y = jnp.dot(
        x.astype(jnp.float32), w_hat.T, preferred_element_type=jnp.float32
    )
    if lin.bias is not None:
        y = y + lin.bias
    return y.astype(x.dtype)


# param-group selectors (reference get_optim_params, qlinear.py:166-182)
PARAM_GROUPS: dict[str, tuple[str, ...]] = {
    "weight": ("weight",),
    "bias": ("bias",),
    "angles": ("theta",),
    "channel_scales": ("channel_scales",),
    "quantizer": ("q_scale", "q_zero_point"),
}


def export_quantized(lin: PseudoQuantLinear) -> dict[str, Any]:
    """Hard-quantize to interchange tensors (reference cli/convert.py:239-277).

    Returns dict with q [O,I] int32, scales [O,G] f32, zeros [O,G] int32,
    pairs, theta, inv_channel_scales, bias.
    """
    if lin.q_scale is not None:
        qp = quant.QuantizerParams(lin.q_scale, lin.q_zero_point)
    else:
        qp = quant.calc_scales_and_zero_points(
            rotated_scaled_weight(lin), lin.group_size, lin.n_bits
        )
    w_rot = rotated_scaled_weight(lin)
    q, s, z = quant.quantize_to_int(w_rot, qp, lin.n_bits, lin.group_size)
    theta = rot_ops.effective_theta(lin.rotation_params)
    return {
        "q": np.asarray(q),
        "scales": np.asarray(s),
        "zeros": np.asarray(z),
        "pairs": np.asarray(lin.pairs),
        "theta": np.asarray(theta),
        "inv_channel_scales": np.asarray(1.0 / lin.channel_scales),
        "bias": None if lin.bias is None else np.asarray(lin.bias),
        "n_bits": lin.n_bits,
        "group_size": lin.group_size,
    }
