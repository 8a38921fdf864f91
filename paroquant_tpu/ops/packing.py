"""INT4 weight packing layouts.

Two layouts:

1. **PARO-TPU layout** (ours, runtime): `qweight` uint8 [I//2, O]. Within each
   128-channel input group, channel k (k < 64) shares a byte with channel
   k + 64: low nibble = q[g*128 + k], high nibble = q[g*128 + 64 + k].
   Rationale: unpacking a group block [64, O_tile] yields the group's rows as
   two *contiguous* sublane halves (no interleave), the same half-offset trick
   the reference CUDA kernel uses for its shared-memory tile
   (rotation.cuh:20-21 base0/base1 = t, t + GROUP_SIZE/2). Packing never
   crosses a 128-group, so TP sharding along the input dim stays clean.

2. **AWQ layout** (interchange): int32 [I, O//8], 8 nibbles along the output
   dim with the reorder (0, 2, 4, 6, 1, 3, 5, 7) — reference cli/convert.py:19,
   149-155, undone by the MLX loader (backends/mlx/load.py:21-54). Supported so
   published z-lab/*-PARO checkpoints load without re-calibration.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

AWQ_REORDER = (0, 2, 4, 6, 1, 3, 5, 7)


# ---------------------------------------------------------------------------
# PARO-TPU layout
# ---------------------------------------------------------------------------


_NATIVE_MIN_BYTES = 1 << 20  # use the C++ path for >=1MB tensors


def pack_w4_tpu(q: np.ndarray | jax.Array, group_size: int = 128) -> np.ndarray:
    """q int [I, O] in [0,16) -> uint8 [I//2, O] (group-aligned half-split)."""
    q = np.asarray(q)
    if q.nbytes >= _NATIVE_MIN_BYTES:
        from .native_packing import pack_w4_tpu_native

        out = pack_w4_tpu_native(q, group_size)
        if out is not None:
            return out
    I, O = q.shape
    assert I % group_size == 0, (I, group_size)
    half = group_size // 2
    qg = q.reshape(I // group_size, group_size, O).astype(np.uint8)
    lo = qg[:, :half, :]
    hi = qg[:, half:, :]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return packed.reshape(I // 2, O)


def pack_wq_tpu(q: np.ndarray | jax.Array, n_bits: int, group_size: int = 128) -> np.ndarray:
    """Bits-dispatching pack: 4-bit nibble-packed, 8-bit stored as uint8."""
    if n_bits == 4:
        return pack_w4_tpu(q, group_size)
    if n_bits == 8:
        return np.asarray(q, dtype=np.uint8)
    raise ValueError(f"unsupported n_bits={n_bits} (4 or 8)")


def unpack_wq_tpu(packed: jax.Array, in_features: int, group_size: int = 128) -> jax.Array:
    """Inverse of pack_wq_tpu; bit width inferred from the packed row count."""
    if packed.shape[0] == in_features:
        return packed.astype(jnp.int32)
    assert packed.shape[0] * 2 == in_features, (packed.shape, in_features)
    return unpack_w4_tpu(packed, group_size)


def unpack_w4_tpu(packed: jax.Array, group_size: int = 128) -> jax.Array:
    """uint8 [I//2, O] -> int32 [I, O] (jnp; used by the non-Pallas fallback)."""
    Ih, O = packed.shape
    half = group_size // 2
    G = Ih // half
    p = packed.reshape(G, half, O).astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=1).reshape(Ih * 2, O)


# ---------------------------------------------------------------------------
# AWQ layout (interchange with reference checkpoints)
# ---------------------------------------------------------------------------


def pack_awq(values: np.ndarray, bits: int = 4) -> np.ndarray:
    """int [R, C] -> int32 [R, C//8] with the AWQ nibble reorder."""
    if bits == 4:
        v = np.asarray(values)
        if v.nbytes >= _NATIVE_MIN_BYTES:
            from .native_packing import pack_awq_native

            out = pack_awq_native(v)
            if out is not None:
                return out
    pack_factor = 32 // bits
    values = np.asarray(values, dtype=np.int64)
    R = values.shape[0]
    reordered = values.reshape(R, -1, pack_factor)[:, :, list(AWQ_REORDER)]
    packed = np.zeros((R, reordered.shape[1]), dtype=np.int64)
    for i in range(pack_factor):
        packed |= (reordered[:, :, i] & 0xF) << (bits * i)
    return packed.astype(np.uint32).view(np.int32)


def unpack_awq(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """int32 [R, C//8] -> int32 [R, C], undoing the nibble reorder."""
    if bits == 4:
        pk = np.asarray(packed)
        if pk.nbytes >= _NATIVE_MIN_BYTES // 8:
            from .native_packing import unpack_awq_native

            out = unpack_awq_native(pk)
            if out is not None:
                return out
    pack_factor = 32 // bits
    p = np.asarray(packed).view(np.uint32).astype(np.int64)
    R, Cp = p.shape
    out = np.zeros((R, Cp, pack_factor), dtype=np.int32)
    for i in range(pack_factor):
        out[:, :, AWQ_REORDER[i]] = ((p >> (bits * i)) & 0xF).astype(np.int32)
    return out.reshape(R, Cp * pack_factor)
