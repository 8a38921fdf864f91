"""Pairwise (Givens) rotation math, TPU-first.

The reference applies K sequences of independent in-group Givens rotations with
a thread-per-pair CUDA kernel (/root/reference/paroquant/kernels/cuda/rotation.cu,
rotation.cuh:91-173) and an analytic autograd backward (cuda/autograd.py:19-61).

On TPU we exploit a structural fact instead: each 128-channel group's K-stage
rotation composes into ONE dense 128x128 orthogonal matrix, and group_size ==
the TPU lane width, so applying the rotation is a batched (G, 128, 128) matmul
that the MXU executes natively. Two formulations coexist:

1. `apply_rotation_stages` — per-stage permutation+cos/sin formulation.
   Differentiable w.r.t. theta via plain JAX autodiff (no custom VJP needed),
   numerically identical to the reference kernel's math. Used by the
   calibration optimizer.
2. `build_rotation_matrices` + `apply_rotation_matrices` — the dense composed
   form for inference: built once at weight-load time, applied as an einsum
   (or fused into the Pallas dequant-matmul kernel).

Data layout (interchange format, matches the reference checkpoint schema,
cli/convert.py:268-273):
  pairs  int32 [K, H]    group-major, entries [g*S:(g+1)*S] hold S/2 local
                         (i, j) pairs of group g, values in [0, S)
  theta  f32   [K, H/2]  one angle per pair
  mask   bool  [K, H/2]  True for dummy (identity-padding) pairs

The pair-independence invariant (within one stage no two pairs share a
channel; enforced at pack time by `pack_pairs`, mirroring reference
optim/rotation.py:33-34) is what makes every formulation race-free and
permutation-representable by construction.
"""

from __future__ import annotations

import random
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RotationParams(NamedTuple):
    """Compact rotation parameterization (one linear layer's input dim)."""

    pairs: jax.Array  # int32 [K, H], local in-group indices
    theta: jax.Array  # float32 [K, H//2]
    mask: jax.Array  # bool [K, H//2]; True = dummy pair (angle pinned to 0)

    @property
    def num_rotations(self) -> int:
        return self.pairs.shape[0]

    @property
    def in_features(self) -> int:
        return self.pairs.shape[1]


# ---------------------------------------------------------------------------
# Pair generation and packing (host-side, numpy)
# ---------------------------------------------------------------------------


def generate_random_pairs(
    in_features: int,
    group_size: int,
    num_rotations: int,
    seed: int,
    num_pairs_factor: float = 0.5,
) -> list[list[tuple[int, int]]]:
    """Seeded random independent pair selection.

    Same scheme as the reference (optim/train.py:56-91): per group, shuffle all
    C(S, 2) unordered pairs with one shared random.Random(seed) stream, then
    greedily pick `int(S * num_pairs_factor)` pairs per rotation such that
    within a rotation no channel repeats and across rotations no pair repeats.
    Returns K lists of global (i, j) pairs.
    """
    assert in_features % group_size == 0
    num_groups = in_features // group_size
    num_pairs_each = int(group_size * num_pairs_factor)
    rand = random.Random(seed)

    per_group_shuffled: list[list[tuple[int, int]]] = []
    for _ in range(num_groups):
        all_pairs = [
            (i, j) for i in range(group_size) for j in range(i + 1, group_size)
        ]
        rand.shuffle(all_pairs)
        per_group_shuffled.append(all_pairs)

    rotations: list[list[tuple[int, int]]] = [[] for _ in range(num_rotations)]
    for g in range(num_groups):
        offset = g * group_size
        used_pairs: set[tuple[int, int]] = set()
        for r in range(num_rotations):
            used_channels: set[int] = set()
            selected: list[tuple[int, int]] = []
            for i, j in per_group_shuffled[g]:
                if len(selected) == num_pairs_each:
                    break
                if (i, j) in used_pairs or i in used_channels or j in used_channels:
                    continue
                selected.append((i, j))
                used_channels.update((i, j))
                used_pairs.add((i, j))
            rotations[r].extend((i + offset, j + offset) for i, j in selected)
    return rotations


def pack_pairs(
    rotations: list[list[tuple[int, int]]],
    in_features: int,
    group_size: int,
    angles: list[np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-rotation global pair lists into the [K, H] kernel layout.

    Validates the independence invariant and pads each group to exactly S/2
    pairs with dummy identity pairs (theta=0, mask=True), like the reference's
    `_align_shape` (optim/rotation.py:6-66) but vectorized per group.

    Returns (pairs int32 [K, H], theta float32 [K, H//2], mask bool [K, H//2]).
    """
    assert in_features % group_size == 0
    num_groups = in_features // group_size
    half = group_size // 2
    K = len(rotations)
    pairs_out = np.zeros((K, in_features), dtype=np.int32)
    theta_out = np.zeros((K, in_features // 2), dtype=np.float32)
    mask_out = np.zeros((K, in_features // 2), dtype=bool)

    for r, pair_list in enumerate(rotations):
        ang = angles[r] if angles is not None else np.zeros(len(pair_list), np.float32)
        assert len(ang) == len(pair_list), (len(ang), len(pair_list))
        per_group: list[list[tuple[int, int, float]]] = [[] for _ in range(num_groups)]
        for (i, j), a in zip(pair_list, ang):
            gi, gj = i // group_size, j // group_size
            if gi != gj:
                raise ValueError(f"pair ({i},{j}) crosses a group boundary")
            per_group[gi].append((i % group_size, j % group_size, float(a)))
        for g in range(num_groups):
            taken = np.zeros(group_size, dtype=bool)
            slot = 0
            for i, j, a in per_group[g]:
                if taken[i] or taken[j]:
                    raise ValueError(f"illegal pair: channel reuse in rotation {r} group {g}")
                if slot >= half:
                    raise ValueError(f"too many pairs in rotation {r} group {g}")
                taken[[i, j]] = True
                pairs_out[r, g * group_size + 2 * slot] = i
                pairs_out[r, g * group_size + 2 * slot + 1] = j
                theta_out[r, g * half + slot] = a
                slot += 1
            free = np.flatnonzero(~taken)
            for k in range(0, len(free), 2):
                pairs_out[r, g * group_size + 2 * slot] = free[k]
                pairs_out[r, g * group_size + 2 * slot + 1] = free[k + 1]
                mask_out[r, g * half + slot] = True
                slot += 1
            assert slot == half
    return pairs_out, theta_out, mask_out


def make_rotation_params(
    in_features: int,
    group_size: int,
    num_rotations: int,
    seed: int,
    num_pairs_factor: float = 0.5,
) -> RotationParams:
    """Random independent pairs packed into RotationParams (theta = 0)."""
    rotations = generate_random_pairs(
        in_features, group_size, num_rotations, seed, num_pairs_factor
    )
    pairs, theta, mask = pack_pairs(rotations, in_features, group_size)
    return RotationParams(
        pairs=jnp.asarray(pairs), theta=jnp.asarray(theta), mask=jnp.asarray(mask)
    )


# ---------------------------------------------------------------------------
# Permutation-form derivation (static, host-side given static pairs)
# ---------------------------------------------------------------------------


def pairs_to_permutation(pairs: np.ndarray, group_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Derive the per-stage channel-wise view of the pair table.

    For stage r and *global* channel c, let (i, j) be c's pair. Returns:
      perm      int32 [K, H] global index of c's partner
      sign      float32 [K, H] +1 if c is the first element (i), -1 if second (j)
      theta_idx int32 [K, H] index into theta[r] ([K, H//2]) of c's angle

    so that  y[c] = cos(th[c]) * x[c] + sign[c] * sin(th[c]) * x[perm[c]]
    reproduces the reference 2x2 rotation (rotation.cuh:146-169):
      y_i = c*x_i + s*x_j ;  y_j = -s*x_i + c*x_j.
    """
    K, H = pairs.shape
    num_groups = H // group_size
    half = group_size // 2
    perm = np.zeros((K, H), dtype=np.int32)
    sign = np.zeros((K, H), dtype=np.float32)
    theta_idx = np.zeros((K, H), dtype=np.int32)
    for r in range(K):
        p = pairs[r].reshape(num_groups, half, 2)
        for g in range(num_groups):
            base = g * group_size
            for s in range(half):
                i, j = int(p[g, s, 0]), int(p[g, s, 1])
                perm[r, base + i] = base + j
                perm[r, base + j] = base + i
                sign[r, base + i] = 1.0
                sign[r, base + j] = -1.0
                theta_idx[r, base + i] = g * half + s
                theta_idx[r, base + j] = g * half + s
    return perm, sign, theta_idx


class PermutationForm(NamedTuple):
    """Stage-wise permutation representation (all [K, H])."""

    perm: jax.Array  # int32, partner channel (global)
    sign: jax.Array  # float32, +1 / -1
    theta_idx: jax.Array  # int32, per-channel index into theta[r]


def to_permutation_form(params: RotationParams, group_size: int) -> PermutationForm:
    perm, sign, theta_idx = pairs_to_permutation(np.asarray(params.pairs), group_size)
    return PermutationForm(jnp.asarray(perm), jnp.asarray(sign), jnp.asarray(theta_idx))


# ---------------------------------------------------------------------------
# Differentiable application (calibration path)
# ---------------------------------------------------------------------------


def effective_theta(params: RotationParams) -> jax.Array:
    """theta with dummy-pair angles pinned to zero.

    The reference re-zeroes dummy angles after every optimizer step
    (qlinear.py:224-226); masking inside the forward achieves the same
    invariant while keeping the step fully functional.
    """
    return jnp.where(params.mask, 0.0, params.theta)


def apply_rotation_stages(
    x: jax.Array,
    theta: jax.Array,
    form: PermutationForm,
    *,
    inverse: bool = False,
) -> jax.Array:
    """Apply K Givens stages to the last dim of x. Differentiable in theta.

    x: [..., H] (any float dtype; math in float32 like the reference kernel's
    fp32 register math, rotation.cuh:146-160). theta: [K, H//2] float32.
    `inverse=True` applies the transposed rotation (stages reversed, angles
    negated — reference qlinear.py:107-117).
    """
    K = theta.shape[0]
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    order = range(K - 1, -1, -1) if inverse else range(K)
    for r in order:
        th_ch = theta[r][form.theta_idx[r]]  # [H]
        if inverse:
            th_ch = -th_ch
        c = jnp.cos(th_ch)
        s = jnp.sin(th_ch) * form.sign[r]
        y = c * y + s * jnp.take(y, form.perm[r], axis=-1)
    return y.astype(orig_dtype)


def scaled_pairwise_rotation(
    x: jax.Array,
    theta: jax.Array,
    form: PermutationForm,
    channel_scales: jax.Array | None = None,
) -> jax.Array:
    """scale-then-rotate, the reference op `torch.ops.rotation.rotate`
    (rotation.cu:128-135): y = R @ (x * scales) rowwise."""
    if channel_scales is not None:
        x = x * channel_scales.astype(x.dtype)
    return apply_rotation_stages(x, theta, form)


# ---------------------------------------------------------------------------
# Dense composed form (inference path)
# ---------------------------------------------------------------------------


def build_rotation_matrices(
    theta: jax.Array,
    form: PermutationForm,
    group_size: int,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Compose the K Givens stages into dense per-group matrices.

    Returns R [G, S, S] with y_group = R_g @ x_group, i.e.
    R = S_{K-1} @ ... @ S_0. Cost: K*G 128x128 matmuls — negligible, done once
    at load time (or per optimizer step if desired; still tiny).
    """
    K, H = form.perm.shape
    G = H // group_size
    eye = jnp.eye(group_size, dtype=jnp.float32)
    R = jnp.broadcast_to(eye, (G, group_size, group_size))
    local_perm_all = (form.perm % group_size).reshape(K, G, group_size)
    for r in range(K):
        th_ch = theta[r][form.theta_idx[r]]  # [H]
        c = jnp.cos(th_ch).reshape(G, group_size)
        s = (jnp.sin(th_ch) * form.sign[r]).reshape(G, group_size)
        local_perm = local_perm_all[r]
        onehot = jax.nn.one_hot(local_perm, group_size, dtype=jnp.float32)  # [G, S, S]
        stage = c[..., None] * jnp.broadcast_to(eye, (G, group_size, group_size)) + s[..., None] * onehot
        R = jnp.einsum("gij,gjk->gik", stage, R, preferred_element_type=jnp.float32)
    return R.astype(dtype)


def apply_rotation_matrices(
    x: jax.Array, rot: jax.Array, *, inverse: bool = False
) -> jax.Array:
    """y[..., g*S+i] = sum_j rot[g, i, j] * x[..., g*S+j] (einsum on MXU)."""
    G, S, _ = rot.shape
    shape = x.shape
    xg = x.reshape(*shape[:-1], G, S)
    eq = "gji,...gj->...gi" if inverse else "gij,...gj->...gi"
    y = jnp.einsum(eq, rot, xg.astype(rot.dtype), preferred_element_type=jnp.float32)
    return y.reshape(shape).astype(x.dtype)
