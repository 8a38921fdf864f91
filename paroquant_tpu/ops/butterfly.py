"""Butterfly pair structure: the TPU-native rotation pairing.

The reference selects random independent pairs per stage (optim/train.py:56-91)
because arbitrary pairings are free on a thread-per-pair CUDA kernel. On TPU,
arbitrary in-group permutations are expensive (lane gathers), but *butterfly*
pairings — stage r pairs lane l with l XOR 2^r — are a circular roll within the
128-lane group, which the VPU executes natively (pltpu.roll). K=7 butterfly
stages fully mix a 128-channel group (each output depends on every input, the
same connectivity argument as Hadamard/butterfly orthogonal factorizations);
K=8 repeats distance 1 for a final adjacent-pair stage.

Butterfly pairs are expressed in the standard pairs/theta/mask format, so every
generic code path (stage apply, dense matrices, checkpoints, calibration)
works on them unchanged — only the Pallas kernel special-cases them for speed.
"""

from __future__ import annotations

import numpy as np

from .rotation import RotationParams, pack_pairs

import jax.numpy as jnp


def butterfly_distances(num_rotations: int, group_size: int) -> list[int]:
    """Stage partner distances: 1, 2, 4, ... wrapping back to 1."""
    n_pow = max(int(np.log2(group_size)), 1)
    return [2 ** (r % n_pow) for r in range(num_rotations)]


def make_butterfly_params(
    in_features: int, group_size: int, num_rotations: int
) -> RotationParams:
    """Butterfly pairs packed into RotationParams (theta = 0)."""
    assert group_size & (group_size - 1) == 0, "butterfly needs power-of-2 group"
    num_groups = in_features // group_size
    dists = butterfly_distances(num_rotations, group_size)
    rotations: list[list[tuple[int, int]]] = []
    for d in dists:
        stage = []
        for g in range(num_groups):
            base = g * group_size
            for l in range(group_size):
                if l & d == 0 and (l ^ d) < group_size:
                    stage.append((base + l, base + (l ^ d)))
        rotations.append(stage)
    pairs, theta, mask = pack_pairs(rotations, in_features, group_size)
    return RotationParams(jnp.asarray(pairs), jnp.asarray(theta), jnp.asarray(mask))


def is_butterfly_pairs(pairs: np.ndarray, group_size: int) -> bool:
    """True if `pairs` [K, H] matches the butterfly structure exactly."""
    pairs = np.asarray(pairs)
    K, H = pairs.shape
    ref = np.asarray(make_butterfly_params(H, group_size, K).pairs)
    return bool((pairs == ref).all())


def butterfly_tables(
    theta: np.ndarray, group_size: int, num_rotations: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel cos / signed-sin tables for the Pallas kernel.

    theta [K, H//2] (angles in butterfly pack order: for stage distance d,
    the pair slot order produced by make_butterfly_params/pack_pairs).
    Returns cos_ch [K, H], sin_signed_ch [K, H] float32 where for channel l
    with partner p = l ^ d:
      y[l] = cos_ch[l] * x[l] + sin_signed_ch[l] * x[p]
    with sin sign +1 when bit d is clear (first pair element), -1 when set.
    """
    theta = np.asarray(theta, np.float32)
    K, half_h = theta.shape
    H = half_h * 2
    params = make_butterfly_params(H, group_size, K)
    from .rotation import pairs_to_permutation

    _, sign, theta_idx = pairs_to_permutation(np.asarray(params.pairs), group_size)
    theta_ch = theta[np.arange(K)[:, None], theta_idx]  # [K, H]
    return (
        np.cos(theta_ch).astype(np.float32),
        (np.sin(theta_ch) * sign).astype(np.float32),
    )
