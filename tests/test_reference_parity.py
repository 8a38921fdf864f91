"""Bit-parity harness: our JAX math vs the reference's own torch math.

The reference's de-facto correctness bar is end-to-end metric reproduction on
real checkpoints (reference cli/evaluate.py:46-74).  This box has no network
and no cached HF weights, so the strongest available evidence is
tensor-for-tensor parity: run the reference package's *pure-torch* math
(importable without CUDA: optim/quant.py, optim/quantizer.py, optim/rotation.py,
optim/train.py) on identical inputs and require our JAX results to match.

Covered chains:
  1. scale/zero-point init          (reference quantizer.py:10-24)
  2. pseudo-quantize round trip     (reference quantizer.py:86-117)
  3. seeded random pair generation  (reference train.py:16-91)
  4. pair packing / kernel layout   (reference rotation.py:6-95)
  5. the full scale->rotate->quant->unrotate->unscale pseudo-quantization
     (reference qlinear.py:89-123), with the rotation re-implemented here in
     ~10 lines of torch from the documented 2x2 Givens semantics
     (reference rotation.cuh:146-160) since the CUDA op cannot load.
  6. hard INT quantization for export (reference cli/convert.py:158-191)

Exactness notes: chains 1-4 and 6 must match exactly (same f32 ops, same
order; torch and XLA both round-half-to-even).  Chain 5 goes through
transcendentals (cos/sin differ by ulps between torch and XLA) feeding a
rounding cliff, so a vanishing fraction of elements may legally land one
quantization step apart; the test asserts near-total exactness and that any
stragglers differ by at most one step.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

ref_quantizer = pytest.importorskip("paroquant.optim.quantizer")
ref_rotation = pytest.importorskip("paroquant.optim.rotation")
ref_train = pytest.importorskip("paroquant.optim.train")

import jax.numpy as jnp  # noqa: E402

from paroquant_tpu.ops import quant as q_ops  # noqa: E402
from paroquant_tpu.ops import rotation as rot_ops  # noqa: E402
from paroquant_tpu.optim import pseudo as pseudo_ops  # noqa: E402


# ---------------------------------------------------------------------------
# torch-side reference rotation, written from the Givens pair semantics
# (y_i = c*x_i + s*x_j ; y_j = -s*x_i + c*x_j, stages applied sequentially;
# inverse = stages reversed with negated angles).  NOT derived from the CUDA
# source text — only from the 2x2 math it implements.
# ---------------------------------------------------------------------------


def torch_rotate(x, pairs, theta, group_size, inverse=False):
    """x [M, H] f32; pairs int [K, H] local in-group; theta f32 [K, H//2]."""
    K, H = pairs.shape
    G = H // group_size
    y = x.clone().float()
    order = range(K - 1, -1, -1) if inverse else range(K)
    for r in order:
        th = theta[r].float()
        if inverse:
            th = -th
        p = pairs[r].reshape(G, group_size // 2, 2).long()
        for g in range(G):
            base = g * group_size
            i_idx = base + p[g, :, 0]
            j_idx = base + p[g, :, 1]
            th_g = th[g * (group_size // 2) : (g + 1) * (group_size // 2)]
            c, s = torch.cos(th_g), torch.sin(th_g)
            xi, xj = y[:, i_idx].clone(), y[:, j_idx].clone()
            y[:, i_idx] = c * xi + s * xj
            y[:, j_idx] = -s * xi + c * xj
    return y


def _random_packed_rotation(rng, H, group_size, K, frac=0.4):
    """A packed rotation (pairs/theta/mask) shared by both sides."""
    rotations = rot_ops.generate_random_pairs(H, group_size, K, seed=7,
                                              num_pairs_factor=frac)
    angles = [rng.standard_normal(len(r)).astype(np.float32) * 0.3
              for r in rotations]
    pairs, theta, mask = rot_ops.pack_pairs(rotations, H, group_size, angles)
    return pairs, theta, mask


# ---------------------------------------------------------------------------
# 1 + 2: quantizer parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,gs", [((64, 256), 128), ((33, 128), 64)])
def test_scale_zero_point_init_exact(shape, gs):
    rng = np.random.default_rng(0)
    w = rng.standard_normal(shape).astype(np.float32) * 2.5
    ref_s, ref_z = ref_quantizer._calc_scales_and_zero_points(
        torch.from_numpy(w), gs, 0, 15
    )
    ours = q_ops.calc_scales_and_zero_points(jnp.asarray(w), gs, 4)
    np.testing.assert_array_equal(np.asarray(ours.scale), ref_s.numpy())
    np.testing.assert_array_equal(
        np.asarray(ours.zero_point_float), ref_z.numpy()
    )


@pytest.mark.parametrize("learned", [False, True])
def test_pseudo_quantize_exact(learned):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((48, 256)).astype(np.float32) * 3.0
    tw = torch.from_numpy(w)
    if learned:
        # perturbed learnable scale/zp, as after stage-2 optimization
        s, z = ref_quantizer._calc_scales_and_zero_points(tw, 128, 0, 15)
        s = s * torch.from_numpy(
            1.0 + 0.05 * rng.standard_normal(s.shape).astype(np.float32)
        )
        z = z + torch.from_numpy(
            0.3 * rng.standard_normal(z.shape).astype(np.float32)
        )
        ref = ref_quantizer.UniformAffineQuantizer.pseudo_quantize(
            tw, 4, 128, s, z
        )
        params = q_ops.QuantizerParams(
            jnp.asarray(s.numpy()), jnp.asarray(z.numpy())
        )
        ours = q_ops.pseudo_quantize(jnp.asarray(w), 4, 128, params)
    else:
        ref = ref_quantizer.UniformAffineQuantizer.pseudo_quantize(tw, 4, 128)
        ours = q_ops.pseudo_quantize(jnp.asarray(w), 4, 128)
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


# ---------------------------------------------------------------------------
# 3: seeded pair generation parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 42])
@pytest.mark.parametrize("H,gs,K", [(256, 128, 8), (128, 64, 4)])
def test_random_pair_generation_exact(seed, H, gs, K):
    G = H // gs
    ref_pairs = ref_train.get_random_rotation_pairs(
        sensitivity_input=torch.zeros((G, 1)),
        group_size=gs,
        num_rotations=K,
        num_pairs_factor=0.5,
        seed=seed,
    )
    ours = rot_ops.generate_random_pairs(H, gs, K, seed, num_pairs_factor=0.5)
    assert len(ref_pairs) == len(ours) == K
    for r in range(K):
        assert [tuple(p) for p in ref_pairs[r]] == ours[r], f"rotation {r}"


# ---------------------------------------------------------------------------
# 4: packing / kernel-layout parity
# ---------------------------------------------------------------------------


def test_pack_layout_exact():
    H, gs, K = 256, 128, 8
    rng = np.random.default_rng(3)
    rotations = rot_ops.generate_random_pairs(H, gs, K, seed=0,
                                              num_pairs_factor=0.5)
    angles = [rng.standard_normal(len(r)).astype(np.float32)
              for r in rotations]
    ref_p, ref_a, ref_m = ref_rotation.transform_to_kernel_data(
        [torch.tensor(r, dtype=torch.int32) for r in rotations],
        [torch.from_numpy(a) for a in angles],
        group_size=gs,
    )
    p, a, m = rot_ops.pack_pairs(rotations, H, gs, angles)
    np.testing.assert_array_equal(p, ref_p.numpy().astype(np.int32))
    np.testing.assert_array_equal(a, ref_a.numpy())
    np.testing.assert_array_equal(m, ref_m.numpy().astype(bool))


# ---------------------------------------------------------------------------
# rotation application parity (our stages vs torch reference of the same math)
# ---------------------------------------------------------------------------


def test_rotation_apply_matches_torch():
    H, gs, K = 256, 128, 8
    rng = np.random.default_rng(4)
    pairs, theta, mask = _random_packed_rotation(rng, H, gs, K)
    theta = np.where(mask, 0.0, theta).astype(np.float32)
    x = rng.standard_normal((16, H)).astype(np.float32)

    ref_y = torch_rotate(
        torch.from_numpy(x), torch.from_numpy(pairs),
        torch.from_numpy(theta), gs,
    ).numpy()
    form = rot_ops.PermutationForm(
        *map(jnp.asarray, rot_ops.pairs_to_permutation(pairs, gs))
    )
    ours = np.asarray(
        rot_ops.apply_rotation_stages(jnp.asarray(x), jnp.asarray(theta), form)
    )
    np.testing.assert_allclose(ours, ref_y, rtol=0, atol=2e-6)

    # inverse round-trips through the torch reference too
    ref_back = torch_rotate(
        torch.from_numpy(ref_y), torch.from_numpy(pairs),
        torch.from_numpy(theta), gs, inverse=True,
    ).numpy()
    np.testing.assert_allclose(ref_back, x, rtol=0, atol=2e-5)


# ---------------------------------------------------------------------------
# 5: full pseudo-quantization chain (reference qlinear.py:89-123 order)
# ---------------------------------------------------------------------------


def test_full_pseudo_quantize_chain():
    H, gs, K, O = 256, 128, 8, 96
    rng = np.random.default_rng(5)
    pairs, theta, mask = _random_packed_rotation(rng, H, gs, K)
    theta = np.where(mask, 0.0, theta).astype(np.float32)
    w = rng.standard_normal((O, H)).astype(np.float32)
    ch_scales = (1.0 + 0.2 * rng.standard_normal(H)).astype(np.float32)

    # reference chain in torch: scale -> rotate -> quantize -> inv -> unscale
    tw = torch.from_numpy(w) * torch.from_numpy(ch_scales)
    tw = torch_rotate(tw, torch.from_numpy(pairs), torch.from_numpy(theta), gs)
    tw = ref_quantizer.UniformAffineQuantizer.pseudo_quantize(tw, 4, gs)
    tw = torch_rotate(tw, torch.from_numpy(pairs), torch.from_numpy(theta),
                      gs, inverse=True)
    ref_w_hat = (tw / torch.from_numpy(ch_scales).view(1, -1)).numpy()

    lin = pseudo_ops.make_pseudo_linear(
        w,
        rot_ops.RotationParams(
            jnp.asarray(pairs), jnp.asarray(theta), jnp.asarray(mask)
        ),
        channel_scales=ch_scales,
        n_bits=4,
        group_size=gs,
    )
    ours = np.asarray(pseudo_ops.pseudo_quantized_weight(lin))

    # transcendental-ulp tolerance: almost everything must match to float
    # noise; any stragglers must be exactly one quantization step apart.
    diff = np.abs(ours - ref_w_hat)
    close = diff < 1e-4
    frac_close = close.mean()
    assert frac_close > 0.999, f"only {frac_close:.6f} of elements match"
    if not close.all():
        # bound: one INT4 step of the largest group scale, unrotated+unscaled
        max_step = (
            np.abs(w).max() * (1 + np.abs(ch_scales).max()) / 15 * 4
        )
        assert diff[~close].max() <= max_step


# ---------------------------------------------------------------------------
# 6: hard INT quantization for export
# ---------------------------------------------------------------------------


def test_export_quantization_exact():
    """quantize_to_int must invert through dequantize_int and agree with the
    reference rounding math (cli/convert.py:158-191): q = clamp(round(w/s)+z)."""
    rng = np.random.default_rng(6)
    w = rng.standard_normal((32, 256)).astype(np.float32)
    tw = torch.from_numpy(w)
    s, z = ref_quantizer._calc_scales_and_zero_points(tw, 128, 0, 15)
    # reference hard-quantization math in torch
    rz = torch.clamp(-torch.round(z), 0, 15)
    q_ref = torch.clamp(torch.round(tw.reshape(-1, 128) / s) + rz, 0, 15)
    deq_ref = ((q_ref - rz) * s).reshape(32, 256).numpy()

    params = q_ops.QuantizerParams(jnp.asarray(s.numpy()), jnp.asarray(z.numpy()))
    q, scales, zeros = q_ops.quantize_to_int(jnp.asarray(w), params, 4, 128)
    np.testing.assert_array_equal(
        np.asarray(q).reshape(-1, 128), q_ref.numpy().astype(np.int32)
    )
    deq = q_ops.dequantize_int(q, scales, zeros, 128)
    np.testing.assert_array_equal(np.asarray(deq), deq_ref)
