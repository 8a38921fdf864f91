"""Pallas kernel equivalence tests (interpret mode on CPU).

Each kernel is checked against the pure-jnp reference math from ops/:
SURVEY.md §4 layer (2), "Pallas-kernel vs pure-jnp reference equivalence".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paroquant_tpu.kernels.rot_matmul import butterfly_w4_matmul, rot_w4_matmul, w4_matmul
from paroquant_tpu.ops import butterfly as bf, quant, rotation as R
from paroquant_tpu.ops.packing import pack_w4_tpu
from paroquant_tpu.ops.qlinear import make_quantized_linear, quantized_linear_forward

GS = 128


def _random_quant(O, I, seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    scales = rng.uniform(0.01, 0.05, size=(I // GS, O)).astype(np.float32)
    zeros = rng.integers(0, 16, size=(I // GS, O)).astype(np.float32)
    return q, scales, zeros


def _dequant(q, scales, zeros):
    I, O = q.shape
    qg = q.reshape(-1, GS, O).astype(np.float32)
    return ((qg - zeros[:, None, :]) * scales[:, None, :]).reshape(I, O)


@pytest.mark.parametrize("M", [1, 5, 48])
def test_w4_matmul_matches_reference(M):
    I, O = 256, 384
    q, scales, zeros = _random_quant(O, I, 0)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(M, I)).astype(np.float32))
    y = w4_matmul(x, qweight, jnp.asarray(scales), jnp.asarray(zeros), interpret=True)
    # kernel rounds the activation to bf16 before the MXU dot; mirror that
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    y_ref = xb @ _dequant(q, scales, zeros)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=5e-3, atol=5e-3)


def test_butterfly_tables_match_stage_apply():
    """The cos/sin table formulation reproduces generic stage application."""
    I, K = 256, 8
    params = bf.make_butterfly_params(I, GS, K)
    rng = np.random.default_rng(2)
    theta = rng.normal(0, 0.3, np.asarray(params.theta).shape).astype(np.float32)
    theta = np.where(np.asarray(params.mask), 0, theta)
    form = R.to_permutation_form(params, GS)
    x = jnp.asarray(rng.normal(size=(4, I)).astype(np.float32))
    y_ref = R.apply_rotation_stages(x, jnp.asarray(theta), form)

    cos_t, sin_t = bf.butterfly_tables(theta, GS)
    dists = bf.butterfly_distances(K, GS)
    y = np.asarray(x).copy().reshape(4, I // GS, GS)
    cos_g = cos_t.reshape(K, I // GS, GS)
    sin_g = sin_t.reshape(K, I // GS, GS)
    lane = np.arange(GS)
    for r, d in enumerate(dists):
        partner = np.where(
            (lane & d) != 0, np.roll(y, d, axis=-1), np.roll(y, -d, axis=-1)
        )
        y = cos_g[r][None] * y + sin_g[r][None] * partner
    np.testing.assert_allclose(y.reshape(4, I), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("M", [1, 33])
def test_butterfly_w4_matmul_matches_reference(M):
    I, O, K = 256, 256, 8
    params = bf.make_butterfly_params(I, GS, K)
    rng = np.random.default_rng(3)
    theta = np.where(
        np.asarray(params.mask), 0, rng.normal(0, 0.3, np.asarray(params.theta).shape)
    ).astype(np.float32)
    inv_s = rng.uniform(0.5, 2.0, I).astype(np.float32)
    q, scales, zeros = _random_quant(O, I, 4)
    form = R.to_permutation_form(params, GS)

    x = jnp.asarray(rng.normal(size=(M, I)).astype(np.float32))
    cos_t, sin_t = bf.butterfly_tables(theta, GS)
    y = butterfly_w4_matmul(
        x, jnp.asarray(inv_s), jnp.asarray(cos_t), jnp.asarray(sin_t),
        jnp.asarray(pack_w4_tpu(q, GS)), jnp.asarray(scales), jnp.asarray(zeros),
        interpret=True,
    )
    xr = R.apply_rotation_stages(x * inv_s, jnp.asarray(theta), form)
    xr = np.asarray(xr.astype(jnp.bfloat16).astype(jnp.float32))
    y_ref = xr @ _dequant(q, scales, zeros)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=5e-3, atol=2e-2)


@pytest.mark.parametrize("M", [1, 17])
def test_dense_rot_w4_matmul_matches_xla_path(M):
    """Fused dense-rotation kernel == the ops/qlinear XLA forward."""
    I, O, K = 256, 128, 4
    rng = np.random.default_rng(5)
    params = R.make_rotation_params(I, GS, K, seed=7)
    theta = np.where(
        np.asarray(params.mask), 0, rng.normal(0, 0.3, np.asarray(params.theta).shape)
    ).astype(np.float32)
    inv_s = rng.uniform(0.5, 2.0, I).astype(np.float32)
    q, scales, zeros = _random_quant(O, I, 6)
    layer = make_quantized_linear(
        q.T.copy(), scales.T.copy(), zeros.T.copy(), np.asarray(params.pairs),
        theta, inv_s, GS,
    )
    x = jnp.asarray(rng.normal(size=(M, I)).astype(np.float32))
    y_xla = quantized_linear_forward(layer, x, mode="xla")
    y_fused = rot_w4_matmul(
        x, layer.rot, layer.qweight, layer.scales, layer.zeros, interpret=True
    )
    # kernel rounds the rotated activation to bf16; XLA path stays f32 —
    # differences are bounded by bf16 rounding noise
    yf, yx = np.asarray(y_fused), np.asarray(y_xla)
    np.testing.assert_allclose(yf, yx, rtol=5e-3, atol=6e-2)
    assert np.linalg.norm(yf - yx) / np.linalg.norm(yx) < 0.01


def test_merged_projections_match_unmerged():
    """QKV/gate-up merging must be a pure layout change: merged forward ==
    per-projection forwards, in both xla and fused(interpret) modes."""
    import dataclasses

    from paroquant_tpu.convert.rtn import quantize_model_rtn
    from paroquant_tpu.kernels.rot_matmul import merged_rot_w4_matmul
    from paroquant_tpu.models import PRESETS, init_params, model_forward
    from paroquant_tpu.models.decoder import merge_projections
    from paroquant_tpu.ops.qlinear import merge_quantized_linears, merged_linear_forward

    cfg = PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, cfg, n_bits=4, group_size=64, seed=3)
    mparams = merge_projections(qparams, cfg)
    assert "qkv_proj" in mparams["layers"][0]
    assert "gate_up_proj" in mparams["layers"][0]["mlp"]

    toks = jnp.asarray(np.random.default_rng(6).integers(0, cfg.vocab_size, (2, 7)), jnp.int32)
    l_ref, _ = model_forward(qparams, cfg, toks)
    l_merged, _ = model_forward(mparams, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(l_merged), np.asarray(l_ref), rtol=2e-3, atol=2e-3
    )

    # fused kernel (interpret) matches the xla merged path — with REAL
    # (non-identity) per-partition rotations
    from paroquant_tpu.convert.rtn import quantize_linear_rtn

    lins = [
        quantize_linear_rtn(
            qp_dense, n_bits=4, group_size=64, random_rotation=True, seed=11 + i
        )
        for i, qp_dense in enumerate(
            [params["layers"][0][n] for n in ("q_proj", "k_proj", "v_proj")]
        )
    ]
    lp = merge_quantized_linears(lins)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(5, cfg.hidden_size)), jnp.float32)
    y_xla = merged_linear_forward(lp, x, mode="xla")
    y_fused = merged_rot_w4_matmul(
        x, lp.rot, lp.qweight, lp.scales, lp.zeros,
        out_splits=lp.out_splits, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_xla), rtol=5e-3, atol=5e-2
    )


@pytest.mark.parametrize("block_o", [128, 256])
def test_dense_rot_w4_matmul_column_blocked(block_o):
    """Forced O-blocking (incl. a non-dividing edge block at block_o=256,
    O=384) must match the unblocked kernel exactly: very wide layers (quantized
    lm_head) rely on this to fit the scoped VMEM budget."""
    I, O, K = 256, 384, 4
    rng = np.random.default_rng(8)
    params = R.make_rotation_params(I, GS, K, seed=9)
    theta = np.where(
        np.asarray(params.mask), 0, rng.normal(0, 0.3, np.asarray(params.theta).shape)
    ).astype(np.float32)
    inv_s = rng.uniform(0.5, 2.0, I).astype(np.float32)
    q, scales, zeros = _random_quant(O, I, 10)
    layer = make_quantized_linear(
        q.T.copy(), scales.T.copy(), zeros.T.copy(), np.asarray(params.pairs),
        theta, inv_s, GS,
    )
    x = jnp.asarray(rng.normal(size=(9, I)).astype(np.float32))
    y_full = rot_w4_matmul(
        x, layer.rot, layer.qweight, layer.scales, layer.zeros, interpret=True
    )
    y_blocked = rot_w4_matmul(
        x, layer.rot, layer.qweight, layer.scales, layer.zeros,
        block_o=block_o, interpret=True,
    )
    # interpret-mode CPU dots reorder reductions with tile width: tiny ulps
    np.testing.assert_allclose(
        np.asarray(y_blocked), np.asarray(y_full), rtol=1e-4, atol=1e-5
    )


def test_merged_rot_w4_matmul_column_blocked():
    """Blocked merged kernel (blocks straddling partition boundaries) must
    match the unblocked merged kernel exactly."""
    from paroquant_tpu.convert.rtn import quantize_linear_rtn
    from paroquant_tpu.kernels.rot_matmul import merged_rot_w4_matmul
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.ops.qlinear import merge_quantized_linears

    cfg = PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(12), dtype=jnp.float32)
    lins = [
        quantize_linear_rtn(
            params["layers"][0][n], n_bits=4, group_size=64,
            random_rotation=True, seed=21 + i,
        )
        for i, n in enumerate(("q_proj", "k_proj", "v_proj"))
    ]
    lp = merge_quantized_linears(lins)
    x = jnp.asarray(np.random.default_rng(13).normal(size=(5, cfg.hidden_size)), jnp.float32)
    y_full = merged_rot_w4_matmul(
        x, lp.rot, lp.qweight, lp.scales, lp.zeros,
        out_splits=lp.out_splits, interpret=True,
    )
    # 128-wide blocks cut across the q/k/v partition boundaries
    y_blocked = merged_rot_w4_matmul(
        x, lp.rot, lp.qweight, lp.scales, lp.zeros,
        out_splits=lp.out_splits, block_o=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_blocked), np.asarray(y_full), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# W4A8: int8-MXU activation-quantized variants (quant_mode="w4a8").
# The xla _a8_sim path is the reference; the kernels' dot is integer-exact,
# so kernel-vs-sim differences are bounded by bf16 rotation rounding shifting
# an occasional activation across an int8 rounding boundary.
# ---------------------------------------------------------------------------


def _a8_layer(M, I, O, seed, K=4):
    rng = np.random.default_rng(seed)
    params = R.make_rotation_params(I, GS, K, seed=seed + 1)
    theta = np.where(
        np.asarray(params.mask), 0, rng.normal(0, 0.3, np.asarray(params.theta).shape)
    ).astype(np.float32)
    inv_s = rng.uniform(0.5, 2.0, I).astype(np.float32)
    q, scales, zeros = _random_quant(O, I, seed + 2)
    layer = make_quantized_linear(
        q.T.copy(), scales.T.copy(), zeros.T.copy(), np.asarray(params.pairs),
        theta, inv_s, GS,
    )
    x = jnp.asarray(rng.normal(size=(M, I)).astype(np.float32))
    return layer, x


@pytest.mark.parametrize("M", [1, 17])
def test_dense_rot_w4a8_matches_sim(M):
    """Fused a8 kernel == the _a8_sim XLA forward (same int8 quantizer)."""
    layer, x = _a8_layer(M, 256, 128, seed=30)
    y_sim = quantized_linear_forward(layer, x, mode="w4a8_xla")
    y_a8 = rot_w4_matmul(
        x, layer.rot, layer.qweight, layer.scales, layer.zeros,
        interpret=True, a8=True,
    )
    ya, ys = np.asarray(y_a8), np.asarray(y_sim)
    assert np.linalg.norm(ya - ys) / np.linalg.norm(ys) < 0.01


@pytest.mark.parametrize("M", [1, 17])
def test_dense_rot_w4a8_error_bounded_vs_exact(M):
    """a8 changes numerics only by int8 activation rounding: small, nonzero."""
    layer, x = _a8_layer(M, 256, 128, seed=31)
    y_exact = quantized_linear_forward(layer, x, mode="xla")
    y_a8 = rot_w4_matmul(
        x, layer.rot, layer.qweight, layer.scales, layer.zeros,
        interpret=True, a8=True,
    )
    ya, ye = np.asarray(y_a8), np.asarray(y_exact)
    rel = np.linalg.norm(ya - ye) / np.linalg.norm(ye)
    assert rel < 0.02, rel


def test_merged_w4a8_matches_sim():
    """Merged a8 kernel (unblocked AND column-blocked branches) == merged
    _a8_sim forward per partition."""
    from paroquant_tpu.convert.rtn import quantize_linear_rtn
    from paroquant_tpu.kernels.rot_matmul import merged_rot_w4_matmul
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.ops.qlinear import _merged_forward_xla, merge_quantized_linears

    cfg = PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(14), dtype=jnp.float32)
    lins = [
        quantize_linear_rtn(
            params["layers"][0][n], n_bits=4, group_size=64,
            random_rotation=True, seed=41 + i,
        )
        for i, n in enumerate(("q_proj", "k_proj", "v_proj"))
    ]
    lp = merge_quantized_linears(lins)
    x = jnp.asarray(
        np.random.default_rng(15).normal(size=(3, cfg.hidden_size)), jnp.float32
    )
    y_sim = np.asarray(_merged_forward_xla(lp, x, a8=True))
    for block_o in (None, 128):  # unblocked + partition-straddling blocks
        y_a8 = np.asarray(
            merged_rot_w4_matmul(
                x, lp.rot, lp.qweight, lp.scales, lp.zeros,
                out_splits=lp.out_splits, block_o=block_o, interpret=True, a8=True,
            )
        )
        assert np.linalg.norm(y_a8 - y_sim) / np.linalg.norm(y_sim) < 0.01, block_o


def test_w4a8_mode_resolution():
    """"w4a8" resolves to the sim path at decode M on CPU and exact xla at
    prefill M (mirrors the TPU fused/xla crossover)."""
    from paroquant_tpu.ops.qlinear import AUTO_FUSED_MAX_M, _resolve_auto

    layer, x_small = _a8_layer(1, 256, 128, seed=32)
    assert _resolve_auto("w4a8", x_small, layer) == "w4a8_xla"
    x_big = jnp.zeros((AUTO_FUSED_MAX_M + 1, 256), jnp.float32)
    assert _resolve_auto("w4a8", x_big, layer) == "xla"
    # generation path smoke: the public forward accepts the mode string
    y = quantized_linear_forward(layer, x_small, mode="w4a8")
    assert np.isfinite(np.asarray(y)).all()


def test_auto_mode_w4a8_geometry_crossover():
    """auto serves the measured-best mode per matrix geometry (VERDICT r4
    item 3): a8 decode for >=7B-class weight matrices (K*N >= 8M, where
    w4a8 measured +8.2% at B=1), exact W4A16 below (0.6B measured 628 vs
    600 tok/s). Prefill M keeps exact W4A16 at any geometry."""
    from types import SimpleNamespace

    from paroquant_tpu.ops.qlinear import (
        AUTO_FUSED_MAX_M,
        AUTO_W4A8_MIN_KN,
        _resolve_auto,
    )

    def fake(k, n, s=128):
        return SimpleNamespace(scales=np.zeros((k // s, n), np.float32),
                               group_size=s)

    from paroquant_tpu.ops.qlinear import AUTO_W4A8_MAX_M

    big = fake(4096, 4096)      # 16.8M — 7B o_proj, smallest 7B matrix
    small = fake(1024, 6144)    # 6.3M — 0.6B merged gate_up, largest 0.6B
    assert 4096 * 4096 >= AUTO_W4A8_MIN_KN > 1024 * 6144
    x1 = jnp.zeros((1, 4096), jnp.float32)
    # decode M, big geometry -> a8 (w4a8_xla on CPU: same rounding as the
    # TPU fused kernel via _a8_sim — served numerics identical off-chip)
    assert _resolve_auto("auto", x1, big) == "w4a8_xla"
    # decode M, small geometry -> exact W4A16
    assert _resolve_auto("auto", jnp.zeros((1, 1024), jnp.float32),
                         small) == "xla"
    # batched decode ABOVE the measured a8 ceiling (M=32 lost -1.9% on
    # silicon) -> exact W4A16 even at big geometry
    xm = jnp.zeros((AUTO_W4A8_MAX_M * 2, 4096), jnp.float32)
    assert _resolve_auto("auto", xm, big) == "xla"
    # prefill M -> exact W4A16 regardless of geometry
    xp = jnp.zeros((AUTO_FUSED_MAX_M + 1, 4096), jnp.float32)
    assert _resolve_auto("auto", xp, big) == "xla"
