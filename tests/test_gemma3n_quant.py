"""gemma3n through the quantized runtime: RTN swap, merged projections,
checkpoint round-trip (save -> load -> identical logits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paroquant_tpu.convert import quantize_model_rtn
from paroquant_tpu.convert.checkpoint import load_checkpoint, save_paro_checkpoint
from paroquant_tpu.models import PRESETS, KVCache, init_params, model_forward
from paroquant_tpu.models.decoder import merge_projections
from paroquant_tpu.ops.qlinear import QuantizedLinear

CFG = PRESETS["tiny-gemma3n"]


@pytest.fixture(scope="module")
def dense_params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def qparams(dense_params):
    return quantize_model_rtn(dense_params, CFG, n_bits=4, group_size=64,
                              num_rotations=4)


def test_gemma3n_rtn_quantized_forward_tracks_dense(dense_params, qparams):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size_per_layer_input, (2, 12)), jnp.int32)
    ld, _ = model_forward(dense_params, CFG, ids)
    lq, _ = model_forward(qparams, CFG, ids)
    # W4 random-rotation RTN on a random tiny net: per-linear error is
    # 10-15% (see .claude/skills/verify) and compounds through altup/laurel,
    # so this is a plumbing check (correlated, finite), not an accuracy bar
    corr = np.corrcoef(np.asarray(ld).ravel(), np.asarray(lq).ravel())[0, 1]
    assert np.isfinite(np.asarray(lq)).all()
    assert corr > 0.7, corr
    assert all(
        isinstance(lp["q_proj"], QuantizedLinear) for lp in qparams["layers"]
    )


def test_gemma3n_merged_projections_match_unmerged(qparams):
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size_per_layer_input, (1, 9)), jnp.int32)
    base, _ = model_forward(qparams, CFG, ids)
    merged = merge_projections(qparams, CFG)
    # shared-KV tail layers keep their unmerged q_proj (k/v are never used)
    for li, lp in enumerate(merged["layers"]):
        if CFG.kv_share_source(li) is not None:
            assert "qkv_proj" not in lp and "q_proj" in lp
        else:
            assert "qkv_proj" in lp
        assert "gate_up_proj" in lp["mlp"]
    got, _ = model_forward(merged, CFG, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=2e-4, atol=2e-4)


def test_gemma3n_checkpoint_round_trip(tmp_path, dense_params):
    save_paro_checkpoint(tmp_path / "m", dense_params, CFG, layer_exports=[])
    loaded, config = load_checkpoint(tmp_path / "m", dtype=jnp.float32)
    assert config.is_gemma3n
    assert config.num_kv_shared_layers == CFG.num_kv_shared_layers
    assert config.activation_sparsity == CFG.activation_sparsity
    assert config.layer_types == CFG.layer_types
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size_per_layer_input, (1, 8)), jnp.int32)
    base, _ = model_forward(dense_params, CFG, ids)
    got, _ = model_forward(loaded, config, ids)
    # f16 serialization rounding only
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=5e-3, atol=5e-3)


def test_gemma3n_decode_with_cache_matches_prefill(qparams):
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size_per_layer_input, (1, 10)).astype(np.int32)
    full, _ = model_forward(qparams, CFG, jnp.asarray(ids))
    cache = KVCache.create(CFG, 1, 16, jnp.float32)
    logits, cache = model_forward(qparams, CFG, jnp.asarray(ids[:, :6]), cache)
    for t in range(6, 10):
        logits, cache = model_forward(qparams, CFG, jnp.asarray(ids[:, t:t+1]), cache)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(full[:, -1]), rtol=2e-3, atol=2e-3
    )


def test_gemma3n_flash_prefill_matches_einsum(dense_params, monkeypatch):
    """gemma3n prefill through the Pallas flash kernel (interpret mode on
    CPU) must match the einsum attention path: sliding windows and the
    shared-KV tail both flow through flash_attention."""
    import functools

    import paroquant_tpu.kernels.attention as ka

    orig = ka.flash_attention
    monkeypatch.setattr(
        ka, "flash_attention", functools.partial(orig, interpret=True)
    )
    rng = np.random.default_rng(5)
    ids = jnp.asarray(
        rng.integers(0, CFG.vocab_size_per_layer_input, (1, 128)), jnp.int32
    )
    ref, _ = model_forward(dense_params, CFG, ids, attn_mode="einsum")
    got, _ = model_forward(dense_params, CFG, ids, attn_mode="flash")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_gemma3n_calibration_smoke(dense_params):
    """Layer-wise calibration runs over the AltUp-stacked layer I/O, trains
    the shared-KV tail against the quantized source layers' (k, v), and
    leaves the tail's unused k/v projections dense."""
    from paroquant_tpu.models.decoder import DenseLinear
    from paroquant_tpu.optim import CalibConfig, calibrate_model

    rng = np.random.default_rng(4)
    tokens = rng.integers(
        0, CFG.vocab_size_per_layer_input, (2, 2, 8)
    ).astype(np.int32)
    ccfg = CalibConfig(
        n_bits=4, group_size=64, num_rotations=2,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 1),),
    )
    qparams, results = calibrate_model(dense_params, CFG, tokens, ccfg)
    assert len(results) == CFG.num_hidden_layers
    for li, lp in enumerate(qparams["layers"]):
        assert isinstance(lp["q_proj"], QuantizedLinear)
        assert isinstance(lp["mlp"]["down_proj"], QuantizedLinear)
        if CFG.kv_share_source(li) is not None:
            assert isinstance(lp["k_proj"], DenseLinear)  # unused -> skipped
            assert "k_proj" not in results[li]
        else:
            assert isinstance(lp["k_proj"], QuantizedLinear)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size_per_layer_input, (1, 6)), jnp.int32)
    logits, _ = model_forward(qparams, CFG, ids)
    assert np.isfinite(np.asarray(logits)).all()
