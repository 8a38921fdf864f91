"""Calibration optimizer tests.

The load-bearing check: learned rotations+scales must REDUCE quantization
error versus plain RTN — on a weight with outlier channels (the regime the
scheme targets), both at the single-linear level and end-to-end through
calibrate_model on a tiny decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.models import PRESETS, init_params, model_forward
from paroquant_tpu.optim import (
    CalibConfig,
    calibrate_model,
    export_quantized,
    make_pseudo_linear,
    optimize_linears,
    pseudo_linear_forward,
    pseudo_quantized_weight,
)
from paroquant_tpu.ops import quant
from paroquant_tpu.ops.butterfly import make_butterfly_params

GS = 128


def _outlier_weight(O, I, seed):
    """Weight with a few high-magnitude input channels (quantization-hostile)."""
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 1, (O, I)).astype(np.float32)
    outliers = rng.choice(I, size=max(I // 32, 1), replace=False)
    w[:, outliers] *= 8.0
    return w


def test_pseudo_linear_matches_rtn_at_init():
    """With theta=0 and unit scales the pseudo forward equals plain RTN."""
    w = _outlier_weight(64, 256, 0)
    rot = make_butterfly_params(256, GS, 4)
    lin = make_pseudo_linear(w, rot, n_bits=4, group_size=GS)
    w_hat = np.asarray(pseudo_quantized_weight(lin))
    w_rtn = np.asarray(quant.pseudo_quantize(jnp.asarray(w), 4, GS))
    np.testing.assert_allclose(w_hat, w_rtn, atol=1e-5)


def test_optimize_reduces_linear_quant_error():
    w = _outlier_weight(64, 256, 1)
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(8, 16, 256)).astype(np.float32)
    y_fp = np.einsum("bth,oh->bto", xs, w)

    rot = make_butterfly_params(256, GS, 8)
    lin = make_pseudo_linear(w, rot, n_bits=4, group_size=GS)

    def apply_fn(linears, x):
        return pseudo_linear_forward(linears["lin"], x)

    batches = [(jnp.asarray(xs[i]), jnp.asarray(y_fp[i])) for i in range(8)]
    err0 = float(
        jnp.mean((apply_fn({"lin": lin}, jnp.asarray(xs[0])) - y_fp[0]) ** 2)
    )
    linears, _ = optimize_linears(
        apply_fn, {"lin": lin}, batches[:6], batches[6:],
        {"channel_scales": 5e-2, "angles": 5e-2}, n_epochs=8,
    )
    linears, _ = optimize_linears(
        apply_fn, linears, batches[:6], batches[6:],
        {"weight": 1e-5, "quantizer": 1e-6}, n_epochs=4,
    )
    err1 = float(
        jnp.mean((apply_fn(linears, jnp.asarray(xs[0])) - y_fp[0]) ** 2)
    )
    assert err1 < err0 * 0.7, (err0, err1)

    # export round trip: hard-quantized weight ~ pseudo weight
    exp = export_quantized(linears["lin"])
    assert exp["q"].min() >= 0 and exp["q"].max() <= 15
    from paroquant_tpu.optim.calibrate import quantized_from_export
    from paroquant_tpu.ops.qlinear import effective_weight

    qlin = quantized_from_export(exp)
    w_hat = np.asarray(pseudo_quantized_weight(linears["lin"]))
    w_eff = np.asarray(effective_weight(qlin)).T
    # runtime scales are stored bf16 (ops/qlinear.py) -> bf16-level rounding
    np.testing.assert_allclose(w_eff, w_hat, rtol=1e-2, atol=1e-3)


def test_calibrate_model_end_to_end(tmp_path):
    """Full pipeline on a tiny decoder: calibrated W4 beats RTN W4 logits."""
    config = PRESETS["tiny"]._replace if hasattr(PRESETS["tiny"], "_replace") else None
    import dataclasses

    config = dataclasses.replace(
        PRESETS["tiny"], num_hidden_layers=2, hidden_size=256, intermediate_size=512
    )
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    # inject outliers into mlp weights so rotation has something to fix
    rng = np.random.default_rng(3)
    for lp in params["layers"]:
        for n in ("gate_proj", "up_proj"):
            w = np.array(lp["mlp"][n].w)
            idx = rng.choice(w.shape[0], 8, replace=False)
            w[idx, :] *= 6.0
            lp["mlp"][n] = lp["mlp"][n]._replace(w=jnp.asarray(w))

    tokens = rng.integers(0, config.vocab_size, (4, 2, 16)).astype(np.int32)
    cfg = CalibConfig(
        n_bits=4, group_size=64, num_rotations=6,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 4),
                ({"weight": 1e-5, "quantizer": 1e-6}, 2)),
    )
    qparams, results = calibrate_model(
        params, config, tokens, cfg, output_dir=tmp_path
    )
    assert len(results) == 2 and all(len(r) == 7 for r in results)

    from paroquant_tpu.convert import quantize_model_rtn

    rtn = quantize_model_rtn(params, config, n_bits=4, group_size=64)
    test_tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    l_fp, _ = model_forward(params, config, test_tokens)
    l_cal, _ = model_forward(qparams, config, test_tokens)
    l_rtn, _ = model_forward(rtn, config, test_tokens)
    e_cal = float(jnp.mean((l_cal - l_fp) ** 2))
    e_rtn = float(jnp.mean((l_rtn - l_fp) ** 2))
    assert e_cal < e_rtn, (e_cal, e_rtn)

    # resume path: second run loads from disk and reproduces the same params
    qparams2, _ = calibrate_model(params, config, tokens, cfg, output_dir=tmp_path)
    l_cal2, _ = model_forward(qparams2, config, test_tokens)
    np.testing.assert_allclose(np.asarray(l_cal2), np.asarray(l_cal), atol=1e-4)


def test_calibrate_host_paged_matches_resident():
    """Streaming batches host->device per step (the over-budget
    CachedTensorShards path, resident_act_bytes=0) must produce the exact
    same quantized params as the all-resident fast path: the math and batch
    order are identical, only residency changes."""
    import dataclasses

    config = dataclasses.replace(
        PRESETS["tiny"], num_hidden_layers=1, hidden_size=128, intermediate_size=256
    )
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, config.vocab_size, (3, 2, 16)).astype(np.int32)
    stages = (({"channel_scales": 5e-2, "angles": 5e-2}, 2),)
    base = CalibConfig(n_bits=4, group_size=64, num_rotations=4, stages=stages)
    paged = dataclasses.replace(base, resident_act_bytes=0)

    q_resident, _ = calibrate_model(params, config, tokens, base)
    q_paged, _ = calibrate_model(params, config, tokens, paged)

    test_tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)), jnp.int32)
    l_a, _ = model_forward(q_resident, config, test_tokens)
    l_b, _ = model_forward(q_paged, config, test_tokens)
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))


def test_calibrate_hybrid_delta_net_layers():
    """qwen3_next hybrid calibration: delta-net layers' in_proj_qkvz/out_proj
    are quantized through the layer's own forward (the reference routes these
    through the HF module and skips only the decay/gate projection,
    experiments/optimize/4bit_moe.sh --skipped-modules linear_attn.in_proj_*)."""
    from paroquant_tpu.models import from_hf_dict
    from paroquant_tpu.models.decoder import DenseLinear
    from paroquant_tpu.ops.qlinear import QuantizedLinear

    config = from_hf_dict(dict(
        model_type="qwen3_next", vocab_size=64, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, full_attention_interval=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
    ))
    assert config.layer_is_linear(0) and not config.layer_is_linear(1)
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, config.vocab_size, (2, 1, 16)).astype(np.int32)
    cfg = CalibConfig(
        n_bits=4, group_size=16, num_rotations=2,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 2),),
    )
    qparams, results = calibrate_model(params, config, tokens, cfg)

    la = qparams["layers"][0]["linear_attn"]
    assert isinstance(la["in_proj_qkvz"], QuantizedLinear)
    assert isinstance(la["out_proj"], QuantizedLinear)
    # decay/gate projection stays dense (CalibConfig.skip default)
    assert isinstance(la["in_proj_ba"], DenseLinear)
    assert "linear_attn.in_proj_qkvz" in results[0]
    assert "linear_attn.in_proj_ba" not in results[0]

    # quantized hybrid still runs and tracks the dense model
    test_tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 12)), jnp.int32)
    l_fp, _ = model_forward(params, config, test_tokens)
    l_q, _ = model_forward(qparams, config, test_tokens)
    assert np.isfinite(np.asarray(l_q)).all()
    denom = float(jnp.mean(l_fp**2)) + 1e-9
    assert float(jnp.mean((l_q - l_fp) ** 2)) / denom < 0.3


def test_hybrid_checkpoint_round_trip(tmp_path):
    """Calibrated qwen3_next MoE hybrid survives PARO-TPU save -> load: the
    delta-net extras (conv/dt_bias/A_log/norm), quantized in_proj/out_proj,
    routed experts, AND the shared expert (+ its dense sigmoid gate)
    reproduce the same logits."""
    from paroquant_tpu.convert import load_checkpoint, save_paro_checkpoint
    from paroquant_tpu.models import from_hf_dict
    from paroquant_tpu.models.decoder import DenseLinear
    from paroquant_tpu.ops.qlinear import QuantizedLinear

    config = from_hf_dict(dict(
        model_type="qwen3_next", vocab_size=64, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, full_attention_interval=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        tie_word_embeddings=True,
    ))
    params = init_params(config, jax.random.PRNGKey(2), dtype=jnp.float32)
    assert "shared_expert" in params["layers"][0]["mlp"]
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, config.vocab_size, (2, 1, 16)).astype(np.int32)
    cfg = CalibConfig(
        n_bits=4, group_size=16, num_rotations=2,
        stages=(({"channel_scales": 5e-2}, 1),),
    )
    qparams, exports = calibrate_model(params, config, tokens, cfg)
    mlp_q = qparams["layers"][0]["mlp"]
    assert isinstance(mlp_q["shared_expert"]["gate_proj"], QuantizedLinear)
    assert isinstance(mlp_q["shared_expert_gate"], DenseLinear)
    assert "mlp.shared_expert.gate_proj" in exports[0]
    save_paro_checkpoint(tmp_path, params, config, exports)
    params2, config2 = load_checkpoint(tmp_path, dtype=jnp.float32)
    assert config2.layer_is_linear(0) and not config2.layer_is_linear(1)
    mlp_l = params2["layers"][0]["mlp"]
    assert isinstance(mlp_l["shared_expert"]["gate_proj"], QuantizedLinear)
    assert isinstance(mlp_l["shared_expert_gate"], DenseLinear)

    test_tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 12)), jnp.int32)
    l_a, _ = model_forward(qparams, config, test_tokens)
    l_b, _ = model_forward(params2, config2, test_tokens)
    # dense side tensors + theta serialize as f16 -> small logit rounding
    np.testing.assert_allclose(np.asarray(l_b), np.asarray(l_a), rtol=2e-2, atol=5e-2)


def test_file_calibration_dataset(tmp_path):
    """`file:<path>` corpora (.txt blank-line docs and .jsonl) tokenize,
    shuffle at document granularity, and pack to [n, seqlen] blocks."""
    from paroquant_tpu.optim.data import get_calib_dataset, get_mixed_calib_dataset

    class StubTok:
        def __call__(self, text):
            class R:
                input_ids = [ord(c) % 97 for c in text]
            return R()

    txt = tmp_path / "corpus.txt"
    txt.write_text("hello world\n\nsecond document here\n\nthird doc")
    jl = tmp_path / "corpus.jsonl"
    jl.write_text('{"text": "alpha beta"}\n{"text": "gamma delta"}\n')

    a = get_calib_dataset(f"file:{txt}", StubTok(), 3, 8, seed=0)
    assert a.shape == (3, 8) and a.dtype == np.int32
    b = get_calib_dataset(f"file:{jl}", StubTok(), 2, 8, seed=0)
    assert b.shape == (2, 8)
    # mixing a local file with synthetic works through the same path
    m = get_mixed_calib_dataset([f"file:{txt}", "synthetic"], StubTok(), 4, 8,
                                seed=0, vocab_size=97)
    assert m.shape == (4, 8)
    # document-level shuffle: different seeds reorder the stream
    c = get_calib_dataset(f"file:{txt}", StubTok(), 3, 8, seed=1)
    assert not np.array_equal(a, c)
