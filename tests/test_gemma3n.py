"""gemma-4-class (Gemma3n) parity vs the HF torch implementation.

The reference runs this family through the HF model zoo and only adapts the
calibration plumbing (optim/util.py:17,83-103,217-279 — per-layer-embedding
module moves + shared_kv_states kwarg retention); our decoder implements the
family natively. Ground truth: transformers' Gemma3nForCausalLM on CPU with a
tiny random config, run with use_cache=True so the shared-KV tail is active.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from paroquant_tpu.models import KVCache, from_hf_dict, model_forward
from paroquant_tpu.models.decoder import DenseLinear, greedy_generate

HF_CFG = dict(
    model_type="gemma3n_text",
    # equal vocabs: HF's text-only class indexes the per-layer table with raw
    # ids (no clamp — that lives in the multimodal wrapper, which our
    # per_layer_inputs mirrors), so generated ids must stay in range
    vocab_size=128,
    vocab_size_per_layer_input=128,
    hidden_size=64,
    hidden_size_per_layer_input=16,
    intermediate_size=[96] * 6,
    num_hidden_layers=6,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    rms_norm_eps=1e-6,
    rope_theta=1_000_000.0,
    rope_local_base_freq=10_000.0,
    sliding_window=8,
    layer_types=[
        "sliding_attention", "sliding_attention", "full_attention",
        "sliding_attention", "sliding_attention", "full_attention",
    ],
    num_kv_shared_layers=2,  # layers 4 (sliding<-3) and 5 (full<-2) share
    altup_num_inputs=4,
    altup_active_idx=0,
    altup_coef_clip=120.0,
    altup_correct_scale=True,
    laurel_rank=8,
    activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
    final_logit_softcapping=30.0,
    hidden_activation="gelu_pytorch_tanh",
    tie_word_embeddings=True,
    attention_bias=False,
    max_position_embeddings=256,
)


def _t2j(t):
    return jnp.asarray(t.detach().float().numpy())


def _lin(mod):
    return DenseLinear(_t2j(mod.weight).T, None)


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers.models.gemma3n import Gemma3nForCausalLM, Gemma3nTextConfig

    torch.manual_seed(0)
    hf_cfg = Gemma3nTextConfig(**{k: v for k, v in HF_CFG.items() if k != "model_type"})
    hf = Gemma3nForCausalLM(hf_cfg).eval().float()
    # random init leaves correct_output_scale zero and coefs near-trivial;
    # perturb them so the altup path is actually exercised
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.altup.correct_output_scale.normal_(1.0, 0.1)
            layer.altup.correction_coefs.weight.normal_(0.0, 0.2)
            layer.altup.prediction_coefs.weight.normal_(0.0, 0.2)

    config = from_hf_dict(HF_CFG)
    assert config.is_gemma3n
    assert config.first_kv_shared_layer == 4
    assert config.kv_share_source(4) == 3 and config.kv_share_source(5) == 2
    assert config.kv_share_source(3) is None
    assert config.num_full_attn_layers == 4
    assert config.attn_scale == 1.0

    m = hf.model
    params = {
        "embed_tokens": _t2j(m.embed_tokens.weight),
        "embed_tokens_per_layer": _t2j(m.embed_tokens_per_layer.weight),
        "per_layer_model_projection": _lin(m.per_layer_model_projection),
        "per_layer_projection_norm": _t2j(m.per_layer_projection_norm.weight),
        "altup_projections": [_lin(p) for p in m.altup_projections],
        "altup_unembed_projections": [_lin(p) for p in m.altup_unembed_projections],
        "norm": _t2j(m.norm.weight),
        "layers": [],
    }
    for layer in m.layers:
        a = layer.self_attn
        lp = {
            "input_layernorm": _t2j(layer.input_layernorm.weight),
            "post_attention_layernorm": _t2j(layer.post_attention_layernorm.weight),
            "pre_feedforward_layernorm": _t2j(layer.pre_feedforward_layernorm.weight),
            "post_feedforward_layernorm": _t2j(layer.post_feedforward_layernorm.weight),
            "q_proj": _lin(a.q_proj),
            "k_proj": _lin(a.k_proj),
            "v_proj": _lin(a.v_proj),
            "o_proj": _lin(a.o_proj),
            "q_norm": _t2j(a.q_norm.weight),
            "k_norm": _t2j(a.k_norm.weight),
            "mlp": {
                "gate_proj": _lin(layer.mlp.gate_proj),
                "up_proj": _lin(layer.mlp.up_proj),
                "down_proj": _lin(layer.mlp.down_proj),
            },
            "altup": {
                "correct_output_scale": _t2j(layer.altup.correct_output_scale),
                "correction_coefs": _lin(layer.altup.correction_coefs),
                "prediction_coefs": _lin(layer.altup.prediction_coefs),
                "modality_router": _lin(layer.altup.modality_router),
                "router_norm": _t2j(layer.altup.router_norm.weight),
            },
            "laurel": {
                "linear_left": _lin(layer.laurel.linear_left),
                "linear_right": _lin(layer.laurel.linear_right),
                "post_laurel_norm": _t2j(layer.laurel.post_laurel_norm.weight),
            },
            "per_layer_input_gate": _lin(layer.per_layer_input_gate),
            "per_layer_projection": _lin(layer.per_layer_projection),
            "post_per_layer_input_norm": _t2j(layer.post_per_layer_input_norm.weight),
        }
        params["layers"].append(lp)
    return hf, params, config


def _hf_logits(hf, ids):
    with torch.no_grad():
        # use_cache=True activates the shared-KV tail (the trained semantic)
        out = hf(torch.tensor(ids), use_cache=True)
    return out.logits.float().numpy()


def test_gemma3n_prefill_logits_match(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(0)
    ids = rng.integers(0, HF_CFG["vocab_size_per_layer_input"], (2, 24)).astype(np.int32)
    ref = _hf_logits(hf, ids)
    # cached path (shares KV through the cache like HF)
    cache = KVCache.create(config, 2, 32, jnp.float32)
    got, _ = model_forward(params, config, jnp.asarray(ids), cache)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
    # uncached path shares in-pass and must agree too
    got2, _ = model_forward(params, config, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got2), ref, rtol=2e-4, atol=2e-4)


def test_gemma3n_incremental_decode_matches_full(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(1)
    ids = rng.integers(0, HF_CFG["vocab_size_per_layer_input"], (1, 12)).astype(np.int32)
    full, _ = model_forward(params, config, jnp.asarray(ids))
    cache = KVCache.create(config, 1, 16, jnp.float32)
    logits, cache = model_forward(params, config, jnp.asarray(ids[:, :8]), cache)
    for t in range(8, 12):
        logits, cache = model_forward(params, config, jnp.asarray(ids[:, t : t + 1]), cache)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(full[:, -1]), rtol=2e-4, atol=2e-4
    )


def test_gemma3n_greedy_matches_hf(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, HF_CFG["vocab_size_per_layer_input"], (1, 10)).astype(np.int32)
    n_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(prompt), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        )
    ours = greedy_generate(params, config, jnp.asarray(prompt), n_new, max_len=32)
    np.testing.assert_array_equal(
        np.asarray(ours)[0], hf_out.numpy()[0, prompt.shape[1]:]
    )


def test_gemma3n_sliding_window_and_local_rope_active(hf_and_ours):
    """Layer 0 is sliding (local theta); check config wiring changes logits."""
    hf, params, config = hf_and_ours
    import dataclasses

    rng = np.random.default_rng(3)
    ids = rng.integers(0, HF_CFG["vocab_size_per_layer_input"], (1, 12)).astype(np.int32)
    base, _ = model_forward(params, config, jnp.asarray(ids))
    glob = dataclasses.replace(config, rope_local_theta=config.rope_theta)
    got, _ = model_forward(params, glob, jnp.asarray(ids))
    assert not np.allclose(np.asarray(base), np.asarray(got), atol=1e-5)
