"""Gemma3 VLM (image-text) parity vs the HF torch implementation.

The reference's VLM support delegates to HF AutoModelForImageTextToText
(reference backends/transformers/generator.py:26-34); here the SigLIP tower,
projector and image-token merge are native JAX (models/vision.py). Ground
truth: transformers' Gemma3ForConditionalGeneration, tiny random config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from paroquant_tpu.models import from_hf_dict
from paroquant_tpu.models.decoder import DenseLinear
from paroquant_tpu.models.vision import (
    VisionConfig, gemma3_project, siglip_encode, vlm_prefill,
)

VOCAB = 256
IMAGE_TOKEN = 250
HF_CFG = dict(
    model_type="gemma3",
    mm_tokens_per_image=4,
    image_token_index=IMAGE_TOKEN,
    boi_token_index=248,
    eoi_token_index=249,
    text_config=dict(
        model_type="gemma3_text",
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
        sliding_window=16,
        query_pre_attn_scalar=16,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        layer_types=["sliding_attention", "full_attention"],
        hidden_activation="gelu_pytorch_tanh",
        attention_bias=False,
        tie_word_embeddings=True,
    ),
    vision_config=dict(
        model_type="siglip_vision_model",
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=7,
        num_channels=3,
        layer_norm_eps=1e-6,
    ),
)


def _t2j(t):
    return jnp.asarray(t.detach().float().numpy())


def _lin(mod):
    return DenseLinear(
        _t2j(mod.weight).T, None if mod.bias is None else _t2j(mod.bias)
    )


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers.models.gemma3 import Gemma3Config, Gemma3ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = Gemma3Config(**HF_CFG)
    hf = Gemma3ForConditionalGeneration(hf_cfg).eval().float()

    config = from_hf_dict(HF_CFG)
    assert config.is_vlm and config.mm_tokens_per_image == 4
    assert config.image_token_id == IMAGE_TOKEN
    assert config.hidden_act == "gelu_pytorch_tanh"
    assert config.query_pre_attn_scalar == 16
    assert config.layer_sliding_window(0) == 16
    assert config.layer_sliding_window(1) is None

    lm = hf.model.language_model
    params = {
        "embed_tokens": _t2j(lm.embed_tokens.weight),
        "norm": _t2j(lm.norm.weight),
        "layers": [],
    }
    for hl in lm.layers:
        lp = {
            "input_layernorm": _t2j(hl.input_layernorm.weight),
            "post_attention_layernorm": _t2j(hl.post_attention_layernorm.weight),
            "pre_feedforward_layernorm": _t2j(hl.pre_feedforward_layernorm.weight),
            "post_feedforward_layernorm": _t2j(hl.post_feedforward_layernorm.weight),
            "q_proj": _lin(hl.self_attn.q_proj),
            "k_proj": _lin(hl.self_attn.k_proj),
            "v_proj": _lin(hl.self_attn.v_proj),
            "o_proj": _lin(hl.self_attn.o_proj),
            "q_norm": _t2j(hl.self_attn.q_norm.weight),
            "k_norm": _t2j(hl.self_attn.k_norm.weight),
            "mlp": {
                "gate_proj": _lin(hl.mlp.gate_proj),
                "up_proj": _lin(hl.mlp.up_proj),
                "down_proj": _lin(hl.mlp.down_proj),
            },
        }
        params["layers"].append(lp)

    vt = hf.model.vision_tower.vision_model
    D = HF_CFG["vision_config"]["hidden_size"]
    vision = {
        "patch_embed_w": _t2j(vt.embeddings.patch_embedding.weight).reshape(D, -1).T,
        "patch_embed_b": _t2j(vt.embeddings.patch_embedding.bias),
        "pos_embed": _t2j(vt.embeddings.position_embedding.weight),
        "post_ln_w": _t2j(vt.post_layernorm.weight),
        "post_ln_b": _t2j(vt.post_layernorm.bias),
        "layers": [],
    }
    for vl in vt.encoder.layers:
        vision["layers"].append({
            "ln1_w": _t2j(vl.layer_norm1.weight), "ln1_b": _t2j(vl.layer_norm1.bias),
            "ln2_w": _t2j(vl.layer_norm2.weight), "ln2_b": _t2j(vl.layer_norm2.bias),
            "q_proj": _lin(vl.self_attn.q_proj),
            "k_proj": _lin(vl.self_attn.k_proj),
            "v_proj": _lin(vl.self_attn.v_proj),
            "out_proj": _lin(vl.self_attn.out_proj),
            "fc1": _lin(vl.mlp.fc1),
            "fc2": _lin(vl.mlp.fc2),
        })
    params["vision"] = vision
    params["projector"] = {
        "mm_input_projection": _t2j(hf.model.multi_modal_projector.mm_input_projection_weight),
        "mm_soft_emb_norm": _t2j(hf.model.multi_modal_projector.mm_soft_emb_norm.weight),
    }
    return hf, params, config


def test_vision_tower_matches_hf(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = hf.model.vision_tower(torch.from_numpy(px)).last_hidden_state.numpy()
    vcfg = VisionConfig.from_hf_dict(config.vision)
    got = np.asarray(siglip_encode(params["vision"], vcfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        want_p = hf.model.multi_modal_projector(
            torch.from_numpy(want)
        ).numpy()
    got_p = np.asarray(gemma3_project(
        params["projector"], jnp.asarray(want), vcfg,
        config.mm_tokens_per_image, rms_eps=vcfg.layer_norm_eps,
    ))
    np.testing.assert_allclose(got_p, want_p, rtol=2e-4, atol=2e-4)


def test_vlm_prefill_logits_match_hf(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(1)
    B, T = 1, 14
    toks = rng.integers(0, 240, (B, T)).astype(np.int64)
    toks[0, 3:7] = IMAGE_TOKEN  # one image = mm_tokens_per_image soft tokens
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    token_type_ids = (toks == IMAGE_TOKEN).astype(np.int64)

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(toks),
            pixel_values=torch.from_numpy(px),
            token_type_ids=torch.from_numpy(token_type_ids),
        ).logits.float().numpy()

    got, _ = vlm_prefill(
        params, config, jnp.asarray(toks, jnp.int32), jnp.asarray(px)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_vlm_checkpoint_load_roundtrip(hf_and_ours, tmp_path):
    """Write the HF-named VLM tensors to safetensors and load through
    load_checkpoint: vlm_prefill logits must match the direct-mapped params."""
    import json

    from safetensors.numpy import save_file

    hf, params, config = hf_and_ours
    t = {}
    sd = hf.state_dict()
    for k, v in sd.items():
        t[k] = v.float().numpy()
    d = tmp_path / "vlm"
    d.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in t.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(HF_CFG))

    from paroquant_tpu.convert import load_checkpoint

    loaded, config2 = load_checkpoint(d, dtype=jnp.float32)
    assert config2.is_vlm and "vision" in loaded and "projector" in loaded

    rng = np.random.default_rng(5)
    toks = rng.integers(0, 240, (1, 12)).astype(np.int64)
    toks[0, 2:6] = IMAGE_TOKEN
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ref, _ = vlm_prefill(params, config, jnp.asarray(toks, jnp.int32), jnp.asarray(px))
    got, _ = vlm_prefill(loaded, config2, jnp.asarray(toks, jnp.int32), jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_vlm_engine_matches_generator(hf_and_ours):
    """Image requests served through the continuous-batching Engine emit the
    same greedy tokens as the single-stream Generator's VLM path, including
    interleaved with a text-only request (reference capability: VLM serving
    via the transformers backend, generator.py:26-34)."""
    from paroquant_tpu.serve import Engine, Generator, SamplingParams

    _, params, config = hf_and_ours
    rng = np.random.default_rng(11)
    toks = list(rng.integers(0, 240, 12))
    toks[2:6] = [IMAGE_TOKEN] * 4  # one image
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    text_prompt = list(rng.integers(0, 240, 9))
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    gen = Generator(params, config, quant_mode="xla", cache_dtype=jnp.float32)
    want_vlm = [t for t in gen.stream_generate(toks, sp, pixel_values=px)]
    want_txt = [t for t in gen.stream_generate(text_prompt, sp)]

    eng = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="xla", cache_dtype=jnp.float32)
    reqs = [eng.submit(toks, sp, pixel_values=px), eng.submit(text_prompt, sp)]
    for _ in range(100):
        if not eng.step():
            break
    got = []
    for r in reqs:
        out = []
        while not r.out_queue.empty():
            kind, t = r.out_queue.get_nowait()
            if kind == "done":
                break
            out.append(t)
        got.append(out)
    assert got[0] == want_vlm
    assert got[1] == want_txt

    # models without a vision tower reject image requests loudly
    import dataclasses as _dc
    import pytest as _pytest

    cfg_novis = _dc.replace(config, vision_items=None) if _dc.is_dataclass(config) \
        else config._replace(vision_items=None)
    eng2 = Engine(params, cfg_novis, max_batch=1, max_len=64, page_size=8,
                  quant_mode="xla", cache_dtype=jnp.float32)
    with _pytest.raises(ValueError, match="vision"):
        eng2.submit(toks, sp, pixel_values=px)


def test_vlm_api_completions_with_pixels(hf_and_ours):
    """HTTP /v1/completions accepts raw pixel_values alongside
    prompt_token_ids and serves the image request through the engine."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from paroquant_tpu.serve import Engine, Generator, SamplingParams
    from paroquant_tpu.serve.api import Server

    _, params, config = hf_and_ours
    rng = np.random.default_rng(13)
    toks = list(map(int, rng.integers(0, 240, 10)))
    toks[2:6] = [IMAGE_TOKEN] * 4
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)

    gen = Generator(params, config, quant_mode="xla", cache_dtype=jnp.float32)
    sp = SamplingParams(max_tokens=4, temperature=0.0)
    want = [t for t in gen.stream_generate(toks, sp, pixel_values=px)]

    eng = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="xla", cache_dtype=jnp.float32)
    srv = Server(eng)
    eng.start()
    try:
        async def go():
            client = TestClient(TestServer(srv.app))
            await client.start_server()
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": toks, "pixel_values": px.tolist(),
                "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200, await r.text()
            data = await r.json()
            await client.close()
            return data

        data = asyncio.run(go())
    finally:
        eng.stop()
    assert data["choices"][0]["token_ids"] == want
