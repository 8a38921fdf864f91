"""qwen3_next (gated delta-net hybrid) parity vs the HF torch implementation.

The reference runs this family through the HF/vLLM model zoos (its optimizer
merely skips the linear-attention in_proj, experiments/optimize/4bit_moe.sh);
our decoder implements it natively. Ground truth: transformers'
Qwen3NextForCausalLM on CPU with a tiny random config — full-precision logits
must match for prefill AND incremental decode."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from paroquant_tpu.models import KVCache, from_hf_dict, model_forward
from paroquant_tpu.models.decoder import DenseLinear, greedy_generate

HF_CFG = dict(
    model_type="qwen3_next",
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    full_attention_interval=4,  # layers 0,1,2 linear; layer 3 full
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    partial_rotary_factor=0.25,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    linear_num_value_heads=4,
    linear_num_key_heads=2,
    linear_key_head_dim=16,
    linear_value_head_dim=16,
    linear_conv_kernel_dim=4,
    num_experts=4,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    shared_expert_intermediate_size=32,
    norm_topk_prob=True,
    decoder_sparse_step=1,
    tie_word_embeddings=False,
    attention_bias=False,
    hidden_act="silu",
)


def _t2j(t):
    return jnp.asarray(t.detach().float().numpy())


def _lin(mod):
    return DenseLinear(_t2j(mod.weight).T, None if mod.bias is None else _t2j(mod.bias))


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers.models.qwen3_next import (
        Qwen3NextConfig, Qwen3NextForCausalLM,
    )

    torch.manual_seed(0)
    hf_cfg = Qwen3NextConfig(**{k: v for k, v in HF_CFG.items() if k != "model_type"})
    hf = Qwen3NextForCausalLM(hf_cfg).eval().float()

    config = from_hf_dict(HF_CFG)
    assert config.layer_types == (
        "linear_attention", "linear_attention", "linear_attention", "full_attention",
    )
    assert config.rotary_dim == 4 and config.attn_gate

    params = {
        "embed_tokens": _t2j(hf.model.embed_tokens.weight),
        "norm": _t2j(hf.model.norm.weight),
        "lm_head": _lin(hf.lm_head),
        "layers": [],
    }
    for li, hl in enumerate(hf.model.layers):
        lp = {
            "input_layernorm": _t2j(hl.input_layernorm.weight),
            "post_attention_layernorm": _t2j(hl.post_attention_layernorm.weight),
        }
        if config.layer_is_linear(li):
            la = hl.linear_attn
            lp["linear_attn"] = {
                "in_proj_qkvz": _lin(la.in_proj_qkvz),
                "in_proj_ba": _lin(la.in_proj_ba),
                "conv_w": _t2j(la.conv1d.weight).reshape(
                    config.linear_conv_dim, config.linear_conv_kernel_dim
                ),
                "dt_bias": _t2j(la.dt_bias),
                "A_log": _t2j(la.A_log),
                "norm": _t2j(la.norm.weight),
                "out_proj": _lin(la.out_proj),
            }
        else:
            sa = hl.self_attn
            lp.update(
                q_proj=_lin(sa.q_proj), k_proj=_lin(sa.k_proj),
                v_proj=_lin(sa.v_proj), o_proj=_lin(sa.o_proj),
                q_norm=_t2j(sa.q_norm.weight), k_norm=_t2j(sa.k_norm.weight),
            )
        mlp = hl.mlp
        lp["mlp"] = {
            "router": DenseLinear(_t2j(mlp.gate.weight).T, None),
            "experts": {
                "gate_proj": jnp.stack([_t2j(e.gate_proj.weight).T for e in mlp.experts]),
                "up_proj": jnp.stack([_t2j(e.up_proj.weight).T for e in mlp.experts]),
                "down_proj": jnp.stack([_t2j(e.down_proj.weight).T for e in mlp.experts]),
            },
            "shared_expert": {
                "gate_proj": _lin(mlp.shared_expert.gate_proj),
                "up_proj": _lin(mlp.shared_expert.up_proj),
                "down_proj": _lin(mlp.shared_expert.down_proj),
            },
            "shared_expert_gate": DenseLinear(_t2j(mlp.shared_expert_gate.weight).T, None),
        }
        params["layers"].append(lp)
    return hf, params, config


def test_qwen3_next_prefill_logits_match(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(0)
    toks = rng.integers(0, HF_CFG["vocab_size"], (2, 24)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks)).logits.float().numpy()
    got, _ = model_forward(params, config, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_qwen3_next_incremental_decode_matches_full(hf_and_ours):
    """Recurrent decode (conv window + delta state in the cache) must equal
    the chunked prefill at every position."""
    _, params, config = hf_and_ours
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, HF_CFG["vocab_size"], (1, 10)), jnp.int32)
    full, _ = model_forward(params, config, toks)

    cache = KVCache.create(config, 1, 16, jnp.float32)
    assert cache.linear is not None and cache.linear.rec.shape[0] == 3
    _, cache = model_forward(params, config, toks[:, :6], cache)
    for t in range(6, 10):
        inc, cache = model_forward(params, config, toks[:, t : t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(inc[:, 0]), np.asarray(full[:, t]), rtol=2e-3, atol=2e-3
        )


def test_qwen3_next_greedy_matches_hf(hf_and_ours):
    hf, params, config = hf_and_ours
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, HF_CFG["vocab_size"], (1, 8)).astype(np.int64)
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            use_cache=False,
        )[0, 8:].numpy()
    got = greedy_generate(params, config, prompt, 6, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(got[0], want)


def test_qwen3_next_chunk_boundary():
    """Prefill longer than one delta chunk (64) must stay consistent with
    incremental decode across the chunk boundary."""
    import dataclasses

    from paroquant_tpu.models import init_params

    config = from_hf_dict(HF_CFG)
    params = init_params(config, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    T = 70  # crosses the 64-token chunk boundary
    toks = jnp.asarray(rng.integers(0, config.vocab_size, (1, T)), jnp.int32)
    full, _ = model_forward(params, config, toks)
    cache = KVCache.create(config, 1, 80, jnp.float32)
    _, cache = model_forward(params, config, toks[:, : T - 1], cache)
    inc, _ = model_forward(params, config, toks[:, T - 1 :], cache)
    np.testing.assert_allclose(
        np.asarray(inc[:, 0]), np.asarray(full[:, T - 1]), rtol=3e-3, atol=3e-3
    )


def test_qwen3_next_engine_matches_generator(hf_and_ours):
    """The paged engine's hybrid path (per-slot conv/recurrent states) must
    emit the same greedy tokens as the contiguous-cache Generator."""
    from paroquant_tpu.serve import Engine, Generator, SamplingParams

    _, params, config = hf_and_ours
    rng = np.random.default_rng(9)
    prompts = [list(rng.integers(0, HF_CFG["vocab_size"], n)) for n in (7, 15)]
    sp = SamplingParams(max_tokens=8, temperature=0.0)

    gen = Generator(params, config, quant_mode="xla", cache_dtype=jnp.float32)
    ref = [[t for t in gen.stream_generate(p, sp)] for p in prompts]

    eng = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="xla", cache_dtype=jnp.float32)
    got = [eng.generate_sync(p, sp) for p in prompts]
    assert got == ref

    # burst decode carries the recurrent delta-net states through the scan
    eng_b = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                   quant_mode="xla", cache_dtype=jnp.float32, decode_burst=3)
    got_b = [eng_b.generate_sync(p, sp) for p in prompts]
    assert got_b == ref

    # interleaved: both requests decode in the same batch
    eng2 = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                  quant_mode="xla", cache_dtype=jnp.float32)
    reqs = [eng2.submit(p, sp) for p in prompts]
    for _ in range(200):
        if not eng2.step():
            break
    for r, want in zip(reqs, ref):
        toks = []
        while not r.out_queue.empty():
            kind, t = r.out_queue.get_nowait()
            if kind == "done":
                break
            toks.append(t)
        assert toks == want
