"""TP/DP sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-device tests via xla_force_host_platform_device_count)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paroquant_tpu.convert import quantize_model_rtn
from paroquant_tpu.models import PRESETS, KVCache, init_params, model_forward
from paroquant_tpu.parallel import make_mesh, shard_cache, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    config = PRESETS["tiny"]  # 4 heads, 2 kv heads
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, config.vocab_size, (4, 8)), jnp.int32
    )
    ref_logits, _ = model_forward(params, config, tokens)
    return config, params, tokens, ref_logits


def test_tp_forward_matches_single_device(setup):
    config, params, tokens, ref_logits = setup
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(params, config, mesh)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        logits, _ = jax.jit(
            lambda p, t: model_forward(p, config, t)
        )(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-3, atol=1e-3
    )


def test_tp_quantized_forward_matches(setup):
    config, params, tokens, _ = setup
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64)
    ref, _ = model_forward(qparams, config, tokens)
    mesh = make_mesh(n_data=2, n_model=4)
    cfg2 = config  # kv=2 not divisible by 4 -> expect error
    with pytest.raises(ValueError):
        shard_params(qparams, cfg2, mesh)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(qparams, config, mesh)
    logits, _ = jax.jit(lambda p, t: model_forward(p, config, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_tp_decode_with_sharded_cache(setup):
    config, params, tokens, _ = setup
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(params, config, mesh)
    cache = shard_cache(KVCache.create(config, 4, 16, jnp.float32), mesh)

    @jax.jit
    def step(p, t, c):
        return model_forward(p, config, t, c)

    logits, cache = step(sharded, tokens[:, :4], cache)
    l2, cache = step(sharded, tokens[:, 4:5], cache)
    # reference: unsharded incremental
    cache_ref = KVCache.create(config, 4, 16, jnp.float32)
    _, cache_ref = model_forward(params, config, tokens[:, :4], cache_ref)
    lr, _ = model_forward(params, config, tokens[:, 4:5], cache_ref)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(lr), rtol=1e-3, atol=1e-3)


def test_tp_moe_forward(setup):
    config = PRESETS["tiny-moe"]
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, config.vocab_size, (4, 6)), jnp.int32
    )
    ref, _ = model_forward(params, config, tokens)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(params, config, mesh)
    logits, _ = jax.jit(lambda p, t: model_forward(p, config, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_engine_tp_matches_single_device(setup):
    """The serving engine under a model-parallel mesh must emit exactly the
    same greedy tokens as the single-device engine (VERDICT r1 item 4)."""
    from jax.sharding import Mesh

    from paroquant_tpu.serve import Engine, SamplingParams

    config, params, _, _ = setup
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64, seed=1)
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(0, config.vocab_size, n)) for n in (6, 13)]
    sp = SamplingParams(max_tokens=8, temperature=0.0)

    eng_ref = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                     quant_mode="xla", cache_dtype=jnp.float32)
    ref = [eng_ref.generate_sync(p, sp) for p in prompts]

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    eng_tp = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                    quant_mode="xla", cache_dtype=jnp.float32, mesh=mesh)
    got = [eng_tp.generate_sync(p, sp) for p in prompts]
    assert got == ref

    # burst decode under GSPMD: the scanned multi-step path must partition too
    eng_tpb = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                     quant_mode="xla", cache_dtype=jnp.float32, mesh=mesh,
                     decode_burst=3)
    got_b = [eng_tpb.generate_sync(p, sp) for p in prompts]
    assert got_b == ref


def test_engine_tp_gemma3n_matches_single_device():
    """gemma-4-class TP serving: param_specs must cover the gemma3n extra
    top-level modules (per-layer embeddings, altup projections) and the paged
    gemma3n step must run under GSPMD."""
    from jax.sharding import Mesh

    from paroquant_tpu.serve import Engine, SamplingParams

    config = PRESETS["tiny-gemma3n"]
    params = init_params(config, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, config.vocab_size, n)) for n in (6, 13)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    eng_ref = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                     quant_mode="xla", cache_dtype=jnp.float32)
    ref = [eng_ref.generate_sync(p, sp) for p in prompts]

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    eng_tp = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                    quant_mode="xla", cache_dtype=jnp.float32, mesh=mesh)
    got = [eng_tp.generate_sync(p, sp) for p in prompts]
    assert got == ref


def test_engine_tp_hybrid_matches_single_device():
    """qwen3_next TP serving: shard_paged_cache must carry the per-slot
    delta-net conv/recurrent states through (replicated), not drop them."""
    from jax.sharding import Mesh

    from paroquant_tpu.models import from_hf_dict
    from paroquant_tpu.serve import Engine, SamplingParams

    config = from_hf_dict(dict(
        model_type="qwen3_next", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=4, full_attention_interval=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        tie_word_embeddings=False,
    ))
    params = init_params(config, jax.random.PRNGKey(8), dtype=jnp.float32)
    rng = np.random.default_rng(8)
    prompts = [list(rng.integers(0, config.vocab_size, n)) for n in (5, 9)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    eng_ref = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                     quant_mode="xla", cache_dtype=jnp.float32)
    ref = [eng_ref.generate_sync(p, sp) for p in prompts]

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    eng_tp = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                    quant_mode="xla", cache_dtype=jnp.float32, mesh=mesh)
    got = [eng_tp.generate_sync(p, sp) for p in prompts]
    assert got == ref


def test_dp_sharded_calibration_matches_single_device():
    """calibrate_model(mesh=...) runs the whole layer-wise pipeline under
    GSPMD data parallelism and quantizes to (numerically) the same model as
    the single-device run: only reduction order differs, so the hard-quantized
    integer grids must round identically almost everywhere."""
    from paroquant_tpu.models import model_forward
    from paroquant_tpu.optim import CalibConfig, calibrate_model

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, config.vocab_size, (3, 4, 8)).astype(np.int32)
    ccfg = CalibConfig(
        n_bits=4, group_size=64, num_rotations=4,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 2),),
    )
    q_single, _ = calibrate_model(params, config, tokens, ccfg)
    mesh = make_mesh(n_data=4, n_model=1)
    q_dp, _ = calibrate_model(params, config, tokens, ccfg, mesh=mesh)

    probe = jnp.asarray(rng.integers(0, config.vocab_size, (2, 6)), jnp.int32)
    l_single, _ = model_forward(q_single, config, probe)
    l_dp, _ = model_forward(jax.device_put(q_dp, jax.devices()[0]), config, probe)
    np.testing.assert_allclose(
        np.asarray(l_dp), np.asarray(l_single), rtol=5e-2, atol=5e-2
    )

    with pytest.raises(ValueError, match="divide"):
        calibrate_model(
            params, config, tokens[:, :3], ccfg, mesh=make_mesh(n_data=2, n_model=1)
        )


def test_engine_speculative_tp_matches_single_device():
    """Engine(mesh=..., spec_k>0): the paged verify step runs under GSPMD
    and the speculative engine's greedy tokens equal the single-device plain
    engine's exactly."""
    from paroquant_tpu.serve import Engine, SamplingParams

    config = dataclasses.replace(
        PRESETS["tiny"], num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4,
    )
    params = init_params(config, jax.random.PRNGKey(3), dtype=jnp.float32)
    prompt = [5, 2, 8, 1] * 4
    sp = SamplingParams(max_tokens=10, temperature=0.0)

    ref = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="xla", cache_dtype=jnp.float32
                 ).generate_sync(prompt, sp)
    mesh = make_mesh(n_data=2, n_model=4)
    eng = Engine(params, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="xla", cache_dtype=jnp.float32, mesh=mesh,
                 spec_k=4)
    got = eng.generate_sync(prompt, sp)
    assert got == ref
    assert eng.metrics["spec_windows"] > 0


def test_dp_perplexity_matches_single_device():
    """evaluate's DP-sharded PPL equals the single-device value (same math,
    different device layout; only reduction order can differ)."""
    from paroquant_tpu.cli.evaluate import perplexity

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(5), dtype=jnp.float32)
    rng = np.random.default_rng(6)
    toks = rng.integers(0, config.vocab_size, 16 * 12).astype(np.int32)
    single = perplexity(params, config, toks, 16, "xla", batch=4)
    mesh = make_mesh(n_data=4, n_model=1)
    dp = perplexity(params, config, toks, 16, "xla", batch=4, mesh=mesh)
    np.testing.assert_allclose(dp, single, rtol=1e-5)


def test_pipeline_parallel_matches_single_device():
    """GPipe pipeline over a 4-stage mesh: logits equal model_forward's
    (dense BF16-free f32 tiny model; exact same math, scan vs unrolled)."""
    from paroquant_tpu.parallel.pipeline import make_pp_mesh, pipeline_logits

    config = dataclasses.replace(PRESETS["tiny"], num_hidden_layers=4)
    params = init_params(config, jax.random.PRNGKey(7), dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, config.vocab_size, (8, 8)), jnp.int32
    )
    ref, _ = model_forward(params, config, tokens)
    mesh = make_pp_mesh(4)
    got = pipeline_logits(params, config, tokens, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_parallel_quantized():
    """PP over W4 layers (quantized linears stack + scan like dense ones)."""
    from paroquant_tpu.parallel.pipeline import make_pp_mesh, pipeline_logits

    config = dataclasses.replace(PRESETS["tiny"], num_hidden_layers=4)
    params = init_params(config, jax.random.PRNGKey(8), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64)
    ref, _ = model_forward(qparams, config, tokens := jnp.asarray(
        np.random.default_rng(8).integers(0, config.vocab_size, (8, 8)), jnp.int32
    ))
    mesh = make_pp_mesh(2)
    got = pipeline_logits(qparams, config, tokens, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_parallel_rejects_unsupported():
    from paroquant_tpu.parallel.pipeline import make_pp_mesh, pipeline_logits

    config = PRESETS["tiny-moe"]
    params = init_params(config, jax.random.PRNGKey(9), dtype=jnp.float32)
    tokens = jnp.zeros((4, 8), jnp.int32)
    with pytest.raises(ValueError, match="MoE"):
        pipeline_logits(params, config, tokens, make_pp_mesh(2))


# ---------------------------------------------------------------------------
# Fused Pallas kernels under TP (round-3 VERDICT item 1): the flagship
# kernels launch per device inside shard_map (parallel/tp.py) instead of
# being GSPMD-replicated. On the CPU mesh the kernels run in interpret mode;
# the composition (specs, permutations, psums, tuple outputs) is the same
# code that serves on a pod.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fused_setup():
    """128-channel groups everywhere; widths divide a model axis of 2."""
    from paroquant_tpu.models.decoder import merge_projections

    config = dataclasses.replace(
        PRESETS["tiny"], hidden_size=256, intermediate_size=512,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
    )
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=128, seed=1)
    qparams = merge_projections(qparams, config)
    return config, qparams


def test_tp_wrappers_match_plain_forward(fused_setup):
    """Unit equality: col is bitwise (independent columns), row/merged to
    f32-reassociation ulps, for both the fused kernel and the xla path."""
    from jax.sharding import Mesh

    from paroquant_tpu.ops.qlinear import (
        merged_linear_forward, quantized_linear_forward,
    )
    from paroquant_tpu.parallel.tp import (
        TPMergedLinear, TPQuantizedLinear, tp_linear_forward,
        tp_merged_forward_split, tp_permute_merged,
    )

    config, qparams = fused_setup
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    lp = qparams["layers"][0]
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, config.hidden_size)),
        jnp.float32,
    )
    for mode in ("fused", "xla", "w4a8_fused"):
        qkv = lp["qkv_proj"]
        ref = merged_linear_forward(qkv, x, mode=mode)
        parts_ref = jnp.split(ref, qkv.split_points, axis=-1)
        tm = TPMergedLinear(inner=tp_permute_merged(qkv, 2), mesh=mesh)
        parts = tp_merged_forward_split(tm, x, mode)
        for a, b in zip(parts_ref, parts):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
        o = lp["o_proj"]
        xo = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 3, o.in_features)),
            jnp.float32,
        )
        y_ref = quantized_linear_forward(o, xo, mode=mode)
        y = tp_linear_forward(
            TPQuantizedLinear(inner=o, kind="row", mesh=mesh), xo, mode)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        y2 = tp_linear_forward(
            TPQuantizedLinear(inner=o, kind="col", mesh=mesh), xo, mode)
        # col is exact up to the backend dot's K-summation order (Eigen on
        # CPU re-blocks by output width); engine token equality below is the
        # end-to-end contract
        np.testing.assert_allclose(
            np.asarray(y2), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_engine_tp_fused_matches_single_device(fused_setup):
    """Engine(mesh=..., quant_mode="fused"/"w4a8"/"auto"): greedy tokens ==
    the single-device engine under the SAME mode — the TP serving path runs
    the flagship kernels, not the xla fallback."""
    from jax.sharding import Mesh

    from paroquant_tpu.parallel.tp import TPMergedLinear, TPQuantizedLinear
    from paroquant_tpu.serve import Engine, SamplingParams

    config, qparams = fused_setup
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(0, config.vocab_size, n)) for n in (6, 13)]
    sp = SamplingParams(max_tokens=8, temperature=0.0)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))

    for qm, burst in (("fused", 1), ("fused", 3), ("w4a8", 1), ("auto", 1)):
        ref = [Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                      quant_mode=qm, cache_dtype=jnp.float32
                      ).generate_sync(p, sp) for p in prompts]
        eng = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                     quant_mode=qm, cache_dtype=jnp.float32, mesh=mesh,
                     decode_burst=burst)
        got = [eng.generate_sync(p, sp) for p in prompts]
        assert got == ref, (qm, burst, got, ref)
        # the engine's params must actually be TP-wrapped (kernel-serving)
        lp = eng.params["layers"][0]
        assert isinstance(lp["qkv_proj"], TPMergedLinear)
        assert isinstance(lp["o_proj"], TPQuantizedLinear)


@pytest.mark.slow
def test_tp_fused_ineligible_layer_falls_back(fused_setup):
    """Wrap eligibility: a merged layer whose partition widths don't divide
    the mesh axis stays unwrapped (GSPMD fallback), and wrapped layers under
    quant_mode="auto" route through the shard_map-xla path when the fused
    kernel is unavailable — tokens still match the single-device engine."""
    from jax.sharding import Mesh

    from paroquant_tpu.ops.qlinear import MergedQuantizedLinear
    from paroquant_tpu.parallel.tp import TPMergedLinear, _wrap_merged
    from paroquant_tpu.serve import Engine, SamplingParams

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    fake = MergedQuantizedLinear(
        qweight=jnp.zeros((64, 145), jnp.uint8), scales=jnp.zeros((1, 145)),
        zeros=jnp.zeros((1, 145)), rot=jnp.zeros((2, 1, 128, 128)),
        bias=None, out_splits=(96, 49),
    )
    assert not isinstance(_wrap_merged(fake, mesh, "model", 2), TPMergedLinear)

    # group_size=64 model: the Pallas tiling rejects S=64 multi-group, so
    # "auto" resolves to xla — wrapped layers must serve through the
    # shard_map-xla route and match the single-device engine exactly
    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64, seed=2)
    rng = np.random.default_rng(5)
    prompt = list(rng.integers(0, config.vocab_size, 7))
    sp = SamplingParams(max_tokens=6, temperature=0.0)
    ref = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="auto", cache_dtype=jnp.float32
                 ).generate_sync(prompt, sp)
    eng = Engine(qparams, config, max_batch=2, max_len=64, page_size=8,
                 quant_mode="auto", cache_dtype=jnp.float32, mesh=mesh)
    got = eng.generate_sync(prompt, sp)
    assert got == ref, (got, ref)
    from paroquant_tpu.parallel.tp import TPQuantizedLinear

    assert isinstance(eng.params["layers"][0]["o_proj"], TPQuantizedLinear)


@pytest.mark.slow
def test_paged_attention_kernel_headsharded(fused_setup):
    """paged_decode_step / paged_verify_step with attn_mode="kernel" under a
    TP mesh: the Pallas attention kernels launch per device on their head
    shard (serve.paged._headshard_attn) and match the single-device kernel
    step exactly."""
    from jax.sharding import Mesh

    from paroquant_tpu.serve.paged import (
        PagedKVCache, paged_decode_step, paged_verify_step,
    )

    config, qparams = fused_setup
    B, ps, n_pages = 2, 8, 12
    cache = PagedKVCache.create(config, n_pages + 1, ps, jnp.float32, batch=B)
    rng = np.random.default_rng(3)
    # prefill a few tokens through the decode step itself (simplest setup)
    page_table = np.full((B, 4), n_pages, np.int32)  # default to trash page
    page_table[0, :2] = [0, 1]
    page_table[1, :2] = [2, 3]
    seq_lens = np.asarray([5, 3], np.int32)
    toks = jnp.asarray(rng.integers(0, config.vocab_size, B), jnp.int32)

    ref_logits, ref_cache = paged_decode_step(
        qparams, config, toks, jnp.asarray(seq_lens), jnp.asarray(page_table),
        cache, quant_mode="fused", attn_mode="kernel")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    tp_logits, tp_cache = paged_decode_step(
        qparams, config, toks, jnp.asarray(seq_lens), jnp.asarray(page_table),
        cache, quant_mode="fused", attn_mode="kernel", attn_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tp_cache.k), np.asarray(ref_cache.k), rtol=1e-6, atol=1e-6)

    windows = jnp.asarray(rng.integers(0, config.vocab_size, (B, 3)), jnp.int32)
    ref_t, ref_l, ref_0, _ = paged_verify_step(
        qparams, config, windows, jnp.asarray(seq_lens),
        jnp.asarray(page_table), cache, n_pages, quant_mode="fused",
        attn_mode="kernel")
    tp_t, tp_l, tp_0, _ = paged_verify_step(
        qparams, config, windows, jnp.asarray(seq_lens),
        jnp.asarray(page_table), cache, n_pages, quant_mode="fused",
        attn_mode="kernel", attn_mesh=mesh)
    assert np.array_equal(np.asarray(tp_t), np.asarray(ref_t))
    np.testing.assert_allclose(
        np.asarray(tp_l), np.asarray(ref_l), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_flash_prefill_attention_headsharded():
    """make_tp_flash_attn: the flash prefill kernel under a TP mesh launches
    per device on its head shard and matches the einsum reference; shapes
    the flash tiling rejects fall back to einsum inside the impl. kv is
    HEAD-MAJOR [B, Hkv, S, D] (the layer_forward attn-impl convention)."""
    from jax.sharding import Mesh

    from paroquant_tpu.models.decoder import attention_kvmajor
    from paroquant_tpu.parallel.tp import make_tp_flash_attn

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    impl = make_tp_flash_attn(mesh)
    rng = np.random.default_rng(0)
    B, T, Hq, Hkv, D = 2, 128, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    valid = jnp.asarray(T, jnp.int32)
    ref = attention_kvmajor(q, k, v, pos, valid, scale=D**-0.5)
    out = impl(q, k, v, pos, valid, scale=D**-0.5, sliding_window=None,
               logit_softcap=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # short chunk (T=16): flash tiling rejects -> einsum fallback, exact
    out2 = impl(q[:, :16], k, v, pos[:, :16], valid, scale=D**-0.5,
                sliding_window=None, logit_softcap=None)
    ref2 = attention_kvmajor(q[:, :16], k, v, pos[:, :16], valid,
                             scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_tp_flash_fallback_counter():
    """make_tp_flash_attn(on_fallback=...) fires once per traced shape that
    misses the flash gating, and never on shapes that take the kernel
    (VERDICT r4 weak #6: the einsum fallback must be countable, not
    silent)."""
    from jax.sharding import Mesh

    from paroquant_tpu.parallel.tp import make_tp_flash_attn

    seen = []
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    impl = make_tp_flash_attn(mesh, on_fallback=seen.append)
    rng = np.random.default_rng(1)
    B, T, Hq, Hkv, D = 1, 128, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    valid = jnp.asarray(T, jnp.int32)
    kw = dict(scale=D**-0.5, sliding_window=None, logit_softcap=None)
    impl(q, k, v, pos, valid, **kw)  # flash-eligible: no fallback
    assert seen == []
    # S_kv=384 (chunked-prefill kv buffer: bucket 128 + chunk 256): a
    # 128-multiple but NOT a 256-multiple — the adaptive block_k keeps it
    # on the flash path and it must match the einsum reference
    from paroquant_tpu.models.decoder import attention_kvmajor

    k3 = jnp.concatenate([k, k, k], axis=2)
    v3 = jnp.concatenate([v, v, v], axis=2)
    valid3 = jnp.asarray(200, jnp.int32)  # partial fill, like a real bucket
    out384 = impl(q, k3, v3, pos + 72, valid3, **kw)
    assert seen == []
    ref384 = attention_kvmajor(q, k3, v3, pos + 72, valid3, **kw)
    np.testing.assert_allclose(np.asarray(out384), np.asarray(ref384),
                               rtol=2e-5, atol=2e-5)
    impl(q[:, :80], k, v, pos[:, :80], valid, **kw)  # T=80: rejected
    assert len(seen) == 1 and seen[0]["T"] == 80 and seen[0]["tp"] == 2
    # odd head count vs TP degree: rejected with the offending fields
    q3 = jnp.asarray(rng.standard_normal((B, T, 3, D)), jnp.float32)
    impl(q3, k[:, :1], v[:, :1], pos, valid, **kw)
    assert len(seen) == 2 and seen[1]["Hq"] == 3


def test_make_multihost_mesh_host_contiguous(monkeypatch):
    """make_multihost_mesh puts each host's devices contiguous on the model
    axis (TP collectives ride ICI, DP rides DCN) for 2 hosts x 4 devices,
    and dp_per_host splits a host into several model groups (VERDICT r4
    weak #5: the helper had zero coverage)."""
    from paroquant_tpu.parallel.multihost import make_multihost_mesh

    devices = jax.devices()  # 8 virtual CPU devices
    assert len(devices) == 8
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    per_host = 4  # devices 0-3 = "host 0", 4-7 = "host 1" (host-major order)

    mesh = make_multihost_mesh()  # dp_per_host=1 -> (data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    for row in mesh.devices:  # each model row must live inside one host
        hosts = {devices.index(d) // per_host for d in row}
        assert len(hosts) == 1, mesh.devices

    mesh2 = make_multihost_mesh(dp_per_host=2)  # (data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    for row in mesh2.devices:
        hosts = {devices.index(d) // per_host for d in row}
        assert len(hosts) == 1, mesh2.devices
    # the two model groups of one host are adjacent data rows
    assert {devices.index(d) for d in mesh2.devices[0]} | \
           {devices.index(d) for d in mesh2.devices[1]} == {0, 1, 2, 3}

    # dp_per_host must divide the per-host device count
    with pytest.raises(AssertionError):
        make_multihost_mesh(dp_per_host=3)
