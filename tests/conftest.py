"""Test harness config: run on CPU with 8 virtual devices.

Multi-chip sharding (pjit/shard_map collectives) is validated on a virtual
CPU mesh, the standard JAX approach when pod hardware isn't attached.
"""

import os

# The axon boot shim exports JAX_PLATFORMS=axon; force-override (not
# setdefault) so the suite runs on the virtual CPU mesh, not the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
# single-threaded Eigen keeps CPU matmul reduction order (and therefore
# greedy argmax on near-tie logits) deterministic run to run
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_multi_thread_eigen=false"
)
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# tests must not write the shared persistent compilation cache: concurrent
# writers (a TPU bench in another process) segfaulted the suite mid-run in
# jax's cache serializer, and tiny CPU compiles gain nothing from it
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound single-process compile-state growth: a flaky XLA-CPU segfault
    (inside backend_compile_and_load) appears after ~170-200 accumulated
    compilations in one process (observed twice in round 3 at different
    tests). Dropping the tracing/executable caches between modules keeps
    the serial `pytest tests/` run inside the safe envelope; xdist (-n 4)
    remains the fast path."""
    yield
    jax.clear_caches()

# Tests measured >=12s single-threaded (xdist --durations, round 3). Marked
# centrally so `pytest -m fast` gives a quick CI tier; everything else is
# `fast`. Run the full suite with `-n 4` (pytest-xdist) — it also bounds
# per-process lifetime, which avoids a flaky XLA-CPU crash seen after ~160
# tests in one process.
SLOW_TESTS = {
    "test_awq_format_import", "test_paro_tpu_roundtrip",
    "test_gemma3n_incremental_decode_matches_full",
    "test_gemma3n_prefill_logits_match", "test_gemma3n_calibration_smoke",
    "test_gemma3n_decode_with_cache_matches_prefill",
    "test_gemma3n_flash_prefill_matches_einsum", "test_hadamard_model_level",
    "test_merged_projections_match_unmerged",
    "test_kv_cache_matches_full_forward", "test_core_family_hf_parity",
    "test_gemma_forward_and_cache", "test_llama_forward_and_cache",
    "test_mixtral_hf_parity", "test_calibrate_moe_model_and_checkpoint",
    "test_calibrate_host_paged_matches_resident",
    "test_calibrate_hybrid_delta_net_layers", "test_calibrate_model_end_to_end",
    "test_hybrid_checkpoint_round_trip",
    "test_dp_sharded_calibration_matches_single_device",
    "test_engine_tp_gemma3n_matches_single_device",
    "test_engine_tp_hybrid_matches_single_device",
    "test_engine_tp_matches_single_device", "test_tp_decode_with_sharded_cache",
    "test_qwen3_next_chunk_boundary", "test_qwen3_next_engine_matches_generator",
    "test_qwen3_next_incremental_decode_matches_full",
    "test_qwen3_next_prefill_logits_match",
    "test_engine_matches_generator_greedy",
    "test_engine_matches_generator_greedy_gemma3n",
    "test_engine_scheduler_fuzz_batch_independence",
    "test_paged_decode_matches_contiguous",
    "test_paged_decode_matches_contiguous_gemma",
    "test_paged_decode_matches_contiguous_gemma3n",
    "test_speculative_lookup_matches_greedy",
    "test_vlm_api_completions_with_pixels", "test_vlm_engine_matches_generator",
    "test_vlm_prefill_logits_match_hf", "test_graft_entry_smoke",
    "test_gptq_moe_experts_quantized", "test_quarot_moe_runs",
    "test_gptq_remainder_batch_not_dropped",
    "test_engine_chunked_prefill_flash_matches_einsum",
    "test_calibrate_gptq_init_not_worse", "test_gptq_hybrid_delta_net_layers",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[", 1)[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
