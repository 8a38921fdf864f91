"""Batched-decode accounting at 7B geometry (VERDICT r3 item 5).

Round-3 recorded B=32 at 875 tok/s = 14% of B*SoL with no breakdown. This
script decomposes the B=32 decode step (same greedy_decode_scan protocol as
scripts/bench_7b.py) two ways:

1. DEVICE PROFILE (the authoritative accounting): jax.profiler.trace of one
   scan dispatch, parsed with jax.profiler.ProfileData. Every XLA-Ops event
   on the TPU plane is bucketed by HLO opcode/name:
     - quant matmuls  (pallas custom-calls: rot_w4 / w4a8 kernels)
     - attention      (dots + their softmax/masking fusions)
     - kv update      (dynamic-update-slice fusions)
     - sampler        (iota/reduce argmax fusions)
     - glue           (norms, rope, residual adds — remaining fusions)
     - copies / infeed / everything else
   Device-busy vs wall also falls out (dispatch amortization of the scan).
2. A/B ablation: the same scan with attention replaced by identity
   (model_forward takes callables as attn_mode) — cross-checks the
   attention bucket without trusting name matching.

The round-4 first cut used isolated per-matmul timing chains instead of a
profile; at M=32 the chained kernels serialize against their own data
dependence and over-count 3x (63ms of "parts" inside a 21.6ms step), so
that methodology is dead — kept only as the cautionary note here.

Also times the scan at --tokens 64 and 128 (bench_7b's length) because the
first cut measured 1480 tok/s agg where bench_7b recorded 875: cache length
and scan length change the per-step cost materially at B=32.

All numbers are device-side per-step times from N-step scan chains
(min-of-reps; the relay's dispatch noise amortizes over the chain).
Prints one JSON line per --tokens value.
"""

from __future__ import annotations

import glob
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from paroquant_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def identity_attn(q, k, v, q_pos, valid, **kw):
    return q  # [B, T, Hq, D] — attention ablated, shapes preserved


def timed(fn, *args, reps=3):
    """min-of-reps wall seconds of fn(*args) (fn must block)."""
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def bucket_of(name: str) -> str:
    """Map an XLA-Ops event (HLO text) to an accounting bucket."""
    if "custom-call" in name:
        if "rot_w4" in name or "w4" in name or "paro" in name:
            return "quant_matmuls"
        return "other_custom_call"
    if "dynamic-update-slice" in name or "dynamic_update" in name:
        return "kv_update"
    if "iota" in name and ("reduce" in name or "fusion" in name):
        return "sampler_argmax"
    if name.lstrip("%").startswith(("convolution", "dot")):
        return "attention_dots"
    if "copy" in name:
        return "copies"
    if "fusion" in name:
        return "fusions_glue"
    return "other"


def profile_scan(run_once) -> dict:
    """Trace ONE scan dispatch; aggregate TPU XLA-Ops by bucket (ms).

    run_once must accept trace_dir= and wrap ONLY the greedy_decode_scan
    call in jax.profiler.trace(trace_dir) — cache create / prefill / the
    prefill argmax run OUTSIDE the trace, so the per-step buckets (divided
    by N) and the dispatch-overhead residual (wall − device) account decode
    ops only (round-4 advisor: tracing the whole once() inflated the decode
    buckets with prefill ops)."""
    import jax

    d = tempfile.mkdtemp(prefix="acct_prof_")
    run_once(trace_dir=d)
    files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    buckets: dict[str, float] = {}
    top: dict[str, float] = {}
    for pl in pd.planes:
        if not pl.name.startswith("/device:TPU"):
            continue
        for ln in pl.lines:
            if ln.name != "XLA Ops":
                continue
            for e in ln.events:
                # skip control-flow wrappers (while/conditional/call): their
                # duration spans the body ops, which are reported separately.
                # Match both full-HLO-text names ("%w = ... while(...)") and
                # short op names ("while.1") — ProfileData emits either
                # depending on version (round-4 advisor).
                bare = e.name.split(" = ")[0].lstrip("%")
                if (" while(" in e.name or " conditional(" in e.name
                        or bare.startswith(("while", "conditional", "call"))):
                    continue
                ms = e.duration_ns / 1e6
                b = bucket_of(e.name)
                buckets[b] = buckets.get(b, 0.0) + ms
                # bucket-prefixed keys so catch-all buckets (other_custom_
                # call / other) are attributable from the top-ops list
                top[f"{b}:{bare}"] = top.get(f"{b}:{bare}", 0.0) + ms
    top_ops = sorted(top.items(), key=lambda kv: -kv[1])[:16]
    return {
        "buckets_ms": {k: round(v, 2) for k, v in
                       sorted(buckets.items(), key=lambda kv: -kv[1])},
        "top_ops_ms": [(k, round(v, 2)) for k, v in top_ops],
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tokens", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--preset", default="llama-2-7b",
                    help="llama-2-7b (protocol) or a tiny preset for smoke")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paroquant_tpu.models import KVCache
    from paroquant_tpu.models.decoder import greedy_decode_scan, prefill

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_7b import build_quantized_llama7b

    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        if args.preset == "llama-2-7b":
            params, cfg = build_quantized_llama7b()
        else:
            import dataclasses

            from paroquant_tpu.convert import quantize_model_rtn
            from paroquant_tpu.models import PRESETS, init_params

            cfg = dataclasses.replace(
                PRESETS[args.preset], hidden_size=256, intermediate_size=512,
                num_attention_heads=4, num_key_value_heads=2, head_dim=64)
            dense = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
            params = quantize_model_rtn(dense, cfg, n_bits=4, group_size=128,
                                        quantize_lm_head=True)
        from paroquant_tpu.models.decoder import merge_projections

        params = merge_projections(params, cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    jax.block_until_ready(jax.tree.leaves(params["layers"][0])[0])
    print(f"built+shipped {args.preset} in {time.time()-t0:.0f}s", flush=True)

    B = args.batch
    rng = np.random.default_rng(1)
    prompt = jax.device_put(
        jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 16)), jnp.int32), dev)

    for N in args.tokens:
        def make_run(attn_mode, N=N):
            def once(trace_dir=None):
                import contextlib

                cache = KVCache.create(cfg, B, 16 + N + 8, jnp.bfloat16)
                logits, c = prefill(params, cfg, prompt, cache,
                                    quant_mode="fused")
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                np.asarray(tok)
                ctx = (jax.profiler.trace(trace_dir) if trace_dir
                       else contextlib.nullcontext())
                t0 = time.perf_counter()
                with ctx:
                    toks, _ = greedy_decode_scan(
                        params, cfg, tok, c, N, quant_mode="fused",
                        attn_mode=attn_mode)
                    np.asarray(toks)
                return (time.perf_counter() - t0) / N
            return once

        full_run = make_run("einsum")
        full_run()  # compile
        full = min(full_run() for _ in range(3))
        noat_run = make_run(identity_attn)
        noat_run()
        no_attn = min(noat_run() for _ in range(3))

        prof = profile_scan(full_run)
        dev_ms = sum(prof["buckets_ms"].values())
        out = {
            "metric": "b32_decode_accounting_7b",
            "batch": B,
            "tokens": N,
            "step_ms_full": round(full * 1e3, 2),
            "attention_ms_ab (full - identity-attn)": round(
                (full - no_attn) * 1e3, 2),
            "device_profile_per_step_ms": {
                k: round(v / N, 3) for k, v in prof["buckets_ms"].items()},
            "device_busy_ms_per_step": round(dev_ms / N, 2),
            "dispatch_overhead_ms_per_step (wall - device)": round(
                full * 1e3 - dev_ms / N, 2),
            "top_ops_us_per_step": {
                k: round(v / N * 1e3, 1) for k, v in prof["top_ops_ms"]},
            "agg_tok_s": round(B / full, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
