"""OpenAI-compatible serving CLI (reference cli/serve.py).

    python -m paroquant_tpu.cli.serve --model <dir> --port 8000
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="Serve a PARO-TPU model (OpenAI API)")
    ap.add_argument("--model", required=True, help="model directory (PARO/HF checkpoint)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--quant-mode", default=None, choices=["xla", "fused", "auto", "w4a8"])
    ap.add_argument("--decode-burst", type=int, default=None,
                    help="decode steps fused per dispatch (default: 8 on TPU, 1 on CPU)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help=">0: prompt-lookup speculative decoding for "
                         "greedy request batches (exact outputs)")
    ap.add_argument("--prefix-caching", action="store_true",
                    help="share full prompt-prefix pages across requests (vLLM-style APC)")
    ap.add_argument("--kv-quant", default=None, choices=["int8"],
                    help="quantize the paged KV cache (vLLM --kv-cache-dtype "
                         "counterpart): ~2x KV capacity and ~2x less "
                         "attention HBM traffic at long context")
    ap.add_argument("--dp", type=int, default=1,
                    help="request-level data parallelism: N engine replicas "
                         "over disjoint device groups, least-loaded routing")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel size per replica (default: all of "
                         "the replica's devices)")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="admission control: shed load (HTTP 429) once this "
                         "many requests wait per replica (default: unbounded)")
    ap.add_argument("--served-model-name", default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the prefill buckets + decode variants "
                         "before accepting traffic (first-request latency)")
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    args = ap.parse_args(argv)

    from ..utils import force_platform

    force_platform(args.device)

    from ..convert import load_checkpoint
    from ..serve.api import Server
    from ..serve.engine import Engine
    from ..serve.generator import detect_backend, load_tokenizer

    params, config = load_checkpoint(args.model)
    tokenizer = load_tokenizer(args.model)
    on_tpu = detect_backend() == "tpu"
    qmode = args.quant_mode or ("auto" if on_tpu else "xla")
    burst = args.decode_burst if args.decode_burst is not None else (8 if on_tpu else 1)

    def make_engine(mesh=None):
        return Engine(
            params, config, tokenizer,
            max_batch=args.max_batch, max_len=args.max_len, page_size=args.page_size,
            quant_mode=qmode, decode_burst=burst,
            prefix_caching=args.prefix_caching, spec_k=args.spec_k, mesh=mesh,
            kv_quant=args.kv_quant, max_queue=args.max_queue,
        )

    if args.dp > 1 or args.tp:
        # 2-D serving layout: TP over ICI inside each replica, request-level
        # DP between replicas (dp=1 with --tp is plain tensor parallelism)
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from ..serve.router import EngineRouter

        devs = np.array(jax.devices())
        per = args.tp or max(len(devs) // args.dp, 1)
        if args.dp * per > len(devs):
            raise SystemExit(
                f"--dp {args.dp} x tp {per} needs {args.dp * per} devices, "
                f"have {len(devs)}"
            )
        replicas = [
            make_engine(Mesh(devs[i * per:(i + 1) * per].reshape(1, per),
                             ("data", "model")))
            for i in range(args.dp)
        ]
        engine = replicas[0] if len(replicas) == 1 else EngineRouter(replicas)
    else:
        engine = make_engine()
    processor = None
    if config.is_vlm:  # image templating + pixel preprocessing for chat images
        try:
            from transformers import AutoProcessor

            processor = AutoProcessor.from_pretrained(str(args.model))
        except Exception:
            print("VLM checkpoint without loadable processor; chat image "
                  "content disabled (raw pixel_values still accepted)")
    name = args.served_model_name or str(args.model).rstrip("/").split("/")[-1]
    if args.warmup:
        import numpy as _np

        from ..serve.sampling import SamplingParams as _SP

        rng = _np.random.default_rng(0)
        replicas = engine.engines if hasattr(engine, "engines") else [engine]
        L = 16
        warm_toks = (burst + 1) if burst > 1 else 2
        while L < min(args.max_len, 2048):
            print(f"warmup: bucket {L}", flush=True)
            for e in replicas:
                e.generate_sync(
                    list(rng.integers(0, config.vocab_size, L - 1)),
                    _SP(max_tokens=warm_toks, temperature=0.0),
                )
            L *= 2
    print(f"serving {name} on {args.host}:{args.port} (quant_mode={qmode})")
    Server(engine, name, processor=processor).run(args.host, args.port)


if __name__ == "__main__":
    main()
