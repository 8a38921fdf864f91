"""Perplexity evaluation CLI (reference cli/evaluate.py:14-23,46-74).

Protocol parity: non-overlapping windows of --seqlen tokens, mean token
cross-entropy, PPL = exp(mean CE). Datasets: WikiText-2 test / C4 validation
when available locally (HF datasets cache — this box has zero egress), a raw
token .npy file via --token-file, or --synthetic for infrastructure checks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_eval_tokens(name: str, tokenizer, n_tokens: int, seed: int = 0) -> np.ndarray:
    if name == "wikitext2":
        from datasets import load_dataset

        data = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        text = "\n\n".join(data["text"])
        return np.asarray(tokenizer(text).input_ids[:n_tokens], np.int32)
    if name == "c4":
        from datasets import load_dataset

        data = load_dataset(
            "allenai/c4", data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
            split="validation",
        )
        rng = np.random.default_rng(seed)
        ids: list[int] = []
        idx = rng.permutation(len(data))
        for i in idx:
            ids.extend(tokenizer(data[int(i)]["text"]).input_ids)
            if len(ids) >= n_tokens:
                break
        return np.asarray(ids[:n_tokens], np.int32)
    raise ValueError(name)


def perplexity(params, config, tokens: np.ndarray, seqlen: int, quant_mode: str,
               batch: int = 1, mesh=None, sp_mesh=None,
               chunk_ce: int = 2048) -> float:
    """exp(mean CE) over non-overlapping seqlen windows (evaluate.py:61-74).

    mesh: optional jax.sharding.Mesh with a "data" axis — windows shard
    batch-wise (GSPMD data parallelism for eval sweeps, SURVEY §2.6 DP row);
    a tail batch that doesn't divide the axis runs replicated.
    sp_mesh: optional Mesh with an "sp" axis — each window's SEQUENCE axis
    shards over the ring (parallel/ring.sp_prefill): very long windows whose
    activations/scores exceed one chip. Mutually exclusive with mesh."""
    import jax
    import jax.numpy as jnp

    from ..models.decoder import model_forward

    n_win = len(tokens) // seqlen
    assert n_win > 0, "not enough tokens for one window"
    # Pallas flash prefill for the 2048-token windows on real TPUs (einsum
    # materializes [B, H, T, T] f32 scores — 4GB/window at 8B geometry);
    # model_forward falls back to einsum when shapes don't block-align
    attn_mode = "einsum" if jax.devices()[0].platform == "cpu" else "flash"

    data_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(mesh, P()))
        data_sh = NamedSharding(mesh, P("data"))

    if sp_mesh is not None:
        assert mesh is None, "--dp and --sp are mutually exclusive"
        from ..parallel.ring import sp_prefill

        @jax.jit
        def _sp_ce(logits, tok):
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            tgt = tok[:, 1:]
            ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return jnp.sum(ce), ce.size

        def window_ce(tok):
            logits = sp_prefill(params, config, tok, sp_mesh,
                                quant_mode=quant_mode)
            return _sp_ce(logits, tok)
    else:
        # params ride as jit ARGS, not closure captures: closing over an 8B
        # pytree baked ~6.5GB of weights into the lowering as constants
        # (observed OOM-class stall on the 16k-window drive)
        from ..models.decoder import lm_head_logits

        # long windows: a [T, V] f32 logits tensor is T*V*4 bytes (~10GB at
        # 16k x 152k — OOMed the chip); compute the lm_head + CE in token
        # chunks over the final hidden states instead
        chunk = chunk_ce
        chunked = (seqlen > chunk and seqlen % chunk == 0
                   and not getattr(config, "is_gemma3n", False))

        @jax.jit
        def _window_ce(p, tok):
            if not chunked:
                logits, _ = model_forward(
                    p, config, tok, None,
                    quant_mode=quant_mode, attn_mode=attn_mode)
                logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
                tgt = tok[:, 1:]
                ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
                return jnp.sum(ce), ce.size
            hidden, _ = model_forward(
                p, config, tok, None, quant_mode=quant_mode,
                attn_mode=attn_mode, return_hidden=True)
            total = jnp.zeros((), jnp.float32)
            for t0 in range(0, seqlen, chunk):
                h_c = hidden[:, t0 : t0 + chunk]
                logits = lm_head_logits(p, config, h_c, quant_mode)
                logp = jax.nn.log_softmax(logits, axis=-1)
                # target for position t is token t+1; the window's final
                # position has no target
                tgt = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(tok, ((0, 0), (0, 1))), t0 + 1, chunk, axis=1)
                ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
                valid = (t0 + jnp.arange(chunk)) < seqlen - 1
                total = total + jnp.sum(ce * valid[None, :])
            return total, tok.shape[0] * (seqlen - 1)

        def window_ce(tok):
            return _window_ce(params, tok)

    total, count = 0.0, 0
    for w in range(0, n_win, batch):
        nb = min(batch, n_win - w)
        win = tokens[w * seqlen : (w + nb) * seqlen].reshape(nb, seqlen)
        arr = jnp.asarray(win, jnp.int32)
        if data_sh is not None and nb % mesh.shape["data"] == 0:
            arr = jax.device_put(arr, data_sh)
        s, c = window_ce(arr)
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--datasets", nargs="+", default=["wikitext2", "c4"])
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--num-tokens", type=int, default=2048 * 128)
    ap.add_argument("--token-file", default=None, help=".npy int token ids")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--quant-mode", default=None, choices=["xla", "fused", "auto", "w4a8"])
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--batch", type=int, default=1, help="windows per forward")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel eval: shard window batches over a "
                         "--dp-device mesh (dp must divide batch; batch is "
                         "rounded up to a multiple of dp if needed)")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel eval: shard each window's token "
                         "axis over an sp-device ring (parallel/ring.py) — "
                         "for --seqlen too long for one chip; excludes --dp")
    args = ap.parse_args(argv)

    from ..utils import force_platform

    force_platform(args.device)

    from ..convert import load_checkpoint
    from ..serve.generator import detect_backend, load_tokenizer

    params, config = load_checkpoint(args.model)
    qmode = args.quant_mode or ("auto" if detect_backend() == "tpu" else "xla")
    if qmode == "w4a8":
        # Quality eval must reflect the numerics SERVED at decode: full
        # 2048-token windows are far above the fused-kernel M crossover, so
        # "w4a8" would silently resolve to the exact W4A16 path and measure
        # nothing (round-3 ADVICE). Force the a8 activation-rounding sim on
        # every token instead — the per-(token, group) quantizer is
        # batch-composition independent, so per-token numerics match the
        # fused decode kernel up to f32 summation order.
        print("note: --quant-mode w4a8 evaluates the a8 activation-rounding "
              "numerics on all tokens (the served decode operating point)")
        qmode = "w4a8_xla"
    mesh = None
    if args.dp > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=args.dp, n_model=1)
        if args.batch % args.dp:
            new_b = args.dp * max(args.batch // args.dp, 1)
            print(f"note: --batch {args.batch} rounded to {new_b} "
                  f"(must be a multiple of --dp {args.dp})")
            args.batch = new_b
    sp_mesh = None
    if args.sp > 1:
        assert args.dp == 1, "--dp and --sp are mutually exclusive"
        import jax
        from jax.sharding import Mesh

        n_avail = len(jax.devices())
        if args.sp > n_avail:
            raise SystemExit(
                f"--sp {args.sp} > {n_avail} available devices — refusing "
                f"to silently build a smaller ring")
        sp_mesh = Mesh(np.array(jax.devices()[: args.sp]), ("sp",))
        assert args.seqlen % args.sp == 0, (args.seqlen, args.sp)
        # all quant modes run under SP: xla/w4a8_xla shard via GSPMD; fused/
        # auto wrap the quantized layers token-sharded (parallel/tp.py) so
        # each ring device launches the Pallas kernels on its own rows

    def run_ppl(toks):
        return perplexity(params, config, toks, args.seqlen, qmode,
                          batch=args.batch, mesh=mesh, sp_mesh=sp_mesh)

    if args.synthetic:
        rng = np.random.default_rng(0)
        toks = rng.integers(0, config.vocab_size, args.num_tokens).astype(np.int32)
        print(f"synthetic ppl: {run_ppl(toks):.4f}")
        return
    if args.token_file:
        toks = np.load(args.token_file).astype(np.int32)
        print(f"{args.token_file} ppl: {run_ppl(toks):.4f}")
        return

    tokenizer = load_tokenizer(args.model)
    if tokenizer is None:
        print("no tokenizer in model dir; use --token-file or --synthetic", file=sys.stderr)
        sys.exit(2)
    for name in args.datasets:
        toks = load_eval_tokens(name, tokenizer, args.num_tokens)
        print(f"{name} ppl: {run_ppl(toks):.4f}")


if __name__ == "__main__":
    main()
