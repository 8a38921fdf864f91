"""Generator abstraction: the L6 layer of the reference
(inference/base.py:35-154 — BaseGenerator/stream_generate/generate with
TTFT/latency/tok-s stats, build_prompt chat templating, create_generator
factory). One backend here (the JAX engine), so detect_backend collapses to
device inspection.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..models.config import ModelConfig
from ..models.decoder import KVCache, decode_step, model_forward, prefill
from .sampling import SamplingParams, sample_token


def _stream_burst_impl(
    params, config, logits, cache, key, counts,
    *, quant_mode, n_steps, temperature, top_p, top_k, repetition_penalty,
):
    """n_steps sample+decode steps fused into one dispatch (lax.scan), with
    the exact sampling-chain semantics of the step-by-step stream_generate
    loop (same key splits, same counts-update order) so emitted tokens are
    identical. Returns (toks [n_steps], final logits, cache, key, counts)."""

    def body(carry, _):
        logits, cache, key, counts = carry
        key, sub = jax.random.split(key)
        tok = sample_token(
            logits, sub, counts if repetition_penalty != 1.0 else None,
            temperature=temperature, top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty,
        )
        if repetition_penalty != 1.0:
            counts = counts.at[0, tok[0]].add(1)
        logits, cache = model_forward(
            params, config, tok[:, None], cache, quant_mode=quant_mode
        )
        logits = logits[:, -1, :]
        return (logits, cache, key, counts), tok[0]

    (logits, cache, key, counts), toks = jax.lax.scan(
        body, (logits, cache, key, counts), None, length=n_steps
    )
    return toks, logits, cache, key, counts


_STREAM_BURST_STATICS = (
    "config", "quant_mode", "n_steps", "temperature", "top_p", "top_k",
    "repetition_penalty",
)
_stream_burst_donate = partial(
    jax.jit, static_argnames=_STREAM_BURST_STATICS, donate_argnames=("cache",)
)(_stream_burst_impl)
_stream_burst_nodonate = partial(
    jax.jit, static_argnames=_STREAM_BURST_STATICS
)(_stream_burst_impl)


@partial(
    jax.jit,
    static_argnames=("config", "quant_mode", "temperature", "top_p", "top_k"),
)
def _verify_window_sampled(
    params, config, window, cache, key, d_len, quant_mode,
    temperature, top_p, top_k,
):
    """Sampled speculative verify: one forward over [1, 1+k] tokens, then
    the exact accept/reject math (sampling.spec_accept_sample) on device.
    Returns (tokens [1+k], n_accepted, raw logprobs [1+k], cache)."""
    from .sampling import spec_accept_sample

    logits, cache = model_forward(
        params, config, window, cache, quant_mode=quant_mode
    )
    toks, n_acc, lps = spec_accept_sample(
        logits[0].astype(jnp.float32), window[0, 1:], d_len, key,
        temperature=temperature, top_p=top_p, top_k=top_k,
    )
    return toks, n_acc, lps, cache


@partial(jax.jit, static_argnames=("config", "quant_mode"))
def _verify_window(params, config, window, cache, quant_mode):
    """Speculative verify: one forward over [1, 1+k] tokens (current token +
    k drafted continuations) starting at the cache offset. Returns the
    model's greedy next-token for every window position — the accept/reject
    evidence — plus the cache with the window's KV written."""
    logits, cache = model_forward(
        params, config, window, cache, quant_mode=quant_mode
    )
    toks = jnp.argmax(logits[0].astype(jnp.float32), axis=-1).astype(jnp.int32)
    return toks, cache


def _lookup_draft(ctx: list[int], k: int, max_ngram: int = 3) -> list[int]:
    """Prompt-lookup drafting (the draft-model-free speculative scheme, cf.
    vLLM's ngram speculator): find the most recent earlier occurrence of the
    longest suffix n-gram of the context and propose the k tokens that
    followed it. O(len(ctx)) host work per step, zero extra device memory.
    Long contexts route through the C++ scan (native/paropack.cpp) — this
    runs per slot per scheduler tick, so at 32k contexts the Python loop
    would become a real scheduler cost."""
    L = len(ctx)
    if L > 512:
        from ..ops.native_packing import native_lookup_draft

        d = native_lookup_draft(np.asarray(ctx, np.int32), max_ngram, k)
        if d is not None:
            return d
    for n in range(min(max_ngram, L - 1), 0, -1):
        pat = ctx[L - n:]
        for i in range(L - n - 1, -1, -1):
            if ctx[i : i + n] == pat:
                return ctx[i + n : i + n + k]  # nonempty: i + n < L
    return []


@dataclasses.dataclass
class GenerationStats:
    ttft: float = 0.0  # seconds to first token
    latency: float = 0.0  # total seconds
    num_tokens: int = 0

    @property
    def tokens_per_second(self) -> float:
        decode_time = max(self.latency - self.ttft, 1e-9)
        return max(self.num_tokens - 1, 0) / decode_time


@dataclasses.dataclass
class GenerationResult:
    token_ids: list[int]
    text: str
    stats: GenerationStats


def detect_backend() -> str:
    """Reference detect_backend (base.py:114-136) picks mlx/vllm/transformers
    by platform; here: 'tpu' when a TPU is attached, else 'cpu'."""
    platform = jax.devices()[0].platform
    return "tpu" if platform not in ("cpu",) else "cpu"


class Generator:
    """Single-stream generator over a (params, config) model.

    For production serving use serve.engine.Engine (continuous batching);
    this class mirrors the reference's simple generator used by
    chat/benchmark/evaluate.
    """

    def __init__(
        self,
        params: dict[str, Any],
        config: ModelConfig,
        tokenizer=None,
        *,
        max_len: int = 4096,
        quant_mode: str | None = None,
        cache_dtype=jnp.bfloat16,
        decode_burst: int = 1,
        lookup_spec_k: int = 0,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        # >1: sample+decode this many tokens per dispatch (one lax.scan);
        # amortizes the per-token host round-trip, tokens stream in bursts
        self.decode_burst = max(1, decode_burst)
        # >0: prompt-lookup speculative GREEDY decoding with k-token drafts.
        # Decode is HBM-bound (every step reads all weights once); verifying
        # k drafts in one forward emits n_accepted+1 exact greedy tokens per
        # weight read — a real tokens/s multiplier on repetitive text
        # (extraction, code, summaries). Applies only when temperature==0 and
        # the model has no recurrent (delta-net) state to roll back; other
        # requests silently take the normal path.
        self.lookup_spec_k = max(0, lookup_spec_k)
        self.spec_metrics = {"windows": 0, "drafted": 0, "accepted": 0}
        if quant_mode is None:
            # "auto" = fused Pallas at decode-sized M, XLA dequant-GEMM at
            # prefill-sized M (ops/qlinear.py AUTO_FUSED_MAX_M)
            quant_mode = "auto" if detect_backend() == "tpu" else "xla"
        self.quant_mode = quant_mode

    @classmethod
    def from_pretrained(cls, model_dir: str | Path, **kw) -> "Generator":
        from ..convert import load_checkpoint

        params, config = load_checkpoint(model_dir)
        tokenizer = load_tokenizer(model_dir)
        return cls(params, config, tokenizer, **kw)

    def build_prompt(
        self, messages: list[dict[str, str]], enable_thinking: bool = True
    ) -> list[int]:
        """Chat templating (reference base.py:88-104)."""
        if self.tokenizer is None:
            raise RuntimeError("no tokenizer available")
        try:
            return self.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True, enable_thinking=enable_thinking
            )
        except TypeError:  # template without thinking support
            return self.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True
            )

    def stream_generate(
        self, prompt_tokens: list[int], sp: SamplingParams,
        pixel_values: np.ndarray | None = None,
    ) -> Iterator[int]:
        """`pixel_values` [N_img, C, H, W] enables the image-text (VLM) path:
        the prompt's image_token_id runs are replaced by vision soft tokens
        (reference transformers backend AutoModelForImageTextToText,
        generator.py:26-34); decode afterwards is the ordinary text path."""
        spec = (
            self.lookup_spec_k > 0
            # penalty evolves token counts WITHIN a window — not expressible
            # in the one-shot accept/reject math, so penalized requests take
            # the sequential path (greedy: penalty shapes even argmax)
            and sp.repetition_penalty == 1.0
            and self.config.num_linear_layers == 0
            and not self.config.is_gemma3n
            # the last verify window writes up to k rows past the final
            # token; if max_len can't hold that slack, dynamic_update_slice
            # would CLAMP the write start and corrupt valid KV rows — fall
            # back to plain decoding instead
            and len(prompt_tokens) + sp.max_tokens + self.lookup_spec_k
            <= self.max_len
        )
        toks = np.asarray(prompt_tokens, np.int32)[None, :]
        cache = KVCache.create(
            self.config, 1,
            # speculation slack: the last verify window may write up to k
            # rows past the final accepted token (rolled back, never read)
            min(self.max_len,
                toks.shape[1] + sp.max_tokens + (self.lookup_spec_k if spec else 0)),
            self.cache_dtype,
        )
        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        counts = None
        if sp.repetition_penalty != 1.0:
            counts = np.zeros((1, self.config.vocab_size), np.int32)
            for t in prompt_tokens:
                counts[0, t] += 1
            counts = jnp.asarray(counts)

        if pixel_values is not None:
            if self.config.vision is None:
                raise ValueError("model has no vision tower; cannot take images")
            from ..models.vision import vlm_prefill_step

            logits, cache = vlm_prefill_step(
                self.params, self.config, jnp.asarray(toks),
                jnp.asarray(pixel_values), cache, quant_mode=self.quant_mode,
            )
        else:
            logits, cache = prefill(
                self.params, self.config, jnp.asarray(toks), cache,
                quant_mode=self.quant_mode,
            )
        stop = set(sp.stop_token_ids)
        if self.tokenizer is not None and getattr(self.tokenizer, "eos_token_id", None) is not None:
            stop.add(int(self.tokenizer.eos_token_id))
        if spec:
            if sp.temperature == 0.0:
                # greedy: token-identical to sequential greedy
                yield from self._spec_greedy_stream(
                    list(prompt_tokens), logits, cache, sp, stop
                )
            else:
                # sampled: exact in DISTRIBUTION (Leviathan et al. rejection
                # sampling); the PRNG stream differs from sequential decode
                yield from self._spec_sampled_stream(
                    list(prompt_tokens), logits, cache, sp, stop, key
                )
            return
        if self.decode_burst > 1:
            # dummy counts when no penalty (carried through the scan, unused)
            counts_arr = counts if counts is not None else jnp.zeros((1, 1), jnp.int32)
            fn = (
                _stream_burst_nodonate
                if jax.devices()[0].platform == "cpu"
                else _stream_burst_donate
            )
            remaining = sp.max_tokens
            while remaining > 0:
                # two compiled variants: full bursts, then single-step tail
                n = self.decode_burst if remaining >= self.decode_burst else 1
                toks, logits, cache, key, counts_arr = fn(
                    self.params, self.config, logits, cache, key, counts_arr,
                    quant_mode=self.quant_mode, n_steps=n,
                    temperature=sp.temperature, top_p=sp.top_p, top_k=sp.top_k,
                    repetition_penalty=sp.repetition_penalty,
                )
                for t in np.asarray(toks):
                    tid = int(t)
                    yield tid
                    remaining -= 1
                    if tid in stop or remaining <= 0:
                        return
            return
        for i in range(sp.max_tokens):
            key, sub = jax.random.split(key)
            tok = sample_token(
                logits, sub, counts,
                temperature=sp.temperature, top_p=sp.top_p, top_k=sp.top_k,
                repetition_penalty=sp.repetition_penalty,
            )
            tid = int(tok[0])
            yield tid
            if tid in stop:
                break
            if i + 1 >= sp.max_tokens:
                break
            if counts is not None:
                counts = counts.at[0, tid].add(1)
            logits, cache = decode_step(
                self.params, self.config, tok[:, None], cache,
                quant_mode=self.quant_mode,
            )

    def _spec_greedy_stream(
        self, prompt_tokens: list[int], logits, cache, sp: SamplingParams,
        stop: set[int],
    ) -> Iterator[int]:
        """Prompt-lookup speculative greedy decode. Each iteration drafts k
        tokens from the context's own n-gram statistics, verifies current+
        drafts in ONE forward, emits the accepted prefix plus the model's
        correction — all exact greedy tokens UNDER THE VERIFY FORWARD'S
        NUMERICS. In exact arithmetic (CPU f32, tested) the output is
        bit-identical to sequential greedy; on TPU a (k+1)-token verify
        tiles the MXU differently than a 1-token decode, so argmax near-ties
        can flip (measured at 7B geometry: first flip at token 62/4 of 256
        on repeat/random RANDOM-weight prompts — a near-tie-dense worst
        case; an all-f32-XLA arm still flips at 2.9x the cost, so the bound
        is inherent to shape-changing batched execution, exactly as vLLM
        outputs vary across batch sizes). Rolls the KV length back over
        rejected rows (their stale KV is overwritten in place by the next
        window before it ever enters the attended range)."""
        k = self.lookup_spec_k
        cur = int(jnp.argmax(logits[0].astype(jnp.float32)))
        yield cur
        emitted = 1
        if cur in stop:
            return
        ctx = list(prompt_tokens) + [cur]
        L = len(prompt_tokens)  # rows of valid KV in the cache
        while emitted < sp.max_tokens:
            draft = _lookup_draft(ctx, k)
            window = np.zeros((1, 1 + k), np.int32)
            window[0, 0] = cur
            window[0, 1 : 1 + len(draft)] = draft
            cache_in = KVCache(cache.k, cache.v, jnp.asarray(L, jnp.int32))
            pred, cache = _verify_window(
                self.params, self.config, jnp.asarray(window), cache_in,
                self.quant_mode,
            )
            pred = np.asarray(pred)  # pred[i] = greedy token after window[:i+1]
            n_acc = 0
            while n_acc < len(draft) and draft[n_acc] == int(pred[n_acc]):
                n_acc += 1
            self.spec_metrics["windows"] += 1
            self.spec_metrics["drafted"] += len(draft)
            self.spec_metrics["accepted"] += n_acc
            # n_acc draft rows hold correct-input KV; +1 for `cur`'s own row
            L += n_acc + 1
            for i in range(n_acc + 1):
                cur = int(pred[i])
                yield cur
                ctx.append(cur)
                emitted += 1
                if cur in stop or emitted >= sp.max_tokens:
                    return

    def _spec_sampled_stream(
        self, prompt_tokens: list[int], logits, cache, sp: SamplingParams,
        stop: set[int], key,
    ) -> Iterator[int]:
        """Prompt-lookup speculative SAMPLING: drafts verified by exact
        rejection sampling under the request's temperature/top-k/top-p
        (sampling.spec_accept_sample), so the output distribution equals
        sequential sampling's. Structure mirrors _spec_greedy_stream."""
        k = self.lookup_spec_k
        key, sub = jax.random.split(key)
        cur = int(sample_token(
            logits, sub, None, temperature=sp.temperature, top_p=sp.top_p,
            top_k=sp.top_k,
        )[0])
        yield cur
        emitted = 1
        if cur in stop:
            return
        ctx = list(prompt_tokens) + [cur]
        L = len(prompt_tokens)
        while emitted < sp.max_tokens:
            draft = _lookup_draft(ctx, k)
            window = np.zeros((1, 1 + k), np.int32)
            window[0, 0] = cur
            window[0, 1 : 1 + len(draft)] = draft
            cache_in = KVCache(cache.k, cache.v, jnp.asarray(L, jnp.int32))
            key, sub = jax.random.split(key)
            toks, n_acc_arr, lps, cache = _verify_window_sampled(
                self.params, self.config, jnp.asarray(window), cache_in, sub,
                jnp.asarray(len(draft), jnp.int32), self.quant_mode,
                sp.temperature, sp.top_p, sp.top_k,
            )
            toks = np.asarray(toks)
            n_acc = int(n_acc_arr)
            self.spec_metrics["windows"] += 1
            self.spec_metrics["drafted"] += len(draft)
            self.spec_metrics["accepted"] += n_acc
            L += n_acc + 1
            for i in range(n_acc + 1):
                cur = int(toks[i])
                yield cur
                ctx.append(cur)
                emitted += 1
                if cur in stop or emitted >= sp.max_tokens:
                    return

    def generate(
        self, prompt_tokens: list[int], sp: SamplingParams,
        pixel_values: np.ndarray | None = None,
    ) -> GenerationResult:
        """Reference BaseGenerator.generate (base.py:47-84): wraps the stream
        and measures TTFT / latency / tokens-per-second."""
        stats = GenerationStats()
        out: list[int] = []
        start = time.perf_counter()
        for tid in self.stream_generate(prompt_tokens, sp, pixel_values=pixel_values):
            if not out:
                stats.ttft = time.perf_counter() - start
            out.append(tid)
        stats.latency = time.perf_counter() - start
        stats.num_tokens = len(out)
        text = self.decode_text(out)
        return GenerationResult(out, text, stats)

    def decode_text(self, token_ids: list[int]) -> str:
        if self.tokenizer is None:
            return ""
        return self.tokenizer.decode(token_ids, skip_special_tokens=True)


def load_tokenizer(model_dir: str | Path):
    """Tokenizer via HF if the files exist locally; None otherwise (synthetic
    / random-weight workflows don't need one)."""
    model_dir = Path(model_dir)
    if not (model_dir / "tokenizer.json").exists() and not (
        model_dir / "tokenizer.model"
    ).exists():
        return None
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(str(model_dir))
    except Exception:
        return None


def create_generator(model_dir: str | Path, **kw) -> Generator:
    """Factory (reference create_generator, base.py:139-154)."""
    return Generator.from_pretrained(model_dir, **kw)
