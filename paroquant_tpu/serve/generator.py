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

from ..models.config import ModelConfig
from ..models.decoder import KVCache, decode_step, prefill
from .sampling import SamplingParams, sample_token


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
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.cache_dtype = cache_dtype
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
        toks = np.asarray(prompt_tokens, np.int32)[None, :]
        cache = KVCache.create(
            self.config, 1, min(self.max_len, toks.shape[1] + sp.max_tokens),
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
