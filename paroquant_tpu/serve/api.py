"""OpenAI-compatible HTTP server (aiohttp) over the continuous-batching engine.

Reference counterpart: cli/serve.py (delegates to vLLM's api_server or
monkey-patches mlx_lm.server). Endpoints:
  POST /v1/chat/completions   (stream + non-stream)
  POST /v1/completions
  GET  /v1/models
  GET  /health, /metrics
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import queue
import time
import uuid
from typing import Any

from aiohttp import web

from .engine import Engine, EngineOverloaded
from .sampling import SamplingParams


def _sampling_from_body(
    body: dict[str, Any], engine: Engine, prompt_len: int = 0
) -> SamplingParams:
    room = max(engine.max_len - prompt_len, 1)
    stop = body.get("stop") or ()
    if isinstance(stop, str):
        stop = (stop,)
    return SamplingParams(
        max_tokens=min(int(body.get("max_tokens") or 512), room),
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        seed=body.get("seed"),
        # completions: integer `logprobs` = N alternatives; chat: boolean
        # `logprobs` + integer `top_logprobs`
        top_logprobs=min(
            int(body.get("top_logprobs")
                or (body.get("logprobs") if isinstance(body.get("logprobs"), int)
                    and not isinstance(body.get("logprobs"), bool) else 0)
                or 0),
            8,
        ),
        stop=tuple(stop),
        logit_bias=tuple(
            (int(t), float(b)) for t, b in (body.get("logit_bias") or {}).items()
        ),
    )


def _find_stop(text: str, stops: tuple[str, ...]) -> int:
    """Earliest index of any stop sequence in text, or -1."""
    hit = -1
    for s in stops:
        i = text.find(s)
        if i >= 0 and (hit < 0 or i < hit):
            hit = i
    return hit


class Server:
    def __init__(
        self,
        engine: Engine,
        model_name: str = "paroquant-tpu",
        processor: Any = None,
    ):
        # `processor` (optional transformers AutoProcessor) enables OpenAI
        # vision-format chat messages (image_url content parts): it owns the
        # model-specific image templating + pixel preprocessing, mirroring
        # the reference transformers backend (generator.py:26-46)
        self.engine = engine
        self.model_name = model_name
        self.processor = processor
        self.app = web.Application()
        self.app.router.add_post("/v1/chat/completions", self.chat_completions)
        self.app.router.add_post("/v1/completions", self.completions)
        self.app.router.add_get("/v1/models", self.models)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/metrics", self.metrics)

    # ------------------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def metrics(self, request: web.Request) -> web.Response:
        out = dict(self.engine.metrics)
        if hasattr(self.engine, "ttft_stats"):
            out.update(self.engine.ttft_stats())
        if hasattr(self.engine, "step_time_stats"):
            out.update(self.engine.step_time_stats())
        return web.json_response(out)

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {"id": self.model_name, "object": "model", "owned_by": "paroquant-tpu"}
                ],
            }
        )

    # ------------------------------------------------------------------

    def _encode_chat(self, messages: list[dict[str, str]]) -> list[int]:
        tok = self.engine.tokenizer
        if tok is None:
            raise web.HTTPBadRequest(reason="server has no tokenizer loaded")
        return tok.apply_chat_template(messages, add_generation_prompt=True)

    @staticmethod
    def _has_image_parts(messages: list[dict]) -> bool:
        return any(
            isinstance(m.get("content"), list)
            and any(p.get("type") in ("image_url", "image") for p in m["content"])
            for m in messages
        )

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        if "messages" not in body:
            raise web.HTTPBadRequest(reason="missing 'messages'")
        messages = body["messages"]
        pixel_values = None
        if self._has_image_parts(messages):
            if self.processor is None:
                raise web.HTTPBadRequest(
                    reason="image content requires a vision processor "
                    "(serve a VLM checkpoint with processor files)"
                )
            enc = self.processor.apply_chat_template(
                messages, add_generation_prompt=True, tokenize=True,
                return_dict=True,
            )
            prompt = list(map(int, enc["input_ids"][0]))
            import numpy as np

            pixel_values = np.asarray(enc["pixel_values"], np.float32)
        else:
            prompt = self._encode_chat(messages)
        return await self._run(request, body, prompt, chat=True,
                               pixel_values=pixel_values)

    async def completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        tok = self.engine.tokenizer
        if "prompt_token_ids" in body:
            prompt = list(body["prompt_token_ids"])
        elif tok is not None and "prompt" in body:
            prompt = tok.encode(body["prompt"])
        else:
            raise web.HTTPBadRequest(reason="missing 'prompt'")
        pixel_values = None
        if "pixel_values" in body:  # raw engine-level image input
            import numpy as np

            pixel_values = np.asarray(body["pixel_values"], np.float32)
        if body.get("echo"):
            # prompt scoring (echo + logprobs + max_tokens=0): the lm_eval /
            # OpenAI loglikelihood protocol — no generation, return per-token
            # logprobs of the prompt itself. Echo WITH generation (OpenAI
            # defaults max_tokens to 16) is not supported; require an
            # explicit max_tokens: 0 rather than silently scoring-only.
            if body.get("max_tokens") is None or int(body["max_tokens"]) != 0:
                raise web.HTTPBadRequest(
                    reason="echo requires explicit max_tokens: 0 "
                    "(prompt scoring); echo with generation is unsupported"
                )
            lps = await asyncio.get_event_loop().run_in_executor(
                None, self.engine.score_sync, prompt
            )
            token_texts = (
                [tok.decode([t]) for t in prompt] if tok else [str(t) for t in prompt]
            )
            return web.json_response({
                "id": f"cmpl-{uuid.uuid4().hex[:12]}",
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "text": tok.decode(prompt, skip_special_tokens=True) if tok else "",
                    "logprobs": {
                        "tokens": token_texts,
                        "token_logprobs": lps,
                        "text_offset": [],
                        "top_logprobs": None,
                    },
                    "finish_reason": "stop",
                }],
                "usage": {
                    "prompt_tokens": len(prompt),
                    "completion_tokens": 0,
                    "total_tokens": len(prompt),
                },
            })
        return await self._run(request, body, prompt, chat=False,
                               pixel_values=pixel_values)

    async def _run(
        self, request: web.Request, body: dict, prompt: list[int], chat: bool,
        pixel_values=None,
    ) -> web.StreamResponse:
        sp = _sampling_from_body(body, self.engine, len(prompt))
        n = max(int(body.get("n") or 1), 1)
        if n > 1 and body.get("stream"):
            raise web.HTTPBadRequest(reason="n>1 with stream is not supported")
        reqs = []
        try:
            reqs.append(self.engine.submit(prompt, sp, pixel_values=pixel_values))
            for i in range(1, n):
                # distinct sampling streams per choice: shift an explicit
                # seed, otherwise each request id hashes its own base key
                sp_i = dataclasses.replace(
                    sp, seed=(sp.seed + i) if sp.seed is not None else None
                )
                reqs.append(self.engine.submit(prompt, sp_i, pixel_values=pixel_values))
        except EngineOverloaded as e:
            for r in reqs:  # don't orphan already-submitted choices
                self.engine.cancel(r)
            raise web.HTTPTooManyRequests(
                reason=str(e), headers={"Retry-After": "1"}
            )
        except ValueError as e:
            for r in reqs:
                self.engine.cancel(r)
            raise web.HTTPBadRequest(reason=str(e))
        req = reqs[0]
        created = int(time.time())
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}" if chat else f"cmpl-{uuid.uuid4().hex[:12]}"
        tok = self.engine.tokenizer

        stops = sp.stop if tok else ()
        holdback = max((len(s) for s in stops), default=1) - 1

        if body.get("stream"):
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)

            async def send_chunk(text: str, t: int | None, reason: str | None):
                delta = {"content": text} if chat else None
                chunk = {
                    "id": rid,
                    "object": "chat.completion.chunk" if chat else "text_completion",
                    "created": created,
                    "model": self.model_name,
                    "choices": [
                        {
                            "index": 0,
                            **({"delta": delta} if chat else {"text": text}),
                            "finish_reason": reason,
                        }
                    ],
                }
                if not tok and t is not None:
                    chunk["choices"][0]["token_ids"] = [t]
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())

            # vLLM-style incremental detokenization: deltas come from a
            # decode window that always includes the previous tokens'
            # context, so tokenizers whose detokenization is not
            # concatenation-stable (SentencePiece Metaspace: a standalone
            # token drops its leading space) still stream exact substrings
            # of the full decode — at O(1) amortized decode work per token.
            # With stop strings, deltas flow into `buf`, which retains the
            # last `holdback` chars un-emitted so straddling stops are caught.
            all_toks: list[int] = []
            prefix_off = 0  # decode-window start (lags one clean boundary)
            read_off = 0  # tokens already converted to emitted text
            buf = ""  # decoded-but-unemitted text (stop-string path)
            n_recv = 0
            finish_reason = "stop"
            stopped = False

            def _delta() -> str | None:
                """Text produced by tokens read_off.. (None = mid-fragment)."""
                new_text = tok.decode(all_toks[prefix_off:], skip_special_tokens=True)
                if new_text.endswith("�"):
                    return None  # incomplete byte sequence; wait for more
                prev_text = tok.decode(
                    all_toks[prefix_off:read_off], skip_special_tokens=True
                )
                return new_text[len(prev_text):]

            while True:
                kind, t = await asyncio.get_event_loop().run_in_executor(
                    None, req.out_queue.get
                )
                if kind == "done":
                    if n_recv >= sp.max_tokens:
                        finish_reason = "length"
                    break
                n_recv += 1
                if not tok:
                    await send_chunk("", t, None)  # token-ids-only protocol
                    continue
                all_toks.append(t)
                delta = _delta()
                if delta is None:
                    continue
                prefix_off, read_off = read_off, len(all_toks)
                if not delta:
                    continue
                if not stops:
                    await send_chunk(delta, t, None)
                    continue
                buf += delta
                hit = _find_stop(buf, stops)
                if hit >= 0:
                    if hit > 0:
                        await send_chunk(buf[:hit], t, None)
                    buf = ""
                    stopped = True
                    self.engine.cancel(req)
                    break
                if len(buf) > holdback:
                    await send_chunk(buf[:-holdback] if holdback else buf, t, None)
                    buf = buf[-holdback:] if holdback else ""
            if not stopped and tok:
                # flush the held-back tail + any trailing token fragment
                new_text = tok.decode(all_toks[prefix_off:], skip_special_tokens=True)
                prev_text = tok.decode(
                    all_toks[prefix_off:read_off], skip_special_tokens=True
                )
                tail = buf + new_text[len(prev_text):]
                if tail:
                    await send_chunk(tail, None, None)
            await send_chunk("", None, finish_reason)
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        # n>1 (non-streaming): the extra choices were submitted upfront in
        # _run's caller-visible batch, so they decode CONCURRENTLY in the
        # engine's continuous batch rather than sequentially
        # stop detection decodes only a tail window — O(n) host work instead
        # of re-decoding the whole history per token. Window size: a char
        # can arrive as up to 4 byte-fallback tokens (and some tokens decode
        # to 0 chars under skip_special_tokens), so cover 4x the stop length
        # plus boundary slack; the authoritative full decode below still
        # truncates exactly even if the window heuristic ever misses.
        max_stop_chars = max((len(s) for s in stops), default=0)
        stop_win = 4 * max_stop_chars + 8

        async def collect(r):
            out: list[int] = []
            finish_reason = None
            while True:
                kind, t = await asyncio.get_event_loop().run_in_executor(
                    None, r.out_queue.get
                )
                if kind == "done":
                    break
                out.append(t)
                if stops:
                    tail = tok.decode(out[-stop_win:], skip_special_tokens=True)
                    if _find_stop(tail, stops) >= 0:
                        finish_reason = "stop"
                        self.engine.cancel(r)
                        break
            text = tok.decode(out, skip_special_tokens=True) if tok else ""
            if stops:
                hit = _find_stop(text, stops)
                if hit >= 0:
                    text = text[:hit]
                    finish_reason = "stop"
            if finish_reason is None:
                finish_reason = "length" if len(out) >= sp.max_tokens else "stop"
            return out, text, finish_reason

        choices = []
        total_completion = 0
        for idx, r in enumerate(reqs):
            out, text, finish_reason = await collect(r)
            total_completion += len(out)
            logprobs_obj = None
            if body.get("logprobs"):
                lps = r.logprobs[: len(out)]
                tok_texts = (
                    [tok.decode([t]) for t in out] if tok else [str(t) for t in out]
                )
                n_top = sp.top_logprobs
                tops = r.top_logprobs[: len(out)] if n_top else []

                def _top_entries(pos):
                    return [
                        {"token": tok.decode([tid]) if tok else str(tid),
                         "logprob": tlp}
                        for tid, tlp in tops[pos][:n_top]
                    ] if n_top and pos < len(tops) else None

                if chat:  # OpenAI chat logprobs shape
                    logprobs_obj = {
                        "content": [
                            {"token": s, "logprob": l,
                             **({"top_logprobs": _top_entries(j)} if n_top else {})}
                            for j, (s, l) in enumerate(zip(tok_texts, lps))
                        ]
                    }
                else:  # completions logprobs shape
                    logprobs_obj = {
                        "tokens": tok_texts,
                        "token_logprobs": lps,
                        "text_offset": [],
                        "top_logprobs": [
                            {e["token"]: e["logprob"] for e in (_top_entries(j) or [])}
                            for j in range(len(out))
                        ] if n_top else None,
                    }
            choices.append(
                {
                    "index": idx,
                    **(
                        {"message": {"role": "assistant", "content": text}}
                        if chat
                        else {"text": text}
                    ),
                    "token_ids": out,
                    **({"logprobs": logprobs_obj} if logprobs_obj else {}),
                    "finish_reason": finish_reason,
                }
            )
        payload = {
            "id": rid,
            "object": "chat.completion" if chat else "text_completion",
            "created": created,
            "model": self.model_name,
            "usage": {
                "prompt_tokens": len(prompt),
                "completion_tokens": total_completion,
                "total_tokens": len(prompt) + total_completion,
            },
            "choices": choices,
        }
        return web.json_response(payload)

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        self.engine.start()
        web.run_app(self.app, host=host, port=port, print=None)
