"""Request-level data-parallel serving: a router over Engine replicas.

SURVEY.md §2.6 (DP row): the reference passes data_parallel_size through to
vLLM's ray executor (lighteval patch.py:38,104-107) and implements nothing
itself. The TPU-native counterpart is replica-level: each Engine owns one
mesh (a host's ICI domain, or a pod slice), and this router spreads requests
across replicas by instantaneous load. Combined with Engine(mesh=...) TP,
this is the full 2-D serving story — TP over ICI inside a replica, DP over
replicas/DCN between them (parallel/multihost.py builds the per-host mesh).

The router quacks like an Engine for the HTTP layer (serve/api.py): submit /
cancel / score_sync / generate_sync / start / stop / metrics / tokenizer, so
`Server(EngineRouter([...]))` serves transparently.
"""

from __future__ import annotations

import threading
from typing import Any

import numpy as np

from .engine import Engine, Request
from .sampling import SamplingParams


class EngineRouter:
    """Least-loaded dispatch over Engine replicas (request-level DP).

    Cancel-routing rides on the Request object itself (Request.owner), so
    the router holds no per-request state and nothing grows with traffic."""

    def __init__(self, engines: list[Engine]):
        if not engines:
            raise ValueError("EngineRouter needs at least one Engine")
        self.engines = list(engines)
        self._lock = threading.Lock()

    # -- Engine-compatible surface ------------------------------------

    @property
    def tokenizer(self):
        return self.engines[0].tokenizer

    @property
    def max_len(self) -> int:
        return min(e.max_len for e in self.engines)

    @property
    def config(self):
        return self.engines[0].config

    @property
    def metrics(self) -> dict[str, int]:
        agg: dict[str, int] = {}
        for e in self.engines:
            for k, v in e.metrics.items():
                agg[k] = agg.get(k, 0) + v
        agg["replicas"] = len(self.engines)
        return agg

    def ttft_stats(self) -> dict:
        import numpy as _np

        pooled = [t for e in self.engines for t in e._ttfts]
        if not pooled:
            return {}
        a = _np.asarray(pooled) * 1e3
        return {
            "ttft_p50_ms": round(float(_np.percentile(a, 50)), 1),
            "ttft_p99_ms": round(float(_np.percentile(a, 99)), 1),
            "ttft_samples": int(a.size),
        }

    def step_time_stats(self) -> dict:
        import numpy as _np

        pooled = [s for e in self.engines for s in e._step_samples]
        if not pooled:
            return {}
        a = _np.asarray(pooled, _np.float64)
        n, w = a[:, 0], a[:, 1] * 1e3
        out = {
            "decode_tick_wall_p50_ms": round(float(_np.percentile(w, 50)), 2),
            "decode_tick_wall_p99_ms": round(float(_np.percentile(w, 99)), 2),
            "decode_tick_samples": int(a.shape[0]),
        }
        if _np.unique(n).size >= 2:
            slope, intercept = _np.polyfit(n, w, 1)
            out["decode_step_device_ms_est"] = round(float(slope), 3)
            out["decode_dispatch_overhead_ms_est"] = round(float(intercept), 3)
        return out

    def _load(self, e: Engine) -> tuple[int, int]:
        active = sum(1 for s in e.slots if s.request is not None)
        return (active + len(e._pending) + e.waiting.qsize(), active)

    def submit(
        self,
        prompt_tokens: list[int],
        sampling: SamplingParams,
        pixel_values: np.ndarray | None = None,
    ) -> Request:
        with self._lock:
            eng = min(self.engines, key=self._load)
            req = eng.submit(prompt_tokens, sampling, pixel_values=pixel_values)
            req.owner = eng
        return req

    def cancel(self, req: Request) -> None:
        eng = req.owner
        if eng is not None:
            eng.cancel(req)

    def score_sync(self, prompt_tokens: list[int]) -> list[float | None]:
        with self._lock:
            eng = min(self.engines, key=self._load)
        return eng.score_sync(prompt_tokens)

    def generate_sync(
        self, prompt_tokens: list[int], sampling: SamplingParams, **kw: Any
    ) -> list[int]:
        with self._lock:
            eng = min(self.engines, key=self._load)
        return eng.generate_sync(prompt_tokens, sampling, **kw)

    def step(self) -> bool:
        busy = False
        for e in self.engines:
            busy = e.step() or busy
        return busy

    def start(self) -> None:
        for e in self.engines:
            e.start()

    def stop(self) -> None:
        for e in self.engines:
            e.stop()
