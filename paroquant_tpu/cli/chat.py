"""Interactive chat TUI (reference cli/chat.py: rich console, history,
/think toggle, /clear, per-turn ttft/tok-s stats, <think> trace folding)."""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--quant-mode", default=None, choices=["xla", "fused", "auto", "w4a8"])
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--decode-burst", type=int, default=1,
                    help=">1 streams tokens in bursts of N (one dispatch per burst)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help=">0: prompt-lookup speculative greedy decoding with "
                         "k-token drafts (greedy turns only)")
    args = ap.parse_args(argv)

    from ..utils import force_platform

    force_platform(args.device)

    from rich.console import Console
    from rich.live import Live
    from rich.markdown import Markdown

    from ..serve.generator import Generator
    from ..serve.sampling import SamplingParams

    console = Console()
    console.print(f"[dim]loading {args.model}...[/dim]")
    gen = Generator.from_pretrained(args.model, quant_mode=args.quant_mode,
                                    max_len=args.max_tokens * 2 + 512,
                                    decode_burst=args.decode_burst,
                                    lookup_spec_k=args.spec_k)
    if gen.tokenizer is None:
        console.print("[red]model dir has no tokenizer; chat needs one[/red]")
        return
    sp = SamplingParams(
        max_tokens=args.max_tokens, temperature=args.temperature, top_p=args.top_p
    )
    thinking = True
    history: list[dict[str, str]] = []
    console.print(
        "[bold]paroquant-tpu chat[/bold] — /think toggles reasoning, /clear resets, "
        "ctrl-d exits"
    )
    # warmup so the first turn isn't dominated by compilation (chat.py:155-157)
    try:
        list(gen.stream_generate(gen.build_prompt(
            [{"role": "user", "content": "hi"}], thinking), SamplingParams(max_tokens=2)))
    except Exception:
        pass

    import time

    while True:
        try:
            user = console.input("[bold cyan]>>> [/bold cyan]")
        except EOFError:
            break
        if not user.strip():
            continue
        if user.strip() == "/clear":
            history.clear()
            console.print("[dim]history cleared[/dim]")
            continue
        if user.strip() == "/think":
            thinking = not thinking
            console.print(f"[dim]thinking {'on' if thinking else 'off'}[/dim]")
            continue
        history.append({"role": "user", "content": user})
        prompt = gen.build_prompt(history, thinking)
        pieces: list[int] = []
        t0 = time.perf_counter()
        ttft = None
        with Live(console=console, refresh_per_second=8) as live:
            for tok in gen.stream_generate(prompt, sp):
                if ttft is None:
                    ttft = time.perf_counter() - t0
                pieces.append(tok)
                text = gen.decode_text(pieces)
                # fold <think> traces like the reference _ThinkingTracker
                if "</think>" in text:
                    shown = text.split("</think>", 1)[1]
                elif "<think>" in text:
                    shown = "[dim](thinking...)[/dim]"
                else:
                    shown = text
                live.update(Markdown(shown) if not shown.startswith("[dim]") else shown)
        latency = time.perf_counter() - t0
        text = gen.decode_text(pieces)
        answer = text.split("</think>", 1)[-1].strip()
        history.append({"role": "assistant", "content": answer})
        n = len(pieces)
        tps = (n - 1) / max(latency - (ttft or 0), 1e-9)
        console.print(
            f"[dim]ttft {1e3*(ttft or 0):.0f} ms · {n} tokens · {tps:.1f} tok/s[/dim]"
        )


if __name__ == "__main__":
    main()
