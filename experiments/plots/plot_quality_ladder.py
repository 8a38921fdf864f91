"""Quality-ladder figure: logits-MSE + top-1 agreement per arm per model.

Counterpart of the reference's accuracy plots (experiments/plots/ in
z-lab/paroquant renders per-task accuracy bars from its result JSONs): reads
our protocol ladder results (experiments/baselines/ladder_protocol.jsonl,
written by experiments/baselines/quality_ladder.py on the real chip) and
renders one row of panels per model geometry. Two separate panels per model
(MSE is log-scale, top-1 is a percentage) — never a dual-axis chart.

Baselines (rtn/hadamard/gptq/quarot) draw in neutral gray; the learned
-rotation arms (paroquant*) in dark blue — the large lightness gap keeps the
distinction in monochrome print and all CVD types, and the x labels carry
identity without color.

Usage: python experiments/plots/plot_quality_ladder.py
Writes figures/quality_ladder.png.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = Path(__file__).resolve().parent
LADDER = HERE.parents[1] / "experiments/baselines/ladder_protocol.jsonl"

ARMS = ["rtn", "hadamard", "gptq", "quarot", "paroquant",
        "paroquant_gptq", "paroquant_w4a8"]
LABELS = {"rtn": "RTN", "hadamard": "Hadamard", "gptq": "GPTQ",
          "quarot": "QuaRot", "paroquant": "PARO", "paroquant_gptq":
          "PARO+GPTQ", "paroquant_w4a8": "PARO a8"}
GRAY, BLUE = "#9CA3AF", "#1D4ED8"
INK, MUTED = "#111827", "#6B7280"


def main() -> None:
    rows = [json.loads(l) for l in LADDER.read_text().splitlines() if l.strip()]
    # merge rows per PROTOCOL (model + calibration tokens + outlier scale),
    # not per model name alone — a smoke run at different settings must not
    # silently mix with (or overwrite) the protocol-scale arms
    by_model: dict[tuple, dict] = {}
    for r in rows:
        if r.get("metric") != "quality_ladder":
            continue
        key = (r["model"], r.get("tokens"), r.get("outlier_scale"))
        merged = by_model.setdefault(key, {})
        merged.update({k: v for k, v in r.items() if isinstance(v, dict)})
        merged["_meta"] = {"model": f"{r['model']} ({r.get('tokens', 0)//1000}k tok)",
                          "tokens": r.get("tokens")}
    models = list(by_model)

    fig, axes = plt.subplots(
        len(models), 2, figsize=(9.5, 3.0 * len(models)), squeeze=False)
    for mi, model in enumerate(models):
        res = by_model[model]
        arms = [a for a in ARMS if a in res]
        colors = [BLUE if a.startswith("paroquant") else GRAY for a in arms]
        for ci, (metric, title, fmt) in enumerate([
            ("logits_mse", "logits MSE vs FP (lower is better)", "{:.3g}"),
            ("top1_agree", "top-1 agreement with FP (higher is better)",
             "{:.0%}"),
        ]):
            ax = axes[mi][ci]
            vals = [res[a][metric] for a in arms]
            ax.bar(range(len(arms)), vals, color=colors, width=0.62,
                   zorder=3)
            if metric == "logits_mse":
                ax.set_yscale("log")
            else:
                ax.set_ylim(0, 1)
            # direct labels on the data ends only (selective, not every
            # gridline value); text in ink tokens, not series color
            for i, v in enumerate(vals):
                ax.text(i, v, " " + fmt.format(v), ha="center",
                        va="bottom", fontsize=8, color=INK, zorder=4)
            ax.set_xticks(range(len(arms)))
            ax.set_xticklabels([LABELS[a] for a in arms], fontsize=8,
                               color=INK, rotation=20)
            ax.set_title(
                f"{res['_meta']['model']} — {title}", fontsize=9, color=INK)
            ax.tick_params(colors=MUTED, labelsize=8)
            ax.grid(axis="y", color="#E5E7EB", lw=0.6, zorder=0)
            for s in ("top", "right"):
                ax.spines[s].set_visible(False)
            for s in ("left", "bottom"):
                ax.spines[s].set_color(MUTED)
    fig.suptitle(
        "W4 g128 quality ladder (protocol scale; gray = baselines, "
        "blue = learned rotations)", fontsize=10, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    out = HERE / "figures/quality_ladder.png"
    out.parent.mkdir(exist_ok=True)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
