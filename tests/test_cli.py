"""CLI smoke tests (CPU): optimize -> convert -> evaluate -> benchmark drive
the same flows a user runs, on a preset tiny model with synthetic data."""

import json
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def calib_out(tmp_path_factory):
    out = tmp_path_factory.mktemp("calib")
    from paroquant_tpu.cli.optimize import main as optimize_main

    optimize_main([
        "--model", "preset:tiny", "--output", str(out),
        "--datasets", "synthetic", "--train-size", "4", "--batch-size", "2",
        "--seqlen", "16", "--group-size", "64", "--num-rotations", "4",
        "--params", "channel_scales:0.05,angles:0.05", "--epochs", "1",
        "--save-checkpoint", "--device", "cpu",
    ])
    assert (out / "model" / "model.safetensors").exists()
    assert (out / "args.json").exists()
    assert (out / "0.q_proj.npz").exists()
    return out


def test_optimize_and_convert(calib_out, tmp_path):
    from paroquant_tpu.cli.convert import main as convert_main

    convert_main([
        "--model", "preset:tiny", "--results", str(calib_out),
        "--output", str(tmp_path / "awq"), "--format", "awq", "--device", "cpu",
    ])
    cfg = json.loads((tmp_path / "awq" / "config.json").read_text())
    assert cfg["quantization_config"]["quant_method"] == "paroquant"

    convert_main([
        "--model", "preset:tiny", "--results", str(calib_out),
        "--output", str(tmp_path / "pseudo"), "--mode", "pseudo", "--device", "cpu",
    ])
    assert "quantization_config" not in json.loads(
        (tmp_path / "pseudo" / "config.json").read_text()
    )


def test_evaluate_synthetic(calib_out, capsys):
    from paroquant_tpu.cli.evaluate import main as evaluate_main

    evaluate_main([
        "--model", str(calib_out / "model"), "--synthetic",
        "--seqlen", "16", "--num-tokens", "256", "--quant-mode", "xla",
        "--device", "cpu",
    ])
    out = capsys.readouterr().out
    ppl = float(out.strip().split()[-1])
    assert 1.0 < ppl < 1e6


def test_benchmark_cli(calib_out, capsys):
    from paroquant_tpu.cli.benchmark import main as benchmark_main

    benchmark_main([
        "--model", str(calib_out / "model"), "--prefill-len", "8",
        "--decode-len", "4", "--warmup", "1", "--runs", "1",
        "--quant-mode", "xla", "--device", "cpu",
    ])
    out = capsys.readouterr().out
    assert "tok/s" in out


def test_evaluate_pseudo_vs_real_agree(calib_out, tmp_path, capsys):
    """PPL parity across real-quantized and pseudo-baked checkpoints."""
    from paroquant_tpu.cli.convert import main as convert_main
    from paroquant_tpu.cli.evaluate import main as evaluate_main

    convert_main([
        "--model", "preset:tiny", "--results", str(calib_out),
        "--output", str(tmp_path / "pseudo2"), "--mode", "pseudo", "--device", "cpu",
    ])
    capsys.readouterr()
    evaluate_main(["--model", str(calib_out / "model"), "--synthetic",
                   "--seqlen", "16", "--num-tokens", "512", "--quant-mode", "xla",
                   "--device", "cpu"])
    p_real = float(capsys.readouterr().out.strip().split()[-1])
    evaluate_main(["--model", str(tmp_path / "pseudo2"), "--synthetic",
                   "--seqlen", "16", "--num-tokens", "512", "--quant-mode", "xla",
                   "--device", "cpu"])
    p_pseudo = float(capsys.readouterr().out.strip().split()[-1])
    assert abs(p_real - p_pseudo) / p_real < 0.02, (p_real, p_pseudo)


def test_evaluate_synthetic_sp(calib_out, capsys):
    """--sp N: PPL with each window's sequence axis sharded over an N-device
    ring matches the single-device number (same windows, same math)."""
    from paroquant_tpu.cli.evaluate import main as evaluate_main

    evaluate_main([
        "--model", str(calib_out / "model"), "--synthetic",
        "--seqlen", "16", "--num-tokens", "256", "--quant-mode", "xla",
        "--device", "cpu",
    ])
    ref = float(capsys.readouterr().out.strip().split()[-1])
    evaluate_main([
        "--model", str(calib_out / "model"), "--synthetic",
        "--seqlen", "16", "--num-tokens", "256", "--quant-mode", "xla",
        "--device", "cpu", "--sp", "4",
    ])
    sp = float(capsys.readouterr().out.strip().split()[-1])
    assert abs(sp - ref) / ref < 5e-3, (sp, ref)


def test_reasoning_harness_aggregation(capsys, monkeypatch):
    """The reasoning harness (reference protocol runner) aggregates accuracy,
    finish reasons, and throughput from endpoint responses — driven here with
    a stubbed endpoint so the aggregation path is covered CPU-only."""
    import json as _json
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1]
                            / "experiments" / "tasks"))
    import reasoning_eval

    calls = []

    def fake_query(base_url, prompt, *, max_tokens, temperature, top_p, seed,
                   timeout=0):
        calls.append((prompt, seed))
        # first synthetic problem is 2+3; answer correctly only for seed 42
        ans = "5" if ("2 + 3" in prompt and seed == 42) else "999"
        return {"text": f"the answer is \\boxed{{{ans}}}",
                "completion_tokens": 7, "finish_reason": "length",
                "wall_s": 0.5}

    monkeypatch.setattr(reasoning_eval, "query_endpoint", fake_query)
    reasoning_eval.main(["--synthetic", "--seeds", "42", "0",
                         "--max-tokens", "64", "--concurrency", "3"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["acc_per_seed"] == {"42": 1 / 3, "0": 0.0}
    assert out["finish_reasons"] == {"length": 6}
    assert out["gen_tokens"] == 42 and len(calls) == 6
    assert out["per_req_tok_s_p50"] == 14.0
