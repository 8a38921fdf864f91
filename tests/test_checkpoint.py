"""Checkpoint round-trip tests: PARO-TPU save/load, AWQ-format import, and
dense HF loading — logits must match across formats."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.convert import load_checkpoint, save_paro_checkpoint
from paroquant_tpu.convert.checkpoint import _config_to_hf
from paroquant_tpu.models import PRESETS, init_params, model_forward
from paroquant_tpu.optim import CalibConfig, calibrate_model
from paroquant_tpu.ops.packing import pack_awq
from safetensors.numpy import save_file

CFG = dataclasses.replace(
    PRESETS["tiny"], num_hidden_layers=2, hidden_size=256, intermediate_size=512,
    tie_word_embeddings=True,
)


def _calibrated(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, CFG.vocab_size, (2, 2, 8)).astype(np.int32)
    ccfg = CalibConfig(
        n_bits=4, group_size=64, num_rotations=4,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 1),),
    )
    qparams, exports = calibrate_model(params, CFG, tokens, ccfg)
    return params, qparams, exports


def test_paro_tpu_roundtrip(tmp_path):
    params, qparams, exports = _calibrated(tmp_path)
    save_paro_checkpoint(tmp_path / "ckpt", params, CFG, exports)
    loaded, config = load_checkpoint(tmp_path / "ckpt", dtype=jnp.float32)
    assert config.quantization["format"] == "paro-tpu"

    t = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    l_orig, _ = model_forward(qparams, CFG, t)
    l_load, _ = model_forward(loaded, config, t)
    # theta/channel_scales stored f16 -> small drift allowed
    np.testing.assert_allclose(
        np.asarray(l_load), np.asarray(l_orig), rtol=5e-2, atol=5e-2
    )
    rel = float(jnp.linalg.norm(l_load - l_orig) / jnp.linalg.norm(l_orig))
    assert rel < 5e-3, rel


def test_awq_format_import(tmp_path):
    """Build a checkpoint in the reference AWQ layout and import it."""
    params, qparams, exports = _calibrated(tmp_path)
    # write an AWQ-format checkpoint from the same exports
    tensors = {}
    tensors["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"], np.float16)
    tensors["model.norm.weight"] = np.asarray(params["norm"], np.float16)
    for li, lp in enumerate(params["layers"]):
        b = f"model.layers.{li}"
        tensors[f"{b}.input_layernorm.weight"] = np.asarray(lp["input_layernorm"], np.float16)
        tensors[f"{b}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"], np.float16
        )
        for n in ("q_norm", "k_norm"):
            if n in lp:
                tensors[f"{b}.self_attn.{n}.weight"] = np.asarray(lp[n], np.float16)
        for name, exp in exports[li].items():
            prefix = (
                f"{b}.mlp.{name[4:]}" if name.startswith("mlp.") else f"{b}.self_attn.{name}"
            )
            q = exp["q"]  # [O, I]
            tensors[f"{prefix}.qweight"] = pack_awq(q.T)  # [I, O//8]
            tensors[f"{prefix}.qzeros"] = pack_awq(exp["zeros"].T)  # [G, O//8]
            tensors[f"{prefix}.scales"] = exp["scales"].T.astype(np.float16)  # [G, O]
            tensors[f"{prefix}.theta"] = exp["theta"].astype(np.float16)
            tensors[f"{prefix}.pairs"] = exp["pairs"].astype(np.int16)
            tensors[f"{prefix}.channel_scales"] = exp["inv_channel_scales"].astype(
                np.float16
            ).reshape(1, -1)
    d = tmp_path / "awq"
    d.mkdir()
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, str(d / "model.safetensors"))
    cfg = _config_to_hf(CFG)
    cfg["quantization_config"] = {
        "quant_method": "paroquant", "bits": 4, "group_size": 64, "krot": 4,
    }
    (d / "config.json").write_text(json.dumps(cfg))

    loaded, config = load_checkpoint(d, dtype=jnp.float32)
    t = jnp.asarray(np.random.default_rng(2).integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    l_orig, _ = model_forward(qparams, CFG, t)
    l_load, _ = model_forward(loaded, config, t)
    rel = float(jnp.linalg.norm(l_load - l_orig) / jnp.linalg.norm(l_orig))
    # runtime storage is bf16 rot/scales (deliberate, ops/qlinear.py) while
    # the in-calibration qparams kept f32 rotation -> bf16-level logits gap
    assert rel < 2e-2, rel


def test_dense_checkpoint_load(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    d = tmp_path / "dense"
    save_paro_checkpoint(d, params, CFG, [])  # no exports -> all dense
    cfg = json.loads((d / "config.json").read_text())
    del cfg["quantization_config"]
    (d / "config.json").write_text(json.dumps(cfg))
    loaded, config = load_checkpoint(d, dtype=jnp.float32)
    t = jnp.asarray(np.random.default_rng(4).integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    l_orig, _ = model_forward(params, CFG, t)
    l_load, _ = model_forward(loaded, config, t)
    rel = float(jnp.linalg.norm(l_load - l_orig) / jnp.linalg.norm(l_orig))
    assert rel < 2e-3, rel
