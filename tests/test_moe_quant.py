"""Quantized MoE pipeline tests: pseudo-quant semantics, calibration
end-to-end on tiny-moe, checkpoint round trip, runtime dispatch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.convert import load_checkpoint, save_paro_checkpoint
from paroquant_tpu.models import PRESETS, init_params, model_forward
from paroquant_tpu.optim import CalibConfig, calibrate_model
from paroquant_tpu.optim.pseudo_moe import (
    export_quantized_moe,
    make_pseudo_moe,
    pseudo_moe_effective_experts,
    quantized_moe_from_export,
)
from paroquant_tpu.ops.butterfly import make_butterfly_params
from paroquant_tpu.ops import moe as moe_ops, quant

GS = 64
CFG = dataclasses.replace(PRESETS["tiny-moe"], num_hidden_layers=1, num_experts=4)


def _experts(E=4, H=128, I=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "gate_proj": jnp.asarray(rng.normal(0, 0.2, (E, H, I)), jnp.float32),
        "up_proj": jnp.asarray(rng.normal(0, 0.2, (E, H, I)), jnp.float32),
        "down_proj": jnp.asarray(rng.normal(0, 0.2, (E, I, H)), jnp.float32),
    }


def test_pseudo_moe_identity_rotation_matches_rtn():
    experts = _experts()
    pm = make_pseudo_moe(
        experts,
        make_butterfly_params(128, GS, 4),
        make_butterfly_params(64, GS, 4),
        n_bits=8, group_size=GS,
    )
    eff = pseudo_moe_effective_experts(pm)
    # per-expert RTN on the same rows should match (theta=0, scales=1)
    for pn, key in (("gate_proj", "gate_proj"),):
        w = np.asarray(experts[key])  # [E, H, I]
        for e in range(w.shape[0]):
            ref = np.asarray(quant.pseudo_quantize(jnp.asarray(w[e].T), 8, GS)).T
            np.testing.assert_allclose(np.asarray(eff[pn][e]), ref, atol=1e-5)


def test_moe_export_roundtrip_matches_pseudo():
    experts = _experts(seed=1)
    rng = np.random.default_rng(2)
    pm = make_pseudo_moe(
        experts, make_butterfly_params(128, GS, 4), make_butterfly_params(64, GS, 4),
        n_bits=4, group_size=GS,
    )
    # give it nontrivial rotations/scales
    pm = pm.replace(
        gate_up_theta=jnp.where(
            pm.gate_up_mask, 0.0, jnp.asarray(rng.normal(0, 0.2, pm.gate_up_theta.shape), jnp.float32)
        ),
        down_theta=jnp.where(
            pm.down_mask, 0.0, jnp.asarray(rng.normal(0, 0.2, pm.down_theta.shape), jnp.float32)
        ),
        gate_up_channel_scales=jnp.asarray(rng.uniform(0.7, 1.4, 128), jnp.float32),
        down_channel_scales=jnp.asarray(rng.uniform(0.7, 1.4, 64), jnp.float32),
    )
    eff = pseudo_moe_effective_experts(pm)
    exp = export_quantized_moe(pm)
    qmoe = quantized_moe_from_export(exp)
    # runtime dequant through _expert_weights must equal the pseudo weights
    gate_w, up_w, down_w, rot_gu, rot_d = moe_ops._expert_weights(qmoe)

    # check via a forward pass: gather path on random tokens
    T, K = 6, 2
    x = jnp.asarray(rng.normal(size=(T, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 4, (T, K)), jnp.int32)
    gates = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    y_q = moe_ops._moe_gather(qmoe, x, idx, gates)
    y_eff = moe_ops._moe_gather(eff, x, idx, gates)
    # runtime stores scales in bf16 (deliberate HBM trade, ops/qlinear.py);
    # the pseudo path is exact f32, so allow bf16-level output deviation
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_eff), rtol=5e-2, atol=5e-2)
    rel = float(jnp.linalg.norm(y_q - y_eff) / jnp.linalg.norm(y_eff))
    assert rel < 2e-2, rel


def test_calibrate_moe_model_and_checkpoint(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, CFG.vocab_size, (2, 2, 8)).astype(np.int32)
    ccfg = CalibConfig(
        n_bits=4, group_size=GS, num_rotations=4,
        stages=(({"channel_scales": 5e-2, "angles": 5e-2}, 1),),
    )
    qparams, exports = calibrate_model(params, CFG, tokens, ccfg, output_dir=tmp_path)
    assert "mlp.experts" in exports[0]

    t = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    l_fp, _ = model_forward(params, CFG, t)
    l_q, _ = model_forward(qparams, CFG, t)
    rel = float(jnp.linalg.norm(l_q - l_fp) / jnp.linalg.norm(l_fp))
    assert rel < 0.5, rel  # quantized but sane

    # resume from npz reproduces identical logits
    qparams2, _ = calibrate_model(params, CFG, tokens, ccfg, output_dir=tmp_path)
    l_q2, _ = model_forward(qparams2, CFG, t)
    np.testing.assert_allclose(np.asarray(l_q2), np.asarray(l_q), atol=1e-4)

    # checkpoint round trip
    save_paro_checkpoint(tmp_path / "ckpt", params, CFG, exports)
    loaded, config2 = load_checkpoint(tmp_path / "ckpt", dtype=jnp.float32)
    assert config2.is_moe
    l_l, _ = model_forward(loaded, config2, t)
    rel2 = float(jnp.linalg.norm(l_l - l_q) / jnp.linalg.norm(l_q))
    assert rel2 < 5e-3, rel2

    # AWQ interchange round trip: the reference per-expert layout
    # (experts.{e}.{proj}.qweight + shared rotation buffers) must re-load to
    # the same logits as the paro-tpu layout (round-1 ADVICE item 4)
    from paroquant_tpu.convert import save_awq_checkpoint

    save_awq_checkpoint(tmp_path / "ckpt_awq", params, CFG, exports)
    import json as _json

    awq_keys = set()
    from safetensors import safe_open

    with safe_open(str(tmp_path / "ckpt_awq" / "model.safetensors"), framework="np") as sf:
        awq_keys = set(sf.keys())
    assert "model.layers.0.mlp.experts.0.gate_proj.qweight" in awq_keys
    assert "model.layers.0.mlp.experts.gate_up_weight_theta" in awq_keys
    assert "model.layers.0.mlp.gate.weight" in awq_keys
    loaded_awq, config3 = load_checkpoint(tmp_path / "ckpt_awq", dtype=jnp.float32)
    assert config3.is_moe
    l_a, _ = model_forward(loaded_awq, config3, t)
    # f16 rotation/scale storage in the AWQ file adds ~1e-3-level noise
    rel3 = float(jnp.linalg.norm(l_a - l_l) / jnp.linalg.norm(l_l))
    assert rel3 < 5e-3, rel3
