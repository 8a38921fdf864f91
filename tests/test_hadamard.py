"""Hadamard-rotation baseline (QuaRot/SpinQuant-style) tests."""

import jax.numpy as jnp
import numpy as np

from paroquant_tpu.convert.rtn import (
    _hadamard_rotation_params,
    quantize_linear_rtn,
    rtn_export_linear,
)
from paroquant_tpu.models.decoder import DenseLinear
from paroquant_tpu.ops import rotation as rot_ops
from paroquant_tpu.ops.qlinear import (
    effective_weight,
    make_quantized_linear,
    quantized_linear_forward,
)


def test_hadamard_params_compose_to_dense_orthogonal():
    GS, I = 128, 256
    params, theta = _hadamard_rotation_params(I, GS)
    form_np = rot_ops.pairs_to_permutation(np.asarray(params.pairs), GS)
    form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form_np))
    R = np.asarray(
        rot_ops.build_rotation_matrices(jnp.asarray(theta), form, GS, dtype=jnp.float32)
    )  # [G, GS, GS]
    # dense +-1/sqrt(GS) mixer, orthogonal
    np.testing.assert_allclose(np.abs(R), 1.0 / np.sqrt(GS), atol=1e-5)
    for g in range(R.shape[0]):
        np.testing.assert_allclose(R[g] @ R[g].T, np.eye(GS), atol=1e-5)


def test_hadamard_rtn_reduces_outlier_quant_error():
    rng = np.random.default_rng(0)
    I, O, GS = 256, 64, 128
    w = rng.normal(size=(I, O)).astype(np.float32)
    # outlier channels: the regime rotations exist for
    w[rng.integers(0, I, 8), :] *= 20.0
    lin = DenseLinear(jnp.asarray(w), None)

    qh = quantize_linear_rtn(lin, group_size=GS, hadamard=True, rot_dtype=jnp.float32)
    qi = quantize_linear_rtn(lin, group_size=GS, rot_dtype=jnp.float32)
    err_h = float(jnp.mean((effective_weight(qh) - w) ** 2))
    err_i = float(jnp.mean((effective_weight(qi) - w) ** 2))
    assert err_h < err_i * 0.5, (err_h, err_i)

    # forward agrees with the dense matmul within W4 error
    x = jnp.asarray(rng.normal(size=(4, I)), jnp.float32)
    y_ref = x @ w
    y_q = quantized_linear_forward(qh, x, mode="xla")
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.2, rel


def test_hadamard_export_matches_runtime():
    rng = np.random.default_rng(1)
    I, O, GS = 256, 32, 128
    w = rng.normal(size=(I, O)).astype(np.float32)
    lin = DenseLinear(jnp.asarray(w), None)
    exp = rtn_export_linear(lin, group_size=GS, hadamard=True)
    assert np.any(exp["theta"])  # rotation actually present in the export
    runtime = make_quantized_linear(
        exp["q"], exp["scales"], exp["zeros"], exp["pairs"], exp["theta"],
        exp["inv_channel_scales"], GS, rot_dtype=jnp.float32,
    )
    direct = quantize_linear_rtn(lin, group_size=GS, hadamard=True, rot_dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, I)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(quantized_linear_forward(runtime, x, mode="xla")),
        np.asarray(quantized_linear_forward(direct, x, mode="xla")),
        atol=1e-4, rtol=1e-4,
    )


def test_hadamard_model_level():
    import jax

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS, init_params, model_forward

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    qh = quantize_model_rtn(params, config, rot_dtype=jnp.float32, hadamard=True)
    # rotation actually present on a quantized projection
    lp = qh["layers"][0]
    rot = np.asarray(lp["mlp"]["gate_proj"].rot)
    assert np.abs(np.abs(rot) - 1.0 / np.sqrt(rot.shape[-1])).max() < 1e-4
    toks = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (2, 16)), jnp.int32)
    ref, _ = model_forward(params, config, toks)
    out, _ = model_forward(qh, config, toks)
    assert np.isfinite(np.asarray(out)).all()
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.5, rel
