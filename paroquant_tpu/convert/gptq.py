"""GPTQ baseline: Hessian-compensated round-to-nearest W4 quantization.

The reference's baseline family (EfficientQAT / OmniQuant / QTIP / AWQ,
/root/reference/experiments/baselines/*) are clone-and-run wrappers around
external repos, unusable on a zero-egress box. This module is the in-framework
second-order anchor: classic GPTQ (Frantar et al., arXiv 2210.17323) — per
output row, quantize input channels in order, compensating each column's
rounding error into the not-yet-quantized columns via the inverse-Hessian
Cholesky factor. It emits the SAME runtime/interchange format as the RTN
baseline (identity rotation, theta=0, unit channel scales — convert/rtn.py),
so GPTQ checkpoints flow through the standard PARO-TPU loaders, kernels,
sharding and serving stack unchanged.

TPU-first design notes:
- the whole per-weight GPTQ pass is ONE jitted function (`gptq_quantize_weight`)
  built from `lax.fori_loop`s with static shapes: an inner loop over the 128
  columns of a quantization group (rank-1 masked updates) and an outer loop
  over groups whose cross-group error propagation is a single [O,128]x[128,I]
  MXU matmul per group — the O(I^2·O) work lands on the systolic array instead
  of a Python loop.
- Hessians are accumulated on device (X^T X per tap, f32,
  preferred_element_type) from per-layer input taps captured by
  `models.decoder.layer_forward(..., return_taps=True)` — the SAME layer math
  the runtime executes, not a re-implementation.
- quantizer semantics are bit-identical to ops/quant.py (reference
  quantizer.py:10-24): per-group asymmetric min/max, scale clamp [1e-5,1e5],
  zero point = clip(-round(min/scale), 0, qmax) — computed when the group is
  *reached* (i.e. from the error-compensated weights), the standard
  group-size-128 GPTQ recipe.
"""

from __future__ import annotations

import functools
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.decoder import DenseLinear, layer_forward, rms_norm, rope_tables_per_layer
from ..ops import quant, rotation as rot_ops
from ..ops.qlinear import QuantizedLinear, make_quantized_linear
from .rtn import _cached_rotation_params, _hadamard_rotation_params

__all__ = ["gptq_quantize_weight", "gptq_quantize_model"]

logger = logging.getLogger("paroquant_tpu.convert")


@jax.jit
def _hessian_chol(hessian: jax.Array, percdamp: float = 0.01):
    """(U, dead): upper Cholesky factor of the dampened inverse Hessian and
    the dead-channel mask. Factored out so stacked weights sharing ONE
    Hessian (MoE experts) factorize once."""
    H = hessian.astype(jnp.float32)
    I = H.shape[0]
    diag = jnp.diagonal(H)
    dead = diag <= 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    Hd = H + damp * jnp.eye(I, dtype=jnp.float32)
    Hd = (Hd + Hd.T) * 0.5
    L = jnp.linalg.cholesky(Hd)
    Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(I, dtype=jnp.float32))
    Hinv = (Hinv + Hinv.T) * 0.5
    U = jnp.linalg.cholesky(Hinv).T  # upper-triangular, U[j, j] > 0
    return U, dead


def gptq_quantize_weight(
    w: jax.Array,
    hessian: jax.Array,
    n_bits: int = 4,
    group_size: int = 128,
    percdamp: float = 0.01,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """GPTQ-quantize one weight. w [O, I] (reference orientation: y = x @ w.T),
    hessian [I, I] = sum of X^T X over calibration inputs X.

    Returns (q int32 [O, I], scales f32 [O, G], zeros int32 [O, G]) with the
    quantize_to_int convention: dequant(q) = (q - zeros) * scales per group.
    """
    U, dead = _hessian_chol(hessian, percdamp)
    return _gptq_core(w, U, dead, n_bits=n_bits, group_size=group_size)


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size"))
def _gptq_core(
    w: jax.Array, U: jax.Array, dead: jax.Array, *, n_bits: int, group_size: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    O, I = w.shape
    # a non-multiple I would silently zero the trailing columns (G floors);
    # match ops/quant.py's divisibility contract loudly (ADVICE r2)
    assert I % group_size == 0, (w.shape, group_size)
    G = I // group_size
    qmax = 2**n_bits - 1
    # dead input channels (never activated): pin the weight to 0
    wf = jnp.where(dead[None, :], 0.0, w.astype(jnp.float32))

    col_ids = jnp.arange(I, dtype=jnp.int32)
    grp_ids = jnp.arange(group_size, dtype=jnp.int32)

    def group_body(g, carry):
        wbuf, qbuf, sbuf, zbuf = carry
        start = g * group_size
        wg = jax.lax.dynamic_slice(wbuf, (0, start), (O, group_size))
        # group quantizer params from the compensated weights at arrival
        qp = quant.calc_scales_and_zero_points(wg, group_size, n_bits)
        scale = jnp.clip(qp.scale.reshape(O), 1e-5, 1e5)
        zeros = jnp.clip(-jnp.round(qp.zero_point_float.reshape(O)), 0, qmax)
        ug = jax.lax.dynamic_slice(U, (start, start), (group_size, group_size))

        def col_body(j, inner):
            wg, qg, err = inner
            wj = jax.lax.dynamic_slice(wg, (0, j), (O, 1))[:, 0]
            qj = jnp.clip(jnp.round(wj / scale) + zeros, 0, qmax)
            dq = (qj - zeros) * scale
            urow = jax.lax.dynamic_slice(ug, (j, 0), (1, group_size))[0]
            d = jax.lax.dynamic_index_in_dim(jnp.diagonal(ug), j, keepdims=False)
            e = (wj - dq) / d
            # compensate into the not-yet-quantized columns of this group
            wg = wg - e[:, None] * jnp.where(grp_ids > j, urow, 0.0)[None, :]
            qg = jax.lax.dynamic_update_slice(
                qg, qj[:, None].astype(jnp.int32), (0, j)
            )
            err = jax.lax.dynamic_update_slice(err, e[:, None], (0, j))
            return wg, qg, err

        qg0 = jnp.zeros((O, group_size), jnp.int32)
        err0 = jnp.zeros((O, group_size), jnp.float32)
        _, qg, err = jax.lax.fori_loop(0, group_size, col_body, (wg, qg0, err0))

        # propagate the group's error block into all later groups (one MXU
        # matmul: err [O, gs] @ masked U rows [gs, I])
        urows = jax.lax.dynamic_slice(U, (start, 0), (group_size, I))
        later = (col_ids >= start + group_size).astype(jnp.float32)
        wbuf = wbuf - jnp.dot(
            err, urows * later[None, :], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        qbuf = jax.lax.dynamic_update_slice(qbuf, qg, (0, start))
        sbuf = jax.lax.dynamic_update_slice(sbuf, scale[:, None], (0, g))
        zbuf = jax.lax.dynamic_update_slice(
            zbuf, zeros[:, None].astype(jnp.int32), (0, g)
        )
        return wbuf, qbuf, sbuf, zbuf

    init = (
        wf,
        jnp.zeros((O, I), jnp.int32),
        jnp.zeros((O, G), jnp.float32),
        jnp.zeros((O, G), jnp.int32),
    )
    _, q, s, z = jax.lax.fori_loop(0, G, group_body, init)
    return q, s, z


# ---------------------------------------------------------------------------
# Model-level driver
# ---------------------------------------------------------------------------

# tap name -> linear params fed by that activation
_TAP_LINEARS = {
    "qkv": ("q_proj", "k_proj", "v_proj"),
    "o": ("o_proj",),
    "mlp": ("gate_proj", "up_proj"),
    "down": ("down_proj",),
}


@functools.partial(jax.jit, static_argnames=("config", "layer_idx"))
def _tap_hessians(lp, x, config, layer_idx, cos, sin, positions):
    """One layer forward (dense weights) returning per-tap X^T X contributions
    and the layer output."""
    out, _, taps = layer_forward(
        lp, x, config, layer_idx, cos, sin, positions, None,
        jnp.zeros((), jnp.int32), "xla", return_taps=True,
    )
    hs = {}
    for name, tap in taps.items():
        xt = tap.reshape(-1, tap.shape[-1]).astype(jnp.float32)
        # HIGHEST precision: the MXU's bf16 operand rounding distorts X^T X
        # enough to matter for the Cholesky-based compensation at scale
        hs[name] = jnp.dot(
            xt.T, xt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out, hs


@functools.partial(jax.jit, static_argnames=("config", "layer_idx"))
def _layer_apply(lp, x, config, layer_idx, cos, sin, positions):
    out, _ = layer_forward(
        lp, x, config, layer_idx, cos, sin, positions, None,
        jnp.zeros((), jnp.int32), "xla",
    )
    return out


def _hybrid_layer_body(lp, x, config, layer_idx, return_taps):
    """Gated delta-net layer forward (qwen3_next linear-attention layers),
    mirroring models.decoder's hybrid dispatch; optionally emits taps:
    la_qkvz (in_proj input), la_out (out_proj input), mlp / down /
    moe_down / shared_down."""
    from ..models.decoder import mlp_forward, moe_forward, rms_norm
    from ..models.linear_attn import delta_net_forward

    taps: dict[str, Any] = {}
    h = rms_norm(x, lp["input_layernorm"], config.rms_norm_eps,
                 config.zero_centered_norm)
    if return_taps:
        taps["la_qkvz"] = h
    if return_taps:
        attn_out, _, _, la_taps = delta_net_forward(
            lp["linear_attn"], h, config, None, None, "xla", return_taps=True
        )
        taps["la_out"] = la_taps["la_out"]
    else:
        attn_out, _, _ = delta_net_forward(
            lp["linear_attn"], h, config, None, None, "xla"
        )
    xx = x + attn_out
    h2 = rms_norm(xx, lp["post_attention_layernorm"], config.rms_norm_eps,
                  config.zero_centered_norm)
    if return_taps:
        taps["mlp"] = h2
    if config.layer_is_sparse(layer_idx):
        if return_taps:
            mlp_out, moe_act, shared_act = moe_forward(
                lp["mlp"], h2, config, "xla", return_act=True
            )
            taps["moe_down"] = moe_act
            if shared_act is not None:
                taps["shared_down"] = shared_act
        else:
            mlp_out = moe_forward(lp["mlp"], h2, config, "xla")
    elif return_taps:
        mlp_out, act_v = mlp_forward(lp["mlp"], h2, "xla", config.hidden_act,
                                     return_act=True)
        taps["down"] = act_v
    else:
        mlp_out = mlp_forward(lp["mlp"], h2, "xla", config.hidden_act)
    return xx + mlp_out, taps


@functools.partial(jax.jit, static_argnames=("config", "layer_idx"))
def _hybrid_tap_hessians(lp, x, config, layer_idx):
    out, taps = _hybrid_layer_body(lp, x, config, layer_idx, True)
    hs = {}
    for name, tap in taps.items():
        xt = tap.reshape(-1, tap.shape[-1]).astype(jnp.float32)
        hs[name] = jnp.dot(
            xt.T, xt, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out, hs


@functools.partial(jax.jit, static_argnames=("config", "layer_idx"))
def _hybrid_layer_apply(lp, x, config, layer_idx):
    out, _ = _hybrid_layer_body(lp, x, config, layer_idx, False)
    return out


_HAD_M_CACHE: dict[tuple, Any] = {}


def _hadamard_matrices(in_features: int, group_size: int) -> jax.Array:
    """Composed per-group Hadamard-equivalent mixers M [G, S, S] f32."""
    key = (in_features, group_size)
    if key not in _HAD_M_CACHE:
        params, theta = _hadamard_rotation_params(in_features, group_size)
        form_np = rot_ops.pairs_to_permutation(np.asarray(params.pairs), group_size)
        form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form_np))
        _HAD_M_CACHE[key] = rot_ops.build_rotation_matrices(
            jnp.asarray(theta, jnp.float32), form, group_size, dtype=jnp.float32
        )
    return _HAD_M_CACHE[key]


@jax.jit
def _rotate_weight_and_hessian(w, H, M):
    """Move (w [O, I], H [I, I]) into the rotated coordinate system of the
    per-group mixers M [G, S, S]: the runtime computes y = (Mx) @ Wd, so GPTQ
    must see Wd's coordinates — w_rot = w @ Mb^T and H_rot = Mb H Mb^T
    (block-diagonal Mb).

    precision=HIGHEST throughout: the TPU MXU default rounds operands to
    bf16, and on real-scale Hessians (entries >> damping) that rounding
    pushed eigenvalues negative past the 1% damp — Cholesky NaN'd the whole
    QuaRot arm at 0.6B geometry. The explicit symmetrization guards the
    residual rounding asymmetry."""
    hi = jax.lax.Precision.HIGHEST
    O, I = w.shape
    G, S, _ = M.shape
    wg = w.astype(jnp.float32).reshape(O, G, S)
    w_rot = jnp.einsum("ogj,gij->ogi", wg, M, precision=hi).reshape(O, I)
    # rows: H' = Mb @ H
    h = H.astype(jnp.float32).reshape(G, S, I)
    h = jnp.einsum("gij,gjX->giX", M, h, precision=hi).reshape(I, I)
    # cols: H_rot = H' @ Mb^T
    h = h.reshape(I, G, S)
    h_rot = jnp.einsum("Xgj,gij->Xgi", h, M, precision=hi).reshape(I, I)
    return w_rot, (h_rot + h_rot.T) * 0.5


def _gptq_linear(
    lin: DenseLinear, hessian, *, n_bits, group_size, percdamp, rot_dtype,
    hadamard: bool = False,
) -> tuple[QuantizedLinear, dict[str, Any]]:
    """Quantize one dense linear; returns (runtime layer, export dict).

    hadamard=True composes the Hadamard-equivalent group mixer with GPTQ —
    the QuaRot recipe (rotate to kill outliers, then Hessian-compensated
    rounding) expressed in the PARO pairs/theta checkpoint schema.
    """
    w = jnp.asarray(lin.w, jnp.float32).T  # [O, I]
    I = w.shape[1]
    if hadamard:
        params, theta = _hadamard_rotation_params(I, group_size)
        M = _hadamard_matrices(I, group_size)
        w, hessian = _rotate_weight_and_hessian(w, hessian, M)
    else:
        params = _cached_rotation_params(I, group_size, 8, 0)
        theta = np.zeros(params.theta.shape, np.float32)
    q, s, z = gptq_quantize_weight(
        w, hessian, n_bits=n_bits, group_size=group_size, percdamp=percdamp
    )
    q, s, z = np.asarray(q), np.asarray(s), np.asarray(z)
    bias = None if lin.b is None else np.asarray(lin.b, np.float32)
    runtime = make_quantized_linear(
        q, s, z, np.asarray(params.pairs), theta, np.ones(I, np.float32),
        group_size, bias=bias, rot_dtype=rot_dtype, n_bits=n_bits,
    )
    export = {
        "q": q, "scales": s, "zeros": z,
        "pairs": np.asarray(params.pairs), "theta": theta,
        "inv_channel_scales": np.ones(I, np.float32),
        "bias": bias, "n_bits": n_bits, "group_size": group_size,
    }
    return runtime, export


def _gptq_moe(
    experts: dict[str, Any], h_gu, h_down, *, n_bits, group_size, percdamp,
    rot_dtype, hadamard,
):
    """GPTQ the stacked MoE expert projections with a SHARED Hessian per
    projection across experts (the calibration counterpart of the runtime's
    shared per-projection rotations, QuantizedMoEExperts / reference
    qexperts.py:71-105). The Hessian factorizes once; lax.map runs the
    per-expert compensation loop with bounded memory.

    Returns (QuantizedMoEExperts runtime, export dict in the
    export_quantized_moe schema with identity/Hadamard rotations)."""
    gate_w = jnp.asarray(experts["gate_proj"], jnp.float32)  # [E, H, I_moe]
    up_w = jnp.asarray(experts["up_proj"], jnp.float32)
    down_w = jnp.asarray(experts["down_proj"], jnp.float32)  # [E, I_moe, H]
    E, H, I_moe = gate_w.shape

    def quantize_stack(ws, hessian, in_dim):
        """ws [E, O, in_dim] GPTQ'd against one shared Hessian."""
        if hadamard:
            M = _hadamard_matrices(in_dim, group_size)
            _, hessian = _rotate_weight_and_hessian(
                jnp.zeros_like(ws[0]), hessian, M
            )
            ws = jax.vmap(lambda w: _rotate_weight_and_hessian(w, hessian, M)[0])(ws)
        U, dead = _hessian_chol(hessian, percdamp)
        q, s, z = jax.lax.map(
            lambda w: _gptq_core(w, U, dead, n_bits=n_bits, group_size=group_size),
            ws,
        )
        return np.asarray(q), np.asarray(s), np.asarray(z)

    # gate/up share the layer input Hessian; weights transpose to [O, I]
    q_g, s_g, z_g = quantize_stack(jnp.swapaxes(gate_w, 1, 2), h_gu, H)
    q_u, s_u, z_u = quantize_stack(jnp.swapaxes(up_w, 1, 2), h_gu, H)
    q_d, s_d, z_d = quantize_stack(jnp.swapaxes(down_w, 1, 2), h_down, I_moe)

    def rot_export(in_dim):
        if hadamard:
            prm, theta = _hadamard_rotation_params(in_dim, group_size)
        else:
            prm = _cached_rotation_params(in_dim, group_size, 8, 0)
            theta = np.zeros(prm.theta.shape, np.float32)
        return np.asarray(prm.pairs), np.asarray(theta)

    gu_pairs, gu_theta = rot_export(H)
    d_pairs, d_theta = rot_export(I_moe)
    export = {
        "moe": True, "n_bits": n_bits, "group_size": group_size,
        "gate": {"q": q_g, "scales": s_g, "zeros": z_g},
        "up": {"q": q_u, "scales": s_u, "zeros": z_u},
        "down": {"q": q_d, "scales": s_d, "zeros": z_d},
        "gate_up_theta": gu_theta, "gate_up_pairs": gu_pairs,
        "gate_up_inv_channel_scales": np.ones(H, np.float32),
        "down_theta": d_theta, "down_pairs": d_pairs,
        "down_inv_channel_scales": np.ones(I_moe, np.float32),
    }
    from ..optim.pseudo_moe import quantized_moe_from_export

    return quantized_moe_from_export(export, rot_dtype), export


def gptq_quantize_model(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: np.ndarray,  # int32 [N, T] calibration token blocks
    *,
    n_bits: int = 4,
    group_size: int = 128,
    percdamp: float = 0.01,
    batch_size: int = 4,
    rot_dtype=jnp.bfloat16,
    hadamard: bool = False,
    log_fn=None,
) -> tuple[dict[str, Any], list[dict[str, Any]]]:
    """Sequential GPTQ over the decoder stack.

    Layer l's Hessians are collected from inputs produced by the already-
    quantized layers 0..l-1 (the reference optimize pipeline's student-feeds-
    next-layer structure, cli/optimize.py:524-537), then every eligible linear
    is GPTQ-quantized and swapped in before moving on.

    Covers the standard attention+GLU decoder families, MoE layers (routed
    expert stacks GPTQ'd with a shared Hessian per projection across
    experts, mirroring the runtime's shared rotations; the shared expert as
    a standard GLU), and hybrid delta-net layers (in_proj_qkvz and out_proj
    quantized; in_proj_ba stays dense per the reference skip list,
    experiments/optimize/4bit_moe.sh --skipped-modules).

    Returns (quantized runtime params, per-layer export dicts for
    save_paro_checkpoint — same schema as convert/rtn.py rtn_export_model).

    Activation batches stay device-resident between layers (one [N, T, H]
    set), which fits a 16GB chip up to ~8B geometry at 128x2048 f32 tokens;
    for larger sweeps drop batch count or reuse optim/calibrate.py's
    budget-gated host paging pattern (resident_act_bytes).
    """
    if config.is_gemma3n:
        raise NotImplementedError("GPTQ baseline does not support gemma3n")
    tokens = np.asarray(tokens, np.int32)
    N, T = tokens.shape
    bs = min(batch_size, N)
    # every sample contributes: the remainder rides as a smaller final batch
    # (one extra jit specialization) instead of being silently dropped
    batch_sizes = [bs] * (N // bs)
    if N % bs:
        batch_sizes.append(N % bs)

    embed = jnp.asarray(params["embed_tokens"])
    rope_by_bs = {}
    for b in set(batch_sizes):
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (b, T))
        rope_by_bs[b] = (pos, rope_tables_per_layer(pos, config))

    @jax.jit
    def _embed(emb, toks):
        # emb as an ARGUMENT: a captured embedding table bakes into the HLO
        # as a constant (relay compilers reject the multi-hundred-MB upload)
        x = jnp.take(emb, toks, axis=0)
        if config.gemma_norm:
            x = x * jnp.asarray(np.sqrt(config.hidden_size), x.dtype)
        return x

    offs = np.cumsum([0] + batch_sizes)
    xs = [
        _embed(embed, jnp.asarray(tokens[offs[i] : offs[i + 1]]))
        for i in range(len(batch_sizes))
    ]

    out_layers: list[dict[str, Any]] = []
    exports: list[dict[str, Any]] = []
    for li, lp in enumerate(params["layers"]):
        is_linear = config.layer_is_linear(li)
        # 1) accumulate per-tap Hessians with the dense layer
        hs_acc: dict[str, jax.Array] | None = None
        for x in xs:
            if is_linear:
                _, hs = _hybrid_tap_hessians(lp, x, config, li)
            else:
                positions, rope_by_layer = rope_by_bs[x.shape[0]]
                cos, sin = rope_by_layer[li]
                _, hs = _tap_hessians(lp, x, config, li, cos, sin, positions)
            hs_acc = hs if hs_acc is None else jax.tree.map(jnp.add, hs_acc, hs)

        # 2) GPTQ every eligible linear of this layer
        nlp = dict(lp)
        mlp = dict(lp["mlp"])
        if "gate_up_proj" in mlp:
            # merged projections are a post-load runtime transform; dense
            # checkpoints load split, so reaching here means the caller merged
            # first — make the skipped coverage visible (ADVICE r2)
            (log_fn or logger.warning)(
                f"gptq layer {li}: mlp.gate_up_proj is merged — left dense "
                "(run GPTQ before merge_projections)"
            )
        exp: dict[str, Any] = {}
        for tap, names in _TAP_LINEARS.items():
            for name in names:
                holder = nlp if tap in ("qkv", "o") else mlp
                key = name if tap in ("qkv", "o") else f"mlp.{name}"
                lin = holder.get(name)
                if not isinstance(lin, DenseLinear):
                    continue
                if lin.w.shape[0] % group_size or tap not in hs_acc:
                    continue
                holder[name], exp[key] = _gptq_linear(
                    lin, hs_acc[tap], n_bits=n_bits, group_size=group_size,
                    percdamp=percdamp, rot_dtype=rot_dtype, hadamard=hadamard,
                )
        # hybrid delta-net projections: in_proj_qkvz + out_proj quantized,
        # in_proj_ba (the decay/gate projection) stays dense
        if is_linear and "linear_attn" in nlp:
            la = dict(nlp["linear_attn"])
            for name, hkey in (("in_proj_qkvz", "la_qkvz"), ("out_proj", "la_out")):
                lin = la.get(name)
                if (
                    not isinstance(lin, DenseLinear)
                    or lin.w.shape[0] % group_size
                    or hkey not in hs_acc
                ):
                    continue
                la[name], exp[f"linear_attn.{name}"] = _gptq_linear(
                    lin, hs_acc[hkey], n_bits=n_bits, group_size=group_size,
                    percdamp=percdamp, rot_dtype=rot_dtype, hadamard=hadamard,
                )
            nlp["linear_attn"] = la
        # MoE: routed experts (shared Hessian per projection across experts)
        if isinstance(mlp.get("experts"), dict) and "moe_down" in hs_acc:
            mlp["experts"], exp["mlp.experts"] = _gptq_moe(
                mlp["experts"], hs_acc["mlp"], hs_acc["moe_down"],
                n_bits=n_bits, group_size=group_size, percdamp=percdamp,
                rot_dtype=rot_dtype, hadamard=hadamard,
            )
        # shared expert (Qwen2/3-MoE): a standard GLU — gate/up see the
        # layer input (same Hessian as the router path), down sees its own
        # activation tap; its sigmoid gate stays dense (reference
        # 4bit_moe.sh --skipped-modules mlp.shared_expert_gate)
        if isinstance(mlp.get("shared_expert"), dict) and "shared_down" in hs_acc:
            se = dict(mlp["shared_expert"])
            for name, hkey in (("gate_proj", "mlp"), ("up_proj", "mlp"),
                               ("down_proj", "shared_down")):
                lin = se.get(name)
                if not isinstance(lin, DenseLinear) or lin.w.shape[0] % group_size:
                    continue
                se[name], exp[f"mlp.shared_expert.{name}"] = _gptq_linear(
                    lin, hs_acc[hkey], n_bits=n_bits, group_size=group_size,
                    percdamp=percdamp, rot_dtype=rot_dtype, hadamard=hadamard,
                )
            mlp["shared_expert"] = se
        nlp["mlp"] = mlp
        out_layers.append(nlp)
        exports.append(exp)

        # 3) feed the next layer quantized-student outputs
        if is_linear:
            xs = [_hybrid_layer_apply(nlp, x, config, li) for x in xs]
        else:
            xs = [
                _layer_apply(
                    nlp, x, config, li,
                    *rope_by_bs[x.shape[0]][1][li], rope_by_bs[x.shape[0]][0],
                )
                for x in xs
            ]
        if log_fn is not None:
            log_fn(f"gptq layer {li}: quantized {sorted(exp)}")

    out = dict(params)
    out["layers"] = out_layers
    return out, exports
