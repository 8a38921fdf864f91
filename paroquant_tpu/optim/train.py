"""Block-wise distillation optimizer (JAX/optax).

Re-design of the reference training loop (optim/train.py:94-253):
- AdamW with per-param-group cosine LR from start -> start/20
  (CosineAnnealingParam, util.py:364-384) via optax.multi_transform
- MSE or SmoothL1 loss against the FP teacher's layer outputs
- gradient accumulation windows, per-epoch validation with best-state
  snapshot and optional early stopping
- dummy-angle masking is inside the pseudo-quant forward, so no post-step
  callback is needed (vs reference reset_angles_by_mask)

The whole optimizer step is ONE jitted function per stage (the reference's
"single GPU only" constraint, cli/optimize.py:115-116, disappears: the step
pjit-shards over a mesh like any other JAX computation).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .pseudo import PARAM_GROUPS, PseudoQuantLinear, init_quantizer

LinearDict = dict[str, PseudoQuantLinear]


def split_trainable(
    linears: LinearDict, groups: dict[str, float]
) -> dict[str, dict[str, dict[str, jax.Array]]]:
    """Extract {group: {linear_name: {field: array}}} for the stage's groups.

    Field names per group come from each object's PARAM_FIELDS class attr
    (PseudoQuantLinear and PseudoQuantMoEExperts define their own mappings)."""
    out: dict[str, dict[str, dict[str, jax.Array]]] = {}
    for gname in groups:
        gdict = {}
        for lname, lin in linears.items():
            fields = getattr(type(lin), "PARAM_FIELDS", {}).get(
                gname, PARAM_GROUPS.get(gname, ())
            )
            fdict = {
                f: getattr(lin, f) for f in fields if getattr(lin, f) is not None
            }
            if fdict:
                gdict[lname] = fdict
        out[gname] = gdict
    return out


def merge_trainable(linears: LinearDict, trainable) -> LinearDict:
    merged = dict(linears)
    for gdict in trainable.values():
        for lname, fdict in gdict.items():
            merged[lname] = merged[lname].replace(**fdict)
    return merged


def make_loss_fn(
    apply_fn: Callable[..., jax.Array],
    loss: str = "mse",
):
    """loss_fn(trainable, linears, ctx, in, target). `linears` and `ctx`
    (the surrounding layer's params) are jit ARGUMENTS, not closure
    captures: captured arrays bake into the HLO as constants, which made
    every decoder layer a fresh compilation — as arguments, all layers of
    the same shape share one executable (plus persistent-cache hits)."""
    if loss == "mse":
        def loss_op(a, b):
            return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    elif loss == "smooth_l1":
        def loss_op(a, b):
            d = a.astype(jnp.float32) - b.astype(jnp.float32)
            ad = jnp.abs(d)
            return jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))
    else:
        raise ValueError(loss)

    def loss_fn(trainable, linears, ctx, batch_in, batch_target):
        merged = merge_trainable(linears, trainable)
        out = apply_fn(merged, batch_in) if ctx is None else apply_fn(
            merged, batch_in, ctx
        )
        return loss_op(out, batch_target)

    return loss_fn


def optimize_linears(
    apply_fn: Callable[[LinearDict, Any], jax.Array],
    linears: LinearDict,
    train_batches: list[tuple[Any, np.ndarray]],
    val_batches: list[tuple[Any, np.ndarray]],
    stage_groups: dict[str, float],
    *,
    n_epochs: int,
    loss: str = "mse",
    grad_accum: int = 1,
    early_stop: int | None = None,
    weight_decay: float = 0.01,
    log_fn: Callable[[dict[str, float], int], None] | None = None,
    start_step: int = 0,
    apply_ctx: Any = None,  # extra pytree forwarded to apply_fn as a jit ARG
) -> tuple[LinearDict, int]:
    """Run one optimization stage. Returns (updated linears, step count)."""
    if "quantizer" in stage_groups:
        from .pseudo_moe import PseudoQuantMoEExperts, init_moe_quantizers

        def _ensure_quantizer(lin):
            if isinstance(lin, PseudoQuantMoEExperts):
                return lin if lin.gate_up_q_scale is not None else init_moe_quantizers(lin)
            return lin if lin.q_scale is not None else init_quantizer(lin)

        linears = {n: _ensure_quantizer(lin) for n, lin in linears.items()}

    trainable = split_trainable(linears, stage_groups)
    num_train = len(train_batches)
    steps_per_epoch = int(np.ceil(num_train / grad_accum))
    total_steps = max(n_epochs * steps_per_epoch, 1)

    txs = {
        g: optax.adamw(
            optax.cosine_decay_schedule(lr, total_steps, alpha=1 / 20),
            weight_decay=weight_decay,
        )
        for g, lr in stage_groups.items()
    }
    labels = {g: g for g in trainable}
    tx = optax.multi_transform(txs, labels)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    opt_state = tx.init(trainable)

    loss_fn = make_loss_fn(apply_fn, loss)

    @jax.jit
    def train_step(trainable, opt_state, linears, ctx, batch_in, batch_target):
        lval, grads = jax.value_and_grad(loss_fn)(
            trainable, linears, ctx, batch_in, batch_target
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, lval

    @jax.jit
    def eval_step(trainable, linears, ctx, batch_in, batch_target):
        return loss_fn(trainable, linears, ctx, batch_in, batch_target)

    def val_loss(trainable):
        tot = 0.0
        for bin_, btgt in val_batches:
            tot += float(eval_step(trainable, linears, apply_ctx, bin_, btgt))
        return tot / max(len(val_batches), 1)

    best_val = val_loss(trainable)
    original_val = best_val
    best_trainable = trainable
    step = start_step
    if log_fn:
        log_fn({"val_loss": best_val, "best_val_loss": best_val}, step)

    stall = 0
    for _ in range(n_epochs):
        for bin_, btgt in train_batches:
            trainable, opt_state, lval = train_step(
                trainable, opt_state, linears, apply_ctx, bin_, btgt
            )
            step += 1
            if log_fn:
                log_fn({"loss": float(lval)}, step)
        v = val_loss(trainable)
        if v < best_val:
            best_val = v
            best_trainable = jax.tree.map(lambda a: a, trainable)
            stall = 0
        else:
            stall += 1
            if early_stop is not None and stall >= early_stop:
                break
        if log_fn:
            log_fn({"val_loss": v, "best_val_loss": best_val}, step)

    linears = merge_trainable(linears, best_trainable)
    return linears, step
