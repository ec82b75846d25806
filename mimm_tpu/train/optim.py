"""Optimizers with bit-level parity to the reference's update rules.

The reference MI trainer uses three optimizers (main_utils.py:151-172):

* ``torch.optim.Adam(lr=init_lr)`` for the image tower and the MI
  discriminator — ``optax.adam(eps_root=0)`` is algebraically identical
  (torch: ``p -= lr/bc1 * m / (sqrt(v)/sqrt(bc2) + eps)`` ==
  optax: ``p -= lr * (m/bc1) / (sqrt(v/bc2) + eps)``).
* ``pytorch_transformers.AdamW(lr=2e-5, correct_bias=False)`` with
  weight-decay 0.1 on all params except bias/LayerNorm, under a
  ``WarmupLinearSchedule`` over 10% of total steps.  pytorch_transformers
  1.0.0 AdamW differs from optax.adamw in two ways we must reproduce:
  (a) ``correct_bias=False`` skips bias correction entirely, and
  (b) decoupled weight decay is applied with the *base* lr times the
  schedule multiplier — same as the adam step's lr (``p -= lr*wd*p``).

The classifier trainer (main_utils.py:341-346) uses Adam or
``SGD(weight_decay=1e-08, momentum=9e-4, nesterov=True)`` with
``ExponentialLR(gamma=0.9)`` stepped per epoch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _AdamTorchState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def adam_torch(learning_rate,
               moment_dtype=None) -> optax.GradientTransformation:
    """torch.optim.Adam default-parity (betas 0.9/0.999, eps 1e-8).

    ``moment_dtype``: storage dtype for the two moment trees (None =
    optax.adam, the reference-parity default — bit-identical state
    structure to previous releases).  ``jnp.bfloat16`` halves the
    bandwidth-bound optimizer-state traffic for the image-tower and
    critic Adam updates (production knob, cfg.adam_moment_dtype); the
    update math itself always runs in the gradient dtype (f32), only
    the persisted moments round.  Equivalence vs optax.adam is tested
    in tests/test_optim.py."""
    if moment_dtype is None:
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                          eps_root=0.0)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def init(params):
        def zeros(p):
            return jnp.zeros_like(p, dtype=moment_dtype)
        return _AdamTorchState(jnp.zeros([], jnp.int32),
                               jax.tree.map(zeros, params),
                               jax.tree.map(zeros, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        mu = jax.tree.map(lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
                          state.nu, grads)
        c = count.astype(jnp.result_type(float))
        bc1, bc2 = 1 - b1 ** c, 1 - b2 ** c
        updates = jax.tree.map(
            lambda m, v: -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        mu = jax.tree.map(lambda m: m.astype(moment_dtype), mu)
        nu = jax.tree.map(lambda v: v.astype(moment_dtype), nu)
        return updates, _AdamTorchState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def warmup_linear_schedule(base_lr: float, warmup_steps: float, t_total: int):
    """pytorch_transformers 1.0.0 WarmupLinearSchedule: linear 0->1 over
    ``warmup_steps`` then linear 1->0 until ``t_total``.  The multiplier is
    evaluated at the number of *completed* optimizer steps, so the first
    update uses lr == 0 exactly like torch LambdaLR (reference
    main_utils.py:170-172 passes warmup_steps=0.1*total)."""
    warmup = float(warmup_steps)

    def schedule(count):
        # canonical float dtype: f32 normally, f64 under enable_x64 (the
        # float64 reference-parity golden needs the lr exact to f64)
        count = jnp.asarray(count, jnp.result_type(float))
        warm = count / jnp.maximum(1.0, warmup)
        decay = jnp.maximum(0.0, (t_total - count) / jnp.maximum(1.0, t_total - warmup))
        return base_lr * jnp.where(count < warmup, warm, decay)

    return schedule


class _AdamWHFState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def adamw_hf(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
             weight_decay: float = 0.0, correct_bias: bool = False,
             mask=None, moment_dtype=None) -> optax.GradientTransformation:
    """pytorch_transformers 1.0.0 ``AdamW`` (reference main_utils.py:166-168).

    ``mask``: pytree-prefix (or callable params->bool pytree) selecting
    parameters that receive weight decay — the reference excludes any param
    whose name contains 'bias' or 'LayerNorm' (main_utils.py:158-165).

    ``moment_dtype``: storage dtype for the two moment trees (None =
    parameter dtype, the reference-parity default).  The update itself is
    always computed in the gradient dtype (f32); only the persisted state
    is rounded.  ``jnp.bfloat16`` halves the optimizer-state HBM traffic
    — the AdamW update is bandwidth-bound (~3.7 ms/step for bert-base on
    v5e, ~3.1 GB of moment/param traffic) — and halves optimizer memory.
    bf16 keeps float32's 8-bit exponent, so there is no range issue for
    ``nu``; only mantissa precision is reduced (production knob,
    cfg.adamw_moment_dtype — parity/golden paths keep f32).
    """

    def init(params):
        def zeros(p):
            return jnp.zeros_like(p, dtype=moment_dtype or p.dtype)
        return _AdamWHFState(jnp.zeros([], jnp.int32),
                             jax.tree.map(zeros, params),
                             jax.tree.map(zeros, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_hf requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        # compute in the grad dtype (f32); state may round on store below
        mu = jax.tree.map(lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
                          state.nu, grads)
        if correct_bias:
            c = count.astype(jnp.result_type(float))
            step_size = lr * jnp.sqrt(1 - b2 ** c) / (1 - b1 ** c)
        else:
            step_size = lr
        decay_mask = (mask(params) if callable(mask) else mask) if mask is not None \
            else jax.tree.map(lambda _: True, params)

        def upd(m, v, p, dm):
            s = -step_size * m / (jnp.sqrt(v) + eps)
            if dm and weight_decay > 0.0:
                # pytorch_transformers applies decoupled decay to the
                # POST-adam-step value: p <- (p + s) - lr*wd*(p + s)
                s = s - lr * weight_decay * (p + s)
            return s

        updates = jax.tree.map(upd, mu, nu, params, decay_mask)
        if moment_dtype is not None:
            mu = jax.tree.map(lambda m: m.astype(moment_dtype), mu)
            nu = jax.tree.map(lambda v: v.astype(moment_dtype), nu)
        return updates, _AdamWHFState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def bert_decay_mask(params) -> dict:
    """True for params that get weight decay: everything except biases and
    LayerNorm scales (reference no_decay list main_utils.py:158)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decayed(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(k) for k in keys).lower()
        if joined.endswith("/bias") or joined.endswith("bias"):
            return False
        if "layernorm" in joined:
            return False
        return True

    leaves = {tuple(p): decayed(p) for p, _ in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [leaves[tuple(p)] for p, _ in flat])


def freeze(tx: optax.GradientTransformation,
           trainable_mask_fn) -> optax.GradientTransformation:
    """Wrap ``tx`` so parameters where ``trainable_mask_fn(params)`` is
    False receive ZERO updates (true freezing — no optimizer math, no
    moment drift, and jax.grad dead-code-eliminates their backward where
    possible).  The reference freezes by excluding params from the
    optimizer's param groups (model.py:83-89,490-495); this is the optax
    equivalent."""

    def labels(params):
        return jax.tree.map(lambda t: "train" if t else "freeze",
                            trainable_mask_fn(params))

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                 labels)


def resnet_trainable_mask(params) -> dict:
    """Reference ``ResNet256_6_2_1.freeze_encoder`` (model.py:490-495):
    freeze everything except the last residual stage (layer6 blocks) and
    the fc head — the fine-tuning configuration."""
    def sub(key, subtree):
        t = key.startswith("layer6") or key.startswith("fc")
        return jax.tree.map(lambda _: t, subtree)

    return {k: sub(k, v) for k, v in params.items()}


def bert_trainable_mask(params) -> dict:
    """Reference ``TextBert.freeze_bert_encoder`` (model.py:83-86): freeze
    the BERT trunk; the classifier head stays trainable."""
    return {k: jax.tree.map(lambda _: k != "bert", v)
            for k, v in params.items()}


def sgd_torch(learning_rate, momentum: float = 9e-4, weight_decay: float = 1e-8,
              nesterov: bool = True) -> optax.GradientTransformation:
    """torch.optim.SGD parity (reference main_utils.py:344): L2 weight decay
    folded into the gradient, then (nesterov) momentum."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.scale_by_learning_rate(learning_rate),
    )


def exponential_epoch_schedule(init_lr: float, gamma: float, steps_per_epoch: int):
    """ExponentialLR(gamma) stepped once per epoch (reference
    main_utils.py:346,419): lr = init * gamma^epoch, constant within epoch."""

    def schedule(count):
        epoch = jnp.asarray(count, jnp.int32) // max(1, steps_per_epoch)
        return init_lr * gamma ** epoch.astype(jnp.float32)

    return schedule
