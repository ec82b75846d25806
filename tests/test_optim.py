"""Optimizer parity golden tests against real torch optimizers (torch is
test-only; the compute path is pure JAX)."""

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu.train.optim import (
    adam_torch,
    adamw_hf,
    bert_decay_mask,
    exponential_epoch_schedule,
    sgd_torch,
    warmup_linear_schedule,
)


def _run_parity(optax_tx, torch_opt_fn, steps=10, shape=(5, 3), seed=0,
                atol=1e-6):
    import torch

    rng = np.random.default_rng(seed)
    w0 = rng.normal(size=shape).astype(np.float32)

    # torch side: minimize 0.5*||w||^2 + sin(w).sum() -> grad = w + cos(w)
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch_opt_fn([wt])
    for _ in range(steps):
        opt.zero_grad()
        loss = 0.5 * (wt ** 2).sum() + torch.sin(wt).sum()
        loss.backward()
        opt.step()

    # jax side
    params = {"w": jnp.asarray(w0)}
    state = optax_tx.init(params)

    def loss_fn(p):
        return 0.5 * jnp.sum(p["w"] ** 2) + jnp.sum(jnp.sin(p["w"]))

    for _ in range(steps):
        g = jax.grad(loss_fn)(params)
        updates, state = optax_tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               atol=atol, rtol=1e-5)


def test_adam_matches_torch():
    import torch
    _run_parity(adam_torch(1e-2), lambda ps: torch.optim.Adam(ps, lr=1e-2))


def test_sgd_matches_torch():
    import torch
    _run_parity(
        sgd_torch(5e-3, momentum=9e-4, weight_decay=1e-8, nesterov=True),
        lambda ps: torch.optim.SGD(ps, lr=5e-3, momentum=9e-4,
                                   weight_decay=1e-8, nesterov=True))


def _numpy_adamw_hf(w, grads_fn, lr_fn, steps, b1=0.9, b2=0.999, eps=1e-6,
                    wd=0.0, correct_bias=False):
    """Direct transcription of the published pytorch_transformers-1.0.0 AdamW
    update rule, as an independent oracle."""
    w = w.astype(np.float64).copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    for t in range(steps):
        g = grads_fn(w)
        lr = lr_fn(t)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr
        if correct_bias:
            step_size *= np.sqrt(1 - b2 ** (t + 1)) / (1 - b1 ** (t + 1))
        w = w - step_size * m / (np.sqrt(v) + eps)
        if wd > 0:
            w = w - lr * wd * w
    return w


def test_adamw_hf_matches_oracle():
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4, 2)).astype(np.float32)
    grads = lambda w: w + np.cos(w)
    sched = warmup_linear_schedule(2e-5, warmup_steps=3, t_total=20)

    want = _numpy_adamw_hf(w0, grads, lambda t: float(sched(t)), steps=12,
                           wd=0.1, correct_bias=False)

    tx = adamw_hf(sched, weight_decay=0.1, correct_bias=False)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(12):
        g = {"w": params["w"] + jnp.cos(params["w"])}
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), want, atol=1e-6, rtol=1e-5)


def test_adamw_hf_bf16_moments_track_f32():
    """bf16 moment storage (production knob): state is actually bf16 and
    the parameter trajectory stays close to the f32-moment reference —
    the update math itself remains f32, only the persisted moments round."""
    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(16, 8)).astype(np.float32)
    grads = lambda p: {"w": p["w"] + jnp.cos(p["w"])}

    def run(moment_dtype):
        tx = adamw_hf(1e-3, weight_decay=0.1, correct_bias=False,
                      moment_dtype=moment_dtype)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for _ in range(25):
            updates, state = tx.update(grads(params), state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, state

    p32, _ = run(None)
    p16, s16 = run(jnp.bfloat16)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s16.nu["w"].dtype == jnp.bfloat16
    assert p16["w"].dtype == jnp.float32  # params stay full precision
    # 25 steps at lr=1e-3 move params by ~2.5e-2; bf16 moment rounding
    # perturbs the path by well under 1% of that motion.
    drift = np.abs(np.asarray(p16["w"]) - np.asarray(p32["w"])).max()
    motion = np.abs(np.asarray(p32["w"]) - w0).max()
    assert drift < 0.02 * motion, (drift, motion)


def test_warmup_linear_values():
    s = warmup_linear_schedule(1.0, warmup_steps=10, t_total=110)
    assert float(s(0)) == 0.0                       # first step is lr 0
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(60)), 0.5)   # halfway down
    assert float(s(110)) == 0.0
    assert float(s(200)) == 0.0                     # clamped at 0


def test_exponential_epoch_schedule():
    s = exponential_epoch_schedule(1e-3, 0.9, steps_per_epoch=7)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(6)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(7)), 0.9e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(20)), 1e-3 * 0.9 ** 2, rtol=1e-6)


def test_bert_decay_mask():
    params = {
        "bert": {
            "layer0": {
                "intermediate": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
                "attention_layernorm": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
            },
        },
        "classifier": {"kernel": jnp.ones((2, 1)), "bias": jnp.ones(1)},
    }
    mask = bert_decay_mask(params)
    assert mask["bert"]["layer0"]["intermediate"]["kernel"] is True
    assert mask["bert"]["layer0"]["intermediate"]["bias"] is False
    assert mask["bert"]["layer0"]["attention_layernorm"]["scale"] is False
    assert mask["bert"]["layer0"]["attention_layernorm"]["bias"] is False
    assert mask["classifier"]["kernel"] is True
    assert mask["classifier"]["bias"] is False


def test_adam_torch_bf16_moments_track_optax():
    """adam_torch(moment_dtype=bf16) (production knob for the image/critic
    towers): f32-moment custom path must EQUAL optax.adam step for step;
    bf16 moments must track it closely (update math stays f32)."""
    rng = np.random.default_rng(4)
    w0 = rng.normal(size=(16, 8)).astype(np.float32)
    grads = lambda p: {"w": p["w"] + jnp.cos(p["w"])}

    def run(moment_dtype, force_custom=False):
        tx = adam_torch(1e-3, moment_dtype=moment_dtype) if (
            moment_dtype is not None or not force_custom) else None
        if tx is None:
            tx = adam_torch(1e-3)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for _ in range(25):
            updates, state = tx.update(grads(params), state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, state

    p_ref, _ = run(None)                       # optax.adam (parity path)
    p_f32, _ = run(jnp.float32)                # custom path, f32 moments
    np.testing.assert_allclose(np.asarray(p_f32["w"]), np.asarray(p_ref["w"]),
                               atol=1e-7, rtol=1e-6)
    p16, s16 = run(jnp.bfloat16)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s16.nu["w"].dtype == jnp.bfloat16
    assert p16["w"].dtype == jnp.float32
    drift = np.abs(np.asarray(p16["w"]) - np.asarray(p_ref["w"])).max()
    motion = np.abs(np.asarray(p_ref["w"]) - w0).max()
    assert drift < 0.02 * motion, (drift, motion)
