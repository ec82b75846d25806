"""Component-level step-time breakdown on the real chip.

Times each piece of the MI train step in isolation — image tower
(ResNet fwd+bwd+Adam), text tower (BERT fwd+bwd+AdamW) per sequence
bucket, and the pairwise critic (scores + DV bound fwd+bwd+Adam) —
chaining state across steps with one device->host read at the end.

CAVEAT (learned after this tool was written): the chained steps here are
still ONE DISPATCH PER STEP, so components under ~10 ms (the critic,
short-bucket towers) measure tunnel dispatch throughput, not device
time — 1.7x run-to-run swings were observed on unchanged code.  For
device-bound numbers use the lax.scan-chained paths: bench.py
(full step per bucket), tools/bench_critic.py, tools/bench_image_tower.py.
This tool remains useful for the LONG components (BERT at L>=192) and
for relative regressions at fixed tunnel weather.

Output: one JSON line with per-component ms so perf work targets the
real floor (ROUND1.md: image tower suspected ~1/3 of the short-bucket
step; BERT ~50% MFU).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
BUCKETS = (64, 128, 192, 320)
WARMUP = 2
STEPS = 20


def _timed(step, state, batch):
    for _ in range(WARMUP):
        state, loss = step(state, batch)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = step(state, batch)
    final = float(loss)
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(final)
    return dt, state


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    import optax

    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig, TextBert
    from mimm_tpu.models.mlp import make_mlp
    from mimm_tpu.models.resnet import ResNet256_6_2_1
    from mimm_tpu.objectives import critics as critics_lib
    from mimm_tpu.objectives.pairing import pairwise_critic_scores
    from mimm_tpu.train.optim import adam_torch, adamw_hf, bert_decay_mask

    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainingConfig().replace(batch_size=BATCH, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend()}

    # ---- image tower: ResNet fwd+bwd + Adam ----
    resnet = ResNet256_6_2_1(output_channels=1, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((BATCH, cfg.img_size, cfg.img_size, 1),
                                 np.float32))
    variables = resnet.init(jax.random.PRNGKey(0), img, train=False)
    tx = adam_torch(cfg.init_lr)

    def img_loss(params, bstats, x):
        outs, mut = resnet.apply({"params": params, "batch_stats": bstats}, x,
                                 train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(outs[1])), mut["batch_stats"]

    @jax.jit
    def img_step(state, x):
        params, bstats, opt = state
        (loss, bstats), g = jax.value_and_grad(img_loss, has_aux=True)(
            params, bstats, x)
        up, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, up), bstats, opt), loss

    state = (variables["params"], variables["batch_stats"],
             tx.init(variables["params"]))
    dt, _ = _timed(img_step, state, img)
    out["image_tower_ms"] = round(dt * 1e3, 2)

    # ---- text tower: BERT fwd+bwd + AdamW, per bucket ----
    bert_cfg = BertConfig(num_classes=1, flash_attention=on_tpu)
    bert = TextBert(bert_cfg, dtype=jnp.bfloat16)
    tx_t = adamw_hf(2e-5, eps=1e-6, weight_decay=0.1, correct_bias=False,
                    mask=bert_decay_mask)
    ids0 = jnp.zeros((BATCH, 64), jnp.int32)
    tparams = bert.init(jax.random.PRNGKey(1), ids0)["params"]

    def txt_loss(params, ids, key):
        emb, _ = bert.apply({"params": params}, ids,
                            attention_mask=jnp.ones_like(ids),
                            token_type_ids=jnp.zeros_like(ids),
                            deterministic=False, rngs={"dropout": key})
        return jnp.mean(jnp.square(emb))

    @jax.jit
    def txt_step(state, ids):
        params, opt, key = state
        key, sub = jax.random.split(key)
        loss, g = jax.value_and_grad(txt_loss)(params, ids, sub)
        up, opt = tx_t.update(g, opt, params)
        return (optax.apply_updates(params, up), opt, key), loss

    for L in BUCKETS:
        ids = jnp.asarray(rng.integers(0, bert_cfg.vocab_size,
                                       (BATCH, L)).astype(np.int32))
        state = (tparams, tx_t.init(tparams), jax.random.PRNGKey(2))
        dt, _ = _timed(txt_step, state, ids)
        out[f"bert_L{L}_ms"] = round(dt * 1e3, 2)

    # ---- critic: pairwise scores + DV bound fwd+bwd + Adam ----
    critic = make_mlp(jax.random.PRNGKey(3), 2 * 768, [1024, 512])
    ei = jnp.asarray(rng.standard_normal((BATCH, 768)).astype(np.float32))
    et = jnp.asarray(rng.standard_normal((BATCH, 768)).astype(np.float32))
    sids = jnp.arange(BATCH, dtype=jnp.int32)
    tx_c = adam_torch(cfg.init_lr)

    def critic_loss(params):
        scores = pairwise_critic_scores(params, ei, et)
        return critics_lib.dv_bound_from_scores(scores, sids)

    @jax.jit
    def critic_step(state, _):
        params, opt = state
        loss, g = jax.value_and_grad(critic_loss)(params)
        up, opt = tx_c.update(g, opt, params)
        return (optax.apply_updates(params, up), opt), loss

    state = (critic, tx_c.init(critic))
    dt, _ = _timed(critic_step, state, None)
    out["critic_ms"] = round(dt * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
