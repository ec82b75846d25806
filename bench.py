"""Benchmark: flagship MI train-step throughput (image-text pairs/sec).

Runs the COMPLETE production-shape training step on the available device
(one TPU v5e chip under the driver): ResNet256_6_2_1 + 12-layer BERT
(seq 320) forward, fused global pairwise critic, DV bound, backward, and
all three optimizer updates, at batch 64 in bfloat16.

Baseline: the reference trains ~18 image-text pairs/sec on its single GPU
(BASELINE.md: 200k pairs / ~10,900 s per epoch, mm_dv_epoch20 logs).

Prints ONE JSON line:
  {"metric": "mi_train_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N/18}
"""

import json
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 18.0  # BASELINE.md (derived from epoch logs)
BATCH = 64
WARMUP_STEPS = 3
TIMED_STEPS = 20


def main():
    import jax
    # hardware PRNG for dropout masks (~25% step-time savings vs threefry;
    # mask quality is irrelevant to dropout semantics)
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.train.mi import (create_mi_state, make_mi_train_step,
                                   make_optimizers)

    cfg = TrainingConfig().replace(
        batch_size=BATCH, compute_dtype="bfloat16", mi_estimator="dv",
        use_pallas_critic=jax.default_backend() == "tpu")
    bert_cfg = BertConfig(num_classes=cfg.output_channels,
                          flash_attention=jax.default_backend() == "tpu")
    model = ImageReportModel(bert_config=bert_cfg,
                             output_channels=cfg.output_channels,
                             dtype=jnp.bfloat16)

    txs = make_optimizers(cfg, steps_per_epoch=200_000 // BATCH)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    train_step = make_mi_train_step(model, txs, cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((BATCH, cfg.img_size, cfg.img_size, 1),
                                        np.float32)),
        "txt_ids": jnp.asarray(rng.integers(0, bert_cfg.vocab_size,
                                            (BATCH, cfg.max_seq_length))
                               .astype(np.int32)),
        "txt_masks": jnp.ones((BATCH, cfg.max_seq_length), jnp.int32),
        "txt_segments": jnp.zeros((BATCH, cfg.max_seq_length), jnp.int32),
        "study_id": jnp.asarray(np.arange(BATCH, dtype=np.int64)),
    }

    for _ in range(WARMUP_STEPS):
        state, loss = train_step(state, batch)
        float(loss)

    # Sustained-training methodology: dispatch TIMED_STEPS chained steps
    # (each consumes the previous state, so the final loss value forces the
    # whole chain) and force-read only the final loss.  NOTE: through the
    # axon tunnel, block_until_ready on a queued future returns early —
    # only a device->host value fetch is an honest barrier; and per-step
    # value reads would add a ~40 ms tunnel round trip per step that real
    # training (prefetched pipeline) does not pay.
    losses = []
    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        state, loss = train_step(state, batch)
        losses.append(loss)
    final = float(loss)
    dt = (time.perf_counter() - t0) / TIMED_STEPS
    assert np.isfinite(final)
    distinct = len({round(float(l), 9) for l in losses})
    assert distinct == TIMED_STEPS, f"steps did not all execute: {distinct}"

    pairs_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "mi_train_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
