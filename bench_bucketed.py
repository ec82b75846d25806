"""Secondary benchmark: MI throughput with sequence bucketing on the
REAL report-length distribution.

bench.py measures the conservative configuration (every report padded to
the reference's max_seq_length=320).  Real MIMIC-CXR reports average ~85
WordPiece tokens (measured on the in-repo fixture corpus: p50=77, p90=130,
p99=231), so production training uses length buckets; this benchmark
replays that distribution (33% <=64, 56% <=128, 9% <=192, 2% <=320) and
reports the weighted sustained pairs/sec across the per-bucket step
variants.

Prints one JSON line (metric: mi_train_pairs_per_sec_bucketed).
"""

import json
import time

import numpy as np

BATCH = 64
BUCKET_MIX = {64: 0.33, 128: 0.56, 192: 0.09, 320: 0.02}
WARMUP, TIMED = 2, 10


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.train.mi import (create_mi_state, make_mi_train_step,
                                   make_optimizers)

    cfg = TrainingConfig().replace(batch_size=BATCH, compute_dtype="bfloat16",
                                   use_pallas_critic=jax.default_backend() == "tpu")
    bert_cfg = BertConfig(num_classes=1,
                          flash_attention=jax.default_backend() == "tpu")
    model = ImageReportModel(bert_config=bert_cfg, output_channels=1,
                             dtype=jnp.bfloat16)
    txs = make_optimizers(cfg, steps_per_epoch=200_000 // BATCH)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    train_step = make_mi_train_step(model, txs, cfg)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((BATCH, 256, 256, 1), np.float32))
    sids = jnp.asarray(np.arange(BATCH, dtype=np.int64))

    def batch_for(L):
        return {
            "image": img,
            "txt_ids": jnp.asarray(rng.integers(0, 30522, (BATCH, L)).astype(np.int32)),
            "txt_masks": jnp.ones((BATCH, L), jnp.int32),
            "txt_segments": jnp.zeros((BATCH, L), jnp.int32),
            "study_id": sids,
        }

    step_time = {}
    for L in BUCKET_MIX:
        batch = batch_for(L)
        for _ in range(WARMUP):
            state, loss = train_step(state, batch)
            float(loss)
        t0 = time.perf_counter()
        for _ in range(TIMED):
            state, loss = train_step(state, batch)
        float(loss)
        step_time[L] = (time.perf_counter() - t0) / TIMED

    weighted = sum(BUCKET_MIX[L] * step_time[L] for L in BUCKET_MIX)
    pairs_per_sec = BATCH / weighted
    print(json.dumps({
        "metric": "mi_train_pairs_per_sec_bucketed",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 18.0, 2),
        "per_bucket_ms": {str(L): round(t * 1e3, 1) for L, t in step_time.items()},
    }))


if __name__ == "__main__":
    main()
