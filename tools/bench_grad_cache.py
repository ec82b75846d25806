"""GradCache scaling probe: MI train-step batch size vs HBM on one chip.

Demonstrates the capability cfg.grad_cache_chunks buys (train/mi.py
grad_cache_body): the (B, B) contrastive negative pool can span batches
whose direct (single-pass) step does not fit in HBM, because tower
activations live one chunk at a time.  For each batch size this probe
times the sustained step (chained dispatches, final-loss force-read — the
same methodology as bench.py; single-dispatch timing through the dev
tunnel measures tunnel latency, not device time) and reports pairs/s and
per-step ms; the direct step is also attempted at the largest grad-cache
batch to show where it stops fitting.  ``peak_mb_cumulative`` is the
device allocator's PROCESS-LIFETIME high-water mark (it never resets
between configs — only the first config's value is that config's own
footprint; the axon tunnel device returns no stats at all, hence null).

Production shapes: ResNet256_6_2_1 + 12-layer BERT at L=128 (the middle
production bucket), bf16 compute, Pallas/size-dispatched pairwise critic,
DV bound, all three optimizer updates.

Usage:  python tools/bench_grad_cache.py          (runs on the real chip)
        MIMM_GC_CONFIGS=64:1,512:8 python tools/bench_grad_cache.py

Measured 2026-08-18 on one v5e chip (default configs): B=64 direct
1329 pairs/s; B=256/chunks=4 1153; B=1024/16 1177; B=2048/32 1052 —
while the direct step at B=2048 fails to compile.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_LEN = 128
WARMUP = 2
TIMED = 5
# (batch, grad_cache_chunks); chunk size stays 64 = the reference batch
# (per-chunk BatchNorm semantics match the reference's batch-64 BN).
# The duplicated first entry is a throwaway compile+warm lane; the second
# is the reported direct-step baseline.
DEFAULT_CONFIGS = [(64, 1), (64, 1), (256, 4), (1024, 16), (2048, 32)]


def parse_configs():
    env = os.environ.get("MIMM_GC_CONFIGS")
    if not env:
        return DEFAULT_CONFIGS
    out = []
    for part in env.split(","):
        b, c = part.split(":")
        out.append((int(b), int(c)))
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench_gc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.train.mi import (create_mi_state, make_mi_train_step,
                                   make_optimizers)

    on_tpu = jax.default_backend() == "tpu"
    dev = jax.devices()[0]

    def peak_mb():
        try:
            return round(dev.memory_stats()["peak_bytes_in_use"] / 2**20)
        except Exception:
            return None  # the axon tunnel device exposes no memory stats

    def build(batch, chunks):
        """One config's (step_fn, init_state_fn, batch_data) — shared by
        the sweep and the direct probe so the two sides of the
        direct-vs-grad-cache comparison can never drift apart."""
        cfg = TrainingConfig().replace(
            batch_size=batch, compute_dtype="bfloat16", mi_estimator="dv",
            use_pallas_critic=on_tpu, gelu_tanh=True,
            adamw_moment_dtype="bfloat16", grad_cache_chunks=chunks)
        bert_cfg = BertConfig(num_classes=cfg.output_channels,
                              flash_attention=on_tpu, gelu_tanh=True)
        model = ImageReportModel(bert_config=bert_cfg,
                                 output_channels=cfg.output_channels,
                                 dtype=jnp.bfloat16)
        txs = make_optimizers(cfg, steps_per_epoch=200_000 // batch)
        step = make_mi_train_step(model, txs, cfg)
        rng = np.random.default_rng(0)
        batch_data = {
            "image": jnp.asarray(rng.integers(
                0, 255, (batch, cfg.img_size, cfg.img_size, 1)).astype(np.uint8)),
            "txt_ids": jnp.asarray(rng.integers(
                0, bert_cfg.vocab_size, (batch, SEQ_LEN)).astype(np.uint16)),
            "txt_masks": jnp.ones((batch, SEQ_LEN), jnp.uint8),
            "txt_segments": jnp.zeros((batch, SEQ_LEN), jnp.uint8),
            "study_id": jnp.asarray(np.arange(batch, dtype=np.int64)),
        }
        init = lambda: create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
        return step, init, batch_data

    configs = parse_configs()
    using_defaults = "MIMM_GC_CONFIGS" not in os.environ
    results = []
    for idx, (batch, chunks) in enumerate(configs):
        step, init, batch_data = build(batch, chunks)
        label = f"B={batch} chunks={chunks}"
        try:
            state = init()
            for _ in range(WARMUP):
                state, loss = step(state, batch_data)
                float(np.sum(jax.device_get(loss)))
            losses = []
            t0 = time.perf_counter()
            for _ in range(TIMED):
                state, loss = step(state, batch_data)
                losses.append(loss)
            final = float(jax.device_get(losses[-1]))
            dt = (time.perf_counter() - t0) / TIMED
            assert np.isfinite(final)
            distinct = len({round(float(jax.device_get(l)), 9) for l in losses})
            assert distinct == TIMED, f"steps did not all execute ({distinct})"
            rec = {"config": label, "step_ms": round(dt * 1e3, 1),
                   "pairs_per_sec": round(batch / dt, 1),
                   "peak_mb_cumulative": peak_mb(), "loss": round(final, 5)}
            del state
        except Exception as e:  # noqa: BLE001 — OOM probe is the point
            kind = "RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in str(e) \
                else type(e).__name__
            rec = {"config": label, "error": kind}
        if idx == 0 and using_defaults:
            rec["note"] = "warm-up lane (compile), not comparable"
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # direct-step attempt at the largest grad-cache batch: where the
    # single-pass step stops fitting, grad-cache keeps training
    largest = max(b for b, _ in configs)
    if largest > 64:
        step, init, batch_data = build(largest, 1)
        try:
            state = init()
            t0 = time.perf_counter()
            state, loss = step(state, batch_data)
            final = float(jax.device_get(loss))
            dt = time.perf_counter() - t0
            rec = {"config": f"B={largest} direct", "step_ms": round(dt * 1e3, 1),
                   "peak_mb_cumulative": peak_mb(), "loss": round(final, 5),
                   "note": "single dispatch incl. compile — fits after all"}
        except Exception as e:  # noqa: BLE001
            kind = "RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in str(e) \
                else type(e).__name__
            rec = {"config": f"B={largest} direct", "error": kind,
                   "note": "single-pass step fails (through the axon tunnel "
                           "an over-HBM program surfaces as a remote-compile "
                           "failure rather than RESOURCE_EXHAUSTED; at "
                           "B=2048/L=128 the unrematerialized attention "
                           "probabilities alone are ~9.7 GB bf16); the "
                           "grad-cache step at the same batch trains"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
