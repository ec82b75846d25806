"""Decompose a Manager-equivalent MI epoch into its serial phases on the
real chip, to localize loop overhead that tools/bench_manager.py's
end-to-end number cannot attribute.

Phases measured over the IDENTICAL chunk stream (bench_manager's synthetic
corpus at bench.py's bucket mix, B=64, scan_steps=8):

* host_only      — Loader + scan_chunks stacking, nothing touches jax.
* put_serial     — host_only + jax.device_put per chunk, blocked per chunk
                   (the serial host+transfer floor bench_manager reports).
* dispatch_only  — multi_step over DEVICE-resident chunks, one final block
                   (bench.py-equivalent compute floor on this exact mix).
* put_dispatch   — prebuilt HOST chunks -> device_put -> dispatch, one
                   final block (the Manager loop minus the Loader).
* full_loop      — the Manager's exact epoch body: Loader -> scan_chunks ->
                   device_prefetch -> dispatch -> epoch-end loss read.

Identical jit signatures to the Manager (same cfg, same t_total), so the
persistent compile cache at /tmp/jax_cache_bench is shared with
bench_manager runs.  Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_manager import (BATCH, BUCKET_MIX, SCAN_STEPS,
                                 SyntheticPairedCorpus, bucket_batches)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.data.pipeline import Loader, device_prefetch, scan_chunks
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train import mi as mi_lib

    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainingConfig().replace(
        save_directory="/tmp/bench_phases_unused",
        batch_size=BATCH, compute_dtype="bfloat16", mi_estimator="dv",
        use_pallas_critic=on_tpu, gelu_tanh=True,
        adamw_moment_dtype="bfloat16", scan_steps=SCAN_STEPS,
        seq_buckets=tuple(sorted(BUCKET_MIX)),
        num_train_epochs=3)  # matches bench_manager --epochs 3 => same t_total
    bert_cfg = BertConfig(num_classes=cfg.output_channels,
                          flash_attention=on_tpu, gelu_tanh=True)

    batches = bucket_batches(scale=2)
    steps_per_epoch = sum(batches.values())
    corpus = SyntheticPairedCorpus(batches, cfg.img_size, cfg.max_seq_length,
                                   bert_cfg.vocab_size, host_work="none")

    model = mi_lib.build_joint_model(cfg, bert_cfg)
    txs = mi_lib.make_optimizers(cfg, steps_per_epoch=steps_per_epoch)
    state = mi_lib.create_mi_state(model, cfg, txs, jax.random.PRNGKey(cfg.seed))
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.shard_mi_state(mesh, state)
    multi_step = mi_lib.make_mi_multi_step(model, txs, cfg, data_shards=1)

    def batch_shard(b):
        return (mesh_lib.stacked_batch_sharding(mesh)
                if b["image"].ndim == 5 else mesh_lib.batch_sharding(mesh))

    def stream(epoch):
        return scan_chunks(
            Loader(corpus, batch_size=BATCH, seed=cfg.seed, num_workers=2,
                   bucket_lengths=sorted(BUCKET_MIX)).epoch(epoch),
            SCAN_STEPS)

    # HARD sync: through the axon tunnel, block_until_ready on a queued
    # future returns EARLY (see memory notes) — only a device_get of a
    # value data-dependent on the work actually drains the queue.
    sum_img = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def drain(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))
                                    if hasattr(x, "astype") else x))

    # -- compile epoch (also builds the device/host chunk lists) ----------
    host_chunks = []
    dev_chunks = []
    t0 = time.perf_counter()
    for chunk in stream(0):
        host_chunks.append(chunk)
        d = jax.device_put(chunk, batch_shard(chunk))
        dev_chunks.append(d)
        state, losses = multi_step(state, d)
    drain(losses)
    compile_epoch = time.perf_counter() - t0

    # -- host_only (device verified idle by the drain above) ----------------
    t0 = time.perf_counter()
    n = 0
    for chunk in stream(1):
        n += 1
    host_only = time.perf_counter() - t0

    # -- put_serial: host + transfer, hard-synced per chunk ------------------
    t0 = time.perf_counter()
    for chunk in stream(1):
        d = jax.device_put(chunk, batch_shard(chunk))
        drain(sum_img(d["image"]))  # data-dependent on the full transfer
    put_serial = time.perf_counter() - t0

    # -- dispatch_only ------------------------------------------------------
    t0 = time.perf_counter()
    for d in dev_chunks:
        state, losses = multi_step(state, d)
    drain(losses)
    dispatch_only = time.perf_counter() - t0

    # -- put_dispatch -------------------------------------------------------
    t0 = time.perf_counter()
    for chunk in host_chunks:
        d = jax.device_put(chunk, batch_shard(chunk))
        state, losses = multi_step(state, d)
    drain(losses)
    put_dispatch = time.perf_counter() - t0

    # -- full_loop (Manager epoch body, incl. epoch-end loss read) ----------
    t0 = time.perf_counter()
    step_losses = []
    for d in device_prefetch(stream(2), size=cfg.prefetch,
                             sharding=batch_shard):
        state, losses = multi_step(state, d)
        step_losses.append(losses)
    epoch_loss = float(sum(np.sum(x) for x in jax.device_get(step_losses)))
    full_loop = time.perf_counter() - t0

    print(json.dumps({
        "metric": "mi_epoch_phase_seconds",
        "chunks": n, "steps_per_epoch": steps_per_epoch,
        "compile_epoch": round(compile_epoch, 3),
        "host_only": round(host_only, 3),
        "put_serial": round(put_serial, 3),
        "dispatch_only": round(dispatch_only, 3),
        "put_dispatch": round(put_dispatch, 3),
        "full_loop": round(full_loop, 3),
        "epoch_loss": epoch_loss,
    }))


if __name__ == "__main__":
    main()
