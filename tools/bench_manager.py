"""Manager-driven epoch throughput: proves the REAL training loop
(MultiModalManager.train — Loader + scan_chunks + device_prefetch +
device-side loss accumulation) sustains bench.py's step rate, i.e. that
none of the loop machinery the bench deliberately bypasses (host batching,
prefetch hand-off, loss accounting, epoch bookkeeping) is a bottleneck.

Methodology: a synthetic corpus whose per-bucket batch counts scale
bench.py's BUCKET_MIX (rounded to whole scan chunks, so the epoch runs
exactly the production multi-step dispatch with no leftover single-step
variants to compile) feeds the unmodified Manager at the production
configuration (B=64, seq buckets, scan_steps=8, compact transfer, bf16 +
tanh-GELU + bf16 AdamW moments).  The first epoch pays the per-bucket
compiles; the MIDDLE epoch (no checkpoint write — cfg.checkpoint_every_
epochs) is the reported number, read back from the Manager's own metrics
JSONL.

The acceptance comparison is apples-to-apples against the epoch's two
serial floors: (a) compute floor = sum over buckets of (batches_in_bucket
x bench.py's per-bucket scan ms) — what bench.py's bare step-dispatch
loop would take on this exact batch mix; (b) transfer floor = a measured
pure device_put pass over the identical chunk stream (the host->device
link is serial; through the axon dev tunnel at ~40 MB/s it dominates,
on a real PCIe host it vanishes).  PASS = the Manager epoch runs in
<= 1/0.95 of max(compute floor, transfer floor), i.e. the loop
machinery adds <= 5% over whichever resource is saturated (VERDICT.md
round-1 item 3, made tunnel-honest).

Host-work modes (--host_work):
* none (default): dataset.load returns precomputed compact samples — the
  measured path is exactly the Manager loop + host->device transfer +
  train step.
* transform: dataset.load additionally runs the real native affine-crop
  on a larger source image (the production host path minus JPEG decode).
  On this 1-core dev box that is host-bound by construction (64 crops/
  batch on one core vs a ~15 ms device step) — production hosts have
  tens of cores; the mode documents per-sample host cost, not a device
  limit.
* decode: the FULL production host path — cv2.imread of a real full-res
  CXR JPEG (cycling over the 142 shipped reference images) followed by
  the native affine-crop.  Host-bound on this box by the same
  arithmetic; tools/bench_decode.py publishes the per-image ms and the
  cores-needed-at-target-rate table this mode's epoch time should be
  read against.

Usage:
    python tools/bench_manager.py [--scale 2] [--epochs 3]
        [--host_work none] [--bench_bucket_ms '{"64":27.9,...}']
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the headline bench's bucket mix — imported, not copied, so a rederived
# mix (tools/derive_buckets.py) can never leave this floor comparison
# computed against a different distribution
from bench import BUCKET_MIX  # noqa: E402  (bench.py top-level is light)
# bench.py per-bucket scan-dispatch ms on the v5e chip (2026-08-17 run);
# override with --bench_bucket_ms from a fresh bench.py line
BENCH_BUCKET_MS = {64: 27.9, 96: 34.3, 128: 42.3, 192: 81.7, 320: 127.2}
BATCH = 64
SCAN_STEPS = 8


def bucket_batches(scale: int) -> dict:
    """Per-bucket batch counts: BUCKET_MIX scaled to ~64*scale batches,
    rounded to whole scan chunks (multiples of SCAN_STEPS, min one chunk)
    so the epoch is pure multi-step dispatch — exactly what a production
    epoch is up to its <0.5% leftover singles."""
    total = 64 * scale
    return {b: max(SCAN_STEPS,
                   int(round(BUCKET_MIX[b] * total / SCAN_STEPS)) * SCAN_STEPS)
            for b in BUCKET_MIX}


class SyntheticPairedCorpus:
    """CXRImageReportDataset stand-in with controlled per-bucket counts.

    Exposes the exact interface the Loader consumes (__len__, load,
    token_length) and produces compact-transfer samples (uint8 crops,
    uint16/uint8 tokens) shaped identically to the production dataset's
    (data/pipeline.py CXRImageReportDataset.load)."""

    def __init__(self, batches: dict, img_size: int, max_seq_length: int,
                 vocab_size: int, host_work: str, pool: int = 256,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.img_size = img_size
        self.host_work = host_work
        n = sum(batches.values()) * BATCH
        p = min(n, pool)
        if host_work == "decode":
            import glob as _glob
            self.pool = sorted(_glob.glob(
                "/root/reference/full_data_set/images/*/*.jpg"))
            if not self.pool:
                raise SystemExit("--host_work decode needs the reference "
                                 "fixture images")
        elif host_work == "transform":
            src = img_size + 64  # room for the affine crop to sample from
            self.pool = rng.integers(0, 255, (p, src, src)).astype(np.uint8)
        else:
            self.pool = rng.integers(0, 255, (p, img_size, img_size)) \
                .astype(np.uint8)
        # per-sample true token length: fill each bucket b with
        # batches[b]*BATCH samples at lengths in (prev_bucket, b]
        lengths = []
        prev = 2
        for b in sorted(batches):
            lengths += list(rng.integers(prev + 1, b + 1, batches[b] * BATCH))
            prev = b
        self.lengths = np.array(lengths, np.int32)
        self.ids = rng.integers(4, vocab_size, (n, max_seq_length)) \
            .astype(np.uint16)
        self.mask = np.zeros((n, max_seq_length), np.uint8)
        for i, l in enumerate(self.lengths):
            self.mask[i, :l] = 1
        self.segments = np.zeros((n, max_seq_length), np.uint8)
        self.n = n

    def __len__(self):
        return self.n

    def token_length(self, idx: int) -> int:
        return int(self.lengths[idx])

    def load(self, idx, rng, train=True):
        from mimm_tpu.data import transforms
        src = self.pool[idx % len(self.pool)]
        if self.host_work == "decode":
            import cv2
            decoded = cv2.imread(src, cv2.IMREAD_ANYDEPTH)
            img = transforms.reference_transform(decoded, rng, self.img_size,
                                                 train=train, raw=True)
            if img.dtype != np.uint8:  # 16-bit sources: keep compact uint8
                img = (img.astype(np.float32) * (255.0 / max(1, img.max()))) \
                    .astype(np.uint8)
        elif self.host_work == "transform":
            img = transforms.reference_transform(src, rng, self.img_size,
                                                 train=train, raw=True)
        else:
            img = src
        return {
            "image": img[..., None],
            "txt_ids": self.ids[idx],
            "txt_masks": self.mask[idx],
            "txt_segments": self.segments[idx],
            "study_id": np.int64(1_000_000 + idx),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=2,
                    help="epoch size multiplier (~64*scale batches)")
    ap.add_argument("--epochs", type=int, default=3,
                    help=">= 3: first compiles, middle is measured, last "
                         "absorbs the mandatory final checkpoint")
    ap.add_argument("--host_work", choices=("none", "transform", "decode"),
                    default="none")
    ap.add_argument("--bench_bucket_ms", type=json.loads, default=None,
                    help='per-bucket scan ms from bench.py, e.g. '
                         '\'{"64":27.9,"96":34.3,...}\'')
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    if args.epochs < 3:
        ap.error("--epochs must be >= 3: epoch 1 pays the compiles, the "
                 "last pays the mandatory final checkpoint; only a MIDDLE "
                 "epoch measures the steady state")
    bench_ms = {int(k): float(v)
                for k, v in (args.bench_bucket_ms or BENCH_BUCKET_MS).items()}

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import MultiModalManager

    wd = args.workdir or tempfile.mkdtemp(prefix="bench_manager_")
    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainingConfig.production(
        save_directory=os.path.join(wd, "save"),
        batch_size=BATCH, mi_estimator="dv",
        use_pallas_critic=on_tpu, flash_attention=on_tpu,
        scan_steps=SCAN_STEPS,
        num_train_epochs=args.epochs,
        # no checkpoint inside measured epochs (the final epoch still saves)
        checkpoint_every_epochs=1_000_000,
        data_loader_workers=8 if args.host_work != "none" else 2)
    bert_cfg = BertConfig(num_classes=cfg.output_channels,
                          flash_attention=cfg.flash_attention,
                          gelu_tanh=cfg.gelu_tanh)

    batches = bucket_batches(args.scale)
    steps_per_epoch = sum(batches.values())
    corpus = SyntheticPairedCorpus(batches, cfg.img_size, cfg.max_seq_length,
                                   bert_cfg.vocab_size, args.host_work)

    # Transfer floor: the host->device link is a serial resource the epoch
    # cannot beat no matter how well transfers overlap compute.  On a real
    # TPU host (PCIe, GB/s) this floor is negligible; through the axon dev
    # tunnel it rivals or exceeds the compute floor, so the acceptance
    # ratio below compares against max(compute floor, transfer floor).
    # NOTE the hard sync: through the tunnel, block_until_ready on a
    # queued put returns EARLY — only a device_get of a value
    # data-dependent on the transferred bytes actually measures it.
    import time

    import jax.numpy as jnp

    from mimm_tpu.data.pipeline import Loader, scan_chunks
    sum_img = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    stream = scan_chunks(
        Loader(corpus, batch_size=BATCH, seed=cfg.seed, num_workers=2,
               bucket_lengths=sorted(BUCKET_MIX)).epoch(0), SCAN_STEPS)
    t0 = time.perf_counter()
    for chunk in stream:
        d = jax.device_put(chunk)
        jax.device_get(sum_img(d["image"]))
    transfer_secs = time.perf_counter() - t0

    mgr = MultiModalManager(cfg, bert_config=bert_cfg,
                            load_pretrained_bert=False)
    mgr.train(token_features=None, dataset=corpus,
              export_torch_bins=False)

    recs = [json.loads(l) for l in
            open(os.path.join(cfg.save_directory, "mi.jsonl"))]
    epochs = [r for r in recs if "epoch_seconds" in r]
    # middle epochs: exclude the compile epoch and the final (checkpoint)
    measured = epochs[1:-1] or epochs[-1:]
    secs = min(r["epoch_seconds"] for r in measured)
    pairs_per_sec = steps_per_epoch * BATCH / secs
    expected_secs = sum(batches[b] * bench_ms[b] for b in batches) / 1e3
    # the epoch cannot run faster than EITHER serial floor; a well-
    # overlapped Manager loop should sit at their max
    floor_secs = max(expected_secs, transfer_secs)
    ratio = floor_secs / secs

    print(json.dumps({
        "metric": "manager_epoch_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "host_work": args.host_work,
        "steps_per_epoch": steps_per_epoch,
        "bucket_batches": {str(b): batches[b] for b in sorted(batches)},
        "epoch_seconds": round(secs, 3),
        "bench_expected_seconds": round(expected_secs, 3),
        "transfer_floor_seconds": round(transfer_secs, 3),
        "vs_floor": round(ratio, 3),
        "vs_bench_step_rate": round(expected_secs / secs, 3),
        "pass_95pct": ratio >= 0.95,
    }))
    if args.workdir is None:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
