"""A/B probe for the sequence-bucket grid — VERDICT r2 item 3 (the 192
bucket ran at ~41% MFU vs ~53% at 128: 81.5 ms for 1.5x the tokens of
the 41.5 ms 128 bucket).

Measures the FULL production MI train step (fwd+bwd+3 optimizers,
scan_steps-chained dispatch, exactly bench.py's methodology) at a list
of sequence lengths, for both attention paths:
  * einsum (flash_min_seq_len above L)
  * flash  (flash_min_seq_len below L)

Usage:
    python tools/bench_bucket_probe.py [--lens 160,192,224,256]
        [--attn both|einsum|flash] [--steps 20]

Prints one JSON line: {"<L>": {"einsum_ms": .., "flash_ms": ..}, ...}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
SCAN_STEPS = 8
WARMUP = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="160,192,224,256")
    ap.add_argument("--attn", default="both", choices=("both", "einsum", "flash"))
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    lens = [int(x) for x in args.lens.split(",") if x.strip()]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.train.mi import (create_mi_state, make_mi_multi_step,
                                   make_optimizers)

    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainingConfig.production(batch_size=BATCH, scan_steps=SCAN_STEPS,
                                    use_pallas_critic=on_tpu)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (BATCH, cfg.img_size,
                                              cfg.img_size, 1)).astype(np.uint8))
    sids = jnp.asarray(np.arange(BATCH, dtype=np.int64))

    def batch_for(seq_len, vocab):
        lead = (SCAN_STEPS, BATCH)
        return {
            "image": jnp.broadcast_to(image, lead + image.shape[1:]),
            "txt_ids": jnp.asarray(rng.integers(
                0, vocab, lead + (seq_len,)).astype(np.uint16)),
            "txt_masks": jnp.ones(lead + (seq_len,), jnp.uint8),
            "txt_segments": jnp.zeros(lead + (seq_len,), jnp.uint8),
            "study_id": jnp.broadcast_to(sids, lead),
        }

    def timed(step_fn, state, batch):
        for _ in range(WARMUP):
            state, loss = step_fn(state, batch)
            float(np.sum(jax.device_get(loss)))
        losses = []
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = step_fn(state, batch)
            losses.append(loss)
        np.asarray(jax.device_get(losses[-1]))
        dt = (time.perf_counter() - t0) / (args.steps * SCAN_STEPS)
        flat = np.concatenate([np.atleast_1d(np.asarray(x))
                               for x in jax.device_get(losses)])
        assert np.isfinite(flat).all()
        assert len({round(float(x), 9) for x in flat}) == args.steps * SCAN_STEPS
        return dt * 1e3, state

    results = {}
    modes = {"einsum": 10_000, "flash": 1}  # flash_min_seq_len per mode
    if args.attn != "both":
        modes = {args.attn: modes[args.attn]}
    for mode, flash_min in modes.items():
        bert_cfg = BertConfig(num_classes=cfg.output_channels,
                              flash_attention=on_tpu, gelu_tanh=cfg.gelu_tanh,
                              u8_dropout=cfg.u8_dropout,
                              flash_min_seq_len=flash_min)
        model = ImageReportModel(bert_config=bert_cfg,
                                 output_channels=cfg.output_channels,
                                 dtype=jnp.bfloat16)
        txs = make_optimizers(cfg, steps_per_epoch=200_000 // BATCH)
        state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
        multi_step = make_mi_multi_step(model, txs, cfg)
        for L in lens:
            ms, state = timed(multi_step, state, batch_for(L, bert_cfg.vocab_size))
            results.setdefault(str(L), {})[f"{mode}_ms"] = round(ms, 1)
            print(f"# L={L} {mode}: {ms:.1f} ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
