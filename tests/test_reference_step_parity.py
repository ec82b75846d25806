"""FULL-STEP golden test against real torch: MI training steps — joint
ResNet+BERT forward, create_mi_pairs, DV bound, and all three optimizer
updates — must produce the same per-step losses as a torch replica of the
reference (main_utils.py:209-230) along a 12-step TRAJECTORY over 4
distinct batches (3 passes; one batch carries a duplicate study id to
exercise the same-study negative exclusion), with identical weights
(exchanged through the repo's .bin converters) and identical batches.
This is the strongest feasible stand-in for the mm_dv_epoch20
loss-trajectory gate (BASELINE.md) without the real corpus and clinical
BERT weights.

Run in float64 on BOTH sides (dropout off, BatchNorm in train mode): in
fp32 the oneDNN-vs-XLA conv accumulation-order noise (~4e-4 on the
embeddings) gets chaotically amplified through the near-zero DV loss
landscape — by step 4 the fp32 losses differ by 50% even though both
implementations are exact.  In f64 the same 5 steps agree to ~1e-9, which
is what makes this a proof of algorithmic equivalence rather than a
tolerance negotiation.

The torch replica runs in a SUBPROCESS (tests/torch_reference.py main):
jaxlib's XLA:CPU and torch both embed oneDNN, and running torch conv
backward after XLA executions in the same address space corrupts the
heap on this image (`free(): invalid next size` / `double free`).  The
child gets a clean interpreter: the axon sitecustomize is disabled via
env and jax is never imported there.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.checkpoint import _flatten_perm
from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.models.joint import ImageReportModel
from mimm_tpu.train.mi import (MITrainState, create_mi_state,
                               make_mi_train_step, make_optimizers)

B = 5
SEQ = 16
STEPS = 12       # 3 passes over N_BATCHES distinct batches — a short
N_BATCHES = 4    # loss TRAJECTORY, not a single repeated step
VOCAB = 64
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_torch_oracle(work_dir):
    """Run tests/torch_reference.py in a jax-free child interpreter."""
    env = dict(os.environ)
    # neuter the axon sitecustomize (it imports jax + the TPU plugin into
    # every interpreter when this var is set) and keep BLAS single-threaded
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OMP_NUM_THREADS"] = "1"
    env["USE_TF"] = "0"  # transformers: never import tensorflow
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "torch_reference.py"),
         work_dir],
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, \
        f"torch oracle failed (rc={proc.returncode}):\n{proc.stderr[-4000:]}"
    with np.load(os.path.join(work_dir, "out.npz")) as z:
        return z["z_fwd"], z["et_fwd"], z["losses"]


def test_full_mi_step_matches_torch_reference(tmp_path):
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    work = str(tmp_path)

    with jax.enable_x64(True):
        # ---- jax side: f64 model + state --------------------------------
        cfg = TrainingConfig().replace(
            batch_size=B, img_size=256, max_seq_length=SEQ,
            compute_dtype="float32", num_train_epochs=1, mi_estimator="dv",
            use_pallas_critic=False, flash_attention=False, init_lr=1e-3,
            bert_lr=2e-5, seed=0)
        bert_cfg = BertConfig(vocab_size=VOCAB, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=2,
                              intermediate_size=64,
                              max_position_embeddings=32, num_classes=1,
                              hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0)
        model = ImageReportModel(bert_config=bert_cfg, output_channels=1,
                                 dtype=jnp.float64)
        steps_per_epoch = 20  # total=20 -> warmup=2.0 on both sides
        txs = make_optimizers(cfg, steps_per_epoch=steps_per_epoch)
        state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))

        # params initialize as f32 (production param dtype); promote the
        # whole training state to f64 and rebuild the optimizer moments at
        # f64 so every update runs in doubles
        up = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        params = up(jax.device_get(state.params))
        bstats = up(jax.device_get(state.batch_stats))
        critic_params = up(jax.device_get(state.critic_params))
        state = MITrainState(
            params=params, batch_stats=bstats, critic_params=critic_params,
            img_opt=txs.img.init(params["image_model"]),
            mi_opt=txs.mi.init(critic_params),
            txt_opt=txs.txt.init(params["text_model"]),
            step=state.step)

        # ---- weight exchange through the production .bin converters ----
        img_sd = ckpt.resnet_state_dict_from_variables(
            {"params": params["image_model"],
             "batch_stats": bstats["image_model"]})
        txt_sd = ckpt.bert_state_dict_from_variables(
            {"params": params["text_model"]}, bert_cfg.num_hidden_layers)
        critic_sd = ckpt.mlp_state_dict_from_params(critic_params,
                                                    sequential=True)
        # the critic's first layer consumes [img_z ; txt]: img_z flattens
        # NHWC in flax but NCHW in torch, so re-wire the img-half columns
        perm = _flatten_perm(192, 2, 2)
        w0 = critic_sd["0.weight"].copy()
        w0[:, perm] = critic_sd["0.weight"][:, :768]
        critic_sd = dict(critic_sd, **{"0.weight": w0})

        rng = np.random.default_rng(0)
        batches = []
        for n in range(N_BATCHES):
            # batch 2 carries a duplicate study id so the trajectory also
            # exercises the same-study negative exclusion (main_utils.py:105)
            sids = np.arange(B, dtype=np.int64) + 10 * n
            if n == 2:
                sids[1] = sids[0]
            batches.append({
                "image": jnp.asarray(rng.random((B, 256, 256, 1), np.float64)),
                "txt_ids": jnp.asarray(
                    rng.integers(0, VOCAB, (B, SEQ)).astype(np.int32)),
                "txt_masks": jnp.ones((B, SEQ), jnp.int32),
                "txt_segments": jnp.zeros((B, SEQ), jnp.int32),
                "study_id": jnp.asarray(sids),
            })
        batch = batches[0]  # forward-golden batch

        # ---- hand everything to the torch child -------------------------
        np.savez(os.path.join(work, "img_sd.npz"), **img_sd)
        np.savez(os.path.join(work, "txt_sd.npz"), **txt_sd)
        np.savez(os.path.join(work, "critic_sd.npz"), **critic_sd)
        np.savez(os.path.join(work, "batch.npz"),
                 image_nchw=np.stack([np.transpose(np.asarray(b["image"]),
                                                   (0, 3, 1, 2))
                                      for b in batches]),
                 txt_ids=np.stack([np.asarray(b["txt_ids"]) for b in batches]),
                 txt_masks=np.stack([np.asarray(b["txt_masks"])
                                     for b in batches]),
                 txt_segments=np.stack([np.asarray(b["txt_segments"])
                                        for b in batches]),
                 study_id=np.stack([np.asarray(b["study_id"])
                                    for b in batches]))
        with open(os.path.join(work, "config.json"), "w") as f:
            json.dump({
                "output_channels": 1, "vocab_size": VOCAB,
                "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 2, "intermediate_size": 64,
                "max_position_embeddings": 32, "critic_in": 768 + 32,
                "critic_hidden": [1024, 512], "init_lr": cfg.init_lr,
                "bert_lr": cfg.bert_lr, "warmup": 0.1 * steps_per_epoch,
                "t_total": steps_per_epoch, "steps": STEPS,
                "dtype": "float64",
            }, f)
        z_torch, et_torch, torch_losses = _run_torch_oracle(work)

        # ---- forward golden: embeddings agree before any update --------
        outs, _ = model.apply(
            {"params": params, "batch_stats": bstats},
            batch["image"], batch["txt_ids"], batch["txt_masks"],
            batch["txt_segments"], train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(outs[0]), z_torch[:, perm],
                                   atol=1e-10, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(outs[1]), et_torch,
                                   atol=1e-10, rtol=1e-9)

        # ---- jax trajectory vs the reference torch trajectory -----------
        step = make_mi_train_step(model, txs, cfg)
        jax_losses = []
        for s in range(STEPS):
            state, loss = step(state, batches[s % N_BATCHES])
            jax_losses.append(float(loss))

    # per-step agreement degrades geometrically (f64 accumulation-order
    # noise through a chaotic low-loss landscape: ~1e-13 at step 0 to
    # ~1e-7 by step 11); 1e-6 absolute is still a proof of algorithmic
    # equivalence on losses of magnitude 1e-3..1e-1
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-5,
                               atol=1e-6)
