"""PRODUCTION-SHAPE trajectory-parity band test (opt-in, slow — VERDICT r2
item 1a): bert-base (12 layers, hidden 768) + 256px ResNet + B=16, fp32,
40 full MI optimizer steps vs the torch oracle, asserted against a noise
band measured from torch-vs-torch weight-rounding variance.

Why a BAND and not equality: in fp32 the oneDNN-vs-XLA conv
accumulation-order noise (~1e-4 relative on embeddings) is chaotically
amplified through the near-zero DV loss landscape — two EXACT
implementations drift apart geometrically (the f64 golden in
test_reference_step_parity.py proves algorithmic equality; this test
proves the drift at production shapes is exactly rounding-noise-sized).
The band: run the torch oracle twice, once exact and once with every
weight perturbed multiplicatively at 1e-6 relative (~8x fp32 ulp — an
upper bound on cross-framework rounding of the exchanged weights). The
per-step |exact - perturbed| divergence envelope is how fast ANY
rounding-scale difference grows; the jax trajectory must stay within a
small multiple of it.

Runtime: ~25-40 min on the 1-core dev box (two 40-step torch bert-base
runs + one jax run).  Gate: MIMM_RUN_PRODSHAPE=1.
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

B = 16
SEQ = 128
STEPS = 40
N_BATCHES = 8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_torch_oracle(work_dir):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OMP_NUM_THREADS"] = "1"
    env["USE_TF"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "torch_reference.py"),
         work_dir],
        env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, \
        f"torch oracle failed (rc={proc.returncode}):\n{proc.stderr[-4000:]}"
    with np.load(os.path.join(work_dir, "out.npz")) as z:
        return z["z_fwd"], z["et_fwd"], z["losses"]


@pytest.mark.skipif(os.environ.get("MIMM_RUN_PRODSHAPE") != "1",
                    reason="set MIMM_RUN_PRODSHAPE=1 (two ~10-min torch "
                           "bert-base runs + one jax run)")
def test_production_shape_trajectory_band(tmp_path):
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    cfg = TrainingConfig.parity().replace(
        batch_size=B, img_size=256, max_seq_length=SEQ,
        num_train_epochs=1, mi_estimator="dv", init_lr=1e-4,
        bert_lr=2e-5, seed=0)
    bert_cfg = BertConfig(num_classes=1, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          flash_attention=False)  # bert-base defaults
    assert bert_cfg.hidden_size == 768 and bert_cfg.num_hidden_layers == 12
    model = ImageReportModel(bert_config=bert_cfg, output_channels=1,
                             dtype=jnp.float32)
    steps_per_epoch = STEPS  # t_total=40 -> warmup=4 on both sides
    txs = make_optimizers(cfg, steps_per_epoch=steps_per_epoch)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    params = jax.device_get(state.params)
    bstats = jax.device_get(state.batch_stats)
    critic_params = jax.device_get(state.critic_params)

    # ---- weight exchange through the production .bin converters ----
    img_sd = ckpt.resnet_state_dict_from_variables(
        {"params": params["image_model"],
         "batch_stats": bstats["image_model"]})
    txt_sd = ckpt.bert_state_dict_from_variables(
        {"params": params["text_model"]}, bert_cfg.num_hidden_layers)
    critic_sd = ckpt.mlp_state_dict_from_params(critic_params,
                                                sequential=True)
    perm = _flatten_perm(192, 2, 2)
    w0 = critic_sd["0.weight"].copy()
    w0[:, perm] = critic_sd["0.weight"][:, :768]
    critic_sd = dict(critic_sd, **{"0.weight": w0})

    rng = np.random.default_rng(0)
    batches = []
    for n in range(N_BATCHES):
        sids = np.arange(B, dtype=np.int64) + 100 * n
        if n == 2:  # duplicate study id: exercises the negative mask
            sids[1] = sids[0]
        batches.append({
            "image": jnp.asarray(rng.random((B, 256, 256, 1)).astype(np.float32)),
            "txt_ids": jnp.asarray(rng.integers(
                0, bert_cfg.vocab_size, (B, SEQ)).astype(np.int32)),
            "txt_masks": jnp.ones((B, SEQ), jnp.int32),
            "txt_segments": jnp.zeros((B, SEQ), jnp.int32),
            "study_id": jnp.asarray(sids),
        })

    base_cfg_json = {
        "output_channels": 1, "vocab_size": bert_cfg.vocab_size,
        "hidden_size": 768, "num_hidden_layers": 12,
        "num_attention_heads": 12, "intermediate_size": 3072,
        "max_position_embeddings": bert_cfg.max_position_embeddings,
        "critic_in": 768 + 768, "critic_hidden": [1024, 512],
        "init_lr": cfg.init_lr, "bert_lr": cfg.bert_lr,
        "warmup": 0.1 * steps_per_epoch, "t_total": steps_per_epoch,
        "steps": STEPS, "dtype": "float32",
    }

    losses_torch = {}
    for tag, perturb in (("exact", 0.0), ("perturbed", 1e-6)):
        work = str(tmp_path / tag)
        os.makedirs(work, exist_ok=True)
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
            json.dump(dict(base_cfg_json, perturb_scale=perturb), f)
        z_fwd, et_fwd, losses = _run_torch_oracle(work)
        losses_torch[tag] = losses
        if tag == "exact":
            z_torch, et_torch = z_fwd, et_fwd

    # ---- forward sanity: fp32 cross-framework embedding agreement ----
    outs, _ = model.apply(
        {"params": params, "batch_stats": bstats},
        batches[0]["image"], batches[0]["txt_ids"], batches[0]["txt_masks"],
        batches[0]["txt_segments"], train=True,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(outs[0]), z_torch[:, perm],
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(outs[1]), et_torch,
                               atol=5e-3, rtol=1e-2)

    # ---- jax trajectory ----
    step = make_mi_train_step(model, txs, cfg)
    jax_losses = []
    for s in range(STEPS):
        state, loss = step(state, batches[s % N_BATCHES])
        jax_losses.append(float(loss))
    jax_losses = np.asarray(jax_losses)
    assert np.isfinite(jax_losses).all()

    exact = losses_torch["exact"]
    band = np.abs(exact - losses_torch["perturbed"])
    envelope = np.maximum.accumulate(band)
    # floor: below this the comparison is exact-agreement territory the
    # f64 golden already covers; 10x: margin over the single-perturbation
    # divergence sample
    allowed = np.maximum(10.0 * envelope, 5e-3 * np.maximum(1.0, np.abs(exact)))
    diff = np.abs(jax_losses - exact)
    bad = np.where(diff > allowed)[0]
    assert bad.size == 0, (
        f"jax left the torch noise band at steps {bad.tolist()}:\n"
        f"jax={jax_losses[bad]}\nexact={exact[bad]}\n"
        f"band={band[bad]}\nallowed={allowed[bad]}")
    # the band itself must be non-degenerate (the perturbed run diverged),
    # otherwise "inside the band" would be vacuous
    assert envelope[-1] > 0
