"""Encoder freeze options (reference TextBert.freeze_bert_encoder
model.py:83-86 and ResNet256_6_2_1.freeze_encoder model.py:490-495):
frozen parameters receive exactly zero updates while the designated
trainable subsets move."""

import jax
import numpy as np

from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                               make_mi_train_step, make_optimizers)

TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_classes=1)


def _batch(B, img, seq):
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    return {
        "image": jnp.asarray(rng.random((B, img, img, 1), np.float32)),
        "txt_ids": jnp.asarray(rng.integers(0, 64, (B, seq)).astype(np.int32)),
        "txt_masks": jnp.ones((B, seq), jnp.int32),
        "txt_segments": jnp.zeros((B, seq), jnp.int32),
        "study_id": jnp.asarray(np.arange(B, dtype=np.int64)),
    }


def _leaf_changed(before, after):
    return {k: bool(np.any(np.abs(np.asarray(a) - np.asarray(b)) > 0))
            for (k, b), (_, a) in zip(before.items(), after.items())}


def test_freeze_masks_select_reference_subsets():
    from mimm_tpu.train.optim import bert_trainable_mask, resnet_trainable_mask

    cfg = TrainingConfig().replace(img_size=128, max_seq_length=16,
                                   compute_dtype="float32",
                                   use_pallas_critic=False,
                                   flash_attention=False)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=1)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))

    rmask = resnet_trainable_mask(state.params["image_model"])
    top = {k: all(jax.tree.leaves(v)) if jax.tree.leaves(v) else None
           for k, v in rmask.items()}
    assert top["fc1"] is True
    assert all(v is True for k, v in top.items() if k.startswith("layer6"))
    assert top["conv1"] is False and top["bn1"] is False
    assert all(v is False for k, v in top.items()
               if k.startswith(("layer1", "layer2", "layer3", "layer4",
                                "layer5")))

    tmask = bert_trainable_mask(state.params["text_model"])
    assert not any(jax.tree.leaves(tmask["bert"]))
    assert all(jax.tree.leaves(tmask["classifier"]))


def test_frozen_params_do_not_move():
    cfg = TrainingConfig().replace(
        batch_size=4, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, init_lr=1e-3,
        freeze_image_encoder=True, freeze_text_encoder=True)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    before = jax.tree.map(np.asarray, jax.device_get(state.params))
    critic_before = jax.tree.map(np.asarray,
                                 jax.device_get(state.critic_params))

    step = make_mi_train_step(model, txs, cfg)
    batch = _batch(4, 128, 16)
    # two steps: the text tower's warmup-linear lr is 0 at the very first
    # update (torch LambdaLR parity), nonzero from the second
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    after = jax.tree.map(np.asarray, jax.device_get(state.params))

    img_b, img_a = before["image_model"], after["image_model"]
    for k in img_b:
        moved = any(np.any(np.asarray(x) != np.asarray(y))
                    for x, y in zip(jax.tree.leaves(img_b[k]),
                                    jax.tree.leaves(img_a[k])))
        if k.startswith("layer6"):
            assert moved, f"trainable image param {k} did not move"
        elif k.startswith("fc"):
            # fc1 is TRAINABLE under the freeze mask (reference
            # freeze_encoder keeps it), but the MI objective uses the
            # pre-fc embedding z, so its gradient — and Adam update — is
            # exactly zero here (same as the reference's MI stage).
            assert not moved
        elif k.startswith("bn") or "block" in k or k.startswith("conv"):
            # conv/bn params frozen (batch_stats still update — they are
            # statistics, not params, same as reference eval-vs-train BN)
            assert not moved, f"frozen image param {k} moved"

    txt_b, txt_a = before["text_model"], after["text_model"]
    bert_moved = any(np.any(np.asarray(x) != np.asarray(y))
                     for x, y in zip(jax.tree.leaves(txt_b["bert"]),
                                     jax.tree.leaves(txt_a["bert"])))
    assert not bert_moved, "frozen BERT trunk moved"
    clf_moved = any(np.any(np.asarray(x) != np.asarray(y))
                    for x, y in zip(jax.tree.leaves(txt_b["classifier"]),
                                    jax.tree.leaves(txt_a["classifier"])))
    assert clf_moved, "classifier head should train"

    critic_after = jax.tree.map(np.asarray, jax.device_get(state.critic_params))
    critic_moved = any(np.any(np.asarray(x) != np.asarray(y))
                       for x, y in zip(jax.tree.leaves(critic_before),
                                       jax.tree.leaves(critic_after)))
    assert critic_moved, "critic should train"
