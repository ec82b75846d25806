"""GradCache two-pass MI step (cfg.grad_cache_chunks, train/mi.py
grad_cache_body): the chunked embed -> full-batch pairing -> chunked VJP
pipeline must be GRADIENT-EXACT against direct autodiff through the
identical chunked forward.  The capability it proves: the (B, B) negative
pool spans the full batch while tower activation memory is O(B / chunks)
— contrastive batch size beyond HBM (no reference counterpart; the
reference is activation-bound at B=64, main_utils.py:127)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.objectives import critics as critics_lib
from mimm_tpu.objectives.pairing import pairwise_critic_scores
from mimm_tpu.train.mi import (MITrainState, build_joint_model,
                               create_mi_state, make_mi_step_body,
                               make_mi_train_step, make_optimizers)

TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_classes=1)


def _cfg(**kw):
    return TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0,
        rng_impl="threefry2x32", **kw)


def _make_batch(B, img_size, seq, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.random((B, img_size, img_size, 1), np.float32)),
        "txt_ids": jnp.asarray(rng.integers(0, 64, (B, seq)).astype(np.int32)),
        "txt_masks": jnp.ones((B, seq), jnp.int32),
        "txt_segments": jnp.zeros((B, seq), jnp.int32),
        "study_id": jnp.asarray(np.arange(B, dtype=np.int64)),
    }


def _oracle_step(model, txs, cfg, state, batch, n):
    """Direct autodiff through the SAME chunked forward the grad-cache
    body runs (same per-chunk dropout keys, same BatchNorm semantics,
    same pairing) — full-memory, one backward through everything.  An
    independent re-implementation: model.apply + critics called directly,
    optimizer tail replicated from the reference contract
    (main_utils.py:226-230)."""
    base = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    step_key = jax.random.fold_in(base, state.step)
    keys = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(jnp.arange(n))
    chunks = jax.tree.map(
        lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]), batch)

    def loss_fn(joint_params, critic_params):
        def fwd(_, xs):
            chunk, key = xs
            out, mut = model.apply(
                {"params": joint_params, "batch_stats": state.batch_stats},
                chunk["image"], chunk["txt_ids"], chunk["txt_masks"],
                chunk["txt_segments"], train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return 0, ((out[0], out[1]), mut["batch_stats"])

        _, ((ei, et), bs) = jax.lax.scan(fwd, 0, (chunks, keys))
        ei = ei.reshape(-1, ei.shape[-1])
        et = et.reshape(-1, et.shape[-1])
        scores = pairwise_critic_scores(critic_params, ei, et)
        loss = critics_lib.dv_bound_from_scores(scores, batch["study_id"])
        return loss, jax.tree.map(lambda x: jnp.mean(x, 0), bs)

    (loss, new_bs), (jg, cg) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params,
                                               state.critic_params)
    img_u, img_opt = txs.img.update(jg["image_model"], state.img_opt,
                                    state.params["image_model"])
    txt_u, txt_opt = txs.txt.update(jg["text_model"], state.txt_opt,
                                    state.params["text_model"])
    mi_u, mi_opt = txs.mi.update(cg, state.mi_opt, state.critic_params)
    new_params = {
        "image_model": optax.apply_updates(state.params["image_model"], img_u),
        "text_model": optax.apply_updates(state.params["text_model"], txt_u),
    }
    new_critic = optax.apply_updates(state.critic_params, mi_u)
    return MITrainState(new_params, new_bs, new_critic, img_opt, mi_opt,
                        txt_opt, state.step + 1), loss


def test_grad_cache_matches_direct_autodiff_oracle():
    """grad_cache_chunks=4 at B=8: step-1 loss bitwise-close to the
    oracle's, BatchNorm running stats identical, and the loss after the
    (gradient-dependent) optimizer update still agrees on step 2 — a
    wrong cotangent anywhere in pass 2 would diverge it."""
    n = 4
    cfg = _cfg(grad_cache_chunks=n)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    body = jax.jit(make_mi_step_body(model, txs, cfg))
    b1 = _make_batch(8, 128, 16, seed=0)
    b2 = _make_batch(8, 128, 16, seed=1)

    s_gc = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    s_or = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))

    s_gc, loss_gc = body(s_gc, b1)
    s_or, loss_or = _oracle_step(model, txs, cfg, s_or, b1, n)
    np.testing.assert_allclose(float(loss_gc), float(loss_or),
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                         atol=1e-7),
                 s_gc.batch_stats, s_or.batch_stats)

    s_gc, loss_gc2 = body(s_gc, b2)
    s_or, loss_or2 = _oracle_step(model, txs, cfg, s_or, b2, n)
    np.testing.assert_allclose(float(loss_gc2), float(loss_or2),
                               rtol=5e-4, atol=5e-5)


def test_grad_cache_chunk1_and_fallback_match_direct_body():
    """grad_cache_chunks=1 dispatches to the direct body; a chunk count
    that does not divide the batch falls back to it at trace time — both
    must produce the direct step's exact results."""
    cfg_direct = _cfg()
    model = build_joint_model(cfg_direct, TINY_BERT)
    txs = make_optimizers(cfg_direct, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)

    step_direct = make_mi_train_step(model, txs, cfg_direct)
    s_d = create_mi_state(model, cfg_direct, txs, jax.random.PRNGKey(0))
    s_d, loss_d = step_direct(s_d, batch)

    for chunks in (1, 3):  # 3 does not divide 8 -> fallback path
        cfg = _cfg(grad_cache_chunks=chunks)
        step = make_mi_train_step(model, txs, cfg)
        s = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
        s, loss = step(s, batch)
        np.testing.assert_allclose(float(loss), float(loss_d),
                                   rtol=1e-6, atol=1e-7)


def test_grad_cache_sharded_matches_unsharded():
    """GradCache composes with the data mesh: the chunked scan runs over
    batch shards (GSPMD reshards the (n, B/n, ...) reshape) and the
    full-batch pairing still spans every chip's samples."""
    from mimm_tpu.parallel import mesh as mesh_lib

    n = 2
    cfg = _cfg(grad_cache_chunks=n)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    step = make_mi_train_step(model, txs, cfg)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    s1 = mesh_lib.replicate(mesh1,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    s1, loss1 = step(s1, mesh_lib.shard_batch(mesh1, batch))

    mesh4 = mesh_lib.make_mesh({"data": 4})
    s4 = mesh_lib.replicate(mesh4,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    s4, loss4 = step(s4, mesh_lib.shard_batch(mesh4, batch))

    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-5, atol=1e-6)


def test_manager_trains_with_grad_cache(tmp_path):
    """cfg.grad_cache_chunks plumbs through MultiModalManager.train: a
    1-epoch synthetic run under the data mesh trains with the two-pass
    body, checkpoints, and records finite losses."""
    from tests.test_train import FakePairedDataset
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.mi import MultiModalManager

    cfg = TrainingConfig().replace(
        save_directory=str(tmp_path / "save"), batch_size=4, seed=0,
        img_size=128, max_seq_length=16, compute_dtype="float32",
        num_train_epochs=1, init_lr=1e-3, prefetch=1,
        use_pallas_critic=False, flash_attention=False,
        grad_cache_chunks=2)
    mgr = MultiModalManager(cfg, bert_config=TINY_BERT,
                            load_pretrained_bert=False)
    ds = FakePairedDataset(n=8, img=128, seq=16)
    state = mgr.train(token_features=None, dataset=ds, num_epochs=1,
                      mesh=mesh_lib.make_mesh({"data": 2}))
    assert int(state.step) == 2  # 8 samples / batch 4

    import json
    import os
    recs = [json.loads(l) for l in
            open(os.path.join(cfg.save_directory, "mi.jsonl"))]
    losses = [r["epoch_loss"] for r in recs if "epoch_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_ae_chunked_accumulation_matches_oracle():
    """AE chunked gradient accumulation (cfg.grad_cache_chunks,
    train/ae.py): the scanned per-chunk value_and_grad + average must
    equal an independent oracle computing each chunk's loss/grads via
    model.apply directly and averaging — and chunks=1 plus a
    non-dividing chunk count must reproduce the direct step."""
    import optax
    from mimm_tpu.train.ae import (AETrainState, build_ae_model,
                                   create_ae_state, make_ae_train_step)
    from mimm_tpu.train.optim import adam_torch

    cfg = _cfg()  # img_size=128, batch 8
    model = build_ae_model(cfg)
    tx = adam_torch(cfg.init_lr)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.random((8, 128, 128, 1), np.float32))

    n = 4
    step_c = make_ae_train_step(model, tx, chunks=n)
    s_c = create_ae_state(model, cfg, jax.random.PRNGKey(0))
    s_c, loss_c = step_c(s_c, images)

    # oracle: per-chunk loss/grads via model.apply, averaged, same tx
    s_o = create_ae_state(model, cfg, jax.random.PRNGKey(0))
    chunks = images.reshape(n, 2, 128, 128, 1)

    def chunk_loss(params, imgs):
        out, mut = model.apply({"params": params,
                                "batch_stats": s_o.batch_stats},
                               imgs, train=True, mutable=["batch_stats"])
        return jnp.mean((out - imgs) ** 2), mut["batch_stats"]

    losses, grads, stats = [], [], []
    for i in range(n):
        (l, bs), g = jax.value_and_grad(chunk_loss, has_aux=True)(
            s_o.params, chunks[i])
        losses.append(l)
        grads.append(g)
        stats.append(bs)
    g_mean = jax.tree.map(lambda *xs: sum(xs) / n, *grads)
    bs_mean = jax.tree.map(lambda *xs: sum(xs) / n, *stats)
    loss_o = sum(float(l) for l in losses) / n
    up, opt_o = tx.update(g_mean, s_o.opt_state, s_o.params)
    params_o = optax.apply_updates(s_o.params, up)

    np.testing.assert_allclose(float(loss_c), loss_o, rtol=1e-6, atol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-5, atol=1e-6), s_c.batch_stats, bs_mean)
    # raw first-step Adam updates are +-lr and sign-sensitive to
    # reduction-order noise at near-zero grads (same caveat as
    # test_sharding.py) — the meaningful check is that a SECOND step
    # through the updated params still agrees on the loss
    images2 = jnp.asarray(rng.random((8, 128, 128, 1), np.float32))
    s_c, loss_c2 = step_c(s_c, images2)
    s_o2 = AETrainState(params_o, bs_mean, opt_o, s_o.step + 1)
    chunks2 = images2.reshape(n, 2, 128, 128, 1)

    def chunk_loss2(params, imgs):
        out, mut = model.apply({"params": params,
                                "batch_stats": s_o2.batch_stats},
                               imgs, train=True, mutable=["batch_stats"])
        return jnp.mean((out - imgs) ** 2), mut["batch_stats"]

    loss_o2 = sum(float(jax.value_and_grad(chunk_loss2, has_aux=True)(
        s_o2.params, chunks2[i])[0][0]) for i in range(n)) / n
    np.testing.assert_allclose(float(loss_c2), loss_o2, rtol=5e-4, atol=5e-5)

    # chunks=1 and a non-dividing chunk count == the direct step
    step_d = make_ae_train_step(model, tx, chunks=1)
    s_d = create_ae_state(model, cfg, jax.random.PRNGKey(0))
    s_d, loss_d = step_d(s_d, images)
    for k in (1, 3):
        step_k = make_ae_train_step(model, tx, chunks=k)
        s_k = create_ae_state(model, cfg, jax.random.PRNGKey(0))
        s_k, loss_k = step_k(s_k, images)
        np.testing.assert_allclose(float(loss_k), float(loss_d),
                                   rtol=1e-6, atol=1e-7)
