"""Pipeline parallelism (parallel/pipeline.py): the GPipe-scheduled text
tower must compute exactly what the plain TextBert forward computes — same
outputs, same parameter gradients — and the full MI train step under a
'pipe' mesh must match the unsharded step.  No reference counterpart
(single-device, SURVEY.md §2); this is the build's own mesh capability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig, TextBert
from mimm_tpu.parallel import mesh as mesh_lib
from mimm_tpu.parallel.pipeline import (pipeline_stage_count,
                                        pipelined_textbert_apply)
from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                               make_mi_train_step, make_optimizers)

BERT4 = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=4,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=32, num_classes=1)


def _text_inputs(B=8, L=16, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)).astype(np.int32))
    masks = jnp.asarray((rng.random((B, L)) < 0.9).astype(np.int32))
    masks = masks.at[:, 0].set(1)  # [CLS] always attended
    segs = jnp.zeros((B, L), jnp.int32)
    return ids, masks, segs


def _init_text_params(cfg=BERT4, B=2, L=16):
    model = TextBert(cfg, dtype=jnp.float32)
    ids = jnp.zeros((B, L), jnp.int32)
    return model, model.init(jax.random.PRNGKey(0), ids)["params"]


@pytest.mark.parametrize("mesh_shape,microbatches", [
    ({"pipe": 4}, 4),
    ({"data": 2, "pipe": 2}, 4),
    ({"data": 2, "pipe": 4}, 2),
])
def test_pp_textbert_forward_matches_plain(mesh_shape, microbatches):
    model, params = _init_text_params()
    ids, masks, segs = _text_inputs()
    pooled_ref, logits_ref = model.apply({"params": params}, ids,
                                         token_type_ids=segs,
                                         attention_mask=masks,
                                         deterministic=True)
    mesh = mesh_lib.make_mesh(mesh_shape)
    assert pipeline_stage_count(mesh) == mesh_shape["pipe"]

    @jax.jit
    def pp(params, ids, segs, masks):
        return pipelined_textbert_apply(
            BERT4, params, mesh, ids, segs, masks,
            num_microbatches=microbatches, deterministic=True)

    pooled_pp, logits_pp = pp(params, ids, segs, masks)
    np.testing.assert_allclose(np.asarray(pooled_pp), np.asarray(pooled_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_pp), np.asarray(logits_ref),
                               rtol=1e-5, atol=1e-6)


def test_pp_grads_match_plain():
    """Parameter gradients through the pipeline (autodiff transposes the
    ppermute chain into the reverse schedule) must equal the plain ones."""
    model, params = _init_text_params()
    ids, masks, segs = _text_inputs()
    mesh = mesh_lib.make_mesh({"data": 2, "pipe": 4})

    def loss_plain(p):
        pooled, logits = model.apply({"params": p}, ids, token_type_ids=segs,
                                     attention_mask=masks, deterministic=True)
        return jnp.sum(pooled ** 2) + jnp.sum(logits ** 2)

    def loss_pp(p):
        pooled, logits = pipelined_textbert_apply(
            BERT4, p, mesh, ids, segs, masks, num_microbatches=4,
            deterministic=True)
        return jnp.sum(pooled ** 2) + jnp.sum(logits ** 2)

    g_plain = jax.jit(jax.grad(loss_plain))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_plain = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_plain) == len(flat_pp)
    for (path, a), b in zip(flat_plain, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_full_mi_step_matches_unsharded():
    """One full MI train step with the text tower pipelined over
    {'data': 4, 'pipe': 2} equals the unsharded step (dropout off — the
    pp schedule folds dropout keys per (layer, microbatch), so exact
    equality is only defined deterministically)."""
    import dataclasses
    bert = dataclasses.replace(BERT4, num_hidden_layers=2,
                               hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(cfg, bert)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    ids, masks, segs = _text_inputs(8, 16)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(1).random((8, 128, 128, 1), np.float32)),
        "txt_ids": ids, "txt_masks": masks, "txt_segments": segs,
        "study_id": jnp.asarray(np.arange(8, dtype=np.int64)),
    }

    mesh1 = mesh_lib.make_mesh({"data": 1})
    step1 = make_mi_train_step(model, txs, cfg)
    s1 = mesh_lib.replicate(
        mesh1, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss1 = step1(s1, b1)

    mesh_pp = mesh_lib.make_mesh({"data": 4, "pipe": 2})
    step_pp = make_mi_train_step(model, txs, cfg, mesh=mesh_pp)
    s2 = mesh_lib.shard_mi_state(
        mesh_pp, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b2 = mesh_lib.shard_batch(mesh_pp, batch)
    s2, loss2 = step_pp(s2, b2)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5, atol=1e-6)
    # a second step through the updated params must still agree
    _, loss1b = step1(s1, b1)
    _, loss2b = step_pp(s2, b2)
    np.testing.assert_allclose(float(loss2b), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def _tiny_mi_setup(seed=0):
    import dataclasses
    bert = dataclasses.replace(BERT4, num_hidden_layers=2,
                               hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=seed)
    model = build_joint_model(cfg, bert)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    ids, masks, segs = _text_inputs(8, 16)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(1).random((8, 128, 128, 1), np.float32)),
        "txt_ids": ids, "txt_masks": masks, "txt_segments": segs,
        "study_id": jnp.asarray(np.arange(8, dtype=np.int64)),
    }
    return bert, cfg, model, txs, batch


def test_resident_stack_roundtrip():
    """stack_resident_text_state -> unstack_resident_text_state is the
    identity on the params AND the text optimizer moment trees."""
    from mimm_tpu.parallel.pipeline import (is_stacked_text,
                                            stack_resident_text_state,
                                            unstack_resident_text_state)
    _, cfg, model, txs, _ = _tiny_mi_setup()
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    stacked = stack_resident_text_state(state, 2)
    assert is_stacked_text(stacked.params["text_model"])
    assert "layer0" not in stacked.params["text_model"]["bert"]
    # moments restacked with identical structure to the params
    mu = stacked.txt_opt.inner_states["train"].inner_state[0].mu \
        if hasattr(stacked.txt_opt, "inner_states") else stacked.txt_opt.mu
    assert is_stacked_text(mu)
    back = unstack_resident_text_state(stacked, 2)
    flat_a = jax.tree_util.tree_leaves_with_path(state._asdict())
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back._asdict())}
    assert len(flat_a) == len(flat_b)
    for path, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_b[jax.tree_util.keystr(path)]),
                                      err_msg=jax.tree_util.keystr(path))


def test_pp_resident_state_matches_unsharded():
    """The pp RESIDENT layout (text params + AdamW moments stacked and
    'pipe'-sharded at rest — what the Manager runs) computes the same
    losses as the plain unsharded step, rests 1/S per chip, and keeps its
    layout stable through the donated step loop."""
    from jax.sharding import PartitionSpec as P
    from mimm_tpu.parallel.pipeline import (PIPE_AXIS, is_stacked_text,
                                            stack_resident_text_state)
    bert, cfg, model, txs, batch = _tiny_mi_setup()

    mesh1 = mesh_lib.make_mesh({"data": 1})
    step1 = make_mi_train_step(model, txs, cfg)
    s1 = mesh_lib.replicate(
        mesh1, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss1 = step1(s1, b1)

    mesh_pp = mesh_lib.make_mesh({"data": 4, "pipe": 2})
    step_pp = make_mi_train_step(model, txs, cfg, mesh=mesh_pp)
    s2 = mesh_lib.shard_mi_state(
        mesh_pp, stack_resident_text_state(
            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)), 2))
    # at rest: stacked text params shard their layer axis 1/S per chip
    qk = s2.params["text_model"]["bert"]["layers"]["attention"]["query"]["kernel"]
    assert qk.shape[0] == 2
    assert qk.addressable_shards[0].data.shape[0] == 1
    b2 = mesh_lib.shard_batch(mesh_pp, batch)
    s2, loss2 = step_pp(s2, b2)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5, atol=1e-6)

    # layout stability through the donated loop: params AND moments still
    # stacked + pipe-sharded after the step
    assert is_stacked_text(s2.params["text_model"])
    qk = s2.params["text_model"]["bert"]["layers"]["attention"]["query"]["kernel"]
    assert qk.addressable_shards[0].data.shape[0] == 1
    spec = qk.sharding.spec
    assert spec[0] == PIPE_AXIS, spec
    mu = s2.txt_opt.inner_states["train"].inner_state[0].mu \
        if hasattr(s2.txt_opt, "inner_states") else s2.txt_opt.mu
    mu_qk = mu["bert"]["layers"]["attention"]["query"]["kernel"]
    assert mu_qk.addressable_shards[0].data.shape[0] == 1

    # second step through the updated (resident) state still agrees
    _, loss1b = step1(s1, b1)
    _, loss2b = step_pp(s2, b2)
    np.testing.assert_allclose(float(loss2b), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def test_pp_resident_checkpoint_stays_unstacked(tmp_path):
    """save_mi_checkpoints from a resident-stacked state writes the PLAIN
    text layout (layer0..layerN-1) — on-disk trees are layout-independent
    and a non-pp run can resume from a pp run's checkpoint."""
    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.parallel.pipeline import stack_resident_text_state
    from mimm_tpu.train.mi import save_mi_checkpoints
    bert, cfg, model, txs, _ = _tiny_mi_setup()
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    mesh_pp = mesh_lib.make_mesh({"data": 4, "pipe": 2})
    s = mesh_lib.shard_mi_state(mesh_pp, stack_resident_text_state(state, 2))
    path = save_mi_checkpoints(str(tmp_path), s, 1, bert,
                               export_torch_bins=False)
    restored = ckpt.load_checkpoint(path)
    b = restored["params"]["text_model"]["bert"]
    assert "layers" not in b and "layer0" in b and "layer1" in b
    # and the values round-trip exactly vs the original unstacked state
    np.testing.assert_array_equal(
        np.asarray(b["layer1"]["attention"]["query"]["kernel"]),
        np.asarray(
            state.params["text_model"]["bert"]["layer1"]["attention"]["query"]["kernel"]))


def test_pp_resident_with_frozen_text_encoder():
    """freeze_text_encoder wraps the text optimizer in optax
    multi_transform, whose masked moment trees carry empty MaskedNode
    leaves — the resident stack/unstack and 'pipe' placement must pass
    them through (and frozen params must still receive zero updates)."""
    from mimm_tpu.parallel.pipeline import (is_stacked_text,
                                            stack_resident_text_state)
    bert, cfg, model, txs_plain, batch = _tiny_mi_setup()
    cfg = cfg.replace(freeze_text_encoder=True)
    txs = make_optimizers(cfg, steps_per_epoch=2)

    mesh_pp = mesh_lib.make_mesh({"data": 4, "pipe": 2})
    state0 = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    # snapshot BEFORE the step: donation deletes buffers the sharded
    # state aliases with state0
    trunk_before = np.asarray(
        state0.params["text_model"]["bert"]["layer0"]["attention"]["query"]["kernel"])
    img_before = np.asarray(state0.params["image_model"]["conv1"]["kernel"])
    s = mesh_lib.shard_mi_state(
        mesh_pp, stack_resident_text_state(state0, 2))
    assert is_stacked_text(s.params["text_model"])
    step = make_mi_train_step(model, txs, cfg, mesh=mesh_pp)
    b = mesh_lib.shard_batch(mesh_pp, batch)
    s, loss = step(s, b)
    assert np.isfinite(float(loss))
    # frozen trunk: stacked layer params unchanged after the step
    after = s.params["text_model"]["bert"]["layers"]["attention"]["query"][
        "kernel"]
    np.testing.assert_array_equal(np.asarray(after)[0], trunk_before)
    # the unfrozen image tower did train (the text classifier head gets
    # no gradient from the MI loss, so it is not a freeze signal)
    assert not np.array_equal(
        np.asarray(s.params["image_model"]["conv1"]["kernel"]), img_before)


def test_pp_validates_divisibility():
    model, params = _init_text_params()
    ids, masks, segs = _text_inputs()
    mesh = mesh_lib.make_mesh({"pipe": 8})  # 4 layers % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_textbert_apply(BERT4, params, mesh, ids, segs, masks,
                                 deterministic=True)
    mesh4 = mesh_lib.make_mesh({"pipe": 4})
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_textbert_apply(BERT4, params, mesh4, ids, segs, masks,
                                 num_microbatches=3, deterministic=True)
