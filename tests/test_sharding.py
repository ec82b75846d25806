"""Data-parallel semantics: the jitted MI train step with the batch sharded
over a 'data' mesh must produce the same loss and parameter updates as the
unsharded step — i.e., global-batch negatives come out of pjit for free
(SURVEY.md §5 distributed design)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.parallel import mesh as mesh_lib
from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                               make_mi_train_step, make_optimizers)

TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_classes=1)


def _make_batch(B, img_size, seq):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.random((B, img_size, img_size, 1), np.float32)),
        "txt_ids": jnp.asarray(rng.integers(0, 64, (B, seq)).astype(np.int32)),
        "txt_masks": jnp.ones((B, seq), jnp.int32),
        "txt_segments": jnp.zeros((B, seq), jnp.int32),
        "study_id": jnp.asarray(np.arange(B, dtype=np.int64)),
    }


@pytest.mark.parametrize("img_size", [128])
def test_dp_sharded_step_matches_unsharded(img_size):
    """The (B,B) score matrix under jit spans the GLOBAL batch: sharding the
    batch over 4 devices must not change the loss (negatives included)."""
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=img_size, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    step = make_mi_train_step(model, txs, cfg)
    batch = _make_batch(8, img_size, 16)

    # NOTE: the train step donates its state, and device_put to an
    # equivalent sharding ALIASES buffers — so build a fresh (identical,
    # same-PRNG) state per run instead of reusing one.
    mesh1 = mesh_lib.make_mesh({"data": 1})
    s1 = mesh_lib.replicate(mesh1,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss1 = step(s1, b1)

    mesh4 = mesh_lib.make_mesh({"data": 4})
    s4 = mesh_lib.replicate(mesh4,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b4 = mesh_lib.shard_batch(mesh4, batch)
    s4, loss4 = step(s4, b4)

    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-5, atol=1e-6)
    # raw first-step Adam updates are +-lr and sign-sensitive to reduction-
    # order noise at near-zero grads; the meaningful check is that a SECOND
    # step (through the updated params) still agrees.
    _, loss1b = step(s1, b1)
    _, loss4b = step(s4, b4)
    np.testing.assert_allclose(float(loss4b), float(loss1b), rtol=5e-4, atol=5e-5)


def test_local_negatives_block_mode():
    """cfg.global_negatives=False with data_shards=n draws negatives only
    within each contiguous per-shard block (the reference's single-device
    pairing semantics at per-shard batch size): the step loss equals the
    mean of per-block DV bounds over the same forward embeddings."""
    from mimm_tpu.objectives import critics as critics_lib
    from mimm_tpu.objectives.pairing import pairwise_critic_scores
    from mimm_tpu.train.mi import create_mi_state

    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0,
        global_negatives=False)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    batch = _make_batch(8, 128, 16)

    # host copies BEFORE the donated step consumes the state
    params0 = jax.tree.map(np.asarray, jax.device_get(state.params))
    critic0 = jax.tree.map(np.asarray, jax.device_get(state.critic_params))
    bs0 = jax.tree.map(np.asarray, jax.device_get(state.batch_stats))

    mesh4 = mesh_lib.make_mesh({"data": 4})
    s4 = mesh_lib.replicate(mesh4, state)
    b4 = mesh_lib.shard_batch(mesh4, batch)
    step_local = make_mi_train_step(model, txs, cfg, data_shards=4)
    _, loss_local = step_local(s4, b4)

    # expected: same forward (same fold_in(seed, step=0) dropout stream —
    # typed key with the step's cfg.rng_impl), then DV per contiguous
    # block of 2, averaged
    rng = jax.random.fold_in(jax.random.key(cfg.seed, impl=cfg.rng_impl), 0)
    outputs, _ = model.apply(
        {"params": params0, "batch_stats": bs0},
        batch["image"], batch["txt_ids"], batch["txt_masks"],
        batch["txt_segments"], train=True, rngs={"dropout": rng},
        mutable=["batch_stats"])
    ei, et = outputs[0], outputs[1]
    block_losses = []
    for i in range(4):
        sl = slice(2 * i, 2 * (i + 1))
        sc = pairwise_critic_scores(critic0, ei[sl], et[sl])
        block_losses.append(float(critics_lib.dv_bound_from_scores(
            sc, batch["study_id"][sl])))
    np.testing.assert_allclose(float(loss_local), np.mean(block_losses),
                               rtol=1e-5, atol=1e-6)


def test_grad_allreduce_bf16_matches_f32_step():
    """cfg.grad_allreduce_dtype='bfloat16': the explicit shard_map gradient
    path (bf16 psum of tower grads, sync-BN batch statistics) must track
    the plain GSPMD f32 step — equal loss at step 1 (identical forward;
    the cast only touches gradients) and a tight band at step 2 (params
    now differ by bf16 rounding of the gradient sum only)."""
    bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, num_classes=1,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(base, bert)
    txs = make_optimizers(base, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)
    mesh4 = mesh_lib.make_mesh({"data": 4})

    s_ref = mesh_lib.replicate(
        mesh4, create_mi_state(model, base, txs, jax.random.PRNGKey(0)))
    b4 = mesh_lib.shard_batch(mesh4, batch)
    step_ref = make_mi_train_step(model, txs, base, mesh=mesh4)
    s_ref, loss_ref1 = step_ref(s_ref, b4)
    s_ref, loss_ref2 = step_ref(s_ref, b4)

    gad = base.replace(grad_allreduce_dtype="bfloat16")
    s_gad = mesh_lib.replicate(
        mesh4, create_mi_state(model, gad, txs, jax.random.PRNGKey(0)))
    step_gad = make_mi_train_step(model, txs, gad, mesh=mesh4)
    s_gad, loss_gad1 = step_gad(s_gad, b4)
    s_gad, loss_gad2 = step_gad(s_gad, b4)

    np.testing.assert_allclose(float(loss_gad1), float(loss_ref1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_gad2), float(loss_ref2),
                               rtol=2e-3, atol=1e-4)
    # BN running stats must be the GLOBAL-batch statistics on both paths
    bs_ref = jax.device_get(s_ref.batch_stats)
    bs_gad = jax.device_get(s_gad.batch_stats)
    m_ref = np.asarray(bs_ref["image_model"]["bn1"]["mean"])
    m_gad = np.asarray(bs_gad["image_model"]["bn1"]["mean"])
    np.testing.assert_allclose(m_gad, m_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("zero1,fsdp", [(True, False), (False, True),
                                        (True, True)])
def test_grad_allreduce_bf16_composes_with_zero1_fsdp(zero1, fsdp):
    """cfg.grad_allreduce_dtype='bfloat16' + zero1 and/or fsdp (round-4
    VERDICT item 8): the shard_map path all-gathers any fsdp-sharded
    params on entry, bf16-psums the grads, and finish_step re-pins
    params/moments — so the step must track the f32 GSPMD step inside the
    same rounding band as the pure-DP lane, and the at-rest shardings must
    survive the donated step (no layout drift).  Parametrized over all
    newly-allowed knob combinations because zero1-only and fsdp-only take
    different pin paths in finish_step (pin_zero1 vs pin_replicated)."""
    bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, num_classes=1,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0,
        zero1_optimizer_sharding=zero1, fsdp_parameter_sharding=fsdp)
    model = build_joint_model(base, bert)
    txs = make_optimizers(base, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)
    mesh4 = mesh_lib.make_mesh({"data": 4})
    b4 = mesh_lib.shard_batch(mesh4, batch)

    def sharded_state():
        return mesh_lib.shard_mi_state(
            mesh4, create_mi_state(model, base, txs, jax.random.PRNGKey(0)),
            zero1=zero1, fsdp=fsdp)

    s_ref = sharded_state()
    step_ref = make_mi_train_step(model, txs, base, mesh=mesh4)
    s_ref, loss_ref1 = step_ref(s_ref, b4)
    s_ref, loss_ref2 = step_ref(s_ref, b4)

    gad = base.replace(grad_allreduce_dtype="bfloat16")
    s_gad = sharded_state()
    step_gad = make_mi_train_step(model, txs, gad, mesh=mesh4)
    s_gad, loss_gad1 = step_gad(s_gad, b4)
    s_gad, loss_gad2 = step_gad(s_gad, b4)

    np.testing.assert_allclose(float(loss_gad1), float(loss_ref1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_gad2), float(loss_ref2),
                               rtol=2e-3, atol=1e-4)
    if fsdp:
        # at-rest layouts survived: image params still 'data'-sharded
        conv_w = s_gad.params["image_model"]["conv1"]["kernel"]
        assert "data" in str(conv_w.sharding.spec), conv_w.sharding
    if zero1:
        # image moments still 'data'-sharded
        mu = jax.tree.leaves(s_gad.img_opt)
        assert any("data" in str(x.sharding.spec) for x in mu
                   if hasattr(x, "sharding") and x.ndim > 0), \
            [getattr(x, "sharding", None) for x in mu]


def test_grad_allreduce_bf16_unsupported_combo_falls_back():
    """With a tensor-parallel mesh the knob must warn and keep the plain
    GSPMD step (identical losses to grad_allreduce_dtype='float32')."""
    bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, num_classes=1,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(base, bert)
    txs = make_optimizers(base, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)
    mesh = mesh_lib.make_mesh({"data": 2, "model": 2})

    losses = {}
    for name, cfg in (("f32", base),
                      ("bf16", base.replace(grad_allreduce_dtype="bfloat16"))):
        st = mesh_lib.shard_mi_state(
            mesh, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
        b = mesh_lib.shard_batch(mesh, batch)
        step = make_mi_train_step(model, txs, cfg, mesh=mesh)
        st, l1 = step(st, b)
        _, l2 = step(st, b)
        losses[name] = (float(l1), float(l2))
    np.testing.assert_allclose(losses["bf16"], losses["f32"],
                               rtol=1e-6, atol=1e-7)


def test_shard_map_all_gather_negatives_production_shapes():
    """The EXPLICIT collective path (objectives/pairing.py
    mi_loss_from_embeddings with axis_name): under shard_map over the full
    8-device 'data' mesh, each shard all-gathers embeddings/study-ids so
    negatives span the global batch — loss and critic grads must equal the
    single-device computation on the gathered arrays.  Run at production
    widths (768-d embeddings, 1024/512 critic) with a global batch of 128."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from mimm_tpu.models.mlp import make_mlp
    from mimm_tpu.objectives.pairing import mi_loss_from_embeddings

    mesh = mesh_lib.make_mesh({"data": 8})
    B_global, D = 128, 768
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    critic = make_mlp(k1, 2 * D, [1024, 512])
    ei = jax.random.normal(k2, (B_global, D), jnp.float32)
    et = jax.random.normal(k3, (B_global, D), jnp.float32)
    # include duplicate study ids ACROSS shards: the mask must exclude the
    # (i, j) negative where sid_i == sid_j even when i, j live on
    # different devices
    sids = jnp.asarray(np.arange(B_global, dtype=np.int64) % 100)

    def loss_fn(c, a, b, s):
        return mi_loss_from_embeddings(c, a, b, s, estimator="dv",
                                       axis_name="data")

    sharded = jax.jit(
        jax.shard_map(
            partial(jax.value_and_grad(loss_fn), critic),
            mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P(), P()), check_vma=False),
    )
    loss_sh, grads_sh = sharded(ei, et, sids)

    want_loss, want_grads = jax.value_and_grad(
        lambda c: mi_loss_from_embeddings(c, ei, et, sids, estimator="dv"))(critic)

    np.testing.assert_allclose(float(loss_sh), float(want_loss),
                               rtol=1e-5, atol=1e-6)
    for got_l, want_l in zip(grads_sh, want_grads):
        for k in ("w", "b"):
            np.testing.assert_allclose(np.asarray(got_l[k]),
                                       np.asarray(want_l[k]),
                                       rtol=5e-4, atol=1e-5)


def test_bert_tp_full_step_matches_replicated():
    """Tensor-parallel text tower (query/key/value/intermediate column-,
    attention_output/output row-parallel over 'model') + TP critic on a
    data x model mesh: the full MI train step must produce the same loss
    as the fully replicated step — GSPMD inserts the reduce at each
    row-parallel boundary, no semantic change."""
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    step = make_mi_train_step(model, txs, cfg)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    s1 = mesh_lib.replicate(mesh1,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    s1, loss1 = step(s1, mesh_lib.shard_batch(mesh1, batch))

    mesh_tp = mesh_lib.make_mesh({"data": 2, "model": 2})
    s_tp = mesh_lib.shard_mi_state(
        mesh_tp, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    # the text tower is genuinely sharded (not replicated) over 'model'
    qk = s_tp.params["text_model"]["bert"]["layer0"]["attention"]["query"]["kernel"]
    assert not qk.sharding.is_fully_replicated
    s_tp, loss_tp = step(s_tp, mesh_lib.shard_batch(mesh_tp, batch))

    np.testing.assert_allclose(float(loss_tp), float(loss1), rtol=1e-5, atol=1e-6)
    _, loss1b = step(s1, mesh_lib.shard_batch(mesh1, batch))
    _, loss_tpb = step(s_tp, mesh_lib.shard_batch(mesh_tp, batch))
    np.testing.assert_allclose(float(loss_tpb), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def test_bert_tp_sp_full_step_matches_replicated():
    """Sequence parallelism on top of TP (cfg.sequence_parallel: the text
    tower's LN/dropout-region activations seq-sharded over 'model',
    models/bert.py _sp): the full MI train step must produce the same loss
    as the fully replicated step — the SP constraints change only where
    GSPMD places collectives, never the math.  threefry RNG: partitionable
    key derivation makes the dropout masks identical no matter how the
    activation they cover is sharded."""
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0,
        sequence_parallel=True, rng_impl="threefry2x32")
    txs = make_optimizers(cfg, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    model1 = build_joint_model(cfg, TINY_BERT)  # no mesh -> no SP constraint
    step1 = make_mi_train_step(model1, txs, cfg)
    s1 = mesh_lib.replicate(mesh1,
                            create_mi_state(model1, cfg, txs, jax.random.PRNGKey(0)))
    s1, loss1 = step1(s1, mesh_lib.shard_batch(mesh1, batch))

    mesh_sp = mesh_lib.make_mesh({"data": 2, "model": 2})
    model_sp = build_joint_model(cfg, TINY_BERT, mesh=mesh_sp)
    assert model_sp.sp_sharding is not None  # SP is actually active
    step_sp = make_mi_train_step(model_sp, txs, cfg)
    s_sp = mesh_lib.shard_mi_state(
        mesh_sp, create_mi_state(model_sp, cfg, txs, jax.random.PRNGKey(0)))
    s_sp, loss_sp = step_sp(s_sp, mesh_lib.shard_batch(mesh_sp, batch))

    np.testing.assert_allclose(float(loss_sp), float(loss1), rtol=1e-5, atol=1e-6)
    _, loss1b = step1(s1, mesh_lib.shard_batch(mesh1, batch))
    _, loss_spb = step_sp(s_sp, mesh_lib.shard_batch(mesh_sp, batch))
    np.testing.assert_allclose(float(loss_spb), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def test_bert_tp_multi_step_scan_matches_single_steps():
    """Production combines scan dispatch (make_mi_multi_step) with the
    sharded state; with a TP text tower the lax.scan carry must preserve
    the 'model' shardings across chained steps.  K=2 scanned steps on the
    TP state must equal 2 sequential single steps on the replicated
    state."""
    from mimm_tpu.train.mi import make_mi_multi_step

    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    step = make_mi_train_step(model, txs, cfg)
    s1 = mesh_lib.replicate(mesh1,
                            create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss_a = step(s1, b1)
    _, loss_b = step(s1, b1)

    mesh_tp = mesh_lib.make_mesh({"data": 2, "model": 2})
    s_tp = mesh_lib.shard_mi_state(
        mesh_tp, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    multi = make_mi_multi_step(model, txs, cfg)
    stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
    stacked = jax.device_put(stacked, mesh_lib.stacked_batch_sharding(mesh_tp))
    s_tp, losses = multi(s_tp, stacked)
    np.testing.assert_allclose(np.asarray(losses),
                               [float(loss_a), float(loss_b)],
                               rtol=5e-4, atol=5e-5)


def test_shard_batch_rejects_indivisible_batch():
    """A batch not divisible by the 'data' axis must fail loudly at
    device_put time (the Manager never produces one: drop_last is on and
    each bucket drops its own remainder), not silently mis-shard."""
    mesh = mesh_lib.make_mesh({"data": 8})
    batch = _make_batch(12, 32, 16)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="divisible|not divisible|shard"):
        mesh_lib.shard_batch(mesh, batch)


def test_create_mi_state_derives_critic_width_from_model():
    """No hidden 256px assumption: at img_size=128 the ResNet embedding is
    192-d and the critic input adapts."""
    cfg = TrainingConfig().replace(img_size=128, max_seq_length=16,
                                   compute_dtype="float32",
                                   use_pallas_critic=False,
                                   flash_attention=False)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=1)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    assert state.critic_params[0]["w"].shape[0] == 192 + 32


def test_critic_tensor_parallel_matches_replicated():
    """Critic sharded column/row-parallel over 'model' must give the same
    pairwise scores as fully replicated params."""
    from jax.sharding import NamedSharding
    from mimm_tpu.models.mlp import make_mlp
    from mimm_tpu.objectives.pairing import pairwise_critic_scores

    mesh = mesh_lib.make_mesh({"data": 2, "model": 2})
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = make_mlp(k1, 64, [32, 16])
    ei = jax.random.normal(k2, (8, 32))
    et = jax.random.normal(k3, (8, 32))

    want = pairwise_critic_scores(params, ei, et)

    specs = mesh_lib.critic_tp_shardings(mesh, params)
    sharded = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: hasattr(x, "_normalized_spec") or
                             type(x).__name__ == "PartitionSpec"))
    got = jax.jit(pairwise_critic_scores)(sharded, ei, et)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_zero1_optimizer_sharding_matches_replicated():
    """cfg.zero1_optimizer_sharding: moments live 'data'-sharded (each
    chip stores 1/dp of the Adam/AdamW state) with bit-identical training
    semantics — losses match the unsharded step across two steps, and the
    moment leaves really are sharded after the step."""
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    cfg_z = cfg.replace(zero1_optimizer_sharding=True)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    step1 = make_mi_train_step(model, txs, cfg)
    s1 = mesh_lib.replicate(
        mesh1, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss1 = step1(s1, b1)

    mesh4 = mesh_lib.make_mesh({"data": 4})
    step_z = make_mi_train_step(model, txs, cfg_z, mesh=mesh4)
    s_z = mesh_lib.shard_mi_state(
        mesh4, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)),
        zero1=True)
    b_z = mesh_lib.shard_batch(mesh4, batch)
    s_z, loss_z = step_z(s_z, b_z)
    np.testing.assert_allclose(float(loss_z), float(loss1),
                               rtol=1e-5, atol=1e-6)

    # the memory claim is real: a large moment leaf holds 1/4 per device
    big = [x for x in jax.tree.leaves(s_z.txt_opt)
           if hasattr(x, "shape") and x.ndim >= 1
           and x.shape and x.shape[0] % 4 == 0 and x.size >= 64]
    assert big, "no shardable moment leaves found"
    leaf = max(big, key=lambda x: x.size)
    shard_elems = int(np.prod(leaf.addressable_shards[0].data.shape))
    assert shard_elems == leaf.size // 4, \
        f"moment leaf not data-sharded: {leaf.sharding}"

    _, loss1b = step1(s1, b1)
    _, loss_zb = step_z(s_z, b_z)
    np.testing.assert_allclose(float(loss_zb), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def test_fsdp_parameter_sharding_matches_replicated():
    """cfg.fsdp_parameter_sharding (+zero1): params AND moments rest
    'data'-sharded (the full ZeRO ladder); training semantics unchanged
    vs the unsharded step, and the at-rest param leaves really hold 1/4
    per device."""
    cfg = TrainingConfig().replace(
        batch_size=8, img_size=128, max_seq_length=16,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    cfg_f = cfg.replace(zero1_optimizer_sharding=True,
                        fsdp_parameter_sharding=True)
    model = build_joint_model(cfg, TINY_BERT)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    batch = _make_batch(8, 128, 16)

    mesh1 = mesh_lib.make_mesh({"data": 1})
    step1 = make_mi_train_step(model, txs, cfg)
    s1 = mesh_lib.replicate(
        mesh1, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    b1 = mesh_lib.shard_batch(mesh1, batch)
    s1, loss1 = step1(s1, b1)

    mesh4 = mesh_lib.make_mesh({"data": 4})
    step_f = make_mi_train_step(model, txs, cfg_f, mesh=mesh4)
    s_f = mesh_lib.shard_mi_state(
        mesh4, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)),
        zero1=True, fsdp=True)
    b_f = mesh_lib.shard_batch(mesh4, batch)
    s_f, loss_f = step_f(s_f, b_f)
    np.testing.assert_allclose(float(loss_f), float(loss1),
                               rtol=1e-5, atol=1e-6)

    # at-rest params are really sharded after the step
    big = [x for x in jax.tree.leaves(s_f.params["text_model"])
           if hasattr(x, "shape") and x.ndim >= 1
           and x.shape and x.shape[0] % 4 == 0 and x.size >= 64]
    assert big, "no shardable param leaves found"
    leaf = max(big, key=lambda x: x.size)
    shard_elems = int(np.prod(leaf.addressable_shards[0].data.shape))
    assert shard_elems == leaf.size // 4, \
        f"param leaf not data-sharded at rest: {leaf.sharding}"

    _, loss1b = step1(s1, b1)
    _, loss_fb = step_f(s_f, b_f)
    np.testing.assert_allclose(float(loss_fb), float(loss1b),
                               rtol=5e-4, atol=5e-5)


def test_hybrid_dcn_mesh_validation_and_fallback():
    """Multi-slice mesh support (make_mesh dcn_mesh_shape): strict input
    validation, and on platforms without slice structure (this CPU mesh)
    a graceful fallback to a plain mesh of the TOTAL shape."""
    with pytest.raises(ValueError, match="requires an explicit mesh_shape"):
        mesh_lib.make_mesh(None, dcn_mesh_shape={"data": 2})
    with pytest.raises(ValueError, match="not in mesh_shape"):
        mesh_lib.make_mesh({"data": 4}, dcn_mesh_shape={"bogus": 2})
    with pytest.raises(ValueError, match="needs 32 devices"):
        mesh_lib.make_mesh({"data": 16}, dcn_mesh_shape={"data": 2})
    # 4 ICI x 2 DCN on 8 virtual CPU devices: no slice_index attributes,
    # so the hybrid construction falls back to a plain data=8 mesh
    mesh = mesh_lib.make_mesh({"data": 4, "model": 1},
                              dcn_mesh_shape={"data": 2})
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 8, "model": 1}


def test_hybrid_dcn_mesh_uses_mesh_utils(monkeypatch):
    """When the platform HAS slice structure, make_mesh must delegate to
    mesh_utils.create_hybrid_device_mesh with the per-axis (ICI, DCN)
    factorization so the DCN hop lands on the outermost stride."""
    from jax.experimental import mesh_utils
    calls = {}

    def fake_hybrid(mesh_shape, dcn_mesh_shape, devices=None, **kw):
        calls["ici"] = tuple(mesh_shape)
        calls["dcn"] = tuple(dcn_mesh_shape)
        return np.asarray(devices).reshape(
            tuple(i * d for i, d in zip(mesh_shape, dcn_mesh_shape)))

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)
    mesh = mesh_lib.make_mesh({"data": 2, "model": 2},
                              dcn_mesh_shape={"data": 2})
    assert calls == {"ici": (2, 2), "dcn": (2, 1)}
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 4, "model": 2}


def test_dcn_mesh_shape_cli_flag():
    from mimm_tpu.config import construct_training_parameters
    cfg = construct_training_parameters(
        ["--mesh_shape", "data=8", "--dcn_mesh_shape", "data=2"])
    assert cfg.mesh_shape == (("data", 8),)
    assert cfg.dcn_mesh_shape == (("data", 2),)


def test_ae_zero1_fsdp_matches_replicated():
    """The AE trainer honors the same ZeRO ladder as the MI trainer:
    zero1+fsdp placement changes memory layout, not math."""
    from mimm_tpu.train.ae import (build_ae_model, create_ae_state,
                                   make_ae_train_step)
    from mimm_tpu.train.optim import adam_torch

    cfg = TrainingConfig().replace(img_size=64, compute_dtype="float32",
                                   init_lr=1e-3, output_channels=1)
    model = build_ae_model(cfg)
    tx = adam_torch(cfg.init_lr)
    images = jnp.asarray(np.random.default_rng(0).random(
        (8, 64, 64, 1), np.float32))

    mesh1 = mesh_lib.make_mesh({"data": 1})
    s1 = mesh_lib.shard_ae_state(
        mesh1, create_ae_state(model, cfg, jax.random.PRNGKey(0)))
    step1 = make_ae_train_step(model, tx)
    s1, loss1 = step1(s1, images)

    mesh4 = mesh_lib.make_mesh({"data": 4})
    s4 = mesh_lib.shard_ae_state(
        mesh4, create_ae_state(model, cfg, jax.random.PRNGKey(0)),
        zero1=True, fsdp=True)
    step4 = make_ae_train_step(model, tx, mesh=mesh4, zero1=True, fsdp=True)
    b4 = jax.device_put(images, mesh_lib.batch_sharding(mesh4))
    s4, loss4 = step4(s4, b4)
    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-5, atol=1e-7)

    # at-rest: a big moment leaf and a big param leaf really shard 1/4
    def biggest_shardable(tree):
        leaves = [x for x in jax.tree.leaves(tree)
                  if hasattr(x, "shape") and x.ndim >= 1
                  and x.shape and x.shape[0] % 4 == 0 and x.size >= 64]
        assert leaves, "no shardable leaves"
        return max(leaves, key=lambda x: x.size)

    for tree in (s4.opt_state, s4.params):
        leaf = biggest_shardable(tree)
        got = int(np.prod(leaf.addressable_shards[0].data.shape))
        assert got == leaf.size // 4, f"not sharded at rest: {leaf.sharding}"

    # layouts are stable across steps (donated loop, no recompile drift):
    # second step still matches the replicated trainer
    _, loss1b = step1(s1, images)
    _, loss4b = step4(s4, b4)
    np.testing.assert_allclose(float(loss4b), float(loss1b),
                               rtol=5e-4, atol=1e-6)
