"""PRODUCTION-SHAPE multi-device execution (opt-in, slow — VERDICT r2
item 6): the full bert-base (hidden 768, 12 layers) + 256px MI train
step compiles AND executes on the 8-device CPU mesh under the real
parallelism configs — closing the "sharding only proven at hidden-32"
caveat carried since round 1.

Three lanes (each one step, tiny batch, compile-dominated):
  * dp4 x tp2 + sequence parallelism (the dryrun's mesh, full width)
  * dp4 x pp2 with the pp-resident stacked text state + ZeRO-1
  * dp8 with ZeRO-1 + FSDP parameter sharding and the bf16 gradient
    all-reduce knob

Gate: MIMM_RUN_PRODSHAPE_MESH=1 (bert-base f32 on 8 virtual CPU
devices — several GB of host RAM and minutes of XLA compile).
"""

import os

import numpy as np
import pytest

from mimm_tpu.config import TrainingConfig
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.parallel import mesh as mesh_lib
from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                               make_mi_train_step, make_optimizers)

B = 16
SEQ = 128

pytestmark = pytest.mark.skipif(
    os.environ.get("MIMM_RUN_PRODSHAPE_MESH") != "1",
    reason="set MIMM_RUN_PRODSHAPE_MESH=1 (bert-base on the 8-device CPU "
           "mesh: RAM- and compile-heavy)")


def _bert_base():
    cfg = BertConfig(num_classes=1)
    assert cfg.hidden_size == 768 and cfg.num_hidden_layers == 12
    return cfg


def _batch():
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    return {
        "image": jnp.asarray(rng.random((B, 256, 256, 1)).astype(np.float32)),
        "txt_ids": jnp.asarray(rng.integers(0, 30522, (B, SEQ)).astype(np.int32)),
        "txt_masks": jnp.ones((B, SEQ), jnp.int32),
        "txt_segments": jnp.zeros((B, SEQ), jnp.int32),
        "study_id": jnp.asarray(np.arange(B, dtype=np.int64)),
    }


def _cfg(**kw):
    return TrainingConfig().replace(
        batch_size=B, img_size=256, max_seq_length=SEQ,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0, **kw)


def test_bert_base_dp_tp_sp_step():
    import jax
    cfg = _cfg(sequence_parallel=True)
    mesh = mesh_lib.make_mesh({"data": 4, "model": 2})
    model = build_joint_model(cfg, _bert_base(), mesh=mesh)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = mesh_lib.shard_mi_state(
        mesh, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))
    step = make_mi_train_step(model, txs, cfg, mesh=mesh)
    state, loss = step(state, mesh_lib.shard_batch(mesh, _batch()))
    # TP layouts themselves are asserted by test_sharding; loss is the gate
    assert np.isfinite(float(loss))


def test_bert_base_dp_pp_zero1_step():
    import jax
    from mimm_tpu.parallel.pipeline import stack_resident_text_state
    cfg = _cfg(zero1_optimizer_sharding=True, pipeline_microbatches=0)
    mesh = mesh_lib.make_mesh({"data": 4, "pipe": 2})
    model = build_joint_model(cfg, _bert_base())
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    state = stack_resident_text_state(state, 12)
    state = mesh_lib.shard_mi_state(mesh, state, zero1=True)
    step = make_mi_train_step(model, txs, cfg, mesh=mesh)
    state, loss = step(state, mesh_lib.shard_batch(mesh, _batch()))
    assert np.isfinite(float(loss))


def test_bert_base_dp8_zero_ladder_bf16_allreduce_step():
    import jax
    cfg = _cfg(zero1_optimizer_sharding=True, fsdp_parameter_sharding=True)
    mesh = mesh_lib.make_mesh({"data": 8})
    model = build_joint_model(cfg, _bert_base())
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = mesh_lib.shard_mi_state(
        mesh, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)),
        zero1=True, fsdp=True)
    step = make_mi_train_step(model, txs, cfg, mesh=mesh)
    state, loss = step(state, mesh_lib.shard_batch(mesh, _batch()))
    assert np.isfinite(float(loss))
    # second lane: pure-DP bf16 gradient all-reduce at full model width
    cfg2 = _cfg(grad_allreduce_dtype="bfloat16")
    state2 = mesh_lib.replicate(
        mesh, create_mi_state(model, cfg2, txs, jax.random.PRNGKey(0)))
    step2 = make_mi_train_step(model, txs, cfg2, mesh=mesh)
    state2, loss2 = step2(state2, mesh_lib.shard_batch(mesh, _batch()))
    assert np.isfinite(float(loss2))
