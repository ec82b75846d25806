"""Orbax (directory/sharded) checkpoint backend — the pod-correct
counterpart of the versioned-pickle native format (checkpoint.py).

Covers: roundtrip equality for an optimizer-bearing train-state tree
(namedtuple optax states restored with their types via a structured
target), format auto-detection in load_checkpoint (dir = orbax, file =
pickle), sharded save/restore on the 8-device CPU mesh preserving values
and accepting a sharded target, and a trainer-level save+resume through
cfg.checkpoint_format="orbax".
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mimm_tpu import checkpoint as ckpt


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _state_tree():
    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
              "b": jnp.ones((4,), jnp.bfloat16)}
    tx = optax.adam(1e-3)
    return {"params": params, "opt": tx.init(params),
            "step": jnp.asarray(7, jnp.int32)}, tx


def test_orbax_roundtrip_with_target_preserves_optax_types(tmp_path):
    tree, tx = _state_tree()
    path = ckpt.save_checkpoint(str(tmp_path / "state.ckpt"), tree,
                                format="orbax")
    assert os.path.isdir(path)  # orbax checkpoints are directories
    restored = ckpt.load_checkpoint(path, target=tree)
    _tree_equal(tree, restored)
    # optax state must come back with its namedtuple types: an update()
    # call exercises attribute access on the restored state
    grads = jax.tree.map(jnp.ones_like, tree["params"])
    updates, _ = tx.update(grads, restored["opt"], restored["params"])
    assert jax.tree.leaves(updates)


def test_load_checkpoint_autodetects_format(tmp_path):
    tree, _ = _state_tree()
    p_pickle = ckpt.save_checkpoint(str(tmp_path / "a.ckpt"), tree)
    p_orbax = ckpt.save_checkpoint(str(tmp_path / "b.ckpt"), tree,
                                   format="orbax")
    assert os.path.isfile(p_pickle) and os.path.isdir(p_orbax)
    _tree_equal(ckpt.load_checkpoint(p_pickle),
                ckpt.load_checkpoint(p_orbax, target=tree))


def test_orbax_async_roundtrip(tmp_path):
    """orbax_async: the save returns before shards commit; after
    wait_for_async_saves the checkpoint is complete and loads equal.
    Re-saving the same path in flight must also be safe (epoch cadence)."""
    tree, _ = _state_tree()
    p1 = ckpt.save_checkpoint(str(tmp_path / "e1.ckpt"), tree,
                              format="orbax_async")
    tree2 = jax.tree.map(lambda x: x + 1 if jnp.issubdtype(x.dtype,
                                                           jnp.floating)
                         else x, tree)
    p2 = ckpt.save_checkpoint(str(tmp_path / "e2.ckpt"), tree2,
                              format="orbax_async")
    ckpt.wait_for_async_saves()
    _tree_equal(tree, ckpt.load_checkpoint(p1, target=tree))
    _tree_equal(tree2, ckpt.load_checkpoint(p2, target=tree))


def test_orbax_resave_overwrites(tmp_path):
    tree, _ = _state_tree()
    path = str(tmp_path / "state.ckpt")
    ckpt.save_checkpoint(path, tree, format="orbax")
    tree2 = jax.tree.map(lambda x: x + 1 if jnp.issubdtype(x.dtype, jnp.floating)
                         else x, tree)
    ckpt.save_checkpoint(path, tree2, format="orbax")  # same path, re-save
    _tree_equal(tree2, ckpt.load_checkpoint(path, target=tree))


def test_orbax_sharded_save_restore(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mimm_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.make_mesh({"data": 8})
    sharding = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16),
                       sharding)
    tree = {"x": x, "step": jnp.asarray(3, jnp.int32)}
    path = ckpt.save_checkpoint(str(tmp_path / "sharded.ckpt"), tree,
                                format="orbax")
    target = {"x": jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
              "step": jax.ShapeDtypeStruct((), jnp.int32)}
    restored = ckpt.load_checkpoint(path, target=target)
    assert restored["x"].sharding == sharding  # restored ONTO the mesh
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.asarray(x))


def test_offline_bin_converter_from_orbax(tmp_path):
    """tools/convert_checkpoint.py (the offline path the multi-host .bin
    export warning points at): an orbax-saved MI state converts to the
    reference .bin names, and the image tower re-imports identically."""
    import subprocess
    import sys

    pytest.importorskip("torch")
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.train.mi import create_mi_state, make_optimizers

    cfg = TrainingConfig().replace(batch_size=4, img_size=256,
                                   max_seq_length=16, compute_dtype="float32")
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=32, num_classes=1)
    model = ImageReportModel(bert_config=bert_cfg, output_channels=1,
                             dtype=jnp.float32)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    state = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    save_dir = tmp_path / "save"
    path = ckpt.save_checkpoint(str(save_dir / "mi_epoch3.ckpt"),
                                state._asdict(), format="orbax")
    bert_cfg.to_json_file(str(save_dir / "config.json"))

    out_dir = tmp_path / "bins"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py"),
         "--kind", "mi", "--ckpt", path, "--out", str(out_dir)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})  # no TPU in the child
    assert proc.returncode == 0, proc.stderr[-2000:]
    for name in ("pytorch_MI_image_model.bin", "pytorch_MI_text_model.bin",
                 "pytorch_model_epoch3.bin"):
        assert os.path.exists(out_dir / name), name

    v = ckpt.load_resnet_from_bin(str(out_dir / "pytorch_MI_image_model.bin"))
    want = jax.device_get(state.params["image_model"]["conv1"]["kernel"])
    np.testing.assert_allclose(v["params"]["conv1"]["kernel"], want,
                               rtol=1e-6)


def test_ae_resume_through_orbax(tmp_path):
    """Trainer-level: save with cfg.checkpoint_format='orbax', resume, and
    the resumed state must match the checkpointed one exactly."""
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.ae import train_auto_encoder

    class TinyImages:
        def __init__(self, n=8, size=64):
            rng = np.random.default_rng(0)
            self.x = rng.random((n, size, size, 1)).astype(np.float32)

        def __len__(self):
            return len(self.x)

        def load(self, idx, rng, train=True):
            return {"image": self.x[idx]}

    cfg = TrainingConfig().replace(
        save_directory=str(tmp_path), img_size=64, batch_size=4,
        compute_dtype="float32", num_train_epochs=1,
        checkpoint_format="orbax", compact_transfer=False)
    mesh = mesh_lib.make_mesh({"data": 2})
    state = train_auto_encoder(cfg, dataset=TinyImages(), mesh=mesh,
                               export_torch_bins=False)
    path = os.path.join(cfg.save_directory, "ae_epoch1.ckpt")
    assert os.path.isdir(path)
    resumed = train_auto_encoder(cfg, dataset=TinyImages(), num_epochs=1,
                                 mesh=mesh, resume_from=path,
                                 export_torch_bins=False)
    # num_epochs == start_epoch after resume => no further steps ran;
    # the resumed state must equal the saved one
    _tree_equal(jax.device_get(state._asdict()),
                jax.device_get(resumed._asdict()))
