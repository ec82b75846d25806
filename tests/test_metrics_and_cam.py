"""GDV parity vs the sklearn-based reference formula + Grad-CAM sanity."""

import numpy as np
import pytest


def test_gdv_matches_sklearn_reference_formula():
    """Recompute the reference's gdv_calculation (validate.py:16-49) with
    sklearn primitives and compare to our numpy implementation — including
    its quirky element-count divisor."""
    sklearn = pytest.importorskip("sklearn")
    import math
    from sklearn.metrics import pairwise_distances
    from sklearn.preprocessing import StandardScaler

    from mimm_tpu.metrics import gdv_calculation

    rng = np.random.default_rng(0)
    pos = rng.normal(0.5, 1.0, size=(20, 8))
    neg = rng.normal(-0.5, 1.0, size=(30, 8))

    def ref(source):
        s = StandardScaler().fit_transform(source)
        return s

    def intra(items):
        d = pairwise_distances(items, metric="euclidean")
        total = items.shape[0] * items.shape[1]
        return d.sum() * 2 / (total * (total - 1))

    def inter(a, b):
        d = pairwise_distances(a, b, metric="euclidean")
        return d.sum() / ((a.shape[0] * a.shape[1]) * (b.shape[0] * b.shape[1]))

    p, n = ref(pos), ref(neg)
    want = (1 / math.sqrt(len(pos) + len(neg))) * (
        (intra(p) + intra(n)) / 2 - inter(p, n))

    got = gdv_calculation(pos, neg)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_generic_grad_cam_shapes_and_range():
    import jax
    import jax.numpy as jnp

    from mimm_tpu.cam import grad_cam

    fmap = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (4,))

    def score_fn(f):
        return jnp.sum(f * w, axis=(1, 2, 3))

    cam = grad_cam(score_fn, fmap)
    assert cam.shape == (2, 6, 6)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_resnet_grad_cam_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from mimm_tpu.cam import generate_GradCAM_image
    from mimm_tpu.models.mlp import BasicMLP
    from mimm_tpu.models.resnet import ResNet256_6_2_1

    model = ResNet256_6_2_1(output_channels=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)),
                           train=False)
    mlp = BasicMLP(768, [8])
    params = mlp.init(jax.random.PRNGKey(1))
    classifier = lambda emb: mlp.apply(params, emb)

    img = np.random.default_rng(0).random((256, 256, 1)).astype(np.float32)
    out = generate_GradCAM_image(model, variables, classifier, img,
                                 str(tmp_path))
    assert out.endswith("Grad_Cam.jpg")
    import cv2
    written = cv2.imread(out)
    assert written is not None and written.shape == (256, 256, 3)


def test_find_classifier_checkpoint_picks_latest(tmp_path):
    from mimm_tpu.validate import find_classifier_checkpoint

    for e in (3, 12, 7):
        (tmp_path / f"pytorch_image_classifier_Edema_epoch{e}.bin").touch()
    got = find_classifier_checkpoint(str(tmp_path), "Edema")
    assert got.endswith("epoch12.bin")
    got7 = find_classifier_checkpoint(str(tmp_path), "Edema", epoch=7)
    assert got7.endswith("epoch7.bin")
    with pytest.raises(FileNotFoundError):
        find_classifier_checkpoint(str(tmp_path), "Pneumonia")


def test_logfile_parser_reads_real_reference_log():
    """Plot_Training_From_Logfile parses the reference's committed
    mm_dv_epoch20 training log; values match BASELINE.md."""
    import os

    from mimm_tpu.metrics import Plot_Training_From_Logfile

    ref_log = "/root/reference/save_dir/mm_dv_epoch20/training_MI.log"
    if not os.path.exists(ref_log):
        import pytest
        pytest.skip("reference log not mounted")
    losses = Plot_Training_From_Logfile(ref_log)
    assert len(losses) == 20                       # 20 epochs
    np.testing.assert_allclose(losses[0], -449.97904)   # BASELINE.md epoch 1
    np.testing.assert_allclose(losses[-1], -5447.45191)  # epoch 20
    assert all(b < a for a, b in zip(losses, losses[1:]))  # monotone decrease


def test_plot_training_writes_png(tmp_path):
    from mimm_tpu.metrics import Plot_Training

    out = str(tmp_path / "curve.png")
    Plot_Training("Epochs", "Loss", "t", [[3.0, 2.0, 1.0], [2.5, 2.0, 1.5]],
                  ["train", "val"], out)
    with open(out, "rb") as f:
        assert f.read(8).startswith(b"\x89PNG")


def test_print_model_counts_params(caplog):
    import logging

    from mimm_tpu.metrics import PrintModel

    params = {"layer": {"w": np.zeros((3, 4)), "b": np.zeros(4)}}
    with caplog.at_level(logging.INFO, logger="mimm_tpu.model"):
        total = PrintModel(params)
    assert total == 16
    text = caplog.text
    assert "layer/w" in text and "(3, 4)" in text


def test_checkpoint_version_envelope(tmp_path):
    import pickle

    from mimm_tpu import checkpoint as ckpt

    tree = {"a": np.arange(3), "step": 7}
    p = ckpt.save_checkpoint(str(tmp_path / "x.ckpt"), tree)
    got = ckpt.load_checkpoint(p)
    np.testing.assert_array_equal(got["a"], tree["a"])
    assert got["step"] == 7

    # round-1 bare trees (no envelope) still load
    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as f:
        pickle.dump(tree, f)
    np.testing.assert_array_equal(ckpt.load_checkpoint(legacy)["a"], tree["a"])

    # future formats are refused, not mis-parsed
    newer = str(tmp_path / "new.ckpt")
    with open(newer, "wb") as f:
        pickle.dump({"__mimm_ckpt__": 99, "tree": tree}, f)
    import pytest
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(newer)


def test_metric_writer_tensorboard_roundtrip(tmp_path):
    """MetricWriter(tensorboard=True) must produce tfevents files stock
    TensorBoard can read (mimm_tpu/tbevents.py encodes TFRecord + Event
    protos by hand — masked crc32c and all — so the round-trip through
    tensorboard's own event_accumulator is the correctness oracle)."""
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    from mimm_tpu.metrics import MetricWriter

    w = MetricWriter(str(tmp_path), name="mi", log_filename=None,
                     tensorboard=True)
    w.write(step=1, loss=-12.5, lr=2e-5)
    w.write(step=2, loss=-13.25)
    w.epoch_summary(1, -13.0, 4.2)   # step from the 'epoch' scalar
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path / "tb" / "mi"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"loss", "lr", "epoch_loss", "epoch_seconds"} <= tags
    losses = {e.step: e.value for e in acc.Scalars("loss")}
    assert losses == {1: -12.5, 2: -13.25}
    epoch_loss = acc.Scalars("epoch_loss")
    assert epoch_loss[0].step == 1 and epoch_loss[0].value == -13.0
    # JSONL still written alongside
    assert (tmp_path / "mi.jsonl").exists()
