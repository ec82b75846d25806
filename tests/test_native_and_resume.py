"""Native host-op parity + checkpoint-resume tests."""

import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# native ops
# ---------------------------------------------------------------------------

def _have_native():
    from mimm_tpu.data import native_ops
    return native_ops.get_lib() is not None


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_native_affine_bit_exact(dtype):
    from mimm_tpu.data import native_ops, transforms

    rng = np.random.default_rng(0)
    hi = 255 if dtype == np.uint8 else 4095
    img = rng.integers(0, hi, size=(300, 280)).astype(dtype)
    h, w = img.shape
    for angle, tx, ty in [(0.0, 0, 0), (17.3, 12, -9), (-20.0, -28, 30)]:
        m = transforms._inverse_affine_matrix((w * 0.5, h * 0.5), angle, (tx, ty))
        top = int(round((h - 128) / 2.0))
        left = int(round((w - 128) / 2.0))
        a = native_ops.affine_crop_norm(img, m, top, left, 128)
        b = transforms.max_normalize(
            transforms.affine_crop(img.astype(np.int32), angle, tx, ty, 128))
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_center_crop_bit_exact():
    from mimm_tpu.data import native_ops, transforms

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(200, 180)).astype(np.uint8)
    h, w = img.shape
    top = int(round((h - 96) / 2.0))
    left = int(round((w - 96) / 2.0))
    a = native_ops.center_crop_norm(img, top, left, 96)
    b = transforms.max_normalize(transforms.center_crop(img.astype(np.int16), 96))
    np.testing.assert_array_equal(a, b)


def test_reference_transform_uses_native_when_available(tmp_path):
    """End-to-end: reference_transform output is identical whether or not
    the native path kicks in (validated implicitly by the bit-exact tests;
    here we just confirm determinism per (seed,epoch,index))."""
    from mimm_tpu.data import transforms

    rng1 = np.random.default_rng((0, 1, 2))
    rng2 = np.random.default_rng((0, 1, 2))
    img = np.random.default_rng(3).integers(0, 255, (300, 300)).astype(np.uint8)
    a = transforms.reference_transform(img, rng1, 128)
    b = transforms.reference_transform(img, rng2, 128)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# resume
# ---------------------------------------------------------------------------

def test_ae_resume_continues_from_checkpoint(tmp_path):
    import jax
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.ae import train_auto_encoder
    from tests.test_train import FakeImageDataset

    cfg = TrainingConfig().replace(
        save_directory=str(tmp_path / "save"), batch_size=4, seed=0,
        img_size=64, compute_dtype="float32", init_lr=1e-3, prefetch=1)
    mesh = mesh_lib.make_mesh({"data": 2})
    ds = FakeImageDataset(n=8, size=64)

    s2 = train_auto_encoder(cfg, dataset=ds, num_epochs=2, mesh=mesh,
                            export_torch_bins=False)
    # resume from epoch-1 checkpoint and train one more epoch
    s_resumed = train_auto_encoder(
        cfg, dataset=ds, num_epochs=2, mesh=mesh, export_torch_bins=False,
        resume_from=os.path.join(cfg.save_directory, "ae_epoch1.ckpt"))

    assert int(s_resumed.step) == int(s2.step) == 2 * 2
    # resumed run must land on the same params as the uninterrupted run
    # (same data order, same optimizer state restored)
    a = jax.device_get(s2.params["fc1"]["kernel"])
    b = jax.device_get(s_resumed.params["fc1"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_profiling_step_timer():
    from mimm_tpu.profiling import StepTimer

    t = StepTimer(batch_size=64, window=4)
    import time
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert t.steps == 5
    assert 64 / 0.1 < t.pairs_per_sec() < 64 / 0.005
