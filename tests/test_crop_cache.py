"""Decoded-crop cache (data/crop_cache.py) parity tests.

The cache's correctness claim is strict: running the reference transform
chain on the stored support window must be BIT-IDENTICAL to running it on
the full decoded image, for every (angle, tx, ty) the augmentation can
draw, on both the native C++ and the pure-numpy paths, train and eval,
raw (compact-transfer) and normalized.  The reference has no counterpart
(it re-decodes every JPEG every epoch, model_utils.py:80); these tests
anchor the cache to the already reference-parity-tested direct path.
"""

import numpy as np
import pytest

from mimm_tpu.data import crop_cache, native_ops, transforms
from mimm_tpu.data.crop_cache import DecodedCropCache, support_window

# (full image shape, crop size) cases: landscape/portrait, exactly-crop,
# smaller-than-crop (window degenerates to the whole image).
SHAPES = [((600, 704), 256), ((704, 600), 256), ((300, 280), 128),
          ((256, 256), 256), ((180, 200), 256), ((2544, 3056), 256)]


def _window(img, out_size):
    oy, ox, wh, ww = support_window(img.shape[0], img.shape[1], out_size)
    win = np.ascontiguousarray(img[oy:oy + wh, ox:ox + ww])
    return win, (oy, ox)


def _image(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    # uint16 sources stay below 2**12 like real ANYDEPTH CXRs (and like
    # every existing transform-parity fixture), so the int16-cast branch
    # is value-preserving on both paths.
    hi = 256 if dtype == np.uint8 else 4096
    return rng.integers(0, hi, size=shape).astype(dtype)


def test_support_window_covers_all_affine_coords():
    """Geometric guarantee: every source coordinate the inverse-mapped
    output grid can floor to — over a dense sweep of the (angle, tx, ty)
    corner/extreme space — lies inside the support window."""
    for (h, w), out_size in SHAPES:
        oy, ox, wh, ww = support_window(h, w, out_size)
        top = int(round((h - out_size) / 2.0))
        left = int(round((w - out_size) / 2.0))
        ys, xs = np.meshgrid(np.arange(out_size) + top,
                             np.arange(out_size) + left, indexing="ij")
        fx, fy = xs + 0.5, ys + 0.5
        max_tx = int(round(0.1 * w))
        max_ty = int(round(0.1 * h))
        for angle in (-20.0, -19.999, -10.0, 0.0, 10.0, 19.999, 20.0):
            for tx in (-max_tx, 0, max_tx):
                for ty in (-max_ty, 0, max_ty):
                    m = transforms._inverse_affine_matrix(
                        (w * 0.5, h * 0.5), angle, (tx, ty))
                    sx = np.floor(m[0] * fx + m[1] * fy + m[2]).astype(int)
                    sy = np.floor(m[3] * fx + m[4] * fy + m[5]).astype(int)
                    inside = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
                    assert sx[inside].min(initial=w) >= ox
                    assert sx[inside].max(initial=-1) < ox + ww
                    assert sy[inside].min(initial=h) >= oy
                    assert sy[inside].max(initial=-1) < oy + wh


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("raw", [False, True])
def test_window_transform_bit_identical_train(dtype, raw):
    for (h, w), out_size in SHAPES:
        img = _image((h, w), dtype)
        win, origin = _window(img, out_size)
        for seed in range(8):
            direct = transforms.reference_transform(
                img, np.random.default_rng(seed), out_size, train=True,
                raw=raw)
            viawin = transforms.reference_transform_window(
                win, origin, (h, w), np.random.default_rng(seed), out_size,
                train=True, raw=raw)
            assert direct.dtype == viawin.dtype, ((h, w), seed)
            assert np.array_equal(direct, viawin), ((h, w), seed)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("raw", [False, True])
def test_window_transform_bit_identical_eval(dtype, raw):
    for (h, w), out_size in SHAPES:
        img = _image((h, w), dtype)
        win, origin = _window(img, out_size)
        direct = transforms.reference_transform(img, None, out_size,
                                                train=False, raw=raw)
        viawin = transforms.reference_transform_window(
            win, origin, (h, w), None, out_size, train=False, raw=raw)
        assert direct.dtype == viawin.dtype
        assert np.array_equal(direct, viawin)


def test_numpy_fallback_windowed_affine_matches_full():
    """The pure-numpy affine_crop (native lib absent / exotic dtypes) with
    src_origin/full_shape equals the full-image call at extreme params."""
    for (h, w), out_size in SHAPES:
        img = _image((h, w), np.uint16).astype(np.int16)
        win, (oy, ox) = _window(img, out_size)
        for angle, tx, ty in [(-20.0, int(0.1 * w), -int(0.1 * h)),
                              (20.0, -int(0.1 * w), int(0.1 * h)),
                              (7.3, 11, -4), (0.0, 0, 0)]:
            full = transforms.affine_crop(img, angle, tx, ty, out_size)
            part = transforms.affine_crop(win, angle, tx, ty, out_size,
                                          src_origin=(oy, ox),
                                          full_shape=(h, w))
            assert np.array_equal(full, part), ((h, w), angle, tx, ty)


def test_native_windowed_affine_available():
    lib = native_ops.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    assert hasattr(lib, "affine_crop_raw_u8_win")
    img = _image((600, 704), np.uint16)
    win, (oy, ox) = _window(img, 256)
    m = transforms._inverse_affine_matrix((704 * 0.5, 600 * 0.5), -20.0,
                                          (70, -60))
    top, left = int(round((600 - 256) / 2.0)), int(round((704 - 256) / 2.0))
    got = native_ops.affine_crop_win(win, m, top, left, oy, ox, 256, raw=True)
    want = native_ops.affine_crop_raw(img, m, top, left, 256)
    assert np.array_equal(got, want)


def _write_img(tmp_path, name, img):
    import cv2
    p = tmp_path / name
    cv2.imwrite(str(p), img)
    return name


def test_cache_roundtrip_and_dataset_parity(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    img = _image((600, 704), np.uint8, seed=3)
    _write_img(img_dir, "a.png", img)

    cache = DecodedCropCache(str(tmp_path / "cache"), 256)
    got = cache.read(str(img_dir), "a.png")
    assert got is not None and cache.misses == 1
    win, oy, ox, h, w = got
    decoded = cv2.imread(str(img_dir / "a.png"), cv2.IMREAD_ANYDEPTH)
    assert (h, w) == decoded.shape[:2]
    assert np.array_equal(win, decoded[oy:oy + win.shape[0],
                                       ox:ox + win.shape[1]])
    # second read is a hit with identical payload
    got2 = cache.read(str(img_dir), "a.png")
    assert cache.hits == 1 and np.array_equal(got2[0], win)

    # torn/garbage cache file -> silently rebuilt
    with open(cache._path("a.png"), "wb") as f:
        f.write(b"not an npz")
    got3 = cache.read(str(img_dir), "a.png")
    assert np.array_equal(got3[0], win) and cache.misses == 2

    # unreadable source -> None (loader skip-and-count handles it)
    assert cache.read(str(img_dir), "missing.png") is None

    # full dataset path: cached loads == uncached loads, bit for bit
    from mimm_tpu.data.pipeline import CXRImageDataset
    with open(tmp_path / "meta.csv", "w") as f:
        f.write("mimic_id\na.png\n")
    for compact in (False, True):
        plain = CXRImageDataset(str(img_dir), str(tmp_path / "meta.csv"),
                                img_size=256, compact=compact)
        cached = CXRImageDataset(str(img_dir), str(tmp_path / "meta.csv"),
                                 img_size=256, compact=compact,
                                 crop_cache=DecodedCropCache(
                                     str(tmp_path / "cache"), 256))
        for train in (True, False):
            for seed in range(3):
                a = plain.load(0, np.random.default_rng(seed), train=train)
                b = cached.load(0, np.random.default_rng(seed), train=train)
                assert a["image"].dtype == b["image"].dtype
                assert np.array_equal(a["image"], b["image"])


def test_from_config():
    class Cfg:
        decoded_crop_cache = ""
        img_size = 256
    assert crop_cache.from_config(Cfg()) is None


def test_nested_img_id_builds_subdirs(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    (img_dir / "p10" / "s1").mkdir(parents=True)
    img = _image((400, 400), np.uint8, seed=5)
    cv2.imwrite(str(img_dir / "p10" / "s1" / "x.png"), img)
    cache = DecodedCropCache(str(tmp_path / "cache"), 256)
    got = cache.read(str(img_dir), "p10/s1/x.png")
    assert got is not None
    assert cache.read(str(img_dir), "p10/s1/x.png") is not None
    assert cache.hits == 1
