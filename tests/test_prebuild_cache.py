"""mimm-prebuild-cache (cli/prebuild_cache.py): pre-building the
decoded-crop cache must (a) produce entries the training-path cache hits
on without a single decode, (b) be resumable — a second run skips every
valid entry via the cheap metadata peek, (c) count unreadable sources
without failing the pool.  Reference counterpart: none (the reference
re-decodes every epoch, model_utils.py:80)."""

import json
import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cli.prebuild_cache import collect_image_ids, main  # noqa: E402
from mimm_tpu.data.crop_cache import DecodedCropCache  # noqa: E402


@pytest.fixture
def img_tree(tmp_path):
    """A tiny image tree shaped like the fixture corpus: two subfolders,
    three readable images, one junk file with an image extension."""
    rng = np.random.default_rng(0)
    ids = ["p10/a.jpg", "p10/b.jpg", "p11/c.jpg"]
    for img_id in ids:
        path = tmp_path / "images" / img_id
        path.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path),
                    rng.integers(0, 255, (300, 320), np.uint8))
    bad = tmp_path / "images" / "p11" / "junk.jpg"
    bad.write_bytes(b"not a jpeg")
    return tmp_path


def _run(img_tree, capsys, *extra):
    rc = main(["--image_dir", str(img_tree / "images"),
               "--cache_dir", str(img_tree / "cache"),
               "--img_size", "128", "--report_every", "0", *extra])
    return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_prebuild_then_training_path_hits(img_tree, capsys):
    rc, summary = _run(img_tree, capsys)
    assert rc == 1  # junk.jpg is unreadable
    assert summary["built"] == 3 and summary["unreadable"] == 1

    cache = DecodedCropCache(str(img_tree / "cache"), 128)
    got = cache.read(str(img_tree / "images"), "p10/a.jpg")
    assert got is not None and cache.hits == 1 and cache.misses == 0

    # the cached window equals what a cold read-through build produces
    cold = DecodedCropCache(str(img_tree / "cache2"), 128)
    ref = cold.read(str(img_tree / "images"), "p10/a.jpg")
    np.testing.assert_array_equal(got[0], ref[0])
    assert got[1:] == ref[1:]


def test_prebuild_resumes_skipping_valid(img_tree, capsys):
    _run(img_tree, capsys)
    # delete one entry to simulate an interrupted build
    victim = [p for p in (img_tree / "cache" / "p10").iterdir()][0]
    victim.unlink()
    rc, summary = _run(img_tree, capsys)
    assert summary["built"] == 1 and summary["skipped_valid"] == 2
    assert summary["unreadable"] == 1 and rc == 1


def test_collect_ids_from_metadata(img_tree, tmp_path):
    meta = tmp_path / "meta.csv"
    meta.write_text("mimic_id,Label\np10/a.jpg,1\np10/a.jpg,0\n"
                    "p11/c.jpg,1\n")
    ids = collect_image_ids(str(img_tree / "images"), str(meta), "mimic_id")
    assert ids == ["p10/a.jpg", "p11/c.jpg"]  # deduped, order-preserving


def test_collect_ids_scan(img_tree):
    ids = collect_image_ids(str(img_tree / "images"), "", "mimic_id")
    assert sorted(ids) == ["p10/a.jpg", "p10/b.jpg", "p11/c.jpg",
                           "p11/junk.jpg"]
