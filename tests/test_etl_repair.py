"""ETL repair flows + corpus integrity sweep (reference
dataset_populate.py:521-610 fix_missing_studies_* and :679-777
test_dataloader): partial downloads get repaired, and deliberate
corruption is detected rather than silently defaulted."""

import csv
import glob
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pytest

from mimm_tpu.data import etl

REF = "/root/reference/full_data_set"


@dataclass
class _Cfg:
    text_storage_dir: str
    training_text_dir: str


@pytest.fixture
def cfg(tmp_path):
    text_dir = str(tmp_path / "text")
    train_dir = str(tmp_path / "train_text")
    os.makedirs(train_dir)
    os.makedirs(text_dir)
    for src in glob.glob(REF + "/text/data_subfolder_*.tsv"):
        shutil.copy(src, text_dir)
    return _Cfg(text_storage_dir=text_dir, training_text_dir=train_dir)


def test_repair_all_data_from_subfolder(cfg):
    # simulate a partial download: all_data built from p10+p11 only
    etl.populate_all_data(cfg, ["p10", "p11"])
    all_data = os.path.join(cfg.training_text_dir, "all_data.tsv")
    before = sum(1 for _ in open(all_data))

    added = etl.repair_all_data_from_subfolder(cfg, "p13")
    assert added > 0
    after_rows = list(csv.reader(open(all_data), delimiter="\t"))
    assert len(after_rows) == before + added

    # repaired rows keep the all_data contract: index, -1, study, sub, text
    tail = after_rows[-1]
    assert tail[1] == "-1" and tail[3] == "p13" and tail[2].isdigit()

    # full-corpus parity: repaired file covers the same studies as a clean
    # 3-subfolder populate
    clean = str(cfg.training_text_dir) + "_clean"
    os.makedirs(clean)
    etl.populate_all_data(cfg, ["p10", "p11", "p13"], out_dir=clean)
    want = {r[2] for r in csv.reader(open(os.path.join(clean, "all_data.tsv")),
                                     delimiter="\t")}
    got = {r[2] for r in after_rows}
    assert got == want

    # idempotent: a second repair adds nothing
    assert etl.repair_all_data_from_subfolder(cfg, "p13") == 0


def test_find_missing_label_studies(cfg, tmp_path):
    etl.populate_all_data(cfg, ["p10", "p11", "p13"])
    all_data = os.path.join(cfg.training_text_dir, "all_data.tsv")
    studies = [r[2] for r in csv.reader(open(all_data), delimiter="\t")]

    label_csv = str(tmp_path / "labels.csv")
    with open(label_csv, "w") as f:
        f.write("mimic_id,Atelectasis\n")
        f.write(f"p1/p99_s{studies[0]}_aaa.jpg,1.0\n")   # present
        f.write("p1/p99_s31415926_bbb.jpg,0.0\n")        # missing

    missing = etl.find_missing_label_studies(all_data, label_csv)
    assert missing == ["31415926"]


def test_corpus_check_detects_deliberate_corruption(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from corpus_check import sweep_dataset

    from mimm_tpu.data.features import TokenFeatureSet
    from mimm_tpu.data.pipeline import CXRImageReportDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    fixture_img = glob.glob(REF + "/images/*/*.jpg")[0]
    shutil.copy(fixture_img, img_dir / "p1_s100_a.jpg")     # fully OK
    (img_dir / "p2_s200_b.jpg").write_text("NOT A JPEG")    # corrupt image
    shutil.copy(fixture_img, img_dir / "p3_s300_c.jpg")     # tokens missing

    meta = tmp_path / "meta.csv"
    with open(meta, "w") as f:
        f.write("mimic_id,Atelectasis\n")
        for name in ("p1_s100_a.jpg", "p2_s200_b.jpg", "p3_s300_c.jpg"):
            f.write(f"{name},1.0\n")

    L = 8
    tokens = TokenFeatureSet(
        report_ids=np.array(["100", "200"]),
        input_ids=np.ones((2, L), np.int32),
        input_mask=np.ones((2, L), np.int32),
        segment_ids=np.zeros((2, L), np.int32),
        label_ids=np.zeros(2, np.int32))

    ds = CXRImageReportDataset(tokens, str(img_dir), str(meta), img_size=64)
    report = sweep_dataset(ds)
    assert report["total"] == 3
    assert report["broken"] == 2
    assert set(report["broken_ids"]) == {"200", "300"}
    assert report["missing_tokens"] == 1
    assert report["unreadable_images"] == 1
