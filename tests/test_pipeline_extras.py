"""device_prefetch + ETL command construction coverage."""

import numpy as np


def test_device_prefetch_preserves_order_and_count():
    from mimm_tpu.data.pipeline import device_prefetch

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_short_stream():
    from mimm_tpu.data.pipeline import device_prefetch

    batches = [{"x": np.ones((1,), np.float32)}]
    out = list(device_prefetch(iter(batches), size=4))
    assert len(out) == 1
    assert list(device_prefetch(iter([]), size=2)) == []


def test_select_studies_dedups_and_filters(tmp_path):
    import csv
    import gzip

    from mimm_tpu.data.etl import select_studies

    meta = tmp_path / "meta.csv.gz"
    rows = [
        ["dicom_id", "subject_id", "study_id", "x", "ViewPosition"],
        ["d1", "10000001", "500", "", "PA"],
        ["d2", "10000001", "500", "", "AP"],      # same study -> deduped
        ["d3", "10000002", "501", "", "LATERAL"],  # wrong view -> dropped
        ["d4", "11000003", "502", "", "PA"],       # p11 -> filtered out
        ["d5", "10000004", "503", "", "AP"],
    ]
    with gzip.open(meta, "wt", newline="") as f:
        csv.writer(f, lineterminator="\n").writerows(rows)

    got = select_studies(str(meta), "p10")
    assert got == [("d1", "10000001", "500"), ("d5", "10000004", "503")]


def test_wget_command_contract(monkeypatch, tmp_path):
    """download=True issues wget with the PhysioNet URL layout and resume
    flags (reference dataset_populate.py:31-34) — captured, not executed."""
    import csv
    import gzip

    from mimm_tpu.config import DatasetConfig
    from mimm_tpu.data import etl

    calls = []
    monkeypatch.setattr(etl.subprocess, "run",
                        lambda cmd, **kw: calls.append(cmd))

    meta = tmp_path / "data" / etl.META_FILENAME
    meta.parent.mkdir(parents=True)
    with gzip.open(meta, "wt", newline="") as f:
        w = csv.writer(f, lineterminator="\n")
        w.writerow(["dicom_id", "subject_id", "study_id", "x", "ViewPosition"])
        w.writerow(["dAB", "10000077", "50099", "", "PA"])

    cfg = DatasetConfig(
        data_dir=str(tmp_path / "data") + "/",
        image_storage_dir=str(tmp_path / "imgs") + "/",
        text_storage_dir=str(tmp_path / "text") + "/",
        download_user="alice", download_password="pw")
    etl.download_full_dataset(cfg, "p10", download=True)

    assert calls, "no wget issued"
    report_cmd = calls[0]
    assert report_cmd[0] == "wget" and "-c" in report_cmd  # resume flag
    assert "--user" in report_cmd and "alice" in report_cmd
    url = [a for a in report_cmd if a.startswith("https://")][0]
    assert url == ("https://physionet.org/files/mimic-cxr/2.1.0/"
                   "files/p10/p10000077/s50099.txt")
