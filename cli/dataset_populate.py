"""CLI: dataset acquisition + population (reference dataset_populate.py).

Stages:
  download  — per-subfolder fetch/parse -> data_subfolder_<pN>.tsv
  merge     — merge subfolder TSVs -> all_data.tsv
  populate  — train/test split + label CSVs + disease stats
  stats     — (re)build disease_stats.csv for a label CSV

Network fetches are OFF unless --download true (zero-egress environments
parse already-downloaded files).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimm_tpu.config import construct_dataset_parameters
from mimm_tpu.data import etl


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--stage", default="populate",
                        choices=["download", "merge", "populate", "stats"])
    parser.add_argument("--download", default="false")
    parser.add_argument("--subfolders", default="")
    known, rest = parser.parse_known_args()
    cfg = construct_dataset_parameters(rest)
    subfolders = known.subfolders.split(",") if known.subfolders else [cfg.sub_folder]

    if known.stage == "download":
        for sub in subfolders:
            etl.download_full_dataset(cfg, sub,
                                      download=known.download.lower() == "true")
    elif known.stage == "merge":
        etl.populate_all_data(cfg, subfolders)
    elif known.stage == "populate":
        etl.populate_subset_dataset(cfg)
    elif known.stage == "stats":
        etl.parsing_csv_meta_data_for_label_stats(cfg.training_dataset_labeldata,
                                                  cfg.training_data_dir)


if __name__ == "__main__":
    main()
