"""CLI: held-out validation — accuracy + GDV (reference validate.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimm_tpu.config import (DEFAULT_CLASSIFIER_LAYERS,
                             construct_training_parameters)

MLP_LAYER = list(DEFAULT_CLASSIFIER_LAYERS)  # reference validate.py:155


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--disease", default="Pneumonia")
    parser.add_argument("--classifier_epoch", type=int, default=None)
    parser.add_argument("--modality", choices=("mm", "um"), default="mm",
                        help="mm: MI image encoder (reference "
                             "validate_MultiModal); um: ResNetAE encoder "
                             "(reference um_*.log runs)")
    parser.add_argument("--ae_epoch", type=int, default=None)
    parser.add_argument("--extended", action="store_true",
                        help="also report AUC-ROC, precision, recall, F1 "
                             "and the confusion counts (beyond reference "
                             "parity)")
    known, rest = parser.parse_known_args()
    cfg = construct_training_parameters(rest)

    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.validate import validate_MultiModal, validate_UniModal

    # data-parallel the encoder pass over the configured mesh
    mesh = mesh_lib.make_mesh(
        dict(cfg.mesh_shape) or None,
        dcn_mesh_shape=dict(getattr(cfg, "dcn_mesh_shape", ())) or None)
    if known.modality == "mm":
        run_dir = os.path.join(
            cfg.save_directory,
            f"mm_{cfg.mi_estimator}_epoch{cfg.num_train_epochs}")
        if not os.path.isdir(run_dir):  # round-1 layout fallback
            legacy = os.path.join(
                cfg.save_directory,
                f"{cfg.mi_estimator}_epoch{cfg.num_train_epochs}")
            run_dir = legacy if os.path.isdir(legacy) else run_dir
        cfg = cfg.replace(save_directory=run_dir)
        result = validate_MultiModal(
            cfg, MLP_LAYER, known.disease,
            classifier_epoch=known.classifier_epoch, extended=known.extended,
            mesh=mesh)
    else:
        run_dir = os.path.join(cfg.save_directory,
                               f"um_ae_epoch{cfg.num_train_epochs}")
        if os.path.isdir(run_dir):
            cfg = cfg.replace(save_directory=run_dir)
        result = validate_UniModal(
            cfg, MLP_LAYER, known.disease,
            classifier_epoch=known.classifier_epoch, ae_epoch=known.ae_epoch,
            extended=known.extended, mesh=mesh)
    if known.extended:
        for key in ("accuracy", "separability", "auc", "precision", "recall",
                    "f1", "tp", "tn", "fp", "fn", "positives", "negatives"):
            print(f"{key.capitalize()}: {result[key]}")
        return result
    accuracy, separability = result
    print(f"Accuracy: {accuracy}")
    print(f"Separability: {separability}")
    return accuracy, separability


if __name__ == "__main__":
    main()
