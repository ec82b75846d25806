"""CLI: sweep driver (reference train.py) — MI models, AE models, and
per-disease classifiers, expressed as explicit config products instead of
in-place args mutation (the reference compounds save_directory inside its
loops, train.py:34,66,94)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from mimm_tpu.config import (DEFAULT_CLASSIFIER_LAYERS,
                             construct_training_parameters)

CRITICS = ["dv"]            # reference train.py:17
TRAINING_EPOCHS = [20]      # train.py:18
BATCH_SIZES = [64]          # train.py:19
DISEASES = ["Cardiomegaly", "Pneumonia"]            # train.py:50
MLP_LAYERS = [list(DEFAULT_CLASSIFIER_LAYERS)]      # train.py:52
OPTIMIZERS = ["Adam"]                                # train.py:53
LEARNING_RATES = [5e-4]                              # train.py:54


def train_MI_models(base_cfg):
    try:  # installed (mimm_cli) or in-repo package import
        from .multi_modal import train_mutual_information
    except ImportError:  # direct `python cli/train.py` execution
        from cli.multi_modal import train_mutual_information
    from mimm_tpu import preempt

    for critic in CRITICS:
        for epochs in TRAINING_EPOCHS:
            for batch in BATCH_SIZES:
                if preempt.requested():
                    return  # SIGTERM grace window: stop the sweep cleanly
                cfg = base_cfg.replace(
                    mi_estimator=critic, num_train_epochs=epochs,
                    batch_size=batch,
                    save_directory=os.path.join(
                        base_cfg.save_directory, f"mm_{critic}_epoch{epochs}"))
                train_mutual_information(cfg)


def train_AE_models(base_cfg):
    from mimm_tpu import preempt
    from mimm_tpu.train.ae import train_auto_encoder

    cfg = base_cfg.replace(save_directory=os.path.join(
        base_cfg.save_directory, f"um_ae_epoch{base_cfg.num_train_epochs}"))
    os.makedirs(cfg.save_directory, exist_ok=True)
    train_auto_encoder(cfg, resume_from=preempt.resolve_resume(
        cfg, "ae_preempt.ckpt"))


def train_Classifier(base_cfg, isMultiModal: bool):
    try:
        from .multi_modal import train_image_classifier
    except ImportError:
        from cli.multi_modal import train_image_classifier
    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.models.resnet import ResNet256_6_2_1
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.ae import build_ae_model
    from mimm_tpu.train.classifier import make_embedding_fn

    # data-parallel the frozen-encoder embedding pass over the mesh
    # (classifier throughput scales with chips; same math)
    mesh = mesh_lib.make_mesh(
        dict(base_cfg.mesh_shape) or None,
        dcn_mesh_shape=dict(getattr(base_cfg, "dcn_mesh_shape", ())) or None)
    if isMultiModal:
        run_dir = os.path.join(
            base_cfg.save_directory,
            f"mm_{base_cfg.mi_estimator}_epoch{base_cfg.num_train_epochs}")
        if not os.path.isdir(run_dir):  # round-1 layout fallback
            legacy = os.path.join(
                base_cfg.save_directory,
                f"{base_cfg.mi_estimator}_epoch{base_cfg.num_train_epochs}")
            run_dir = legacy if os.path.isdir(legacy) else run_dir
        model = ResNet256_6_2_1(output_channels=base_cfg.output_channels)
        variables = ckpt.load_resnet_from_bin(
            os.path.join(run_dir, "pytorch_MI_image_model.bin"))
        embed = make_embedding_fn("multimodal", model, variables, mesh=mesh)
    else:
        run_dir = os.path.join(base_cfg.save_directory,
                               f"um_ae_epoch{base_cfg.num_train_epochs}")
        model = build_ae_model(base_cfg)
        sd = ckpt.load_state_dict_bin(
            os.path.join(run_dir, f"autoencoder_path_{base_cfg.num_train_epochs}.bin"))
        variables = ckpt.ae_variables_from_state_dict(sd)
        embed = make_embedding_fn("unimodal", model, variables, mesh=mesh)

    from mimm_tpu import preempt
    for disease in DISEASES:
        for layers in MLP_LAYERS:
            for opt in OPTIMIZERS:
                for lr in LEARNING_RATES:
                    if preempt.requested():
                        # SIGTERM grace window: the interrupted run has
                        # already saved its preempt ckpt — don't burn the
                        # remaining seconds compiling the next sweep point
                        return
                    cfg = base_cfg.replace(
                        save_directory=run_dir, disease_label=disease,
                        optimizer=opt, init_lr=lr)
                    train_image_classifier(cfg, embed, layers, mesh=mesh)


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--stage", default="classifier_um",
                        choices=["mi", "ae", "classifier_mm", "classifier_um"])
    stage_args, rest = parser.parse_known_args()
    cfg = construct_training_parameters(rest)
    # SIGTERM (pod eviction) -> the active trainer checkpoints and exits
    # at its next step boundary (mimm_tpu/preempt.py)
    from mimm_tpu import preempt
    preempt.install()
    if stage_args.stage == "mi":
        train_MI_models(cfg)
    elif stage_args.stage == "ae":
        train_AE_models(cfg)
    elif stage_args.stage == "classifier_mm":
        train_Classifier(cfg, isMultiModal=True)
    else:
        train_Classifier(cfg, isMultiModal=False)


if __name__ == "__main__":
    main()
