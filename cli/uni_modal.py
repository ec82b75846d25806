"""CLI: unimodal autoencoder pretraining (reference uni_modal.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimm_tpu.config import construct_training_parameters


def train_auto_encoder(cfg):
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.ae import train_auto_encoder as _train

    # multi-host pods: no-op unless a coordinator is configured
    mesh_lib.initialize_distributed()
    # SIGTERM (pod eviction) -> checkpoint-and-exit at a step boundary;
    # resume from <save_directory>/ae_preempt.ckpt
    from mimm_tpu import preempt
    preempt.install()
    return _train(cfg, resume_from=preempt.resolve_resume(
        cfg, "ae_preempt.ckpt"))


def main():
    train_auto_encoder(construct_training_parameters())


if __name__ == "__main__":
    main()
