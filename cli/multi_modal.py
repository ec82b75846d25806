"""CLI: MI pretraining + classifier training (reference multi_modal.py).

``train_mutual_information`` tokenizes the report corpus (with the same
on-disk cache contract), builds the joint manager, and trains; logging
goes to ``<save_directory>/training_MI.log`` exactly like the reference
(multi_modal.py:27-34).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimm_tpu.config import TrainingConfig, construct_training_parameters


def train_mutual_information(cfg: TrainingConfig):
    from mimm_tpu.data.features import load_and_cache_examples
    from mimm_tpu.data.tokenizer import NativeWordPieceTokenizer as WordPieceTokenizer
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.mi import MultiModalManager

    os.makedirs(cfg.save_directory, exist_ok=True)
    # NOT logging.basicConfig: it no-ops after the first run in a sweep
    # process, routing later runs' records into the first run's file
    from mimm_tpu.metrics import configure_run_logging
    configure_run_logging(os.path.join(cfg.save_directory, "training_MI.log"))
    logger = logging.getLogger(__name__)
    logger.info("args: %s", cfg)

    # Tokenize BEFORE any jax backend exists: the tokenization pool forks
    # (reference parity, model_utils.py:539-543) and forking after device
    # client init can deadlock — features.convert_examples_to_features
    # guards on this and would silently fall back to serial.
    tokenizer = WordPieceTokenizer.from_pretrained(cfg.bert_pretrained_dir)
    features = load_and_cache_examples(cfg.text_data_dir, cfg.max_seq_length,
                                       tokenizer,
                                       num_workers=cfg.data_loader_workers)
    logger.info("tokens features: %d", len(features))

    # multi-host pods: no-op unless a coordinator is configured
    mesh_lib.initialize_distributed()

    # SIGTERM (pod eviction) -> checkpoint-and-exit at a step boundary;
    # resume with --resume_from <save_directory>/mi_preempt.ckpt
    from mimm_tpu import preempt
    preempt.install()

    manager = MultiModalManager(cfg)
    state = manager.train(token_features=features,
                          resume_from=preempt.resolve_resume(
                              cfg, "mi_preempt.ckpt"))
    return manager, state


def train_image_classifier(cfg: TrainingConfig, embed_fn, mlp_hidden_layers,
                           mesh=None):
    from mimm_tpu.metrics import configure_run_logging
    from mimm_tpu.train.classifier import ClassifierModelManager

    from mimm_tpu import preempt

    configure_run_logging(os.path.join(
        cfg.save_directory, f"training_classifier_{cfg.disease_label}.log"))
    # pass the SAME mesh the embed_fn was built with (it shards batches;
    # the Manager replicates the MLP state so devices agree)
    manager = ClassifierModelManager(cfg, embed_fn, mlp_hidden_layers,
                                     mesh=mesh)
    # --resume_from auto: pick up a preemption checkpoint if one exists
    # (classifier_<label>_preempt.ckpt, written on SIGTERM — mimm_tpu.preempt)
    return manager.train(resume_from=preempt.resolve_resume(
        cfg, f"classifier_{cfg.disease_label}_preempt.ckpt"))


def main():
    cfg = construct_training_parameters()
    train_mutual_information(cfg)


if __name__ == "__main__":
    main()
