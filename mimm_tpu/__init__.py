"""mimm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the reference `Mutual-Information-MultiModal` codebase.

The framework learns a joint chest-X-ray-image / radiology-report
representation by maximizing a variational lower bound (Donsker-Varadhan or
InfoNCE) on the mutual information between a ResNet image embedding and a
BERT text embedding, then evaluates it with per-disease downstream MLP
classifiers, against a unimodal ResNet-autoencoder baseline.

Layout (reference parity cites are in each module's docstring; PARITY.md
maps the reference's component inventory line by line):
    config       — typed configs mirroring the reference argparse flags
    data/        — ETL, WordPiece tokenizer, feature cache, host input pipeline
    models/      — ResNet encoder, BERT encoder, ResNetAE, MLPs, joint model
    objectives/  — DV / InfoNCE critics + masked pairwise scoring
    ops/         — Pallas TPU kernels (pairwise critic, fused attention)
    parallel/    — device mesh, shardings, cross-chip global negatives
    train/       — MI / AE / classifier training loops, torch-parity optim
    checkpoint   — checkpoint/resume trees + reference `.bin` interop
    metrics      — JSONL metrics, reference-format logs, plots, GDV
    validate     — held-out accuracy + GDV separability
    serve        — batched inference sessions over trained checkpoints
    cam          — Grad-CAM via jax.grad
    profiling    — traces, step timing, NaN debug mode
"""

from mimm_tpu.config import (DatasetConfig, TrainingConfig,
                             construct_dataset_parameters,
                             construct_training_parameters)
from mimm_tpu.utils import MimicID

__version__ = "0.1.0"

__all__ = [
    "DatasetConfig", "TrainingConfig", "construct_dataset_parameters",
    "construct_training_parameters", "MimicID", "__version__",
]
