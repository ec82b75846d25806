"""mimm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the reference `Mutual-Information-MultiModal` codebase.

The framework learns a joint chest-X-ray-image / radiology-report
representation by maximizing a variational lower bound (Donsker-Varadhan or
InfoNCE) on the mutual information between a ResNet image embedding and a
BERT text embedding, then evaluates it with per-disease downstream MLP
classifiers, against a unimodal ResNet-autoencoder baseline.

Layout (reference parity cites are in each module's docstring):
    config       — typed configs mirroring the reference argparse flags
    data/        — ETL, WordPiece tokenizer, feature cache, host input pipeline
    models/      — ResNet encoder, BERT encoder, ResNetAE, MLPs, joint model
    objectives/  — DV / InfoNCE critics + masked pairwise scoring
    ops/         — Pallas TPU kernels for the hot paths
    parallel/    — device mesh, shardings, cross-chip negative gathering
    train/       — MI / autoencoder / classifier training loops
    checkpoint   — checkpoint tree + reference `.bin` interop
    metrics      — logging, training plots, GDV separability
"""

__version__ = "0.1.0"
