from . import optim
from .ae import (AETrainState, build_ae_model, create_ae_state,
                 make_ae_train_step, train_auto_encoder)
from .classifier import (ClassifierModelManager, ClassifierTrainState,
                         make_embedding_fn)
from .mi import (MIOptimizers, MITrainState, MultiModalManager,
                 build_joint_model, create_mi_state, make_mi_train_step,
                 make_optimizers, save_mi_checkpoints)

__all__ = [
    "optim",
    "AETrainState", "build_ae_model", "create_ae_state", "make_ae_train_step",
    "train_auto_encoder",
    "ClassifierModelManager", "ClassifierTrainState", "make_embedding_fn",
    "MIOptimizers", "MITrainState", "MultiModalManager", "build_joint_model",
    "create_mi_state", "make_mi_train_step", "make_optimizers",
    "save_mi_checkpoints",
]
