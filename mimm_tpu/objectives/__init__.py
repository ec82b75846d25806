from .critics import (
    dv_bound_loss,
    infonce_bound_loss,
    dv_bound_from_scores,
    infonce_bound_from_scores,
    infonce_per_anchor,
    negative_pair_mask,
)
from .pairing import pairwise_critic_scores, mi_loss_from_embeddings

__all__ = [
    "dv_bound_loss",
    "infonce_bound_loss",
    "dv_bound_from_scores",
    "infonce_bound_from_scores",
    "infonce_per_anchor",
    "negative_pair_mask",
    "pairwise_critic_scores",
    "mi_loss_from_embeddings",
]
