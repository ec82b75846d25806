"""Plain MLPs: the MI discriminator and the downstream classifier.

* ``make_mlp`` / ``mlp_apply`` — the MI discriminator (reference
  ``model.py:18-48``): Linear+ReLU stack ending in a single linear output.
  Kept as an explicit params pytree (not a Module) because the pairwise
  critic factorizes its first layer across the image/text halves
  (see objectives/pairing.py) and needs direct access to the weights.

* ``BasicMLP`` — the downstream per-disease classifier (reference
  ``model.py:154-214``): Linear stack with ReLU+Dropout(0.2) between layers
  and a sigmoid output head.

Weight init replicates ``torch.nn.Linear`` defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so loss
trajectories are comparable with the reference.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def make_mlp(key, input_dim: int, hidden_dims: Sequence[int], output_dim: int = 1):
    """Init params for the MI discriminator MLP (reference model.py:18-48).

    Returns a list of {'w','b'} layer dicts; ReLU between all layers, linear
    output.  Reference default: make_mlp(1536, [1024, 512]) -> 1.
    """
    dims = [input_dim, *hidden_dims, output_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return [_linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


def mlp_apply(params: List[dict], x: jax.Array) -> jax.Array:
    """Forward the make_mlp stack: ReLU after every layer but the last."""
    for layer in params[:-1]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


class BasicMLP:
    """Downstream classifier (reference model.py:154-184): per-hidden-layer
    Linear -> ReLU -> Dropout(0.2); final Linear -> sigmoid.

    Functional: ``init`` returns a params pytree, ``apply`` is pure.
    """

    def __init__(self, input_dim: int, hidden_dims: Sequence[int], output_dim: int = 1,
                 dropout_rate: float = 0.2):
        self.input_dim = input_dim
        self.hidden_dims = list(hidden_dims)
        self.output_dim = output_dim
        self.dropout_rate = dropout_rate

    def init(self, key) -> List[dict]:
        dims = [self.input_dim, *self.hidden_dims, self.output_dim]
        keys = jax.random.split(key, len(dims) - 1)
        return [_linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]

    def apply(self, params: List[dict], x: jax.Array, *, train: bool = False,
              dropout_rng=None) -> jax.Array:
        for layer in params[:-1]:
            x = jax.nn.relu(x @ layer["w"] + layer["b"])
            if train and self.dropout_rate > 0.0:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout_rate, x.shape)
                x = jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)
        last = params[-1]
        return jax.nn.sigmoid(x @ last["w"] + last["b"])
