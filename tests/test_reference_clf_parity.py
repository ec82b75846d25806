"""FULL-STEP golden test against real torch for the downstream
classifier: Basic_MLP forward (sigmoid head), BCE loss, and the
optimizer update under ExponentialLR(0.9)-per-epoch must produce the
same per-step losses as a torch replica of the reference
ClassifierModelManager step (main_utils.py:318-426) — for BOTH
optimizer choices the reference sweeps (Adam and
SGD(wd=1e-8, momentum=9e-4, nesterov)).

The frozen encoder is represented by fixed precomputed embeddings: the
encoders have their own full-step goldens (test_reference_step_parity,
test_reference_ae_parity), and the reference's encoder contributes no
gradients here (it is frozen by having no optimizer).  Dropout off,
float64 both sides; weights exchanged through the repo's
mlp_state_dict converters; torch runs in a subprocess (jaxlib + torch
oneDNN in one address space corrupts the heap on this image).

Six steps with steps_per_epoch=2 cross two epoch boundaries, so the
exponential schedule's per-epoch stepping is exercised, not just its
initial value.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.train.classifier import ClassifierTrainState, make_classifier_step
from mimm_tpu.train.optim import (adam_torch, exponential_epoch_schedule,
                                  sgd_torch)

B = 16
DIM = 32
HIDDEN = [24, 12]
STEPS = 6
STEPS_PER_EPOCH = 2
LR = 1e-2
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_torch_oracle(work_dir):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OMP_NUM_THREADS"] = "1"
    env["USE_TF"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "torch_reference.py"),
         work_dir],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, \
        f"torch clf oracle failed (rc={proc.returncode}):\n{proc.stderr[-4000:]}"
    with np.load(os.path.join(work_dir, "out.npz")) as z:
        return z["losses"]


@pytest.mark.parametrize("optimizer", ["Adam", "SGD"])
def test_full_classifier_step_matches_torch_reference(tmp_path, optimizer):
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    work = str(tmp_path / optimizer)
    os.makedirs(work)
    with jax.enable_x64(True):
        mlp = BasicMLP(DIM, HIDDEN, dropout_rate=0.0)
        params = jax.tree.map(lambda x: x.astype(jnp.float64),
                              mlp.init(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(1)
        emb = jnp.asarray(rng.standard_normal((B, DIM)))
        labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float64))

        np.savez(os.path.join(work, "clf_sd.npz"),
                 **ckpt.mlp_state_dict_from_params(jax.device_get(params)))
        np.savez(os.path.join(work, "batch.npz"), emb=np.asarray(emb),
                 labels=np.asarray(labels))
        with open(os.path.join(work, "config.json"), "w") as f:
            json.dump({"mode": "clf", "input_dim": DIM, "hidden_dims": HIDDEN,
                       "optimizer": optimizer, "init_lr": LR, "steps": STEPS,
                       "steps_per_epoch": STEPS_PER_EPOCH,
                       "dtype": "float64"}, f)
        torch_losses = _run_torch_oracle(work)

        sched = exponential_epoch_schedule(LR, 0.9, STEPS_PER_EPOCH)
        tx = adam_torch(sched) if optimizer == "Adam" else sgd_torch(sched)
        state = ClassifierTrainState(params, tx.init(params),
                                     jnp.zeros([], jnp.int32))
        step_fn = make_classifier_step(mlp, tx, seed=0)
        jax_losses = []
        for _ in range(STEPS):
            state, loss = step_fn(state, emb, labels)
            jax_losses.append(float(loss))

    # Adam needs the looser bound: optax computes sqrt(v/bc2) where torch
    # computes sqrt(v)/sqrt(bc2) — algebraically identical, and the ~1e-8
    # relative residue (amplified through +eps with tiny early v) is the
    # only difference; SGD matches to <1e-9.
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-7, atol=1e-10)
