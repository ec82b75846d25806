"""FULL-STEP golden test against real torch for the AE path: ResNetAE
forward (encoder, multi-res skips, bottleneck, decoder, sigmoid), MSE
loss, and the single Adam update must produce the same per-step losses
as a torch replica of the reference UniModalManager step
(main_utils.py:610-703 + autoencoder_model.py) for 5 consecutive steps
with identical weights (exchanged through the repo's ae_* .bin
converters) and identical batches.

Float64 on both sides for the same reason as the MI golden
(test_reference_step_parity.py): it proves algorithmic equivalence
instead of negotiating a conv-accumulation-noise tolerance.  Torch runs
in a subprocess (jaxlib + torch oneDNN in one address space corrupts the
heap on this image).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.autoencoder import ResNetAE
from mimm_tpu.train.ae import AETrainState, make_ae_train_step
from mimm_tpu.train.optim import adam_torch

B = 3
IMG = 32
N_LEVELS = 3
N_RES = 1
Z_DIM = 16
BOTTLENECK = 32
STEPS = 5
LR = 1e-3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_torch_oracle(work_dir):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OMP_NUM_THREADS"] = "1"
    env["USE_TF"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "torch_reference.py"),
         work_dir],
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, \
        f"torch AE oracle failed (rc={proc.returncode}):\n{proc.stderr[-4000:]}"
    with np.load(os.path.join(work_dir, "out.npz")) as z:
        return z["losses"]


def test_full_ae_step_matches_torch_reference(tmp_path):
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    work = str(tmp_path)
    with jax.enable_x64(True):
        model = ResNetAE(input_shape=(IMG, IMG, 1), n_residual_blocks=N_RES,
                         n_levels=N_LEVELS, z_dim=Z_DIM,
                         bottleneck_dim=BOTTLENECK, use_multi_res_skips=True,
                         dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, IMG, IMG, 1)), train=False)
        up = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        params = up(jax.device_get(variables["params"]))
        bstats = up(jax.device_get(variables["batch_stats"]))

        sd = ckpt.ae_state_dict_from_variables(
            {"params": params, "batch_stats": bstats},
            n_levels=N_LEVELS, n_res=N_RES, z_dim=Z_DIM)

        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float64))

        np.savez(os.path.join(work, "ae_sd.npz"), **sd)
        np.savez(os.path.join(work, "batch.npz"),
                 image_nchw=np.transpose(np.asarray(image), (0, 3, 1, 2)))
        with open(os.path.join(work, "config.json"), "w") as f:
            json.dump({"mode": "ae", "input_shape": [IMG, IMG, 1],
                       "n_res": N_RES, "n_levels": N_LEVELS, "z_dim": Z_DIM,
                       "bottleneck_dim": BOTTLENECK, "init_lr": LR,
                       "steps": STEPS, "dtype": "float64"}, f)
        torch_losses = _run_torch_oracle(work)

        tx = adam_torch(LR)
        state = AETrainState(params, bstats, tx.init(params),
                             jnp.zeros([], jnp.int32))
        step = make_ae_train_step(model, tx)
        jax_losses = []
        for _ in range(STEPS):
            state, loss = step(state, image)
            jax_losses.append(float(loss))

    # f64 accumulation-order noise through ~24 conv/BN layers grows to
    # ~2e-8 relative by step 4; 1e-7 is still proof of equivalence
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-7,
                               atol=1e-10)
