"""Checkpointing: native pytree checkpoints + reference `.bin` interop.

Native format: a single checkpoint tree (params + batch_stats + optimizer
states + step + RNG + data-pipeline state) serialized as a *versioned
pickle envelope* of host numpy arrays ({"__mimm_ckpt__": version,
"tree": ...}) — the resume story the reference lacks (it saves per-epoch
``state_dict``s but never optimizer state; SURVEY.md §5 checkpoint/resume).
Loading accepts both the envelope and round-1 bare-tree files.

Interop: importers/exporters for the reference's PyTorch naming contracts
so parity runs can exchange weights (reference model.py:384-497,557-595;
main_utils.py:683-689):

* ``pytorch_MI_image_model.bin`` / joint ``pytorch_model_epoch<N>.bin`` —
  ResNet256_6_2_1 state dicts, including the gamma/beta -> weight/bias key
  migration and the ``image_model.`` prefix strip + fc drop when loading
  the image tower out of a joint checkpoint (reference model.py:426-455).
* ``pytorch_MI_text_model.bin`` — TextBert (pytorch_transformers-1.0.0
  BertModel layout).
* ``autoencoder_path_<N>.bin`` / ``encoder_<N>.bin`` / ``decoder_<N>.bin``
  — ResNetAE state dicts.
* ``pytorch_image_classifier_<label>.bin`` — Basic_MLP state dicts.

torch is used ONLY here (and in golden tests) for pickle-format (.bin)
compatibility; it never touches the compute path.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Native checkpoints
# ---------------------------------------------------------------------------

# Bump when the on-disk layout changes; load_checkpoint refuses newer
# versions instead of mis-parsing them.
CKPT_FORMAT_VERSION = 1


def save_checkpoint(path: str, tree: Any, format: str = "pickle") -> str:
    """Serialize a pytree (params/opt_state/step/...) to ``path``.

    ``format="pickle"`` (default): a versioned pickle envelope of host
    numpy arrays — one file, single-host.  ``format="orbax"``: an orbax
    directory checkpoint where EVERY process writes its own addressable
    shards — the only correct option for multi-host sharded state, since
    pickling would require gathering the full tree onto one host (which
    does not address all shards of a pod-sharded array).  Multi-process
    runs force orbax regardless of ``format``.  ``format="orbax_async"``:
    like orbax, but the save returns as soon as the on-device state has
    been snapshotted — shard writing overlaps subsequent training steps
    (call :func:`wait_for_async_saves` before reading the checkpoint or
    exiting; trainers do this at the end of ``train()``)."""
    path = os.path.abspath(path)
    if format.startswith("orbax") or jax.process_count() > 1:
        return _save_orbax(path, tree, wait=(format != "orbax_async"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host_tree = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
    # temp + atomic rename: a SIGKILL mid-write (e.g. the preemption grace
    # window expiring during the preempt save) must never leave a truncated
    # file at the final path — `--resume_from auto` gates on existence and
    # would otherwise crash-loop on the corrupt checkpoint every restart
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"__mimm_ckpt__": CKPT_FORMAT_VERSION, "tree": host_tree},
                    f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


_ASYNC_CKPTR = None  # persistent AsyncCheckpointer for orbax_async saves


def _save_orbax(path: str, tree: Any, wait: bool = True) -> str:
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    # force=True: orbax's own multi-process-safe overwrite (matches pickle
    # semantics for per-epoch re-saves / resume re-runs).  A manual rmtree
    # here would race across pod processes.  The save itself returns once
    # the state is snapshotted; shard writing continues in the background.
    _ASYNC_CKPTR.save(path, tree, force=True)
    if wait:
        _ASYNC_CKPTR.wait_until_finished()
    return path


def prune_checkpoints(save_dir: str, prefix: str, keep: int) -> list:
    """Retention for NATIVE resume trees: keep only the newest ``keep``
    ``<prefix><epoch>.ckpt`` entries (by epoch number) in ``save_dir``;
    returns the deleted paths.  ``keep <= 0`` keeps everything.  Handles
    both the pickle file and the orbax directory formats.  Preempt
    checkpoints (no epoch suffix) and the reference-named .bin exports
    are never touched — the .bins are the downstream on-disk contract."""
    import glob as _glob
    import re
    import shutil

    if keep <= 0:
        return []
    found = []
    for path in _glob.glob(os.path.join(save_dir, f"{prefix}*.ckpt")):
        m = re.fullmatch(re.escape(prefix) + r"(\d+)\.ckpt",
                         os.path.basename(path))
        if m:
            found.append((int(m.group(1)), path))
    deleted = []
    for _, path in sorted(found)[:-keep]:
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
        deleted.append(path)
    return deleted


def wait_for_async_saves() -> None:
    """Block until every in-flight ``orbax_async`` checkpoint write has
    committed.  Trainers call this at the end of ``train()``; call it
    manually before loading a just-written async checkpoint."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a checkpoint saved by ``save_checkpoint`` — format is detected
    (orbax checkpoints are directories, pickle envelopes are files).

    ``target`` (orbax only): a pytree of ``jax.ShapeDtypeStruct`` with
    shardings — arrays are then restored DIRECTLY onto their devices,
    each process reading only its shards (pod-correct resume).  Without
    ``target`` arrays restore as host numpy, like the pickle path."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        wait_for_async_saves()  # never read a checkpoint mid-write
        if target is not None:
            with ocp.StandardCheckpointer() as ckptr:
                return ckptr.restore(path, target)
        # no target: restore as host numpy, ignoring the SAVED shardings —
        # their device names need not exist in this process (offline
        # conversion, cross-host inspection)
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(path).item_metadata
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            return ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict) and "__mimm_ckpt__" in obj:
        version = obj["__mimm_ckpt__"]
        if version > CKPT_FORMAT_VERSION:
            raise ValueError(
                f"{path} is checkpoint format v{version}; this build reads "
                f"up to v{CKPT_FORMAT_VERSION}")
        return obj["tree"]
    return obj  # round-1 unversioned bare tree


# ---------------------------------------------------------------------------
# torch <-> numpy helpers
# ---------------------------------------------------------------------------

def _torch():
    import torch  # local import: interop only
    return torch


def load_state_dict_bin(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.bin`` (pickled torch state_dict) into numpy,
    applying the gamma/beta -> weight/bias migration (model.py:429-439)."""
    torch = _torch()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        k = k.replace("gamma", "weight").replace("beta", "bias")
        out[k] = v.detach().numpy()
    return out


def save_state_dict_bin(path: str, sd: Dict[str, np.ndarray]) -> str:
    torch = _torch()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
               path)
    return path


def strip_joint_prefix(sd: Dict[str, np.ndarray], tower: str = "image_model."
                       ) -> Dict[str, np.ndarray]:
    """Keep only ``<tower>*`` keys, dropping the tower's fc head — the
    reference's loading_from_joint behavior (model.py:446-455)."""
    out = {}
    for k, v in sd.items():
        if k.startswith(tower):
            sub = k[len(tower):]
            if tower == "image_model." and sub.startswith("fc"):
                continue
            out[sub] = v
    return out


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear (out,in) -> flax Dense (in,out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O,I,KH,KW) -> flax Conv NHWC (KH,KW,I,O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,KH,KW) -> flax ConvTranspose (KH,KW,I,O).

    torch's conv_transpose is the *gradient* of conv (spatially flipped
    kernel); flax's ConvTranspose(transpose_kernel=False) is a fractionally
    strided conv with an unflipped kernel, so the spatial dims must be
    reversed during conversion (validated in tests/test_models.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _conv_back(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _deconv_back(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))


def _flatten_perm(c: int, h: int, w: int) -> np.ndarray:
    """Index map between torch's NCHW flatten and flax's NHWC flatten:
    ``perm[i_nhwc] = i_nchw`` (i.e. flax_z == torch_z[perm]).  Linear layers
    that consume or produce a flattened conv feature map must be re-wired
    with this during .bin import/export, or cross-framework weight exchange
    silently permutes the embedding (caught by the torch full-forward
    golden, tests/test_reference_step_parity.py)."""
    return np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)


def _linear_in_perm(w_torch: np.ndarray, c: int) -> np.ndarray:
    """torch Linear weight (out, in) whose INPUT is a flattened (C,H,W)
    feature map -> flax Dense kernel (in, out) for an (H,W,C) flatten."""
    n = w_torch.shape[1]
    hw = n // c
    h = int(round(hw ** 0.5))
    if c * h * h != n:
        return _t(w_torch)  # non-square geometry: leave unpermuted
    return _t(w_torch[:, _flatten_perm(c, h, h)])


def _linear_in_perm_back(kernel: np.ndarray, c: int) -> np.ndarray:
    n = kernel.shape[0]
    hw = n // c
    h = int(round(hw ** 0.5))
    wt = _t(kernel)
    if c * h * h != n:
        return wt
    out = np.empty_like(wt)
    out[:, _flatten_perm(c, h, h)] = wt
    return out


def _linear_out_perm(w_torch: np.ndarray, c: int) -> np.ndarray:
    """torch Linear weight (out, in) whose OUTPUT is reshaped to a (C,H,W)
    feature map -> flax Dense kernel (in, out) for an (H,W,C) reshape."""
    m = w_torch.shape[0]
    h = int(round((m // c) ** 0.5))
    if c * h * h != m:
        return _t(w_torch)
    return _t(w_torch[_flatten_perm(c, h, h), :])


def _linear_out_perm_back(kernel: np.ndarray, c: int) -> np.ndarray:
    m = kernel.shape[1]
    h = int(round((m // c) ** 0.5))
    wt = _t(kernel)
    if c * h * h != m:
        return wt
    out = np.empty_like(wt)
    out[_flatten_perm(c, h, h), :] = wt
    return out


def _vec_perm(b: np.ndarray, c: int) -> np.ndarray:
    m = b.shape[0]
    h = int(round((m // c) ** 0.5))
    if c * h * h != m:
        return b
    return b[_flatten_perm(c, h, h)]


def _vec_perm_back(b: np.ndarray, c: int) -> np.ndarray:
    m = b.shape[0]
    h = int(round((m // c) ** 0.5))
    if c * h * h != m:
        return b
    out = np.empty_like(b)
    out[_flatten_perm(c, h, h)] = b
    return out


def _put(tree: dict, path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# ResNet256_6_2_1
# ---------------------------------------------------------------------------

def _resnet_bn(variables: dict, flax_name: List[str], sd: Dict[str, np.ndarray],
               torch_prefix: str) -> None:
    _put(variables["params"], flax_name + ["scale"], sd[f"{torch_prefix}.weight"])
    _put(variables["params"], flax_name + ["bias"], sd[f"{torch_prefix}.bias"])
    _put(variables["batch_stats"], flax_name + ["mean"], sd[f"{torch_prefix}.running_mean"])
    _put(variables["batch_stats"], flax_name + ["var"], sd[f"{torch_prefix}.running_var"])


def resnet_variables_from_state_dict(sd: Dict[str, np.ndarray],
                                     blocks_per_layer=(2, 2, 2, 2, 2, 2),
                                     with_fc: bool = True) -> dict:
    """Reference ResNet state dict -> flax variables {'params', 'batch_stats'}."""
    v = {"params": {}, "batch_stats": {}}
    _put(v["params"], ["conv1", "kernel"], _conv(sd["conv1.weight"]))
    _resnet_bn(v, ["bn1"], sd, "bn1")
    for li, blocks in enumerate(blocks_per_layer):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            fp = f"layer{li + 1}_block{bi}"
            _put(v["params"], [fp, "conv1", "kernel"], _conv(sd[f"{tp}.conv1.weight"]))
            _put(v["params"], [fp, "conv2", "kernel"], _conv(sd[f"{tp}.conv2.weight"]))
            _resnet_bn(v, [fp, "bn1"], sd, f"{tp}.bn1")
            _resnet_bn(v, [fp, "bn2"], sd, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                _put(v["params"], [fp, "downsample_conv", "kernel"],
                     _conv(sd[f"{tp}.downsample.0.weight"]))
                _resnet_bn(v, [fp, "downsample_bn"], sd, f"{tp}.downsample.1")
    if with_fc and "fc1.weight" in sd:
        # fc1 consumes the flattened 2x2x192 avgpool map: torch flattens
        # NCHW, flax NHWC — re-wire the input rows (192 = planes[-1])
        _put(v["params"], ["fc1", "kernel"],
             _linear_in_perm(sd["fc1.weight"], c=192))
        _put(v["params"], ["fc1", "bias"], sd["fc1.bias"])
    return v


def resnet_state_dict_from_variables(variables: dict,
                                     blocks_per_layer=(2, 2, 2, 2, 2, 2)
                                     ) -> Dict[str, np.ndarray]:
    """flax variables -> reference-keyed state dict (for pytorch_MI_image_model.bin)."""
    p, bs = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def bn(tp, fnode, snode):
        sd[f"{tp}.weight"] = np.asarray(fnode["scale"])
        sd[f"{tp}.bias"] = np.asarray(fnode["bias"])
        sd[f"{tp}.running_mean"] = np.asarray(snode["mean"])
        sd[f"{tp}.running_var"] = np.asarray(snode["var"])
        sd[f"{tp}.num_batches_tracked"] = np.asarray(0, np.int64)

    sd["conv1.weight"] = _conv_back(np.asarray(p["conv1"]["kernel"]))
    bn("bn1", p["bn1"], bs["bn1"])
    for li, blocks in enumerate(blocks_per_layer):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            fp = f"layer{li + 1}_block{bi}"
            sd[f"{tp}.conv1.weight"] = _conv_back(np.asarray(p[fp]["conv1"]["kernel"]))
            sd[f"{tp}.conv2.weight"] = _conv_back(np.asarray(p[fp]["conv2"]["kernel"]))
            bn(f"{tp}.bn1", p[fp]["bn1"], bs[fp]["bn1"])
            bn(f"{tp}.bn2", p[fp]["bn2"], bs[fp]["bn2"])
            if "downsample_conv" in p[fp]:
                sd[f"{tp}.downsample.0.weight"] = _conv_back(
                    np.asarray(p[fp]["downsample_conv"]["kernel"]))
                bn(f"{tp}.downsample.1", p[fp]["downsample_bn"], bs[fp]["downsample_bn"])
    if "fc1" in p:
        sd["fc1.weight"] = _linear_in_perm_back(np.asarray(p["fc1"]["kernel"]),
                                                c=192)
        sd["fc1.bias"] = np.asarray(p["fc1"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# TextBert (pytorch_transformers 1.0.0 BertModel layout)
# ---------------------------------------------------------------------------

def bert_variables_from_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """pytorch_transformers BERT state dict -> flax TextBert variables.
    Accepts both bare BertModel checkpoints (``bert_pretrain_*/pytorch_model.bin``,
    with or without a 'bert.' key prefix) and TextBert checkpoints."""
    # normalize prefix: TextBert saves 'bert.*' + 'classifier.*'
    if not any(k.startswith("bert.") for k in sd):
        sd = {("bert." + k if not k.startswith(("classifier.",)) else k): v
              for k, v in sd.items()}
    p: dict = {"bert": {}}

    def put(path, val):
        _put(p, path, val)

    emb = "bert.embeddings"
    put(["bert", "word_embeddings", "embedding"], sd[f"{emb}.word_embeddings.weight"])
    put(["bert", "position_embeddings", "embedding"], sd[f"{emb}.position_embeddings.weight"])
    put(["bert", "token_type_embeddings", "embedding"], sd[f"{emb}.token_type_embeddings.weight"])
    put(["bert", "embeddings_layernorm", "scale"], sd[f"{emb}.LayerNorm.weight"])
    put(["bert", "embeddings_layernorm", "bias"], sd[f"{emb}.LayerNorm.bias"])

    for i in range(num_layers):
        tp = f"bert.encoder.layer.{i}"
        fp = ["bert", f"layer{i}"]
        for name in ("query", "key", "value"):
            put(fp + ["attention", name, "kernel"], _t(sd[f"{tp}.attention.self.{name}.weight"]))
            put(fp + ["attention", name, "bias"], sd[f"{tp}.attention.self.{name}.bias"])
        put(fp + ["attention_output", "kernel"], _t(sd[f"{tp}.attention.output.dense.weight"]))
        put(fp + ["attention_output", "bias"], sd[f"{tp}.attention.output.dense.bias"])
        put(fp + ["attention_layernorm", "scale"], sd[f"{tp}.attention.output.LayerNorm.weight"])
        put(fp + ["attention_layernorm", "bias"], sd[f"{tp}.attention.output.LayerNorm.bias"])
        put(fp + ["intermediate", "kernel"], _t(sd[f"{tp}.intermediate.dense.weight"]))
        put(fp + ["intermediate", "bias"], sd[f"{tp}.intermediate.dense.bias"])
        put(fp + ["output", "kernel"], _t(sd[f"{tp}.output.dense.weight"]))
        put(fp + ["output", "bias"], sd[f"{tp}.output.dense.bias"])
        put(fp + ["output_layernorm", "scale"], sd[f"{tp}.output.LayerNorm.weight"])
        put(fp + ["output_layernorm", "bias"], sd[f"{tp}.output.LayerNorm.bias"])

    put(["bert", "pooler", "kernel"], _t(sd["bert.pooler.dense.weight"]))
    put(["bert", "pooler", "bias"], sd["bert.pooler.dense.bias"])
    if "classifier.weight" in sd:
        put(["classifier", "kernel"], _t(sd["classifier.weight"]))
        put(["classifier", "bias"], sd["classifier.bias"])
    return {"params": p}


def bert_state_dict_from_variables(variables: dict, num_layers: int
                                   ) -> Dict[str, np.ndarray]:
    p = variables["params"]["bert"]
    sd: Dict[str, np.ndarray] = {}
    emb = "bert.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = np.asarray(p["word_embeddings"]["embedding"])
    sd[f"{emb}.position_embeddings.weight"] = np.asarray(p["position_embeddings"]["embedding"])
    sd[f"{emb}.token_type_embeddings.weight"] = np.asarray(p["token_type_embeddings"]["embedding"])
    sd[f"{emb}.LayerNorm.weight"] = np.asarray(p["embeddings_layernorm"]["scale"])
    sd[f"{emb}.LayerNorm.bias"] = np.asarray(p["embeddings_layernorm"]["bias"])
    for i in range(num_layers):
        tp = f"bert.encoder.layer.{i}"
        fp = p[f"layer{i}"]
        for name in ("query", "key", "value"):
            sd[f"{tp}.attention.self.{name}.weight"] = _t(np.asarray(fp["attention"][name]["kernel"]))
            sd[f"{tp}.attention.self.{name}.bias"] = np.asarray(fp["attention"][name]["bias"])
        sd[f"{tp}.attention.output.dense.weight"] = _t(np.asarray(fp["attention_output"]["kernel"]))
        sd[f"{tp}.attention.output.dense.bias"] = np.asarray(fp["attention_output"]["bias"])
        sd[f"{tp}.attention.output.LayerNorm.weight"] = np.asarray(fp["attention_layernorm"]["scale"])
        sd[f"{tp}.attention.output.LayerNorm.bias"] = np.asarray(fp["attention_layernorm"]["bias"])
        sd[f"{tp}.intermediate.dense.weight"] = _t(np.asarray(fp["intermediate"]["kernel"]))
        sd[f"{tp}.intermediate.dense.bias"] = np.asarray(fp["intermediate"]["bias"])
        sd[f"{tp}.output.dense.weight"] = _t(np.asarray(fp["output"]["kernel"]))
        sd[f"{tp}.output.dense.bias"] = np.asarray(fp["output"]["bias"])
        sd[f"{tp}.output.LayerNorm.weight"] = np.asarray(fp["output_layernorm"]["scale"])
        sd[f"{tp}.output.LayerNorm.bias"] = np.asarray(fp["output_layernorm"]["bias"])
    sd["bert.pooler.dense.weight"] = _t(np.asarray(p["pooler"]["kernel"]))
    sd["bert.pooler.dense.bias"] = np.asarray(p["pooler"]["bias"])
    cls = variables["params"].get("classifier")
    if cls is not None:
        sd["classifier.weight"] = _t(np.asarray(cls["kernel"]))
        sd["classifier.bias"] = np.asarray(cls["bias"])
    return sd


# ---------------------------------------------------------------------------
# Basic_MLP / MI discriminator
# ---------------------------------------------------------------------------

def mlp_params_from_state_dict(sd: Dict[str, np.ndarray]) -> List[dict]:
    """Basic_MLP ('layers.N.weight') or make_mlp nn.Sequential ('N.weight')
    state dict -> list-of-{'w','b'} params."""
    idx = sorted({int(k.split(".")[-2]) for k in sd if k.endswith(".weight")})
    prefix = "layers." if any(k.startswith("layers.") for k in sd) else ""
    return [{"w": _t(sd[f"{prefix}{i}.weight"]), "b": sd[f"{prefix}{i}.bias"]} for i in idx]


def mlp_state_dict_from_params(params: List[dict], sequential: bool = False,
                               ) -> Dict[str, np.ndarray]:
    """list-of-{'w','b'} -> reference state dict.  ``sequential=True`` uses
    make_mlp's nn.Sequential indices (0,2,4,... with ReLUs between);
    otherwise Basic_MLP's ``layers.N`` ModuleList indices."""
    sd = {}
    for i, layer in enumerate(params):
        key = f"{2 * i}" if sequential else f"layers.{i}"
        sd[f"{key}.weight"] = _t(np.asarray(layer["w"]))
        sd[f"{key}.bias"] = np.asarray(layer["b"])
    return sd


# ---------------------------------------------------------------------------
# ResNetAE
# ---------------------------------------------------------------------------

def _seq_bn(v, flax_path, sd, tp):
    _put(v["params"], flax_path + ["scale"], sd[f"{tp}.weight"])
    _put(v["params"], flax_path + ["bias"], sd[f"{tp}.bias"])
    _put(v["batch_stats"], flax_path + ["mean"], sd[f"{tp}.running_mean"])
    _put(v["batch_stats"], flax_path + ["var"], sd[f"{tp}.running_var"])


def ae_variables_from_state_dict(sd: Dict[str, np.ndarray], n_levels: int = 6,
                                 n_res: int = 2, z_dim: int = 192) -> dict:
    """Reference ResNetAE state dict -> flax ResNetAE variables."""
    v = {"params": {"encoder": {}, "decoder": {}}, "batch_stats": {"encoder": {}, "decoder": {}}}

    def conv(tower, flax_path, tp, transpose=False):
        w = sd[f"{tp}.weight"]
        _put(v["params"], [tower] + flax_path + ["kernel"], _deconv(w) if transpose else _conv(w))
        if f"{tp}.bias" in sd:
            _put(v["params"], [tower] + flax_path + ["bias"], sd[f"{tp}.bias"])

    def bn(tower, flax_path, tp):
        _put(v["params"], [tower] + flax_path + ["scale"], sd[f"{tp}.weight"])
        _put(v["params"], [tower] + flax_path + ["bias"], sd[f"{tp}.bias"])
        _put(v["batch_stats"], [tower] + flax_path + ["mean"], sd[f"{tp}.running_mean"])
        _put(v["batch_stats"], [tower] + flax_path + ["var"], sd[f"{tp}.running_var"])

    def res_block(tower, fp, tp):
        conv(tower, [fp, "conv1"], f"{tp}.residual_block.0")
        bn(tower, [fp, "bn1"], f"{tp}.residual_block.1")
        conv(tower, [fp, "conv2"], f"{tp}.residual_block.3")
        bn(tower, [fp, "bn2"], f"{tp}.residual_block.4")

    # encoder
    conv("encoder", ["input_conv"], "encoder.input_conv.0")
    bn("encoder", ["input_bn"], "encoder.input_conv.1")
    for i in range(n_levels):
        for b in range(n_res):
            res_block("encoder", f"level{i}_res{b}", f"encoder.res_blk_list.{i}.{b}")
        conv("encoder", [f"down{i}_conv"], f"encoder.conv_list.{i}.0")
        bn("encoder", [f"down{i}_bn"], f"encoder.conv_list.{i}.1")
        if f"encoder.multi_res_skip_list.{i}.0.weight" in sd:
            conv("encoder", [f"skip{i}_conv"], f"encoder.multi_res_skip_list.{i}.0")
            bn("encoder", [f"skip{i}_bn"], f"encoder.multi_res_skip_list.{i}.1")
    conv("encoder", ["output_conv"], "encoder.output_conv")

    # decoder
    conv("decoder", ["input_conv"], "decoder.input_conv.0")
    bn("decoder", ["input_bn"], "decoder.input_conv.1")
    for i in range(n_levels):
        conv("decoder", [f"up{i}_conv"], f"decoder.conv_list.{i}.0", transpose=True)
        bn("decoder", [f"up{i}_bn"], f"decoder.conv_list.{i}.1")
        for b in range(n_res):
            res_block("decoder", f"level{i}_res{b}", f"decoder.res_blk_list.{i}.{b}")
        if f"decoder.multi_res_skip_list.{i}.0.weight" in sd:
            conv("decoder", [f"skip{i}_conv"], f"decoder.multi_res_skip_list.{i}.0",
                 transpose=True)
            bn("decoder", [f"skip{i}_bn"], f"decoder.multi_res_skip_list.{i}.1")
    conv("decoder", ["output_conv"], "decoder.output_conv")

    # fc1 consumes / fc2 produces the flattened (z_dim, lat, lat) map:
    # re-wire for the NCHW (torch) vs NHWC (flax) flatten order
    _put(v["params"], ["fc1", "kernel"], _linear_in_perm(sd["fc1.weight"],
                                                         c=z_dim))
    _put(v["params"], ["fc1", "bias"], sd["fc1.bias"])
    _put(v["params"], ["fc2", "kernel"], _linear_out_perm(sd["fc2.weight"],
                                                          c=z_dim))
    _put(v["params"], ["fc2", "bias"], _vec_perm(sd["fc2.bias"], c=z_dim))
    return v


def ae_state_dict_from_variables(variables: dict, n_levels: int = 6,
                                 n_res: int = 2, z_dim: int = 192
                                 ) -> Dict[str, np.ndarray]:
    """flax ResNetAE variables -> reference-keyed state dict
    (inverse of ae_variables_from_state_dict; naming contracts
    main_utils.py:683-689)."""
    p, bs = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def conv(tower, flax_path, tp, transpose=False):
        node = p[tower]
        for k in flax_path:
            node = node[k]
        w = np.asarray(node["kernel"])
        sd[f"{tp}.weight"] = _deconv_back(w) if transpose else _conv_back(w)
        if "bias" in node:
            sd[f"{tp}.bias"] = np.asarray(node["bias"])

    def bn(tower, flax_path, tp):
        pn, sn = p[tower], bs[tower]
        for k in flax_path:
            pn, sn = pn[k], sn[k]
        sd[f"{tp}.weight"] = np.asarray(pn["scale"])
        sd[f"{tp}.bias"] = np.asarray(pn["bias"])
        sd[f"{tp}.running_mean"] = np.asarray(sn["mean"])
        sd[f"{tp}.running_var"] = np.asarray(sn["var"])
        sd[f"{tp}.num_batches_tracked"] = np.asarray(0, np.int64)

    def res_block(tower, fp, tp):
        conv(tower, [fp, "conv1"], f"{tp}.residual_block.0")
        bn(tower, [fp, "bn1"], f"{tp}.residual_block.1")
        conv(tower, [fp, "conv2"], f"{tp}.residual_block.3")
        bn(tower, [fp, "bn2"], f"{tp}.residual_block.4")

    conv("encoder", ["input_conv"], "encoder.input_conv.0")
    bn("encoder", ["input_bn"], "encoder.input_conv.1")
    for i in range(n_levels):
        for b in range(n_res):
            res_block("encoder", f"level{i}_res{b}", f"encoder.res_blk_list.{i}.{b}")
        conv("encoder", [f"down{i}_conv"], f"encoder.conv_list.{i}.0")
        bn("encoder", [f"down{i}_bn"], f"encoder.conv_list.{i}.1")
        if f"skip{i}_conv" in p["encoder"]:
            conv("encoder", [f"skip{i}_conv"], f"encoder.multi_res_skip_list.{i}.0")
            bn("encoder", [f"skip{i}_bn"], f"encoder.multi_res_skip_list.{i}.1")
    conv("encoder", ["output_conv"], "encoder.output_conv")

    conv("decoder", ["input_conv"], "decoder.input_conv.0")
    bn("decoder", ["input_bn"], "decoder.input_conv.1")
    for i in range(n_levels):
        conv("decoder", [f"up{i}_conv"], f"decoder.conv_list.{i}.0", transpose=True)
        bn("decoder", [f"up{i}_bn"], f"decoder.conv_list.{i}.1")
        for b in range(n_res):
            res_block("decoder", f"level{i}_res{b}", f"decoder.res_blk_list.{i}.{b}")
        if f"skip{i}_conv" in p["decoder"]:
            conv("decoder", [f"skip{i}_conv"], f"decoder.multi_res_skip_list.{i}.0",
                 transpose=True)
            bn("decoder", [f"skip{i}_bn"], f"decoder.multi_res_skip_list.{i}.1")
    conv("decoder", ["output_conv"], "decoder.output_conv")

    sd["fc1.weight"] = _linear_in_perm_back(np.asarray(p["fc1"]["kernel"]),
                                            c=z_dim)
    sd["fc1.bias"] = np.asarray(p["fc1"]["bias"])
    sd["fc2.weight"] = _linear_out_perm_back(np.asarray(p["fc2"]["kernel"]),
                                             c=z_dim)
    sd["fc2.bias"] = _vec_perm_back(np.asarray(p["fc2"]["bias"]), c=z_dim)
    return sd


# ---------------------------------------------------------------------------
# High-level loaders matching reference entry-point behavior
# ---------------------------------------------------------------------------

def load_resnet_from_bin(path: str, loading_from_joint: bool = False) -> dict:
    """Reference build_resnet_model(checkpoint_path=...) equivalent
    (model.py:408-497): read .bin, migrate keys, optionally strip the
    image_model. prefix, return flax variables."""
    sd = load_state_dict_bin(path)
    if loading_from_joint:
        sd = strip_joint_prefix(sd, "image_model.")
    return resnet_variables_from_state_dict(sd, with_fc="fc1.weight" in sd)


def load_bert_pytorch_bin(bert_pretrained_dir: str, num_layers: int,
                          filename: str = "pytorch_model.bin") -> Optional[dict]:
    """Load pytorch_transformers-format BERT weights if present, else None
    (the reference requires this dir at runtime but does not ship it)."""
    path = os.path.join(bert_pretrained_dir, filename)
    if not os.path.exists(path):
        return None
    sd = load_state_dict_bin(path)
    return bert_variables_from_state_dict(sd, num_layers)
