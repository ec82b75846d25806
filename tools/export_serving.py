"""Export serving entry points as self-contained StableHLO artifacts.

``jax.export`` serializes the jitted inference functions — model code,
weights (baked as constants), and the exact compiled semantics — into
portable StableHLO bytes.  A serving fleet can then load and run the
artifacts WITHOUT this repo's Python model code (any jax runtime, or
anything else that executes StableHLO), and the artifact is immutable:
what was validated is what serves.  No reference counterpart (the
reference has no serving path — SURVEY.md §0).

Exports (what the checkpoint directory supports):
* ``embed_images``:  (B, H, W, 1) float32 -> (B, 768) — ResNet encoder,
  with the training-parity on-device max-normalization folded in.
* ``embed_texts``:   ids/mask/segments (B, L) int32 -> (B, 768) — BERT
  (needs pytorch_MI_text_model.bin + a bert config).
* ``classify``:      (B, H, W, 1) float32 -> (B,) probabilities
  (needs a per-disease classifier checkpoint; pass --disease).

Usage:
    python tools/export_serving.py --save_directory save_dir/mm_dv_epoch20 \
        --out exported/ --batch_size 64 --disease Pneumonia \
        [--platforms cpu,tpu]

Writes ``<out>/<name>.stablehlo`` plus ``<out>/manifest.json`` (shapes,
dtypes, batch size, platforms, jax export version).  Reload with
:func:`load_exported` (or ``jax.export.deserialize`` anywhere else).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_entry_points(save_directory: str, img_size: int, batch_size: int,
                        bert_pretrained_dir=None, disease=None,
                        classifier_layers=None, max_seq_length: int = 320,
                        output_channels: int = 1):
    """{name: (fn, [ShapeDtypeStruct inputs])} for everything the
    checkpoint dir supports.  Weights are loaded as numpy and closed
    over, so export bakes them into the artifact as constants."""
    import jax
    import jax.numpy as jnp

    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.models.mlp import BasicMLP
    from mimm_tpu.models.resnet import ResNet256_6_2_1
    from mimm_tpu.ops.image_norm import device_normalize

    S = jax.ShapeDtypeStruct
    entries = {}

    image_model = ResNet256_6_2_1(output_channels=output_channels)
    img_vars = ckpt.load_resnet_from_bin(
        os.path.join(save_directory, "pytorch_MI_image_model.bin"))

    def embed_images(images):
        return image_model.apply(img_vars, device_normalize(images),
                                 train=False)[1].astype(jnp.float32)

    img_spec = [S((batch_size, img_size, img_size, 1), jnp.float32)]
    entries["embed_images"] = (embed_images, img_spec)

    txt_path = os.path.join(save_directory, "pytorch_MI_text_model.bin")
    bert_config = None
    for d, name in ((bert_pretrained_dir, "bert_config.json"),
                    (bert_pretrained_dir, "config.json"),
                    (save_directory, "config.json")):
        if d and os.path.exists(os.path.join(d, name)):
            from mimm_tpu.models.bert import BertConfig
            bert_config = BertConfig.from_json_file(os.path.join(d, name))
            break
    if bert_config is not None and os.path.exists(txt_path):
        from mimm_tpu.models.bert import TextBert
        text_model = TextBert(bert_config)
        text_vars = ckpt.bert_variables_from_state_dict(
            ckpt.load_state_dict_bin(txt_path),
            bert_config.num_hidden_layers)

        def embed_texts(ids, masks, segments):
            pooled, _ = text_model.apply(text_vars, ids,
                                         token_type_ids=segments,
                                         attention_mask=masks)
            return pooled.astype(jnp.float32)

        tok_spec = [S((batch_size, max_seq_length), jnp.int32)] * 3
        entries["embed_texts"] = (embed_texts, tok_spec)

    if disease is not None:
        from mimm_tpu.validate import find_classifier_checkpoint
        if classifier_layers is None:
            from mimm_tpu.config import DEFAULT_CLASSIFIER_LAYERS
            classifier_layers = list(DEFAULT_CLASSIFIER_LAYERS)
        emb_dim = int(np.asarray(
            img_vars["params"]["fc1"]["kernel"]).shape[0])
        clf = BasicMLP(emb_dim, list(classifier_layers))
        clf_params = ckpt.mlp_params_from_state_dict(ckpt.load_state_dict_bin(
            find_classifier_checkpoint(save_directory, disease)))

        def classify(images):
            emb = embed_images(images)
            return clf.apply(clf_params, emb)[:, 0].astype(jnp.float32)

        entries["classify"] = (classify, img_spec)

    return entries


def export_artifacts(save_directory: str, out_dir: str, batch_size: int = 64,
                     img_size: int = 256, bert_pretrained_dir=None,
                     disease=None, classifier_layers=None,
                     max_seq_length: int = 320, platforms=None) -> dict:
    """Export every supported entry point; returns the manifest dict.

    ``platforms``: lowering targets (e.g. ``["cpu", "tpu"]``); None =
    the current default backend only.  The batch dim is fixed at
    ``batch_size`` (static shapes — callers pad like
    ``serve.InferenceSession`` does)."""
    import jax
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    entries = _build_entry_points(save_directory, img_size, batch_size,
                                  bert_pretrained_dir=bert_pretrained_dir,
                                  disease=disease,
                                  classifier_layers=classifier_layers,
                                  max_seq_length=max_seq_length)
    manifest = {"batch_size": batch_size,
                "platforms": list(platforms) if platforms else
                [jax.default_backend()],
                "entries": {}}
    for name, (fn, specs) in entries.items():
        exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        manifest["entries"][name] = {
            "file": os.path.basename(path),
            "inputs": [{"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}
                       for s in specs],
            "outputs": [{"shape": list(o.shape),
                         "dtype": str(np.dtype(o.dtype))}
                        for o in exp.out_avals],
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(out_dir: str, name: str):
    """Deserialize one artifact; returns a callable (its ``.call``)."""
    from jax import export as jexport
    with open(os.path.join(out_dir, f"{name}.stablehlo"), "rb") as f:
        return jexport.deserialize(f.read()).call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_directory", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--max_seq_length", type=int, default=320)
    p.add_argument("--disease", default=None)
    p.add_argument("--bert_pretrained_dir", default=None)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. cpu,tpu")
    args = p.parse_args()
    platforms = args.platforms.split(",") if args.platforms else None
    manifest = export_artifacts(
        args.save_directory, args.out, batch_size=args.batch_size,
        img_size=args.img_size, bert_pretrained_dir=args.bert_pretrained_dir,
        disease=args.disease, max_seq_length=args.max_seq_length,
        platforms=platforms)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
