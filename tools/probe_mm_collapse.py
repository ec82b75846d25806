"""Root-cause probe for MM-classifier constant-predictor collapses in the
fixture sweep (ROUND5.md "MM vs UM"): compare the frozen-encoder
embedding geometry of the MM (MI-pretrained) and UM (AE-pretrained)
arms for a sweep seed, plus the trained classifier's output saturation.

A classifier parks at the majority class when its inputs can't move the
decision: this prints per-arm embedding scale (mean L2 norm), feature
spread (per-dim std averaged), pairwise cosine similarity (how
collapsed the embedding cloud is toward one direction), and the trained
MLP's sigmoid output range over the dataset.

Usage: python tools/probe_mm_collapse.py --workdir /tmp/e2e_seed1
           [--disease Pneumonia] [--platform cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/full_data_set"


def stats(emb):
    import numpy as np
    emb = np.asarray(emb, np.float64)
    n = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    cos = n @ n.T
    iu = np.triu_indices(len(emb), 1)
    return {
        "mean_l2_norm": float(np.mean(np.linalg.norm(emb, axis=1))),
        "mean_feature_std": float(np.mean(emb.std(axis=0))),
        "mean_pairwise_cos": float(np.mean(cos[iu])),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/e2e_seed1")
    ap.add_argument("--disease", default="Pneumonia")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--ae_epoch", type=int, default=20)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.data.pipeline import CXRImageDiseaseDataset, Loader
    from mimm_tpu.models.autoencoder import ResNetAE
    from mimm_tpu.models.mlp import BasicMLP
    from mimm_tpu.models.resnet import ResNet256_6_2_1
    from mimm_tpu.train.ae import build_ae_model
    from mimm_tpu.train.classifier import make_embedding_fn
    from mimm_tpu.validate import find_classifier_checkpoint

    wd = args.workdir
    cfg = TrainingConfig().replace(
        image_dir=REF + "/images/",
        dataset_metadata=wd + "/training_data/training_label_negbio.csv",
        dataset_disease_stats=wd + "/training_data/disease_stats.csv",
        batch_size=8)
    ds = CXRImageDiseaseDataset(
        img_dir=cfg.image_dir, dataset_metadata=cfg.dataset_metadata,
        disease=args.disease, disease_stats=cfg.dataset_disease_stats,
        img_size=cfg.img_size)
    loader = Loader(ds, batch_size=8, seed=0, train=False, drop_last=False)

    model = ResNet256_6_2_1(output_channels=1)
    mm_vars = ckpt.load_resnet_from_bin(
        os.path.join(wd, "save", "pytorch_MI_image_model.bin"))
    mm_embed = make_embedding_fn("multimodal", model, mm_vars)

    ae_model = build_ae_model(cfg)
    ae_vars = ckpt.ae_variables_from_state_dict(ckpt.load_state_dict_bin(
        os.path.join(wd, "save_um", f"autoencoder_path_{args.ae_epoch}.bin")))
    um_embed = make_embedding_fn("unimodal", ae_model, ae_vars)

    out = {"workdir": wd, "disease": args.disease, "n": len(ds)}
    for arm, embed, save_dir in (("mm", mm_embed, wd + "/save"),
                                 ("um", um_embed, wd + "/save_um")):
        embs, labels = [], []
        for batch in loader.epoch(0):
            embs.append(np.asarray(embed(batch["image"])))
            labels.append(np.asarray(batch["label"]))
        emb = np.concatenate(embs)
        out[arm] = stats(emb)
        # the trained classifier's sigmoid outputs over the same data
        clf = BasicMLP(emb.shape[1], [256, 64])
        path = find_classifier_checkpoint(save_dir, args.disease)
        params = ckpt.mlp_params_from_state_dict(ckpt.load_state_dict_bin(path))
        p = np.asarray(clf.apply(params, emb)[:, 0])
        out[arm]["clf_ckpt"] = os.path.basename(path)
        out[arm]["sigmoid_min"] = float(p.min())
        out[arm]["sigmoid_max"] = float(p.max())
        out[arm]["pred_pos_frac"] = float(np.mean(np.round(p)))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
