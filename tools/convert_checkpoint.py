"""Offline native-checkpoint -> reference `.bin` converter.

Multi-host trainers skip the in-run `.bin` export (pod-sharded params are
not fully addressable on any single host — train/mi.py, train/ae.py,
train/classifier.py log a pointer here); this tool produces the
reference-named torch state-dict files from the native checkpoint
afterwards, on any single machine.  Works on both native formats
(versioned-pickle file or orbax directory — checkpoint.load_checkpoint
detects which).

Usage:
    python tools/convert_checkpoint.py --kind mi  --ckpt save/mi_epoch20.ckpt --out save/
    python tools/convert_checkpoint.py --kind ae  --ckpt save/ae_epoch20.ckpt --out save/ --epoch 20
    python tools/convert_checkpoint.py --kind classifier --ckpt save/classifier_X.ckpt --out save/ --label Pneumonia

For `--kind mi` the BERT layer count comes from the `config.json` the
trainer writes next to the joint checkpoint (or --num_hidden_layers).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=("mi", "ae", "classifier"))
    ap.add_argument("--ckpt", required=True, help="native .ckpt (file or dir)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch number for the reference file names; "
                         "default: parsed from the checkpoint name")
    ap.add_argument("--label", default=None,
                    help="classifier label for pytorch_image_classifier_<label>.bin")
    ap.add_argument("--num_hidden_layers", type=int, default=None,
                    help="override the BERT layer count (mi only)")
    args = ap.parse_args()

    # offline tool: pin the CPU backend IN-PROCESS (an env var can be too
    # late where sitecustomize pre-imports jax with an accelerator
    # platform) — conversion restores to host numpy and needs no device
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mimm_tpu import checkpoint as ckpt

    tree = ckpt.load_checkpoint(args.ckpt)
    os.makedirs(args.out, exist_ok=True)
    epoch = args.epoch
    if epoch is None:
        m = re.search(r"epoch(\d+)", os.path.basename(args.ckpt.rstrip("/")))
        epoch = int(m.group(1)) if m else 0
    written = []

    if args.kind == "mi":
        params, bstats = tree["params"], tree["batch_stats"]
        img_sd = ckpt.resnet_state_dict_from_variables(
            {"params": params["image_model"],
             "batch_stats": bstats.get("image_model", {})})
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, "pytorch_MI_image_model.bin"), img_sd))
        n_layers = args.num_hidden_layers
        if n_layers is None:
            import json
            cfg_path = os.path.join(os.path.dirname(args.ckpt.rstrip("/")),
                                    "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    n_layers = json.load(f).get("num_hidden_layers", 12)
            else:
                n_layers = 12
        txt_sd = ckpt.bert_state_dict_from_variables(
            {"params": params["text_model"]}, n_layers)
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, "pytorch_MI_text_model.bin"), txt_sd))
        joint = {f"image_model.{k}": v for k, v in img_sd.items()}
        joint.update({f"text_model.{k}": v for k, v in txt_sd.items()})
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, f"pytorch_model_epoch{epoch}.bin"), joint))
    elif args.kind == "ae":
        import jax
        variables = {"params": jax.device_get(tree["params"]),
                     "batch_stats": jax.device_get(tree["batch_stats"])}
        sd = ckpt.ae_state_dict_from_variables(variables)
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, f"autoencoder_path_{epoch}.bin"), sd))
        enc = {k[len("encoder."):]: v for k, v in sd.items()
               if k.startswith("encoder.")}
        dec = {k[len("decoder."):]: v for k, v in sd.items()
               if k.startswith("decoder.")}
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, f"encoder_{epoch}.bin"), enc))
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out, f"decoder_{epoch}.bin"), dec))
    else:  # classifier
        if not args.label:
            ap.error("--label is required for --kind classifier")
        sd = ckpt.mlp_state_dict_from_params(tree["params"])
        written.append(ckpt.save_state_dict_bin(
            os.path.join(args.out,
                         f"pytorch_image_classifier_{args.label}.bin"), sd))

    for path in written:
        print(path)


if __name__ == "__main__":
    main()
