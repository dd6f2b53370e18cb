#!/usr/bin/env python
"""Convert HF or OpenAI checkpoints into native mcm_tpu parameter bundles.

Usage:
  python tools/convert_checkpoint.py --model clip --ckpt ViT-B/16 \
      --src /path/to/hf/clip-vit-base-patch16 --out checkpoints/
  python tools/convert_checkpoint.py --model clip --ckpt ViT-B/16 \
      --src /path/to/ViT-B-16.pt --out checkpoints/   # openai/CLIP format
  python tools/convert_checkpoint.py --model vit \
      --src /path/to/hf/vit-base-patch16-224 --out checkpoints/

Accepts an HF snapshot directory (model.safetensors or pytorch_model.bin)
or an original OpenAI CLIP ``.pt`` (TorchScript archive; format sniffed).
Outputs an .npz pytree bundle (or an orbax directory with --format orbax)
that loads without torch/safetensors installed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["clip", "vit"], required=True)
    p.add_argument("--ckpt", default="ViT-B/16",
                   choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"],
                   help="CLIP architecture (ignored for --model vit)")
    p.add_argument("--src", required=True, help="HF snapshot dir or file")
    p.add_argument("--out", default="checkpoints", help="output directory")
    p.add_argument("--format", default="npz", choices=["npz", "orbax"])
    args = p.parse_args()

    from mcm_tpu.config import CLIP_CONFIGS, SupervisedViTConfig
    from mcm_tpu.models.convert import (convert_clip_state_dict,
                                        load_state_dict, save_params,
                                        save_params_orbax)

    sd = load_state_dict(args.src)
    if args.model == "clip":
        cfg = CLIP_CONFIGS[args.ckpt]()
        # sniffs HF CLIPModel vs original OpenAI (ViT-*-*.pt) layouts
        params = convert_clip_state_dict(sd, cfg)
        stem = args.ckpt.replace("/", "-")
    else:
        from mcm_tpu.models.vit import convert_hf_vit
        params = convert_hf_vit(sd, SupervisedViTConfig(num_classes=1000))
        stem = "vit-base-patch16-224"

    os.makedirs(args.out, exist_ok=True)
    if args.format == "npz":
        path = os.path.join(args.out, f"{stem}.npz")
        save_params(params, path)
    else:
        path = os.path.join(args.out, stem)
        save_params_orbax(params, path)
    import jax
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {path} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
