#!/usr/bin/env python
"""Contrastively fine-tune CLIP on an ID training split.

Produces the ``.npz`` checkpoint the reference's ``CLIP-Linear``
configuration consumes (``utils/train_eval_util.py:24-25``; here:
``eval_ood_detection.py --model CLIP-Linear --finetune_ckpt <out>``).

Usage:
  python tools/finetune_clip.py --in_dataset pet37 --root-dir datasets \
      --epochs 3 --out finetuned_pet37.npz [--allow_random_weights]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_dataset", default="pet37", type=str,
                   choices=["ImageNet", "ImageNet10", "ImageNet20",
                            "ImageNet100", "pet37", "food101", "car196",
                            "bird200"])
    p.add_argument("--root-dir", default="datasets", type=str)
    p.add_argument("--CLIP_ckpt", default="ViT-B/16", type=str,
                   choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("--lr", default=1e-5, type=float)
    p.add_argument("--seed", default=5, type=int)
    p.add_argument("--subset", action="store_true")
    p.add_argument("--max_count", default=250, type=int)
    p.add_argument("--model_parallel", default=1, type=int)
    p.add_argument("--n_devices", default=None, type=int)
    p.add_argument("--num_workers", default=None, type=int)
    p.add_argument("--out", default=None, type=str)
    p.add_argument("--ckpt_dir", default=None, type=str)
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="continue from <out>.train_state.npz (optimizer "
                        "moments + epoch) if present — a preempted run "
                        "picks up exactly where it died")
    args = p.parse_args()

    import optax

    from mcm_tpu.config import CLIP_CONFIGS, Precision
    from mcm_tpu.data import get_test_labels, set_train_loader
    from mcm_tpu.parallel import make_mesh
    from mcm_tpu.runner import RunConfig, build_model_and_step
    from mcm_tpu.train import train_clip

    cfg = RunConfig(in_dataset=args.in_dataset, root_dir=args.root_dir,
                    clip_ckpt=args.CLIP_ckpt, seed=args.seed,
                    ckpt_dir=args.ckpt_dir,
                    allow_random_weights=args.allow_random_weights,
                    model_parallel=args.model_parallel,
                    n_devices=args.n_devices)
    params, tokenizer, _ = build_model_and_step(cfg)

    train_ds = set_train_loader(args.in_dataset, args.root_dir,
                                subset=args.subset, max_count=args.max_count)
    class_names = get_test_labels(args.in_dataset, train_ds)
    out = args.out or (f"finetuned_{args.in_dataset}_"
                       f"{args.CLIP_ckpt.replace('/', '-')}.npz")

    import jax
    import jax.numpy as jnp

    from mcm_tpu.data.labels import prompt_permutation

    train_clip(CLIP_CONFIGS[args.CLIP_ckpt](), train_ds, class_names,
               tokenizer, epochs=args.epochs, batch_size=args.batch_size,
               # CLIP recipe: weight decay on weight matrices only (the
               # make_train_step default does the same)
               seed=args.seed, optimizer=optax.adamw(
                   args.lr, mask=lambda p: jax.tree_util.tree_map(
                       lambda x: jnp.ndim(x) >= 2, p)),
               # ImageNet100 class names are NOT in label order — map
               # labels to prompt rows like the evaluator does
               label_permutation=prompt_permutation(args.in_dataset),
               precision=Precision.fast(),
               mesh=make_mesh(args.n_devices,
                              model_parallel=args.model_parallel),
               params=params, num_workers=args.num_workers, ckpt_path=out,
               resume=args.resume)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
