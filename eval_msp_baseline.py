#!/usr/bin/env python
"""Supervised-ViT MSP baseline evaluation.

The pure-visual baseline MCM is compared against (reference README's
google/vit-base-patch16-224 + MSP configuration; logits path as in
``utils/detection_util.py:124-133``).  Shares the data/metrics/reporting
stack with ``eval_ood_detection.py``; the model is the supervised ViT
classifier from :mod:`mcm_tpu.models.vit`.

Weights: place an HF ``ViTForImageClassification`` snapshot (e.g.
google/vit-base-patch16-224) under ``--ckpt_dir``; converted bundles are
cached as npz.  ``--allow_random_weights`` smoke-runs without weights.
"""

import argparse
import os

import numpy as np


def process_args():
    p = argparse.ArgumentParser(
        description="MSP baseline (supervised ViT) OOD evaluation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--in_dataset", default="ImageNet", type=str,
                   choices=["ImageNet", "ImageNet10", "ImageNet20",
                            "ImageNet100", "pet37", "food101", "car196",
                            "bird200"])
    p.add_argument("--root-dir", default="datasets", type=str)
    p.add_argument("--name", default="eval_msp", type=str)
    p.add_argument("--seed", default=5, type=int)
    p.add_argument("-b", "--batch-size", default=512, type=int)
    p.add_argument("--T", type=float, default=1.0)
    p.add_argument("--score", default="MCM", type=str,
                   choices=["MCM", "energy", "max-logit", "entropy", "var"],
                   help="MCM == max-softmax (MSP) over classifier logits")
    p.add_argument("--ckpt_dir", default=None, type=str)
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--out_datasets", default=None, type=str, nargs="+")
    p.add_argument("--num_workers", default=None, type=int)
    return p.parse_args()


def main():
    args = process_args()
    import jax
    import jax.numpy as jnp

    from mcm_tpu.config import Precision, SupervisedViTConfig
    from mcm_tpu.data import (DataPipeline, collect_scores,
                              default_out_datasets, get_num_cls,
                              set_ood_loader, set_val_loader)
    from mcm_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                         normalize_on_device)
    from mcm_tpu.metrics import get_measures, print_measures
    from mcm_tpu.models import vit as jvit
    from mcm_tpu.models.init import init_supervised_vit
    from mcm_tpu.scores.msp import msp_scores
    from mcm_tpu.utils import setup_log, setup_seed
    from mcm_tpu.utils.results import save_as_dataframe

    setup_seed(args.seed)
    cfg = SupervisedViTConfig(num_classes=1000)
    log_directory = (f"results/{args.in_dataset}/MSP_{args.score}/"
                     f"vit_T_{args.T}_ID_{args.name}")
    os.makedirs(log_directory, exist_ok=True)
    log = setup_log(log_directory, args.name)

    params = jvit.resolve_vit_params(cfg, args.ckpt_dir, cache=True)
    if params is None:
        if not args.allow_random_weights:
            raise FileNotFoundError(
                "no supervised ViT weights; put an HF "
                "ViTForImageClassification snapshot under --ckpt_dir or pass "
                "--allow_random_weights")
        import warnings
        warnings.warn("RANDOM WEIGHTS — smoke mode")
        params = init_supervised_vit(0, cfg)

    precision = Precision.fast()

    @jax.jit
    def score_batch(params, images_u8):
        x = normalize_on_device(images_u8, IMAGENET_MEAN, IMAGENET_STD,
                                dtype=precision.activation_dtype)
        logits = jvit.forward_logits(params, cfg, x, precision)
        return msp_scores(logits, args.score, args.T)

    def score_dataset(dataset):
        # one-batch-behind readback, same overlap pattern as the runner
        from mcm_tpu.runner import _StreamReadback
        # single-process baseline: full batches (no multi-host striping)
        pipe = DataPipeline(dataset, args.batch_size,
                            num_workers=args.num_workers,
                            stripe=(0, args.batch_size))
        stream = _StreamReadback()
        valids = []
        for batch in pipe:
            stream.push(score_batch(params, jnp.asarray(batch.images)))
            valids.append(batch.valid)
        return collect_scores(stream.finish(), valids, pipe.num_samples)

    val_ds = set_val_loader(args.in_dataset, args.root_dir)
    in_score = score_dataset(val_ds)

    out_datasets = args.out_datasets or default_out_datasets(args.in_dataset)
    auroc_list, aupr_list, fpr_list = [], [], []
    for out_dataset in out_datasets:
        log.debug(f"Evaluting OOD dataset {out_dataset}")
        out_score = score_dataset(set_ood_loader(out_dataset, args.root_dir))
        auroc, aupr, fpr = get_measures(-in_score, -out_score)
        print_measures(log, auroc, aupr, fpr, f"MSP-{args.score}")
        auroc_list.append(auroc)
        aupr_list.append(aupr)
        fpr_list.append(fpr)
    print_measures(log, float(np.mean(auroc_list)), float(np.mean(aupr_list)),
                   float(np.mean(fpr_list)), "MSP-mean")
    save_as_dataframe(log_directory, args.name, out_datasets, fpr_list,
                      auroc_list, aupr_list)


if __name__ == "__main__":
    main()
