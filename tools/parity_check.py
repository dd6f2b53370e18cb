#!/usr/bin/env python
"""Real-checkpoint numerical parity harness.

Two modes, sharing a golden-file format:

* ``record`` — run the HF/PyTorch reference model (CPU) on deterministic
  probe inputs and write goldens (image features, text features, MCM scores)
  to an .npz.  Run this wherever torch + the checkpoint are available.
* ``check``  — run OUR JAX model on the same probe inputs and compare
  against the goldens (the ≤0.1%-AUROC north star starts with feature-level
  agreement; this reports max/mean feature error and score error).

Probe inputs are seeded synthetic pixels/token-ids, so no dataset is needed
— this isolates MODEL parity from PREPROCESSING parity (the latter is
covered by tests/test_ops.py and tests/test_native.py against PIL).

Usage:
  python tools/parity_check.py record --ckpt ViT-B/16 --hf-dir <snapshot> \
      --out goldens_b16.npz
  python tools/parity_check.py check --ckpt ViT-B/16 --goldens goldens_b16.npz \
      [--ckpt-dir checkpoints] [--precision parity]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from mcm_tpu.models.hf_synth import (golden_probe_inputs,  # noqa: E402
                                     probe_inputs)


def record(args):
    import torch
    import transformers

    model = transformers.CLIPModel.from_pretrained(args.hf_dir)
    model.eval()
    pixels, ids, mask = probe_inputs()
    with torch.no_grad():
        img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()
        txt = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = imgn @ txtn.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    mcm = -(e / e.sum(1, keepdims=True)).max(1)
    np.savez(args.out, image_features=img, text_features=txt, mcm=mcm,
             ckpt=args.ckpt)
    print(f"recorded goldens for {args.ckpt} -> {args.out}")


GOLDEN_SLICE = 48  # per-layer hiddens are stored for the first 48 tokens


def record_synth(args):
    """Record per-layer goldens for the synthesized mid-size model through
    the REAL HF CLIPModel (torch needed once, here).  The committed golden +
    tests/test_golden_parity.py then pin converter/architecture parity in CI
    with no torch dependency (VERDICT r1 item 4)."""
    import torch

    from mcm_tpu.models.hf_synth import (build_hf_clip, golden_config,
                                         synth_hf_clip_state_dict,
                                         synth_scale_config)

    cfg = (golden_config() if args.config == "golden"
           else synth_scale_config(args.config))
    sd = synth_hf_clip_state_dict(cfg, seed=args.seed)
    model = build_hf_clip(cfg, sd)

    pixels, ids, mask = golden_probe_inputs(cfg)
    with torch.no_grad():
        vout = model.vision_model(pixel_values=torch.from_numpy(pixels),
                                  output_hidden_states=True)
        tout = model.text_model(input_ids=torch.from_numpy(ids),
                                attention_mask=torch.from_numpy(mask),
                                output_hidden_states=True)
        img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()
        txt = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    # a strided subset of hidden layers (always incl. embeddings + final)
    # keeps the committed file a few MB even at L/14 dimensions
    v_idx = sorted(set(range(0, cfg.vision.layers + 1, args.layer_stride))
                   | {cfg.vision.layers})
    t_idx = sorted(set(range(0, cfg.text.layers + 1, args.layer_stride))
                   | {cfg.text.layers})
    vh = np.stack([vout.hidden_states[i].numpy()[:, :GOLDEN_SLICE]
                   for i in v_idx])
    th = np.stack([tout.hidden_states[i].numpy()[:, :GOLDEN_SLICE]
                   for i in t_idx])
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = imgn @ txtn.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    mcm = -(e / e.sum(1, keepdims=True)).max(1)
    np.savez_compressed(
        args.out, vision_hiddens=vh, text_hiddens=th,
        vision_layer_idx=np.asarray(v_idx), text_layer_idx=np.asarray(t_idx),
        image_features=img, text_features=txt, mcm=mcm, seed=args.seed,
        config=args.config, slice=GOLDEN_SLICE,
        transformers_version=str(__import__("transformers").__version__))
    print(f"recorded synth goldens (config {args.config}, seed {args.seed})"
          f" -> {args.out}: vision_hiddens {vh.shape} @layers {v_idx}, "
          f"text_hiddens {th.shape} @layers {t_idx}")


def check(args):
    import jax.numpy as jnp

    from mcm_tpu.config import CLIP_CONFIGS, resolve_precision
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.convert import resolve_clip_params
    from mcm_tpu.scores import compute_scores, l2_normalize

    gold = np.load(args.goldens, allow_pickle=True)
    if "ckpt" in gold and str(gold["ckpt"]) != args.ckpt:
        sys.exit(f"goldens were recorded for {gold['ckpt']}, not "
                 f"{args.ckpt} — a numeric FAIL against the wrong model "
                 f"would be meaningless")
    cfg = CLIP_CONFIGS[args.ckpt]()
    params = resolve_clip_params(args.ckpt, args.ckpt_dir)
    if params is None:
        sys.exit(f"no weights for {args.ckpt} under "
                 f"{args.ckpt_dir or 'checkpoints'}")
    precision = resolve_precision(args.precision)

    pixels, ids, mask = probe_inputs()
    img = np.asarray(jclip.encode_image(params, cfg.vision,
                                        jnp.asarray(pixels), precision),
                     dtype=np.float32)
    txt = np.asarray(jclip.encode_text(params, cfg.text,
                                       jnp.asarray(ids, jnp.int32),
                                       jnp.asarray(mask, jnp.int32),
                                       precision), dtype=np.float32)
    mcm = np.asarray(compute_scores(jnp.asarray(img),
                                    l2_normalize(jnp.asarray(txt)),
                                    score="MCM"))

    def report(name, ours, ref):
        err = np.abs(ours - ref)
        rel = err.max() / (np.abs(ref).max() + 1e-12)
        print(f"{name:>16}: max abs {err.max():.3e}  mean abs "
              f"{err.mean():.3e}  max rel {rel:.3e}")
        return rel

    r1 = report("image features", img, gold["image_features"])
    r2 = report("text features", txt, gold["text_features"])
    r3 = report("MCM scores", mcm, gold["mcm"])
    # key the tolerance off the RESOLVED policy, not the alias spelling
    # ('float32'/'highest' resolve to parity math and must get the strict
    # tolerance, not the loose bf16 one)
    tol = 1e-3 if precision.activation_dtype == jnp.float32 else 3e-2
    ok = max(r1, r2, r3) < tol
    print("PARITY:", "PASS" if ok else "FAIL", f"(tol {tol})")
    sys.exit(0 if ok else 1)


FUZZ_TEXTS = 200


def _tokenizer_report(hf_dir, ckpt_dir, lines):
    import transformers

    from mcm_tpu.text.tokenizer import CLIPTokenizer as OurTok

    hf = transformers.CLIPTokenizer.from_pretrained(hf_dir)
    ours = OurTok.resolve(ckpt_dir)
    if ours is None:
        lines.append("## Tokenizer\n\nFAIL: no vocab.json/merges.txt "
                     "resolvable from the checkpoint dir\n")
        return False
    import random
    rnd = random.Random(0)
    battery = ["a photo of a cat", "a photo of a Great White Shark.",
               "it's   the cat's photo, isn't it?", "café naïve — ok",
               "CAT!! 12 photos"]
    alphabet = ("abcdefghijklmnopqrstuvwxyz  .,!?'-0123456789"
                "ABCDEFGHIJé中文")
    battery += ["".join(rnd.choice(alphabet)
                        for _ in range(rnd.randrange(1, 40)))
                for _ in range(FUZZ_TEXTS)]
    bad = 0
    for t in battery:
        ref = hf([t], padding=True)
        got_ids, got_mask = ours([t], pad_to_multiple=1)
        if (list(got_ids[0]) != ref["input_ids"][0]
                or list(got_mask[0]) != ref["attention_mask"][0]):
            bad += 1
    ok = bad == 0
    lines.append(f"## Tokenizer\n\n{len(battery)} cases (fixed battery + "
                 f"{FUZZ_TEXTS} fuzz strings) vs HF `CLIPTokenizer`: "
                 f"**{bad} mismatches** — {'PASS' if ok else 'FAIL'}\n")
    return ok


def _tree_paths(tree, max_images):
    paths = []
    for cls in sorted(e.name for e in os.scandir(tree) if e.is_dir()):
        d = os.path.join(tree, cls)
        for r, _, fnames in sorted(os.walk(d)):
            paths.extend(os.path.join(r, f) for f in sorted(fnames))
    return paths[:max_images], sorted(
        e.name for e in os.scandir(tree) if e.is_dir())


def _score_tree_both(tree, model, params, cfg, tokenizer, max_images):
    """(hf_scores, our_scores) — MCM over the tree's own class prompts,
    decoded once with the PIL-exact host path and fed to BOTH models."""
    import torch

    import jax.numpy as jnp

    from mcm_tpu.config import Precision
    from mcm_tpu.data.transforms import (CLIP_MEAN, CLIP_STD,
                                         load_image_uint8)
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.scores import compute_scores, l2_normalize

    paths, classes = _tree_paths(tree, max_images)
    imgs = np.stack([load_image_uint8(p) for p in paths])   # [N,H,W,3] u8
    prompts = [f"a photo of a {c}" for c in classes]

    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 3, 1, 1)
    pix = (imgs.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
           - mean) / std
    with torch.no_grad():
        img_f = model.get_image_features(
            pixel_values=torch.from_numpy(pix)).float().numpy()
        enc = _hf_tokenize(model, prompts)
        txt_f = model.get_text_features(**enc).float().numpy()
    img_n = img_f / np.linalg.norm(img_f, axis=-1, keepdims=True)
    txt_n = txt_f / np.linalg.norm(txt_f, axis=-1, keepdims=True)
    logits = img_n @ txt_n.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    hf_scores = -(e / e.sum(1, keepdims=True)).max(1)

    prec = Precision.parity()
    from mcm_tpu.data.transforms import normalize_on_device
    x = normalize_on_device(jnp.asarray(imgs), dtype=jnp.float32)
    our_img = jclip.encode_image(params, cfg.vision, x, prec)
    ids, mask = tokenizer(prompts, pad_to_multiple=8,
                          context_length=cfg.text.context_length)
    our_txt = jclip.encode_text(params, cfg.text,
                                jnp.asarray(ids, jnp.int32),
                                jnp.asarray(mask, jnp.int32), prec)
    our_scores = np.asarray(compute_scores(
        our_img, np.asarray(l2_normalize(our_txt)), score="MCM"))
    return hf_scores.astype(np.float32), our_scores.astype(np.float32)


def _hf_tokenize(model, prompts):
    """Tokenize with the HF tokenizer living next to the model weights."""
    import torch
    import transformers

    tok = transformers.CLIPTokenizer.from_pretrained(model._parity_hf_dir)
    enc = tok(prompts, padding=True, return_tensors="pt")
    return {"input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"]}


def full_report(args):
    """One-command real-weights parity rehearsal (VERDICT r2 item 4):
    given a checkpoint dir holding an HF snapshot, produce
    PARITY_REPORT.md covering tokenizer ids, per-layer activations, score
    parity, and (optionally) metric deltas through both pipelines on
    real image trees."""
    import torch
    import transformers

    import jax.numpy as jnp

    from mcm_tpu.config import CLIP_CONFIGS, HF_CKPT_MAPPING, Precision
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.convert import resolve_clip_params
    from mcm_tpu.text.tokenizer import CLIPTokenizer as OurTok

    if args.ood_tree and not args.id_tree:
        sys.exit("--ood-tree requires --id-tree (metrics compare an ID/OOD "
                 "pair); refusing to emit a PASS that skipped the request")

    cfg = CLIP_CONFIGS[args.ckpt]()
    hf_dir = args.hf_dir or os.path.join(
        args.ckpt_dir, HF_CKPT_MAPPING[args.ckpt].split("/")[-1])
    if not os.path.isdir(hf_dir):
        sys.exit(f"no HF snapshot at {hf_dir} (pass --hf-dir)")

    lines = [f"# Parity report — {args.ckpt}", "",
             f"HF snapshot: `{hf_dir}`  ·  transformers "
             f"{transformers.__version__}", ""]
    ok = True

    model = transformers.CLIPModel.from_pretrained(hf_dir)
    model.eval()
    model._parity_hf_dir = hf_dir

    params = resolve_clip_params(args.ckpt, args.ckpt_dir)
    if params is None:
        sys.exit(f"our converter found no weights under {args.ckpt_dir}")
    tokenizer = OurTok.resolve(args.ckpt_dir)

    ok &= _tokenizer_report(hf_dir, args.ckpt_dir, lines)

    # per-layer activations on deterministic probe inputs
    pixels, ids, mask = probe_inputs(batch=4, n_prompts=8,
                                     vocab_size=cfg.text.vocab_size)
    with torch.no_grad():
        vout = model.vision_model(pixel_values=torch.from_numpy(pixels),
                                  output_hidden_states=True)
        tout = model.text_model(input_ids=torch.from_numpy(ids),
                                attention_mask=torch.from_numpy(mask),
                                output_hidden_states=True)
        img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()
        txt = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    prec = Precision.parity()
    our_img, vh = jclip.encode_image(params, cfg.vision,
                                     jnp.asarray(pixels), prec,
                                     collect_hidden=True)
    our_txt, th = jclip.encode_text(params, cfg.text,
                                    jnp.asarray(ids, jnp.int32),
                                    jnp.asarray(mask, jnp.int32), prec,
                                    collect_hidden=True)

    def rel(a, b):
        return float(np.abs(np.asarray(a, np.float32) - b).max()
                     / (np.abs(b).max() + 1e-12))

    lines.append("## Per-layer activations (probe inputs, parity "
                 "precision)\n")
    lines.append("| layer | vision max-rel | text max-rel |")
    lines.append("|---|---|---|")
    layer_ok = True
    for i in range(max(len(vout.hidden_states), len(tout.hidden_states))):
        v = (rel(np.asarray(vh)[i], vout.hidden_states[i].numpy())
             if i < len(vout.hidden_states) else None)
        t = (rel(np.asarray(th)[i], tout.hidden_states[i].numpy())
             if i < len(tout.hidden_states) else None)
        layer_ok &= all(x is None or x < 1e-3 for x in (v, t))
        lines.append(f"| {i} | {v if v is None else f'{v:.2e}'} "
                     f"| {t if t is None else f'{t:.2e}'} |")
    fi, ft = rel(our_img, img), rel(our_txt, txt)
    layer_ok &= fi < 1e-3 and ft < 1e-3
    lines.append(f"\nfinal features: image {fi:.2e}, text {ft:.2e} — "
                 f"{'PASS' if layer_ok else 'FAIL'} (tol 1e-3)\n")
    ok &= layer_ok

    # optional: per-image scores + metrics through both pipelines
    if args.id_tree:
        hf_id, our_id = _score_tree_both(args.id_tree, model, params, cfg,
                                         tokenizer, args.max_images)
        d_id = float(np.abs(hf_id - our_id).max())
        score_ok = d_id < 5e-5
        lines.append(f"## Score parity — ID tree `{args.id_tree}`\n\n"
                     f"{len(hf_id)} images: max per-image MCM delta "
                     f"{d_id:.2e} — {'PASS' if score_ok else 'FAIL'} "
                     f"(tol 5e-5)\n")
        ok &= score_ok
        if args.ood_tree:
            from mcm_tpu.metrics import get_measures
            hf_ood, our_ood = _score_tree_both(args.ood_tree, model,
                                               params, cfg, tokenizer,
                                               args.max_images)
            d_ood = float(np.abs(hf_ood - our_ood).max())
            m_hf = get_measures(-hf_id, -hf_ood)
            m_us = get_measures(-our_id, -our_ood)
            d_auroc = abs(m_hf[0] - m_us[0]) * 100
            metric_ok = d_ood < 5e-5 and d_auroc < 0.1
            lines.append(
                f"## Metrics — OOD tree `{args.ood_tree}`\n\n"
                f"{len(hf_ood)} images: max OOD score delta {d_ood:.2e}; "
                f"AUROC {100 * m_hf[0]:.3f} (HF-side) vs "
                f"{100 * m_us[0]:.3f} (ours), |Δ| = {d_auroc:.4f} pp — "
                f"{'PASS' if metric_ok else 'FAIL'} (north star ≤0.1 pp)\n")
            ok &= metric_ok

    lines.append(f"\n**OVERALL: {'PASS' if ok else 'FAIL'}**\n")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}: {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pr = sub.add_parser("record")
    pr.add_argument("--ckpt", default="ViT-B/16",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    pr.add_argument("--hf-dir", required=True)
    pr.add_argument("--out", required=True)
    pc = sub.add_parser("check")
    pc.add_argument("--ckpt", default="ViT-B/16",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    pc.add_argument("--goldens", required=True)
    pc.add_argument("--ckpt-dir", default=None)
    pc.add_argument("--precision", default="parity")
    ps = sub.add_parser("record-synth")
    ps.add_argument("--seed", default=0, type=int)
    ps.add_argument("--config", default="golden",
                    choices=["golden", "b16", "l14"])
    ps.add_argument("--layer-stride", default=1, type=int,
                    help="record every Nth hidden layer (embeddings and "
                         "final always included)")
    ps.add_argument("--out", default=None)
    pf = sub.add_parser(
        "full-report",
        help="one-command real-weights parity rehearsal → PARITY_REPORT.md")
    pf.add_argument("--ckpt", default="ViT-B/16",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    pf.add_argument("--ckpt-dir", default="checkpoints",
                    help="dir holding the HF snapshot "
                         "(<ckpt-dir>/clip-vit-*-patch*/) or converted npz "
                         "+ vocab files")
    pf.add_argument("--hf-dir", default=None,
                    help="explicit HF snapshot dir (default: derived from "
                         "--ckpt-dir)")
    pf.add_argument("--id-tree", default=None,
                    help="ImageFolder tree for per-image score parity")
    pf.add_argument("--ood-tree", default=None,
                    help="second tree: AUROC through both pipelines")
    pf.add_argument("--max-images", default=64, type=int)
    pf.add_argument("--out", default="PARITY_REPORT.md")
    args = p.parse_args()
    if args.mode == "record-synth" and args.out is None:
        args.out = {"golden": "tests/goldens/clip_synth_6l384.npz",
                    "b16": "tests/goldens/clip_synth_b16.npz",
                    "l14": "tests/goldens/clip_synth_l14.npz"}[args.config]
    {"record": record, "check": check, "record-synth": record_synth,
     "full-report": full_report}[args.mode](args)


if __name__ == "__main__":
    main()
