#!/usr/bin/env python
"""Decompose the whole-model batch time under the pallas_bsd default:
where do the non-MFU milliseconds go?

Each variant monkeypatches an ABLATED transformer block into
mcm_tpu.models.clip (timing-only — ablations compute wrong math) and
times the production EvalStep program (uint8 → normalize → B/16 tower →
MCM score vs 1000 classes) with bench.py's dispatch-ahead /
readback-behind methodology on the real chip.  Differences against the
full model bound each component's cost:

  full        production (pallas_bsd attention)
  attn_xla    production with attn_impl="xla" (the pre-round-3 default)
  attn_core   encoder_attention -> v  (projections kept: isolates exactly
              the QK^T/softmax/PV op the bsd kernel owns)
  no_attn     whole attention branch removed (ln1+qkv+attn+out ablated)
  no_mlp      whole MLP branch removed (ln2+fc1+gelu+fc2 ablated)
  no_ln       layer_norm -> identity everywhere in the block

Run on the chip: `python tools/mfu_breakdown.py` (one ~60 s first-exec
compile per variant through the dev tunnel; measurement windows after).

Measured (v5e, 2026-08-18, B/16 batch 512, best window):

  full      :   3720.5 img/s    137.61 ms/batch   (66.4% MFU)
  attn_xla  :   2931.1 img/s    174.68 ms/batch   (pre-round-3 default)
  attn_core :   5454.2 img/s     93.87 ms/batch   (-43.7 ms)
  no_attn   :   6804.0 img/s     75.25 ms/batch   (-62.4 ms)
  no_mlp    :   7491.7 img/s     68.34 ms/batch   (-69.3 ms)
  no_ln     :   4222.1 img/s    121.27 ms/batch   (-16.4 ms)

Deltas exceed the total (148 vs 137.6 ms) because removing a component
shifts XLA's fusion boundaries — read them as upper bounds, not an exact
partition.  Interpretation in docs/PERF.md ("Where the remaining third
goes").
"""

import json
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 512
N_CLASSES = 1000
WARMUP = 2
WINDOWS = 2
ITERS = 8


def make_block(mode):
    """An ablated clone of models.clip.transformer_block (timing only)."""
    import jax.numpy as jnp

    from mcm_tpu.models.clip import _dense, layer_norm, quick_gelu
    from mcm_tpu.ops.attention import encoder_attention

    def ln(x, scale, bias, eps):
        if mode == "no_ln":
            return x
        return layer_norm(x, scale, bias, eps)

    def block(x, layer, *, heads, eps, mask, precision):
        if mode != "no_attn":
            h = ln(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
            q = _dense(h, layer["attn"]["wq"], layer["attn"]["bq"], precision)
            k = _dense(h, layer["attn"]["wk"], layer["attn"]["bk"], precision)
            v = _dense(h, layer["attn"]["wv"], layer["attn"]["bv"], precision)
            if mode == "attn_core":
                a = v
            else:
                a = encoder_attention(q, k, v, heads=heads, mask=mask,
                                      precision=precision)
            a = _dense(a, layer["attn"]["wo"], layer["attn"]["bo"], precision)
            x = x + a
        if mode != "no_mlp":
            h = ln(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
            h = _dense(h, layer["mlp"]["w1"], layer["mlp"]["b1"], precision)
            h = quick_gelu(h)
            h = _dense(h, layer["mlp"]["w2"], layer["mlp"]["b2"], precision)
            x = x + h
        return x

    return block


def time_variant(mode, attn_impl=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mcm_tpu.config import CLIP_CONFIGS, Precision
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import EvalStep, make_mesh
    from mcm_tpu.scores import l2_normalize

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    params = init_clip(0, cfg)
    precision = Precision.fast()
    if attn_impl:
        precision = dataclasses.replace(precision, attn_impl=attn_impl)

    orig = jclip.transformer_block
    if mode not in ("full", "attn_xla"):
        jclip.transformer_block = make_block(mode)
    try:
        mesh = make_mesh(len(jax.devices()))
        step = EvalStep(cfg, score="MCM", precision=precision, mesh=mesh)
        params = step.put_params(params)
        rng = np.random.default_rng(0)
        text = rng.standard_normal((N_CLASSES, cfg.embed_dim)
                                   ).astype(np.float32)
        text = step.put_replicated(np.asarray(l2_normalize(jnp.asarray(text))))
        dev = [step.put_batch(rng.integers(0, 256, (BATCH, 224, 224, 3),
                                           dtype=np.uint8))
               for _ in range(4)]
        for i in range(WARMUP):
            np.asarray(step.score(params, dev[i % 4], text))
        best = 0.0
        for _ in range(WINDOWS):
            pending = deque()
            t0 = time.perf_counter()
            for i in range(ITERS):
                pending.append(step.score(params, dev[i % 4], text))
                if len(pending) > 1:
                    np.asarray(pending.popleft())
            while pending:
                np.asarray(pending.popleft())
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        return best
    finally:
        jclip.transformer_block = orig


def main():
    rows = {}
    for mode, impl in (("full", None), ("attn_xla", "xla"),
                       ("attn_core", None), ("no_attn", None),
                       ("no_mlp", None), ("no_ln", None)):
        try:
            rate = time_variant(mode, attn_impl=impl)
            ms = BATCH / rate * 1000
            rows[mode] = (rate, ms)
            print(f"{mode:10s}: {rate:8.1f} img/s   {ms:7.2f} ms/batch",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    if "full" in rows:
        full_ms = rows["full"][1]
        print(json.dumps({
            "full_ms_per_batch": round(full_ms, 2),
            "deltas_ms": {m: round(full_ms - v[1], 2)
                          for m, v in rows.items() if m != "full"},
        }))


if __name__ == "__main__":
    main()
