#!/usr/bin/env python
"""Does the pallas_bsd attention kernel speed up TRAINING?  (It does.)

make_train_step originally forced attn_impl="xla" because the kernel
has no VJP.  The fix that measured out is ``attn_impl="pallas_bsd_vjp"``
(mcm_tpu.ops.attention.trainable_encoder_attention): pallas_bsd forward,
backward via ``jax.vjp`` of the mathematically-identical XLA attention
recomputed from the saved q/k/v.  Under the production gradient
checkpointing the recompute is free (remat re-runs the forward anyway)
and the residuals are the function's own inputs, so memory is unchanged.

This probe times the four cells through the production
``make_train_step`` routing (precision.attn_impl is honored when set
explicitly to "xla"/"pallas_bsd_vjp"):

  xla / remat=True        the pre-fix baseline
  vjp / remat=True        production on single-device bf16 TPU
  xla / remat=False       no checkpointing
  vjp / remat=False       no checkpointing, kernel forward

Measured (v5e, 2026-08-18, B/16 batch 64, dependent-chain timing) — the
full story, because the single runs CONTRADICT each other:

  run A (fixed monkeypatch probe):  xla/remat 256.3, vjp/remat 231.7
  run B (production routing):       xla/remat 255.7, vjp/remat 266.9
  shared-state alternating A/B (one state, both executables resident,
  3 rounds x 8 steps, order alternated):
      xla: 229.7 / 253.5 / 231.7 ms/step
      vjp: 226.3 / 234.2 / 243.8 ms/step

Verdict: a WASH — the host's run-to-run variance (±10%, CLAUDE.md) is
larger than any real difference between the two programs.  Training
therefore defaults to attn_impl="xla"; "pallas_bsd_vjp" stays available
as an explicit single-device opt-in (grads pinned equal in CI).  Both
remat=False cells are non-viable regardless: xla fails remote compile
outright, vjp measures 316–378 ms, and at useful batches the saved
[B, H, S, S] probs are memory-infeasible — which is why remat defaults
True.

CPU grad check (fp32 parity): loss deltas 0.0 at step 1 AND after one
optimizer step — the custom_vjp's gradients are exactly the XLA
function's.  (In bf16 the two paths differ by scheduling-level rounding,
which AdamW's zero-moment first update amplifies to ~lr·sign flips —
the fp32 check isolates math from rounding.)

NOTE: the first version of this probe monkeypatched the attention and
restored it before jax.jit traced the step, so its "vjp" cells silently
re-measured XLA and reported a bogus 439 ms (caught in review).  The
probe now drives the production routing; nothing is patched.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
WARMUP = 2
STEPS = 6

IMPLS = {"xla": "xla", "vjp": "pallas_bsd_vjp"}


def build_step(cfg, remat, attn_impl, base=None):
    from mcm_tpu.config import Precision
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.train.contrastive import make_train_step

    precision = dataclasses.replace(base or Precision.fast(),
                                    attn_impl=attn_impl)
    init_state, step = make_train_step(cfg, precision=precision, remat=remat)
    return init_state(init_clip(0, cfg)), step


def grad_check():
    """CPU, fp32 parity: the vjp route's losses match pure XLA exactly,
    including after one optimizer step (i.e. the gradients match)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mcm_tpu.config import CLIP_CONFIGS, Precision

    cfg = CLIP_CONFIGS["ViT-B/16"]()  # honors MCM_TPU_TEST_TINY_B16
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, cfg.vision.image_size,
                                 cfg.vision.image_size, 3), dtype=np.uint8)
    ids = rng.integers(0, cfg.text.vocab_size, (4, 16), dtype=np.int32)
    mask = np.ones((4, 16), np.int32)

    losses = {}
    for variant, impl in IMPLS.items():
        state, step = build_step(cfg, remat=True, attn_impl=impl,
                                 base=Precision.parity())
        new_state, loss = step(state, imgs, ids, mask)
        losses[variant] = float(loss)
        _, loss2 = step(new_state, imgs, ids, mask)
        losses[variant + "2"] = float(loss2)
    d0 = abs(losses["xla"] - losses["vjp"])
    d1 = abs(losses["xla2"] - losses["vjp2"])
    print(f"CPU grad check (fp32): step-1 loss delta {d0:.2e}, "
          f"step-2 (post-update) delta {d1:.2e}", flush=True)
    assert d0 < 1e-6 and d1 < 1e-4, (losses, "custom_vjp diverges")


def time_variants():
    from mcm_tpu.config import CLIP_CONFIGS

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8)
    ids = rng.integers(0, cfg.text.vocab_size, (BATCH, 77), dtype=np.int32)
    mask = np.ones((BATCH, 77), np.int32)

    # remat=True cells first: the remat=False programs can crash the
    # remote compile helper, and a crashed helper must not contaminate
    # the headline comparison that follows it
    for remat in (True, False):
        for variant, impl in IMPLS.items():
            tag = f"{variant}/remat={remat}"
            state = None
            try:
                state, step = build_step(cfg, remat, impl)
                for _ in range(WARMUP):
                    state, loss = step(state, imgs, ids, mask)
                np.asarray(loss)
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    state, loss = step(state, imgs, ids, mask)
                np.asarray(loss)  # the dependent chain's barrier
                dt = (time.perf_counter() - t0) / STEPS
                print(f"{tag:18s}: {dt * 1000:8.1f} ms/step "
                      f"({BATCH / dt:6.1f} img/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:18s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
            finally:
                state = None  # free HBM before the next variant


if __name__ == "__main__":
    if os.environ.get("TRAIN_PROBE_GRADCHECK"):
        grad_check()
    else:
        time_variants()
