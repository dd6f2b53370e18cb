#!/usr/bin/env python
"""Can the pallas_bsd attention kernel speed up TRAINING?

make_train_step forces attn_impl="xla" because the kernel has no VJP.
The candidate fix is a custom_vjp: pallas_bsd forward, backward via
jax.vjp of the mathematically-identical XLA attention (recomputed from
the saved q/k/v — a flash-style backward kernel is the only way to
avoid that recompute, and it would re-pay the whole round-2 kernel
investigation for the gradient path).

The accounting says it should LOSE under the production remat=True
(gradient checkpointing re-runs the forward inside the backward, so the
custom_vjp path computes attention 2x pallas + 1x XLA recompute + XLA
backward dots, vs 2x XLA + backward for the baseline), and roughly tie
at remat=False.  This probe measures all four cells on the chip:

  xla / remat=True        production train step
  vjp / remat=True        pallas fwd under the checkpoint
  xla / remat=False       no checkpointing (more HBM, fewer FLOPs)
  vjp / remat=False       pallas fwd, XLA-recompute backward only

Grad correctness of the custom_vjp is asserted vs the pure-XLA step on
CPU first (identical up to the fwd impls' bf16 delta).  Results go to
docs/PERF.md.

Batch is 64: at 256 the remat=False cells are memory-infeasible on one
v5e (the XLA backward saves the [B, H, S, S] probs — ~2.2 GB/layer bf16
— which is exactly why remat defaults True in make_train_step).

Measured (v5e, 2026-08-18, B/16 batch 64, CPU grad check deltas 0.0):

  xla/remat=True    :    252.8 ms/step ( 253.2 img/s)   <- production
  xla/remat=False   : FAILED (remote compile HTTP 500 — compiler dies
                      on the no-remat program)
  vjp/remat=True    :    439.2 ms/step ( 145.7 img/s)
  vjp/remat=False   : FAILED (same compiler failure)

Conclusion: the custom_vjp LOSES 74% — worse than the recompute
accounting alone predicts, so the custom_vjp boundary is also blocking
XLA's fused backward scheduling around attention.  Training keeps
attn_impl="xla"; a Pallas gradient path would need a hand-written
flash-style backward kernel, which the forward-side economics (drain
floor at Dh=64) say is unlikely to pay.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
WARMUP = 2
STEPS = 6


def make_trainable_attention():
    """encoder_attention drop-in: pallas_bsd forward, XLA-recompute VJP."""
    import jax

    from mcm_tpu.config import Precision
    from mcm_tpu.ops import attention as ops_attn

    fast = Precision.fast()

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def attn(q, k, v, heads):
        return ops_attn.encoder_attention(q, k, v, heads=heads, mask=None,
                                          precision=fast)

    def xla_attn(q, k, v, heads):
        import dataclasses
        p = dataclasses.replace(fast, attn_impl="xla")
        return ops_attn.encoder_attention(q, k, v, heads=heads, mask=None,
                                          precision=p)

    def fwd(q, k, v, heads):
        return attn(q, k, v, heads), (q, k, v)

    def bwd(heads, res, g):
        q, k, v = res
        _, pullback = jax.vjp(lambda a, b, c: xla_attn(a, b, c, heads),
                              q, k, v)
        return pullback(g)

    attn.defvjp(fwd, bwd)

    def encoder_attention(q, k, v, *, heads, mask, precision):
        if mask is not None or precision.activation_dtype.itemsize != 2:
            return ops_attn.encoder_attention(q, k, v, heads=heads,
                                              mask=mask, precision=precision)
        return attn(q, k, v, heads)

    return encoder_attention


def build_step(cfg, variant, remat):
    import jax

    from mcm_tpu.config import Precision
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.train.contrastive import make_train_step

    orig = jclip.encoder_attention
    if variant == "vjp":
        jclip.encoder_attention = make_trainable_attention()
    try:
        init_state, step = make_train_step(cfg, precision=Precision.fast(),
                                           remat=remat)
        state = init_state(init_clip(0, cfg))
    finally:
        jclip.encoder_attention = orig
    return state, step


def grad_check():
    """CPU: custom_vjp grads match the pure-XLA step (same seeds/batch)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mcm_tpu.config import CLIP_CONFIGS

    cfg = CLIP_CONFIGS["ViT-B/16"]()  # honors MCM_TPU_TEST_TINY_B16
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, cfg.vision.image_size,
                                 cfg.vision.image_size, 3), dtype=np.uint8)
    ids = rng.integers(0, cfg.text.vocab_size, (4, 16), dtype=np.int32)
    mask = np.ones((4, 16), np.int32)

    losses = {}
    for variant in ("xla", "vjp"):
        state, step = build_step(cfg, variant, remat=True)
        new_state, loss = step(state, imgs, ids, mask)
        losses[variant] = float(loss)
        # one more step so the gradient actually moved the params
        _, loss2 = step(new_state, imgs, ids, mask)
        losses[variant + "2"] = float(loss2)
    d0 = abs(losses["xla"] - losses["vjp"])
    d1 = abs(losses["xla2"] - losses["vjp2"])
    print(f"CPU grad check: step-1 loss delta {d0:.2e}, "
          f"step-2 (post-update) delta {d1:.2e}", flush=True)
    assert d0 < 1e-4 and d1 < 5e-3, (losses, "custom_vjp diverges")


def time_variants():
    import jax

    from mcm_tpu.config import CLIP_CONFIGS

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8)
    ids = rng.integers(0, cfg.text.vocab_size, (BATCH, 77), dtype=np.int32)
    mask = np.ones((BATCH, 77), np.int32)

    for variant in ("xla", "vjp"):
        for remat in (True, False):
            tag = f"{variant}/remat={remat}"
            try:
                state, step = build_step(cfg, variant, remat)
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
