#!/usr/bin/env python
"""Decompose `_pallas_bsd_attention`'s 3.24 ms/layer-batch: which part of
the kernel (MXU dots, exp, reductions/divide, casts) owns the time?

TIMING-ONLY probes — most variants compute WRONG attention math; they
exist to bound the cost of the piece they remove.  Rows:

  full        the production kernel (in-probs fp32 divide)
  nosoftmax   QKᵀ → cast → PV (dots + casts only; no max/exp/sum/div)
  noexp       softmax with exp→identity (sub, reduce, divide kept)
  bf16sm      logits cast to bf16 at the MXU boundary; max/sub/exp/div
              on bf16 vectors (fp32 sum); correct math, reduced precision
  deferdiv    normalization AFTER the PV matmul: unnormalized exp
              weights feed the dot, the [blk, S, Dh] output is divided
              by the row sums (S/Dh ≈ 3× less divide traffic); correct
              math, bf16 rounding moves from p=e/Σ to e

Measured (v5e, 2026-08-17): full 3.19 ms / nosoftmax 2.93 / noexp 3.17 /
bf16sm 3.21 / deferdiv 3.24 — the whole softmax costs 0.26 ms (fully
overlapped with the MXU) and every VPU-side variant is timing-neutral,
so the production kernel keeps the highest-precision fp32 in-probs
softmax.  The kernel is bound by the dots + [S, S] fp32 logits traffic.

Methodology: tools/attn_shootout.py chaining (CHAIN dependent
applications inside one jit, one readback per measurement)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 20
B, S, D, HEADS = 512, 197, 768, 12
DH = D // HEADS
ATTN_FLOPS = 2 * 2 * B * HEADS * S * S * DH


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, dh, mode):
    import jax
    import jax.numpy as jnp

    blk, s, lanes = q_ref.shape
    outs = []
    for j in range(lanes // dh):
        sl = slice(j * dh, (j + 1) * dh)
        q = (q_ref[:, :, sl].astype(jnp.float32) * scale
             ).astype(q_ref.dtype)
        logits = jax.lax.dot_general(
            q, k_ref[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [blk, S, S]
        if mode == "bf16sm":
            # Mosaic requires a 32-bit matmul accumulator; cast the
            # logits right at the MXU boundary so every softmax
            # elementwise op below runs on bf16 vectors
            logits = logits.astype(jnp.bfloat16)
        if mode == "nosoftmax":
            p = logits
        elif mode == "noexp":
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = logits - m
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        elif mode == "deferdiv":
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(v_ref.dtype), v_ref[:, :, sl],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            outs.append(o / denom)
            continue
        elif mode == "bf16sm":
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)                   # bf16 exp
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            p = e / denom.astype(jnp.bfloat16)
        else:  # full
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))     # [blk, S, Dh]
    o_ref[...] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def _call(q, k, v, *, mode, block_b=16):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = q.shape
    spec = pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=DH ** -0.5, dh=DH, mode=mode),
        grid=(pl.cdiv(b, block_b), d // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
    )(q, k, v)


def time_fn(fn, args, outer=3):
    import jax
    import jax.numpy as jnp

    def run(q, k, v):
        def body(i, qq):
            return fn(qq, k, v).astype(q.dtype)
        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, q)
                       .astype(jnp.float32))

    jf = jax.jit(run)
    np.asarray(jf(*args))
    np.asarray(jf(*args))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
               for _ in range(3))

    # bf16sm is correct math — print its delta vs the full kernel
    a0 = np.asarray(_call(q, k, v, mode="full").astype(jnp.float32))
    a1 = np.asarray(_call(q, k, v, mode="bf16sm").astype(jnp.float32))
    print(f"max |delta| bf16sm vs full: {np.abs(a0 - a1).max():.3e}",
          flush=True)

    for mode in ("full", "nosoftmax", "noexp", "bf16sm", "deferdiv"):
        try:
            val = time_fn(lambda q, k, v, m=mode: _call(q, k, v, mode=m),
                          (q, k, v))
            print(f"{mode:12s}: {val * 1000:8.2f} ms  "
                  f"({ATTN_FLOPS / val / 1e12:6.1f} TFLOP/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s}: FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
