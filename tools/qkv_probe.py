#!/usr/bin/env python
"""Re-measure fused-QKV projection under the round-3 `pallas_bsd` kernel.

Round 1 measured fused-QKV as an e2e LOSS — but that was against XLA
attention, where the packed [B, S, 3D] output had to be sliced and
transposed into [B, H, S, Dh] per tensor.  The bsd kernel consumes the
projections' natural [B, S, D] layout, which enables a zero-copy fused
variant: pass the SAME [B, S, 3D] array as all three pallas operands and
let each BlockSpec index_map pick its tensor's lane tiles (q at lane
block j, k at D/128 + j, v at 2·D/128 + j).  One projection GEMM, no
slices, no transposes.

Rows (each times ONE layer's qkv projection + attention, chained
on-device per tools/attn_shootout.py methodology):

  split3      3 GEMMs [B·S,D]x[D,D] -> pallas_bsd(q, k, v)   (production)
  fusedslice  1 GEMM  [B·S,D]x[D,3D] -> static lane slices -> pallas_bsd
  fusedidx    1 GEMM  [B·S,D]x[D,3D] -> index_map-offset kernel (no slices)

Measured (v5e, 2026-08-18, B=512 S=197 D=768 bf16, CHAIN=20, both fused
variants bit-identical to split3):

  split3      :     4.40 ms  (95.1 TFLOP/s)   <- production
  fusedslice  :     5.97 ms  (70.0 TFLOP/s)
  fusedidx    :     4.68 ms  (89.3 TFLOP/s)

Conclusion: fused QKV stays a loss under the bsd kernel.  The index_map
trick recovers the 1.6 ms the lane slices cost (XLA materializes each
[B, S, D] slice of the packed tensor as a copy), but the fused variant
still trails by 0.28 ms/layer (~6%): the kernel's [blk, S, 128] operand
DMAs stride across 2304-wide rows instead of 768-wide ones (3x the
descriptor stride for the same bytes), and the single wide GEMM buys
nothing over three MXU-saturated [768, 768] GEMMs.  Production keeps the
split projections — no param-tree/converter/TP churn.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 20
B, S, D, HEADS = 512, 197, 768, 12
DH = D // HEADS
PROJ_FLOPS = 2 * B * S * D * 3 * D
ATTN_FLOPS = 2 * 2 * B * HEADS * S * S * DH
FLOPS = PROJ_FLOPS + ATTN_FLOPS


def _bsd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, dh):
    import jax
    import jax.numpy as jnp

    blk, s, lanes = q_ref.shape
    outs = []
    for j in range(lanes // dh):
        sl = slice(j * dh, (j + 1) * dh)
        q = (q_ref[:, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        logits = jax.lax.dot_general(
            q, k_ref[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def _bsd(q, k, v, block_b=16):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = q.shape
    spec = pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bsd_kernel, scale=DH ** -0.5, dh=DH),
        grid=(pl.cdiv(b, block_b), d // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
    )(q, k, v)


def _bsd_fused(qkv, d, block_b=16):
    """Same kernel, but all three operands are the packed [B, S, 3D] array;
    each index_map offsets into its tensor's lane blocks."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, _ = qkv.shape
    nd = d // 128

    def spec(t):
        return pl.BlockSpec((block_b, s, 128),
                            lambda i, j, t=t: (i, 0, t * nd + j),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bsd_kernel, scale=DH ** -0.5, dh=DH),
        grid=(pl.cdiv(b, block_b), nd),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
    )(qkv, qkv, qkv)


def _dense(x, w, bias):
    import jax.numpy as jnp

    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def make_step(mode, weights):
    wq, wk, wv, bq, bk, bv, wqkv, bqkv = weights

    def step(h):
        if mode == "split3":
            q = _dense(h, wq, bq)
            k = _dense(h, wk, bk)
            v = _dense(h, wv, bv)
            return _bsd(q, k, v)
        qkv = _dense(h, wqkv, bqkv)
        if mode == "fusedslice":
            q = qkv[:, :, :D]
            k = qkv[:, :, D:2 * D]
            v = qkv[:, :, 2 * D:]
            return _bsd(q, k, v)
        return _bsd_fused(qkv, D)

    return step


def time_fn(fn, h, outer=3):
    import jax
    import jax.numpy as jnp

    def run(h):
        def body(i, x):
            return fn(x).astype(h.dtype)
        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, h)
                       .astype(jnp.float32))

    jf = jax.jit(run)
    np.asarray(jf(h))
    np.asarray(jf(h))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(jf(h))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((B, S, D)) * 0.02, jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(rng.standard_normal((D, D)) * 0.02,
                              jnp.bfloat16) for _ in range(3))
    bq, bk, bv = (jnp.asarray(rng.standard_normal((D,)) * 0.02,
                              jnp.bfloat16) for _ in range(3))
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate([bq, bk, bv])
    weights = (wq, wk, wv, bq, bk, bv, wqkv, bqkv)

    ref = np.asarray(make_step("split3", weights)(h).astype(jnp.float32))
    for mode in ("fusedslice", "fusedidx"):
        out = np.asarray(make_step(mode, weights)(h).astype(jnp.float32))
        print(f"max |{mode} - split3|: {np.abs(out - ref).max():.3e}",
              flush=True)

    for mode in ("split3", "fusedslice", "fusedidx"):
        try:
            val = time_fn(make_step(mode, weights), h)
            print(f"{mode:12s}: {val * 1000:8.2f} ms  "
                  f"({FLOPS / val / 1e12:6.1f} TFLOP/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s}: FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
