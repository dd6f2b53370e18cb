#!/usr/bin/env python
"""Tune `_pallas_bsd_attention`'s batch block per sequence length.

`_bsd_block_b` was written for the B/16 shape (S=197 → block_b=16, the
largest power of two under the ~14 MB VMEM budget).  At B/32's S=50 the
same cap leaves each program tiny (grid 32×6 = 192 programs/layer, ~2 MB
VMEM each) — per-program overhead is a plausible cause of B/32's lower
whole-model MFU (57.1% vs B/16's 66.8%).  This probe times the REAL
production kernel (imported from ops.attention) across block_b at the
three model shapes, same chained-iteration methodology as
tools/attn_shootout.py (serial dispatch through the dev tunnel measures
only RPC latency).

Run on the real chip (JAX_PLATFORMS=axon), nothing else on it.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 20

SHAPES = {
    # name: (B, S, D, heads, blocks to try)
    "B/32": (512, 50, 768, 12, (16, 32, 64, 128)),
    "B/16": (512, 197, 768, 12, (8, 16)),
    "L/14": (256, 257, 1024, 16, (4, 8, 12)),
}


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

    from mcm_tpu.config import Precision
    from mcm_tpu.ops.attention import (_bsd_block_b, _pallas_bsd_attention,
                                       encoder_attention)

    rng = np.random.default_rng(0)
    for name, (b, s, d, heads, blocks) in SHAPES.items():
        q, k, v = (jnp.asarray(
            rng.standard_normal((b, s, d)), jnp.bfloat16) for _ in range(3))
        flops = 4 * b * heads * s * s * (d // heads)
        cur = _bsd_block_b(s, b)
        print(f"== {name}: B={b} S={s} D={d} H={heads} "
              f"(current block_b={cur}) ==", flush=True)

        # XLA context row (split-heads path)
        import dataclasses
        xla_prec = dataclasses.replace(Precision.fast(), attn_impl="xla")
        val = time_fn(
            lambda q, k, v: encoder_attention(
                q, k, v, heads=heads, mask=None, precision=xla_prec),
            (q, k, v))
        print(f"  xla           : {val * 1000:8.2f} ms  "
              f"({flops / val / 1e12:6.1f} TFLOP/s)", flush=True)

        for blk in blocks:
            est = 4 * blk * s * 128 * 2 * 2 + 2 * blk * s * s * 4
            try:
                val = time_fn(
                    lambda q, k, v, bb=blk: _pallas_bsd_attention(
                        q, k, v, heads=heads, block_b=bb), (q, k, v))
                print(f"  block_b={blk:4d}  : {val * 1000:8.2f} ms  "
                      f"({flops / val / 1e12:6.1f} TFLOP/s)  "
                      f"[vmem est {est / 2**20:.1f} MB]", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  block_b={blk:4d}  : FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
