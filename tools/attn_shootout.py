#!/usr/bin/env python
"""Standalone attention-impl shootout at the B/16 encoder shape.

Times each implementation over the real batch shape (B=512, H=12, S=197,
Dh=64, bf16).  Methodology: CHAIN dependent applications inside one jit
(q_{i+1} = f(q_i, k, v)) so the dev tunnel's per-call RPC latency is
amortized to one readback per measurement — a serial dispatch loop
measures ~32 ms of pure RPC, swamping the ~4 ms kernels.  Informs the
attn_impl default; e2e numbers remain the decider (docs/PERF.md)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CHAIN = 20
B, H, S, Dh = 512, 12, 197, 64
ATTN_FLOPS = 2 * 2 * B * H * S * S * Dh


def time_fn(fn, args, outer=3):
    import jax
    import jax.numpy as jnp

    def run(q, k, v):
        def body(i, qq):
            return fn(qq, k, v).astype(q.dtype)
        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, q)
                       .astype(jnp.float32))

    jf = jax.jit(run)
    np.asarray(jf(*args))  # compile + warm
    np.asarray(jf(*args))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def report(name, val):
    if isinstance(val, float):
        print(f"{name:28s}: {val * 1000:8.2f} ms  "
              f"({ATTN_FLOPS / val / 1e12:6.1f} TFLOP/s)", flush=True)
    else:
        print(f"{name:28s}: {val}", flush=True)


def measure(name, fn, args):
    try:
        val = time_fn(fn, args)
    except Exception as e:  # noqa: BLE001 — report and continue
        val = f"FAILED: {type(e).__name__}: {str(e)[:300]}"
    report(name, val)


def main():
    import jax.numpy as jnp

    from mcm_tpu.config import Precision
    from mcm_tpu.ops.attention import (_pallas_attention,
                                       _pallas_batched_attention,
                                       _pallas_mh_attention, _xla_attention)

    rng = np.random.default_rng(0)
    shape = (B, H, S, Dh)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    prec = Precision.fast()

    measure("xla_bf16sm",
            lambda q, k, v: _xla_attention(q, k, v, None, prec), (q, k, v))
    measure("pallas_fullS",
            lambda q, k, v: _pallas_attention(q, k, v), (q, k, v))
    for bh in (6, 3, 12):
        measure(f"pallas_mh_h{bh}",
                lambda q, k, v, bh=bh: _pallas_mh_attention(q, k, v,
                                                            block_h=bh),
                (q, k, v))
    for bb in (8, 16, 32):
        measure(f"pallas_batched_b{bb}",
                lambda q, k, v, bb=bb: _pallas_batched_attention(
                    q, k, v, block_bh=bb),
                (q, k, v))

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    pad = 256 - S
    blocks = BlockSizes(block_q=256, block_k_major=256, block_k=256,
                        block_b=1)

    def flash(q, k, v):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ab = jnp.zeros((B, H, 256, 256), jnp.bfloat16)
        ab = ab.at[:, :, :, S:].set(-1e9)
        return flash_attention(qp, kp, vp, ab=ab, sm_scale=Dh ** -0.5,
                               block_sizes=blocks)[:, :, :S]

    measure("jax_flash_pad256_ab", flash, (q, k, v))

    def flash_nb(q, k, v):
        # keys padded with zeros → wrong math for the tail; timing-only
        # datapoint isolating the ab-bias materialization cost
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return flash_attention(qp, kp, vp, sm_scale=Dh ** -0.5,
                               block_sizes=blocks)[:, :, :S]

    measure("jax_flash_pad256_nobias", flash_nb, (q, k, v))

    # S=256 XLA rows: the one unmeasured round-1 lever — would running the
    # whole tower at a 128-aligned sequence (pad once at embedding, mask
    # padded keys) beat XLA's unaligned S=197 schedule?  Presized inputs =
    # the model-level steady state (no per-layer pad/slice).  TFLOP/s
    # columns stay normalized to the S=197 useful FLOPs, so rows compare
    # as "effective rate at the real workload".
    S2 = 256
    q2 = jnp.asarray(rng.standard_normal((B, H, S2, Dh)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((B, H, S2, Dh)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((B, H, S2, Dh)), jnp.bfloat16)
    key_mask = jnp.zeros((1, 1, 1, S2), jnp.float32).at[..., S:].set(-1e9)

    measure("xla_S256_presized_mask",
            lambda q, k, v: _xla_attention(q, k, v, key_mask, prec),
            (q2, k2, v2))
    measure("xla_S256_presized_nomask",
            lambda q, k, v: _xla_attention(q, k, v, None, prec),
            (q2, k2, v2))


if __name__ == "__main__":
    main()
