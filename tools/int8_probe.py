#!/usr/bin/env python
"""Probe: does XLA's int8 matmul actually run ~2x bf16 on this v5e?

Times the B/16 MLP-shaped matmul [B*S, D] @ [D, 4D] in bf16 vs int8
(int32 accumulation), device-chained to amortize tunnel RPC latency.
Informs whether an A8W8 'turbo' precision mode is worth building.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    M, K, N = 512 * 197, 768, 3072
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    CHAIN = 8

    def timed(fn, *args):
        jf = jax.jit(fn)
        np.asarray(jf(*args))
        np.asarray(jf(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jf(*args))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        return best

    def bf16_chain(x, w):
        def body(i, acc):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return acc + jnp.sum(y[:1, :1])
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    def int8_chain(x, w):
        def body(i, acc):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + jnp.sum(y[:1, :1])
        return jax.lax.fori_loop(0, CHAIN, body, jnp.int32(0))

    # quantize-on-the-fly variant: bf16 act -> int8 in the loop (real cost)
    def int8_dyn_chain(x, w):
        def body(i, acc):
            s = jnp.max(jnp.abs(x)) / 127.0
            xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + jnp.sum(y[:1, :1]).astype(jnp.float32) * s
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    flops = 2.0 * M * K * N
    t = timed(bf16_chain, xb, wb)
    print(f"bf16    : {t * 1000:7.2f} ms  {flops / t / 1e12:6.1f} TFLOP/s")
    t = timed(int8_chain, xi, wi)
    print(f"int8    : {t * 1000:7.2f} ms  {flops / t / 1e12:6.1f} TOP/s")
    t = timed(int8_dyn_chain, xb, wi)
    print(f"int8+dq : {t * 1000:7.2f} ms  {flops / t / 1e12:6.1f} TOP/s "
          f"(incl. on-the-fly activation quant)")


if __name__ == "__main__":
    main()
