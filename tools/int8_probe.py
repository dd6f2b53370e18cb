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

    # Two honesty properties, both load-bearing:
    # (a) the weight matrix is carried through the loop (rolled one column
    #     per iteration) so the dot has a loop-carried dependence and no
    #     pass can hoist/CSE it out of the timed region;
    # (b) the accumulator consumes the FULL output (jnp.sum over all of
    #     y), so no slice-narrowing rewrite can legally shrink the matmul
    #     (an acc fed from y[:1,:1] would permit computing x[:1] @ w[:,:1]
    #     — 2·K FLOPs — instead of the full product).
    # The M×N reduction this adds is ~K/2 = 384× cheaper than the matmul.

    def bf16_chain(x, w):
        def body(i, carry):
            w, acc = carry
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return jnp.roll(w, 1, axis=1), acc + jnp.sum(y)
        return jax.lax.fori_loop(0, CHAIN, body, (w, jnp.float32(0)))[1]

    def int8_chain(x, w):
        def body(i, carry):
            w, acc = carry
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # fp32 sum: an int32 full-tensor sum would overflow (UB-free
            # but meaningless); the cast cost is part of (b)'s 1/384 tax
            return jnp.roll(w, 1, axis=1), acc + jnp.sum(
                y.astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, body, (w, jnp.float32(0)))[1]

    # quantize-on-the-fly variant: bf16 act -> int8 in the loop.  The
    # activations are ALSO chained (data-dependent epsilon) so the
    # quantization itself can't be hoisted — its per-iteration cost is the
    # point of this variant.
    def int8_dyn_chain(x, w):
        def body(i, carry):
            x, w, acc = carry
            s = jnp.max(jnp.abs(x)) / 127.0
            xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            out = jnp.sum(y.astype(jnp.float32)) * s
            x = x + (out * 1e-30).astype(x.dtype)
            return x, jnp.roll(w, 1, axis=1), acc + out
        return jax.lax.fori_loop(0, CHAIN, body,
                                 (x, w, jnp.float32(0)))[2]

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
