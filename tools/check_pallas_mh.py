#!/usr/bin/env python
"""Real-chip equivalence check for the retired `_pallas_mh_attention` kernel.

Its in-kernel ``lax.fori_loop`` hangs interpret mode (CLAUDE.md), so unlike
the other kernels it cannot be covered by the CPU interpret-mode suite in
``tests/test_ops.py`` — this script asserts kernel-vs-XLA parity on the real
TPU, including the head-count-not-divisible-by-block_h tail case (ViT-L/14:
16 heads, block_h=6 → last head-group relies on Pallas edge padding).

Usage: python tools/check_pallas_mh.py   (exit 0 = parity holds)
"""

import numpy as np


def check(b: int, h: int, s: int, dh: int, block_h: int) -> float:
    import jax.numpy as jnp

    from mcm_tpu.config import Precision
    from mcm_tpu.ops.attention import _pallas_mh_attention, _xla_attention

    rng = np.random.default_rng(h * 1000 + block_h)
    q, k, v = (jnp.asarray(
        rng.standard_normal((b, h, s, dh)).astype(np.float32),
        dtype=jnp.bfloat16) for _ in range(3))
    ours = np.asarray(_pallas_mh_attention(q, k, v, block_h=block_h),
                      dtype=np.float32)
    ref = np.asarray(_xla_attention(q, k, v, None, Precision.fast()),
                     dtype=np.float32)
    err = float(np.max(np.abs(ours - ref)))
    print(f"B={b} H={h} S={s} Dh={dh} block_h={block_h}: max|Δ|={err:.2e}")
    # both paths are bf16-in/fp32-accumulate; only the softmax dtype differs
    assert err < 3e-2, f"kernel diverges from XLA: {err}"
    assert np.isfinite(ours).all()
    return err


if __name__ == "__main__":
    import jax
    assert jax.default_backend() != "cpu", (
        "this check needs the real TPU (interpret mode hangs on the "
        "kernel's fori_loop)")
    check(b=4, h=12, s=197, dh=64, block_h=6)    # ViT-B/16, exact groups
    check(b=4, h=16, s=197, dh=64, block_h=6)    # ViT-L/14, tail group
    check(b=4, h=12, s=50, dh=64, block_h=12)    # B/32 seq, one group
    print("pallas_mh == xla on TPU: OK")
