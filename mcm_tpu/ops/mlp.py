"""Fused transformer-MLP Pallas kernel: fc1 → activation → fc2 in VMEM.

XLA cannot fuse matmul→matmul, so the [B·S, 4D] intermediate round-trips
HBM twice per layer (~1.24 GB at the B/16 batch shape ≈ 1.5 ms of the
measured 62%-MFU matmul gap).  This kernel tiles the token-row axis,
keeps both weight matrices VMEM-resident across the whole grid (constant
index map, ~9.4 MB bf16 for B/16), and never materializes the
intermediate.  Unlike the attention kernels (retired — docs/PERF.md),
the matmuls here are large enough to stream the MXU, so the Pallas
boundary costs nothing.

Activations: QuickGELU (CLIP, ``x·sigmoid(1.702x)``) or exact erf GELU
(supervised ViT), in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                act: str):
    h = jnp.dot(x_ref[:], w1_ref[:],
                preferred_element_type=jnp.float32)        # [M_blk, F]
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    h = h.astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "block_m"))
def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, act: str = "quick_gelu",
              block_m: int = 512) -> jax.Array:
    """[M, D] → fc1 [D, F] → act → fc2 [F, D] → [M, D], intermediate
    VMEM-only.  Grid over row tiles; weights resident across the grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    f = w1.shape[1]
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        grid=(pl.cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
