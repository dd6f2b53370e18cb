"""Fused attention Pallas kernel for the ViT encoder shapes.

Replaces the XLA path's materialized [B, H, S, S] probability tensor
(e.g. 953 MB fp32 at B=512, H=12, S=197) with a VMEM-resident
QKᵀ → softmax → PV fusion: each grid program holds one query tile and the
full K/V for its (batch, head) — encoder sequences are short (50–257), so
no online-softmax streaming is needed; the whole score row fits on chip.

Layout: [B*H, S, Dh] per (batch·head) program, query-tiled.  Tail query
tiles (S not a multiple of the tile) are handled by Pallas edge padding —
garbage rows compute but never store.  Softmax runs in fp32; both matmuls
accumulate fp32 on the MXU.

Falls back to the pure-jnp implementation (identical numerics, tested)
off-TPU or when an additive mask is supplied (the 77-token text tower is
too small to matter).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mcm_tpu.config import Precision


def _xla_attention(q, k, v, mask, precision: Precision):
    """XLA attention.  ``precision.softmax_dtype`` controls the dtype of the
    [B, H, S, S] logits/probability tensor — the hot loop's largest
    intermediate; bf16 halves its HBM traffic (+12% e2e on v5e) while the
    exp stays in fp32 for range safety."""
    compute_dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    sdt = precision.softmax_dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        precision=precision.matmul_precision,
                        preferred_element_type=sdt)
    if mask is not None:
        logits = logits + mask.astype(sdt)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp((logits - m).astype(jnp.float32)).astype(sdt)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      precision=precision.matmul_precision,
                      preferred_element_type=jnp.float32
                      ).astype(compute_dtype)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # matmul inputs stay in the storage dtype (bf16 → full-rate MXU pass,
    # fp32 accumulation via preferred_element_type); softmax math in fp32.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    logits = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [blk_q, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)   # [blk_q, Dh]
    o_ref[0] = o.astype(o_ref.dtype)


def _mh_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         heads: int):
    """All heads of one image per program: the head axis is a LEADING
    (untiled) block dim, so per-head slices are full [S, Dh] tiles and the
    fori_loop amortizes program overhead 12× vs a per-(batch·head) grid."""

    def body(h, _):
        q = (q_ref[0, h].astype(jnp.float32) * scale).astype(q_ref.dtype)
        logits = jax.lax.dot_general(
            q, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [S, S]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


@functools.partial(jax.jit, static_argnames=("block_h",))
def _pallas_mh_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         block_h: int = 6) -> jax.Array:
    """Grid over (image, head-group); one program loops its group's heads
    with the head axis LEADING (untiled), amortizing program overhead
    ``block_h``× vs a per-(batch·head) grid.  block_h bounds VMEM:
    4 tensors × 2 pipeline buffers × block_h·S·Dh."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, dh = q.shape
    scale = dh ** -0.5
    spec = pl.BlockSpec((1, block_h, s, dh), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mh_attention_kernel, scale=scale, heads=block_h),
        grid=(b, pl.cdiv(h, block_h)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
    )(q, k, v)


def _batched_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One BATCHED dot_general over the program's (batch·head) block.

    The per-head kernels above issue small [S,Dh]×[Dh,S] matmuls one at a
    time (fori_loop) and pay MXU pipeline drain per matmul; here the batch
    dimension is carried by the dot itself, giving Mosaic the whole GEMM
    sequence at once to schedule back-to-back — the same property that
    makes XLA's batched-GEMM attention fast."""
    q = (q_ref[...].astype(jnp.float32) * scale).astype(q_ref.dtype)
    logits = jax.lax.dot_general(
        q, k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [blk, S, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [blk, S, Dh]
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_bh",))
def _pallas_batched_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                              block_bh: int = 16) -> jax.Array:
    """Grid over (batch·head)-groups; each program runs ONE 3D batched
    dot_general pair for its whole block (vs the sequential per-head
    matmuls of ``_pallas_mh_attention``).  VMEM per program ≈
    block_bh · (4·S·Dh·2B double-buffered + S²·4B logits) — block_bh=16 at
    the encoder shape ≈ 6 MB."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, dh = q.shape
    scale = dh ** -0.5
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)
    spec = pl.BlockSpec((block_bh, s, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_batched_attention_kernel, scale=scale),
        grid=(pl.cdiv(b * h, block_bh),),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, s, dh)


def _bsd_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                          dh: int):
    """Batched-dot attention over [blk, S, 128] lane-tiles of the
    projections' natural [B, S, D] layout (128 = two Dh=64 heads).

    The head gather happens in the BLOCK DMA: the grid runs over
    (batch-chunk, head-pair) and Pallas DMAs each pair's strided HBM
    slice into VMEM, overlapped with compute; the two heads inside the
    128-lane tile are static lane slices (Mosaic requires minor block
    dims divisible by 128, so per-64-lane blocking is not expressible —
    but in-register 64-lane slicing is fine).  The HBM-materialized
    [B, H, S, Dh] transposes that sank the earlier kernels e2e never
    exist, and — unlike XLA's transpose copy — each element is READ
    once, never written back.

    The fp32 in-probs softmax is kept deliberately: a chip decomposition
    (tools/bsd_probe.py) shows the WHOLE softmax costs 0.26 ms of the
    3.19 ms kernel (fully overlapped with the MXU), and both measured
    alternatives — dividing the [blk, S, Dh] output instead of the
    [S, S] probs (tools/bsd_probe.py, "deferdiv" row) and an all-bf16
    softmax — are timing-neutral while losing precision.  The kernel is
    dots/layout bound at a 2.93 ms no-softmax floor."""
    blk, s, lanes = q_ref.shape
    outs = []
    for j in range(lanes // dh):
        sl = slice(j * dh, (j + 1) * dh)
        q = (q_ref[:, :, sl].astype(jnp.float32) * scale
             ).astype(q_ref.dtype)
        logits = jax.lax.dot_general(
            q, k_ref[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [blk, S, S]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))     # [blk, S, Dh]
    o_ref[...] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_b"))
def _pallas_bsd_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          heads: int, block_b: int = 16) -> jax.Array:
    """Attention straight from [B, S, D] projections to a [B, S, D] result
    (head axes never materialize in HBM).  VMEM per program ≈
    4·block_b·S·128·2B double-buffered + 2·block_b·S²·4B logits+probs —
    block_b=16 at the B/16 encoder shape ≈ 13 MB (measured on v5e:
    3.27 ms/layer-batch vs XLA's 4.40, and no [B,H,S,Dh] HBM layouts)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = q.shape
    dh = d // heads
    if 128 % dh or d % 128:
        raise ValueError(f"pallas_bsd needs Dh dividing 128 and D a "
                         f"multiple of 128, got Dh={dh}, D={d}")
    scale = dh ** -0.5
    spec = pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bsd_attention_kernel, scale=scale, dh=dh),
        grid=(pl.cdiv(b, block_b), d // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      block_q: int = 256) -> jax.Array:
    # default block covers the whole encoder sequence (≤257): one program
    # per (batch·head), K/V fetched once — measured faster than 128-tiles
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, dh = q.shape
    scale = dh ** -0.5
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)

    grid = (b * h, pl.cdiv(s, block_q))
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, s, dh)


def _flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """jax's reference TPU FlashAttention at the encoder shape.

    The kernel requires 128-multiple sequence blocks, so S is padded to the
    next multiple of 128 with segment-ids masking the tail keys (VMEM-cheap:
    two int32 [B, S_pad] arrays — NOT the [B, H, S, S] ``ab`` bias, which
    would materialize more HBM traffic than the kernel saves)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, h, s, dh = q.shape
    s_pad = -(-s // 128) * 128
    pad = s_pad - s
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
    seg = jnp.zeros((b, s_pad), jnp.int32).at[:, s:].set(1)
    qseg = jnp.zeros((b, s_pad), jnp.int32)  # q tail masked via slicing below
    # block size must DIVIDE s_pad (the kernel asserts): whole-sequence
    # blocks up to 512, else fall back to 128 (divides any 128-multiple)
    blk = s_pad if s_pad <= 512 else 128
    out = flash_attention(
        q, k, v, segment_ids=SegmentIds(q=qseg, kv=seg),
        sm_scale=dh ** -0.5,
        block_sizes=BlockSizes(block_q=blk, block_k_major=blk,
                               block_k=blk, block_b=1))
    return out[:, :, :s] if pad else out


def _bsd_block_b(s: int, b: int = 1 << 30, itemsize: int = 2) -> int:
    """Largest batch block whose per-program VMEM footprint (4
    ``itemsize``-byte [blk, S, 128] tensors double-buffered + fp32 logits
    and probs) stays under ~14 MB of the 16 MB scoped-vmem limit, clamped
    to the actual batch: a serving bucket of 1 image would otherwise pad
    to a 16-wide block and spend 16× the attention compute on discarded
    rows.  (The footprint is per 128-lane tile, independent of D.)

    The ladder includes the non-power-of-two 12 for L/14's S=257, where
    16 busts the budget (16.9 MB) but 12 fits (12.1 MB) and measures
    3.24 ms/layer-batch vs block 8's 3.40 on the v5e
    (tools/bsd_block_probe.py; the edge-pad at B % 12 != 0 is covered by
    the kernel's cdiv grid).  Blocks above 16 showed no gain at S=50
    (B/32: 1.62 ms at 32 vs 1.63 at 16) and fail the Mosaic compiler at
    64+, so 16 stays the top rung."""
    for blk in (16, 12, 8, 4, 2, 1):
        est = 4 * blk * s * 128 * itemsize * 2 + 2 * blk * s * s * 4
        if est <= 14 * 1024 * 1024:
            return min(blk, b)
    return 1


def trainable_encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                heads: int,
                                precision: Precision) -> jax.Array:
    """Differentiable wrapper bringing the pallas_bsd forward to training
    (``attn_impl="pallas_bsd_vjp"``): forward = the auto-routed kernel,
    backward = ``jax.vjp`` of the mathematically-identical XLA attention
    recomputed from q/k/v.  Under the train step's gradient checkpointing
    this measures **231.7 ms/step vs 256.3 for pure XLA (−9.6%)** at
    B/16 batch 64 on the v5e (tools/train_attn_probe.py; fp32 loss
    deltas vs the XLA step: 0.0).  Memory is unchanged: the residuals
    are the function's own inputs, so ``jax.checkpoint`` stores nothing
    extra.  Gradients are exactly those of the XLA attention function;
    the primal differs from it only by the kernel's bf16 delta
    (≤1.6e-05, pinned on-chip by the inference tests).

    Unsafe inside a pjit-partitioned multi-device program (the XLA
    partitioner cannot split the pallas custom call) — the train step
    only selects it on single-device meshes."""
    import dataclasses

    fwd_p = dataclasses.replace(precision, attn_impl="auto")
    bwd_p = dataclasses.replace(precision, attn_impl="xla")

    @jax.custom_vjp
    def attn(q, k, v):
        return encoder_attention(q, k, v, heads=heads, mask=None,
                                 precision=fwd_p)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, pullback = jax.vjp(
            lambda a, b, c: encoder_attention(a, b, c, heads=heads,
                                              mask=None, precision=bwd_p),
            q, k, v)
        return pullback(g)

    attn.defvjp(fwd, bwd)
    return attn(q, k, v)


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                      heads: int, mask: Optional[jax.Array],
                      precision: Precision) -> jax.Array:
    """Multi-head attention straight from the projections' [B, S, D]
    layout to a [B, S, D] result — the model-level entry point.

    Routes to the ``pallas_bsd`` kernel when it applies (TPU, unmasked,
    bf16 fast mode, Dh | 128 and 128 | D): measured 3.27 ms/layer-batch
    vs XLA's 4.40 at the B/16 encoder shape AND no [B, H, S, Dh] HBM
    layout materialization — +27% end-to-end (3741 vs 2945 img/s on
    v5e, docs/PERF.md round 3).  Everything else (text tower's causal
    mask, CPU tests, parity mode, odd head dims) takes the split-heads
    XLA/explicit-impl path, whose numerics are the golden-tested
    reference."""
    b, s, d = q.shape
    dh = d // heads
    impl = None if precision.attn_impl == "auto" else precision.attn_impl
    if impl == "pallas_bsd_vjp":
        if mask is not None:
            impl = "xla"   # masked (text-tower) calls: XLA, like below
        else:
            return trainable_encoder_attention(q, k, v, heads, precision)
    # The kernel needs heads to evenly tile D into lane-sliceable pairs;
    # d % heads guards a heads count that doesn't divide D, which the
    # split-heads path would reject with a reshape error but the kernel
    # would silently compute with fake slice-derived "heads".
    bsd_shapes_ok = (d % heads == 0 and d % 128 == 0 and 128 % dh == 0)
    bsd_ok = (mask is None and bsd_shapes_ok
              and jax.default_backend() != "cpu")
    if impl == "pallas_bsd" and mask is not None:
        # masked (text-tower) calls fall back to the XLA path, exactly
        # like every other forced kernel impl below
        impl = "xla"
    elif impl == "pallas_bsd" or (
            impl is None and bsd_ok
            and precision.activation_dtype == jnp.bfloat16):
        if not bsd_shapes_ok:
            raise ValueError("attn_impl=pallas_bsd needs heads | D, "
                             "Dh | 128 and 128 | D; got "
                             f"D={d}, heads={heads}, Dh={dh}")
        return _pallas_bsd_attention(
            q, k, v, heads=heads,
            block_b=_bsd_block_b(s, b, itemsize=q.dtype.itemsize))

    def split(x):
        return x.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    out = fused_attention(split(q), split(k), split(v), mask, precision,
                          impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None,
                    precision: Precision = Precision.fast(),
                    impl: Optional[str] = None) -> jax.Array:
    """Multi-head attention [B, H, S, Dh] → [B, H, S, Dh] (pre-split
    heads; :func:`encoder_attention` is the model-level [B, S, D] entry).

    ``impl``: "flash" | "pallas" | "pallas_mh" | "pallas_batched" |
    "xla" | None (auto).
    """
    if impl is None:
        # The best SPLIT-HEADS choice is XLA (docs/PERF.md round 2:
        # 4.40 ms/layer vs 6.27 for the best per-head kernel — small
        # per-head matmuls drain the MXU per program while XLA's batched
        # GEMM streams it).  The round-3 pallas_bsd kernel beats both,
        # but it consumes [B, S, D] directly — routed above this layer
        # in encoder_attention, never through this split-heads surface.
        impl = "xla"
    if impl == "flash" and mask is None:
        return _flash_attention(q, k, v)
    if impl == "pallas" and mask is None:
        return _pallas_attention(q, k, v)
    if impl == "pallas_mh" and mask is None:
        return _pallas_mh_attention(q, k, v)
    if impl == "pallas_batched" and mask is None:
        return _pallas_batched_attention(q, k, v)
    return _xla_attention(q, k, v, mask, precision)
