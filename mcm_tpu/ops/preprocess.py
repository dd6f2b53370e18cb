"""On-device image resizing + normalization as MXU matmuls.

Bilinear (triangle-filter, antialiased) resampling is a separable linear
operator: ``out = A_h · img · A_wᵀ`` with fixed coefficient matrices.  This
module builds those matrices with PIL's exact filter geometry (triangle
support scaled by the downscale ratio, per-row normalized — the same
algorithm torchvision's PIL backend runs on the host,
``train_eval_util.py:29-31``) and evaluates the resize as two batched
matmuls plus the fused ÷255-normalize — so the device does the resampling
at MXU speed and the host only decodes.

Use: host decodes JPEG + center-crops the shorter-side square (crop first ≡
resize-then-crop for centered square crops), ships a fixed-size uint8
buffer; :func:`resize_normalize` produces the [B, 224, 224, 3] normalized
tensor.  Exactness vs the PIL pipeline is tolerance-tested (PIL quantizes
coefficients to 8-bit fixed point; we keep fp32, differences ≤ 1/255-scale).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mcm_tpu.data.transforms import CLIP_MEAN, CLIP_STD, norm_coeffs


@functools.lru_cache(maxsize=64)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] PIL-geometry triangle-filter resampling matrix."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support
    A = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        w = 1.0 - np.abs((xs + 0.5 - center) / filterscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            A[i, xmin:xmax] = w / s
        else:
            A[i, min(max(int(center), 0), in_size - 1)] = 1.0
    return A.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_size", "dtype"))
def resize_normalize(batch_u8: jax.Array, out_size: int = 224,
                     mean: Tuple[float, ...] = CLIP_MEAN,
                     std: Tuple[float, ...] = CLIP_STD,
                     dtype=jnp.float32) -> jax.Array:
    """uint8 [B, S, S, 3] → normalized float [B, out, out, 3], on device.

    Square input (host center-crops the shorter-side square); resize is two
    MXU matmuls; ÷255 + mean/std fold into the coefficient scaling.
    """
    b, h, w, c = batch_u8.shape
    Ah = jnp.asarray(resize_matrix(h, out_size))        # [out, H]
    Aw = jnp.asarray(resize_matrix(w, out_size))        # [out, W]

    x = batch_u8.astype(jnp.float32)
    # precision="highest": TPU fp32 matmuls default to bf16 passes
    # (CLAUDE.md), and bf16 rounding on 0-255-scale pixel sums across two
    # chained einsums costs up to ~0.5 pixel-units — above this module's
    # documented ≤1/255-scale PIL-exactness budget.  The resize is a
    # negligible slice of the program, the towers keep their own policy.
    # rows: [out,H] x [B,H,W,C] -> [B,out,W,C]
    x = jnp.einsum("oh,bhwc->bowc", Ah, x,
                   preferred_element_type=jnp.float32,
                   precision="highest")
    # cols
    x = jnp.einsum("ow,bhwc->bhoc", Aw, x,
                   preferred_element_type=jnp.float32,
                   precision="highest")
    scale, shift = norm_coeffs(mean, std)
    return (x * jnp.asarray(scale) - jnp.asarray(shift)).astype(dtype)


def center_square_crop_u8(img: np.ndarray) -> np.ndarray:
    """Host-side: crop the centered shorter-side square from an HWC uint8
    image (the crop-first half of the device-resize pipeline).  Uses the
    same rounding as torchvision CenterCrop."""
    h, w = img.shape[:2]
    s = min(h, w)
    top = int(round((h - s) / 2.0))
    left = int(round((w - s) / 2.0))
    return img[top:top + s, left:left + s]
