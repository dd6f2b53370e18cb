"""Geometry fuzz for the native decoder's PIL-parity contract: random
source sizes (upscales, near-target, extreme aspect ratios, odd dims)
must stay within the established ±2 LSB of the PIL pipeline — the fixed
shapes in test_native.py can't cover the resize filter's window edge
cases."""

import numpy as np
import pytest
from PIL import Image

from mcm_tpu.data.transforms import load_image_uint8
from mcm_tpu.runtime.native import decode_one, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native decoder unavailable")


def test_decode_parity_random_geometries(tmp_path):
    rng = np.random.default_rng(42)
    cases = [(rng.integers(8, 1200), rng.integers(8, 1200))
             for _ in range(18)]
    cases += [(223, 224), (224, 225), (225, 448), (8, 900), (900, 9),
              (224, 224), (227, 227)]
    for i, (h, w) in enumerate(cases):
        h, w = int(h), int(w)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"g{i}_{h}x{w}.jpg")
        Image.fromarray(img).save(p, quality=92)
        ref = load_image_uint8(p, 224).astype(np.int32)
        got = decode_one(p, 224)
        assert got is not None, (h, w)
        assert got.shape == ref.shape == (224, 224, 3), (h, w)
        diff = np.abs(ref - got.astype(np.int32))
        assert diff.max() <= 2, (h, w, diff.max())
        assert diff.mean() < 0.5, (h, w, diff.mean())
