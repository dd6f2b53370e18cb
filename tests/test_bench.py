"""bench.py helpers (the full bench needs the real chip; the driver runs
it — these pin the host-side pieces and the JSON-contract math)."""

import numpy as np


def test_flops_per_image_magnitude():
    import bench
    f = bench.vit_flops_per_image()
    # ViT-B/16 forward ≈ 35 GFLOPs/image (2·MAC convention)
    assert 33e9 < f < 37e9


def test_ensure_jpeg_tree_builds_and_caches(tmp_path, monkeypatch):
    import bench
    monkeypatch.setattr(bench, "E2E_TREE", str(tmp_path / "tree"))
    paths = bench.ensure_jpeg_tree(4)
    assert len(paths) == 4
    from PIL import Image
    w, h = Image.open(paths[0]).size
    assert (w, h) == (500, 375)
    # second call reuses the cache (no new files)
    again = bench.ensure_jpeg_tree(3)
    assert again == paths[:3]


def test_contending_processes_cpu_delta():
    import bench
    before = bench.python_cpu_snapshot()
    assert isinstance(before, dict)
    # zero delta -> zero contenders; synthetic delta -> counted
    assert bench.contending_processes(before, dict(before)) == 0
    if before:
        pid = next(iter(before))
        after = dict(before)
        after[pid] = before[pid] + 1000
        assert bench.contending_processes(before, after) == 1
