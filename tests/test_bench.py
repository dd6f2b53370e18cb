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


def test_guarded_clean_first_attempt(monkeypatch):
    """No contention → one measurement, zero retries."""
    import bench
    monkeypatch.setattr(bench, "python_cpu_snapshot", lambda: {})
    calls = []
    val, contenders, retries = bench.guarded(lambda: calls.append(1) or 42.0)
    assert (val, contenders, retries) == (42.0, 0, 0)
    assert len(calls) == 1


def test_guarded_retries_and_keeps_cleanest(monkeypatch):
    """Contended first attempt → retry; the clean attempt wins even when
    its value is lower (contamination inflates nothing here, but the tie
    rule is (fewest contenders, then highest value))."""
    import bench
    snaps = iter([{1: 0}, {1: 1000},    # attempt 1: pid 1 burned CPU
                  {1: 1000}, {1: 1000}])  # attempt 2: quiet
    monkeypatch.setattr(bench, "python_cpu_snapshot", lambda: next(snaps))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    vals = iter([99.0, 42.0])
    val, contenders, retries = bench.guarded(lambda: next(vals))
    assert (val, contenders, retries) == (42.0, 0, 1)


def test_guarded_exhausts_retries_under_sustained_contention(monkeypatch):
    """Contention on every attempt → returns best-value attempt, reports
    the contender count so the artifact is explicitly flagged."""
    import bench
    monkeypatch.setattr(bench, "python_cpu_snapshot",
                        _AlternatingSnapshot())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    vals = iter([10.0, 30.0, 20.0, 25.0])
    val, contenders, retries = bench.guarded(lambda: next(vals), retries=3)
    assert val == 30.0
    assert contenders == 1
    assert retries == 3


class _AlternatingSnapshot:
    """Every (before, after) pair shows pid 1 burning CPU."""

    def __init__(self):
        self.t = 0

    def __call__(self):
        self.t += 1000
        return {1: self.t}


def test_guarded_key_function(monkeypatch):
    """Window lists compare by the supplied key (max), not list order."""
    import bench
    snaps = iter([{1: 0}, {1: 1000}, {}, {}])
    monkeypatch.setattr(bench, "python_cpu_snapshot", lambda: next(snaps))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    vals = iter([[5.0, 50.0], [10.0, 20.0]])
    val, contenders, retries = bench.guarded(lambda: next(vals), key=max)
    assert val == [10.0, 20.0]   # clean attempt beats contended-but-faster
    assert contenders == 0
