"""Full CLI → CSV integration on synthetic data (no checkpoints, no network):
the reference's `python eval_ood_detection.py ...` surface end to end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from util_synth import make_imagefolder_tree, make_pet_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_datasets(tmp_path):
    root = tmp_path / "datasets"
    make_pet_tree(str(root), per_breed=6)
    make_imagefolder_tree(str(root / "ImageNet_OOD_dataset" / "dtd" / "images"),
                          ["banded", "blotchy"], 5, color_bias=40)
    return str(root)


def _run_cli(args, cwd, full_size=False):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    if not full_size:
        # orchestration tests (results layout, resume, determinism) don't
        # need 12-layer forwards on one CPU core — the tiny structurally-
        # identical B/16 double keeps them fast (docs/TESTING.md); model
        # math at full size is pinned by test_golden_parity +
        # test_crossimpl_e2e, and one full-size CLI e2e test remains
        env["MCM_TPU_TEST_TINY_B16"] = "1"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_ood_detection.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    data_root = _make_datasets(tmp)
    return tmp, data_root


def test_cli_end_to_end(workdir):
    tmp, data_root = workdir
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", data_root,
        "--score", "MCM", "--name", "smoke", "-b", "8",
        "--out_datasets", "dtd", "--allow_random_weights",
        "--num_workers", "2",
    ], cwd=str(tmp), full_size=True)
    assert proc.returncode == 0, proc.stderr[-3000:]

    log_dir = (tmp / "results" / "pet37" / "MCM" /
               "CLIP_ViT-B/16_T_1_ID_smoke")
    csv = log_dir / "smoke.csv"
    assert csv.exists(), f"missing CSV; stderr: {proc.stderr[-2000:]}"
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == ",FPR95,AUROC,AUPR"
    rows = {l.split(",")[0] for l in lines[1:]}
    assert rows == {"dtd", "AVG"}
    assert (log_dir / "ood_eval_info.log").exists()
    assert (log_dir / "ID_pet37_scores.npy").exists()
    assert (log_dir / "dtd_scores.npy").exists()


def test_cli_resume_reuses_scores(workdir):
    tmp, data_root = workdir
    # skew the cached ID scores; --resume must reuse them (different AUROC)
    log_dir = (tmp / "results" / "pet37" / "MCM" /
               "CLIP_ViT-B/16_T_1_ID_smoke")
    np.save(log_dir / "ID_pet37_scores.npy",
            np.full(12, -1.0, dtype=np.float32))
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", data_root,
        "--score", "MCM", "--name", "smoke", "-b", "8",
        "--out_datasets", "dtd", "--allow_random_weights", "--resume",
        "--num_workers", "2",
    ], cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resume: loaded cached scores" in proc.stderr + proc.stdout
    csv_text = (log_dir / "smoke.csv").read_text()
    # all-(-1) ID scores dominate every OOD score → AUROC 100
    assert "100.0" in csv_text


def test_cli_requires_weights_by_default(workdir):
    tmp, data_root = workdir
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", data_root,
        "--score", "MCM", "--name", "noweights", "-b", "8",
        "--out_datasets", "dtd",
    ], cwd=str(tmp))
    assert proc.returncode != 0
    assert "no pretrained weights" in proc.stderr


def test_cli_maha_end_to_end(workdir):
    tmp, data_root = workdir
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", data_root,
        "--score", "maha", "--name", "maha_smoke", "-b", "4",
        "--out_datasets", "dtd", "--allow_random_weights",
        "--num_workers", "2", "--template_dir", str(tmp / "templates"),
    ], cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_dir = (tmp / "results" / "pet37" / "maha" /
               "CLIP_ViT-B/16_T_1_ID_maha_smoke")
    assert (log_dir / "maha_smoke.csv").exists()
    assert any(f.startswith("templates_") for f in
               os.listdir(tmp / "templates"))


def test_cli_scores_deterministic_across_runs(workdir):
    """Two independent CLI processes, same seed → byte-identical score
    arrays. Locks in that the threaded decode pool, async dispatch, and
    one-behind readback introduce no run-to-run nondeterminism (the CSVs
    are derived from these arrays, so this is the strongest artifact-level
    determinism claim)."""
    tmp, data_root = workdir
    args = ["--in_dataset", "pet37", "--root-dir", data_root,
            "--score", "MCM", "--name", "det", "-b", "8",
            "--out_datasets", "dtd", "--allow_random_weights",
            "--num_workers", "2"]
    assert _run_cli(args, cwd=str(tmp)).returncode == 0
    log_dir = (tmp / "results" / "pet37" / "MCM" /
               "CLIP_ViT-B/16_T_1_ID_det")
    first = {f: (log_dir / f).read_bytes()
             for f in ["ID_pet37_scores.npy", "dtd_scores.npy"]}
    csv1 = (log_dir / "det.csv").read_text()

    assert _run_cli(args, cwd=str(tmp)).returncode == 0  # no --resume
    for f, blob in first.items():
        assert (log_dir / f).read_bytes() == blob, f"{f} differs"
    assert (log_dir / "det.csv").read_text() == csv1
