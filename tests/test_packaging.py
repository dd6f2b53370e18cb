"""The pip distribution is real, not declared (VERDICT r4 item 4).

Builds the wheel offline, installs it into a fresh venv, and drives the
installed ``mcm-eval-ood`` entry point end-to-end on a synthetic tree —
proving the entry points exist, the package assets (class lists, decoder
source) ship, and nothing depends on a repo checkout.

The heavy dependencies (jax, numpy) can't be installed from the wheel's
requirements — no network egress in this environment — so the fresh venv
gets the HOST interpreter's site-packages appended via a ``.pth`` file
(``--system-site-packages`` doesn't work here: the host python is itself a
venv, so the flag would expose the bare base interpreter instead).  The
wheel installs with ``--no-index --no-deps`` into the venv's own
site-packages, which precede the ``.pth`` entries, and the smoke run
executes with the repo absent from ``sys.path`` — the IMPORTED package is
provably the installed one.
"""

import json
import os
import shutil
import site
import subprocess
import sys
import sysconfig
import venv

import pytest

from util_synth import make_imagefolder_tree, make_pet_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def srctree(tmp_path_factory):
    """A pristine copy of the source tree (tracked + unignored files).

    Building in the checkout with ``--no-build-isolation`` leaves
    ``build/lib`` behind, and setuptools' build_py only copies NEWER files
    into it and never removes deleted ones — a stale ``build/lib`` can
    leak content into the wheel that a clean build would not ship,
    false-greening the asset/entry-point assertions (review finding,
    round 5).  A fresh copy has no build state by construction."""
    dst = tmp_path_factory.mktemp("src") / "repo"
    files = subprocess.run(
        ["git", "-C", REPO, "ls-files", "-co", "--exclude-standard"],
        capture_output=True, text=True, timeout=60)
    assert files.returncode == 0, files.stderr
    for rel in files.stdout.splitlines():
        src = os.path.join(REPO, rel)
        if not os.path.isfile(src):
            continue
        tgt = dst / rel
        tgt.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, tgt)
    return str(dst)


@pytest.fixture(scope="module")
def wheel(srctree, tmp_path_factory):
    out = tmp_path_factory.mktemp("wheel")
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", srctree, "--no-deps",
         "--no-build-isolation", "-w", str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    wheels = [p for p in os.listdir(out) if p.endswith(".whl")]
    assert len(wheels) == 1, wheels
    return os.path.join(out, wheels[0])


@pytest.fixture(scope="module")
def installed(wheel, tmp_path_factory):
    """A venv with the wheel installed; returns its bin directory."""
    env_dir = tmp_path_factory.mktemp("venv") / "env"
    venv.create(env_dir, with_pip=True)
    bin_dir = env_dir / "bin"
    proc = subprocess.run(
        [str(bin_dir / "pip"), "install", "--no-index", "--no-deps", wheel],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # expose the host deps (jax/numpy/...) AFTER the venv's own packages
    host_site = sysconfig.get_paths()["purelib"]
    venv_site = subprocess.run(
        [str(bin_dir / "python"), "-c",
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        capture_output=True, text=True, timeout=60).stdout.strip()
    with open(os.path.join(venv_site, "host_deps.pth"), "w") as f:
        for p in dict.fromkeys([host_site, *site.getsitepackages()]):
            f.write(p + "\n")
    return bin_dir


def _clean_env():
    """No repo on sys.path, CPU backend (PYTHONPATH without .axon_site —
    the axon sitecustomize would override JAX_PLATFORMS, CLAUDE.md)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_wheel_ships_assets_and_decoder(installed):
    """Class-list assets and the C++ decoder source are package data."""
    proc = subprocess.run(
        [str(installed / "python"), "-c",
         "import json, os, mcm_tpu\n"
         "pkg = os.path.dirname(mcm_tpu.__file__)\n"
         "print(json.dumps({\n"
         "  'pkg': pkg,\n"
         "  'assets': sorted(os.listdir(os.path.join(pkg, 'data',"
         " 'assets')))[:3],\n"
         "  'decoder': os.path.exists(os.path.join(pkg, 'runtime',"
         " 'decoder.cpp')),\n"
         "}))"],
        capture_output=True, text=True, timeout=120, env=_clean_env(),
        cwd="/tmp")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not info["pkg"].startswith(REPO), info["pkg"]  # the INSTALLED one
    assert info["assets"], info
    assert info["decoder"] is True


def test_entry_point_help(installed):
    for ep in ("mcm-eval-ood", "mcm-eval-msp", "mcm-create-imagenet-subset",
               "mcm-serve"):
        proc = subprocess.run([str(installed / ep), "--help"],
                              capture_output=True, text=True, timeout=120,
                              env=_clean_env(), cwd="/tmp")
        assert proc.returncode == 0, (ep, proc.stdout + proc.stderr)
        assert "--in_dataset" in proc.stdout


def test_installed_cli_end_to_end(installed, tmp_path):
    """The installed entry point runs a full tiny evaluation outside the
    checkout: assets load, the decode path (native build or PIL fallback)
    works, results land in the reference layout."""
    root = tmp_path / "datasets"
    make_pet_tree(str(root), per_breed=6)
    make_imagefolder_tree(
        str(root / "ImageNet_OOD_dataset" / "dtd" / "images"),
        ["banded", "blotchy"], 5, color_bias=40)

    env = _clean_env()
    env["MCM_TPU_TEST_TINY_B16"] = "1"
    workdir = tmp_path / "run"
    workdir.mkdir()
    proc = subprocess.run(
        [str(installed / "mcm-eval-ood"), "--in_dataset", "pet37",
         "--root-dir", str(root), "-b", "8", "--allow_random_weights",
         "--out_datasets", "dtd", "--name", "pkg_smoke"],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(workdir))
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]

    # reference-identical layout: results/{ds}/{score}/{model}_{ckpt}_T_...
    # (the ckpt's "/" nests a directory level, like the reference)
    scores = list(workdir.rglob("ID_pet37_scores.npy"))
    assert len(scores) == 1, list(workdir.rglob("*"))
    results = scores[0].parent
    assert "results/pet37/MCM" in str(results)
    assert any(p.suffix == ".csv" for p in results.iterdir())
