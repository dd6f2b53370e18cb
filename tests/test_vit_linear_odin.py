"""--model vit-Linear and --score odin through the main CLI (VERDICT r1
items 6/7), plus the --resume/--eval_accuracy feature cache (item 9).

Reference surfaces being made real: ``utils/detection_util.py:122-146``
(``input_preprocessing`` — ODIN, with the never-registered
``args.noiseMagnitude``) and its ``vit-Linear``/classifier branches.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from util_synth import make_imagefolder_tree, make_pet_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# CLI tests here assert orchestration (routing, artifacts, resume), not
# model math — run the structurally-identical tiny doubles
# (docs/TESTING.md); the full-size models are pinned by parity tests.
TINY_ENV = {"MCM_TPU_TEST_TINY_B16": "1", "MCM_TPU_TEST_TINY_VIT": "1"}
TINY_VIT_WIDTH = 128


def _run_cli(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO, **TINY_ENV)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_ood_detection.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vitlin")
    root = tmp / "datasets"
    make_pet_tree(str(root), per_breed=4)
    make_imagefolder_tree(str(root / "ImageNet_OOD_dataset" / "dtd" /
                              "images"), ["banded"], 4, color_bias=40)
    return tmp, str(root)


# ---------------------------------------------------------------------------
# unit level: tiny towers
# ---------------------------------------------------------------------------

def _tiny_vit_cfg():
    from mcm_tpu.config import SupervisedViTConfig
    return SupervisedViTConfig(image_size=32, patch_size=8, width=64,
                               layers=2, heads=4, num_classes=5)


def test_vit_linear_step_scores_and_features(rng):
    import jax

    from mcm_tpu.config import Precision
    from mcm_tpu.models.init import init_supervised_vit
    from mcm_tpu.parallel import VitLinearStep, make_mesh
    from mcm_tpu.scores.clip_scores import _scores_from_logits

    cfg = _tiny_vit_cfg()
    params = init_supervised_vit(jax.random.key(0), cfg)
    step = VitLinearStep(cfg, score="energy", T=2.0,
                         precision=Precision.parity(), mesh=make_mesh(4))
    params = step.put_params(params)
    images = rng.integers(0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    scores = np.asarray(step.score(params, step.put_batch(images)))
    logits = np.asarray(step.features(params, step.put_batch(images)))
    assert scores.shape == (8,) and logits.shape == (8, 5)
    assert np.isfinite(scores).all() and np.isfinite(logits).all()
    # features ARE the logits: scores must be recomputable from them
    expect = np.asarray(_scores_from_logits(logits, 2.0)["energy"])
    np.testing.assert_allclose(scores, expect, rtol=1e-5, atol=1e-6)


def test_vit_linear_rejects_tensor_parallel():
    from mcm_tpu.parallel import VitLinearStep, make_mesh
    with pytest.raises(ValueError, match="data-parallel only"):
        VitLinearStep(_tiny_vit_cfg(), mesh=make_mesh(4, model_parallel=2))


def test_odin_zero_noise_equals_mcm(rng):
    """ODIN with ε=0 is exactly temperature-scaled MSP — the perturbation
    is the only difference, so the two EvalStep programs must agree."""
    import jax

    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import EvalStep, make_mesh

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))
    params = init_clip(jax.random.key(0), tiny)
    images = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    text = rng.standard_normal((5, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    def run(score, eps):
        step = EvalStep(tiny, score=score, precision=Precision.parity(),
                        mesh=make_mesh(1), noise_magnitude=eps)
        p = step.put_params(params)
        return np.asarray(step.score(p, step.put_batch(images),
                                     step.put_replicated(text)))

    mcm = run("MCM", 0.0)
    odin0 = run("odin", 0.0)
    np.testing.assert_allclose(odin0, mcm, rtol=1e-5, atol=1e-6)
    odin = run("odin", 0.01)
    assert np.isfinite(odin).all()
    assert not np.allclose(odin, mcm)  # the perturbation must do something


def test_odin_forces_fp32_xla_program():
    """The ε-nudge is at the bf16 ULP and jax.grad can't differentiate the
    opt-in Pallas kernels — odin steps must run fp32 + XLA regardless of
    the requested fast mode."""
    import dataclasses

    import jax.numpy as jnp

    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.parallel import EvalStep, VitLinearStep, make_mesh

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))
    fast_pallas = dataclasses.replace(Precision.fast(), attn_impl="pallas",
                                      mlp_impl="pallas")
    step = EvalStep(tiny, score="odin", precision=fast_pallas,
                    mesh=make_mesh(1))
    assert step.precision.activation_dtype == jnp.float32
    assert step.precision.attn_impl == "xla"
    assert step.precision.mlp_impl == "xla"
    # jax.grad backprops through the [B,H,S,S] probs tensor — bf16
    # rounding there flips gradient signs near zero, and sign(grad) IS
    # the ODIN signal, so fast mode's bf16 softmax must be overridden too
    assert step.precision.softmax_dtype == jnp.float32
    vstep = VitLinearStep(_tiny_vit_cfg(), score="odin",
                          precision=fast_pallas, mesh=make_mesh(1))
    assert vstep.precision.activation_dtype == jnp.float32
    assert vstep.precision.mlp_impl == "xla"
    assert vstep.precision.softmax_dtype == jnp.float32


def test_odin_overrides_forced_pallas_on_tp_mesh():
    """The ODIN precision override runs BEFORE the TP forced-kernel
    rejection: score="odin" with a forced Pallas impl is silently
    overridden to XLA on a TP mesh exactly as it is on a DP mesh —
    previously the same config raised on TP while running fine on DP."""
    import dataclasses

    import jax.numpy as jnp

    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.parallel import EvalStep, make_mesh

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))
    fast_pallas = dataclasses.replace(Precision.fast(),
                                      attn_impl="pallas_bsd",
                                      mlp_impl="pallas")
    step = EvalStep(tiny, score="odin", precision=fast_pallas,
                    mesh=make_mesh(4, model_parallel=2))
    assert step.precision.attn_impl == "xla"
    assert step.precision.mlp_impl == "xla"
    assert step.precision.softmax_dtype == jnp.float32


def test_vit_linear_odin_scales_grad_sign_by_clip_std(rng, monkeypatch):
    """Reference quirk kept: ``input_preprocessing`` divides the gradient
    sign by the CLIP std for EVERY model — ``detection_util.py:141-143``
    hardcodes ``std=(0.26862954, ...)`` even on the vit-Linear branch
    whose pixels were (0.5,)-normalized.  Pin that VitLinearStep forwards
    CLIP_STD (not IMAGENET_STD) into odin_perturb."""
    import jax

    import mcm_tpu.scores.odin as odin_mod
    from mcm_tpu.config import Precision
    from mcm_tpu.data.transforms import CLIP_STD
    from mcm_tpu.models.init import init_supervised_vit
    from mcm_tpu.parallel import VitLinearStep, make_mesh

    seen = {}
    real = odin_mod.odin_perturb

    def spy(logits_fn, images, noise_magnitude, std):
        seen["std"] = tuple(float(s) for s in std)
        return real(logits_fn, images, noise_magnitude, std=std)

    monkeypatch.setattr(odin_mod, "odin_perturb", spy)
    cfg = _tiny_vit_cfg()
    params = init_supervised_vit(jax.random.key(0), cfg)
    step = VitLinearStep(cfg, score="odin", precision=Precision.parity(),
                         mesh=make_mesh(1), noise_magnitude=0.01)
    images = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    scores = np.asarray(step.score(step.put_params(params),
                                   step.put_batch(images)))
    assert np.isfinite(scores).all()
    assert seen["std"] == tuple(float(s) for s in CLIP_STD)


def test_vit_linear_features_are_clean_under_odin(rng):
    """features() feeds accuracy + the resume cache — it must return the
    UNperturbed classifier logits even when scoring uses ODIN."""
    import jax

    from mcm_tpu.config import Precision
    from mcm_tpu.models.init import init_supervised_vit
    from mcm_tpu.parallel import VitLinearStep, make_mesh

    cfg = _tiny_vit_cfg()
    params = init_supervised_vit(jax.random.key(0), cfg)
    images = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)

    def feats(score):
        step = VitLinearStep(cfg, score=score, precision=Precision.parity(),
                             mesh=make_mesh(1), noise_magnitude=0.01)
        p = step.put_params(params)
        return np.asarray(step.features(p, step.put_batch(images)))

    np.testing.assert_allclose(feats("odin"), feats("MCM"),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# CLI level
# ---------------------------------------------------------------------------

def test_cli_vit_linear(workdir):
    tmp, root = workdir
    # a trained linear-probe head for 37 pet classes (random stand-in)
    rng = np.random.default_rng(0)
    probe = tmp / "probe.npz"
    np.savez(probe,
             w=rng.standard_normal((TINY_VIT_WIDTH, 37)).astype(np.float32),
             b=np.zeros(37, np.float32))
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", root,
        "--model", "vit-Linear", "--score", "MCM", "--name", "vitlin",
        "-b", "8", "--out_datasets", "dtd", "--allow_random_weights",
        "--finetune_ckpt", str(probe), "--num_workers", "2",
        "--eval_accuracy",
    ], cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_dir = (tmp / "results" / "pet37" / "MCM" /
               "vit-Linear_ViT-B/16_T_1_ID_vitlin")
    assert (log_dir / "vitlin.csv").exists()
    log = (log_dir / "ood_eval_info.log").read_text()
    assert "ID classifier accuracy" in log
    # scores derive from the 37-way probe head, not the 1000-way random head
    feats = np.load(log_dir / "ID_pet37_features.npz")["features"]
    assert feats.shape[1] == 37


def test_cli_vit_linear_rejects_maha(workdir):
    tmp, root = workdir
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", root,
        "--model", "vit-Linear", "--score", "maha", "--name", "bad",
        "--allow_random_weights",
    ], cwd=str(tmp))
    assert proc.returncode != 0
    assert "not supported with --model vit-Linear" in proc.stderr


def test_cli_odin(workdir):
    tmp, root = workdir
    proc = _run_cli([
        "--in_dataset", "pet37", "--root-dir", root,
        "--score", "odin", "--name", "odinsmoke", "-b", "4",
        "--out_datasets", "dtd", "--allow_random_weights",
        "--noiseMagnitude", "0.002", "--num_workers", "2",
        "--eval_accuracy",
    ], cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_dir = (tmp / "results" / "pet37" / "odin" /
               "CLIP_ViT-B/16_T_1_ID_odinsmoke")
    assert (log_dir / "odinsmoke.csv").exists()
    # --eval_accuracy must not be silently dropped on the odin path
    log = (log_dir / "ood_eval_info.log").read_text()
    assert "ID zero-shot accuracy" in log


def test_cli_eval_accuracy_resume_uses_cached_features(workdir):
    tmp, root = workdir
    common = ["--in_dataset", "pet37", "--root-dir", root,
              "--score", "MCM", "--name", "accres", "-b", "8",
              "--out_datasets", "dtd", "--allow_random_weights",
              "--num_workers", "2", "--eval_accuracy"]
    proc = _run_cli(common, cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_dir = (tmp / "results" / "pet37" / "MCM" /
               "CLIP_ViT-B/16_T_1_ID_accres")
    feat_path = log_dir / "ID_pet37_features.npz"
    data = np.load(feat_path)
    assert data["features"].shape[0] == len(data["labels"])

    # plant a 3-row cache; a resumed run must derive ID scores from it
    # instead of re-extracting the full val set
    np.savez(feat_path, features=data["features"][:3],
             labels=data["labels"][:3])
    # the eval_accuracy path must also have cached the prompt features on
    # the host — a fully-cached resume performs ZERO device text encodes
    # (on tunneled dev TPUs the first d2h per process costs minutes)
    assert (log_dir / "ID_pet37_text_features.npz").exists()

    proc = _run_cli(common + ["--resume"], cwd=str(tmp))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resume: loaded cached ID features" in proc.stderr + proc.stdout
    assert "resume: loaded cached text features" in proc.stderr + proc.stdout
    assert np.load(log_dir / "ID_pet37_scores.npy").shape[0] == 3
