"""Supervised ViT (MSP baseline) parity vs HF, MSP score, ODIN perturbation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcm_tpu.config import Precision, SupervisedViTConfig
from mcm_tpu.models import vit as jvit
from mcm_tpu.scores.msp import msp_scores
from mcm_tpu.scores.odin import make_odin_clip_perturb, odin_perturb

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = SupervisedViTConfig(image_size=32, patch_size=8, width=64, layers=2,
                           heads=4, num_classes=10)


@pytest.fixture(scope="module")
def hf_vit():
    cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256, num_labels=10)
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def params(hf_vit):
    sd = {k: v.numpy() for k, v in hf_vit.state_dict().items()}
    return jvit.convert_hf_vit(sd, TINY)


def test_vit_logits_parity(hf_vit, params):
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_vit(pixel_values=torch.from_numpy(pixels)).logits.numpy()
    ours = np.asarray(jvit.forward_logits(params, TINY, jnp.asarray(pixels),
                                          Precision.parity()))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_msp_score_semantics(rng):
    logits = jnp.asarray(rng.standard_normal((16, 10)), jnp.float32)
    msp = np.asarray(msp_scores(logits, "MCM", 1.0))
    smax = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(msp, -smax.max(-1), rtol=1e-6)
    # confident rows score lower (more ID)
    confident = jnp.zeros((1, 10)).at[0, 3].set(20.0)
    uniform = jnp.zeros((1, 10))
    assert float(msp_scores(confident)[0]) < float(msp_scores(uniform)[0])


def test_odin_perturbation_increases_confidence(rng):
    """ODIN's defining property: after perturbation, max softmax rises."""
    W = jnp.asarray(rng.standard_normal((48, 5)), jnp.float32)

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ W

    x = jnp.asarray(rng.standard_normal((8, 4, 4, 3)), jnp.float32)
    x2 = odin_perturb(logits_fn, x, noise_magnitude=0.01)
    assert x2.shape == x.shape
    before = np.asarray(jax.nn.softmax(logits_fn(x), -1)).max(-1)
    after = np.asarray(jax.nn.softmax(logits_fn(x2), -1)).max(-1)
    assert (after >= before - 1e-6).all()
    assert after.mean() > before.mean()


def test_odin_clip_closure(rng):
    D = 12
    Wenc = jnp.asarray(rng.standard_normal((4 * 4 * 3, D)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((7, D)), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)

    def encode(x):
        return x.reshape(x.shape[0], -1) @ Wenc

    perturb = make_odin_clip_perturb(encode, text, T=1.0,
                                     noise_magnitude=0.002)
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 3)), jnp.float32)
    x2 = perturb(x)
    assert x2.shape == x.shape
    assert not np.allclose(np.asarray(x2), np.asarray(x))


def test_full_size_vit_converter_consumes_every_key():
    """Real full-size HF ViT-base state dict (transformers.ViTConfig()
    defaults ARE google/vit-base-patch16-224's architecture; random init,
    no network) through the converter: every key read, shapes exact —
    mirrors the CLIP converters' key-coverage tests."""
    from mcm_tpu.config import SupervisedViTConfig

    cfg_hf = transformers.ViTConfig(num_labels=1000)
    with torch.device("meta"):  # shapes only — no 350 MB of random init
        model = transformers.ViTForImageClassification(cfg_hf)
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in model.state_dict().items()}
    cfg = SupervisedViTConfig(num_classes=1000)
    accessed = set()

    class Tracking(dict):
        def __getitem__(self, k):
            accessed.add(k)
            return dict.__getitem__(self, k)

    params = jvit.convert_hf_vit(Tracking(sd), cfg)
    missing = set(sd) - accessed
    assert not missing, f"converter never read: {sorted(missing)[:8]}"
    assert params["patch_embed"].shape == (16 * 16 * 3, 768)
    assert params["layers"]["attn"]["wq"].shape == (12, 768, 768)
    assert params["layers"]["mlp"]["w1"].shape == (12, 768, 3072)
    assert params["pos_emb"].shape == (197, 768)
    assert params["head"]["w"].shape == (768, 1000)


def test_resolve_vit_params_heals_corrupt_cache(tmp_path):
    """A truncated/garbage npz cache must warn and fall through the
    resolution ladder (same healing as resolve_clip_params) instead of
    raising and bricking every vit-Linear run."""
    (tmp_path / "vit-base-patch16-224.npz").write_bytes(b"not a zipfile")
    with pytest.warns(UserWarning, match="unreadable"):
        out = jvit.resolve_vit_params(TINY, str(tmp_path))
    assert out is None  # no snapshot next to it -> random-init fallback
