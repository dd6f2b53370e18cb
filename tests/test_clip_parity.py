"""Parity of the JAX CLIP towers vs HuggingFace CLIPModel.

Builds a small *random* HF CLIPModel locally (no network), converts its state
dict through mcm_tpu.models.convert, and checks both towers agree with the
torch forward to fp32 tolerance.  This is the per-layer parity harness
SURVEY.md §7 calls for, on tiny shapes; real-checkpoint parity uses the same
code path (reference behavior: utils/detection_util.py:225,229-230).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
from mcm_tpu.models import clip as jclip
from mcm_tpu.models.convert import (convert_hf_clip, load_params, save_params)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = CLIPConfig(
    name="tiny",
    vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                        heads=4, projection_dim=32),
    text=TextConfig(vocab_size=128, context_length=16, width=48, layers=2,
                    heads=4, projection_dim=32),
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPConfig(
        vision_config=dict(image_size=32, patch_size=8, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, hidden_act="quick_gelu"),
        text_config=dict(vocab_size=128, max_position_embeddings=16,
                         hidden_size=48, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=192,
                         hidden_act="quick_gelu",
                         # EOT = largest id, like the OpenAI vocab (49407)
                         bos_token_id=126, eos_token_id=127),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return convert_hf_clip(sd, TINY)


def test_image_feature_parity(hf_model, params):
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)  # NCHW

    with torch.no_grad():
        ref = hf_model.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()

    ours = jclip.encode_image(params, TINY.vision, jnp.asarray(pixels),
                              Precision.parity())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_text_feature_parity(hf_model, params):
    rng = np.random.default_rng(2)
    # EOT convention: largest id (vocab_size-1) somewhere in each row.
    ids = rng.integers(1, 100, size=(4, 12)).astype(np.int64)
    lengths = [12, 9, 5, 12]
    mask = np.zeros_like(ids)
    for r, L in enumerate(lengths):
        ids[r, L - 1] = 127  # EOT = largest token id
        ids[r, L:] = 0
        mask[r, :L] = 1

    with torch.no_grad():
        ref = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()

    ours = jclip.encode_text(params, TINY.text, jnp.asarray(ids, jnp.int32),
                             jnp.asarray(mask, jnp.int32), Precision.parity())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_nhwc_nchw_equivalence(params):
    rng = np.random.default_rng(3)
    nchw = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    nhwc = nchw.transpose(0, 2, 3, 1)
    a = jclip.encode_image(params, TINY.vision, jnp.asarray(nchw))
    b = jclip.encode_image(params, TINY.vision, jnp.asarray(nhwc))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_bf16_close_to_fp32(params):
    rng = np.random.default_rng(4)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    hi = jclip.encode_image(params, TINY.vision, jnp.asarray(pixels),
                            Precision.parity())
    lo = jclip.encode_image(params, TINY.vision, jnp.asarray(pixels),
                            Precision.fast())
    # cosine similarity of embeddings must survive bf16
    hi_n = np.asarray(hi) / np.linalg.norm(hi, axis=-1, keepdims=True)
    lo32 = np.asarray(lo, dtype=np.float32)
    lo_n = lo32 / np.linalg.norm(lo32, axis=-1, keepdims=True)
    cos = (hi_n * lo_n).sum(-1)
    assert (cos > 0.995).all()


def test_params_npz_roundtrip(params, tmp_path):
    path = str(tmp_path / "tiny.npz")
    save_params(params, path)
    loaded = load_params(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_compiles(params):
    rng = np.random.default_rng(5)
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    out = jclip.encode_image_jit(params, TINY, pixels)
    assert out.shape == (2, 32)
