"""Multi-chip sharding on a virtual 8-device CPU mesh: TP+DP eval step
equals the single-device result, in single-device score order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
from mcm_tpu.models.init import init_clip
from mcm_tpu.parallel import EvalStep, make_mesh
from mcm_tpu.parallel.mesh import clip_param_specs, param_shardings
from mcm_tpu.scores import l2_normalize

# heads=8 so every grid up to model_parallel=8 passes validate_tp (tp must
# divide heads/width/mlp-hidden; non-dividing grids now fail fast by design)
TINY = CLIPConfig(
    name="tiny",
    vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                        heads=8, projection_dim=32),
    text=TextConfig(vocab_size=128, context_length=16, width=64, layers=2,
                    heads=8, projection_dim=32),
)


@pytest.fixture(scope="module")
def params():
    return init_clip(jax.random.key(0), TINY)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(16, 32, 32, 3), dtype=np.uint8)
    text = rng.standard_normal((10, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return images, text


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def _single_device_scores(params, images, text, score="MCM"):
    step = EvalStep(TINY, score=score, precision=Precision.parity(),
                    mesh=make_mesh(1))
    return np.asarray(step.score(step.put_params(params),
                                 step.put_batch(images),
                                 step.put_replicated(text)))


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_dp_tp_grid_matches_single_device(params, data, shape):
    images, text = data
    dp, tp = shape
    mesh = make_mesh(dp * tp, model_parallel=tp)
    step = EvalStep(TINY, score="MCM", precision=Precision.parity(),
                    mesh=mesh)
    got = np.asarray(step.score(step.put_params(params),
                                step.put_batch(images),
                                step.put_replicated(text)))
    want = _single_device_scores(params, images, text)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_score_order_preserved(params, data):
    """Per-row scores must land at the same indices as single-device —
    the ordered-gather requirement (SURVEY.md §2.4)."""
    images, text = data
    mesh = make_mesh(8)
    step = EvalStep(TINY, score="MCM", precision=Precision.parity(),
                    mesh=mesh)
    # make rows distinguishable: score one row at a time on one device
    singles = [
        _single_device_scores(params, np.repeat(images[i:i + 1], 16, 0),
                              text)[0]
        for i in range(4)
    ]
    full = np.asarray(step.score(step.put_params(params),
                                 step.put_batch(images),
                                 step.put_replicated(text)))
    np.testing.assert_allclose(full[:4], singles, rtol=1e-5, atol=1e-6)


def test_features_and_maha_sharded(params, data):
    images, _ = data
    mesh = make_mesh(4, model_parallel=2)
    step = EvalStep(TINY, precision=Precision.parity(), mesh=mesh)
    feats = np.asarray(step.features(step.put_params(params),
                                     step.put_batch(images)))
    assert feats.shape == (16, 32) and np.isfinite(feats).all()

    rng = np.random.default_rng(1)
    mu = rng.standard_normal((5, 32)).astype(np.float32)
    A = rng.standard_normal((32, 32)).astype(np.float32)
    P = (A @ A.T / 32 + np.eye(32)).astype(np.float32)
    scores = np.asarray(step.maha(step.put_batch(jnp.asarray(feats)),
                                  step.put_replicated(mu),
                                  step.put_replicated(P)))
    assert scores.shape == (16,) and np.isfinite(scores).all()


def test_encode_text_cached_path(params):
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 100, size=(6, 12)).astype(np.int32)
    ids[:, -1] = 127
    mask = np.ones_like(ids)
    step = EvalStep(TINY, precision=Precision.parity(), mesh=make_mesh(8))
    text = step.encode_text(step.put_params(params), ids, mask)
    assert text.shape == (6, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(text), axis=-1),
                               1.0, rtol=1e-5)


def test_param_specs_cover_param_tree(params):
    """Every param leaf must have a PartitionSpec (tree structures match)."""
    specs = clip_param_specs()
    jax.tree_util.tree_map(lambda p, s: None, params, specs)  # raises on mismatch


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)
    # requesting more devices than exist must raise, not silently shrink
    # (a 1-chip fallback would misattribute 8-chip throughput)
    with pytest.raises(ValueError, match="visible"):
        make_mesh(len(jax.devices()) + 1)


def test_tp_mesh_rejects_forced_pallas_impls():
    """Explicitly forced Pallas kernels must fail loudly on a TP mesh:
    pallas_call is opaque to the SPMD partitioner, so letting it through
    would silently all-gather the TP-sharded weights around the kernel
    ('auto' is rewritten to xla; a forced impl is a config error)."""
    import dataclasses
    mesh = make_mesh(4, model_parallel=2)
    with pytest.raises(ValueError, match="SPMD partitioner"):
        EvalStep(TINY, precision=dataclasses.replace(
            Precision.fast(), attn_impl="pallas_bsd"), mesh=mesh)
    with pytest.raises(ValueError, match="SPMD partitioner"):
        EvalStep(TINY, precision=dataclasses.replace(
            Precision.fast(), mlp_impl="pallas"), mesh=mesh)
    # 'auto' still quietly routes to xla (the existing behavior)
    step = EvalStep(TINY, precision=Precision.fast(), mesh=mesh)
    assert step.precision.attn_impl == "xla"
