"""Training capability: contrastive fine-tune step + linear probe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
from mcm_tpu.models.init import init_clip
from mcm_tpu.parallel import make_mesh, shard_params
from mcm_tpu.train import (clip_contrastive_loss, make_linear_probe_step,
                           make_train_step)
from mcm_tpu.train.linear_probe import train_linear_probe

TINY = CLIPConfig(
    name="tiny",
    vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                        heads=4, projection_dim=32),
    text=TextConfig(vocab_size=128, context_length=16, width=64, layers=2,
                    heads=4, projection_dim=32),
)


def _batch(rng, n=8):
    images = rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    ids = rng.integers(1, 100, size=(n, 16)).astype(np.int32)
    ids[:, -1] = 127
    return images, ids, np.ones_like(ids)


def test_contrastive_loss_perfect_alignment():
    """Identical, one-hot-distinct embeddings → near-zero loss at high scale."""
    feats = jnp.eye(4, 8)
    loss = clip_contrastive_loss(feats, feats, jnp.asarray(4.6052))
    assert float(loss) < 0.01
    # random mismatch → ~log(4)
    bad = jnp.roll(feats, 1, axis=0)
    assert float(clip_contrastive_loss(feats, bad, jnp.asarray(4.6052))) > 2.0


def test_train_step_reduces_loss(rng):
    params = init_clip(jax.random.key(0), TINY)
    init_state, step = make_train_step(TINY, precision=Precision.parity())
    state = init_state(params)
    images, ids, mask = _batch(rng)
    losses = []
    for _ in range(5):
        state, loss = step(state, images, ids, mask)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizes one repeated batch


def test_train_step_sharded_matches_single(rng):
    params = init_clip(jax.random.key(0), TINY)
    images, ids, mask = _batch(rng)

    def one_loss(mesh):
        p = shard_params(params, mesh)
        init_state, step = make_train_step(TINY,
                                           precision=Precision.parity(),
                                           mesh=mesh, remat=False)
        state, loss = step(init_state(p), images, ids, mask)
        return float(loss)

    l1 = one_loss(make_mesh(1))
    l8 = one_loss(make_mesh(8, model_parallel=2))
    assert l1 == pytest.approx(l8, rel=1e-5)


def test_init_state_applies_tp_shardings(rng):
    """init_state must place UN-sharded host params (the train_clip path)
    with the TP param shardings — params, gradients, and both AdamW
    moments otherwise replicate on every chip, defeating the model axis."""
    from mcm_tpu.parallel.mesh import MODEL_AXIS

    mesh = make_mesh(8, model_parallel=4)
    init_state, step = make_train_step(TINY, precision=Precision.parity(),
                                       mesh=mesh)
    state = init_state(init_clip(0, TINY))  # plain numpy pytree in

    def model_sharded(x):
        spec = getattr(x.sharding, "spec", ())
        return any(MODEL_AXIS in (s if isinstance(s, tuple) else (s,))
                   for s in spec if s is not None)

    wq = state.params["vision"]["layers"]["attn"]["wq"]
    assert model_sharded(wq), wq.sharding
    # optimizer moments inherit the placement (zeros_like over params)
    mus = [l for l in jax.tree_util.tree_leaves(state.opt_state)
           if getattr(l, "shape", None) == wq.shape]
    assert mus and all(model_sharded(m) for m in mus)
    # and the step still runs from this state
    images, ids, mask = _batch(rng)
    state, loss = step(state, images, ids, mask)
    assert np.isfinite(float(loss))


def test_remat_matches_no_remat(rng):
    params = init_clip(jax.random.key(0), TINY)
    images, ids, mask = _batch(rng)
    outs = []
    for remat in (False, True):
        init_state, step = make_train_step(TINY,
                                           precision=Precision.parity(),
                                           remat=remat)
        _, loss = step(init_state(params), images, ids, mask)
        outs.append(float(loss))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)


def test_pallas_bsd_vjp_grads_match_xla(rng):
    """attn_impl="pallas_bsd_vjp" (pallas forward, XLA-recompute VJP —
    the single-device TPU training default) must produce EXACTLY the XLA
    step's losses in fp32, including after an optimizer update (i.e. the
    gradients match; on CPU the wrapped forward routes to XLA, so this
    pins the custom_vjp plumbing — the kernel numerics are pinned by the
    on-chip inference tests)."""
    import dataclasses
    params = init_clip(jax.random.key(0), TINY)
    images, ids, mask = _batch(rng)
    losses = {}
    for impl in ("xla", "pallas_bsd_vjp"):
        precision = dataclasses.replace(Precision.parity(), attn_impl=impl)
        init_state, step = make_train_step(TINY, precision=precision)
        state, loss = step(init_state(params), images, ids, mask)
        _, loss2 = step(state, images, ids, mask)
        losses[impl] = (float(loss), float(loss2))
    assert losses["xla"][0] == pytest.approx(losses["pallas_bsd_vjp"][0],
                                             abs=1e-6)
    assert losses["xla"][1] == pytest.approx(losses["pallas_bsd_vjp"][1],
                                             abs=1e-5)


def test_pallas_bsd_vjp_rejects_multi_device():
    """The custom_vjp kernel path cannot be pjit-partitioned — an
    explicit request on a multi-device mesh must fail at build time."""
    import dataclasses
    precision = dataclasses.replace(Precision.fast(),
                                    attn_impl="pallas_bsd_vjp")
    with pytest.raises(ValueError, match="pjit-partitioned"):
        make_train_step(TINY, precision=precision, mesh=make_mesh(2))


def test_linear_probe_learns(rng):
    # two linearly separable blobs
    n = 200
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    labels = (feats[:, 0] > 0).astype(np.int32)
    feats[:, 1] = labels * 2.0  # make it easy
    probe, loss, acc = train_linear_probe(feats, labels, 2, epochs=80,
                                          batch_size=64)
    assert acc > 0.95
    assert np.isfinite(loss)
