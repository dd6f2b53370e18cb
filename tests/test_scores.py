"""Score-function semantics vs independent numpy implementations of the
reference behavior (utils/detection_util.py:226-248, 148-207)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mcm_tpu.scores import (CLIP_SCORES, compute_scores, l2_normalize,
                            estimate_mean_precision, mahalanobis_score)
from mcm_tpu.scores.clip_scores import compute_all_scores


def _numpy_reference_scores(img, txt, T):
    """Reference hot-loop math in plain numpy (spec, not code, from
    detection_util.py:226-248)."""
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = img @ txt.T
    scaled = logits / T
    e = np.exp(scaled - scaled.max(axis=1, keepdims=True))
    smax = e / e.sum(axis=1, keepdims=True)
    out = {
        "MCM": -smax.max(axis=1),
        "max-logit": -logits.max(axis=1),
        "energy": -(T * (np.log(np.exp(scaled - scaled.max(1, keepdims=True))
                                .sum(1)) + scaled.max(1))),
        "entropy": -(smax * np.log(smax)).sum(axis=1),
        "var": -smax.var(axis=1),
    }
    return out


@pytest.mark.parametrize("score", CLIP_SCORES)
@pytest.mark.parametrize("T", [1.0, 2.0])
def test_scores_match_reference_math(rng, score, T):
    img = rng.standard_normal((32, 64)).astype(np.float32)
    txt = rng.standard_normal((10, 64)).astype(np.float32)
    ref = _numpy_reference_scores(img, txt, T)[score]

    txt_n = np.asarray(l2_normalize(jnp.asarray(txt)))
    ours = np.asarray(compute_scores(jnp.asarray(img), jnp.asarray(txt_n),
                                     score=score, T=T))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_entropy_matches_scipy(rng):
    from scipy.stats import entropy
    img = rng.standard_normal((16, 32)).astype(np.float32)
    txt = rng.standard_normal((7, 32)).astype(np.float32)
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = imgn @ txtn.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    smax = e / e.sum(1, keepdims=True)
    ref = entropy(smax, axis=1)  # what the reference calls (:243)
    ours = np.asarray(compute_scores(jnp.asarray(img), jnp.asarray(txtn),
                                     score="entropy"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_all_scores_consistent(rng):
    img = rng.standard_normal((8, 16)).astype(np.float32)
    txt = rng.standard_normal((5, 16)).astype(np.float32)
    txt_n = np.asarray(l2_normalize(jnp.asarray(txt)))
    all_s = compute_all_scores(jnp.asarray(img), jnp.asarray(txt_n))
    for name in CLIP_SCORES:
        single = compute_scores(jnp.asarray(img), jnp.asarray(txt_n),
                                score=name)
        np.testing.assert_allclose(np.asarray(all_s[name]),
                                   np.asarray(single), rtol=1e-6)


# ---------------------------------------------------------------------------
# Mahalanobis
# ---------------------------------------------------------------------------

def _naive_maha(features, mu, P):
    """Per-class loop exactly as the reference does it (:196-205)."""
    scores = []
    for i in range(mu.shape[0]):
        z = features - mu[i]
        scores.append(-0.5 * np.einsum("bd,de,be->b", z, P, z))
    return -np.max(np.stack(scores, axis=1), axis=1)


def test_mahalanobis_matches_naive(rng):
    feats = rng.standard_normal((20, 16)).astype(np.float32)
    mu = rng.standard_normal((5, 16)).astype(np.float32)
    A = rng.standard_normal((16, 16)).astype(np.float32)
    P = (A @ A.T / 16 + np.eye(16)).astype(np.float32)  # SPD precision
    ref = _naive_maha(feats.astype(np.float64), mu.astype(np.float64),
                      P.astype(np.float64))
    ours = np.asarray(mahalanobis_score(jnp.asarray(feats), jnp.asarray(mu),
                                        jnp.asarray(P)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_estimate_mean_precision(rng):
    n, d, c = 200, 8, 4
    feats = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, c, size=n)
    mu, P = estimate_mean_precision(feats, labels, c)
    for k in range(c):
        np.testing.assert_allclose(mu[k], feats[labels == k].mean(0),
                                   rtol=1e-5)
    # precision must invert the full covariance (reference :172-173)
    cov = np.cov(feats.astype(np.float64).T)
    np.testing.assert_allclose(P @ cov, np.eye(d), atol=1e-3)


def test_estimate_normalized(rng):
    feats = rng.standard_normal((100, 8)).astype(np.float32)
    labels = rng.integers(0, 3, size=100)
    mu, _ = estimate_mean_precision(feats, labels, 3, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(mu, axis=1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("score", CLIP_SCORES)
def test_scores_degenerate_inputs_are_finite(rng, score):
    """Single-class prompt sets, near-zero temperature (one-hot softmax →
    the entropy 0·log0 guard), and duplicate classes must all yield
    finite scores — serving calibrates thresholds on these values, so a
    NaN would silently poison a quantile."""
    img = rng.standard_normal((8, 16)).astype(np.float32)
    one_txt = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((1, 16)).astype(np.float32))))
    dup_txt = np.repeat(one_txt, 5, axis=0)

    for txt, T in [(one_txt, 1.0), (dup_txt, 1.0),
                   (dup_txt, 1e-6), (one_txt, 1e6)]:
        out = np.asarray(compute_scores(jnp.asarray(img), jnp.asarray(txt),
                                        score=score, T=T))
        assert np.isfinite(out).all(), (score, txt.shape, T)
    # single class: softmax row is exactly one-hot
    mcm = np.asarray(compute_scores(jnp.asarray(img), jnp.asarray(one_txt),
                                    score="MCM", T=1.0))
    np.testing.assert_allclose(mcm, -1.0, atol=1e-6)


def test_host_scores_match_jit_path(rng):
    """compute_scores_host (the --resume/--eval_accuracy host fast path)
    must match the jitted device formulas for every score variant."""
    import numpy as np

    from mcm_tpu.scores import compute_scores, l2_normalize
    from mcm_tpu.scores.clip_scores import (CLIP_SCORES,
                                            compute_scores_host)

    feats = rng.standard_normal((64, 32)).astype(np.float32) * 3
    text = np.asarray(l2_normalize(
        rng.standard_normal((11, 32)).astype(np.float32)))
    for score in CLIP_SCORES:
        for T in (1.0, 4.0):
            dev = np.asarray(compute_scores(feats, text, score=score, T=T))
            host = compute_scores_host(feats, text, score=score, T=T)
            np.testing.assert_allclose(host, dev, rtol=2e-5, atol=2e-6,
                                       err_msg=f"{score} T={T}")


def test_mahalanobis_offset_invariance(rng):
    """The fused expanded-quadratic form must match the direct form even
    when features carry a large common offset (raw CLIP features are not
    centered): un-centered expansion cancels catastrophically in fp32 —
    measured 0.099 max error at offset-norm 8 vs 1.4e-4 for the direct
    form — so mahalanobis_score centers on the class-mean centroid
    first (exactly invariant for the distance)."""
    d = 512
    offset = rng.standard_normal(d).astype(np.float32) * 8 / np.sqrt(d)
    feats = (offset + 0.3 * rng.standard_normal((64, d))).astype(np.float32)
    mu = (offset + 0.3 * rng.standard_normal((5, d))).astype(np.float32)
    A = rng.standard_normal((d, d)).astype(np.float32)
    P = (A @ A.T / d + np.eye(d)).astype(np.float32)
    ref = _naive_maha(feats.astype(np.float64), mu.astype(np.float64),
                      P.astype(np.float64))
    ours = np.asarray(mahalanobis_score(jnp.asarray(feats), jnp.asarray(mu),
                                        jnp.asarray(P)))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_rank_deficient_covariance_warns(rng):
    """N <= D covariance yields a FINITE-garbage inverse (no LinAlgError)
    — estimate_mean_precision must warn loudly instead of silently
    poisoning every maha score."""
    import warnings as _w

    feats = rng.standard_normal((30, 64)).astype(np.float32)
    labels = rng.integers(0, 3, size=30)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        estimate_mean_precision(feats, labels, 3)
    assert any("rank-deficient" in str(r.message) for r in rec)


def test_entropy_nan_propagates(rng):
    """A NaN softmax row (zero-norm/garbage feature) must score NaN, not
    -0.0 (the strongest-possible ID verdict): NaN > 0 is False, so the
    0·log0 guard alone would swallow it.  All three twins."""
    from mcm_tpu.ops.mcm_score import fused_mcm_scores
    from mcm_tpu.scores.clip_scores import compute_scores_host

    img = rng.standard_normal((4, 16)).astype(np.float32)
    img[1] = 0.0  # zero-norm row → NaN after L2 normalize
    txt = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((3, 16)).astype(np.float32))))

    dev = np.asarray(compute_scores(jnp.asarray(img), jnp.asarray(txt),
                                    score="entropy"))
    host = compute_scores_host(img, txt, score="entropy")
    kern = np.asarray(fused_mcm_scores(jnp.asarray(img), jnp.asarray(txt),
                                       score="entropy", impl="xla"))
    for name, out in [("jnp", dev), ("host", host), ("kernel-xla", kern)]:
        assert np.isnan(out[1]), (name, out)
        assert np.isfinite(np.delete(out, 1)).all(), (name, out)
