"""Metrics layer: native AUROC/AUPR vs sklearn, FPR@recall vs the reference
implementation semantics (detection_util.py:47-119) including tie handling."""

import numpy as np
import pytest
import sklearn.metrics as sk

from mcm_tpu.metrics.ood_metrics import (auroc_score, aupr_score,
                                         fpr_at_recall, get_measures,
                                         stable_cumsum)


def _random_binary(rng, n_pos, n_neg, ties=False):
    pos = rng.standard_normal(n_pos) + 1.0
    neg = rng.standard_normal(n_neg)
    if ties:  # heavy tie structure, the case the reference collapses (:89-90)
        pos = np.round(pos * 4) / 4
        neg = np.round(neg * 4) / 4
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(n_pos, np.int32),
                             np.zeros(n_neg, np.int32)])
    return labels, scores


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("sizes", [(100, 100), (500, 50), (33, 777)])
def test_auroc_aupr_match_sklearn(rng, ties, sizes):
    labels, scores = _random_binary(rng, *sizes, ties=ties)
    assert auroc_score(labels, scores) == pytest.approx(
        sk.roc_auc_score(labels, scores), abs=1e-12)
    assert aupr_score(labels, scores) == pytest.approx(
        sk.average_precision_score(labels, scores), abs=1e-10)


def test_fpr_at_recall_perfect_separation(rng):
    labels = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.int32)
    scores = np.array([4.0, 3.0, 2.5, 2.0, 1.0, 0.5, 0.2, 0.1])
    assert fpr_at_recall(labels, scores) == 0.0


def test_fpr_at_recall_total_overlap(rng):
    # identical distributions → FPR at 95% recall ≈ 0.95 in expectation
    labels, scores = _random_binary(rng, 5000, 5000)
    scores = rng.standard_normal(10000)  # no signal at all
    fpr = fpr_at_recall(labels, scores)
    assert 0.85 < fpr < 1.0


def test_fpr_monotone_in_signal(rng):
    vals = []
    for sep in [0.0, 1.0, 2.0, 4.0]:
        pos = rng.standard_normal(2000) + sep
        neg = rng.standard_normal(2000)
        labels = np.r_[np.ones(2000, np.int32), np.zeros(2000, np.int32)]
        vals.append(fpr_at_recall(labels, np.r_[pos, neg]))
    assert vals == sorted(vals, reverse=True)


def test_get_measures_sign_convention(rng):
    """ID scores are negated-MCM (lower = more ID); get_measures receives
    the re-negated arrays (reference double negation at :259)."""
    id_conf = rng.uniform(0.8, 1.0, 1000)   # high max-softmax for ID
    ood_conf = rng.uniform(0.0, 0.6, 1000)
    in_score, out_score = -id_conf, -ood_conf  # stored convention
    auroc, aupr, fpr = get_measures(-in_score, -out_score)
    assert auroc > 0.99 and aupr > 0.99 and fpr < 0.05


def test_stable_cumsum_guard():
    assert stable_cumsum(np.ones(10))[-1] == 10.0
    with pytest.raises(RuntimeError):
        # sequential cumsum absorbs the ones; pairwise np.sum keeps them
        arr = np.r_[1e16, np.ones(127)]
        stable_cumsum(arr, rtol=0, atol=0)


def test_against_reference_implementation(rng):
    """Bit-exact vs the actual reference functions when the reference tree is
    present (skipped elsewhere)."""
    import importlib.util
    import os
    import sys
    path = "/root/reference/utils/detection_util.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    if importlib.util.find_spec("torchvision") is None:
        # the reference module imports torchvision but the metric functions
        # under test never touch it — stub it out
        import types
        stub = types.ModuleType("torchvision")
        stub.datasets = types.ModuleType("torchvision.datasets")
        sys.modules.setdefault("torchvision", stub)
        sys.modules.setdefault("torchvision.datasets", stub.datasets)
    spec = importlib.util.spec_from_file_location("ref_detection_util", path)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_detection_util"] = ref
    spec.loader.exec_module(ref)

    for ties in (False, True):
        labels, scores = _random_binary(rng, 300, 400, ties=ties)
        ours = fpr_at_recall(labels, scores)
        theirs = ref.fpr_and_fdr_at_recall(labels.astype(float), scores)
        assert ours == pytest.approx(theirs, abs=1e-12)

        pos = scores[labels == 1]
        neg = scores[labels == 0]
        a1, p1, f1 = get_measures(pos, neg)
        a2, p2, f2 = ref.get_measures(pos, neg)
        assert (a1, p1, f1) == pytest.approx((a2, p2, f2), abs=1e-12)


def test_metrics_degenerate_sets_are_finite(rng):
    """Tiny and all-tied score sets must produce finite metrics (the
    reference would see these on very small --max_count subsets): one
    sample per side, and every score identical."""
    one_each = (np.array([1, 0], np.int32), np.array([2.0, 1.0]))
    all_tied = (np.array([1, 1, 0, 0], np.int32), np.ones(4))
    for labels, scores in (one_each, all_tied):
        auroc = auroc_score(labels, scores)
        aupr = aupr_score(labels, scores)
        fpr = fpr_at_recall(labels, scores)
        for v in (auroc, aupr, fpr):
            assert np.isfinite(v), (labels, scores, auroc, aupr, fpr)
    # perfect single-pair separation
    assert auroc_score(*one_each) == 1.0
    # all-tied scores carry no signal
    assert auroc_score(*all_tied) == 0.5


def test_get_measures_empty_side_raises(rng):
    """An empty ID or OOD side must fail loudly (the reference's sklearn
    raises 'Only one class present'), not write silent NaN into judged
    results — the trigger is an OOD set smaller than the batch size under
    the maha tail-drop quirk."""
    scores = rng.standard_normal(8)
    with pytest.raises(ValueError, match="both classes"):
        get_measures(scores, np.zeros((0,)))
    with pytest.raises(ValueError, match="both classes"):
        get_measures(np.zeros((0,)), scores)
    # one sample per side is degenerate but defined
    auroc, aupr, fpr = get_measures(np.array([2.0]), np.array([1.0]))
    assert np.isfinite([auroc, aupr, fpr]).all()
