"""Mahalanobis OOD score (``--score maha``).

Reference: ``/root/reference/utils/detection_util.py:148-207``.

* :func:`estimate_mean_precision` — one pass over ID-train features:
  per-class means + a single shared precision matrix inv(cov(all features))
  (``:168-173``; covariance over the WHOLE feature matrix, not
  class-centered, matching ``torch.cov(all_features.T)``).

  **Deliberate divergence**: the reference indexes features per class with
  the *batch* index instead of the *sample* index
  (``classwise_idx[label].append(idx)`` at ``:165`` appends the enumerate
  counter of the batch loop), so for batch_size > 1 its class means average
  the wrong rows.  We compute exact per-class means via segment-sum
  (SURVEY.md §2.1 row 5 flags this as do-not-replicate).

* :func:`mahalanobis_score` — per image: ``-max_c -½ (z-μ_c)ᵀ P (z-μ_c)``
  (``:196-205``; the returned array carries the reference's final negation
  at ``:205``, i.e. lower = more ID).  The reference loops classes in
  Python, one [B,D]x[D,D]x[D,B] product per class; here the quadratic form
  expands to ``½ fPf - fPμ_c + ½ μ_cPμ_c`` so all classes reduce to ONE
  [B,D]x[D,C] matmul — MXU-shaped, class-count-independent Python.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def estimate_mean_precision(features: np.ndarray, labels: np.ndarray,
                            n_cls: int, normalize: bool = False
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Class-wise means [C, D] + shared precision [D, D] from train features.

    fp64 covariance/inverse (reference: ``torch.cov(...double())`` +
    ``torch.linalg.inv`` at ``:172-173``), results in fp32.
    """
    feats = np.asarray(features, dtype=np.float64)
    labels = np.asarray(labels)
    if normalize:  # --normalize flag (:162-163)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)

    counts = np.bincount(labels, minlength=n_cls)
    if (counts[:n_cls] == 0).any():
        empty = np.flatnonzero(counts[:n_cls] == 0)
        raise ValueError(
            f"no training samples for class indices {empty.tolist()[:10]} "
            f"— a NaN class mean would poison every Mahalanobis score; "
            f"check the train split / --subset settings")
    classwise_mean = np.zeros((n_cls, feats.shape[1]), dtype=np.float64)
    for c in range(n_cls):
        classwise_mean[c] = feats[labels == c].mean(axis=0)
    if normalize:  # reference re-normalizes the means (:170-171)
        classwise_mean /= np.linalg.norm(classwise_mean, axis=-1,
                                         keepdims=True)

    cov = np.cov(feats.T)  # shared covariance over ALL features (:172)
    if feats.shape[0] <= feats.shape[1]:
        # rank(cov) <= N-1 < D: LAPACK's pivots stay nonzero through
        # rounding, so np.linalg.inv returns FINITE garbage (~1e14
        # entries, measured) instead of raising — every downstream score
        # would be numerically meaningless while the run "succeeds".
        # Warn rather than raise: the reference (torch.linalg.inv of the
        # same covariance) behaves identically, so small-N runs still
        # reproduce it — they just shouldn't be trusted silently.
        import warnings
        warnings.warn(
            f"Mahalanobis covariance is rank-deficient: {feats.shape[0]} "
            f"training samples <= {feats.shape[1]} feature dims — the "
            f"precision matrix (and every maha score) is numerically "
            f"meaningless; use more training data (or a smaller "
            f"--max_count subset only with N >> D)")
    precision = np.linalg.inv(cov)
    return classwise_mean.astype(np.float32), precision.astype(np.float32)


def reference_template_paths(template_dir: str, model: str, in_dataset: str,
                             max_count: int, normalize: bool
                             ) -> Tuple[str, str]:
    """The exact paths the reference persists Mahalanobis templates to
    (``detection_util.py:175-176``): ``{model}_classwise_mean_...pt`` and
    ``{model}_precision_...pt``, with the bool rendered via f-string."""
    import os

    tag = f"{model}_%s_{in_dataset}_{max_count}_{normalize}.pt"
    return (os.path.join(template_dir, tag % "classwise_mean"),
            os.path.join(template_dir, tag % "precision"))


def load_pt_templates(mean_path: str,
                      precision_path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a reference-format torch ``.pt`` template pair → fp32 numpy, so
    a migrating user's existing caches work without regeneration (torch is
    an optional dependency, imported only here)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in the test env
        raise ImportError(
            "reading reference-format .pt Mahalanobis templates requires "
            "torch; regenerate native templates with --generate instead"
        ) from e
    mu = torch.load(mean_path, map_location="cpu")
    prec = torch.load(precision_path, map_location="cpu")
    return (np.asarray(mu.detach().float().numpy(), dtype=np.float32),
            np.asarray(prec.detach().float().numpy(), dtype=np.float32))


@functools.partial(jax.jit, static_argnames=("normalize",))
def mahalanobis_score(features: jax.Array, classwise_mean: jax.Array,
                      precision: jax.Array,
                      normalize: bool = False) -> jax.Array:
    """[B, D] features → [B] scores (lower = more ID).

    score_b = -max_c ( -½ (f_b-μ_c)ᵀ P (f_b-μ_c) )   [reference :196-205]
    """
    f = features.astype(jnp.float32)
    if normalize:
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    mu = classwise_mean.astype(jnp.float32)          # [C, D]
    P = precision.astype(jnp.float32)                # [D, D]

    # Center both operands on the class-mean centroid before expanding
    # the quadratic: (f-μ_c)P(f-μ_c) is exactly invariant to a common
    # shift, but the EXPANDED form below cancels catastrophically when a
    # large common offset inflates the individual quadratic terms
    # (measured: fp32 error 0.099 uncentered vs 1.4e-4 direct-form at
    # offset-norm 8, D=512 — raw CLIP features are not centered).
    g = jnp.mean(mu, axis=0)
    f = f - g
    mu = mu - g

    fP = jnp.dot(f, P, preferred_element_type=jnp.float32,
                 precision="highest")                # [B, D]
    quad_f = jnp.sum(fP * f, axis=-1)                # f P fᵀ, [B]
    cross = jnp.dot(fP, mu.T, preferred_element_type=jnp.float32,
                    precision="highest")             # f P μᵀ, [B, C]
    muP = jnp.dot(mu, P, preferred_element_type=jnp.float32,
                  precision="highest")
    quad_mu = jnp.sum(muP * mu, axis=-1)             # μ P μᵀ diag, [C]

    # -½ (f-μ)P(f-μ)ᵀ = -½ quad_f + cross - ½ quad_mu
    dist = -0.5 * quad_f[:, None] + cross - 0.5 * quad_mu[None, :]  # [B, C]
    return -jnp.max(dist, axis=-1)
