"""mcm_tpu — a TPU-native zero-shot OOD-detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
deeplearning-wisc/MCM (NeurIPS 2022): frozen CLIP encoders, concept-matching
OOD scores (MCM / energy / max-logit / entropy / variance / Mahalanobis),
exact AUROC / AUPR / FPR95 metrics, the full dataset + CLI surface — built
for TPU meshes rather than a single CUDA device.
"""

__version__ = "0.1.0"
