"""Command-line entry points (installed via ``[project.scripts]``).

``mcm-eval-ood``              → :mod:`mcm_tpu.cli.eval_ood` — the main
                                reference-compatible OOD evaluation CLI
``mcm-eval-msp``              → :mod:`mcm_tpu.cli.eval_msp` — supervised-ViT
                                MSP baseline
``mcm-create-imagenet-subset``→ :mod:`mcm_tpu.cli.create_subset`

Repo-checkout shims at the repository root (``eval_ood_detection.py``,
``eval_msp_baseline.py``, ``create_imagenet_subset.py``) re-export these so
reference launch scripts keep working unchanged (``scripts/eval_mcm.sh``).
Parsers are imported lazily here — the entry points must not pay each
other's import costs.
"""
