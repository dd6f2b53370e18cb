from mcm_tpu.metrics.ood_metrics import (fpr_at_recall, get_measures,
                                         print_measures)  # noqa: F401
