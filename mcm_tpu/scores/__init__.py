from mcm_tpu.scores.clip_scores import (CLIP_SCORES, compute_scores,
                                        l2_normalize)  # noqa: F401
from mcm_tpu.scores.mahalanobis import (estimate_mean_precision,
                                        mahalanobis_score)  # noqa: F401
