from mcm_tpu.ops.attention import fused_attention  # noqa: F401
from mcm_tpu.ops.mcm_score import fused_mcm_scores  # noqa: F401
from mcm_tpu.ops.preprocess import resize_normalize  # noqa: F401
