def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. dev 'axon' tunnels) —
    the shared gate for choosing Pallas kernels over XLA fallbacks."""
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


from mcm_tpu.ops.attention import fused_attention  # noqa: F401,E402
from mcm_tpu.ops.mcm_score import fused_mcm_scores  # noqa: F401,E402
from mcm_tpu.ops.preprocess import resize_normalize  # noqa: F401,E402
