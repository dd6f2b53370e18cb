from mcm_tpu.models import clip, convert, init  # noqa: F401
