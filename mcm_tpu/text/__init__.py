from mcm_tpu.text.tokenizer import CLIPTokenizer  # noqa: F401
from mcm_tpu.text.prompts import (DEFAULT_TEMPLATE, OPENAI_IMAGENET_TEMPLATES,
                                  build_prompts)  # noqa: F401
