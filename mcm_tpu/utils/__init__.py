from mcm_tpu.utils.logging import setup_log  # noqa: F401
from mcm_tpu.utils.results import (load_scores, save_as_dataframe,  # noqa: F401
                                   save_scores)
from mcm_tpu.utils.seed import setup_seed  # noqa: F401
from mcm_tpu.utils.telemetry import Telemetry  # noqa: F401
