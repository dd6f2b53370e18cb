from mcm_tpu.parallel.mesh import (make_mesh, clip_param_specs,  # noqa: F401
                                   shard_params, batch_sharding)
from mcm_tpu.parallel.eval_step import EvalStep, VitLinearStep  # noqa: F401
