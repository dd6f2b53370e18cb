from mcm_tpu.train.checkpoint import (load_train_state,  # noqa: F401
                                      save_train_state)
from mcm_tpu.train.contrastive import (clip_contrastive_loss,  # noqa: F401
                                       make_train_step)
from mcm_tpu.train.linear_probe import (LinearProbe,  # noqa: F401
                                        make_linear_probe_step)
from mcm_tpu.train.loop import ShuffledView, train_clip  # noqa: F401
