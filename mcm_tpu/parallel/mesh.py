"""Device mesh + sharding layout for multi-chip evaluation.

The reference is single-GPU by construction (``eval_ood_detection.py:57-58``
pins one CUDA device; no distributed machinery anywhere — SURVEY.md §2.4).
The TPU build scales through a ``jax.sharding.Mesh``:

* ``data`` axis — batch-dim sharding (the primary axis: eval is
  embarrassingly data-parallel); collectives ride ICI, inserted by XLA.
* ``model`` axis — optional Megatron-style tensor parallelism for big
  towers at small per-chip batch: attention-head/MLP-hidden dims of the
  scan-stacked layer params are sharded, XLA's SPMD partitioner derives
  the activation shardings and the psum after the row-parallel matmuls.

Score order is preserved end-to-end: batches are contiguous row blocks,
outputs stay batch-sharded, and host readback (``np.asarray``) reassembles
device shards in index order — bit-identical ordering to a single device.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data × model) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested n_devices={n_devices} but only {len(devs)} "
                f"JAX devices are visible ({jax.default_backend()} backend)"
                f" — a silent fallback would misattribute throughput")
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def validate_tp(cfg, mesh: Mesh) -> None:
    """Fail fast when the model axis cannot evenly split the towers.

    The TP specs shard attention outputs by head and the MLP hidden dim
    (:func:`_layer_specs`); a non-dividing ``model_parallel`` would make the
    SPMD partitioner fall back to halo/gather programs (slow, memory-heavy)
    or miscompile shapes — e.g. L/14's text tower has 12 heads, so tp=8
    is invalid even though its vision tower (16 heads) divides."""
    tp = mesh.shape[MODEL_AXIS]
    if tp == 1:
        return
    for tower_name in ("vision", "text"):
        tower = getattr(cfg, tower_name, None)
        if tower is None:
            continue
        hidden = tower.width * tower.mlp_ratio
        for dim_name, value in (("heads", tower.heads),
                                ("width", tower.width),
                                ("mlp hidden dim", hidden)):
            if value % tp:
                raise ValueError(
                    f"model_parallel={tp} does not divide the {tower_name} "
                    f"tower's {dim_name} ({value}) for config "
                    f"{getattr(cfg, 'name', cfg)}; choose a tp that divides "
                    f"every sharded dim")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _layer_specs() -> Dict[str, Any]:
    """PartitionSpecs for one tower's scan-stacked layers [L, ...].

    Column-parallel qkv/fc1 (shard the output feature dim = heads×head_dim),
    row-parallel out-proj/fc2 (shard the input dim); biases follow their
    matmul's output sharding; LayerNorms replicated.
    """
    return {
        "ln1": {"scale": P(), "bias": P()},
        "attn": {
            "wq": P(None, None, MODEL_AXIS), "bq": P(None, MODEL_AXIS),
            "wk": P(None, None, MODEL_AXIS), "bk": P(None, MODEL_AXIS),
            "wv": P(None, None, MODEL_AXIS), "bv": P(None, MODEL_AXIS),
            "wo": P(None, MODEL_AXIS, None), "bo": P(),
        },
        "ln2": {"scale": P(), "bias": P()},
        "mlp": {
            "w1": P(None, None, MODEL_AXIS), "b1": P(None, MODEL_AXIS),
            "w2": P(None, MODEL_AXIS, None), "b2": P(),
        },
    }


def clip_param_specs() -> Dict[str, Any]:
    """PartitionSpec pytree matching ``mcm_tpu.models.init.init_clip``."""
    return {
        "vision": {
            "patch_embed": P(),
            "class_emb": P(),
            "pos_emb": P(),
            "pre_ln": {"scale": P(), "bias": P()},
            "layers": _layer_specs(),
            "post_ln": {"scale": P(), "bias": P()},
            "proj": P(),
        },
        "text": {
            "token_emb": P(),
            "pos_emb": P(),
            "layers": _layer_specs(),
            "final_ln": {"scale": P(), "bias": P()},
            "proj": P(),
        },
        "logit_scale": P(),
    }


def param_shardings(mesh: Mesh, specs: Optional[Dict[str, Any]] = None):
    """NamedSharding pytree for the CLIP params on ``mesh``."""
    specs = specs if specs is not None else clip_param_specs()
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh,
                 specs: Optional[Dict[str, Any]] = None):
    """Place a host param pytree onto the mesh with TP shardings."""
    sh = param_shardings(mesh, specs)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jax.numpy.asarray(x), s), params, sh)
