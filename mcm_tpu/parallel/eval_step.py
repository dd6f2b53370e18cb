"""The sharded device program: uint8 batch → normalize → encode → score.

One jit. Everything the reference hot loop does on-device per batch
(``/root/reference/utils/detection_util.py:220-248`` minus the per-batch
text re-encode, which is hoisted out and cached) compiles into a single
XLA executable: fused uint8→fp normalize, the ViT forward, L2-normalize,
the class matmul, and the score reduction.  The only host↔device traffic
per batch is uint8 pixels in and one fp32 score per image out.

Sharding: batch over the ``data`` axis, params TP-sharded per
:func:`mcm_tpu.parallel.mesh.clip_param_specs`, text features replicated.
Works identically on 1 device (trivial mesh) and N (pjit/SPMD).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mcm_tpu.config import CLIPConfig, Precision
from mcm_tpu.data.transforms import CLIP_MEAN, CLIP_STD, normalize_on_device
from mcm_tpu.models import clip as jclip
from mcm_tpu.parallel import mesh as meshlib
from mcm_tpu.scores.clip_scores import l2_normalize
from mcm_tpu.scores.mahalanobis import mahalanobis_score


def _odin_safe(precision: Precision) -> Precision:
    """Precision policy for ODIN programs: the ε-nudge (~0.005 in
    normalized-pixel space) is AT the bf16 ULP for |x|≥1, so fast-mode
    activations quantize it away; and its jax.grad cannot differentiate
    the opt-in Pallas kernels.  fp32 + XLA matches the fp32 reference
    (``detection_util.py:122-146``).  ``softmax_dtype`` is pinned fp32
    too: jax.grad backprops through the [B, H, S, S] probs tensor, and
    bf16 rounding there flips gradient signs near zero — the one place
    sign(grad) is the entire signal."""
    return dataclasses.replace(precision, activation_dtype=jnp.float32,
                               softmax_dtype=jnp.float32,
                               attn_impl="xla", mlp_impl="xla")


def _encode_pixels(params, cfg: CLIPConfig, images_u8: jax.Array,
                   precision: Precision) -> jax.Array:
    x = normalize_on_device(images_u8, CLIP_MEAN, CLIP_STD,
                            dtype=precision.activation_dtype)
    return jclip.encode_image(params, cfg.vision, x, precision)


class _Placement:
    """Multi-host-aware device placement shared by the step classes
    (requires ``self.mesh`` and ``self.replicated``)."""

    def put_batch(self, images_u8: np.ndarray) -> jax.Array:
        from mcm_tpu.parallel.multihost import make_global_batch
        return make_global_batch(self.mesh, images_u8)

    def put_replicated(self, x) -> jax.Array:
        from mcm_tpu.parallel.multihost import put_global
        return put_global(jnp.asarray(x), self.replicated)


class EvalStep(_Placement):
    """Compiled per-batch eval programs bound to a mesh.

    ``score(params, images_u8, text_feats)``   → [B] fp32 OOD scores
    ``features(params, images_u8)``            → [B, D] image features
    ``maha(features, mean, precision_mat)``    → [B] Mahalanobis scores
    """

    def __init__(self, cfg: CLIPConfig, score: str = "MCM", T: float = 1.0,
                 precision: Precision = Precision.fast(),
                 mesh: Optional[Mesh] = None,
                 noise_magnitude: float = 0.0014):
        self.cfg = cfg
        self.score_name = score
        self.T = float(T)
        self.noise_magnitude = float(noise_magnitude)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(1)
        meshlib.validate_tp(cfg, self.mesh)
        # ODIN's precision override runs BEFORE the TP kernel check below:
        # it forces attn/mlp to XLA anyway, so a forced-Pallas config with
        # score="odin" must behave identically on TP and DP meshes
        # (silently overridden, not spuriously rejected).
        if score == "odin":
            precision = _odin_safe(precision)
        # Pallas kernels are opaque to the SPMD partitioner.  Pure-DP meshes
        # run the per-device program under shard_map (kernels apply on each
        # device's batch shard — no cross-device communication in eval).
        # TP meshes (model axis > 1) need the partitioner to split the layer
        # matmuls, so they use the XLA attention path.
        self._dp_only = self.mesh.shape[meshlib.MODEL_AXIS] == 1
        if self.mesh.size > 1 and not self._dp_only:
            if precision.attn_impl == "auto":
                precision = dataclasses.replace(precision, attn_impl="xla")
            forced = [f"attn_impl={precision.attn_impl!r}"
                      ] if precision.attn_impl != "xla" else []
            if precision.mlp_impl == "pallas":
                forced.append(f"mlp_impl={precision.mlp_impl!r}")
            if forced:
                raise ValueError(
                    f"{', '.join(forced)} cannot run on a tensor-parallel "
                    f"mesh (model axis = "
                    f"{self.mesh.shape[meshlib.MODEL_AXIS]}): pallas_call is "
                    f"opaque to the SPMD partitioner, which would all-gather "
                    f"the TP-sharded layer weights around it. Use "
                    f"attn_impl/mlp_impl 'auto' or 'xla', or a pure-DP mesh.")
        self.precision = precision

        batch_sh = meshlib.batch_sharding(self.mesh)
        repl = meshlib.replicated(self.mesh)
        param_sh = meshlib.param_shardings(self.mesh)

        # Pallas score kernel only where the program isn't SPMD-partitioned
        # (single device, or per-device via the shard_map branch below);
        # impl="xla" is the identical-math jnp path.
        score_impl = None if self._dp_only else "xla"

        def score_fn(params, images_u8, text_feats):
            from mcm_tpu.ops.mcm_score import fused_mcm_scores
            x = normalize_on_device(images_u8, CLIP_MEAN, CLIP_STD,
                                    dtype=self.precision.activation_dtype)
            if score == "odin":
                # ODIN input preprocessing (reference
                # ``detection_util.py:122-146``): nudge the normalized
                # pixels against the NLL gradient sign, then score the
                # perturbed batch with temperature-scaled max-softmax.
                # The logits fn is the shared helper so its grad-sign
                # precision guard ("highest" matmul) applies here too.
                from mcm_tpu.scores.odin import (clip_odin_logits_fn,
                                                 odin_perturb)

                logits_fn = clip_odin_logits_fn(
                    lambda xi: jclip.encode_image(params, cfg.vision, xi,
                                                  self.precision),
                    text_feats, self.T)
                x = odin_perturb(logits_fn, x, self.noise_magnitude,
                                 std=CLIP_STD)
            feats = jclip.encode_image(params, cfg.vision, x, self.precision)
            inner = "MCM" if score == "odin" else score
            return fused_mcm_scores(feats.astype(jnp.float32), text_feats,
                                    inner, self.T, impl=score_impl)

        def features_fn(params, images_u8):
            return _encode_pixels(params, cfg, images_u8,
                                  self.precision).astype(jnp.float32)

        if self._dp_only and self.mesh.size > 1:
            # per-device program over batch shards; params/text replicated
            score_fn = jax.shard_map(
                score_fn, mesh=self.mesh,
                in_specs=(P(), P(meshlib.DATA_AXIS), P()),
                out_specs=P(meshlib.DATA_AXIS))
            features_fn = jax.shard_map(
                features_fn, mesh=self.mesh,
                in_specs=(P(), P(meshlib.DATA_AXIS)),
                out_specs=P(meshlib.DATA_AXIS))

        self._score = jax.jit(
            score_fn,
            in_shardings=(param_sh, batch_sh, repl),
            out_shardings=batch_sh)
        self._features = jax.jit(
            features_fn,
            in_shardings=(param_sh, batch_sh),
            out_shardings=batch_sh)
        self._maha = jax.jit(
            functools.partial(mahalanobis_score, normalize=False),
            in_shardings=(batch_sh, repl, repl),
            out_shardings=batch_sh)
        self._maha_norm = jax.jit(
            functools.partial(mahalanobis_score, normalize=True),
            in_shardings=(batch_sh, repl, repl),
            out_shardings=batch_sh)

        def _text_fn(params, ids, mask):
            f = jclip.encode_text(params, cfg.text, ids, mask,
                                  self.precision)
            return l2_normalize(f).astype(jnp.float32)

        # one jitted text encoder per EvalStep (not per encode_text call)
        self._encode_text_jit = jax.jit(_text_fn)

        self.batch_sharding = batch_sh
        self.replicated = repl
        self.param_shardings = param_sh

    # -- device placement (multi-host aware; put_batch/put_replicated from
    # _Placement) ------------------------------------------------------------

    def put_params(self, params):
        from mcm_tpu.parallel.multihost import put_global
        return jax.tree_util.tree_map(
            lambda x, s: put_global(jnp.asarray(x), s), params,
            self.param_shardings)

    # -- compiled entry points ------------------------------------------------

    def score(self, params, images_u8, text_feats) -> jax.Array:
        return self._score(params, images_u8, text_feats)

    def features(self, params, images_u8) -> jax.Array:
        return self._features(params, images_u8)

    def maha(self, features, classwise_mean, precision_mat,
             normalize: bool = False) -> jax.Array:
        fn = self._maha_norm if normalize else self._maha
        return fn(features, classwise_mean, precision_mat)

    # -- text side (host-cached, run once per dataset) -------------------------

    def encode_text(self, params, input_ids: np.ndarray,
                    attention_mask: np.ndarray,
                    batch_size: int = 1024) -> jax.Array:
        """Encode + L2-normalize all class prompts, replicated on the mesh.

        Runs once per ID dataset (the reference re-encodes every batch,
        ``detection_util.py:228-231`` — pure waste, identical output).
        Jitted per (batch, seq) shape; the tail batch is padded to the lead
        batch shape so at most two executables compile per shape."""
        _enc = self._encode_text_jit
        outs = []
        n = input_ids.shape[0]
        for lo in range(0, n, batch_size):
            ids = input_ids[lo:lo + batch_size]
            mask = attention_mask[lo:lo + batch_size]
            pad = 0
            if lo > 0 and ids.shape[0] < batch_size:
                pad = batch_size - ids.shape[0]
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            f = _enc(params, jnp.asarray(ids), jnp.asarray(mask))
            outs.append(f[:f.shape[0] - pad] if pad else f)
        text = jnp.concatenate(outs, axis=0)
        return self.put_replicated(text)


class VitLinearStep(_Placement):
    """Supervised ViT + linear head through the standard score family.

    The reference's ``vit-Linear`` configuration
    (``/root/reference/utils/detection_util.py:124-133``): image features =
    CLS token of the last hidden state, logits = linear classifier over
    them, scored by the same max-softmax/energy/… family.  Presents the
    same interface subset as :class:`EvalStep` (``put_*``, ``score``,
    ``features``) so the runner streams batches identically; ``features``
    returns the classifier *logits* — the substrate every score and the
    accuracy meter derive from.

    Data-parallel only: the supervised tower fits one chip many times over,
    so params are replicated and the batch is sharded (shard_map on
    multi-device meshes, plain jit on one device).
    """

    def __init__(self, cfg, score: str = "MCM", T: float = 1.0,
                 precision: Precision = Precision.fast(),
                 mesh: Optional[Mesh] = None,
                 noise_magnitude: float = 0.0014):
        from mcm_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from mcm_tpu.models import vit as jvit
        from mcm_tpu.scores.clip_scores import _scores_from_logits

        self.cfg = cfg
        self.score_name = score
        self.T = float(T)
        if score == "odin":
            precision = _odin_safe(precision)
        self.precision = precision
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(1)
        if self.mesh.shape[meshlib.MODEL_AXIS] != 1:
            raise ValueError("--model vit-Linear runs data-parallel only; "
                             "use --model_parallel 1")

        batch_sh = meshlib.batch_sharding(self.mesh)
        repl = meshlib.replicated(self.mesh)

        def logits_fn(params, images_u8, perturb: bool):
            x = normalize_on_device(images_u8, IMAGENET_MEAN, IMAGENET_STD,
                                    dtype=precision.activation_dtype)
            if perturb:
                from mcm_tpu.scores.odin import odin_perturb
                # Reference quirk kept: input_preprocessing scales the
                # gradient sign by the CLIP std for EVERY model — the
                # ``std=(0.26862954, ...)`` at ``detection_util.py:141-143``
                # is hardcoded even on the vit-Linear branch whose pixels
                # were normalized with (0.5, 0.5, 0.5).  Parity over
                # plausibility (PARITY.md §2.2, ODIN row).
                x = odin_perturb(
                    lambda xi: jvit.forward_logits(params, cfg, xi,
                                                   precision) / self.T,
                    x, float(noise_magnitude), std=CLIP_STD)
            return jvit.forward_logits(params, cfg, x, precision)

        def score_fn(params, images_u8):
            inner = "MCM" if score == "odin" else score
            logits = logits_fn(params, images_u8,
                               perturb=score == "odin").astype(jnp.float32)
            return _scores_from_logits(logits, self.T)[inner]

        # features (the accuracy/caching substrate) are CLEAN logits —
        # the ODIN perturbation applies to scoring only
        features_fn = lambda params, images_u8: (
            logits_fn(params, images_u8, perturb=False)
            .astype(jnp.float32))

        if self.mesh.size > 1:
            score_fn = jax.shard_map(
                score_fn, mesh=self.mesh,
                in_specs=(P(), P(meshlib.DATA_AXIS)),
                out_specs=P(meshlib.DATA_AXIS))
            features_fn = jax.shard_map(
                features_fn, mesh=self.mesh,
                in_specs=(P(), P(meshlib.DATA_AXIS)),
                out_specs=P(meshlib.DATA_AXIS))

        self._score = jax.jit(score_fn, in_shardings=(repl, batch_sh),
                              out_shardings=batch_sh)
        self._features = jax.jit(features_fn, in_shardings=(repl, batch_sh),
                                 out_shardings=batch_sh)
        self.batch_sharding = batch_sh
        self.replicated = repl

    def put_params(self, params):
        from mcm_tpu.parallel.multihost import put_global
        return jax.tree_util.tree_map(
            lambda x: put_global(jnp.asarray(x), self.replicated), params)

    def score(self, params, images_u8, text_feats=None) -> jax.Array:
        return self._score(params, images_u8)

    def features(self, params, images_u8) -> jax.Array:
        return self._features(params, images_u8)
