"""Checkpoint conversion: HF or OpenAI CLIP → our JAX parameter pytree.

The reference pulls weights straight from the HF hub
(``/root/reference/utils/train_eval_util.py:23``) and its README also
blesses the original OpenAI checkpoints.  Here conversion is an explicit,
offline-friendly step accepting either format: a local HF
``openai/clip-vit-*`` snapshot (``model.safetensors`` /
``pytorch_model.bin``) or an original OpenAI ``ViT-*-*.pt`` TorchScript
archive from github.com/openai/CLIP — both converge to the same pytree
consumed by :mod:`mcm_tpu.models.clip` (equivalence-tested).  Converted
pytrees can be cached as native `.npz` bundles so the torch/safetensors
dependency is only needed once.

Resolution order for a checkpoint name (e.g. ``ViT-B/16``):
  1. ``$MCM_TPU_CKPT_DIR/<sanitized-name>.npz``  (our native cache)
  2. ``$MCM_TPU_CKPT_DIR/<sanitized-name>.pt``   (OpenAI checkpoint)
  3. ``$MCM_TPU_CKPT_DIR/<hf-repo-basename>/``   (local HF snapshot)
  4. the HF cache (``~/.cache/huggingface``) if the snapshot exists there
"""

from __future__ import annotations

import hashlib
import os
import re
import warnings
import zipfile
from typing import Any, Dict, Optional

import numpy as np

from mcm_tpu.config import CLIP_CONFIGS, CLIPConfig, HF_CKPT_MAPPING

Params = Dict[str, Any]

_CKPT_DIR_ENV = "MCM_TPU_CKPT_DIR"


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "-", name)


# ---------------------------------------------------------------------------
# Raw state-dict loading (torch / safetensors, both optional deps)
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint directory or file into {name: np.ndarray}."""
    if os.path.isdir(path):
        for fname in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, fname)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no model.safetensors / pytorch_model.bin under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    # torch pickle fallback (CPU only); OpenAI's published CLIP
    # checkpoints are TorchScript archives — torch.load can't unpickle
    # those, torch.jit.load can (we only want the state dict)
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as plain_err:  # noqa: BLE001 — maybe a jit archive
        try:
            sd = torch.jit.load(path, map_location="cpu").state_dict()
        except Exception:
            # neither format: surface the ORIGINAL torch.load failure
            # (corruption / weights_only rejection), not a misleading
            # "not a TorchScript archive" message
            raise RuntimeError(
                f"{path} loads as neither a plain state dict nor a "
                f"TorchScript archive") from plain_err
    return {k: v.float().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# HF CLIPModel state dict → pytree
# ---------------------------------------------------------------------------

def _stack(sd: Dict[str, np.ndarray], tmpl: str, n: int,
           transpose: bool) -> np.ndarray:
    mats = [sd[tmpl.format(i)] for i in range(n)]
    if transpose:  # torch Linear stores (out, in)
        # contiguous stack first, ONE batched transpose-copy (with the
        # dtype folded in) — faster than stacking n transposed views, and
        # no second astype copy
        return np.ascontiguousarray(np.stack(mats).transpose(0, 2, 1),
                                    dtype=np.float32)
    return np.stack(mats).astype(np.float32)


def _tower_layers(sd: Dict[str, np.ndarray], prefix: str, n: int) -> Params:
    def w(name):  # stacked, transposed weights
        return _stack(sd, f"{prefix}.encoder.layers.{{}}.{name}.weight", n, True)

    def b(name):
        return _stack(sd, f"{prefix}.encoder.layers.{{}}.{name}.bias", n, False)

    return {
        "ln1": {"scale": _stack(sd, f"{prefix}.encoder.layers.{{}}.layer_norm1.weight", n, False),
                "bias": b("layer_norm1")},
        "attn": {
            "wq": w("self_attn.q_proj"), "bq": b("self_attn.q_proj"),
            "wk": w("self_attn.k_proj"), "bk": b("self_attn.k_proj"),
            "wv": w("self_attn.v_proj"), "bv": b("self_attn.v_proj"),
            "wo": w("self_attn.out_proj"), "bo": b("self_attn.out_proj"),
        },
        "ln2": {"scale": _stack(sd, f"{prefix}.encoder.layers.{{}}.layer_norm2.weight", n, False),
                "bias": b("layer_norm2")},
        "mlp": {
            "w1": w("mlp.fc1"), "b1": b("mlp.fc1"),
            "w2": w("mlp.fc2"), "b2": b("mlp.fc2"),
        },
    }


def convert_hf_clip(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Params:
    """Map an HF ``CLIPModel`` state dict onto our pytree layout."""
    # Some HF dumps prefix everything with "clip." or store text/vision only.
    if any(k.startswith("clip.") for k in sd):
        sd = {k.removeprefix("clip."): v for k, v in sd.items()}

    p = cfg.vision.patch_size
    conv_w = sd["vision_model.embeddings.patch_embedding.weight"]
    # (D, 3, p, p) → (p, p, 3, D) → (p*p*3, D); matches clip.patchify order.
    patch_embed = conv_w.transpose(2, 3, 1, 0).reshape(p * p * 3,
                                                       cfg.vision.width)

    vision = {
        "patch_embed": patch_embed.astype(np.float32),
        "class_emb": sd["vision_model.embeddings.class_embedding"].astype(np.float32),
        "pos_emb": sd["vision_model.embeddings.position_embedding.weight"].astype(np.float32),
        # HF's (sic) "pre_layrnorm"
        "pre_ln": {"scale": sd["vision_model.pre_layrnorm.weight"].astype(np.float32),
                   "bias": sd["vision_model.pre_layrnorm.bias"].astype(np.float32)},
        "layers": _tower_layers(sd, "vision_model", cfg.vision.layers),
        "post_ln": {"scale": sd["vision_model.post_layernorm.weight"].astype(np.float32),
                    "bias": sd["vision_model.post_layernorm.bias"].astype(np.float32)},
        "proj": sd["visual_projection.weight"].T.astype(np.float32),
    }
    text = {
        "token_emb": sd["text_model.embeddings.token_embedding.weight"].astype(np.float32),
        "pos_emb": sd["text_model.embeddings.position_embedding.weight"].astype(np.float32),
        "layers": _tower_layers(sd, "text_model", cfg.text.layers),
        "final_ln": {"scale": sd["text_model.final_layer_norm.weight"].astype(np.float32),
                     "bias": sd["text_model.final_layer_norm.bias"].astype(np.float32)},
        "proj": sd["text_projection.weight"].T.astype(np.float32),
    }
    return {"vision": vision, "text": text,
            "logit_scale": _scalar(sd["logit_scale"])}


def _scalar(x) -> np.ndarray:
    """Normalize logit_scale to a () fp32 array (checkpoints variously
    store it 0-d or shape-(1,))."""
    return np.asarray(x, np.float32).reshape(())


# ---------------------------------------------------------------------------
# OpenAI (github.com/openai/CLIP) state dict → pytree
# ---------------------------------------------------------------------------

def _openai_tower_layers(sd: Dict[str, np.ndarray], prefix: str,
                         n: int, width: int) -> Params:
    """OpenAI packs q/k/v as one ``attn.in_proj_weight`` [3D, D] (torch
    ``MultiheadAttention`` row order q, k, v) and names MLP matrices
    ``c_fc``/``c_proj``; everything else maps 1:1 to the HF layout."""
    def g(i, name):
        return sd[f"{prefix}.resblocks.{i}.{name}"]

    def stack(name, transpose):
        mats = [g(i, name) for i in range(n)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats).astype(np.float32)

    def qkv(sl, bias):
        leaf = "attn.in_proj_bias" if bias else "attn.in_proj_weight"
        mats = [g(i, leaf)[sl] for i in range(n)]
        if not bias:
            mats = [m.T for m in mats]
        return np.stack(mats).astype(np.float32)

    d = width
    q, k, v = slice(0, d), slice(d, 2 * d), slice(2 * d, 3 * d)
    return {
        "ln1": {"scale": stack("ln_1.weight", False),
                "bias": stack("ln_1.bias", False)},
        "attn": {
            "wq": qkv(q, False), "bq": qkv(q, True),
            "wk": qkv(k, False), "bk": qkv(k, True),
            "wv": qkv(v, False), "bv": qkv(v, True),
            "wo": stack("attn.out_proj.weight", True),
            "bo": stack("attn.out_proj.bias", False),
        },
        "ln2": {"scale": stack("ln_2.weight", False),
                "bias": stack("ln_2.bias", False)},
        "mlp": {
            "w1": stack("mlp.c_fc.weight", True),
            "b1": stack("mlp.c_fc.bias", False),
            "w2": stack("mlp.c_proj.weight", True),
            "b2": stack("mlp.c_proj.bias", False),
        },
    }


def convert_openai_clip(sd: Dict[str, np.ndarray],
                        cfg: CLIPConfig) -> Params:
    """Map an original OpenAI CLIP state dict (``ViT-B-16.pt`` et al. from
    github.com/openai/CLIP — TorchScript archives) onto our pytree.

    The reference README blesses these checkpoints alongside the HF ones
    (``/root/reference/README.md``: "Similar results can be obtained with
    checkpoints in the codebase by OpenAI") but its code only loads HF;
    here both formats converge to the same pytree (equivalence-tested).
    Note: OpenAI's ``visual.proj``/``text_projection`` are stored already
    oriented for ``x @ proj`` — no transpose, unlike HF Linear weights."""
    p = cfg.vision.patch_size
    conv_w = sd["visual.conv1.weight"]  # (D, 3, p, p), no bias in OpenAI
    patch_embed = conv_w.transpose(2, 3, 1, 0).reshape(p * p * 3,
                                                       cfg.vision.width)
    vision = {
        "patch_embed": patch_embed.astype(np.float32),
        "class_emb": sd["visual.class_embedding"].astype(np.float32),
        "pos_emb": sd["visual.positional_embedding"].astype(np.float32),
        "pre_ln": {"scale": sd["visual.ln_pre.weight"].astype(np.float32),
                   "bias": sd["visual.ln_pre.bias"].astype(np.float32)},
        "layers": _openai_tower_layers(sd, "visual.transformer",
                                       cfg.vision.layers, cfg.vision.width),
        "post_ln": {"scale": sd["visual.ln_post.weight"].astype(np.float32),
                    "bias": sd["visual.ln_post.bias"].astype(np.float32)},
        "proj": sd["visual.proj"].astype(np.float32),
    }
    text = {
        "token_emb": sd["token_embedding.weight"].astype(np.float32),
        "pos_emb": sd["positional_embedding"].astype(np.float32),
        "layers": _openai_tower_layers(sd, "transformer",
                                       cfg.text.layers, cfg.text.width),
        "final_ln": {"scale": sd["ln_final.weight"].astype(np.float32),
                     "bias": sd["ln_final.bias"].astype(np.float32)},
        "proj": sd["text_projection"].astype(np.float32),
    }
    return {"vision": vision, "text": text,
            "logit_scale": _scalar(sd["logit_scale"])}


def convert_clip_state_dict(sd: Dict[str, np.ndarray],
                            cfg: CLIPConfig) -> Params:
    """Format-sniffing entry point: HF ``CLIPModel`` or OpenAI layout."""
    if "visual.proj" in sd or "visual.conv1.weight" in sd:
        return convert_openai_clip(sd, cfg)
    return convert_hf_clip(sd, cfg)


# ---------------------------------------------------------------------------
# Native .npz cache
# ---------------------------------------------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: Params, path: str) -> None:
    """Atomic write to EXACTLY ``path``: np.savez(str) appends ".npz" to
    extension-less paths (the file would land somewhere the caller never
    loads), and a crash mid-save must not leave a truncated zip that
    bricks every later load of the cache."""
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **_flatten(params))
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_params(path: str) -> Params:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_params_orbax(params: Params, path: str) -> None:
    """Orbax checkpoint (sharding-aware; use for sharded/multi-host saves)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_params_orbax(path: str) -> Params:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# High-level resolver
# ---------------------------------------------------------------------------

def file_identity(path: Optional[str]) -> Optional[Dict[str, object]]:
    """Cheap content identity of a weight file for the ``--resume`` cache
    fingerprint: path + size + sha256 over the first, MIDDLE and last MiB.
    Swapping a checkpoint under an unchanged config must invalidate cached
    scores (the results layout keys only on config, never on weight
    content) — the sampled sha catches in-place overwrites without
    hashing multi-GB files.  Deliberately CONTENT-ONLY: mtime was dropped
    from the identity because a touch/re-copy of a byte-identical file
    would otherwise purge every cache and force hours of device rescoring
    for unchanged numbers (review finding, round 5).  The middle slice
    exists for flat non-container formats (raw safetensors, where a
    single mid-file tensor CAN change with head/tail/size intact —
    review finding, round 5); zip containers (.npz/.pt) already expose
    any edit in their tail central-directory CRCs.  A same-size edit
    confined to an unsampled region of a flat >3 MiB file remains
    theoretically invisible — the full-hash alternative costs tens of
    seconds per multi-GB file on this 1-core host, every run."""
    if path is None:
        return None
    try:
        st = os.stat(path)
        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read(1 << 20))
            if st.st_size > (3 << 20):
                f.seek((st.st_size >> 1) - (1 << 19))
                h.update(f.read(1 << 20))
            if st.st_size > (2 << 20):
                f.seek(-(1 << 20), os.SEEK_END)
            h.update(f.read(1 << 20))
        return {"path": os.path.abspath(path), "size": st.st_size,
                "sha256_sampled": h.hexdigest()}
    except OSError as e:
        # unreadable ≠ absent: record the failure so it still participates
        # in (mis)match decisions rather than aliasing to "no weights"
        return {"path": os.path.abspath(path), "error": type(e).__name__}


def _snapshot_weight_file(d: str) -> Optional[str]:
    """The actual weight file inside an HF snapshot directory."""
    for fname in ("model.safetensors", "pytorch_model.bin"):
        cand = os.path.join(d, fname)
        if os.path.exists(cand):
            return cand
    return None


def resolve_clip_weight_source(ckpt_name: str,
                               ckpt_dir: Optional[str] = None
                               ) -> Optional[str]:
    """The file :func:`resolve_clip_params` loads weights from, or None.

    Mirrors the resolution order exactly (native .npz cache → OpenAI .pt →
    local HF snapshot → HF hub cache).  Call it AFTER params resolve so a
    native cache the conversion just wrote is what gets fingerprinted —
    the npz is the loaded artifact on every subsequent run."""
    ckpt_dir = ckpt_dir or os.environ.get(_CKPT_DIR_ENV, "checkpoints")
    native = os.path.join(ckpt_dir, _sanitize(ckpt_name) + ".npz")
    if os.path.exists(native):
        return native
    repo_id = HF_CKPT_MAPPING[ckpt_name]
    pt = os.path.join(ckpt_dir, _sanitize(ckpt_name) + ".pt")
    if os.path.exists(pt):
        return pt
    local_snap = os.path.join(ckpt_dir, repo_id.split("/")[-1])
    if os.path.isdir(local_snap):
        return _snapshot_weight_file(local_snap) or local_snap
    snap = _hf_cache_snapshot(repo_id)
    if snap:
        return _snapshot_weight_file(snap) or snap
    return None


def _hf_cache_snapshot(repo_id: str) -> Optional[str]:
    cache = os.environ.get("HF_HOME",
                           os.path.expanduser("~/.cache/huggingface"))
    base = os.path.join(cache, "hub",
                        "models--" + repo_id.replace("/", "--"), "snapshots")
    if not os.path.isdir(base):
        return None
    for snap in sorted(os.listdir(base)):
        d = os.path.join(base, snap)
        if (os.path.exists(os.path.join(d, "model.safetensors"))
                or os.path.exists(os.path.join(d, "pytorch_model.bin"))):
            return d
    return None


def resolve_clip_params(ckpt_name: str,
                        ckpt_dir: Optional[str] = None) -> Optional[Params]:
    """Find + convert pretrained weights for a checkpoint name, or None.

    Callers fall back to random init (with a loud warning) when this returns
    None — tests and throughput benchmarks are weight-independent.
    """
    cfg = CLIP_CONFIGS[ckpt_name]()
    ckpt_dir = ckpt_dir or os.environ.get(_CKPT_DIR_ENV, "checkpoints")
    native = os.path.join(ckpt_dir, _sanitize(ckpt_name) + ".npz")
    if os.path.exists(native):
        try:
            return load_params(native)
        except (ValueError, OSError, KeyError, zipfile.BadZipFile) as e:
            # a corrupt cache (e.g. truncated by an old non-atomic save)
            # must not brick resolution while a valid source checkpoint
            # still sits right next to it — fall through and re-convert
            warnings.warn(f"cached {native} is unreadable ({e}); "
                          f"re-converting from the source checkpoint")

    repo_id = HF_CKPT_MAPPING[ckpt_name]
    # OpenAI's published filename for this architecture is exactly the
    # sanitized name ("ViT-B/16" → "ViT-B-16.pt")
    candidates = [os.path.join(ckpt_dir, _sanitize(ckpt_name) + ".pt"),
                  os.path.join(ckpt_dir, repo_id.split("/")[-1])]
    snap = _hf_cache_snapshot(repo_id)
    if snap:
        candidates.append(snap)
    for cand in candidates:
        if os.path.isdir(cand) or (cand.endswith(".pt")
                                   and os.path.exists(cand)):
            params = convert_clip_state_dict(load_state_dict(cand), cfg)
            try:  # cache the converted pytree for next time
                os.makedirs(ckpt_dir, exist_ok=True)
                save_params(params, native)
            except OSError:
                pass
            return params
    return None
