"""Original OpenAI CLIP checkpoint support (github.com/openai/CLIP
``ViT-*-*.pt``): the reference README blesses these alongside HF
("Similar results can be obtained with checkpoints in the codebase by
OpenAI") but its code only loads HF.  Both formats must converge to the
same pytree, full-size key mapping must consume every key, and the
TorchScript-archive loading path must work."""

import numpy as np
import pytest


def _tree_equal(a, b, path=""):
    assert type(a) is type(b), path
    if isinstance(a, dict):
        assert a.keys() == b.keys(), path
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(a, b, err_msg=path)


def test_openai_and_hf_converters_agree_on_same_weights():
    from mcm_tpu.models.convert import convert_hf_clip, convert_openai_clip
    from mcm_tpu.models.hf_synth import (golden_config,
                                         hf_to_openai_state_dict,
                                         synth_hf_clip_state_dict)

    cfg = golden_config()
    hf_sd = synth_hf_clip_state_dict(cfg, seed=3)
    oai_sd = hf_to_openai_state_dict(hf_sd, cfg)
    _tree_equal(convert_hf_clip(hf_sd, cfg), convert_openai_clip(oai_sd, cfg))


def test_sniffing_dispatcher_picks_openai_layout():
    from mcm_tpu.models.convert import (convert_clip_state_dict,
                                        convert_openai_clip)
    from mcm_tpu.models.hf_synth import (golden_config,
                                         hf_to_openai_state_dict,
                                         synth_hf_clip_state_dict)

    cfg = golden_config()
    oai_sd = hf_to_openai_state_dict(synth_hf_clip_state_dict(cfg, seed=4),
                                     cfg)
    _tree_equal(convert_clip_state_dict(oai_sd, cfg),
                convert_openai_clip(oai_sd, cfg))


@pytest.mark.parametrize("ckpt", ["ViT-B/16", "ViT-L/14"])
def test_full_size_openai_converter_consumes_every_key(ckpt):
    """Shape-exact full-size OpenAI-layout state dict: every key read,
    pytree shapes exact (mirrors the HF converter's key-coverage test)."""
    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.convert import convert_openai_clip
    from mcm_tpu.models.hf_synth import (hf_to_openai_state_dict,
                                         zeros_hf_clip_state_dict)

    cfg = CLIP_CONFIGS[ckpt]()
    # key/shape coverage — zero values keep the full-size dicts ~free
    sd = hf_to_openai_state_dict(zeros_hf_clip_state_dict(cfg), cfg)
    accessed = set()

    class Tracking(dict):
        def __getitem__(self, k):
            accessed.add(k)
            return dict.__getitem__(self, k)

    params = convert_openai_clip(Tracking(sd), cfg)
    missing = set(sd) - accessed
    assert not missing, f"converter never read: {sorted(missing)[:8]}"

    v, t = cfg.vision, cfg.text
    assert params["vision"]["patch_embed"].shape == (
        v.patch_size * v.patch_size * 3, v.width)
    assert params["vision"]["layers"]["attn"]["wq"].shape == (
        v.layers, v.width, v.width)
    assert params["vision"]["proj"].shape == (v.width, cfg.embed_dim)
    assert params["text"]["layers"]["mlp"]["w1"].shape == (
        t.layers, t.width, t.width * t.mlp_ratio)
    assert params["text"]["proj"].shape == (t.width, cfg.embed_dim)


def test_load_state_dict_reads_torchscript_archives(tmp_path):
    """OpenAI ships TorchScript archives; plain torch.load cannot unpickle
    those — load_state_dict must fall back to torch.jit.load (and cast
    fp16 storage to fp32)."""
    torch = pytest.importorskip("torch")

    lin = torch.nn.Linear(4, 3).half()
    path = str(tmp_path / "scripted.pt")
    torch.jit.save(torch.jit.script(lin), path)

    from mcm_tpu.models.convert import load_state_dict
    sd = load_state_dict(path)
    assert set(sd) == {"weight", "bias"}
    assert sd["weight"].shape == (3, 4)
    assert sd["weight"].dtype == np.float32
    np.testing.assert_allclose(sd["weight"],
                               lin.weight.detach().float().numpy())


def test_resolver_converts_openai_pt(tmp_path, monkeypatch):
    """resolve_clip_params finds ``<sanitized>.pt`` (the OpenAI published
    filename), converts it, and caches the native npz.  Uses a tiny
    config injected under a fake checkpoint name to keep the file small."""
    from mcm_tpu import config as cfg_mod
    from mcm_tpu.models import convert as cv
    from mcm_tpu.models.hf_synth import (golden_config,
                                         hf_to_openai_state_dict,
                                         synth_hf_clip_state_dict)

    torch = pytest.importorskip("torch")
    cfg = golden_config()
    oai_sd = hf_to_openai_state_dict(synth_hf_clip_state_dict(cfg, seed=5),
                                     cfg)
    pt_path = tmp_path / "Tiny-Synth.pt"
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in oai_sd.items()}, pt_path)

    monkeypatch.setitem(cv.CLIP_CONFIGS, "Tiny/Synth", lambda: cfg)
    monkeypatch.setitem(cv.HF_CKPT_MAPPING, "Tiny/Synth", "none/none")
    params = cv.resolve_clip_params("Tiny/Synth", str(tmp_path))
    assert params is not None
    _tree_equal(params, cv.convert_openai_clip(oai_sd, cfg))
    assert (tmp_path / "Tiny-Synth.npz").exists()  # cached for next time


def test_openai_attn_layout_anchored_to_torch_mha():
    """The in_proj q/k/v slicing + transposes anchored against
    torch.nn.MultiheadAttention ITSELF — the exact op openai/CLIP's
    ResidualAttentionBlock calls (model.py ``self.attn(x, x, x, ...)``)
    — not against our own ``hf_to_openai_state_dict`` inverse, which
    could share a mirrored layout error with the converter (review
    finding, round 5): feed one resblock's converted weights through the
    production ``encoder_attention`` + out-projection and require the
    result to equal torch's MHA on the same weights."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from mcm_tpu.config import Precision
    from mcm_tpu.models.convert import _openai_tower_layers
    from mcm_tpu.ops.attention import encoder_attention

    D, H, S, B = 32, 4, 5, 2
    g = np.random.default_rng(17)
    in_w = g.standard_normal((3 * D, D), dtype=np.float32)
    in_b = g.standard_normal((3 * D,), dtype=np.float32)
    out_w = g.standard_normal((D, D), dtype=np.float32)
    out_b = g.standard_normal((D,), dtype=np.float32)
    ones, zeros = np.ones(D, np.float32), np.zeros(D, np.float32)
    sd = {
        "transformer.resblocks.0.attn.in_proj_weight": in_w,
        "transformer.resblocks.0.attn.in_proj_bias": in_b,
        "transformer.resblocks.0.attn.out_proj.weight": out_w,
        "transformer.resblocks.0.attn.out_proj.bias": out_b,
        "transformer.resblocks.0.ln_1.weight": ones,
        "transformer.resblocks.0.ln_1.bias": zeros,
        "transformer.resblocks.0.ln_2.weight": ones,
        "transformer.resblocks.0.ln_2.bias": zeros,
        "transformer.resblocks.0.mlp.c_fc.weight":
            np.zeros((4 * D, D), np.float32),
        "transformer.resblocks.0.mlp.c_fc.bias":
            np.zeros(4 * D, np.float32),
        "transformer.resblocks.0.mlp.c_proj.weight":
            np.zeros((D, 4 * D), np.float32),
        "transformer.resblocks.0.mlp.c_proj.bias": zeros,
    }
    attn = _openai_tower_layers(sd, "transformer", 1, D)["attn"]

    x = g.standard_normal((S, B, D), dtype=np.float32)  # torch: [S, B, D]
    mha = torch.nn.MultiheadAttention(D, H)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(in_w))
        mha.in_proj_bias.copy_(torch.from_numpy(in_b))
        mha.out_proj.weight.copy_(torch.from_numpy(out_w))
        mha.out_proj.bias.copy_(torch.from_numpy(out_b))
        xt = torch.from_numpy(x)
        want = mha(xt, xt, xt, need_weights=False)[0].numpy()

    xb = x.transpose(1, 0, 2)  # ours: [B, S, D]
    q = xb @ attn["wq"][0] + attn["bq"][0]
    k = xb @ attn["wk"][0] + attn["bk"][0]
    v = xb @ attn["wv"][0] + attn["bv"][0]
    a = np.asarray(encoder_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=H,
        mask=None, precision=Precision.parity()))
    got = (a @ attn["wo"][0] + attn["bo"][0]).transpose(1, 0, 2)
    # fp32 reduction-order noise on O(50)-magnitude unscaled activations;
    # a q/k/v slice or transpose error would be O(1)-relative, so 1e-4
    # keeps full discriminative power
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_openai_projections_kept_unrotated():
    """``visual.proj`` / ``text_projection`` are stored already oriented
    for ``x @ proj`` (openai/CLIP model.py: ``x = x @ self.proj`` /
    ``x @ self.text_projection``) — the converter must NOT transpose
    them, unlike HF Linear weights.  Pinned with an asymmetric matrix so
    a transpose can't hide."""
    from mcm_tpu.models.convert import convert_openai_clip
    from mcm_tpu.models.hf_synth import (golden_config,
                                         hf_to_openai_state_dict,
                                         synth_hf_clip_state_dict)

    cfg = golden_config()
    sd = hf_to_openai_state_dict(synth_hf_clip_state_dict(cfg, seed=5), cfg)
    marker_v = np.arange(
        cfg.vision.width * cfg.vision.projection_dim,
        dtype=np.float32).reshape(cfg.vision.width,
                                  cfg.vision.projection_dim)
    marker_t = 7.0 + np.arange(
        cfg.text.width * cfg.text.projection_dim,
        dtype=np.float32).reshape(cfg.text.width, cfg.text.projection_dim)
    sd["visual.proj"] = marker_v
    sd["text_projection"] = marker_t
    params = convert_openai_clip(sd, cfg)
    np.testing.assert_array_equal(params["vision"]["proj"], marker_v)
    np.testing.assert_array_equal(params["text"]["proj"], marker_t)
