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
