"""--resume cache-fingerprint semantics and lazy/device-free resume
invariants (runner._check_cache_meta, lazy maha templates, text cache).

The reference-identical results layout keys the cache directory only by
{in_dataset, score, model, ckpt, T, name}; every other numerically-
relevant flag is guarded by cache_meta.json — a --resume under a changed
config must rescore, never silently mix stale artifacts with fresh ones.
"""

import os

import numpy as np
import pytest

from util_synth import make_imagefolder_tree, make_pet_tree


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume")
    root = tmp / "datasets"
    make_pet_tree(str(root), per_breed=6)
    make_imagefolder_tree(
        str(root / "ImageNet_OOD_dataset" / "dtd" / "images"),
        ["banded", "blotchy"], 5, color_bias=40)
    return tmp, str(root)


@pytest.fixture(autouse=True)
def tiny(monkeypatch):
    # structurally-identical tiny B/16 double (docs/TESTING.md): these are
    # orchestration tests, model math is pinned elsewhere
    monkeypatch.setenv("MCM_TPU_TEST_TINY_B16", "1")


def _run(tmp, root, **over):
    import warnings

    from mcm_tpu.runner import RunConfig, run_eval

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            cfg = RunConfig(in_dataset="pet37", root_dir=root, batch_size=8,
                            num_workers=2, allow_random_weights=True,
                            n_devices=1, out_datasets=["dtd"], **over)
            run_eval(cfg)
        log_dir = os.path.join(str(tmp), cfg.log_directory)
        return (np.load(os.path.join(log_dir, "ID_pet37_scores.npy")),
                np.load(os.path.join(log_dir, "dtd_scores.npy")),
                [str(r.message) for r in rec], log_dir)
    finally:
        os.chdir(cwd)


def test_resume_meta_mismatch_rescores(workdir):
    tmp, root = workdir
    in1, out1, _, log_dir = _run(tmp, root, name="meta")
    assert os.path.exists(os.path.join(log_dir, "cache_meta.json"))

    # same config → caches reused untouched
    in2, out2, warns, _ = _run(tmp, root, name="meta", resume=True)
    np.testing.assert_array_equal(in1, in2)
    np.testing.assert_array_equal(out1, out2)
    assert not any("different configuration" in w for w in warns)

    # a flag the results path does NOT encode changes → caches refused,
    # everything rescored under the new config (80-template ensembling
    # produces different text features, hence different scores)
    in3, _, warns, _ = _run(tmp, root, name="meta", resume=True,
                            template_ensemble=True)
    assert any("different configuration" in w
               and "template_ensemble" in w for w in warns)
    assert not np.array_equal(in1, in3)

    # the fingerprint now records the new config: resume is clean again
    in4, _, warns, _ = _run(tmp, root, name="meta", resume=True,
                            template_ensemble=True)
    np.testing.assert_array_equal(in3, in4)
    assert not any("different configuration" in w for w in warns)


def test_resume_weight_swap_rescores(workdir, tmp_path):
    """Swapping the checkpoint file under an unchanged config must make
    --resume rescore: every flag stays equal while every number changes,
    so the fingerprint needs weight CONTENT identity, not just config
    (VERDICT r4 weak #2)."""
    tmp, root = workdir
    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.convert import save_params
    from mcm_tpu.models.init import init_clip

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    cfg = CLIP_CONFIGS["ViT-B/16"]()  # tiny double (fixture)
    ckpt = str(ckpt_dir / "ViT-B-16.npz")
    save_params(init_clip(0, cfg), ckpt)

    in1, _, _, _ = _run(tmp, root, name="wswap", ckpt_dir=str(ckpt_dir))

    # unchanged weights → clean resume, caches reused byte-for-byte
    in2, _, warns, _ = _run(tmp, root, name="wswap", resume=True,
                            ckpt_dir=str(ckpt_dir))
    np.testing.assert_array_equal(in1, in2)
    assert not any("different configuration" in w for w in warns)

    # swap the checkpoint IN PLACE: flags identical, bytes differ
    save_params(init_clip(1, cfg), ckpt)
    in3, _, warns, _ = _run(tmp, root, name="wswap", resume=True,
                            ckpt_dir=str(ckpt_dir))
    assert any("different configuration" in w and "weight_identity" in w
               for w in warns)
    assert not np.array_equal(in1, in3)


def test_resume_tokenizer_swap_rescores(workdir, tmp_path):
    """Swapping vocab.json/merges.txt under an unchanged config must make
    --resume rescore: tokenization changes every text feature and score
    while every flag stays equal, so the fingerprint records the tokenizer
    files' content identity alongside the weights (review finding,
    round 5)."""
    tmp, root = workdir
    from util_synth import make_clip_vocab

    tok_dir = tmp_path / "ckpts"
    make_clip_vocab(str(tok_dir))

    in1, _, _, _ = _run(tmp, root, name="tswap", ckpt_dir=str(tok_dir))

    # unchanged tokenizer → clean resume
    in2, _, warns, _ = _run(tmp, root, name="tswap", resume=True,
                            ckpt_dir=str(tok_dir))
    np.testing.assert_array_equal(in1, in2)
    assert not any("different configuration" in w for w in warns)

    # swap merges.txt IN PLACE: flags identical, tokenization differs
    merges = tok_dir / "merges.txt"
    lines = merges.read_text(encoding="utf-8").splitlines()
    merges.write_text("\n".join(lines[:5]) + "\n", encoding="utf-8")
    in3, _, warns, _ = _run(tmp, root, name="tswap", resume=True,
                            ckpt_dir=str(tok_dir))
    assert any("different configuration" in w and "weight_identity" in w
               for w in warns)
    assert not np.array_equal(in1, in3)


def test_meta_mismatch_purges_stale_caches(workdir):
    """A config mismatch must DELETE the stale score/feature/text caches,
    not just disable --resume: the new meta is recorded at run start, and
    a crash mid-sweep would otherwise leave old-config caches on disk
    matching the new fingerprint (advisor finding, round 4)."""
    import logging
    import warnings

    tmp, root = workdir
    # eval_accuracy takes the shared-features fast path, which persists all
    # three guarded artifact classes: scores, ID features, text features
    _, _, _, log_dir = _run(tmp, root, name="purge", eval_accuracy=True)

    from mcm_tpu.runner import RunConfig, _check_cache_meta

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        assert any(p.endswith("_scores.npy") for p in os.listdir(log_dir))
        assert any(p.endswith("_features.npz") for p in os.listdir(log_dir))
        assert any(p.endswith("_text_features.npz")
                   for p in os.listdir(log_dir))
        # the meta check alone, under a changed config — as if the rescore
        # run crashed immediately after recording the new fingerprint
        cfg = RunConfig(in_dataset="pet37", root_dir=root, batch_size=8,
                        allow_random_weights=True, n_devices=1,
                        out_datasets=["dtd"], name="purge",
                        template_ensemble=True, resume=True)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            _check_cache_meta(cfg, logging.getLogger("test"))
        left = os.listdir(log_dir)
        assert not any(p.endswith("_scores.npy") for p in left)
        assert not any(p.endswith("features.npz") for p in left)
    finally:
        os.chdir(cwd)


def test_file_identity_content_only(tmp_path):
    """The identity is content-only: an in-place overwrite (same size,
    restored mtime — the case stat alone can't see) must change it, a
    touch/re-copy of byte-identical content must NOT (a spurious mismatch
    purges every cache and forces hours of device rescoring), and a
    tail-only edit of a large file must be caught by the tail hash."""
    from mcm_tpu.models.convert import file_identity

    p = tmp_path / "w.npz"
    p.write_bytes(b"a" * 4096)
    id1 = file_identity(str(p))
    p.write_bytes(b"b" * 4096)                    # same size, new content
    os.utime(p, ns=(1, 1))                        # restored mtime
    id2 = file_identity(str(p))
    assert id1["size"] == id2["size"]
    assert id1 != id2
    # byte-identical touch/re-copy: identity unchanged
    os.utime(p, ns=(2_000_000_000, 2_000_000_000))
    assert file_identity(str(p)) == id2
    # >2 MiB file differing ONLY past the first MiB: tail hash catches it
    big = tmp_path / "big.npz"
    blob = bytearray(b"x" * (3 << 20))
    big.write_bytes(blob)
    id3 = file_identity(str(big))
    blob[-1] = ord(b"y")                          # last byte only
    big.write_bytes(blob)
    assert file_identity(str(big)) != id3
    # flat (non-zip) >3 MiB file edited ONLY in the exact middle — head,
    # tail and size intact (a mid-file tensor overwritten in place in a
    # raw safetensors; review finding, round 5): the middle slice sees it
    flat = tmp_path / "model.safetensors"
    blob = bytearray(b"x" * (5 << 20))
    flat.write_bytes(blob)
    id4 = file_identity(str(flat))
    blob[len(blob) // 2] = ord(b"y")              # one mid-file byte
    flat.write_bytes(blob)
    assert file_identity(str(flat)) != id4
    assert file_identity(None) is None


def test_weight_identity_skips_tokenizer_for_maha(tmp_path, monkeypatch):
    """--score maha never tokenizes (needs_text is False; image features
    only), so the fingerprint must NOT include the tokenizer: a vocab
    landing in the checkpoint dir would otherwise purge hours of maha
    device rescoring for identical numbers (review finding, round 5).
    Safe because maha caches live in their own score-keyed
    log_directory."""
    from util_synth import make_clip_vocab
    from mcm_tpu.runner import RunConfig, _weight_identity

    kw = dict(in_dataset="pet37", root_dir="x", allow_random_weights=True,
              ckpt_dir=str(tmp_path))
    ident_maha = _weight_identity(RunConfig(score="maha", **kw))
    assert "tokenizer" not in ident_maha
    # the text-scoring fingerprint DOES key on the tokenizer appearing
    ident_mcm0 = _weight_identity(RunConfig(score="MCM", **kw))
    assert ident_mcm0["tokenizer"] is None
    make_clip_vocab(str(tmp_path))
    ident_mcm1 = _weight_identity(RunConfig(score="MCM", **kw))
    assert ident_mcm1["tokenizer"] is not None
    # ... while the maha fingerprint is unmoved by it
    assert _weight_identity(RunConfig(score="maha", **kw)) == ident_maha


def test_maha_fully_cached_resume_builds_no_templates(workdir, monkeypatch):
    """A fully-cached maha --resume must not touch templates at all (with
    the default --generate, building them re-extracts the entire train
    set on device for values nothing consumes)."""
    tmp, root = workdir
    tpl = os.path.join(str(tmp), "tpl_full")
    _run(tmp, root, name="maha_full", score="maha", template_dir=tpl)

    import mcm_tpu.runner as runner

    def boom(*a, **k):
        raise AssertionError("templates built on a fully-cached resume")

    monkeypatch.setattr(runner, "_maha_templates", boom)
    in2, out2, _, _ = _run(tmp, root, name="maha_full", score="maha",
                           resume=True, template_dir=tpl)
    assert np.isfinite(in2).all() and np.isfinite(out2).all()


def test_maha_partial_resume_reuses_template_cache(workdir, monkeypatch):
    """A partial maha --resume needs templates, but must load the cached
    npz instead of re-extracting the train set (the default --generate
    regenerates on non-resume runs only)."""
    tmp, root = workdir
    tpl = os.path.join(str(tmp), "tpl_part")
    in1, out1, _, log_dir = _run(tmp, root, name="maha_part", score="maha",
                                 template_dir=tpl)
    os.unlink(os.path.join(log_dir, "dtd_scores.npy"))

    import mcm_tpu.runner as runner

    def boom(*a, **k):
        raise AssertionError("train set re-extracted despite cached "
                             "templates under --resume")

    monkeypatch.setattr(runner, "extract_features", boom)
    in2, out2, _, _ = _run(tmp, root, name="maha_part", score="maha",
                           resume=True, template_dir=tpl)
    np.testing.assert_array_equal(in1, in2)
    np.testing.assert_array_equal(out1, out2)


def test_batch_size_must_divide_data_mesh():
    """Indivisible static batches must fail at build time with a clear
    message, not minutes later at the first sharded dispatch."""
    from mcm_tpu.runner import RunConfig, build_model_and_step

    cfg = RunConfig(batch_size=6, n_devices=4, allow_random_weights=True)
    with pytest.raises(ValueError, match="not divisible"):
        build_model_and_step(cfg)


def test_maha_templates_refuse_swapped_weights(workdir, tmp_path):
    """Maha templates live OUTSIDE the fingerprint-purged log_directory,
    so a checkpoint swapped under an unchanged config must make the
    cached-template LOAD refuse loudly — silently scoring new-weight
    features against old-weight mu/prec is the stale-mix class the meta
    fingerprint kills for every other cache (review finding, round 5)."""
    tmp, root = workdir
    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.convert import save_params
    from mcm_tpu.models.init import init_clip

    ckpt_dir = tmp_path / "maha_ckpts"
    ckpt_dir.mkdir()
    cfg = CLIP_CONFIGS["ViT-B/16"]()  # tiny double (fixture)
    ckpt = str(ckpt_dir / "ViT-B-16.npz")
    save_params(init_clip(0, cfg), ckpt)

    # cold maha run estimates + caches weight-fingerprinted templates
    _run(tmp, root, name="mswap", score="maha", ckpt_dir=str(ckpt_dir))
    # same config, swapped checkpoint: the template load must refuse
    save_params(init_clip(1, cfg), ckpt)
    with pytest.raises(ValueError, match="DIFFERENT weights"):
        _run(tmp, root, name="mswap", score="maha", generate=False,
             ckpt_dir=str(ckpt_dir))


def test_atomic_write_crash_leaves_old_artifact(tmp_path):
    """A crash mid-write must leave the previous artifact intact and no
    .tmp litter — --resume trusts whatever is on disk, so a truncated
    npz would poison every subsequent resume (review finding, round 5)."""
    from mcm_tpu.utils.results import atomic_write

    path = str(tmp_path / "a.npz")
    atomic_write(path, lambda f: np.savez(f, x=np.arange(3)))
    with np.load(path) as d:
        np.testing.assert_array_equal(d["x"], np.arange(3))

    def boom(f):
        f.write(b"partial")
        raise RuntimeError("crash mid-write")

    with pytest.raises(RuntimeError, match="mid-write"):
        atomic_write(path, boom)
    # old content intact, no tmp file left behind
    with np.load(path) as d:
        np.testing.assert_array_equal(d["x"], np.arange(3))
    assert os.listdir(tmp_path) == ["a.npz"]


def test_fully_cached_resume_uploads_no_params(workdir, monkeypatch):
    """A fully-cached --resume must never upload the parameter pytree:
    hundreds of MB of H2D through the tunnel feeding programs that never
    execute (device-free-resume contract; review finding, round 5)."""
    tmp, root = workdir
    _run(tmp, root, name="noput")   # populate every cache

    from mcm_tpu.parallel import eval_step

    def forbid(self, params):
        raise AssertionError("put_params called on a fully-cached resume")

    monkeypatch.setattr(eval_step.EvalStep, "put_params", forbid)
    in1, out1, warns, _ = _run(tmp, root, name="noput", resume=True)
    assert not any("different configuration" in w for w in warns)
    assert np.isfinite(in1).all() and np.isfinite(out1).all()


def test_atomic_write_tmp_is_pid_unique(tmp_path, monkeypatch):
    """Concurrent writers of the same artifact (multihost runs, same-name
    runs sharing a log_directory) must not share a tmp name: a fixed
    path + '.tmp' let writer B truncate A's in-flight tmp and A publish
    B's partial bytes (review finding, round 5)."""
    import os

    from mcm_tpu.utils.results import atomic_write

    seen = {}
    real_open = open

    def spy_open(path, *a, **k):
        p = str(path)
        if ".tmp" in p:
            seen["tmp"] = p
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", spy_open)
    path = str(tmp_path / "scores.npy")
    atomic_write(path, lambda f: np.save(f, np.arange(3)))
    assert seen["tmp"].endswith(f".tmp.{os.getpid()}")
    np.testing.assert_array_equal(np.load(path), np.arange(3))
