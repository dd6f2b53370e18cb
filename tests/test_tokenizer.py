"""Offline CLIP BPE tokenizer vs HuggingFace CLIPTokenizer on a synthetic
vocab (no network): identical ids, padding, and attention masks."""

import json

import numpy as np
import pytest

from mcm_tpu.text.tokenizer import (BOS_TOKEN, EOS_TOKEN, CLIPTokenizer,
                                    bytes_to_unicode)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    """Synthetic but structurally-real CLIP vocab: full byte alphabet,
    </w> variants, a handful of merges."""
    tmp = tmp_path_factory.mktemp("vocab")
    alphabet = list(bytes_to_unicode().values())
    tokens = alphabet + [c + "</w>" for c in alphabet]
    merges = [
        ("c", "a"), ("ca", "t</w>"), ("p", "h"), ("ph", "o"),
        ("pho", "t"), ("phot", "o</w>"), ("o", "f</w>"), ("a", "t</w>"),
        ("1", "2</w>"), ("!", "!</w>"),
    ]
    tokens += ["".join(m) for m in merges]
    tokens += [BOS_TOKEN, EOS_TOKEN]
    vocab = {t: i for i, t in enumerate(tokens)}

    vpath, mpath = tmp / "vocab.json", tmp / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    mpath.write_text("#version: 0.2\n" +
                     "\n".join(" ".join(m) for m in merges) + "\n",
                     encoding="utf-8")
    return str(vpath), str(mpath)


@pytest.fixture(scope="module")
def ours(vocab_files):
    return CLIPTokenizer(*vocab_files)


@pytest.fixture(scope="module")
def theirs(vocab_files):
    return transformers.CLIPTokenizer(vocab_files[0], vocab_files[1])


TEXTS = [
    "a photo of a cat",
    "a photo of a cat.",
    "CAT!!  cat   cat",
    "phot photo cat12 12",
    "  leading and trailing   ",
    "café naïve",          # multi-byte utf-8
    "a photo of a great white shark",
    "it's the cat's photo, isn't it?",
]


@pytest.mark.parametrize("text", TEXTS)
def test_single_text_matches_hf(ours, theirs, text):
    ref = theirs(text)["input_ids"]
    got = [ours.bos_id] + ours.encode(text) + [ours.eos_id]
    assert got == ref, f"{text!r}: {got} != {ref}"


def test_batch_padding_matches_hf(ours, theirs):
    ref = theirs(TEXTS, padding=True, return_tensors="np")
    ids, mask = ours(TEXTS)
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(np.int32))


def test_pad_to_multiple(ours):
    ids, mask = ours(["cat", "a photo of a cat"], pad_to_multiple=8)
    assert ids.shape[1] % 8 == 0
    assert (mask.sum(1) > 0).all()


def test_context_length_clamp(ours):
    ids, mask = ours(["cat " * 100], context_length=16)
    assert ids.shape == (1, 16)


def test_decode_roundtrip(ours):
    text = "a photo of a cat"
    ids = ours.encode(text)
    assert ours.decode(ids) == text


def test_eot_is_argmax_position(ours):
    """The text tower pools at argmax(ids) — EOT must be the largest id and
    padding (same id) must sit after it so argmax finds the true EOT."""
    ids, _ = ours(["cat", "a photo of a cat"])
    assert ours.eos_id == max(ours.encoder.values())
    eot_pos = np.argmax(ids, axis=1)
    assert eot_pos[0] < eot_pos[1]
    assert ids[0, eot_pos[0]] == ours.eos_id


def test_truncation_keeps_eos(ours):
    ids, mask = ours(["cat " * 100], context_length=16)
    assert ids[0, -1] == ours.eos_id  # EOS survives truncation
    assert int(np.argmax(ids[0])) == 15  # EOT pooling finds it


def test_literal_special_tokens_match_hf(ours, theirs):
    text = "cat <|endoftext|> cat"
    ref = theirs(text)["input_ids"]
    got = [ours.bos_id] + ours.encode(text) + [ours.eos_id]
    assert got == ref


def test_fuzz_random_strings_match_hf(ours, theirs):
    """300 random strings over a pool that stresses the pre-tokenizer
    regex (case folding, contractions, digit runs, multi-byte UTF-8,
    whitespace runs, emoji) — ids must match HF exactly on every one."""
    import random

    rnd = random.Random(1234)
    pool = (
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
        + list("0123456789")
        + list(" .,!?'-_()[]{}:;\"@#$%^&*+=/\\|~`")
        + list("éñüßçøæœ")
        + list("漢字カタカナ한글")
        + ["🌍", "🐱", "'s", "'t", "'re", "  ", "\t", "\n", "cat", "photo"]
    )
    for i in range(300):
        n = rnd.randrange(0, 40)
        text = "".join(rnd.choice(pool) for _ in range(n))
        ref = theirs(text)["input_ids"]
        got = [ours.bos_id] + ours.encode(text) + [ours.eos_id]
        assert got == ref, f"case {i}: {text!r}: {got} != {ref}"


def test_bpe_caches_single_char_tokens(ours):
    """The no-pairs early return must store its result too: one-letter
    words ("a" in every prompt template, digits, punctuation) are the
    most frequent tokens in a prompt corpus — exactly the entries the
    cache exists for."""
    ours._bpe_cache.clear()
    ours.encode("a")
    assert ours._bpe_cache.get("a") == ["a</w>"]
    # and the cached value is what a second call returns
    assert ours._bpe("a") == ["a</w>"]
