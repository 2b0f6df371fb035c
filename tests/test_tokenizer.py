"""Tokenizer structural tests + eval harness smoke test."""

import numpy as np

from clipself_tpu.tokenizer import SimpleTokenizer, tokenize


def test_vocab_structure():
    tk = SimpleTokenizer()
    assert tk.vocab_size == 49408
    assert tk.sot_token == 49406
    assert tk.eot_token == 49407


def test_roundtrip():
    tk = SimpleTokenizer()
    for text in ["a photo of a cat.", "the quick brown fox!", "person riding a horse"]:
        ids = tk.encode(text)
        assert all(0 <= i < 49408 for i in ids)
        # BPE decode restores words with spaces around punctuation (standard
        # CLIP decode); compare modulo that
        decoded = tk.decode(ids).replace(" .", ".").replace(" !", "!").strip()
        assert decoded == text


def test_known_clip_ids():
    """Golden ids for 'a photo of a cat' in the canonical CLIP vocabulary."""
    tk = SimpleTokenizer()
    assert tk.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


def test_tokenize_shape_and_truncation():
    out = tokenize(["a photo of a cat"], context_length=77)
    assert out.shape == (1, 77)
    assert out[0, 0] == 49406
    n = int((out[0] != 0).sum())
    assert out[0, n - 1] == 49407
    # long text truncates with EOT at the end
    long = tokenize(["word " * 200], context_length=16)
    assert long[0, -1] == 49407


def test_known_common_tokens():
    """Spot-check well-known CLIP BPE ids for common words."""
    tk = SimpleTokenizer()
    ids = tk.encode("a photo of a cat")
    # 'a' and 'of' are single tokens; the phrase must be 5 tokens
    assert len(ids) == 5
    assert ids[0] == ids[3]  # both 'a'


def test_eot_is_argmax():
    """encode_text pools at argmax(token ids) — EOT must be the max id."""
    out = tokenize(["a photo of a cat"], context_length=77)
    assert out[0].argmax() == int((out[0] != 0).sum()) - 1
