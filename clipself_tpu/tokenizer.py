"""CLIP byte-pair-encoding tokenizer (49408 vocab, 77 context).

A fresh implementation of the standard CLIP/GPT-2 BPE algorithm producing
token ids identical to the reference `SimpleTokenizer`
(`src/open_clip/tokenizer.py:70-214`). The vocab data file
`assets/bpe_simple_vocab_16e6.txt.gz` is OpenAI's public CLIP BPE merge
table (a data asset, not code).

Text cleaning: the reference uses ftfy + html.unescape; ftfy isn't available
here, so cleaning falls back to html.unescape + whitespace normalization
(identical behavior for well-formed ASCII/UTF-8 class names and prompts).
"""

from __future__ import annotations

import functools
import gzip
import html
from pathlib import Path
from typing import Iterable, Union

import numpy as np
import regex as re

_VOCAB_PATH = Path(__file__).resolve().parent / "assets" / "bpe_simple_vocab_16e6.txt.gz"

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
CONTEXT_LENGTH = 77


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 reversible byte <-> unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


def _clean_text(text: str, lower: bool = True) -> str:
    try:  # ftfy if present (parity with the reference); otherwise skip
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    text = text.strip()
    # the CLIP BPE is lowercase; HF tokenizers are case-sensitive and the
    # reference's HFTokenizer does not lowercase (tokenizer.py whitespace_clean)
    return text.lower() if lower else text


class SimpleTokenizer:
    def __init__(self, bpe_path: Union[str, Path] = _VOCAB_PATH):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")
        merge_lines = merge_lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merge_lines]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend([SOT_TEXT, EOT_TEXT])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )
        self.sot_token = self.encoder[SOT_TEXT]
        self.eot_token = self.encoder[EOT_TEXT]
        self.vocab_size = len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        bpe_tokens: list[int] = []
        text = _clean_text(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


class HFTokenizer:
    """HuggingFace tokenizer wrapper with the CLIP `tokenize` calling
    convention (reference `src/open_clip/tokenizer.py` HFTokenizer): callable
    on a string or list of strings, returns a padded [N, context_length]
    int32 id array."""

    def __init__(self, tokenizer_name: str):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)

    def save_pretrained(self, dest: str) -> None:
        self.tokenizer.save_pretrained(dest)

    def __call__(
        self, texts: Union[str, list[str]], context_length: int = CONTEXT_LENGTH
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        texts = [_clean_text(t, lower=False) for t in texts]
        out = self.tokenizer(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        )
        return out["input_ids"].astype(np.int32)


def tokenize(
    texts: Union[str, list[str]], context_length: int = CONTEXT_LENGTH
) -> np.ndarray:
    """Tokenize into a padded [N, context_length] int32 array; truncated
    sequences keep the EOT token at the end (reference tokenizer.py:187-214)."""
    if isinstance(texts, str):
        texts = [texts]
    tk = _default_tokenizer()
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [tk.sot_token] + tk.encode(text) + [tk.eot_token]
        if len(tokens) > context_length:
            tokens = tokens[:context_length]
            tokens[-1] = tk.eot_token
        result[i, : len(tokens)] = tokens
    return result
