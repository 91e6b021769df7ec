"""CLIP byte-pair-encoding tokenizer (pure Python, zero torch).

The reference conditions SD1.5 on the empty prompt through the pinned SD
repo's tokenizer (/root/reference/diffuerase.py:41-44 [external:
transformers CLIPTokenizer]). This is the same published algorithm
(Radford et al. 2021 simple_tokenizer): byte-to-unicode remap, regex
pre-tokenization, lowercasing + whitespace collapse, BPE merges with a
``</w>`` end-of-word marker, then ``<|startoftext|>`` / ``<|endoftext|>``
framing padded to 77 with the EOS id (SD1.5's pad token).

Vocab/merges ship with every SD checkpoint (tokenizer/vocab.json,
tokenizer/merges.txt); `from_files` loads those at conversion/run time.
`null_text_ids` needs no vocab at all — the empty prompt is pure special
tokens — so the null-prompt embedding can be derived from a converted
text encoder without the tokenizer files.

Parity gate: tests/test_tokenizer.py vs transformers.CLIPTokenizer.
"""
from __future__ import annotations

import functools
import json

import numpy as np

BOS_ID = 49406   # <|startoftext|> in the published CLIP vocab
EOS_ID = 49407   # <|endoftext|>; SD1.5 also pads with it
MAX_LEN = 77


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2/CLIP reversible byte -> printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class CLIPTokenizer:
    """Minimal CLIP BPE tokenizer over externally-supplied vocab files."""

    def __init__(self, vocab: dict, merges: list):
        import regex
        self.encoder = dict(vocab)
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.bos_id = self.encoder.get("<|startoftext|>", BOS_ID)
        self.eos_id = self.encoder.get("<|endoftext|>", EOS_ID)
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE)
        self._ws = regex.compile(r"\s+")

    # ------------------------------------------------------------------
    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str):
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is the "#version" header; blank lines at the end
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#version") and len(l.split()) == 2]
        return cls(vocab, merges)

    # ------------------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
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

    def tokenize(self, text: str) -> list:
        text = self._ws.sub(" ", text).strip().lower()
        toks = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            toks.extend(self.bpe(tok).split(" "))
        return toks

    def encode(self, text: str) -> list:
        """Token ids WITHOUT framing/padding."""
        return [self.encoder[t] for t in self.tokenize(text)]

    def __call__(self, text: str, max_length: int = MAX_LEN) -> np.ndarray:
        """SD-style ids: BOS + tokens (truncated) + EOS, padded with EOS
        to max_length. Returns (max_length,) int32."""
        ids = self.encode(text)[: max_length - 2]
        ids = [self.bos_id] + ids + [self.eos_id]
        ids += [self.eos_id] * (max_length - len(ids))
        return np.asarray(ids, np.int32)


def null_text_ids(max_length: int = MAX_LEN) -> np.ndarray:
    """Token ids of the empty prompt "": pure special tokens, so no
    vocab files are needed. This is what the reference's guidance-0
    pipeline feeds the text encoder for every frame."""
    return np.asarray([BOS_ID] + [EOS_ID] * (max_length - 1), np.int32)
