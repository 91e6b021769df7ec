"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer.

No CLIP vocab files exist on this zero-egress host, so the gate runs
both tokenizers over the SAME synthetic vocab/merges files — this
exercises every moving part (regex pre-tokenization, byte remap, merge
ranking, </w> handling, special framing, EOS padding) against the
installed reference implementation; with the real vocab.json/merges.txt
the algorithm is unchanged.
"""
import json

import numpy as np
import pytest

from videovanish_tpu.models.diffueraser.tokenizer import (
    BOS_ID, EOS_ID, CLIPTokenizer, bytes_to_unicode, null_text_ids,
)

TEXTS = [
    "hello world",
    "Hello,  WORLD!!",
    "a photo of a cat, 4k, highly detailed",
    "don't stop believing",
    "the-quick_brown fox 123",
    "  leading and trailing   ",
    "",
    "one",
    "hellohellohello",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_tok")
    base = list(bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    merges = [("h", "e"), ("l", "l"), ("o", "</w>"), ("he", "ll"),
              ("ll", "o</w>"), ("w", "o"), ("e", "r"), ("wo", "r"),
              ("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"),
              ("o", "n"), ("on", "e</w>"), ("1", "2</w>")]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.fixture(scope="module")
def ours(vocab_files):
    return CLIPTokenizer.from_files(*vocab_files)


@pytest.fixture(scope="module")
def theirs(vocab_files):
    from transformers import CLIPTokenizer as HFTok
    return HFTok(vocab_files[0], vocab_files[1])


@pytest.mark.parametrize("text", TEXTS)
def test_token_ids_match_transformers(ours, theirs, text):
    assert ours.encode(text) == theirs(text, add_special_tokens=False)[
        "input_ids"]


@pytest.mark.parametrize("text", TEXTS[:5])
def test_padded_call_matches_transformers(ours, theirs, text):
    want = theirs(text, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
    got = ours(text)
    assert got.dtype == np.int32 and got.shape == (77,)
    assert got.tolist() == want


def test_truncation_matches(ours, theirs):
    text = "hello " * 200
    want = theirs(text, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
    assert ours(text).tolist() == want


def test_null_ids_are_pure_specials(ours):
    ids = null_text_ids()
    assert ids.shape == (77,)
    # published CLIP special ids (vocab 49408: bos=49406, eos=49407)
    assert ids[0] == BOS_ID == 49406
    assert set(ids[1:].tolist()) == {EOS_ID} and EOS_ID == 49407
    # structurally identical to tokenizing "" (modulo the synthetic
    # vocab's own special ids)
    got = ours("")
    assert got[0] == ours.bos_id and set(got[1:].tolist()) == {ours.eos_id}
