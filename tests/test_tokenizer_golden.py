"""BPE tokenizer golden parity vs the reference's simple_tokenizer.

The reference tokenizer (reference models/clip/_clip/simple_tokenizer.py)
is loaded standalone with ftfy stubbed to identity — all prompt text this
framework ever tokenizes is plain ASCII, where ftfy.fix_text is a no-op.
Two modes:

- always: a synthetic merge table in the real file format drives both
  tokenizers over every count prompt (exercises merge order, </w>
  handling, SOT/EOT framing, truncation);
- when ``$CLIP_BPE_VOCAB`` points at the real
  ``bpe_simple_vocab_16e6.txt.gz``: the same comparison on the genuine
  vocab (the configuration used with pretrained text towers).
"""

import gzip
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_TOKENIZER = "/root/reference/models/clip/_clip/simple_tokenizer.py"


@pytest.fixture(scope="module")
def ref_tokenizer_module():
    pytest.importorskip("regex")
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _prompts():
    from clip_ebc_tpu.models.clip.prompts import bin_prompts

    bins = tuple((float(i), float(i)) for i in range(11)) + ((11.0, float("inf")),)
    word = list(bin_prompts(bins, "word"))
    number = list(bin_prompts(bins, "number"))
    extra = [
        "a photo of a crowd",
        "There are forty-two people.",
        "  There   is no person.  ",
        "x" * 300,  # forces context-length truncation
    ]
    return word + number + extra


def _synthetic_vocab(path: str) -> None:
    """A miniature merge table in the exact file format the real
    bpe_simple_vocab_16e6.txt.gz uses (header line + 'a b' merges)."""
    merges = [
        "t h", "th e</w>", "e r", "er e</w>", "p e", "pe o", "peo p",
        "peop l", "peopl e</w>", "o n", "on e</w>", "i s</w>", "a r",
        "ar e</w>", "n o</w>", "m o", "mo r", "mor e</w>", "t w",
        "tw o</w>", "e n</w>", "t en</w>", "s e", "se v", "sev en</w>",
        "p h", "ph o", "pho t", "phot o</w>", "c r", "cr o", "cro w",
        "crow d</w>", "th a", "tha n</w>", "x x", "xx xx", "xxxx xxxx",
    ]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges))
        f.write("\n")


def _compare_on(vocab_path: str, ref_mod) -> None:
    from clip_ebc_tpu.models.clip.tokenizer import ClipTokenizer, tokenize

    ours = ClipTokenizer(vocab_path)
    theirs = ref_mod.SimpleTokenizer(bpe_path=vocab_path)

    for text in _prompts():
        ref_ids = theirs.encode(text)
        our_ids = ours.encode(text)
        assert our_ids == ref_ids, f"token mismatch for {text!r}"

    # full tokenize() framing vs the reference's tokenize
    # (reference models/clip/_clip/utils.py:209-249): SOT + ids + EOT,
    # zero-padded to 77.
    out = tokenize(_prompts()[:4], tokenizer=ours)
    for row, text in zip(out, _prompts()[:4]):
        ids = [ours.sot_token, *theirs.encode(text), ours.eot_token]
        expect = np.zeros(77, np.int32)
        expect[: len(ids)] = ids
        np.testing.assert_array_equal(row, expect)


def test_bpe_golden_parity_synthetic_vocab(tmp_path, ref_tokenizer_module):
    vocab = str(tmp_path / "vocab.txt.gz")
    _synthetic_vocab(vocab)
    _compare_on(vocab, ref_tokenizer_module)


@pytest.mark.skipif(
    not os.path.exists(os.environ.get("CLIP_BPE_VOCAB", "")),
    reason="real BPE vocab not present ($CLIP_BPE_VOCAB)",
)
def test_bpe_golden_parity_real_vocab(ref_tokenizer_module):
    _compare_on(os.environ["CLIP_BPE_VOCAB"], ref_tokenizer_module)
