"""Text front-end tests: pure-python BPE, CJK pre-tokenization, segmenter
parity against the reference's (pure-python) splitter."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

from indextts_tpu.text.front import (TextNormalizer, TextTokenizer,
                                     de_tokenize_by_cjk_char,
                                     tokenize_by_cjk_char)
from indextts_tpu.text.spm import PureSentencePiece, build_model_file


def _tiny_spm(tmp_path):
    """BPE vocab with all intermediate merges present (as real sentencepiece
    BPE models have by construction)."""
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    words = ["▁HELLO", "▁WORLD", "▁THE", "▁你", "▁好", "▁世", "▁界"]
    vocab = []
    for w in words:
        for i in range(2, len(w) + 1):  # all prefixes: ▁H, ▁HE, ...
            vocab.append(w[:i])
    vocab += ["▁.", "▁,", "▁!", "▁?", ".", ",", "▁'", "'", "-", "▁...",
              "▁", "E", "L", "O", "R", "D", "H", "T", "A", "B", "C"]
    seen = set()
    score = -1.0
    for w in vocab:
        if w in seen:
            continue
        seen.add(w)
        pieces.append((w, score, 1))
        score -= 1.0
    p = str(tmp_path / "bpe.model")
    build_model_file(pieces, p)
    return p


def test_pure_spm_roundtrip(tmp_path):
    path = _tiny_spm(tmp_path)
    sp = PureSentencePiece.from_file(path)
    assert sp.GetPieceSize() > 10
    assert sp.unk_id() == 0
    toks = sp.Encode("HELLO WORLD .", out_type=str)
    assert toks[0] == "▁HELLO" and toks[1] == "▁WORLD"
    ids = sp.Encode("HELLO WORLD .", out_type=int)
    assert sp.Decode(ids) == "HELLO WORLD ."


def test_cjk_tokenize_roundtrip():
    s = "你好世界是 hello world 的中文"
    t = tokenize_by_cjk_char(s)
    assert t == "你 好 世 界 是 HELLO WORLD 的 中 文"
    back = de_tokenize_by_cjk_char(t, do_lower_case=True)
    assert back == "你好世界是hello world的中文"


def test_tokenizer_api(tmp_path):
    path = _tiny_spm(tmp_path)
    tok = TextTokenizer(path)
    toks = tok.tokenize("hello world .")
    assert isinstance(toks, list) and len(toks) >= 2
    ids = tok.convert_tokens_to_ids(toks)
    assert all(isinstance(i, int) for i in ids)
    assert tok.convert_ids_to_tokens(ids) == toks


def _ref_split(tokens, max_tokens, qst=0):
    from indextts.utils.front import TextTokenizer as RefTok

    return RefTok.split_segments_by_token(
        tokens, RefTok.punctuation_marks_tokens,
        max_text_tokens_per_segment=max_tokens, quick_streaming_tokens=qst)


@pytest.mark.parametrize("max_tokens,qst", [(10, 0), (6, 0), (120, 0), (10, 3)])
def test_segmenter_parity(max_tokens, qst):
    cases = [
        ["▁HELLO", "▁WORLD", "▁.", "▁THE", "▁END", "▁!", "▁A", "▁B", "▁?"],
        ["▁A"] * 25,  # overlong, no punctuation
        ["▁A", "▁,", "▁B", "▁C", "▁,", "▁D", "▁."] * 3,
        ["▁X", "-", "▁Y", "-", "▁Z"] * 4,
        ["▁HI", "▁."],
        [],
        ["▁A", "▁B", "▁.", "▁'", "▁C", "▁."],
    ]
    import warnings as w

    for tokens in cases:
        with w.catch_warnings():
            w.simplefilter("ignore")
            ref = _ref_split(list(tokens), max_tokens, qst)
            ours = TextTokenizer.split_segments_by_token(
                list(tokens), TextTokenizer.PUNCTUATION_MARKS_TOKENS,
                max_tokens, qst)
        assert ours == ref, f"tokens={tokens} max={max_tokens} qst={qst}"


def test_normalizer_fallback_english():
    n = TextNormalizer()
    n.load()
    out = n.normalize("I have 3 cats.")
    assert "three" in out
    out = n.normalize('He said "hello"!')
    assert '"' not in out  # char replacement map applied


def test_normalizer_protects_tech_terms():
    n = TextNormalizer()
    n.load()
    out = n.normalize("GPT-5-nano is fast")
    assert "GPT-" in out


def test_normalizer_glossary():
    n = TextNormalizer(enable_glossary=True)
    n.load()
    n.load_glossary({"C++": {"en": "C plus plus", "zh": "C 加加"}})
    out = n.normalize("I love C++ a lot")
    assert "C plus plus" in out


def test_native_bpe_matches_python(tmp_path):
    """The C merge loop must match the pure-python reference encoder."""
    from indextts_tpu.native import get_bpe_native
    from indextts_tpu.text.spm import PureSentencePiece

    path = _tiny_spm(tmp_path)
    sp = PureSentencePiece.from_file(path)
    if sp._native is None:
        pytest.skip("native BPE toolchain unavailable")

    import random

    random.seed(0)
    words = ["▁HELLO", "▁WORLD", "▁THE", "▁你", "▁好", "▁HELLOWORLD", "▁Z",
             "▁HELLLO", "▁THETHE"]
    for w in words:
        native = sp._encode_word(w)
        sp_py = PureSentencePiece(sp.pieces)
        sp_py._native = None
        py = sp_py._encode_word(w)
        assert native == py, (w, native, py)
