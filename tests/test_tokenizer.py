"""Tokenizer unit tests (reference semantics: src/utils/tokenizer.py:5-27)."""

import pytest

from rtvc_tpu.tokenization import (
    BertWordPieceTokenizer,
    build_synthetic_vocab,
    encode_caption,
)
from rtvc_tpu.tokenization.vocab import CLS_ID, PAD_ID, SEP_ID, UNK_ID


@pytest.fixture(scope="module")
def tok():
    return BertWordPieceTokenizer(build_synthetic_vocab())


def test_special_token_ids(tok):
    assert tok.pad_token_id == PAD_ID == 0
    assert tok.cls_token_id == CLS_ID == 101
    assert tok.sep_token_id == SEP_ID == 102
    assert tok.unk_token_id == UNK_ID == 100


def test_basic_roundtrip(tok):
    ids = tok.encode("A man is playing guitar")
    assert tok.decode(ids) == "a man is playing guitar"


def test_wordpiece_subwords(tok):
    # 'guitarist' is not a whole word in the synthetic vocab -> subword pieces
    pieces = tok.tokenize("guitarist")
    assert len(pieces) >= 2
    assert pieces[0] == "guitar"
    assert all(p.startswith("##") for p in pieces[1:])
    joined = tok.decode(tok.convert_tokens_to_ids(pieces))
    assert joined == "guitarist"


def test_punctuation_split(tok):
    assert tok.tokenize("dog,cat") == ["dog", ",", "cat"]


def test_encode_caption_prepends_cls_no_sep(tok):
    ids = encode_caption("a man is running", tok)
    assert ids[0] == tok.cls_token_id
    assert ids[-1] != tok.sep_token_id  # reference quirk: no SEP appended


def test_encode_caption_keeps_tail_on_truncation(tok):
    long_caption = " ".join(["dog"] * 60)
    ids = encode_caption(long_caption, tok, max_text_len=10)
    assert len(ids) == 9  # CLS + (max_text_len - 2)
    assert ids[0] == tok.cls_token_id
    # truncation keeps the TAIL of the payload (reference tokenizer.py:23-25)
    dog_id = tok.vocab["dog"]
    assert all(i == dog_id for i in ids[1:])


def test_decode_skips_special_tokens(tok):
    ids = [tok.cls_token_id, tok.vocab["a"], tok.vocab["dog"], tok.sep_token_id,
           tok.pad_token_id, tok.pad_token_id]
    assert tok.decode(ids) == "a dog"


def test_unk_fallback(tok):
    ids = tok.encode("üñîçødé_zzz€")
    assert all(isinstance(i, int) for i in ids)


def test_vocab_file_roundtrip(tmp_path):
    from rtvc_tpu.tokenization.vocab import build_synthetic_vocab, load_vocab, save_vocab

    vocab = build_synthetic_vocab()
    path = tmp_path / "vocab.txt"
    save_vocab(vocab, str(path))
    loaded = load_vocab(str(path))
    assert loaded == vocab
    tok = BertWordPieceTokenizer(vocab_file=str(path))
    assert tok.cls_token_id == 101
    assert tok.decode(tok.encode("a dog runs")) == "a dog runs"
