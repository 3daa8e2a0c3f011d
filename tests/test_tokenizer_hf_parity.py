"""Fuzzed parity: our offline WordPiece tokenizer vs the REAL HF BertTokenizer.

The reference tokenizes everything through HuggingFace's
``BertTokenizer.from_pretrained('bert-base-uncased', do_lower_case=True)``
(reference src/models/model.py:733). The actual bert-base-uncased vocab
needs network, but the tokenizer ALGORITHM does not: the slow (pure-Python)
``transformers.BertTokenizer`` loads from any local vocab.txt. These tests
instantiate it over OUR synthetic vocab and assert call-for-call equality
with ``rtvc_tpu.tokenization.BertWordPieceTokenizer`` on a deterministic
fuzz corpus — an independent-implementation pin far stronger than the
hand-written fixtures in test_tokenizer.py.

Covered surfaces (exactly what the reference calls):
- ``tokenize`` (basic + wordpiece, never-split special literals)
- ``encode`` / ``__call__`` input_ids
- ``decode(skip_special_tokens=True)`` incl. HF's
  ``clean_up_tokenization_spaces`` post-pass (on by default in the
  reference's transformers==4.35.0 — reference model.py:1013-1016 feeds
  these strings straight into the metric sweep)
"""

import random

import pytest

transformers = pytest.importorskip("transformers")

from rtvc_tpu.tokenization import BertWordPieceTokenizer
from rtvc_tpu.tokenization.vocab import build_synthetic_vocab


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    vocab = build_synthetic_vocab()
    vocab_file = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    with open(vocab_file, "w") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    ours = BertWordPieceTokenizer(vocab=vocab)
    return hf, ours


CURATED = [
    "",
    " ",
    "A man IS PLAYING with a dog!",
    "don't stop-me now, it's 3:45pm...",
    "héllo wörld — naïve café",
    "中文字 mixed with english 日本語",
    "  weird\t\nspacing and​ zero width ",
    "x" * 150,  # > max_chars_per_word -> [UNK]
    "[UNK] literal specials [CLS] mid[SEP]word [PAD][MASK]",
    "[unk] lowercase is NOT special",
    "emoji 🎸 and symbols ©®™ §¶",
    "numbers 123 45.67 8,900",
    'quotes "double" \'single\' `back`',
    "control\x00chars\x7fstripped",
    "� replacement char",
]


def _fuzz_corpus(n=400, seed=0):
    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "0123456789",
        "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
        " \t\n\r  ",
        "éàüñçøßÆŒ",
        "中文字日本語한국",
        "🎸🚀✨",
        "\x00\x01\x7f�​́",
    ]
    specials = ["[UNK]", "[CLS]", "[SEP]", "[PAD]", "[MASK]"]
    words = ["a", "man", "is", "playing", "guitar", "dog", "with",
             "guitarist", "running"]
    corpus = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 12)):
            kind = rng.random()
            if kind < 0.35:
                parts.append(rng.choice(words))
            elif kind < 0.45:
                parts.append(rng.choice(specials))
            else:
                pool = rng.choice(pools)
                parts.append("".join(rng.choice(pool)
                                     for _ in range(rng.randint(1, 10))))
        sep = rng.choice([" ", "", " ", "\t"])
        corpus.append(sep.join(parts))
    return corpus


def test_curated_tokenize_parity(pair):
    hf, ours = pair
    for text in CURATED:
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_fuzz_tokenize_parity(pair):
    hf, ours = pair
    for text in _fuzz_corpus():
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_fuzz_encode_parity(pair):
    hf, ours = pair
    for text in _fuzz_corpus(n=150, seed=1):
        assert ours.encode(text) == hf.encode(
            text, add_special_tokens=False), repr(text)
        assert ours.encode(text, add_special_tokens=True) == hf.encode(
            text, add_special_tokens=True), repr(text)


def test_fuzz_decode_parity(pair):
    """decode(skip_special_tokens=True) on encodings of fuzzed text AND on
    raw random id sequences (mid-word pieces, specials, out-of-range ids
    never emitted by encode)."""
    hf, ours = pair
    for text in _fuzz_corpus(n=150, seed=2):
        ids = hf.encode(text, add_special_tokens=False)
        assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True), \
            repr(text)
    rng = random.Random(3)
    vocab_size = ours.vocab_size
    for _ in range(200):
        ids = [rng.randrange(vocab_size) for _ in range(rng.randint(0, 20))]
        assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True), \
            ids


def test_decode_cleanup_semantics(pair):
    """The two cleanup effects the reference's metric strings depend on."""
    hf, ours = pair
    ids = hf.encode("don't stop, now!", add_special_tokens=False)
    got = ours.decode(ids)
    assert got == hf.decode(ids, skip_special_tokens=True)
    assert "'" in got and " ," not in got and " !" not in got
    # cleanup off reproduces the raw space-joined form
    raw = ours.decode(ids, clean_up_tokenization_spaces=False)
    assert raw == hf.decode(ids, skip_special_tokens=True,
                            clean_up_tokenization_spaces=False)
    assert " ' " in raw and " ," in raw


def test_unk_dropped_by_skip_special(pair):
    """HF's all_special_ids includes [UNK]: unknowns vanish from decoded
    predictions/GT exactly as in the reference's eval path."""
    hf, ours = pair
    ids = [ours.unk_token_id, ours.vocab["a"], ours.unk_token_id]
    assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True) == "a"
