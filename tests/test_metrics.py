"""Metric-suite tests (replaces the reference's stale tests/test_metrics.py)."""

import math

import pytest

from rtvc_tpu import metrics


def test_ptb_tokenize_basic():
    assert metrics.ptb_tokenize("A man, running!") == ["a", "man", "running"]
    assert metrics.ptb_tokenize("don't stop") == ["do", "n't", "stop"]


def test_bleu_perfect_match():
    gts = {"1": [["a", "man", "is", "running", "fast"]]}
    res = {"1": ["a", "man", "is", "running", "fast"]}
    scores = metrics.bleu(gts, res)
    assert all(abs(s - 1.0) < 1e-6 for s in scores)


def test_bleu_partial():
    gts = {"1": [["the", "cat", "sat", "on", "the", "mat"]]}
    res = {"1": ["the", "cat", "on", "the", "mat"]}
    scores = metrics.bleu(gts, res)
    assert 0 < scores[3] < 1.0
    assert scores[0] > scores[3]  # BLEU-1 >= BLEU-4


def test_bleu_brevity_penalty():
    gts = {"1": [["a"] * 10]}
    res = {"1": ["a"] * 5}
    s_short = metrics.bleu(gts, res)[0]
    res_full = {"1": ["a"] * 10}
    s_full = metrics.bleu(gts, res_full)[0]
    assert s_short < s_full
    assert abs(s_short - math.exp(1 - 10 / 5)) < 1e-6


def test_rouge_l():
    gts = {"1": [["a", "b", "c", "d"]]}
    res = {"1": ["a", "b", "c", "d"]}
    assert abs(metrics.rouge_l(gts, res) - 1.0) < 1e-6
    res2 = {"1": ["a", "x", "c", "y"]}
    assert 0 < metrics.rouge_l(gts, res2) < 1.0


def test_cider_identical_beats_disjoint():
    gts = {
        "1": [["a", "man", "rides", "a", "horse"]],
        "2": [["a", "dog", "plays", "with", "ball"]],
    }
    res_good = {"1": ["a", "man", "rides", "a", "horse"],
                "2": ["a", "dog", "plays", "with", "ball"]}
    res_bad = {"1": ["blue", "sky", "over", "city"],
               "2": ["green", "field", "at", "night"]}
    assert metrics.cider(gts, res_good) > metrics.cider(gts, res_bad)
    assert metrics.cider(gts, res_bad) < 1e-6


def test_meteor_lite_orders_quality():
    gts = {"1": [["a", "man", "is", "playing", "guitar"]]}
    exact = {"1": ["a", "man", "is", "playing", "guitar"]}
    close = {"1": ["a", "man", "plays", "guitar"]}
    wrong = {"1": ["purple", "elephant", "dances"]}
    m_exact = metrics.meteor_lite(gts, exact)
    m_close = metrics.meteor_lite(gts, close)
    m_wrong = metrics.meteor_lite(gts, wrong)
    assert m_exact > m_close > m_wrong
    assert m_wrong == 0.0


def test_corpus_bleu_api():
    refs = [["a man is running"], ["a dog plays with a ball"]]
    cands = ["a man is running", "a dog plays with a ball"]
    score = metrics.calculate_bleu_score_corpus(refs, cands)
    assert abs(score - 100.0) < 1e-4


def test_evaluate_captions_sweep(tmp_path):
    outputs = [{"image_id": "vid1", "caption": "a man is running"}]
    annotations = {"vid1": ["a man is running", "a man runs"]}
    scores = metrics.evaluate_captions(outputs, annotations)
    assert set(scores) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                           "METEOR", "ROUGE_L", "CIDEr"}
    assert scores["Bleu_1"] > 0.99


def test_calculate_score_files(tmp_path):
    import json
    ann = {"annotations": [
        {"image_id": "v1", "caption": "a man is running"},
        {"image_id": "v1", "caption": "someone runs"},
    ]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    outputs = [{"image_id": "v1", "caption": "a man is running"}]
    logfile = tmp_path / "log.txt"
    out = metrics.calculate_score(outputs, str(logfile), str(tmp_path),
                                  ann_file=str(ann_file))
    assert out["Bleu_4"] > 99.0
    assert (tmp_path / "validation_preds.json").exists()
    assert "Bleu_4" in logfile.read_text()


# ---------------------------------------------------------------------------
# Golden tests: Porter stemmer + metric constants (VERDICT r1 next #4)
# ---------------------------------------------------------------------------

def test_porter_stem_classic_pairs():
    """Canonical examples from Porter (1980) / the reference C implementation
    (2-letter words are returned unchanged, matching the C code's
    ``if (k <= k0+1) return``)."""
    from rtvc_tpu.metrics import porter_stem

    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "bled": "bled", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "differentli": "differ", "vileli": "vile",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, want in pairs.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_porter_stem_matches_nltk_original():
    """Exhaustive cross-check against nltk's ORIGINAL_ALGORITHM Porter mode
    (identical for words of length > 2; length <= 2 follows Porter's C)."""
    nltk = pytest.importorskip("nltk")
    ps = nltk.stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    from rtvc_tpu.metrics import porter_stem

    words = set()
    import os as _os
    import re as _re
    for root, _, files in _os.walk(_os.path.dirname(nltk.__file__)):
        for fn in files:
            if fn.endswith(".py"):
                try:
                    txt = open(_os.path.join(root, fn), errors="ignore").read()
                except OSError:
                    continue
                words.update(_re.findall(r"[a-z]{3,}", txt.lower()))
        if len(words) > 5000:
            break
    assert len(words) > 1000
    for w in sorted(words)[:5000]:
        assert porter_stem(w) == ps.stem(w), w


def test_bleu_golden_vs_nltk():
    """coco-style corpus BLEU must agree with nltk's independent
    implementation when every n-gram precision is positive (the only case
    the definitions differ is coco's tiny/small zero-smoothing)."""
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    gts = {
        "1": [["a", "man", "is", "riding", "a", "bike", "down", "the", "road"],
              ["a", "person", "rides", "a", "bicycle", "on", "a", "street"]],
        "2": [["a", "dog", "runs", "in", "the", "park", "chasing", "a", "ball"]],
        "3": [["two", "people", "are", "cooking", "food", "in", "a", "kitchen"]],
    }
    res = {
        "1": ["a", "man", "is", "riding", "a", "bicycle", "down", "the", "street"],
        "2": ["a", "dog", "runs", "in", "the", "park", "with", "a", "ball"],
        "3": ["two", "people", "are", "cooking", "in", "a", "small", "kitchen"],
    }
    ours = metrics.bleu(gts, res)
    ids = sorted(gts)
    for n in range(1, 5):
        ref = nltk_bleu.corpus_bleu([gts[i] for i in ids],
                                    [res[i] for i in ids],
                                    weights=tuple([1.0 / n] * n))
        assert abs(ours[n - 1] - ref) < 1e-8, (n, ours[n - 1], ref)


def test_cider_golden_hand_computed():
    """CIDEr-D pinned to hand-derived constants (pycocoevalcap definition:
    clipped tf-idf cosine per n, sigma-6 length gaussian, x10).

    Fixture B, image 1 (ref 'a b c' / cand 'a b d', 2-image corpus so every
    n-gram idf = log 2): unigram cosine = 2/3, bigram = 1/2, tri/4-gram = 0;
    image 2 identical 5-token caption → all four sims = 1. CIDEr =
    (10*(2/3+1/2+0+0)/4 + 10*1)/2 = 6.4583."""
    gts = {"1": [["a", "b", "c"]], "2": [["f", "g", "h", "i", "j"]]}
    res = {"1": ["a", "b", "d"], "2": ["f", "g", "h", "i", "j"]}
    assert abs(metrics.cider(gts, res) - 6.458333333333333) < 1e-12
    # identical captions, unique n-grams → exactly 10.0
    gts2 = {"1": [["a", "b", "c", "d", "e"]], "2": [["f", "g", "h", "i", "j"]]}
    res2 = {"1": ["a", "b", "c", "d", "e"], "2": ["f", "g", "h", "i", "j"]}
    assert abs(metrics.cider(gts2, res2) - 10.0) < 1e-9
    # zero overlap → 0
    gts3 = {"1": [["a", "b", "c"]]}
    res3 = {"1": ["x", "y", "z"]}
    assert metrics.cider(gts3, res3) == 0.0


def test_rouge_l_golden_hand_computed():
    """ROUGE-L F(beta=1.2) pinned to hand-derived constants.

    img1: cand 'a b d' vs ref 'a b c': LCS=2, P=R=2/3 → F=2/3.
    img2 identical → 1. mean = 0.8333. Asymmetric case: cand 'a b' vs
    ref 'a b c': P=1, R=2/3 → F=(1+1.44)*P*R/(R+1.44*P)=0.77215."""
    gts = {"1": [["a", "b", "c"]], "2": [["f", "g", "h", "i", "j"]]}
    res = {"1": ["a", "b", "d"], "2": ["f", "g", "h", "i", "j"]}
    assert abs(metrics.rouge_l(gts, res) - 5.0 / 6.0) < 1e-12
    g2 = {"1": [["a", "b", "c"]]}
    r2 = {"1": ["a", "b"]}
    want = (2.44 * 1.0 * (2 / 3)) / ((2 / 3) + 1.44 * 1.0)
    assert abs(metrics.rouge_l(g2, r2) - want) < 1e-12


def test_meteor_uses_full_porter_stems():
    """Stem-stage matches: 'riding'/'rides' share the Porter stem 'ride'."""
    gts = {"1": [["a", "man", "rides", "a", "bike"]]}
    res = {"1": ["a", "man", "riding", "a", "bike"]}
    score = metrics.meteor_lite(gts, res)
    assert score > 0.9  # all 5 words align (4 exact + 1 stem match)
