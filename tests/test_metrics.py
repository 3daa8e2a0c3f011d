"""Metric-suite tests (replaces the reference's stale tests/test_metrics.py)."""

import math

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
