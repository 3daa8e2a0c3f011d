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


# --------------------------------------------------------------------------
# METEOR: quantified cross-check vs nltk's independent implementation
# --------------------------------------------------------------------------

class _NoWordnet:
    """WordNet stub with no data: nltk's synonym stage becomes a no-op,
    leaving exactly the exact+stem pipeline meteor_lite runs offline."""

    def synsets(self, word):
        return []


class _Lemma:
    def __init__(self, name):
        self._name = name

    def name(self):
        return self._name


class _Synset:
    def __init__(self, words):
        self._lemmas = [_Lemma(w) for w in words]

    def lemmas(self):
        return self._lemmas


class _GroupWordnet:
    """WordNet stub serving fixed synonym groups (each group = 1 synset)."""

    def __init__(self, groups):
        self._by_word = {}
        for group in groups:
            syn = _Synset(group)
            for w in group:
                self._by_word.setdefault(w, []).append(syn)

    def synsets(self, word):
        return self._by_word.get(word, [])


def _caption_pairs(n=120):
    """Deterministic caption-domain fixture: reference sentences plus
    paraphrase-style candidates (inflection changes, word swaps, drops,
    insertions) — the perturbation classes METEOR's stages react to."""
    import random
    rng = random.Random(7)
    subjects = [["a", "man"], ["a", "woman"], ["a", "dog"],
                ["two", "people"], ["a", "group", "of", "people"],
                ["a", "chef"], ["a", "little", "kid"], ["a", "player"]]
    verbs = [["is", "playing"], ["is", "riding"], ["is", "cooking"],
             ["is", "singing"], ["is", "dancing", "to"], ["is", "watching"],
             ["is", "talking", "about"], ["is", "driving"]]
    objects = [["a", "guitar"], ["the", "piano"], ["a", "bike"],
               ["a", "video", "game"], ["some", "food"], ["a", "song"],
               ["a", "soccer", "ball"], ["the", "news"], ["a", "car"]]
    tails = [[], ["outdoors"], ["in", "a", "room"], ["on", "the", "street"],
             ["with", "friends"], ["at", "night"], ["in", "the", "kitchen"]]
    inflect = {"playing": "plays", "riding": "rides", "cooking": "cooks",
               "singing": "sings", "watching": "watches", "driving": "drives",
               "dancing": "dances", "talking": "talks"}
    pairs = []
    for _ in range(n):
        ref = (rng.choice(subjects) + rng.choice(verbs) + rng.choice(objects)
               + rng.choice(tails))
        cand = list(ref)
        for _ in range(rng.randint(1, 3)):
            op = rng.randrange(5)
            if op == 0 and any(w in inflect for w in cand):  # inflection
                i = next(i for i, w in enumerate(cand) if w in inflect)
                cand[i] = inflect[cand[i]]
                if i > 0 and cand[i - 1] == "is":
                    del cand[i - 1]
            elif op == 1 and len(cand) > 3:                  # drop a word
                del cand[rng.randrange(len(cand))]
            elif op == 2 and len(cand) > 3:                  # swap adjacent
                i = rng.randrange(len(cand) - 1)
                cand[i], cand[i + 1] = cand[i + 1], cand[i]
            elif op == 3:                                    # insert filler
                cand.insert(rng.randrange(len(cand) + 1),
                            rng.choice(["very", "really", "nicely"]))
            else:                                            # replace object
                cand[-1] = rng.choice(["thing", "object", "item"])
        pairs.append((ref, cand))
    return pairs


def test_meteor_gap_vs_nltk_quantified():
    """meteor_lite vs nltk's METEOR in the SAME no-WordNet mode (data-less
    wordnet stub, original Porter mode). Since round 4 the aligner is the
    EXACT chunk-minimizing search (the Java scorer's resolution order), so
    nltk's greedy reverse-scan alignment can never beat it: on every pair
    ours >= nltk, with equality wherever nltk's greedy happens to land on
    an optimal alignment (the vast majority). The remaining non-zero deltas
    are exactly the duplicate-word pairs where nltk is chunk-suboptimal —
    measured on this fixture: 116/120 identical, ours strictly better on
    the other 4, mean delta 0.0020, max 0.133 (docs/METRICS.md)."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.meteor_score import single_meteor_score

    stemmer = nltk.stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    stub = _NoWordnet()
    pairs = _caption_pairs(120)
    deltas = []
    for ref, cand in pairs:
        ours = metrics.meteor_lite({"0": [ref]}, {"0": cand}, synonyms=None)
        theirs = single_meteor_score(ref, cand, preprocess=lambda s: s,
                                     stemmer=stemmer, wordnet=stub)
        # dominance: in exact+stem mode both aligners find the maximum
        # match count (equivalence-relation matching), so the chunk-minimal
        # alignment's score is an upper bound on any greedy alignment's
        assert ours >= theirs - 1e-9, (ref, cand, ours, theirs)
        deltas.append(ours - theirs)
    deltas = sorted(deltas)
    mean = sum(deltas) / len(deltas)
    assert mean < 0.005, f"mean METEOR delta {mean:.4f}"
    assert deltas[-1] < 0.15, f"max METEOR delta {deltas[-1]:.4f}"
    agree = sum(d < 1e-9 for d in deltas)
    assert agree >= int(0.9 * len(deltas)), f"only {agree}/120 pairs identical"


def _align_bruteforce(edges, n_cand):
    """Plain recursive enumeration of every alignment — the trusted oracle
    for (max matches, min chunks, min distance) on tiny sentences."""
    best = [(0, 0, 0)]

    def rec(i, used, prev_j, matches, chunks, dist):
        if i == n_cand:
            key = (-matches, chunks, dist)
            if key < best[0]:
                best[0] = key
            return
        rec(i + 1, used, -2, matches, chunks, dist)
        for j in edges[i]:
            if j in used:
                continue
            rec(i + 1, used | {j}, j, matches + 1,
                chunks + (0 if prev_j == j - 1 else 1), dist + abs(i - j))

    rec(0, frozenset(), -2, 0, 0, 0)
    neg_m, ch, _ = best[0]
    return -neg_m, ch


def test_meteor_align_exact_matches_bruteforce_oracle():
    """_align_exact (memoized search) == exhaustive enumeration on random
    small duplicate-heavy sentences: the memoization and lexicographic
    pruning lose nothing."""
    import random
    rng = random.Random(7)
    vocab = ["a", "the", "man", "dog", "runs", "running", "sits", "fast"]
    for _ in range(200):
        cand = [rng.choice(vocab) for _ in range(rng.randint(1, 7))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 7))]
        edges = metrics._match_edges(cand, ref, None)
        got = metrics._align_exact(edges)
        want = _align_bruteforce(edges, len(cand))
        assert got == want, (cand, ref, got, want)


def test_meteor_chunk_minimizing_golden():
    """Hand-derived duplicate-word golden: ref 'the cat sat on the mat',
    cand 'the mat'. Greedy forward pairs cand 'the' with ref[0] -> 2
    chunks; the chunk-minimal alignment pairs it with ref[4] so
    ('the','mat') extends one diagonal run -> 1 chunk. m=2, P=1, R=1/3,
    fmean=(1/3)/(0.9+1/30)=0.357142857..., penalty=0.5*(1/2)^3=0.0625,
    score=0.334821428..."""
    ref = ["the", "cat", "sat", "on", "the", "mat"]
    cand = ["the", "mat"]
    m, chunks = metrics._meteor_align(cand, ref)
    assert (m, chunks) == (2, 1)
    # the old greedy scan lands on the 2-chunk alignment
    assert metrics._align_greedy(cand, ref) == (2, 2)
    got = metrics.meteor_lite({"0": [ref]}, {"0": cand})
    assert abs(got - (1 / 3) / (0.9 + 1 / 30) * (1 - 0.0625)) < 1e-12


def test_meteor_pooled_matching_beats_staged_greedy():
    """The jar pools all matchers' matches BEFORE resolving the alignment
    (max coverage first), so an exact match must not starve two pooled
    matches: cand [car, machine] vs ref [car, auto] with auto∈syn(car),
    car∈syn(machine) aligns car~auto + machine~car (2 matches), while the
    staged greedy burns car on its exact twin and strands machine (1)."""
    table = metrics._SynonymTable({
        "car": frozenset(["car", "auto", "automobile", "machine"]),
        "machine": frozenset(["machine", "car"]),
    })
    cand, ref = ["car", "machine"], ["car", "auto"]
    assert metrics._meteor_align(cand, ref, table) == (2, 2)
    assert metrics._align_greedy(cand, ref, table) == (1, 1)


def test_meteor_align_budget_falls_back_to_greedy(monkeypatch):
    """Past the node budget the aligner degrades to the greedy scan
    instead of hanging; on the all-duplicates worst case the greedy
    diagonal is chunk-optimal anyway."""
    monkeypatch.setattr(metrics, "_ALIGN_SEARCH_BUDGET", 10)
    cand = ["a"] * 12
    ref = ["a"] * 12
    assert metrics._meteor_align(cand, ref) == (12, 1)


def test_meteor_synonym_stage_matches_nltk():
    """With synonym data the third match stage activates and agrees with
    nltk's WordNet stage fed the same groups.

    Vocabulary is restricted to Porter fixed points (street, road, kid,
    child, car, auto, sofa, couch) because of an nltk implementation
    artifact: its stem stage rewrites the LEFTOVER words with their stems,
    so its synonym lookup runs on stems ('bicycle' becomes 'bicycl' and no
    longer matches any synset). The Java METEOR — and meteor_lite — match
    synonyms on surface forms; test_meteor_synonym_stage_beats_nltk_on_stems
    pins that documented difference."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.meteor_score import single_meteor_score

    groups = [["street", "road"], ["kid", "child"],
              ["car", "auto"], ["sofa", "couch"]]
    table = metrics._SynonymTable({
        w: frozenset(g) for g in groups for w in g})
    wn = _GroupWordnet(groups)
    stemmer = nltk.stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    # no duplicate words within a sentence: duplicate occurrences are
    # exactly the greedy-tie-break divergence the gap test above measures
    cases = [
        (["the", "man", "drives", "his", "car", "down", "this", "road"],
         ["the", "man", "drives", "his", "auto", "down", "this", "street"]),
        (["a", "kid", "sits", "on", "one", "sofa"],
         ["a", "child", "sits", "on", "one", "couch"]),
        (["the", "kid", "is", "near", "a", "car"],
         ["the", "child", "is", "near", "a", "auto"]),
    ]
    for ref, cand in cases:
        ours = metrics.meteor_lite({"0": [ref]}, {"0": cand}, synonyms=table)
        theirs = single_meteor_score(ref, cand, preprocess=lambda s: s,
                                     stemmer=stemmer, wordnet=wn)
        assert abs(ours - theirs) < 1e-9, (ref, cand, ours, theirs)
        base = metrics.meteor_lite({"0": [ref]}, {"0": cand}, synonyms=None)
        assert ours > base  # the synonym stage found extra matches


def test_meteor_synonym_stage_beats_nltk_on_stems():
    """Documented nltk artifact: nltk's synonym stage sees stemmed leftovers
    ('bicycle' → 'bicycl', missing its synset); meteor_lite matches surface
    forms like the Java scorer, so it finds the bike~bicycle match."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.meteor_score import single_meteor_score

    groups = [["bike", "bicycle", "cycle"]]
    table = metrics._SynonymTable({w: frozenset(g) for g in groups for w in g})
    wn = _GroupWordnet(groups)
    stemmer = nltk.stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    ref = ["the", "man", "rode", "his", "bicycle"]
    cand = ["the", "man", "rode", "his", "bike"]
    ours = metrics.meteor_lite({"0": [ref]}, {"0": cand}, synonyms=table)
    theirs = single_meteor_score(ref, cand, preprocess=lambda s: s,
                                 stemmer=stemmer, wordnet=wn)
    assert ours > 0.99  # all five words align (4 exact + 1 synonym)
    assert theirs < ours  # nltk misses the stemmed-away synonym match


def test_meteor_synonym_golden_hand_computed():
    """Hand-derived: ref 'a kid on a bike' vs cand 'a child on a cycle'.
    Exact matches: 'a' (x2), 'on' -> 3; synonym matches: kid~child,
    bike~cycle -> m=5 of 5/5, P=R=1, fmean=1. Alignment is monotone ->
    1 chunk, penalty = 0.5*(1/5)^3 = 0.004 -> score 0.996."""
    groups = [["bike", "bicycle", "cycle"], ["kid", "child"]]
    table = metrics._SynonymTable({w: frozenset(g) for g in groups for w in g})
    ref = ["a", "kid", "on", "a", "bike"]
    cand = ["a", "child", "on", "a", "cycle"]
    got = metrics.meteor_lite({"0": [ref]}, {"0": cand}, synonyms=table)
    assert abs(got - 0.996) < 1e-12, got


def test_load_wordnet_synonyms_group_file(tmp_path):
    p = tmp_path / "syns.txt"
    p.write_text("bike, bicycle, cycle\nkid child\n")
    table = metrics.load_wordnet_synonyms(str(p))
    assert "bicycle" in table("bike") and "cycle" in table("bike")
    assert "child" in table("kid")
    assert table("zebra") == frozenset(("zebra",))  # unknown → self only


def test_load_wordnet_synonyms_database_dir(tmp_path):
    """Parse the standard WordNet index.pos/data.pos format (the layout
    nltk's corpora/wordnet ships): the stage lights up from real data."""
    (tmp_path / "data.noun").write_text(
        "  1 header line to skip\n"
        "00001111 03 n 02 bike 0 bicycle 0 001 @ 00002222 n 0000 | a cycle\n"
        "00003333 03 n 02 kid 0 child 0 001 @ 00002222 n 0000 | a child\n")
    (tmp_path / "index.noun").write_text(
        "  1 header line to skip\n"
        "bike n 1 1 @ 1 0 00001111\n"
        "bicycle n 1 1 @ 1 0 00001111\n"
        "kid n 1 1 @ 1 0 00003333\n")
    table = metrics.load_wordnet_synonyms(str(tmp_path))
    assert "bicycle" in table("bike")
    assert "bike" in table("bicycle")
    assert "child" in table("kid")


def test_set_wordnet_path_installs_module_default(tmp_path):
    p = tmp_path / "syns.txt"
    p.write_text("bike cycle\n")
    gts = {"1": [["a", "bike"]]}
    res = {"1": ["a", "cycle"]}
    base = metrics.meteor_lite(gts, res)
    try:
        assert metrics.set_wordnet_path(str(p))
        assert metrics.meteor_lite(gts, res) > base
    finally:
        metrics.set_wordnet_path("")
    assert metrics.meteor_lite(gts, res) == base


def test_ptb_tokenize_matches_nltk_treebank():
    """Cross-check vs nltk's independent TreebankWordTokenizer (the same
    Penn-Treebank spec the Stanford jar implements). One documented
    deviation where OURS follows the jar and nltk does not: the jar
    normalizes brackets to -LRB-/-RRB-/... (then removed by the
    pycocoevalcap punctuation list), so we map nltk's raw bracket tokens
    through the same normalization before comparing."""
    nltk_tok = pytest.importorskip("nltk.tokenize")
    tb = nltk_tok.TreebankWordTokenizer()

    def nltk_ptb(s):
        toks = [metrics._BRACKETS.get(t, t)
                for t in tb.tokenize(s.lower().strip())]
        return [t for t in toks if t not in metrics._PTB_PUNCT]

    corpus = [
        "A man, running!", "don't stop", "it's a dog's life",
        "the man (in red) runs", "a 3.5 km run", "cars, trucks, and buses",
        'he said "hello world"', "a semi-final match", "i'll go; you won't",
        "two-thirds of the cake", "cannot stop won't stop",
        "u.s. army soldier", "the cat -- a tabby -- sleeps", "50% off sale",
        "a man's best friend...", "she's gonna win", "what?!",
        "3,000 people", "it costs $5.50", "o'clock chimes",
        "a man is playing guitar", "12:30 on the clock",
        "x-ray & mri scans", "they're gonna play soccer",
        "a dog; a cat: two pets", "we've been here",
        "i'm sure he'd agree", "she'll sing",
    ]
    for s in corpus:
        assert metrics.ptb_tokenize(s) == nltk_ptb(s), repr(s)


def test_ptb_tokenize_jar_semantics():
    """The cases where the jar's behavior is pinned directly (numbers,
    acronyms, currency/percent, assimilations, quote removal)."""
    f = metrics.ptb_tokenize
    assert f("a 3.5 km run") == ["a", "3.5", "km", "run"]
    assert f("3,000 people") == ["3,000", "people"]
    assert f("it costs $5.50") == ["it", "costs", "$", "5.50"]
    assert f("50% off") == ["50", "%", "off"]
    assert f("u.s. army") == ["u.s.", "army"]
    assert f("can't and cannot") == ["ca", "n't", "and", "can", "not"]
    assert f("she's gonna win") == ["she", "'s", "gon", "na", "win"]
    assert f('he said "hi"') == ["he", "said", "hi"]  # quotes vanish
    assert f("the man (in red)") == ["the", "man", "in", "red"]
