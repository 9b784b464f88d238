"""BLEU oracle tests vs nltk's corpus_bleu (no data files needed)."""

import numpy as np
import pytest
from nltk.translate.bleu_score import corpus_bleu as nltk_corpus_bleu

from mic_tpu.evals.bleu import bleu_1_to_4, corpus_bleu, word_tokenize


@pytest.mark.parametrize("max_order", [1, 2, 3, 4])
def test_corpus_bleu_matches_nltk(max_order):
    rng = np.random.default_rng(0)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "red", "."]
    preds, refs = [], []
    for _ in range(20):
        n = rng.integers(3, 12)
        preds.append(list(rng.choice(vocab, size=n)))
        refs.append([list(rng.choice(vocab, size=int(rng.integers(3, 12))))])
    ours = corpus_bleu(preds, refs, max_order=max_order)["bleu"]
    weights = tuple([1.0 / max_order] * max_order)
    theirs = nltk_corpus_bleu(refs, preds, weights=weights)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_perfect_match_is_one():
    toks = [["a", "b", "c", "d", "e"]]
    out = corpus_bleu(toks, [[toks[0]]], max_order=4)
    assert out["bleu"] == pytest.approx(1.0)
    assert out["brevity_penalty"] == 1.0


def test_word_tokenize_multilingual():
    assert word_tokenize("Ein großer Hund läuft!") == [
        "ein", "großer", "hund", "läuft", "!"
    ]
    assert word_tokenize("C'est l'été.") == ["c", "'", "est", "l", "'", "été", "."]


def test_bleu_1_to_4_keys():
    out = bleu_1_to_4(["the cat sat on a mat"], ["the cat sat on a mat"], "en")
    assert set(out) == {"bleu-1", "bleu-2", "bleu-3", "bleu-4"}
    assert out["bleu-4"] == pytest.approx(1.0)
