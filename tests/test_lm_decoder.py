"""N-gram LM + LM beam decoder tests: training/scoring/ARPA roundtrip and
LM rescoring flipping a near-tied AM decision (the pass-2 WFST-LM role)."""
import numpy as np
import pytest

from asr2pass_tpu.decode.context_graph import ContextGraph
from asr2pass_tpu.decode.lm_decoder import Lexicon, LmDecoder
from asr2pass_tpu.decode.ngram import BOS, EOS, NgramLM


CORPUS = [
    list("我爱北京"),
    list("我爱上海"),
    list("北京天安门"),
    list("我爱北京天安门"),
    list("上海很大"),
] * 3


def test_lm_train_and_score():
    lm = NgramLM.train(CORPUS, order=3)
    # seen continuation beats unseen
    seen = lm.score((BOS,), "我")
    unseen = lm.score((BOS,), "大")
    assert seen > unseen
    # context matters: 爱 after 我 is frequent
    assert lm.score(("我",), "爱") > lm.score(("大",), "爱")


def test_lm_sentence_ranking():
    lm = NgramLM.train(CORPUS, order=3)
    good = lm.sentence_logp(list("我爱北京"))
    bad = lm.sentence_logp(list("门安天爱我"))
    assert good > bad


def test_arpa_roundtrip(tmp_path):
    lm = NgramLM.train(CORPUS, order=2)
    p = str(tmp_path / "lm.arpa")
    lm.save_arpa(p)
    lm2 = NgramLM.load_arpa(p)
    assert lm2.order == 2
    for w in ["我", "爱", "北"]:
        np.testing.assert_allclose(lm.score((BOS,), w), lm2.score((BOS,), w),
                                   rtol=1e-5)


def _row(vocab, dist):
    row = np.full(len(vocab), -12.0, np.float32)
    for tok, lp in dist.items():
        row[vocab.index(tok)] = lp
    return row


def test_lm_decoder_corrects_near_tie():
    """AM slightly prefers a nonsense char; the LM flips it to the
    corpus-supported continuation."""
    lm = NgramLM.train(CORPUS, order=3)
    words = sorted({w for s in CORPUS for w in s})
    lex = Lexicon.from_words(words)
    vocab = ["<blank>", "<s>", "</s>"] + words
    dec = LmDecoder(lm, lex, lm_weight=0.8, beam=8)

    rows = np.stack([
        _row(vocab, {"我": -0.01}),
        _row(vocab, {"爱": -0.01}),
        # near tie: 门 slightly preferred by AM over 北
        _row(vocab, {"门": -0.60, "北": -0.70}),
        _row(vocab, {"京": -0.01}),
    ])
    text = dec.decode(rows, lambda i: vocab[i])
    assert text == "我爱北京"
    # sanity: without LM the AM argmax path is the nonsense one
    greedy = "".join(vocab[int(np.argmax(r))] for r in rows)
    assert greedy == "我爱门京"


def test_lm_decoder_bias_hotword():
    """Bias LM (AC automaton) pushes a hotword through the LM decode —
    the patched-kaldi BiasLmScore hook equivalence."""
    lm = NgramLM.train(CORPUS, order=3)
    words = sorted({w for s in CORPUS for w in s})
    lex = Lexicon.from_words(words)
    vocab = ["<blank>", "<s>", "</s>"] + words
    rows = np.stack([
        _row(vocab, {"我": -0.01}),
        _row(vocab, {"爱": -0.01}),
        _row(vocab, {"北": -0.05, "上": -0.9}),
        _row(vocab, {"京": -0.3, "海": -0.4}),
    ])
    plain = LmDecoder(lm, lex, lm_weight=0.5, beam=8)
    assert plain.decode(rows, lambda i: vocab[i]) == "我爱北京"
    bias = ContextGraph(context_score=6.0).build({"上海": None})
    boosted = LmDecoder(lm, lex, lm_weight=0.5, beam=8, bias=bias)
    assert boosted.decode(rows, lambda i: vocab[i]) == "我爱上海"


def test_lm_decoder_multichar_words():
    """Word-level lexicon entries (multi-unit) get LM scores at word ends."""
    lm = NgramLM.train([["北京", "欢迎", "你"]] * 5, order=2)
    lex = Lexicon()
    lex.add("北京", ["北", "京"])
    lex.add("欢迎", ["欢", "迎"])
    lex.add("你", ["你"])
    vocab = ["<blank>", "北", "京", "欢", "迎", "你"]
    rows = np.stack([
        _row(vocab, {"北": -0.01}),
        _row(vocab, {"京": -0.01}),
        _row(vocab, {"欢": -0.01}),
        _row(vocab, {"迎": -0.01}),
        _row(vocab, {"你": -0.01}),
    ])
    dec = LmDecoder(lm, lex, lm_weight=0.5, beam=8)
    assert dec.decode(rows, lambda i: vocab[i]) == "北京欢迎你"
