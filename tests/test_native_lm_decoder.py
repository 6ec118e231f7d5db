"""Native C++ LM beam decoder parity vs decode/lm_decoder.py.

Same LM, lexicon, rows and bias must produce the same text (the native
path is the production pass-2 rescorer; the Python one is the executable
specification)."""
import numpy as np
import pytest

from asr2pass_tpu.decode.context_graph import ContextGraph
from asr2pass_tpu.decode.lm_decoder import Lexicon, LmDecoder
from asr2pass_tpu.decode.ngram import NgramLM
from asr2pass_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native lib unavailable")

CHARS = [chr(0x4E00 + i) for i in range(12)]
UNITS = ["<blank>", "<s>", "</s>", "<unk>"] + CHARS
TOKEN2ID = {t: i for i, t in enumerate(UNITS)}


def _setup(seed=0, order=3):
    rng = np.random.default_rng(seed)
    # words: all single chars + some multi-char words
    words = list(CHARS)
    for _ in range(8):
        ln = int(rng.integers(2, 4))
        words.append("".join(rng.choice(CHARS, ln)))
    words = sorted(set(words))
    sents = [[words[int(i)] for i in rng.integers(0, len(words), 6)]
             for _ in range(30)]
    lm = NgramLM.train(sents, order=order)
    lex = Lexicon()
    for w in words:
        lex.add(w, list(w))
    return lm, lex, rng


def _rows(rng, n=12):
    rows = rng.standard_normal((n, len(UNITS))).astype(np.float32) * 2.0
    rows -= np.log(np.exp(rows).sum(-1, keepdims=True))
    return rows


def id2tok(i):
    return UNITS[i]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_parity_no_bias(seed):
    lm, lex, rng = _setup(seed)
    py = LmDecoder(lm, lex, lm_weight=0.5)
    nat = bindings.NativeLmDecoder(lm, lex, TOKEN2ID, lm_weight=0.5)
    for _ in range(3):
        rows = _rows(rng)
        py.start_utterance()
        assert nat.decode(rows, id2tok) == py.decode(rows, id2tok)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_parity_with_hotword_bias(seed):
    lm, lex, rng = _setup(seed)
    hot = {"".join(rng.choice(CHARS, 2)): 12.0,
           "".join(rng.choice(CHARS, 3)): 8.0}
    py = LmDecoder(lm, lex, lm_weight=0.5,
                   bias=ContextGraph().build(hot))
    nat = bindings.NativeLmDecoder(lm, lex, TOKEN2ID, lm_weight=0.5,
                                   hotwords=hot)
    for _ in range(3):
        rows = _rows(rng)
        py.start_utterance()
        assert nat.decode(rows, id2tok) == py.decode(rows, id2tok)


def test_hotword_bias_changes_output():
    lm, lex, rng = _setup(99)
    rows = _rows(rng, n=8)
    # boost a specific 2-char sequence hard enough to flip the result
    target = CHARS[3] + CHARS[7]
    nat0 = bindings.NativeLmDecoder(lm, lex, TOKEN2ID)
    nat1 = bindings.NativeLmDecoder(lm, lex, TOKEN2ID,
                                    hotwords={target: 50.0})
    base = nat0.decode(rows, id2tok)
    boosted = nat1.decode(rows, id2tok)
    assert target in boosted or boosted != base


def test_native_is_faster():
    lm, lex, rng = _setup(5)
    py = LmDecoder(lm, lex)
    nat = bindings.NativeLmDecoder(lm, lex, TOKEN2ID)
    rows = _rows(rng, n=60)
    import time

    t0 = time.perf_counter()
    py.decode(rows, id2tok)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat.decode(rows, id2tok)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py  # typically 20-100x


@pytest.mark.parametrize("seed", [20, 21])
def test_clone_shares_tables_and_matches(seed):
    """Per-connection clones over the shared LM tables (a2p_lmdec_clone)
    decode exactly like freshly-built decoders — with and without
    hotword bias — and survive the base being freed first (the tables
    are refcounted in C++)."""
    lm, lex, rng = _setup(seed)
    base = bindings.NativeLmDecoder(lm, lex, TOKEN2ID, lm_weight=0.5)
    hws = {CHARS[0] + CHARS[1]: 8.0}
    fresh = bindings.NativeLmDecoder(lm, lex, TOKEN2ID, lm_weight=0.5,
                                     hotwords=hws)
    cl = base.clone(hws)
    cl_plain = base.clone()
    for _ in range(3):
        rows = _rows(rng)
        assert cl.decode(rows, id2tok) == fresh.decode(rows, id2tok)
        assert cl_plain.decode(rows, id2tok) == base.decode(rows, id2tok)
    del base, fresh
    rows = _rows(rng)
    assert isinstance(cl.decode(rows, id2tok), str)
