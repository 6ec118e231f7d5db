"""TLG.fst ingestion + decoding: use existing compiled decoding graphs.

Reference deployments ship `TLG.fst` + symbol tables built by
utils/ngram_tools/train_compile_ngram.sh and decode through
WfstDecoder (onnxruntime/src/wfst-decoder.cpp:27-92). Here the same
artifacts load through the native FST runtime (native/src/fst.cc reads
OpenFST vector/const files) and decode with the native beam token-passer
(native/src/tlg_decoder.cc), including the per-connection hotword bias
hook and nbest output (wfst-decoder.cpp:149-179 role).

Artifacts we build ourselves (tools/build_tlg.py) use the same format, so
graphs are interchangeable in both directions.

Symbol conventions: TLG input labels are AM-token ids + 1 (0 = epsilon);
output labels are word ids from words.txt. `tokens.txt` / `words.txt`
follow the kaldi "symbol id" line format.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from asr2pass_tpu.native.bindings import (
    NativeAcBias,
    NativeFst,
    NativeTlgFstDecoder,
    available,
)


def read_symbols(path: str) -> Dict[str, int]:
    out: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = int(parts[1])
    return out


class TlgGraph:
    """Loaded-once, shared read-only TLG resources: the graph, symbol
    tables and the ilabel->AM-token gather map. The reference loads these
    ONCE at FunASRWfstDecoderInit and every connection shares them
    (funasrruntime.cpp:836-894, wfst-decoder.cpp:223-241); production
    graphs are hundreds of MB, so per-connection re-reads are seconds of
    disk+parse. Per-connection state lives in TlgDecoder."""

    def __init__(self, graph_dir: str, token2id: Dict[str, int]):
        if not available():
            raise RuntimeError("native lib unavailable")
        self.graph_dir = graph_dir
        self.fst = NativeFst(os.path.join(graph_dir, "TLG.fst"))
        self.word_syms = read_symbols(os.path.join(graph_dir, "words.txt"))
        self.id2word = {i: w for w, i in self.word_syms.items()}
        self.tok_syms = read_symbols(os.path.join(graph_dir, "tokens.txt"))
        # gather map: ilabel -> AM token id (missing units score -inf)
        max_il = max(self.tok_syms.values(), default=0)
        self.gather = np.full(max_il + 1, -1, np.int64)
        for unit, il in self.tok_syms.items():
            if unit in token2id:
                self.gather[il] = token2id[unit]


class TlgDecoder:
    """Drop-in for runtime/offline_asr's lm_decoder contract
    (start_utterance / decode(log_probs, id_to_token) -> text), backed by
    a TLG.fst graph. Pass a preloaded TlgGraph to share the graph across
    connections (per-connection work is then only the hotword bias
    attach + the beam search state)."""

    def __init__(self, graph: "TlgGraph | str", token2id: Dict[str, int],
                 lm_weight: float = 0.5, beam: float = 16.0,
                 max_active: int = 2000,
                 hotwords: Optional[Dict[str, float]] = None):
        if isinstance(graph, str):
            graph = TlgGraph(graph, token2id)
        self.graph = graph
        self.fst = graph.fst
        self.word_syms = graph.word_syms
        self.id2word = graph.id2word
        self._gather = graph.gather
        bias = None
        if hotwords:
            words, scores = [], []
            unit_of = graph.tok_syms
            for w, s in hotwords.items():
                ils = [unit_of.get(c) for c in w]
                if all(i is not None for i in ils) and ils:
                    words.append(ils)
                    # per-symbol incremental score like the AC bias LM
                    scores.append(float(s) / len(ils))
            if words:
                bias = NativeAcBias(words, scores)
        self._dec = NativeTlgFstDecoder(self.fst, beam=beam,
                                        max_active=max_active,
                                        ac_scale=1.0, lm_scale=lm_weight,
                                        bias=bias)

    def start_utterance(self):
        self._dec.start_utterance()

    def _rows_to_ilabel(self, log_probs: np.ndarray) -> np.ndarray:
        rows = np.full((log_probs.shape[0], len(self._gather)), -1e9,
                       np.float32)
        valid = self._gather >= 0
        rows[:, valid] = log_probs[:, self._gather[valid]]
        return rows

    def accept_rows(self, log_probs: np.ndarray) -> None:
        """Feed per-token log-prob rows incrementally (AcceptLoglikes +
        AdvanceDecoding, wfst-decoder.cpp:27-57): call repeatedly between
        chunks, read partial_text() in between, finish with
        decode_nbest([])/finalize."""
        for row in self._rows_to_ilabel(np.asarray(log_probs, np.float32)):
            self._dec.step(row)

    def partial_text(self) -> str:
        """Current best hypothesis mid-utterance (partial best path) —
        the reference emits these per chunk before FinalizeDecode."""
        word_ids = self._dec.partial()
        return "".join(self.id2word.get(w, "") for w in word_ids)

    def decode_nbest(self, log_probs: np.ndarray, n: int = 1
                     ) -> List[Tuple[str, float]]:
        """log_probs: [U, vocab] per-token rows (AcceptLoglikes role).
        Returns [(text, cost)] best-first."""
        self.accept_rows(log_probs)
        res = self._dec.nbest(n)
        out = []
        for word_ids, cost in res:
            out.append(("".join(self.id2word.get(w, "") for w in word_ids),
                        cost))
        return out

    def decode(self, log_probs: np.ndarray, id_to_token=None) -> str:
        res = self.decode_nbest(log_probs, 1)
        return res[0][0] if res else ""
