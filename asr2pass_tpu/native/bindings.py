"""ctypes bindings for the native host library, with lazy build.

Python fallbacks exist for every native function (frontend/audio.py,
decode/context_graph.py, pure-python edit distance); the native versions
are drop-in faster paths for host-bound work (bulk resampling, per-symbol
bias stepping inside beam search, WER over large corpora).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libasr2native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.a2p_resample.restype = ctypes.c_int64
    lib.a2p_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.a2p_ac_build.restype = ctypes.c_void_p
    lib.a2p_ac_build.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.a2p_ac_free.argtypes = [ctypes.c_void_p]
    lib.a2p_ac_step.restype = ctypes.c_float
    lib.a2p_ac_step.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int32]
    lib.a2p_ac_final.restype = ctypes.c_float
    lib.a2p_ac_final.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.a2p_edit_align.restype = ctypes.c_int64
    lib.a2p_edit_align.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.a2p_lmdec_create.restype = ctypes.c_void_p
    lib.a2p_lmdec_create.argtypes = [
        ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32,
        i32p, i32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32]
    lib.a2p_lmdec_free.argtypes = [ctypes.c_void_p]
    lib.a2p_lmdec_clone.restype = ctypes.c_void_p
    lib.a2p_lmdec_clone.argtypes = [ctypes.c_void_p]
    lib.a2p_lmdec_set_bias.argtypes = [ctypes.c_void_p, i32p, i32p, f32p,
                                       ctypes.c_int32]
    lib.a2p_lmdec_clear_bias.argtypes = [ctypes.c_void_p]
    lib.a2p_lmdec_decode.restype = ctypes.c_int64
    lib.a2p_lmdec_decode.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int64, ctypes.c_int32,
        i32p, ctypes.c_int32, i32p, i32p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.a2p_ac_num_states.restype = ctypes.c_int32
    lib.a2p_ac_num_states.argtypes = [ctypes.c_void_p]
    lib.a2p_fst_load.restype = ctypes.c_void_p
    lib.a2p_fst_load.argtypes = [ctypes.c_char_p]
    lib.a2p_fst_free.argtypes = [ctypes.c_void_p]
    lib.a2p_fst_info.argtypes = [ctypes.c_void_p, i64p]
    lib.a2p_fst_transduce.restype = ctypes.c_int64
    lib.a2p_fst_transduce.argtypes = [ctypes.c_void_p, i32p,
                                      ctypes.c_int64, i32p, ctypes.c_int64]
    lib.a2p_tlg_new.restype = ctypes.c_void_p
    lib.a2p_tlg_new.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                ctypes.c_int32, ctypes.c_float,
                                ctypes.c_float, ctypes.c_void_p]
    lib.a2p_tlg_free.argtypes = [ctypes.c_void_p]
    lib.a2p_tlg_start.argtypes = [ctypes.c_void_p]
    lib.a2p_tlg_step.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.a2p_tlg_partial.restype = ctypes.c_int64
    lib.a2p_tlg_partial.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64]
    lib.a2p_tlg_nbest.restype = ctypes.c_int64
    lib.a2p_tlg_nbest.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p,
                                  ctypes.c_int64, f32p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.a2p_vad_new.restype = ctypes.c_void_p
    lib.a2p_vad_new.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int]
    lib.a2p_vad_free.argtypes = [ctypes.c_void_p]
    lib.a2p_vad_reset.argtypes = [ctypes.c_void_p]
    lib.a2p_vad_overrides.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_double]
    lib.a2p_vad_chunk.argtypes = [ctypes.c_void_p, f32p, f64p,
                                  ctypes.c_int32, ctypes.c_int32]
    lib.a2p_vad_seg_count.restype = ctypes.c_int32
    lib.a2p_vad_seg_count.argtypes = [ctypes.c_void_p]
    lib.a2p_vad_seg.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.a2p_ctcbeam_decode.restype = ctypes.c_int32
    lib.a2p_ctcbeam_decode.argtypes = [
        i32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, f32p, u8p,
        i32p, i32p, i32p, f32p, ctypes.c_int32]
    _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32))


def _f32(a):
    return np.ascontiguousarray(a, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _load() is not None


def resample(x: np.ndarray, fs_in: int, fs_out: int,
             num_zeros: int = 6) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = int(np.ceil(len(x) * fs_out / fs_in)) + 16
    out = np.empty(n_out, np.float32)
    n = lib.a2p_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        fs_in, fs_out, num_zeros,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:n]


class NativeVad:
    """E2E VAD decision automaton hot loop (e2e-vad.h role). One instance
    per stream; vad/e2e_vad.py dispatches its per-frame loop here and keeps
    decibel extraction + online segment emission in Python."""

    def __init__(self, opts):
        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self._lib = lib
        self._handle = lib.a2p_vad_new(
            int(opts.detect_mode), int(opts.max_end_silence_time),
            int(opts.max_start_silence_time), int(opts.window_size_ms),
            int(opts.sil_to_speech_time_thres),
            int(opts.speech_to_sil_time_thres),
            float(opts.speech_2_noise_ratio), int(opts.do_extend),
            int(opts.lookback_time_start_point),
            int(opts.lookahead_time_end_point),
            int(opts.max_single_segment_time), float(opts.snr_thres),
            int(opts.noise_frame_num_used_for_snr),
            float(opts.decibel_thres), float(opts.speech_noise_thres),
            int(opts.frame_in_ms))
        self._seg_buf = np.empty(4, np.int32)

    def reset(self):
        self._lib.a2p_vad_reset(self._handle)

    def overrides(self, max_end_sil=None, max_single_seg=None,
                  speech_noise_thres=None):
        self._lib.a2p_vad_overrides(
            self._handle,
            -1 if max_end_sil is None else int(max_end_sil),
            -1 if max_single_seg is None else int(max_single_seg),
            float("nan") if speech_noise_thres is None
            else float(speech_noise_thres))

    def chunk(self, sil_prob: np.ndarray, decibel: np.ndarray,
              is_final: bool):
        sp = np.ascontiguousarray(sil_prob, np.float32)
        dec = np.ascontiguousarray(decibel, np.float64)
        self._lib.a2p_vad_chunk(
            self._handle, _f32(sp),
            dec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(sp), 1 if is_final else 0)

    def seg_count(self) -> int:
        return int(self._lib.a2p_vad_seg_count(self._handle))

    def seg(self, i: int):
        """(start_ms, end_ms, contain_start, contain_end)"""
        self._lib.a2p_vad_seg(self._handle, i,
                              self._seg_buf.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_int32)))
        b = self._seg_buf
        return int(b[0]), int(b[1]), bool(b[2]), bool(b[3])

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.a2p_vad_free(self._handle)


class NativeAcBias:
    """Aho-Corasick bias automaton over int32 symbol ids (bias-lm.cpp
    role). States are plain ints; step returns the score delta."""

    def __init__(self, words: List[List[int]], scores: List[float]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self._lib = lib
        flat = np.asarray([s for w in words for s in w], np.int32)
        lens = np.asarray([len(w) for w in words], np.int32)
        sc = np.asarray(scores, np.float32)
        self._handle = lib.a2p_ac_build(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(words))

    def step(self, state: int, symbol: int) -> Tuple[int, float]:
        s = ctypes.c_int32(state)
        delta = self._lib.a2p_ac_step(self._handle, ctypes.byref(s), symbol)
        return s.value, float(delta)

    def final(self, state: int) -> float:
        return float(self._lib.a2p_ac_final(self._handle, state))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.a2p_ac_free(self._handle)


def edit_align(a: List[int], b: List[int]
               ) -> Optional[Tuple[List[int], int]]:
    """Returns (ops, distance); ops: 0=match 1=sub 2=del 3=ins."""
    lib = _load()
    if lib is None:
        return None
    aa = np.asarray(a, np.int32)
    bb = np.asarray(b, np.int32)
    ops = np.empty(len(a) + len(b) + 1, np.int32)
    dist = ctypes.c_int32(0)
    n = lib.a2p_edit_align(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(dist))
    return [int(o) for o in ops[:n]], int(dist.value)


class NativeLmDecoder:
    """C++ LM beam decoder (decode/lm_decoder.py contract): lexicon-trie x
    backoff-ngram token passing with optional ContextGraph hotword bias.
    Operates on unit IDS — construct with the AM vocab's token2id map.

    Known deviation from the Python decoder: an OOV unit-concatenation
    that happens to spell an in-LM word missing from the lexicon still
    scores as OOV (the Python version looks the string up in lm.vocab)."""

    SKIP_TOKENS = ("<s>", "</s>", "<blank>", "<unk>")

    def __init__(self, lm, lexicon, token2id, lm_weight: float = 0.5,
                 beam: int = 16, am_topk: int = 8,
                 oov_penalty: float = -14.0,
                 hotwords: Optional[dict] = None,
                 context_score: float = 3.0):
        from asr2pass_tpu.decode.context_graph import ContextGraph
        from asr2pass_tpu.decode.ngram import BOS, UNK

        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self._lib = lib
        # word vocabulary: LM words + lexicon words + specials
        self._word2id = {}
        self._id2word = []

        def wid(w: str) -> int:
            i = self._word2id.get(w)
            if i is None:
                i = len(self._id2word)
                self._word2id[w] = i
                self._id2word.append(w)
            return i

        unk_id = wid(UNK)
        bos_id = wid(BOS)

        # lexicon trie -> flat entries of unit-id paths
        lex_units: List[int] = []
        lex_lens: List[int] = []
        lex_words: List[int] = []

        def walk(node, path):
            for key, sub in node.items():
                if key == "\0":
                    for word in sub:
                        lex_units.extend(path)
                        lex_lens.append(len(path))
                        lex_words.append(wid(word))
                else:
                    uid = token2id.get(key)
                    if uid is None:
                        continue  # unit outside the AM vocab: unreachable
                    walk(sub, path + [uid])

        walk(lexicon.root, [])

        # ngram table: union of logp and backoff keys
        keys = set(lm.logp) | set(lm.backoff)
        ng_words: List[int] = []
        ng_lens: List[int] = []
        ng_logp: List[float] = []
        ng_bow: List[float] = []
        nan = float("nan")
        for ng in keys:
            ng_words.extend(wid(w) for w in ng)
            ng_lens.append(len(ng))
            ng_logp.append(lm.logp.get(ng, nan))
            ng_bow.append(lm.backoff.get(ng, nan))

        self._handle = lib.a2p_lmdec_create(
            lm.order, _i32(lex_units), _i32(lex_lens), _i32(lex_words),
            len(lex_lens), _i32(ng_words), _i32(ng_lens), _f32(ng_logp),
            _f32(ng_bow), len(ng_lens), unk_id, bos_id, lm_weight,
            oov_penalty, beam, am_topk)
        if not self._handle:
            raise RuntimeError("a2p_lmdec_create failed (order too high?)")
        self._token2id = token2id
        self._context_score = context_score
        self._base = None
        if hotwords:
            self._attach_bias(hotwords)
        self._skip_tokens = [token2id[t] for t in self.SKIP_TOKENS
                             if t in token2id]

    def _attach_bias(self, hotwords: dict):
        from asr2pass_tpu.decode.context_graph import ContextGraph

        b_units: List[int] = []
        b_lens: List[int] = []
        b_scores: List[float] = []
        for phrase, boost in hotwords.items():
            toks = ContextGraph._default_split(phrase)
            ids = [self._token2id.get(t) for t in toks]
            if not ids or any(i is None for i in ids):
                continue
            per = float(boost) if boost else self._context_score
            b_units.extend(ids)
            b_lens.append(len(ids))
            b_scores.extend(per * len(t) for t in toks)
        if b_lens:
            self._lib.a2p_lmdec_set_bias(self._handle, _i32(b_units),
                                         _i32(b_lens), _f32(b_scores),
                                         len(b_lens))

    def clone(self, hotwords: Optional[dict] = None) -> "NativeLmDecoder":
        """Per-connection decoder over this decoder's SHARED tables —
        O(1): the lexicon trie and n-gram table are refcounted in C++
        (a2p_lmdec_clone), so per-connection cost is only the hotword
        bias attach (FunASRWfstDecoderInit's share-the-graph contract,
        funasrruntime.cpp:836-894)."""
        new = object.__new__(NativeLmDecoder)
        new._lib = self._lib
        new._word2id = self._word2id
        new._id2word = self._id2word
        new._token2id = self._token2id
        new._context_score = self._context_score
        new._skip_tokens = self._skip_tokens
        new._base = self            # keep the Python owner alive
        new._handle = self._lib.a2p_lmdec_clone(self._handle)
        if hotwords:
            new._attach_bias(hotwords)
        return new

    def start_utterance(self):
        pass  # stateless across decode() calls

    def decode(self, log_probs: np.ndarray, id_to_token) -> str:
        rows = np.ascontiguousarray(log_probs, np.float32)
        n, v = rows.shape
        out_u = np.empty(n, np.int32)
        out_w = np.empty(n, np.int32)
        skips = np.asarray(self._skip_tokens, np.int32)
        m = self._lib.a2p_lmdec_decode(
            self._handle, _f32(rows), n, v, _i32(skips), len(skips),
            out_u.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if m < 0:
            return ""
        parts: List[str] = []
        pending: List[str] = []
        for t in range(int(m)):
            tok = id_to_token(int(out_u[t]))
            w = int(out_w[t])
            if w >= 0:
                parts.append(self._id2word[w])
                pending = []
            elif w == -2:
                pending.append(tok)
                parts.append("".join(pending))
                pending = []
            else:
                pending.append(tok)
        if pending:  # dangling lexicon prefix flushes as raw units
            parts.append("".join(pending))
        return "".join(parts)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.a2p_lmdec_free(self._handle)


class NativeFst:
    """OpenFST-format graph loaded by the native runtime (fst.cc): the
    artifacts existing deployments already have — TLG.fst and the
    WeTextProcessing ITN grammars (com-define.h:76-80) — readable without
    vendoring OpenFST. `transduce` = compose(linear(input), fst) +
    tropical shortest path (itn-processor.cpp:53-87 semantics)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self._lib = lib
        self.ptr = lib.a2p_fst_load(path.encode())
        if not self.ptr:
            raise ValueError(f"cannot read OpenFST file: {path}")
        info = np.zeros(3, np.int64)
        lib.a2p_fst_info(ctypes.c_void_p(self.ptr), _i64(info))
        self.start, self.num_states, self.num_arcs = (int(info[0]),
                                                      int(info[1]),
                                                      int(info[2]))

    def transduce(self, labels: List[int]) -> Optional[List[int]]:
        """Input label sequence -> best-path output labels (epsilon-free);
        None when no path accepts the input."""
        inp = np.ascontiguousarray(labels, np.int32)
        cap = max(4 * len(inp) + 64, 256)
        while True:
            out = np.empty(cap, np.int32)
            n = self._lib.a2p_fst_transduce(
                ctypes.c_void_p(self.ptr), _i32(inp), len(inp),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
            if n == -2:
                cap *= 4
                continue
            if n < 0:
                return None
            return [int(x) for x in out[:n]]

    def __del__(self):
        try:
            if getattr(self, "ptr", None) and self._lib is not None:
                self._lib.a2p_fst_free(ctypes.c_void_p(self.ptr))
        except TypeError:  # interpreter shutdown
            pass


def _i64(a):
    return np.ascontiguousarray(a, np.int64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int64))


class NativeTlgFstDecoder:
    """Beam token-passing over a TLG.fst decoding graph (tlg_decoder.cc;
    WfstDecoder role, wfst-decoder.cpp:27-92) with optional Aho-Corasick
    hotword bias (the SetBiasLm hook) and unique-final nbest."""

    def __init__(self, fst: NativeFst, beam: float = 16.0,
                 max_active: int = 2000, ac_scale: float = 1.0,
                 lm_scale: float = 1.0, bias: Optional["NativeAcBias"] = None):
        self._lib = _load()
        self.fst = fst          # keep alive
        self.bias = bias        # keep alive
        self.ptr = self._lib.a2p_tlg_new(
            ctypes.c_void_p(fst.ptr), ctypes.c_float(beam), max_active,
            ctypes.c_float(ac_scale), ctypes.c_float(lm_scale),
            ctypes.c_void_p(bias._handle) if bias is not None else None)

    def start_utterance(self):
        self._lib.a2p_tlg_start(ctypes.c_void_p(self.ptr))

    def step(self, logp_by_ilabel: np.ndarray):
        row = np.ascontiguousarray(logp_by_ilabel, np.float32)
        self._lib.a2p_tlg_step(ctypes.c_void_p(self.ptr), _f32(row),
                               len(row))

    def partial(self) -> List[int]:
        """Best live hypothesis mid-utterance (partial best path,
        wfst-decoder.cpp:27-57 role) — call between step()s."""
        cap = 1 << 16
        out = np.empty(cap, np.int32)
        got = self._lib.a2p_tlg_partial(
            ctypes.c_void_p(self.ptr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        return [int(x) for x in out[:max(got, 0)]]

    def nbest(self, n: int = 1) -> List[Tuple[List[int], float]]:
        cap = 1 << 16
        out = np.empty(cap, np.int32)
        scores = np.empty(n, np.float32)
        got = self._lib.a2p_tlg_nbest(
            ctypes.c_void_p(self.ptr), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        res: List[Tuple[List[int], float]] = []
        off = 0
        for i in range(got):
            seq = []
            while out[off] != -1:
                seq.append(int(out[off]))
                off += 1
            off += 1
            res.append((seq, float(scores[i])))
        return res

    def __del__(self):
        try:
            if getattr(self, "ptr", None) and self._lib is not None:
                self._lib.a2p_tlg_free(ctypes.c_void_p(self.ptr))
        except TypeError:  # interpreter shutdown
            pass


# ---- native CTC prefix beam (ctc_beam.cc) --------------------------------

def serialize_context_trie(context, token2id):
    """ContextGraph -> flat (parent, unit, score, is_end) arrays (root =
    row 0) for the native CTC beam. Edges whose token string is not a
    vocab token get unit=-1: candidate ids are >= 0 so they can never
    match — exactly the Python beam's reachability (it compares
    id_to_token(tok) against the edge token) — while the node STRUCTURE
    (has-children, totals) stays identical for the retract semantics."""
    parents = [0]
    units = [0]
    scores = [0.0]
    ends = [0]

    def walk(node, idx):
        for tok, child in node.children.items():
            cidx = len(parents)
            parents.append(idx)
            units.append(int(token2id.get(tok, -1)))
            scores.append(float(child.score))
            ends.append(int(child.is_end))
            walk(child, cidx)

    walk(context.root, 0)
    return (np.asarray(parents, np.int32), np.asarray(units, np.int32),
            np.asarray(scores, np.float32), np.asarray(ends, np.uint8))


def ctc_beam_decode(cand_ids: np.ndarray, cand_logp: np.ndarray,
                    length: int, beam: int = 10, blank_id: int = 0,
                    trie=None):
    """Native prefix beam over [T, K] pruned candidates; returns the
    n-best [(ids, score, times)] list with the exact semantics of
    decode/ctc._prefix_beam_over_frames, or None when the lib is
    unavailable. `trie` = serialize_context_trie(...) arrays or None."""
    lib = _load()
    if lib is None:
        return None
    cand = np.ascontiguousarray(cand_ids[:length], np.int32)
    lp = np.ascontiguousarray(cand_logp[:length], np.float32)
    if cand.ndim != 2 or cand.shape != lp.shape:
        return None
    t, k = cand.shape
    max_len = max(t, 1)
    out_ids = np.zeros((beam, max_len), np.int32)
    out_times = np.zeros((beam, max_len), np.int32)
    out_lens = np.zeros(beam, np.int32)
    out_scores = np.zeros(beam, np.float32)
    if trie is not None:
        parents, units, scores, ends = trie
        n_nodes = len(parents)
        pa, un, sc = _i32(parents), _i32(units), _f32(scores)
        en = np.ascontiguousarray(ends, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))
    else:
        n_nodes = 0
        pa = un = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
        sc = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        en = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    n = lib.a2p_ctcbeam_decode(
        _i32(cand), _f32(lp), t, k, int(beam), int(blank_id),
        n_nodes, pa, un, sc, en,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_times.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len)
    if n < 0:
        return None
    out = []
    for i in range(n):
        ln = int(out_lens[i])
        ids = [int(x) for x in out_ids[i, :ln]]
        times = [int(x) for x in out_times[i, :ln] if x >= 0]
        out.append((ids, float(out_scores[i]), times))
    return out
