"""Server-side model registry + per-connection session factory.

Role of the stream composers (offline-stream.cpp / tpass-stream.cpp /
tpass-online-stream.cpp, SURVEY.md §2.1 #25): models are loaded once and
shared read-only; each websocket connection gets its own TwoPassSession
(per-connection VAD/ASR/punc caches, hotword embeddings), mirroring
TpassOnlineStream-per-connection (websocket-server-2pass.h:49-65).
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from asr2pass_tpu.config import (
    ParaformerConfig,
    PuncConfig,
    VadConfig,
)
from asr2pass_tpu.runtime.asr_stream import ParaformerOnlineStream
from asr2pass_tpu.runtime.offline_api import OfflineRecognizer
from asr2pass_tpu.runtime.offline_asr import ParaformerOffline
from asr2pass_tpu.runtime.punc import Punctuator
from asr2pass_tpu.runtime.two_pass import TwoPassSession
from asr2pass_tpu.runtime.vad_stream import FsmnVadStream
from asr2pass_tpu.text.vocab import Vocab


@dataclass
class ServerModels:
    """Everything loaded at server start (initAsr/FunTpassInit role)."""

    asr_params: Any
    asr_cfg: ParaformerConfig
    vocab: Vocab
    asr_cmvn: Any = None
    online_params: Any = None          # defaults to asr_params (2pass share)
    online_cfg: Optional[ParaformerConfig] = None
    vad_params: Any = None
    vad_cfg: Optional[VadConfig] = None
    vad_cmvn: Any = None
    punc_params: Any = None
    punc_cfg: Optional[PuncConfig] = None
    punc_tokenizer: Any = None
    itn: Any = None
    hotword_params: Any = None
    hotword_cfg: Any = None
    seg_dict: Any = None               # EN word -> BPE pieces (SegDict)
    # SenseVoice (svs) pass-2 alternative (MODEL_SVS role)
    svs_params: Any = None
    svs_cfg: Any = None
    svs_vocab: Any = None
    svs_cmvn: Any = None
    # SVS decode mode: beam > 1 switches every SVS decode to the pruned
    # CTC prefix beam; hotworded connections get a context-graph-biased
    # beam regardless (greedy has no bias hook — the reference's split
    # between CTCSearch and CtcPrefixBeamSearch,
    # sensevoice-small.cpp:323-440)
    svs_beam: int = 0
    # optional n-gram LM rescoring (TLG role): either lm+lexicon (trie
    # decoder) or tlg_dir (a compiled TLG.fst graph dir, the reference's
    # artifact layout — FunASRWfstDecoderInit, funasrruntime.cpp:836-894)
    lm: Any = None
    lexicon: Any = None
    tlg_dir: Any = None
    lm_weight: float = 0.5
    # server-side hotwords merged with per-connection ones
    server_hotwords: Any = None
    # sequence parallelism for very-long offline segments (SURVEY §5
    # long-context): a jax.sharding.Mesh + axis name; segments longer than
    # sp_threshold LFR frames run the encoder TIME-sharded over it
    # (parallel/sequence.py). None = single-chip bucketed batches only.
    sp_mesh: Any = None
    sp_axis: str = "sp"
    sp_threshold: int = 4096
    # tensor parallelism for the pass-2 model (SURVEY §2.5 model-parallel
    # row; BASELINE north-star config 5): a ("dp","tp") mesh from
    # parallel/sharding.make_mesh — offline/SenseVoice recognizers shard
    # their params Megatron-style over it
    tp_mesh: Any = None

    def __post_init__(self):
        # decode-graph resources load ONCE and are shared read-only by
        # every connection (FunASRWfstDecoderInit contract,
        # funasrruntime.cpp:836-894); per-connection work is the hotword
        # bias attach + beam state only. Caches keyed per vocab role:
        # the ilabel gather map / unit tokenization differ between the
        # Paraformer ("asr") and SenseVoice ("svs") vocabularies.
        self._res_lock = threading.RLock()
        self._tlg_graph_cache = {}
        self._lm_base_cache = {}
        self._offline_rec_cache: "OrderedDict" = OrderedDict()
        # tp-sharded param trees, built ONCE: every recognizer
        # construction would otherwise device_put a fresh sharded copy of
        # the whole model into HBM (one per connection / cache entry)
        self._tp_shard_cache: dict = {}

    def _tp_params(self, which: str, params):
        """Megatron-sharded view of `params` over tp_mesh, built once
        and shared: recognizers re-device_put these, which is a no-op on
        already-sharded arrays (no extra HBM copies per connection)."""
        if self.tp_mesh is None:
            return params
        from asr2pass_tpu.parallel.sharding import shard_params

        with self._res_lock:
            cached = self._tp_shard_cache.get(which)
            if cached is None:
                cached = shard_params(params, self.tp_mesh)
                self._tp_shard_cache[which] = cached
        return cached

    def _punctuator(self) -> Optional[Punctuator]:
        if self.punc_params is None:
            return None
        return Punctuator(self.punc_params, self.punc_cfg,
                          self.punc_tokenizer)

    def compile_hotwords(self, hotwords: dict) -> Optional[np.ndarray]:
        """hotword dict {word: score} -> [N, D] NN embeddings
        (CompileHotwordEmbedding role, paraformer.cpp:592-693)."""
        if self.hotword_params is None or not hotwords:
            return None
        from asr2pass_tpu.models import hotword as hw_mod

        return hw_mod.compile_hotwords(
            self.hotword_params, self.hotword_cfg, list(hotwords.keys()),
            self.vocab, seg_dict=self.seg_dict,
        )

    def svs_context_graph(self, hotwords: Optional[dict]):
        """Hotword dict -> ContextGraph for SenseVoice CTC-beam biasing.
        The reference attaches hotwords to SVS through the context graph
        inside CtcPrefixBeamSearch (sensevoice-small.cpp:392-440), not
        through NN embeddings — so SVS connections compile their hotwords
        into a trie instead of CompileHotwordEmbedding."""
        if not hotwords:
            return None
        from asr2pass_tpu.decode.context_graph import ContextGraph

        return ContextGraph().build(
            {str(w): float(s) for w, s in hotwords.items()})

    def _svs_lm_decoder(self, hotwords: Optional[dict] = None):
        """WFST rescoring for SenseVoice: only a TLG graph qualifies —
        the frame-synchronous CTC search needs the blank/repeat topology
        (tools/build_tlg.py --ctc-blank); the trie LM decoder consumes
        per-token rows and stays Paraformer-only."""
        if self.tlg_dir is None:
            return None
        return self._make_lm_decoder(hotwords, which="svs")

    def _make_lm_decoder(self, hotwords: Optional[dict] = None,
                         which: str = "asr"):
        vocab = (self.svs_vocab or self.vocab) if which == "svs" \
            else self.vocab
        if self.tlg_dir is not None:
            from asr2pass_tpu.decode.tlg import TlgDecoder, TlgGraph

            with self._res_lock:
                if which not in self._tlg_graph_cache:
                    self._tlg_graph_cache[which] = TlgGraph(
                        self.tlg_dir, vocab.token2id)
            return TlgDecoder(self._tlg_graph_cache[which],
                              vocab.token2id,
                              lm_weight=self.lm_weight, hotwords=hotwords)
        if self.lm is None or self.lexicon is None:
            return None
        # native C++ beam (14x the Python decoder on 60 s segments,
        # parity-tested); Python fallback when the lib can't build
        try:
            from asr2pass_tpu.native.bindings import (NativeLmDecoder,
                                                      available)

            if available():
                with self._res_lock:
                    if which not in self._lm_base_cache:
                        self._lm_base_cache[which] = NativeLmDecoder(
                            self.lm, self.lexicon, vocab.token2id,
                            lm_weight=self.lm_weight)
                base = self._lm_base_cache[which]
                # hotword-less connections share the base decoder
                # (decode keeps all search state call-local); hotworded
                # ones get an O(1) clone over the shared tables
                return base.clone(hotwords) if hotwords else base
        except Exception:
            pass
        from asr2pass_tpu.decode.context_graph import ContextGraph
        from asr2pass_tpu.decode.lm_decoder import LmDecoder

        bias = None
        if hotwords:
            bias = ContextGraph().build(
                {w: float(s) for w, s in hotwords.items()})
        return LmDecoder(self.lm, self.lexicon, lm_weight=self.lm_weight,
                         bias=bias)

    def create_session(self, mode: str = "2pass",
                       vad_tail_sil: Optional[int] = None,
                       vad_max_len: Optional[int] = None,
                       hw_emb: Optional[np.ndarray] = None,
                       use_itn: bool = True, svs_lang: str = "auto",
                       svs_itn: bool = True, use_svs: bool = False,
                       hotwords: Optional[dict] = None,
                       chunk_size=None) -> TwoPassSession:
        assert self.vad_params is not None, "2pass/online needs a VAD model"
        vad = FsmnVadStream(
            self.vad_params, self.vad_cfg, cmvn=self.vad_cmvn, online=True,
            max_end_sil=vad_tail_sil, max_single_segment=vad_max_len,
        )
        online = None
        if mode != "offline":
            ocfg = self.online_cfg or self.asr_cfg
            if chunk_size is not None \
                    and tuple(chunk_size) != tuple(ocfg.chunk_size):
                # per-connection chunk geometry (the reference plumbs the
                # first message's chunk_size into the online config,
                # websocket-server-2pass.cpp:424-523); a new geometry
                # compiles its own streaming program
                import dataclasses as _dc

                ocfg = _dc.replace(ocfg, chunk_size=tuple(chunk_size))
            oparams = (self.online_params if self.online_params is not None
                       else self.asr_params)
            online = ParaformerOnlineStream(
                oparams, ocfg, Vocab(self.vocab.tokens, self.vocab.lang),
                cmvn=self.asr_cmvn,
            )
        offline = None
        if mode != "online":
            if use_svs and self.svs_params is not None:
                from asr2pass_tpu.runtime.sensevoice_asr import (
                    SenseVoiceOffline,
                )

                offline = SenseVoiceOffline(
                    self._tp_params("svs", self.svs_params), self.svs_cfg,
                    self.svs_vocab or self.vocab, cmvn=self.svs_cmvn,
                    lang=svs_lang, use_itn_token=svs_itn,
                    context=self.svs_context_graph(hotwords),
                    beam=self.svs_beam,
                    lm_decoder=self._svs_lm_decoder(hotwords),
                    tp_mesh=self.tp_mesh,
                )
            else:
                offline = ParaformerOffline(
                    self._tp_params("asr", self.asr_params), self.asr_cfg,
                    self.vocab, cmvn=self.asr_cmvn,
                    lm_decoder=self._make_lm_decoder(hotwords),
                    tp_mesh=self.tp_mesh,
                )
        return TwoPassSession(
            vad, online, offline, punc=self._punctuator(), itn=self.itn,
            mode=mode, hw_emb=hw_emb, use_itn=use_itn,
        )

    def create_offline_recognizer(self, vad_tail_sil: int = 800,
                                  vad_max_len: int = 60000,
                                  use_svs: bool = False,
                                  svs_lang: str = "auto",
                                  svs_itn: bool = True,
                                  hotwords: Optional[dict] = None
                                  ) -> OfflineRecognizer:
        """Offline (whole-file) recognizer with the same AM/LM options as
        2pass sessions: SenseVoice pass-2 alternative, TLG-style n-gram
        rescoring, hotword bias (the reference's offline server initializes
        a per-connection WFST decoder in on_open, websocket-server.cpp:
        173-176, and OfflineStream supports the SVS model)."""
        if use_svs and self.svs_params is not None:
            from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline

            asr = SenseVoiceOffline(
                self._tp_params("svs", self.svs_params), self.svs_cfg,
                self.svs_vocab or self.vocab,
                cmvn=self.svs_cmvn, lang=svs_lang, use_itn_token=svs_itn,
                context=self.svs_context_graph(hotwords),
                beam=self.svs_beam,
                lm_decoder=self._svs_lm_decoder(hotwords),
                tp_mesh=self.tp_mesh,
            )
        else:
            asr = ParaformerOffline(
                self._tp_params("asr", self.asr_params), self.asr_cfg,
                self.vocab, cmvn=self.asr_cmvn,
                lm_decoder=self._make_lm_decoder(hotwords),
                sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                sp_threshold=self.sp_threshold,
                tp_mesh=self.tp_mesh,
            )
        return OfflineRecognizer(
            asr, vad_params=self.vad_params, vad_cfg=self.vad_cfg,
            vad_cmvn=self.vad_cmvn, punc=self._punctuator(), itn=self.itn,
            vad_tail_sil=vad_tail_sil, vad_max_len=vad_max_len,
        )

    def offline_recognizer_cached(self, vad_tail_sil: int = 800,
                                  vad_max_len: int = 60000,
                                  use_svs: bool = False,
                                  svs_lang: str = "auto",
                                  svs_itn: bool = True,
                                  hotwords: Optional[dict] = None,
                                  max_cached: int = 32
                                  ) -> OfflineRecognizer:
        """Per-request offline recognizer, cached by its option tuple —
        the server must NOT rebuild recognizers on every offline upload.
        LRU-bounded so a hostile stream of unique hotword sets cannot grow
        memory unboundedly.

        Stateful-decoder exclusion: a TlgDecoder / Python LmDecoder
        carries per-utterance beam state on the instance
        (start_utterance/accept_rows), so with decode_workers > 1 two
        concurrent uploads sharing one cached recognizer would interleave
        that state and corrupt both transcripts. Those configurations
        construct per request — cheap, because every expensive resource
        underneath (TLG graph, LM tables, tp-sharded params) is already
        cached once on ServerModels."""
        if self.tlg_dir is not None or self.lm is not None:
            return self.create_offline_recognizer(
                vad_tail_sil=vad_tail_sil, vad_max_len=vad_max_len,
                use_svs=use_svs, svs_lang=svs_lang, svs_itn=svs_itn,
                hotwords=hotwords)
        key = (vad_tail_sil, vad_max_len, use_svs, svs_lang, svs_itn,
               tuple(sorted(hotwords.items())) if hotwords else None)
        with self._res_lock:
            rec = self._offline_rec_cache.get(key)
            if rec is not None:
                self._offline_rec_cache.move_to_end(key)
                return rec
        rec = self.create_offline_recognizer(
            vad_tail_sil=vad_tail_sil, vad_max_len=vad_max_len,
            use_svs=use_svs, svs_lang=svs_lang, svs_itn=svs_itn,
            hotwords=hotwords)
        with self._res_lock:
            self._offline_rec_cache[key] = rec
            while len(self._offline_rec_cache) > max_cached:
                self._offline_rec_cache.popitem(last=False)
        return rec
