"""StreamEngine: S concurrent 2pass streams through shared batched steps.

This is the architectural inversion SURVEY.md §7 calls for: the reference
serves N connections with N decoder threads over one CPU model
(funasr-wss-server-2pass.cpp:511-538); a TPU wants big regular batches, so
here ALL active streams advance together:

  * one batched jitted FSMN-VAD step for every stream's new frames
    (per-slot valid_len; decision automatons on host)
  * one batched jitted streaming-Paraformer step per engine tick — the
    per-slot chunk slots (center frames), final flags, and state resets
    all ride the leading axis of OnlineState
  * pass-2 segments from every stream pool into one bucket-batched offline
    recognizer call

Slots are fixed (capacity) so shapes never change; inactive slots compute
zeros. Per-slot host state (front-ends, VAD automaton, splitter, punc
caches, detok state) is tiny O(text) work.
"""
from __future__ import annotations

import functools
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.frontend.fbank import get_extractor
from asr2pass_tpu.models import fsmn_vad, paraformer_online
from asr2pass_tpu.runtime.audio_splitter import TwoPassSplitter
from asr2pass_tpu.runtime.streaming_frontend import (StreamingFrontend,
                                                     batched_fbank)
from asr2pass_tpu.text import timestamps as ts_mod
from asr2pass_tpu.text.vocab import Vocab
from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions

def _vad_bucket(fcfg) -> int:
    """Mel rows computed per fused-VAD tick: the engine stages up to
    64*lfr_n mel frames of audio per slot per tick (one ~0.64 s chunk of
    LFR rows), plus margin for the LFR/residual carry."""
    return 64 * fcfg.lfr_n + 8


@functools.lru_cache(maxsize=4)
def _fused_vad_step(fcfg, capacity: int, sil_pdf_ids=(0,)):
    """One jitted program: batched fbank -> LFR window gather -> CMVN ->
    FSMN-VAD NN, with the lfr_m-1 mel frames of cross-tick context held in
    a device-resident history ring.

    This fuses what used to be two device dispatches per engine tick
    (batched_fbank + _nn_step) plus a [cap, T, 80] mel device->host
    transfer into ONE dispatch whose only fetched output is the posterior
    tensor — on a remote-execution backend every dispatch/transfer is a
    ~20-40 ms network round-trip, and the engine tick is dispatch-bound
    (CLAUDE.md serving-path rule). Window accounting (totals/next-window)
    stays on host as O(1) counters; StreamingFrontend parity is asserted
    by tests/test_engine.py's fused-vs-reference front-end test.
    """
    ex = get_extractor(fcfg)
    nf = _vad_bucket(fcfg)
    need = fcfg.frame_length + (nf - 1) * fcfg.frame_shift
    left = (fcfg.lfr_m - 1) // 2
    hist_len = fcfg.lfr_m - 1
    frame_idx = (np.arange(nf)[:, None] * fcfg.frame_shift
                 + np.arange(fcfg.frame_length)[None, :])

    @jax.jit
    def step(params, means, vars_, waves, n_new, win_start, total_new,
             k_emit, finals, hist, caches):
        frames = waves[:, frame_idx]                        # [C, nf, flen]
        mel_new = ex.frames_to_mel(
            (frames * fcfg.scale_input).reshape(capacity * nf, -1)
        ).reshape(capacity, nf, -1)
        combined = jnp.concatenate([hist, mel_new], axis=1)  # [C, H+nf, M]
        base = total_new - n_new                             # old mel total
        # LFR windows win_start..win_start+nf, taps clamped to valid mel
        # rows (offline tail padding clamps the same way: streaming_frontend
        # _emit_windows)
        gw = win_start[:, None] + jnp.arange(nf)[None, :]
        g = gw[:, :, None] * fcfg.lfr_n + jnp.arange(fcfg.lfr_m) - left
        g = jnp.clip(g, 0, jnp.maximum(total_new - 1, 0)[:, None, None])
        local = g - (base - hist_len)[:, None, None]
        local = jnp.clip(local, 0, hist_len + nf - 1)
        feats = jnp.take_along_axis(
            combined, local.reshape(capacity, -1)[:, :, None], axis=1
        ).reshape(capacity, nf, fcfg.lfr_m * fcfg.n_mels)
        feats = (feats + means) * vars_
        probs, new_caches = fsmn_vad.apply(params, feats, caches, k_emit)
        # the decision automaton only consumes the summed silence-pdf
        # posterior per frame (e2e_vad._get_frame_state) — fetch [C, nf]
        # scalars, not [C, nf, 248] (a ~250x smaller device->host transfer;
        # the full tensor was ~9 MB/tick at 128 slots on the tunnel)
        sil = probs[:, :, jnp.asarray(sil_pdf_ids)].sum(-1)
        hidx = n_new[:, None] + jnp.arange(hist_len)[None, :]
        new_hist = jnp.take_along_axis(combined, hidx[:, :, None], axis=1)
        new_hist = jnp.where(finals[:, None, None], 0.0, new_hist)
        return sil, new_hist, new_caches

    return step, need


@dataclass
class _Slot:
    active: bool = False
    vad_frontend: Any = None
    asr_frontend: Any = None
    sm: Any = None
    splitter: Any = None
    vocab: Any = None
    pending_feats: Any = None          # [n,560] awaiting chunk assembly
    pending_final: bool = False        # utterance flush requested
    audio_in: list = field(default_factory=list)   # (samples, is_final)
    seg_queue: list = field(default_factory=list)  # offline AudioFrames
    punc_cache: list = field(default_factory=list)
    results: list = field(default_factory=list)
    # per-connection first-message options (the reference plumbs all of
    # these per connection, websocket-server-2pass.cpp:424-523)
    hw_emb: Any = None                 # compiled hotword embeddings [N, D]
    lm_decoder: Any = None             # per-connection LM handle (+bias)
    use_itn: bool = True
    svs_lang: Any = None
    svs_itn: Any = None
    vad_tail_sil: Any = None           # max_end_silence override (ms)
    vad_max_len: Any = None            # max_single_segment override (ms)
    speech_noise_thres: Any = None
    p2_inflight: int = 0               # segments handed to the pass-2 lane
    p1_inflight: int = 0               # chunks in the dispatched-not-yet-
                                       # fetched pass-1 batch (pipelining)


class StreamEngine:
    def __init__(self, models, capacity: int = 64, mode: str = "2pass",
                 pass2_async: bool = False, pipeline: bool = True):
        self.models = models
        self.capacity = capacity
        self.mode = mode
        ocfg = models.online_cfg or models.asr_cfg
        self.ocfg = ocfg
        self.oparams = (models.online_params
                        if models.online_params is not None
                        else models.asr_params)
        self.online_state = paraformer_online.init_state(
            self.oparams, ocfg, capacity)
        self.vad_caches = fsmn_vad.init_caches(models.vad_cfg, capacity)
        self.offline = None
        if mode != "online":
            self.offline = models.create_offline_recognizer(
                use_svs=models.svs_params is not None)
        self.punc = models._punctuator()
        self.slots: List[_Slot] = [_Slot() for _ in range(capacity)]
        self.chunk_len = (ocfg.chunk_size[1] * ocfg.frontend.frame_shift
                          * ocfg.frontend.lfr_n)
        self.center = ocfg.chunk_size[1]
        self.lfr_dim = ocfg.frontend.lfr_dim
        # fused VAD front-end+NN (one dispatch per tick); host-side window
        # counters + device-resident mel history ring
        fcfg = models.vad_cfg.frontend
        self._vad_step, self._vad_need = _fused_vad_step(
            fcfg, capacity, tuple(models.vad_cfg.sil_pdf_ids))
        vmeans, vvars = (models.vad_cmvn if models.vad_cmvn is not None
                         else (np.zeros(fcfg.lfr_dim, np.float32),
                               np.ones(fcfg.lfr_dim, np.float32)))
        self._vad_means = jnp.asarray(vmeans, jnp.float32)
        self._vad_vars = jnp.asarray(vvars, jnp.float32)
        self._vad_hist = jnp.zeros(
            (capacity, fcfg.lfr_m - 1, fcfg.n_mels), jnp.float32)
        self._vad_total = np.zeros(capacity, np.int64)
        self._vad_next = np.zeros(capacity, np.int64)
        # pass-1 / pass-2 priority lanes (SURVEY §7 "latency vs batching
        # tension"): with pass2_async the tick never runs offline decodes —
        # segments go to a background worker thread, so a burst of long
        # segments cannot stall pass-1 partials for every stream
        self._results_lock = threading.Lock()
        self._p2_async = pass2_async
        self._p2_queue: "queue.Queue" = queue.Queue()
        self._p2_thread = None
        if pass2_async and self.offline is not None:
            self._p2_thread = threading.Thread(
                target=self._p2_worker, daemon=True, name="pass2-lane")
            self._p2_thread.start()
        # tick software pipeline (VERDICT r2 item 2): pass-1 batches are
        # dispatched by the tick but fetched + detokenized on a dedicated
        # collector thread, so the ~tens-of-ms device round-trip (and the
        # result fetch) never sits on the tick critical path at all —
        # measured at ~91 ms/tick of a ~280 ms tick at 64 streams when the
        # tick collected its own previous batch (scripts/tick_breakdown.py).
        # A single FIFO worker preserves per-slot result order; per-slot
        # p1_inflight counters keep drained() honest.
        self._pipeline = pipeline
        self._p1_queue: "queue.Queue" = queue.Queue()
        self._p1_outstanding = 0
        self._p1_thread = None
        if pipeline:
            self._p1_thread = threading.Thread(
                target=self._p1_collector, daemon=True, name="pass1-collect")
            self._p1_thread.start()

    def warmup(self):
        """Compile the batched VAD + ASR steps before serving traffic
        (first-compile is minutes on remote-compile TPU backends)."""
        m = self.models
        zi = jnp.zeros((self.capacity,), jnp.int32)
        self._vad_step(m.vad_params, self._vad_means, self._vad_vars,
                       jnp.zeros((self.capacity, self._vad_need),
                                 jnp.float32),
                       zi, zi, zi, zi,
                       jnp.zeros((self.capacity,), bool),
                       self._vad_hist, self.vad_caches)
        paraformer_online.step_jit(
            self.oparams, self.ocfg, self.online_state,
            jnp.zeros((self.capacity, self.center, self.lfr_dim),
                      jnp.float32),
            jnp.zeros((self.capacity,), jnp.int32),
            jnp.zeros((self.capacity,), bool))

    # -- stream lifecycle ------------------------------------------------
    def open(self, hw_emb=None, hotwords=None, use_itn: bool = True,
             svs_lang=None, svs_itn=None, vad_tail_sil=None,
             vad_max_len=None, speech_noise_thres=None) -> int:
        """Claim a slot with this connection's first-message options —
        feature parity with TwoPassSession (the reference supports
        hotwords + per-request VAD/ITN/svs config on every connection,
        websocket-server-2pass.cpp:424-523)."""
        for sid, slot in enumerate(self.slots):
            if not slot.active:
                self._reset_slot(sid)
                slot = self.slots[sid]
                slot.active = True
                slot.hw_emb = hw_emb
                slot.use_itn = use_itn
                slot.svs_lang = svs_lang
                slot.svs_itn = svs_itn
                slot.vad_tail_sil = vad_tail_sil
                slot.vad_max_len = vad_max_len
                slot.speech_noise_thres = speech_noise_thres
                if (self.models.lm is not None
                        or self.models.tlg_dir is not None):
                    slot.lm_decoder = self.models._make_lm_decoder(
                        hotwords or None)
                return sid
        raise RuntimeError("engine at capacity")

    def _reset_slot(self, sid: int):
        m = self.models
        vmeans, vvars = (m.vad_cmvn if m.vad_cmvn is not None
                         else (None, None))
        ameans, avars = (m.asr_cmvn if m.asr_cmvn is not None
                         else (None, None))
        slot = _Slot(
            vad_frontend=StreamingFrontend(m.vad_cfg.frontend, vmeans, vvars),
            asr_frontend=StreamingFrontend(self.ocfg.frontend, ameans, avars),
            sm=E2EVadStateMachine(VadOptions(
                speech_noise_thres=m.vad_cfg.speech_noise_thres)),
            splitter=TwoPassSplitter(m.vad_cfg.sample_rate),
            vocab=Vocab(m.vocab.tokens, m.vocab.lang),
            pending_feats=np.zeros((0, self.lfr_dim), np.float32),
            punc_cache=[],
        )
        self.slots[sid] = slot
        # zero the batched device state for this slot
        self._clear_device_slot(sid)

    def _clear_device_slot(self, sid: int):
        z1 = paraformer_online.init_state(self.oparams, self.ocfg, 1)
        s = self.online_state
        self.online_state = paraformer_online.OnlineState(
            feats_cache=s.feats_cache.at[sid].set(z1.feats_cache[0]),
            pos=s.pos.at[sid].set(0),
            cif_integrate=s.cif_integrate.at[sid].set(0.0),
            cif_frame=s.cif_frame.at[sid].set(z1.cif_frame[0]),
            dec_caches=s.dec_caches.at[:, sid].set(z1.dec_caches[:, 0]),
        )
        self.vad_caches = [c.at[sid].set(0.0) for c in self.vad_caches]
        self._vad_hist = self._vad_hist.at[sid].set(0.0)
        self._vad_total[sid] = 0
        self._vad_next[sid] = 0

    def close(self, sid: int):
        self.slots[sid].active = False

    def feed(self, sid: int, samples: np.ndarray, is_final: bool = False):
        self.slots[sid].audio_in.append(
            (np.asarray(samples, np.float32), is_final))

    def poll(self, sid: int) -> List[dict]:
        with self._results_lock:
            out = self.slots[sid].results
            self.slots[sid].results = []
        return out

    def drained(self, sid: int) -> bool:
        """True when every queued sample/frame/segment of this stream has
        produced its results (incl. segments in the async pass-2 lane)."""
        slot = self.slots[sid]
        return (not slot.audio_in
                and (slot.pending_feats is None
                     or slot.pending_feats.shape[0] == 0)
                and not slot.pending_final
                and not slot.seg_queue
                and slot.p2_inflight == 0
                and slot.p1_inflight == 0)

    # -- the batched tick ------------------------------------------------
    def step(self):
        """One pipelined tick:
             1. stage + DISPATCH the fused VAD step (async)
             2. fetch VAD posteriors; automatons, splitter, ASR front-end
             3. DISPATCH this tick's pass-1 batch — fetched + detokenized
                on the collector thread, off the tick critical path
             4. hand segments to the pass-2 lane
        """
        from asr2pass_tpu.runtime.metrics import GLOBAL as METRICS

        with METRICS.stage("tick_vad_dispatch"):
            ctx = self._vad_stage_dispatch()
        with METRICS.stage("tick_vad_decide"):
            self._vad_decide(ctx)
        with METRICS.stage("tick_p1_dispatch"):
            self._asr_step()
        with METRICS.stage("tick_pass2_handoff"):
            self._pass2()

    def has_inflight(self) -> bool:
        return self._p1_outstanding > 0

    def _vad_stage_dispatch(self):
        m = self.models
        # stage every slot's VAD front-end, run ONE fused device step
        # (fbank+LFR+CMVN+NN) — per-slot dispatches are a network
        # round-trip each on a remote-execution backend and would dominate
        # the tick
        staged = []  # (sid, samples, is_final, buf, n_frames)
        # consume at most one VAD bucket of audio per slot per step —
        # a burst-feeding client (whole file then is_speaking:false) must
        # not overflow the fixed [capacity, _vad_bucket] feature batch;
        # leftovers stay queued and later steps drain them (the engine
        # loop keeps stepping while any slot has work)
        fcfg = m.vad_cfg.frontend
        max_samples = 64 * fcfg.frame_shift * fcfg.lfr_n  # 0.64 s >= one chunk tick
        for sid, slot in enumerate(self.slots):
            if not slot.active or not slot.audio_in:
                continue
            datas, total, is_final = [], 0, False
            while slot.audio_in and total < max_samples:
                s, f = slot.audio_in.pop(0)
                take = min(len(s), max_samples - total)
                if take < len(s):
                    slot.audio_in.insert(0, (s[take:], f))
                    s, f = s[:take], False
                datas.append(s)
                total += len(s)
                is_final = is_final or f
            samples = (np.concatenate(datas) if datas
                       else np.zeros(0, np.float32))
            buf, nf = slot.vad_frontend.stage(samples)
            staged.append((sid, samples, is_final, buf, nf))
        if not staged:
            return None
        fcfg = m.vad_cfg.frontend
        lfr_m, lfr_n = fcfg.lfr_m, fcfg.lfr_n
        left = (lfr_m - 1) // 2
        waves = np.zeros((self.capacity, self._vad_need), np.float32)
        n_new = np.zeros(self.capacity, np.int32)
        win_start = self._vad_next.astype(np.int32)
        total_new = self._vad_total.astype(np.int32)
        k_emit = np.zeros(self.capacity, np.int32)
        finals = np.zeros(self.capacity, bool)
        work = []  # (sid, samples, is_final, n_vad_rows)
        for sid, samples, is_final, buf, nf in staged:
            waves[sid, : min(len(buf), self._vad_need)] = \
                buf[: self._vad_need]
            n_new[sid] = nf
            total = int(self._vad_total[sid]) + nf
            total_new[sid] = total
            if is_final:
                upto = -(-total // lfr_n)
            else:
                upto = max((total - 1 - (lfr_m - 1) + left) // lfr_n + 1, 0)
            upto = max(upto, int(self._vad_next[sid]))
            k_emit[sid] = upto - self._vad_next[sid]
            if is_final:
                self._vad_total[sid] = 0
                self._vad_next[sid] = 0
                slot = self.slots[sid]
                slot.vad_frontend.reset()   # drop sub-frame residual
                finals[sid] = True
            else:
                self._vad_total[sid] = total
                self._vad_next[sid] = upto
            work.append((sid, samples, is_final, int(k_emit[sid])))
        probs, self._vad_hist, self.vad_caches = self._vad_step(
            m.vad_params, self._vad_means, self._vad_vars,
            jnp.asarray(waves), jnp.asarray(n_new), jnp.asarray(win_start),
            jnp.asarray(total_new), jnp.asarray(k_emit),
            jnp.asarray(finals), self._vad_hist, self.vad_caches)
        # async dispatch done; the posterior fetch happens in _vad_decide
        # after last tick's pass-1 results are collected
        return probs, work

    def _vad_decide(self, ctx):
        if ctx is None:
            return
        probs, work = ctx
        m = self.models
        probs = np.asarray(probs)
        # VAD decisions + 2pass split per slot (host, O(frames)); collect
        # the online frames into per-slot groups split at final flags so
        # the ASR front-ends batch the same way
        groups = {}  # sid -> [(data, is_final), ...]
        for sid, samples, is_final, n in work:
            slot = self.slots[sid]
            # probs here is the device-summed sil posterior [nf]; the slot
            # automaton was built with default sil_pdf_ids=(0,), so a
            # [n, 1] column is the exact equivalent of the full pdf row
            events = slot.sm(
                probs[sid, :n, None], samples, is_final=is_final, online=True,
                max_end_sil=(slot.vad_tail_sil if slot.vad_tail_sil
                             is not None else m.vad_cfg.max_end_silence_time),
                max_single_segment_time=(
                    slot.vad_max_len if slot.vad_max_len is not None
                    else m.vad_cfg.max_single_segment_time),
                speech_noise_thres=(
                    slot.speech_noise_thres
                    if slot.speech_noise_thres is not None
                    else m.vad_cfg.speech_noise_thres),
            )
            online_frames, offline_frames = slot.splitter.feed(
                samples, events, self.chunk_len, self.mode)
            slot.seg_queue.extend(offline_frames)
            gs, cur = [], []
            for fr in online_frames:
                cur.append(fr.data)
                if fr.is_final:
                    gs.append((np.concatenate(cur), True))
                    cur = []
            if cur:
                gs.append((np.concatenate(cur), False))
            if gs:
                groups[sid] = gs
            if is_final:
                slot.splitter.reset()
        # batched ASR front-end waves (usually a single round)
        while groups:
            stage2 = []
            for sid in list(groups):
                data, fin = groups[sid].pop(0)
                if not groups[sid]:
                    del groups[sid]
                buf, nf = self.slots[sid].asr_frontend.stage(data)
                stage2.append((sid, fin, buf, nf))
            mels = batched_fbank([s[2] for s in stage2],
                                 [s[3] for s in stage2],
                                 self.ocfg.frontend)
            for (sid, fin, _, _), mel in zip(stage2, mels):
                slot = self.slots[sid]
                f = slot.asr_frontend.commit(mel, fin)
                if f.shape[0]:
                    slot.pending_feats = np.concatenate(
                        [slot.pending_feats, f])
                if fin:
                    slot.pending_final = True

    def _asr_step(self):
        if self.mode == "offline":
            return
        c = self.center
        while True:
            feats = np.zeros((self.capacity, c, self.lfr_dim), np.float32)
            counts = np.zeros(self.capacity, np.int32)
            finals = np.zeros(self.capacity, bool)
            todo = []
            more = False
            for sid, slot in enumerate(self.slots):
                if not slot.active:
                    continue
                n = slot.pending_feats.shape[0]
                if n >= c:
                    feats[sid] = slot.pending_feats[:c]
                    counts[sid] = c
                    slot.pending_feats = slot.pending_feats[c:]
                    finals[sid] = (slot.pending_final
                                   and slot.pending_feats.shape[0] == 0)
                    if finals[sid]:
                        slot.pending_final = False
                    todo.append(sid)
                    if slot.pending_feats.shape[0] >= c:
                        more = True
                elif slot.pending_final:
                    feats[sid, :n] = slot.pending_feats
                    counts[sid] = n
                    finals[sid] = True
                    slot.pending_feats = slot.pending_feats[:0]
                    slot.pending_final = False
                    todo.append(sid)
            if not todo:
                return
            self.online_state, ids, nums = paraformer_online.step_jit(
                self.oparams, self.ocfg, self.online_state,
                jnp.asarray(feats), jnp.asarray(counts), jnp.asarray(finals))
            batch = ([(sid, self.slots[sid]) for sid in todo],
                     finals, ids, nums)
            if self._pipeline:
                # hand the in-flight batch to the collector thread: its
                # device round-trip + detok never block the tick
                with self._results_lock:
                    for sid in todo:
                        self.slots[sid].p1_inflight += 1
                    self._p1_outstanding += 1
                self._p1_queue.put(batch)
            else:
                self._finish_asr_batch(batch, inflight_counted=False)
            if not more:
                return

    def _p1_collector(self):
        """Background pass-1 result lane: a single FIFO worker (per-slot
        result order preserved) fetches each dispatched batch and posts
        partial texts to the slots."""
        while True:
            batch = self._p1_queue.get()
            try:
                self._finish_asr_batch(batch, inflight_counted=True)
            except Exception:  # pragma: no cover - keep the lane alive
                import logging

                logging.getLogger("asr2pass.engine").exception(
                    "pass-1 collector failure")
                with self._results_lock:
                    for _, slot in batch[0]:
                        slot.p1_inflight -= 1
            finally:
                with self._results_lock:
                    self._p1_outstanding -= 1

    def _finish_asr_batch(self, batch, inflight_counted: bool):
        slot_refs, finals, ids, nums = batch
        ids, nums = jax.device_get((ids, nums))  # one fetch, not two
        for sid, slot in slot_refs:
            k = int(nums[sid])
            if k:
                text = slot.vocab.to_string(
                    [int(x) for x in ids[sid, :k]], streaming=True)
                if text:
                    with self._results_lock:
                        slot.results.append(
                            {"mode": "2pass-online"
                             if self.mode == "2pass" else "online",
                             "text": text})
            if finals[sid]:
                # the front-end already reset itself on the final commit
                # (StreamingFrontend._emit); only detok state resets here
                slot.vocab.reset_streaming()
        if inflight_counted:
            with self._results_lock:
                for _, slot in slot_refs:
                    slot.p1_inflight -= 1

    def _pass2(self):
        if self.offline is None:
            return
        pairs = []
        for sid, slot in enumerate(self.slots):
            while slot.seg_queue:
                fr = slot.seg_queue.pop(0)
                slot.p2_inflight += 1
                pairs.append((sid, fr))
        if not pairs:
            return
        if self._p2_async:
            for p in pairs:
                self._p2_queue.put(p)
        else:
            self._process_segments(pairs)

    def _p2_worker(self):
        """Background pass-2 lane: drains segments in batches so pass-1
        ticks keep their ~600 ms cadence while long segments decode."""
        while True:
            pairs = [self._p2_queue.get()]
            # greedy drain up to one device batch worth
            while len(pairs) < 16:
                try:
                    pairs.append(self._p2_queue.get_nowait())
                except queue.Empty:
                    break
            try:
                self._process_segments(pairs)
            except Exception:  # pragma: no cover - keep the lane alive
                import logging

                logging.getLogger("asr2pass.engine").exception(
                    "pass-2 lane failure")
                with self._results_lock:
                    for sid, _ in pairs:
                        self.slots[sid].p2_inflight -= 1

    def _process_segments(self, pairs):
        """Offline-decode segments with each owner's per-connection options
        (hotwords, LM, ITN, svs lang) and post results to the slots."""
        from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline

        slots = [self.slots[sid] for sid, _ in pairs]
        segs = [fr.data for _, fr in pairs]
        if isinstance(self.offline.asr, SenseVoiceOffline):
            # SenseVoice pass-2: per-item lang/itn prefix ids
            outs = self.offline.asr.recognize_batch(
                segs, langs=[s.svs_lang for s in slots],
                itn_flags=[s.svs_itn for s in slots])
        else:
            kw = {}
            if any(s.hw_emb is not None for s in slots):
                kw["hw_embs"] = [s.hw_emb for s in slots]
            if any(s.lm_decoder is not None for s in slots):
                kw["lm_decoders"] = [s.lm_decoder for s in slots]
            outs = self.offline.asr.recognize_batch(segs, **kw)
        for (text, merged), (sid, fr) in zip(outs, pairs):
            slot = self.slots[sid]
            stamps = ts_mod.stamps_to_ms(merged, fr.global_start / 1000.0)
            if self.punc is not None and text:
                text = self.punc.add_punc_streaming(text, slot.punc_cache)
            if self.models.itn is not None and slot.use_itn and text:
                text_itn = self.models.itn.normalize(text)
                if stamps:
                    sm = ts_mod.timestamp_smooth(text, text_itn, stamps)
                    if sm:
                        stamps = sm
                text = text_itn
            res = {"mode": "2pass-offline", "text": text}
            if stamps:
                res["timestamp"] = stamps
                res["stamp_sents"] = ts_mod.timestamp_sentence(text, stamps)
            with self._results_lock:
                slot.results.append(res)
                slot.p2_inflight -= 1
