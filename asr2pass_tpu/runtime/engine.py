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
import time
import threading
from dataclasses import dataclass, field
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.frontend.fbank import get_extractor
from asr2pass_tpu.models import fsmn_vad, paraformer_online
from asr2pass_tpu.runtime.audio_splitter import TwoPassSplitter
from asr2pass_tpu.runtime.streaming_frontend import StreamingFrontend
from asr2pass_tpu.text import timestamps as ts_mod
from asr2pass_tpu.text.vocab import Vocab
from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions

class EngineAtCapacity(RuntimeError):
    """Every slot is active or still draining in-flight work. The server
    answers with a protocol error result instead of dropping the socket
    (the reference accepts and queues via its thread pool,
    websocket-server-2pass.cpp:278-366; here capacity is a hard batch
    dimension, so the client is told to retry)."""


def _vad_bucket(fcfg) -> int:
    """Mel rows computed per fused-VAD tick: the engine stages up to
    64*lfr_n mel frames of audio per slot per tick (one ~0.64 s chunk of
    LFR rows), plus margin for the LFR/residual carry."""
    return 64 * fcfg.lfr_n + 8


# device-resident per-slot audio ring (samples; int16): written ONCE by
# the fused VAD step from its staged upload, read by the fused pass-1
# step AND (since round 5) gathered by the pass-2 lane — raw audio
# crosses the tunnel exactly once per tick and pass-2 re-uploads
# NOTHING. Default 2^19 samples = 32.8 s per slot: enough for the
# longest 2pass segment (vad_max_len default 15-20 s) plus several
# seconds of lane-dispatch lag; engines can size it down
# (ring_samples=) where memory is tighter than segment length (the
# pre-round-5 2^17 served pass-1 alone).
_RING_SAMPLES = 1 << 19


@functools.lru_cache(maxsize=4)
def _fused_vad_step(fcfg, capacity: int, sil_pdf_ids=(0,),
                    ring_samples: int = _RING_SAMPLES):
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

    max_new = 64 * fcfg.lfr_n * fcfg.frame_shift  # staging cap (samples)

    @jax.jit
    def step(params, means, vars_, waves_new, n_new, win_start, total_new,
             k_emit, finals, hist, caches, ring, ring_off, n_samp,
             win_off):
        # waves_new carries ONLY this tick's new samples, int16 (PCM-grid;
        # int16 value k == float sample k/32768 * scale_input exactly):
        # the fbank window is re-read from the device audio ring after the
        # write below, so the framing residual never re-uploads and the
        # staged buffer is [C, max_new] instead of [C, need] — ~13% fewer
        # bytes on the transfer that dominates the tick at high capacity.
        #
        # 1. write the new samples into the per-slot device audio ring —
        # the ONE upload serves VAD fbank, pass-1 and pass-2. Structured
        # vmapped dynamic_update_slice (an arbitrary-index scatter on the
        # [C, 2^17] ring measured ~100 ms; this form is ~1-5 ms). The
        # host caps staging so a write never straddles the ring end;
        # start2/shift realign when the fixed-length window would.
        shift = ring_off - jnp.minimum(ring_off,
                                       ring_samples - max_new)
        start2 = ring_off - shift
        j = jnp.arange(max_new)[None, :]
        src = jnp.clip(j - shift[:, None], 0, max_new - 1)
        vals = jnp.take_along_axis(waves_new, src, axis=1)
        keep = (j >= shift[:, None]) & (j < (shift + n_samp)[:, None])
        old = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (max_new,))
        )(ring, start2)
        upd = jnp.where(keep, vals, old)
        new_ring = jax.vmap(
            lambda r, u, s: jax.lax.dynamic_update_slice(r, u, (s,))
        )(ring, upd, start2)
        # 2. gather each slot's fbank window (residual + new samples) from
        # the updated ring — the residual samples were written by earlier
        # ticks; the head-duplicated ring handles wrap (the pass-1
        # pattern). Samples past the valid window read stale ring data,
        # but every consumer is masked: the LFR gather clamps to
        # total_new, fsmn_vad.apply advances caches by exactly k_emit,
        # and the automaton reads only k_emit posterior rows.
        ext = jnp.concatenate([new_ring, new_ring[:, :need]], axis=1)
        win = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (need,))
        )(ext, win_off)
        frames = win[:, frame_idx].astype(jnp.float32)       # [C, nf, flen]
        mel_new = ex.frames_to_mel(
            (frames * (fcfg.scale_input / 32768.0)
             ).reshape(capacity * nf, -1)
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
        return sil, new_hist, new_caches, new_ring

    return step, need, max_new


_P1_FRAMES = 68          # max new mel frames staged per pass-1 round


@functools.lru_cache(maxsize=4)
def _fused_p1_step(ocfg, capacity: int,
                   ring_samples: int = _RING_SAMPLES):
    """One jitted program for the whole pass-1 lane: batched fbank over the
    staged speech samples -> LFR window gather -> CMVN -> append into a
    device-resident pending-feats ring -> consume one exact-`center` chunk
    per slot -> the streaming-Paraformer step.

    Round 2 ran the ASR front-end as its own batched_fbank dispatch whose
    [cap, T, 80] fp32 mel came BACK to the host every tick — measured at
    ~256 ms of a ~480 ms tick at 128 slots (device->host on the tunnel is
    ~30 MB/s; scripts/tick_breakdown.py vd_asr_fbank). Fusing the front-end
    into the model step means no mel ever crosses the wire: the tick
    uploads raw samples (host->device is fast) and the only fetch is the
    tiny [cap, U] token ids, already on the collector thread.

    Host keeps every counter (mel totals, next-LFR-window, ring read/write
    offsets) — they are exact mirrors of StreamingFrontend's accounting, so
    outputs match the unfused path bit-for-bit (tests/test_engine.py). The
    chunk-assembly contract is unchanged: the model consumes exactly
    `center` rows (or a final partial), same as funasr's 600 ms cadence
    (reference paraformer-online.cpp:119-238 splice caches)."""
    fcfg = ocfg.frontend
    ex = get_extractor(fcfg)
    nf = _P1_FRAMES
    need = fcfg.frame_length + (nf - 1) * fcfg.frame_shift
    left = (fcfg.lfr_m - 1) // 2
    center = ocfg.chunk_size[1]
    lfr_dim = fcfg.lfr_m * fcfg.n_mels
    # max LFR windows emitted per round / mel history / pending-ring rows
    k_max = nf // fcfg.lfr_n + 2
    hist = fcfg.lfr_m + fcfg.lfr_n + 8       # > max un-consumed mel rows
    ring_n = 1
    while ring_n < k_max + center + 2:
        ring_n *= 2
    frame_idx = (np.arange(nf)[:, None] * fcfg.frame_shift
                 + np.arange(fcfg.frame_length)[None, :])

    @jax.jit
    def step(params, means, vars_, state, audio_ring, start_off, n_new,
             win_start, total_new, k_emit, fe_finals, ring_woff,
             consume_start, consume_count, finals, mel_hist, ring):
        # window slice straight from the device audio ring the VAD step
        # wrote (start_off = per-slot absolute cursor % ring) — pass-1
        # uploads NOTHING: the tick's one audio upload serves both
        # passes. Vmapped dynamic_slice over a head-duplicated ring
        # handles wrap and stays structured (an arbitrary-index gather
        # on the [C, 2^17] ring measured ~100 ms; this is ~1-5 ms).
        ext = jnp.concatenate([audio_ring, audio_ring[:, :need]], axis=1)
        win = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (need,))
        )(ext, start_off)
        frames = win[:, frame_idx].astype(jnp.float32)      # [C, nf, flen]
        mel_new = ex.frames_to_mel(
            (frames * (fcfg.scale_input / 32768.0)
             ).reshape(capacity * nf, -1)
        ).reshape(capacity, nf, -1)
        combined = jnp.concatenate([mel_hist, mel_new], axis=1)
        base = total_new - n_new                           # old mel total
        # LFR windows win_start..win_start+k_emit; taps clamped to valid
        # mel rows — low clamp gives first-window left-padding, high clamp
        # gives the final-flush tail repeat (StreamingFrontend._emit_windows)
        gw = win_start[:, None] + jnp.arange(k_max)[None, :]
        g = gw[:, :, None] * fcfg.lfr_n + jnp.arange(fcfg.lfr_m) - left
        g = jnp.clip(g, 0, jnp.maximum(total_new - 1, 0)[:, None, None])
        local = jnp.clip(g - (base - hist)[:, None, None], 0, hist + nf - 1)
        feats = jnp.take_along_axis(
            combined, local.reshape(capacity, -1)[:, :, None], axis=1
        ).reshape(capacity, k_max, lfr_dim)
        feats = (feats + means) * vars_
        # masked append into each slot's pending ring
        widx = (ring_woff[:, None] + jnp.arange(k_max)[None, :]) % ring_n
        wmask = jnp.arange(k_max)[None, :] < k_emit[:, None]
        old = jnp.take_along_axis(ring, widx[:, :, None], axis=1)
        vals = jnp.where(wmask[:, :, None], feats, old)
        ring = ring.at[jnp.arange(capacity)[:, None], widx].set(vals)
        # consume one exact-center chunk per slot (count 0 = no-op slot)
        cidx = (consume_start[:, None]
                + jnp.arange(center)[None, :]) % ring_n
        chunk = jnp.take_along_axis(ring, cidx[:, :, None], axis=1)
        new_state, ids, nums = paraformer_online.step(
            params, ocfg, state, chunk, consume_count, finals)
        # slide the mel history to the last `hist` rows; utterance-final
        # slots reset their front-end
        hidx = n_new[:, None] + jnp.arange(hist)[None, :]
        new_hist = jnp.take_along_axis(combined, hidx[:, :, None], axis=1)
        new_hist = jnp.where(fe_finals[:, None, None], 0.0, new_hist)
        return new_state, ids, nums, new_hist, ring

    return step, need, hist, ring_n, k_max


@dataclass
class _Slot:
    active: bool = False
    # connection generation: bumped on every _reset_slot. The async lanes
    # capture the _Slot OBJECT at dispatch time and post results/decrement
    # counters on that object only — a reclaimed slot index can never
    # receive a previous connection's transcript (the reference guards the
    # same lifecycle with access_num refcounts + an is_eof reaper,
    # websocket-server-2pass.cpp:278-366,293-300)
    gen: int = 0
    vad_frontend: Any = None
    asr_frontend: Any = None
    sm: Any = None
    splitter: Any = None
    vocab: Any = None
    audio_in: list = field(default_factory=list)   # (samples, is_final)
    seg_queue: list = field(default_factory=list)  # offline AudioFrames
    punc_cache: list = field(default_factory=list)
    results: list = field(default_factory=list)
    # per-connection first-message options (the reference plumbs all of
    # these per connection, websocket-server-2pass.cpp:424-523)
    hw_emb: Any = None                 # compiled hotword embeddings [N, D]
    lm_decoder: Any = None             # per-connection LM handle (+bias)
    svs_context: Any = None            # hotword ContextGraph (SVS pass-2)
    use_itn: bool = True
    svs_lang: Any = None
    svs_itn: Any = None
    vad_tail_sil: Any = None           # max_end_silence override (ms)
    vad_max_len: Any = None            # max_single_segment override (ms)
    speech_noise_thres: Any = None
    p2_inflight: int = 0               # segments handed to the pass-2 lane
    p1_inflight: int = 0               # chunks in the dispatched-not-yet-
                                       # fetched pass-1 batch (pipelining)
    vd_inflight: int = 0               # VAD posterior batches dispatched
                                       # but not yet decided (async lane)
    vd_abs: int = 0                    # decide-side absolute sample count
    splitter_base: int = 0             # abs sample of the splitter epoch
    # fused pass-1 front-end host mirrors (exact StreamingFrontend
    # accounting; the audio AND the mel stay device-resident)
    p1_groups: list = field(default_factory=list)  # (abs_start, n, final)
    p1_residual: int = 0               # samples staged but not yet framed
    p1_cursor: int = 0                 # absolute index of next unframed sample
    p1_total: int = 0                  # mel frames produced this utterance
    p1_win: int = 0                    # next LFR window index
    p1_ring_w: int = 0                 # pending-ring windows written (monotonic)
    p1_ring_r: int = 0                 # pending-ring windows consumed
    p1_flush_at: Any = None            # ring_w at utterance final, or None


class StreamEngine:
    def __init__(self, models, capacity: int = 64, mode: str = "2pass",
                 pass2_async: bool = False, pipeline: bool = True,
                 vad_async: bool = False, fused_fetch: bool = False,
                 upload_overlap: bool = False,
                 decide_async: bool = False,
                 ring_samples: int = _RING_SAMPLES):
        self.models = models
        self.capacity = capacity
        self._ring_samples = ring_samples
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
        (self._vad_step, self._vad_need,
         self._vad_max_new) = _fused_vad_step(
            fcfg, capacity, tuple(models.vad_cfg.sil_pdf_ids),
            ring_samples)
        vmeans, vvars = (models.vad_cmvn if models.vad_cmvn is not None
                         else (np.zeros(fcfg.lfr_dim, np.float32),
                               np.ones(fcfg.lfr_dim, np.float32)))
        self._vad_means = jnp.asarray(vmeans, jnp.float32)
        self._vad_vars = jnp.asarray(vvars, jnp.float32)
        self._vad_hist = jnp.zeros(
            (capacity, fcfg.lfr_m - 1, fcfg.n_mels), jnp.float32)
        self._vad_total = np.zeros(capacity, np.int64)
        self._vad_next = np.zeros(capacity, np.int64)
        # fused pass-1 front-end+model program + device-resident buffers
        (self._p1_step, self._p1_need, self._p1_hist_n, self._p1_ring_n,
         self._p1_kmax) = _fused_p1_step(ocfg, capacity, ring_samples)
        if ring_samples < self._p1_need + 4 * self._vad_max_new:
            # below this, the pass-1 backlog guard quarantines healthy
            # streams (window + a few ticks of decide-lane lag must fit)
            raise ValueError(
                f"ring_samples={ring_samples} too small: pass-1 needs a "
                f"{self._p1_need}-sample window plus staging lag "
                f"(>= {self._p1_need + 4 * self._vad_max_new})")
        afc = ocfg.frontend
        ameans, avars = (models.asr_cmvn if models.asr_cmvn is not None
                         else (np.zeros(afc.lfr_dim, np.float32),
                               np.ones(afc.lfr_dim, np.float32)))
        self._asr_means = jnp.asarray(ameans, jnp.float32)
        self._asr_vars = jnp.asarray(avars, jnp.float32)
        self._p1_hist = jnp.zeros(
            (capacity, self._p1_hist_n, afc.n_mels), jnp.float32)
        self._p1_ring = jnp.zeros(
            (capacity, self._p1_ring_n, afc.lfr_dim), jnp.float32)
        # device audio ring: written once per tick by the fused VAD step,
        # read by the fused pass-1 step (one upload serves both passes)
        self._audio_ring = jnp.zeros((capacity, ring_samples), jnp.int16)
        self._abs_fed = np.zeros(capacity, np.int64)
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
        # fused-fetch tick (the serving default via ws_server/bench): ONE
        # combined device_get per tick for VAD posteriors + pass-1 ids.
        # On the tunnel backend every fetch costs a full round-trip and
        # concurrent fetches from separate threads serialize (measured
        # ~100-190 ms each under load); dispatch-VAD + dispatch-P1 + one
        # combined fetch measures ~39 ms/tick at capacity 128 vs ~295 ms
        # for the threaded-collector tick. P1 stages the PREVIOUS fetch's
        # decisions (one loop-iteration of added latency, not a chunk).
        self._fused_fetch = fused_fetch
        if fused_fetch:
            pipeline = False
            vad_async = False
        self._pipeline = pipeline
        self._p1_queue: "queue.Queue" = queue.Queue()
        self._p1_outstanding = 0
        self._p1_thread = None
        if pipeline:
            self._p1_thread = threading.Thread(
                target=self._p1_collector, daemon=True, name="pass1-collect")
            self._p1_thread.start()
        # async VAD-decide lane (serving default via ws_server/bench): the
        # posterior fetch is a device SYNC — profiled at ~214-387 ms p50 of
        # a ~273-423 ms tick at 128 streams (scripts/tick_breakdown.py),
        # waiting behind the queued pass-1 device steps, NOT host work.
        # Moving fetch + automaton + splitter to a FIFO worker makes the
        # tick dispatch-only, so host staging and device compute fully
        # overlap (the same pipeline move as the pass-1 collector).
        self._vad_async = vad_async
        self._vd_queue: "queue.Queue" = queue.Queue()
        self._vd_outstanding = 0
        # publishes one VAD batch's decisions (p1 groups + segments for
        # ALL slots) atomically wrt the tick's staging scan — without it
        # the tick catches half-published batches and fragments the
        # pass-1 device step into many small dispatches (measured 70
        # dispatches instead of 8 for the same audio, 4x wall)
        self._stage_lock = threading.Lock()
        # fused-tick async decide: the VAD automaton + splitter pass
        # (pure host Python over the already-FETCHED posteriors — ~112 ms
        # at capacity 512) moves to the decide lane, where it runs during
        # the NEXT tick's fetch wait (the fetch releases the GIL); the
        # tick stays dispatch+fetch only. Decisions land one lane-hop
        # later — the same ordering contract as vad_async, minus the
        # lane-side device fetch that made vad_async serialize transfers.
        self._decide_async = decide_async and fused_fetch
        self._vd_thread = None
        if vad_async or self._decide_async:
            self._vd_thread = threading.Thread(
                target=self._vd_collector, daemon=True, name="vad-decide")
            self._vd_thread.start()
        # upload double-buffer (VERDICT r4 item 3): with upload_overlap
        # the fused tick stages + uploads tick N+1's int16 waves on a
        # dedicated lane WHILE tick N's combined fetch is in flight, so
        # the ~145 ms host->device staging transfer (capacity 512) and
        # the device round-trip overlap instead of serializing. Staged
        # work counts in the slots' vd_inflight from STAGE time, so a
        # slot can never be reclaimed between staging and dispatch (a
        # stale row would otherwise write old audio into a fresh
        # connection's device ring). Costs one tick of added latency for
        # newly-arrived audio ONLY while the pipeline is primed; an idle
        # engine stages inline.
        self._upload_overlap = upload_overlap and fused_fetch
        self._staged_next = None
        self._upload_pool = None
        if self._upload_overlap:
            import concurrent.futures

            self._upload_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="upload-lane")

    def warm_pass2_ring(self, buckets=(64, 128, 256),
                        batches=(4, 16)):
        """Compile the pass-2 RING front-end programs for the common
        (lfr-bucket, batch) combos before serving — the lane's ring
        gather uses different programs than the upload path, and a cold
        combo otherwise compiles mid-serving (a 40-90 s tunnel compile
        that lands as a tick-latency spike; the 64-tick soak's p95
        outliers were exactly these)."""
        if self.offline is None:
            return
        from asr2pass_tpu.runtime.streaming_frontend import (
            offline_window_samples,
            ring_frontend_device,
        )

        fcfg = self.offline.asr.cfg.frontend
        means, vars_ = self.offline.asr.cmvn
        for bucket in buckets:
            if offline_window_samples(fcfg, bucket) > self._ring_samples:
                continue
            for bb in batches:
                ring_frontend_device(
                    self._audio_ring, [0] * bb, [0] * bb, [1] * bb,
                    bucket, fcfg, means, vars_, batch_b=bb)

    def warmup(self):
        """Compile the batched VAD + ASR steps before serving traffic
        (first-compile is minutes on remote-compile TPU backends), and
        prime each async lane's FIRST device fetch — on the tunnel
        backend a thread's first transfer pays a one-time session setup
        (measured 12 s; subsequent fetches are milliseconds), which must
        not land on live traffic."""
        m = self.models
        zi = jnp.zeros((self.capacity,), jnp.int32)
        probs, _, _, _ = self._vad_step(
            m.vad_params, self._vad_means, self._vad_vars,
            jnp.zeros((self.capacity, self._vad_max_new), jnp.int16),
            zi, zi, zi, zi,
            jnp.zeros((self.capacity,), bool),
            self._vad_hist, self.vad_caches,
            self._audio_ring, zi, zi, zi)
        zb = jnp.zeros((self.capacity,), bool)
        _, ids, nums, _, _ = self._p1_step(
            self.oparams, self._asr_means, self._asr_vars,
            self.online_state, self._audio_ring, zi,
            zi, zi, zi, zi, zb, zi, zi, zi, zb,
            self._p1_hist, self._p1_ring)
        if self._fused_fetch:
            # the fused tick's combined fetch runs on THIS thread (the
            # serving executor) — pay its one-time session setup here
            jax.device_get((probs, ids, nums))
        if self._upload_overlap:
            # prime the upload lane's first host->device transfer (a
            # thread's first tunnel use pays a one-time session setup)
            self._upload_pool.submit(
                lambda: np.asarray(jnp.asarray(
                    np.zeros((self.capacity, self._vad_max_new), np.int16))
                    [:1, :1])).result()
        if self._vad_async:
            with self._results_lock:
                self._vd_outstanding += 1
            self._vd_queue.put((probs, []))          # fetch, no slots
        if self._pipeline:
            with self._results_lock:
                self._p1_outstanding += 1
            self._p1_queue.put(([], np.zeros(self.capacity, bool),
                                ids, nums))
        dummy = None
        if self._p2_thread is not None and self.offline is not None:
            # prime the pass-2 lane's first fetch + the smallest offline
            # bucket compile off the serving path
            from asr2pass_tpu.runtime.audio_splitter import AudioFrame

            dummy = _Slot()
            dummy.p2_inflight = 1
            self._p2_queue.put((-1, dummy, AudioFrame(
                data=np.zeros(3200, np.float32), is_final=True)))
        deadline = time.time() + 600
        while ((self._vd_outstanding > 0 or self._p1_outstanding > 0
                or (dummy is not None and dummy.p2_inflight > 0))
               and time.time() < deadline):
            time.sleep(0.01)

    # -- stream lifecycle ------------------------------------------------
    def open(self, hw_emb=None, hotwords=None, use_itn: bool = True,
             svs_lang=None, svs_itn=None, vad_tail_sil=None,
             vad_max_len=None, speech_noise_thres=None) -> int:
        """Claim a slot with this connection's first-message options —
        feature parity with TwoPassSession (the reference supports
        hotwords + per-request VAD/ITN/svs config on every connection,
        websocket-server-2pass.cpp:424-523)."""
        for sid, slot in enumerate(self.slots):
            if (not slot.active and slot.p1_inflight == 0
                    and slot.p2_inflight == 0 and slot.vd_inflight == 0):
                # reclaim is deferred while the previous connection still
                # has work in the async lanes — those lanes hold the OLD
                # slot object, whose counters gate this branch
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
                svs = False
                if self.offline is not None:
                    from asr2pass_tpu.runtime.sensevoice_asr import (
                        SenseVoiceOffline,
                    )

                    svs = isinstance(self.offline.asr, SenseVoiceOffline)
                if (self.models.lm is not None
                        or self.models.tlg_dir is not None):
                    slot.lm_decoder = (
                        self.models._svs_lm_decoder(hotwords or None)
                        if svs else self.models._make_lm_decoder(
                            hotwords or None))
                if hotwords and svs:
                    # SVS hotword biasing rides the context graph in
                    # the CTC beam (sensevoice-small.cpp:392-440) —
                    # compiled once per connection, shared read-only
                    slot.svs_context = \
                        self.models.svs_context_graph(hotwords)
                return sid
        raise EngineAtCapacity(
            f"engine at capacity ({self.capacity} streams)")

    def _reset_slot(self, sid: int):
        m = self.models
        vmeans, vvars = (m.vad_cmvn if m.vad_cmvn is not None
                         else (None, None))
        ameans, avars = (m.asr_cmvn if m.asr_cmvn is not None
                         else (None, None))
        slot = _Slot(
            gen=self.slots[sid].gen + 1,
            vad_frontend=StreamingFrontend(m.vad_cfg.frontend, vmeans, vvars),
            asr_frontend=StreamingFrontend(self.ocfg.frontend, ameans, avars),
            sm=E2EVadStateMachine(VadOptions(
                speech_noise_thres=m.vad_cfg.speech_noise_thres)),
            splitter=TwoPassSplitter(m.vad_cfg.sample_rate),
            vocab=Vocab(m.vocab.tokens, m.vocab.lang),
            punc_cache=[],
        )
        self.slots[sid] = slot
        # zero the batched device state for this slot
        self._clear_device_slot(sid)

    def _clear_p1_device(self, sids):
        """Zero the pass-1 device columns (online model caches + mel
        history) of one OR MANY slots in a single batched update — the
        fresh state is all-zero, so these are scalar-fill scatters, and
        batching keeps the ring-overrun quarantine at one fixed set of
        dispatches per tick no matter how many slots overran (each eager
        dispatch is a tunnel round-trip; per-slot clears were a latency
        feedback loop exactly when the engine was already late). Used on
        slot reclaim AND on quarantine — after the host backlog is
        dropped the device caches no longer correspond to any staged
        audio, so the next utterance must start from a clean state."""
        if not isinstance(sids, (list, tuple)):
            sids = [sids]
        if not sids:
            return
        idx = np.asarray(sids, np.int32)
        s = self.online_state
        self.online_state = paraformer_online.OnlineState(
            feats_cache=s.feats_cache.at[idx].set(0.0),
            pos=s.pos.at[idx].set(0),
            cif_integrate=s.cif_integrate.at[idx].set(0.0),
            cif_frame=s.cif_frame.at[idx].set(0.0),
            dec_caches=s.dec_caches.at[:, idx].set(0.0),
        )
        self._p1_hist = self._p1_hist.at[idx].set(0.0)

    def _clear_device_slot(self, sid: int):
        self._clear_p1_device([sid])
        self.vad_caches = [c.at[sid].set(0.0) for c in self.vad_caches]
        self._vad_hist = self._vad_hist.at[sid].set(0.0)
        self._vad_total[sid] = 0
        self._vad_next[sid] = 0
        self._abs_fed[sid] = 0
        # audio-ring contents are gated by the slot's (reset) absolute
        # counters — stale samples are never gathered
        # pending-ring contents are gated by the slot's (reset) host
        # counters — stale rows are never gathered

    def close(self, sid: int):
        self.slots[sid].active = False

    def feed(self, sid: int, samples: np.ndarray, is_final: bool = False):
        from asr2pass_tpu.frontend.audio import quantize_pcm

        # PCM-grid quantization at the boundary (a no-op for real s16le
        # input) lets both fused steps stage int16 uploads bit-exactly
        self.slots[sid].audio_in.append((quantize_pcm(samples), is_final))

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
                and not slot.p1_groups
                and slot.p1_ring_w == slot.p1_ring_r
                and slot.p1_flush_at is None
                and not slot.seg_queue
                and slot.p2_inflight == 0
                and slot.p1_inflight == 0
                and slot.vd_inflight == 0)

    # -- the batched tick ------------------------------------------------
    def step(self):
        """One pipelined tick:
             1. stage + DISPATCH the fused VAD step (async)
             2. VAD posterior fetch + automatons + splitter — on the
                vad-decide lane when vad_async (the fetch is a device
                sync; keeping it off the tick thread overlaps host
                staging with device compute), else inline
             3. DISPATCH this tick's pass-1 batch — fetched + detokenized
                on the collector thread, off the tick critical path
             4. hand segments to the pass-2 lane
        """
        from asr2pass_tpu.runtime.metrics import GLOBAL as METRICS

        if self._fused_fetch:
            return self._step_fused()
        with METRICS.stage("tick_vad_dispatch"):
            ctx = self._vad_stage_dispatch()
        if self._vad_async:
            if ctx is not None:
                with self._results_lock:
                    for _, slot, _, _, _ in ctx[1]:
                        slot.vd_inflight += 1
                    self._vd_outstanding += 1
                self._vd_queue.put(ctx)
        else:
            with METRICS.stage("tick_vad_decide"):
                self._vad_decide(ctx)
        with METRICS.stage("tick_p1_dispatch"):
            self._asr_step()
        with METRICS.stage("tick_pass2_handoff"):
            self._pass2()

    def _step_fused(self):
        """Single-fetch tick: dispatch VAD_N, dispatch P1_N (staged from
        tick N-1's decisions), then ONE device_get for everything the
        host needs; decisions and detok run after the fetch. See the
        constructor note for the round-trip economics."""
        from asr2pass_tpu.runtime.metrics import GLOBAL as METRICS

        overlap = self._upload_overlap
        with METRICS.stage("tick_vad_dispatch"):
            if overlap:
                # consume the upload lane's pre-staged (already-uploaded)
                # buffer; an unprimed pipeline stages inline this once
                staged = self._staged_next
                self._staged_next = None
                if staged is None:
                    staged = self._vad_stage_host(count_staged=True)
                ctx = (self._vad_dispatch_staged(staged)
                       if staged is not None else None)
            else:
                ctx = self._vad_stage_dispatch()
        with METRICS.stage("tick_p1_dispatch"):
            batches = self._asr_step(defer=True)
        upload_fut = None
        if overlap:
            # stage + upload the NEXT tick's waves while this tick's
            # combined fetch is in flight (the ~145 ms transfer and the
            # device round-trip overlap instead of serializing)
            upload_fut = self._upload_pool.submit(self._stage_and_upload)
        handles = [] if ctx is None else [ctx[0]]
        for b in batches:
            handles.append(b[2])
            handles.append(b[3])
        try:
            with METRICS.stage("tick_fused_fetch"):
                fetched = jax.device_get(tuple(handles)) if handles else ()
            i = 0
            if ctx is not None:
                if self._decide_async:
                    # hand the (numpy) posteriors to the decide lane;
                    # counted accounting holds the slots' reclaim gate
                    # until the lane settles each work item
                    with self._results_lock:
                        if not overlap:   # overlap counted at stage time
                            for _, slot, _, _, _ in ctx[1]:
                                slot.vd_inflight += 1
                        self._vd_outstanding += 1
                    self._vd_queue.put((fetched[0], ctx[1]))
                else:
                    with METRICS.stage("tick_vad_decide"):
                        self._decide_counted(fetched[0], ctx[1], overlap)
                i = 1
            with METRICS.stage("tick_p1_detok"):
                for refs, finals, _, _ in batches:
                    self._finish_asr_batch(
                        (refs, finals, fetched[i], fetched[i + 1]),
                        inflight_counted=False)
                    i += 2
            with METRICS.stage("tick_pass2_handoff"):
                self._pass2()
        finally:
            # the next tick needs the staged buffer even when this tick
            # failed mid-decide — a lost future would leak its slots'
            # vd_inflight counts and wedge reclaim
            if upload_fut is not None:
                with METRICS.stage("tick_upload_join"):
                    self._staged_next = upload_fut.result()

    def _decide_counted(self, probs, work, counted: bool):
        """Inline decide with the counted-settlement contract: on a
        partial failure only the un-settled work items are decremented
        (the _vd_collector rule, applied to the fused tick)."""
        if not counted:
            return self._vad_decide((probs, work))
        settled: list = []
        try:
            self._vad_decide((probs, work), counted=True, settled=settled)
        except Exception:
            done = {id(s) for s in settled}
            with self._results_lock:
                for _, slot, _, _, _ in work:
                    if id(slot) not in done:
                        slot.vd_inflight -= 1
            raise

    def has_inflight(self) -> bool:
        return (self._p1_outstanding > 0 or self._vd_outstanding > 0
                or self._staged_next is not None)

    def slot_has_work(self, slot) -> bool:
        """True when a slot has queued audio/frames/segments a step() would
        advance (the serving loop's wake condition)."""
        return bool(slot.active
                    and (slot.audio_in or slot.p1_groups
                         or slot.p1_flush_at is not None
                         or slot.p1_ring_w - slot.p1_ring_r >= self.center
                         or slot.seg_queue))

    def _vad_stage_dispatch(self):
        staged = self._vad_stage_host()
        if staged is None:
            return None
        return self._vad_dispatch_staged(staged)

    def _stage_and_upload(self):
        """Upload-lane body: host-stage the next tick's audio and push
        the int16 waves to the device while the current tick's fetch is
        in flight. Staged work was counted into vd_inflight, so the
        decide path must run with counted=True."""
        staged = self._vad_stage_host(count_staged=True)
        if staged is not None:
            try:
                staged["dev_waves"] = jnp.asarray(staged["waves"])
            except Exception:
                # settle the counts a failed upload would otherwise leak
                with self._results_lock:
                    for _, slot, _, _, _ in staged["work"]:
                        slot.vd_inflight -= 1
                raise
        return staged

    def _vad_stage_host(self, count_staged: bool = False):
        m = self.models
        # stage every slot's VAD front-end for ONE fused device step
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
            # cap so the device ring write never straddles the ring end
            # (the kernel uses fixed-length dynamic_update_slice);
            # leftovers re-queue for the next tick
            cap_samples = min(
                max_samples,
                self._ring_samples
                - int(self._abs_fed[sid]) % self._ring_samples)
            while slot.audio_in and total < cap_samples:
                s, f = slot.audio_in.pop(0)
                take = min(len(s), cap_samples - total)
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
        waves = np.zeros((self.capacity, self._vad_max_new), np.int16)
        n_new = np.zeros(self.capacity, np.int32)
        win_start = self._vad_next.astype(np.int32)
        total_new = self._vad_total.astype(np.int32)
        k_emit = np.zeros(self.capacity, np.int32)
        finals = np.zeros(self.capacity, bool)
        ring_off = np.zeros(self.capacity, np.int32)
        win_off = np.zeros(self.capacity, np.int32)
        n_samp = np.zeros(self.capacity, np.int32)
        work = []  # (sid, slot, samples, is_final, n_vad_rows)
        for sid, samples, is_final, buf, nf in staged:
            # ONLY the new samples upload (exact: PCM-grid float k/32768,
            # so *32768 is integer); the fbank window — the frontend's
            # framing residual followed by these samples — is re-read
            # from the device ring inside the step
            n = len(samples)
            waves[sid, :n] = (samples * 32768.0).astype(np.int16)
            ring_off[sid] = self._abs_fed[sid] % self._ring_samples
            win_off[sid] = ((self._abs_fed[sid] - (len(buf) - n))
                            % self._ring_samples)
            n_samp[sid] = n
            self._abs_fed[sid] += n
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
                self.slots[sid].vad_frontend.reset()  # drop residual
                finals[sid] = True
            else:
                self._vad_total[sid] = total
                self._vad_next[sid] = upto
            work.append((sid, self.slots[sid], samples, is_final,
                         int(k_emit[sid])))
        if count_staged:
            # staged work holds its slots' reclaim gate until the decide
            # path settles it (counted=True) — between staging and
            # dispatch a reclaimed slot's row would otherwise write the
            # previous connection's audio into the fresh device ring
            with self._results_lock:
                for _, slot, _, _, _ in work:
                    slot.vd_inflight += 1
        return {"waves": waves, "n_new": n_new, "win_start": win_start,
                "total_new": total_new, "k_emit": k_emit,
                "finals": finals, "ring_off": ring_off,
                "win_off": win_off, "n_samp": n_samp, "work": work,
                "dev_waves": None}

    def _vad_dispatch_staged(self, staged):
        m = self.models
        dev_waves = staged["dev_waves"]
        if dev_waves is None:
            dev_waves = jnp.asarray(staged["waves"])
        (probs, self._vad_hist, self.vad_caches,
         self._audio_ring) = self._vad_step(
            m.vad_params, self._vad_means, self._vad_vars,
            dev_waves, jnp.asarray(staged["n_new"]),
            jnp.asarray(staged["win_start"]),
            jnp.asarray(staged["total_new"]),
            jnp.asarray(staged["k_emit"]),
            jnp.asarray(staged["finals"]), self._vad_hist,
            self.vad_caches, self._audio_ring,
            jnp.asarray(staged["ring_off"]),
            jnp.asarray(staged["n_samp"]),
            jnp.asarray(staged["win_off"]))
        # async dispatch done; the posterior fetch happens in _vad_decide
        # after last tick's pass-1 results are collected
        return probs, staged["work"]

    def _vd_collector(self):
        """Async VAD-decide lane: a single FIFO worker (per-slot decision
        order preserved) fetches each dispatched posterior batch and runs
        the automatons + splitter, feeding the pass-1 groups and pass-2
        segment queues the tick consumes."""
        while True:
            ctx = self._vd_queue.get()
            if ctx is None:
                return
            settled: list = []
            try:
                self._vad_decide(ctx, counted=True, settled=settled)
            except Exception:  # pragma: no cover - keep the lane alive
                import logging

                logging.getLogger("asr2pass.engine").exception(
                    "vad-decide lane failure")
                # decrement ONLY the work items _vad_decide had not
                # already settled (the replaced-slot path and the publish
                # loop each decrement as they go; decrementing them again
                # drives vd_inflight negative and open()'s reclaim gate
                # never passes — a permanent slot leak)
                done = {id(s) for s in settled}
                with self._results_lock:
                    for _, slot, _, _, _ in ctx[1]:
                        if id(slot) not in done:
                            slot.vd_inflight -= 1
            finally:
                with self._results_lock:
                    self._vd_outstanding -= 1

    def _vad_decide(self, ctx, counted: bool = False, settled=None):
        from asr2pass_tpu.runtime.metrics import GLOBAL as METRICS
        if ctx is None:
            return
        if settled is None:
            settled = []
        probs, work = ctx
        m = self.models
        with METRICS.stage("vd_probs_fetch"):
            probs = np.asarray(probs)
        # VAD decisions + 2pass split per slot (host, O(frames)); collect
        # the online frames into per-slot groups split at final flags so
        # the ASR front-ends batch the same way
        _t_sm = time.perf_counter()
        publishes = []
        for sid, slot, samples, is_final, n in work:
            if self.slots[sid] is not slot:
                # connection replaced since dispatch: drop the decision
                # (captured-object rule; counters settle in finally below)
                if counted:
                    with self._results_lock:
                        slot.vd_inflight -= 1
                    settled.append(slot)
                continue
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
            # convert offline frames' epoch-sample ranges to GLOBAL
            # absolute coordinates NOW (splitter_base moves on utterance
            # finals; the pass-2 lane consumes these much later) — they
            # let the lane gather segments straight from the device ring
            for fr in offline_frames:
                if fr.samp_start >= 0:
                    fr.samp_start += slot.splitter_base
                    fr.samp_end += slot.splitter_base
            # online speech as ABSOLUTE sample ranges into the device
            # audio ring (nothing re-uploads): consecutive frames of one
            # utterance are contiguous in the fed stream, so a group is
            # (abs_start, n_samples, final). Frame positions are splitter
            # -epoch-relative ms; align to the end (the splitter clamps
            # only the front of early slices).
            gs, cur_start, cur_n = [], None, 0
            seg_sample = slot.splitter.seg_sample   # samples per ms
            for fr in online_frames:
                n = len(fr.data)
                if cur_start is None:
                    cur_start = (slot.splitter_base
                                 + fr.global_end * seg_sample - n)
                cur_n += n
                if fr.is_final:
                    gs.append((cur_start, cur_n, True))
                    cur_start, cur_n = None, 0
            if cur_n:
                gs.append((cur_start, cur_n, False))
            slot.vd_abs += len(samples)
            publishes.append((slot, gs, offline_frames))
            if is_final:
                slot.splitter.reset()
                slot.splitter_base = slot.vd_abs
        # route the speech audio to the fused pass-1 lane — the ASR
        # front-end (fbank+LFR+CMVN) runs INSIDE the pass-1 device step,
        # so nothing but raw samples leaves the host here. The whole
        # batch publishes ATOMICALLY wrt the tick's staging scan, so a
        # concurrent _asr_step stages all-or-none of this batch and the
        # pass-1 device step stays one full dispatch per chunk cadence.
        with self._stage_lock:
            for slot, gs, offline_frames in publishes:
                slot.seg_queue.extend(offline_frames)
                slot.p1_groups.extend(gs)
        if counted:
            with self._results_lock:
                for slot, _, _ in publishes:
                    slot.vd_inflight -= 1
                    settled.append(slot)
        METRICS.stages["vd_automaton"].add(time.perf_counter() - _t_sm)

    def _asr_step(self, defer: bool = False):
        """Stage + dispatch pass-1 rounds. With defer=True (fused-fetch
        tick) the dispatched batches are returned with their device
        handles instead of being fetched here or handed to the
        collector."""
        deferred = []
        if self.mode == "offline":
            return deferred
        c = self.center
        cap = self.capacity
        fcfg = self.ocfg.frontend
        shift, flen = fcfg.frame_shift, fcfg.frame_length
        lfr_m, lfr_n = fcfg.lfr_m, fcfg.lfr_n
        left = (lfr_m - 1) // 2
        ring_n = self._p1_ring_n
        # stage at most one VAD-tick's worth of samples per slot per round
        # so k_emit stays within the program's k_max window budget
        max_stage = (self._p1_kmax - 2) * lfr_n * shift
        for _round in range(8):
            start_off = np.zeros(cap, np.int32)
            n_new = np.zeros(cap, np.int32)
            win_start = np.zeros(cap, np.int32)
            total_new = np.zeros(cap, np.int32)
            k_emit = np.zeros(cap, np.int32)
            fe_finals = np.zeros(cap, bool)
            ring_woff = np.zeros(cap, np.int32)
            consume_start = np.zeros(cap, np.int32)
            consume_count = np.zeros(cap, np.int32)
            finals = np.zeros(cap, bool)
            todo = []
            quarantined = []
            more = False
            # staging scan under the publish lock: a mid-publish VAD
            # batch is invisible, so each pass-1 dispatch carries a FULL
            # batch of chunks instead of fragments (measured: without the
            # barrier the same audio fragmented into 70 small dispatches
            # instead of 8 full ones, 4x wall — see _vad_decide's publish)
            with self._stage_lock:
              for sid, slot in enumerate(self.slots):
                if not slot.active:
                    continue
                # ---- stage new speech samples (up to one utterance
                # final); while a final's windows are still draining from
                # the ring, staging pauses so the flush boundary
                # (p1_flush_at) is unambiguous — resumes next round
                if slot.p1_groups and slot.p1_flush_at is None:
                    # ring-age guard BEFORE any state mutation: if this
                    # slot's backlog outran the device audio ring (its
                    # oldest staged sample was overwritten), quarantine
                    # THIS stream — drop its pass-1 backlog and move on.
                    # Raising here would abort the shared scan after
                    # earlier slots advanced their mirrors, and the
                    # driver's containment would retry into the same
                    # error every tick: an engine-wide livelock.
                    oldest = (slot.p1_cursor if slot.p1_residual
                              else slot.p1_groups[0][0])
                    if (self._abs_fed[sid] - oldest
                            > self._ring_samples - self._p1_need):
                        import logging

                        logging.getLogger("asr2pass.engine").error(
                            "slot %d pass-1 backlog exceeds the device "
                            "audio ring (%d samples); dropping its "
                            "pass-1 backlog", sid, self._ring_samples)
                        slot.p1_groups.clear()
                        slot.p1_residual = 0
                        slot.p1_total = 0
                        slot.p1_win = 0
                        slot.p1_flush_at = None
                        slot.p1_ring_r = slot.p1_ring_w
                        # the device columns (online caches, mel history)
                        # and the streaming detok no longer correspond to
                        # any staged audio — cleared (BATCHED, after the
                        # scan) so the NEXT utterance decodes from clean
                        # state instead of a stale encoder/detok carry
                        quarantined.append(sid)
                        slot.vocab.reset_streaming()
                        win_start[sid] = 0
                        total_new[sid] = 0
                        ring_woff[sid] = slot.p1_ring_w % ring_n
                        continue
                    total, fe_fin = 0, False
                    while (slot.p1_groups and total < max_stage
                           and not fe_fin):
                        g_start, g_n, f = slot.p1_groups.pop(0)
                        take = min(g_n, max_stage - total)
                        if take < g_n:
                            slot.p1_groups.insert(
                                0, (g_start + take, g_n - take, f))
                            g_n, f = take, False
                        if slot.p1_residual == 0 and total == 0:
                            # fresh utterance (or stream start): the
                            # staged range begins at this group
                            slot.p1_cursor = g_start
                        total += g_n
                        fe_fin = fe_fin or f
                    lbuf = slot.p1_residual + total
                    n = ((lbuf - flen) // shift + 1
                         if lbuf >= flen else 0)
                    start_off[sid] = slot.p1_cursor % self._ring_samples
                    slot.p1_cursor += n * shift
                    slot.p1_residual = 0 if fe_fin else lbuf - n * shift
                    n_new[sid] = n
                    tot = slot.p1_total + n
                    win_start[sid] = slot.p1_win
                    total_new[sid] = tot
                    if fe_fin:
                        upto = -(-tot // lfr_n)
                    else:
                        upto = max(
                            (tot - 1 - (lfr_m - 1) + left) // lfr_n + 1,
                            slot.p1_win)
                    k_emit[sid] = upto - slot.p1_win
                    # the +2 window margin in k_max only covers lfr
                    # geometries with ceil((lfr_m-1-left)/lfr_n) <= 2; a
                    # bigger lfr_m/lfr_n ratio would silently drop windows
                    # in the device gather and desync the ring
                    if k_emit[sid] > self._p1_kmax:
                        raise RuntimeError(
                            f"pass-1 k_emit {int(k_emit[sid])} exceeds the "
                            f"program window budget {self._p1_kmax}; the "
                            f"frontend lfr geometry (m={lfr_m}, n={lfr_n}) "
                            "is incompatible with _P1_FRAMES staging")
                    ring_woff[sid] = slot.p1_ring_w % ring_n
                    slot.p1_ring_w += upto - slot.p1_win
                    if fe_fin:
                        fe_finals[sid] = True
                        slot.p1_total = 0
                        slot.p1_win = 0
                        slot.p1_flush_at = slot.p1_ring_w
                    else:
                        slot.p1_total = tot
                        slot.p1_win = upto
                else:
                    # window accounting still needs sane per-slot values
                    win_start[sid] = slot.p1_win
                    total_new[sid] = slot.p1_total
                    ring_woff[sid] = slot.p1_ring_w % ring_n
                # ---- consume one chunk (exact center rows, or the final
                # partial once the utterance's windows are all in the ring)
                cnt = 0
                pending = slot.p1_ring_w - slot.p1_ring_r
                if slot.p1_flush_at is not None:
                    pend_old = slot.p1_flush_at - slot.p1_ring_r
                    if pend_old <= c:
                        cnt = pend_old
                        finals[sid] = True
                        slot.p1_flush_at = None
                    else:
                        cnt = c
                elif pending >= c:
                    cnt = c
                if cnt or finals[sid]:
                    consume_start[sid] = slot.p1_ring_r % ring_n
                    consume_count[sid] = cnt
                    slot.p1_ring_r += cnt
                    todo.append(sid)
                if (slot.p1_groups or slot.p1_flush_at is not None
                        or slot.p1_ring_w - slot.p1_ring_r >= c):
                    more = True
            self._clear_p1_device(quarantined)
            if not todo and not n_new.any():
                return deferred
            (self.online_state, ids, nums, self._p1_hist,
             self._p1_ring) = self._p1_step(
                self.oparams, self._asr_means, self._asr_vars,
                self.online_state, self._audio_ring,
                jnp.asarray(start_off), jnp.asarray(n_new),
                jnp.asarray(win_start), jnp.asarray(total_new),
                jnp.asarray(k_emit), jnp.asarray(fe_finals),
                jnp.asarray(ring_woff), jnp.asarray(consume_start),
                jnp.asarray(consume_count), jnp.asarray(finals),
                self._p1_hist, self._p1_ring)
            if todo:
                batch = ([(sid, self.slots[sid]) for sid in todo],
                         finals, ids, nums)
                if defer:
                    deferred.append(batch)
                elif self._pipeline:
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
                return deferred
        return deferred

    def shutdown(self, timeout: float = 10.0):
        """Drain and join the background lanes. Without this, daemon
        threads parked in queue.get() (or mid device fetch) get killed at
        interpreter teardown, which the TPU runtime's C++ layer can turn
        into an abort ('terminate called ...') after the process's real
        work already finished."""
        if self._vd_thread is not None:
            self._vd_queue.put(None)
            self._vd_thread.join(timeout)
            self._vd_thread = None
        if self._p1_thread is not None:
            self._p1_queue.put(None)
            self._p1_thread.join(timeout)
            self._p1_thread = None
        if self._p2_thread is not None:
            self._p2_queue.put(None)
            self._p2_thread.join(timeout)
            self._p2_thread = None
        if self._upload_pool is not None:
            self._upload_pool.shutdown(wait=True)
            self._upload_pool = None

    def _p1_collector(self):
        """Background pass-1 result lane: a single FIFO worker (per-slot
        result order preserved) fetches each dispatched batch and posts
        partial texts to the slots."""
        while True:
            batch = self._p1_queue.get()
            if batch is None:
                return
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
                        # captured-object delivery: a reclaimed slot index
                        # never receives a previous connection's partial
                        if self.slots[sid] is slot:
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
            if not slot.active:
                # a closed connection's queued segments have no reader —
                # drop them instead of spending pass-2 compute
                slot.seg_queue.clear()
                continue
            while slot.seg_queue:
                fr = slot.seg_queue.pop(0)
                slot.p2_inflight += 1
                pairs.append((sid, slot, fr))
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
            first = self._p2_queue.get()
            if first is None:
                return
            pairs = [first]
            # greedy drain a whole tick's worth: recognize_batch buckets
            # internally (chunks of <=16) and fetches ONCE for all of
            # them, so a bigger drain = fewer tunnel round-trips, not
            # bigger device programs
            while len(pairs) < max(self.capacity, 16):
                try:
                    nxt = self._p2_queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._p2_queue.put(None)   # re-post the stop signal
                    break
                pairs.append(nxt)
            settled: list = []
            try:
                self._process_segments(pairs, settled)
            except Exception:  # pragma: no cover - keep the lane alive
                import logging

                logging.getLogger("asr2pass.engine").exception(
                    "pass-2 lane failure")
                # decrement ONLY the pairs _process_segments had not
                # already settled (a partial failure otherwise
                # double-decrements and wedges reclaim at -1), and on the
                # CAPTURED slot objects: resolving self.slots[sid] here
                # could hit a reclaimed slot
                done = set(settled)
                with self._results_lock:
                    for idx, (_, slot, _) in enumerate(pairs):
                        if idx not in done:
                            slot.p2_inflight -= 1

    def _ring_feats_override(self, pairs):
        """feats_override closure for the pass-2 recognizers: segments
        whose samples still live in the device audio ring are gathered
        there (fbank+LFR+CMVN fused, ZERO re-upload — the one per-tick
        audio upload serves both passes for real now); anything stale,
        un-ranged or too long falls back to the int16 upload path.

        Freshness is re-checked AFTER the gather is dispatched: staging
        advances _abs_fed BEFORE enqueueing ring writes, so if the
        window still fits under the post-dispatch _abs_fed snapshot, no
        write that could precede the gather on the device stream can
        have overwritten it."""
        if self.mode == "online" or self.offline is None:
            return None
        fcfg = self.offline.asr.cfg.frontend
        means, vars_ = self.offline.asr.cmvn
        r = self._ring_samples
        margin = 16 * self._vad_max_new
        frames = [fr for _, _, fr in pairs]
        sids = [sid for sid, _, _ in pairs]

        def override(idxs, bucket, bb):
            from asr2pass_tpu.frontend.fbank import num_frames
            from asr2pass_tpu.runtime.streaming_frontend import (
                offline_window_samples,
                ring_frontend_device,
            )

            need = offline_window_samples(fcfg, bucket)
            if need > r - margin:
                return None
            slot_ids, offs, ns = [], [], []
            for i in idxs:
                fr = frames[i]
                sid = sids[i]
                if (fr.samp_start < 0
                        or fr.samp_end - fr.samp_start != len(fr.data)
                        or int(self._abs_fed[sid]) - fr.samp_start
                        > r - need - margin):
                    return None
                slot_ids.append(sid)
                offs.append(fr.samp_start)
                ns.append(num_frames(len(fr.data), fcfg))
            feats = ring_frontend_device(self._audio_ring, slot_ids,
                                         offs, ns, bucket, fcfg, means,
                                         vars_, batch_b=bb)
            if feats is None:
                return None
            # post-dispatch freshness verification (see docstring)
            for i in idxs:
                if (int(self._abs_fed[sids[i]]) - frames[i].samp_start
                        > r - need):
                    return None
            return feats

        return override

    def _process_segments(self, pairs, settled=None):
        """Offline-decode segments with each owner's per-connection options
        (hotwords, LM, ITN, svs lang) and post results to the slots.

        `settled` (when given) collects the pair indices whose inflight
        counter this call decremented — the caller's failure handler
        decrements only the remainder. Per-segment post-processing
        failures (punc/ITN/timestamps) are contained per pair so one bad
        segment cannot poison the whole batch."""
        from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline

        if settled is None:
            settled = []

        slots = [slot for _, slot, _ in pairs]
        segs = [fr.data for _, _, fr in pairs]
        feats_override = self._ring_feats_override(pairs)
        if isinstance(self.offline.asr, SenseVoiceOffline):
            # SenseVoice pass-2: per-item lang/itn prefix ids + hotword
            # context graphs + optional per-connection TLG rescoring
            kw = {}
            if any(s.lm_decoder is not None for s in slots):
                kw["lm_decoders"] = [s.lm_decoder for s in slots]
            outs = self.offline.asr.recognize_batch(
                segs, langs=[s.svs_lang for s in slots],
                itn_flags=[s.svs_itn for s in slots],
                contexts=[s.svs_context for s in slots],
                feats_override=feats_override, **kw)
        else:
            kw = {}
            if any(s.hw_emb is not None for s in slots):
                kw["hw_embs"] = [s.hw_emb for s in slots]
            if any(s.lm_decoder is not None for s in slots):
                kw["lm_decoders"] = [s.lm_decoder for s in slots]
            # recognize_batch itself is single-fetch now (dispatch_batch
            # queues every bucket chunk, ONE device_get for all outputs)
            # — routing that fetch through the tick's combined fetch was
            # tried and measured WORSE (159 vs 225 streams): the tick
            # then waits on pass-2 forward compute, and the lane stalls
            # on the tick instead of pipelining its next batch
            outs = self.offline.asr.recognize_batch(
                segs, feats_override=feats_override, **kw)
        for idx, ((text, merged), (sid, slot, fr)) in enumerate(
                zip(outs, pairs)):
            res = None
            try:
                stamps = ts_mod.stamps_to_ms(merged,
                                             fr.global_start / 1000.0)
                if self.punc is not None and text:
                    text = self.punc.add_punc_streaming(text,
                                                        slot.punc_cache)
                if self.models.itn is not None and slot.use_itn and text:
                    text_itn = self.models.itn.normalize(text)
                    if stamps:
                        sm = ts_mod.timestamp_smooth(text, text_itn,
                                                     stamps)
                        if sm:
                            stamps = sm
                    text = text_itn
                res = {"mode": "2pass-offline", "text": text}
                if stamps:
                    res["timestamp"] = stamps
                    res["stamp_sents"] = ts_mod.timestamp_sentence(text,
                                                                   stamps)
            except Exception:  # pragma: no cover - per-pair containment
                import logging

                logging.getLogger("asr2pass.engine").exception(
                    "pass-2 post-processing failure (slot %d)", sid)
            with self._results_lock:
                slot.p2_inflight -= 1
                settled.append(idx)
                # deliver only to the connection that queued the segment:
                # if the slot index was reclaimed (or closed) in the
                # meantime, the captured object is no longer current and
                # the transcript is dropped, never cross-delivered
                if (res is not None and self.slots[sid] is slot
                        and slot.active):
                    slot.results.append(res)
