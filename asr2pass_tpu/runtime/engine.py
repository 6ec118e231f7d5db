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

from dataclasses import dataclass, field
from typing import Any, List

import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.models import fsmn_vad, paraformer_online
from asr2pass_tpu.runtime.audio_splitter import TwoPassSplitter
from asr2pass_tpu.runtime.streaming_frontend import (StreamingFrontend,
                                                     batched_fbank)
from asr2pass_tpu.runtime.vad_stream import _nn_step
from asr2pass_tpu.text import timestamps as ts_mod
from asr2pass_tpu.text.vocab import Vocab
from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions

_VAD_BUCKET = 72   # VAD feature rows per tick (64 frames staged + LFR/residual carry)


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


class StreamEngine:
    def __init__(self, models, capacity: int = 64, mode: str = "2pass"):
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

    def warmup(self):
        """Compile the batched VAD + ASR steps before serving traffic
        (first-compile is minutes on remote-compile TPU backends)."""
        m = self.models
        import jax.numpy as jnp

        vdim = m.vad_cfg.input_dim
        _nn_step(m.vad_params,
                 jnp.zeros((self.capacity, _VAD_BUCKET, vdim), jnp.float32),
                 self.vad_caches,
                 jnp.zeros((self.capacity,), jnp.int32))
        paraformer_online.step_jit(
            self.oparams, self.ocfg, self.online_state,
            jnp.zeros((self.capacity, self.center, self.lfr_dim),
                      jnp.float32),
            jnp.zeros((self.capacity,), jnp.int32),
            jnp.zeros((self.capacity,), bool))

    # -- stream lifecycle ------------------------------------------------
    def open(self) -> int:
        for sid, slot in enumerate(self.slots):
            if not slot.active:
                self._reset_slot(sid)
                slot = self.slots[sid]
                slot.active = True
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

    def close(self, sid: int):
        self.slots[sid].active = False

    def feed(self, sid: int, samples: np.ndarray, is_final: bool = False):
        self.slots[sid].audio_in.append(
            (np.asarray(samples, np.float32), is_final))

    def poll(self, sid: int) -> List[dict]:
        out = self.slots[sid].results
        self.slots[sid].results = []
        return out

    # -- the batched tick ------------------------------------------------
    def step(self):
        self._vad_and_split()
        self._asr_step()
        self._pass2()

    def _vad_and_split(self):
        m = self.models
        vdim = m.vad_cfg.input_dim
        batch_feats = np.zeros((self.capacity, _VAD_BUCKET, vdim), np.float32)
        valid = np.zeros(self.capacity, np.int32)
        # stage every slot's VAD front-end, run ONE batched device fbank —
        # per-slot dispatches are a network round-trip each on a remote-
        # execution backend and would dominate the tick
        staged = []  # (sid, samples, is_final, buf, n_frames)
        # consume at most one VAD bucket of audio per slot per step —
        # a burst-feeding client (whole file then is_speaking:false) must
        # not overflow the fixed [capacity, _VAD_BUCKET] feature batch;
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
            return
        mels = batched_fbank([s[3] for s in staged], [s[4] for s in staged],
                             m.vad_cfg.frontend)
        work = []  # (sid, samples, is_final, n_vad_rows)
        for (sid, samples, is_final, _, _), mel in zip(staged, mels):
            slot = self.slots[sid]
            feats = slot.vad_frontend.commit(mel, is_final)
            n = min(feats.shape[0], _VAD_BUCKET)
            batch_feats[sid, :n] = feats[:n]
            valid[sid] = n
            work.append((sid, samples, is_final, n))
        probs, self.vad_caches = _nn_step(
            m.vad_params, jnp.asarray(batch_feats), self.vad_caches,
            jnp.asarray(valid))
        probs = np.asarray(probs)
        # VAD decisions + 2pass split per slot (host, O(frames)); collect
        # the online frames into per-slot groups split at final flags so
        # the ASR front-ends batch the same way
        groups = {}  # sid -> [(data, is_final), ...]
        for sid, samples, is_final, n in work:
            slot = self.slots[sid]
            events = slot.sm(
                probs[sid, :n], samples, is_final=is_final, online=True,
                max_end_sil=m.vad_cfg.max_end_silence_time,
                max_single_segment_time=m.vad_cfg.max_single_segment_time,
                speech_noise_thres=m.vad_cfg.speech_noise_thres,
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
            ids = np.asarray(ids)
            nums = np.asarray(nums)
            for sid in todo:
                slot = self.slots[sid]
                k = int(nums[sid])
                if k:
                    text = slot.vocab.to_string(
                        [int(x) for x in ids[sid, :k]], streaming=True)
                    if text:
                        slot.results.append(
                            {"mode": "2pass-online" if self.mode == "2pass"
                             else "online", "text": text})
                if finals[sid]:
                    slot.asr_frontend.reset()
                    slot.vocab.reset_streaming()
            if not more:
                return

    def _pass2(self):
        if self.offline is None:
            return
        batch = []
        owners = []
        for sid, slot in enumerate(self.slots):
            while slot.seg_queue:
                fr = slot.seg_queue.pop(0)
                batch.append(fr)
                owners.append(sid)
        if not batch:
            return
        outs = self.offline.asr.recognize_batch([f.data for f in batch])
        for (text, merged), fr, sid in zip(outs, batch, owners):
            slot = self.slots[sid]
            stamps = ts_mod.stamps_to_ms(merged, fr.global_start / 1000.0)
            if self.punc is not None and text:
                text = self.punc.add_punc_streaming(text, slot.punc_cache)
            if self.models.itn is not None and text:
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
            slot.results.append(res)
