"""Per-stream VAD pipeline: streaming front-end -> FSMN NN -> state machine.

Role of FsmnVadOnline / FsmnVad::Infer (fsmn-vad-online.cpp:134-151,
fsmn-vad.cpp:240-256). NN chunks are padded to frame buckets and stepped
through a jitted cache-carrying forward; the decision automaton runs on
host. The offline variant streams 1 s windows through the same path, which
is exactly how the reference segments long audio (CutSplit,
audio.cpp:1172-1240).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import VadConfig
from asr2pass_tpu.models import fsmn_vad
from asr2pass_tpu.runtime.streaming_frontend import StreamingFrontend
from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions

_BUCKET = 25


@functools.partial(jax.jit, static_argnums=())
def _nn_step(params, feats, caches, valid_len):
    return fsmn_vad.apply(params, feats, caches, valid_len)


class FsmnVadStream:
    """One stream's VAD state; `accept` returns newly decided segments
    in ms ([s,e] / [s,-1] / [-1,e] online)."""

    def __init__(self, params, cfg: VadConfig, cmvn=None, online: bool = True,
                 max_end_sil: Optional[int] = None,
                 max_single_segment: Optional[int] = None,
                 speech_noise_thres: Optional[float] = None):
        self.params = params
        self.cfg = cfg
        self.online = online
        means, vars_ = (cmvn if cmvn is not None else (None, None))
        self.frontend = StreamingFrontend(cfg.frontend, means, vars_)
        self.caches = fsmn_vad.init_caches(cfg, 1)
        opts = VadOptions(
            sample_rate=cfg.sample_rate,
            max_end_silence_time=cfg.max_end_silence_time,
            max_start_silence_time=cfg.max_start_silence_time,
            window_size_ms=cfg.window_size_ms,
            sil_to_speech_time_thres=cfg.sil_to_speech_time_thres,
            speech_to_sil_time_thres=cfg.speech_to_sil_time_thres,
            speech_2_noise_ratio=cfg.speech_2_noise_ratio,
            do_extend=cfg.do_extend,
            lookback_time_start_point=cfg.lookback_time_start_point,
            lookahead_time_end_point=cfg.lookahead_time_end_point,
            max_single_segment_time=cfg.max_single_segment_time,
            snr_thres=cfg.snr_thres,
            decibel_thres=cfg.decibel_thres,
            speech_noise_thres=cfg.speech_noise_thres,
            sil_pdf_ids=tuple(cfg.sil_pdf_ids),
            frame_in_ms=cfg.frame_in_ms,
            frame_length_ms=cfg.frame_length_ms,
        )
        self.sm = E2EVadStateMachine(opts)
        self.max_end_sil = (max_end_sil if max_end_sil is not None
                            else cfg.max_end_silence_time)
        self.max_single_segment = (max_single_segment
                                   if max_single_segment is not None
                                   else cfg.max_single_segment_time)
        self.speech_noise_thres = (speech_noise_thres
                                   if speech_noise_thres is not None
                                   else cfg.speech_noise_thres)

    def set_config(self, max_end_sil: Optional[int] = None,
                   max_single_segment: Optional[int] = None):
        """SetConfig role (vad_tail_sil / vad_max_len request overrides)."""
        if max_end_sil is not None:
            self.max_end_sil = max_end_sil
        if max_single_segment is not None:
            self.max_single_segment = max_single_segment

    def reset(self):
        self.frontend.reset()
        self.caches = fsmn_vad.init_caches(self.cfg, 1)
        self.sm._all_reset()

    def accept(self, samples: np.ndarray, is_final: bool = False
               ) -> List[List[int]]:
        feats = self.frontend.accept(samples, is_final)
        probs = np.zeros((0, self.cfg.output_dim), np.float32)
        if feats.shape[0] > 0:
            t = feats.shape[0]
            bucket = -(-t // _BUCKET) * _BUCKET
            padded = np.zeros((1, bucket, feats.shape[1]), np.float32)
            padded[0, :t] = feats
            p, self.caches = _nn_step(self.params, jnp.asarray(padded),
                                      self.caches, jnp.asarray([t]))
            probs = np.asarray(p[0, :t])
        if probs.shape[0] == 0 and not is_final:
            return []
        segs = self.sm(
            probs, samples, is_final=is_final, online=self.online,
            max_end_sil=self.max_end_sil,
            max_single_segment_time=self.max_single_segment,
            speech_noise_thres=self.speech_noise_thres,
        )
        if is_final:
            self.reset()
        return segs


def vad_segments_offline(params, cfg: VadConfig, samples, cmvn=None,
                         window_s: float = 1.0, **kw) -> List[List[int]]:
    """Offline long-audio segmentation: stream fixed windows through an
    online VAD (CutSplit role, audio.cpp:1183-1196) and join the
    [s,-1]/[-1,e] events into closed [s,e] segments."""
    stream = FsmnVadStream(params, cfg, cmvn=cmvn, online=True, **kw)
    samples = np.asarray(samples, np.float32)
    step = int(cfg.sample_rate * window_s)
    events: List[List[int]] = []
    n = len(samples)
    off = 0
    while off < n:
        chunk = samples[off: off + step]
        is_final = off + step >= n
        events.extend(stream.accept(chunk, is_final))
        off += step
    # merge events into closed segments
    out, start = [], -1
    for s, e in events:
        if s != -1:
            start = s
        if e != -1 and start != -1:
            out.append([start, e])
            start = -1
    return out
