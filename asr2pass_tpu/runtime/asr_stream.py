"""Host wrapper for one streaming-ASR stream (pass 1).

Feeds raw samples through the streaming front-end, assembles fixed
`center`-frame chunks, and drives the batched online step (here with B=1;
the engine batches many streams through the same jitted step). Role of
ParaformerOnline::Forward (paraformer-online.cpp:525-601) with the
first/middle/last-chunk special cases replaced by the dynamic emit mask in
models/paraformer_online.py.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import ParaformerConfig
from asr2pass_tpu.models import paraformer_online
from asr2pass_tpu.runtime.streaming_frontend import StreamingFrontend
from asr2pass_tpu.text.vocab import Vocab


class ParaformerOnlineStream:
    def __init__(self, params, cfg: ParaformerConfig, vocab: Vocab,
                 cmvn=None):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        means, vars_ = (cmvn if cmvn is not None else (None, None))
        self.frontend = StreamingFrontend(cfg.frontend, means, vars_)
        self.state = paraformer_online.init_state(params, cfg, 1)
        self._pending = np.zeros((0, cfg.frontend.lfr_dim), np.float32)
        self._det_vocab = vocab

    def reset(self):
        self.frontend.reset()
        self.state = paraformer_online.init_state(self.params, self.cfg, 1)
        self._pending = self._pending[:0]
        self.vocab.reset_streaming()

    def _run_chunk(self, feats: np.ndarray, is_final: bool) -> List[int]:
        center = self.cfg.chunk_size[1]
        n = feats.shape[0]
        padded = np.zeros((1, center, self.cfg.frontend.lfr_dim), np.float32)
        padded[0, :n] = feats
        self.state, ids, counts = paraformer_online.step_jit(
            self.params, self.cfg, self.state, jnp.asarray(padded),
            jnp.asarray([n], jnp.int32), jnp.asarray([is_final]),
        )
        k = int(counts[0])
        return [int(i) for i in np.asarray(ids[0, :k])]

    def accept(self, samples: np.ndarray, is_final: bool = False) -> str:
        """Feed samples; returns the new partial text for this call."""
        center = self.cfg.chunk_size[1]
        feats = self.frontend.accept(samples, is_final)
        if feats.shape[0]:
            self._pending = np.concatenate([self._pending, feats])
        ids: List[int] = []
        while self._pending.shape[0] >= center:
            ids.extend(self._run_chunk(self._pending[:center], False))
            self._pending = self._pending[center:]
        if is_final:
            ids.extend(self._run_chunk(self._pending, True))
            self._pending = self._pending[:0]
            text = self.vocab.to_string(ids, streaming=True)
            self.reset()
            return text
        return self.vocab.to_string(ids, streaming=True)
