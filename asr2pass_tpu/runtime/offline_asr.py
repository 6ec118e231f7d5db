"""Offline (pass-2) recognizer wrapper: samples -> text (+ timestamps).

Drives the offline Paraformer the way Paraformer::Forward does
(paraformer.cpp:463-589): front-end -> model -> greedy -> detokenize, with
the bicif timestamp path (TimestampOnnx + PostProcess) for timestamp
models. Features are padded to length buckets so XLA compiles a handful of
shapes regardless of VAD segment length variance (SURVEY.md §7
"recompilation control"; the reference instead sorts segments by length,
audio.cpp:1226-1239)."""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import ParaformerConfig
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.runtime.streaming_frontend import (offline_frontend,
                                                     offline_frontend_batch)
from asr2pass_tpu.text import timestamps as ts_mod
from asr2pass_tpu.text.vocab import Vocab

# feature-length buckets (LFR frames, 60 ms each): 3.8 s .. 61 s
_BUCKETS = [64, 128, 256, 512, 1024]

# batch-dimension buckets: like the length buckets these keep the set of
# compiled programs small (len_buckets x batch_buckets) — without them
# every distinct group size is a fresh XLA program (~minutes each through
# a remote-compile tunnel). 16 is the measured throughput sweet spot for
# 60 s segments on v5e (PARITY.md); larger groups split into chunks of 16.
_BATCH_BUCKETS = [1, 2, 4, 8, 16]
_MAX_BATCH = _BATCH_BUCKETS[-1]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


def _batch_bucket(n: int) -> int:
    for b in _BATCH_BUCKETS:
        if n <= b:
            return b
    return _MAX_BATCH


class ParaformerOffline:
    def __init__(self, params, cfg: ParaformerConfig, vocab: Vocab,
                 cmvn=None, lm_decoder=None):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.cmvn = cmvn if cmvn is not None else (None, None)
        # optional LM beam decoder (BeamSearch/WfstDecoder path,
        # paraformer.cpp:410-419); greedy otherwise
        self.lm_decoder = lm_decoder

    def _forward(self, feats_batch: np.ndarray, lengths: List[int],
                 hw_emb: Optional[np.ndarray] = None):
        b, t, d = feats_batch.shape
        hw = hw_mask = None
        if hw_emb is not None and "hotword" in self.params["decoder"]:
            hw = jnp.asarray(np.broadcast_to(hw_emb[None], (b,) + hw_emb.shape))
            hw_mask = jnp.ones((b, hw_emb.shape[0]), jnp.float32)
        # trained CIF fires ~1 token per 3+ LFR frames; T//2+8 slots halve
        # decoder FLOPs with ample margin
        return paraformer.apply_jit(
            self.params, self.cfg, jnp.asarray(feats_batch),
            jnp.asarray(lengths, jnp.int32), hw, hw_mask, t // 2 + 8,
        )

    def recognize_batch(self, segments: List[np.ndarray],
                        hw_emb: Optional[np.ndarray] = None
                        ) -> List[Tuple[str, List[List[float]]]]:
        """Batch of raw-sample segments -> [(text, token_timestamps_s)].

        Segments are grouped per feature bucket and run as true batches —
        the TPU equivalent of FetchDynamic+GPU batching (audio.cpp:1052-1108,
        paraformer-torch.cpp:301-420)."""
        means, vars_ = self.cmvn
        feats = offline_frontend_batch(segments, self.cfg.frontend,
                                       means, vars_)
        results: List[Optional[Tuple[str, List[List[float]]]]] = [None] * len(feats)
        # group indices by bucket
        groups = {}
        for i, f in enumerate(feats):
            if f.shape[0] == 0:
                results[i] = ("", [])
                continue
            groups.setdefault(_bucket(f.shape[0]), []).append(i)
        chunks = [(bucket, idxs[j: j + _MAX_BATCH])
                  for bucket, idxs in groups.items()
                  for j in range(0, len(idxs), _MAX_BATCH)]
        for bucket, idxs in chunks:
            bb = _batch_bucket(len(idxs))
            batch = np.zeros((bb, bucket, self.cfg.frontend.lfr_dim),
                             np.float32)
            lens = [0] * bb   # padded rows have length 0 (mask empty)
            for k, i in enumerate(idxs):
                f = feats[i]
                batch[k, : f.shape[0]] = f
                lens[k] = f.shape[0]
            out = self._forward(batch, lens, hw_emb)
            ids, counts = paraformer.greedy_ids(out)
            ids = np.asarray(ids)
            counts = np.asarray(counts)
            logits_np = None
            if self.lm_decoder is not None:
                logits_np = np.asarray(out.logits, np.float32)
            us_a_np = us_p_np = None
            if self.cfg.predictor.use_timestamp:
                # transfer once per chunk; slicing device arrays per
                # segment costs a round-trip each
                us_a_np = np.asarray(out.us_alphas)
                us_p_np = np.asarray(out.us_cif_peak)
            for k, i in enumerate(idxs):
                n = int(counts[k])
                tok_ids = [int(x) for x in ids[k, :n]]
                if self.lm_decoder is not None and n > 0:
                    rows = logits_np[k, :n]
                    rows = rows - _logsumexp_rows(rows)
                    self.lm_decoder.start_utterance()
                    lm_text = self.lm_decoder.decode(rows,
                                                     self.vocab.id2token)
                    if not self.cfg.predictor.use_timestamp:
                        results[i] = (lm_text, [])
                        continue
                if self.cfg.predictor.use_timestamp:
                    char_list = self.vocab.to_char_list(tok_ids)
                    us_alphas = us_a_np[k, : lens[k] * 3]
                    us_peak = us_p_np[k, : lens[k] * 3]
                    _, _, token_ts = ts_mod.timestamp_from_peaks(
                        us_alphas, us_peak, list(char_list))
                    text, merged = ts_mod.post_process(char_list, token_ts)
                    if self.lm_decoder is not None and n > 0:
                        text = lm_text  # LM text with CIF timestamps
                    results[i] = (text, merged)
                else:
                    results[i] = (self.vocab.to_string(tok_ids), [])
        return [r if r is not None else ("", []) for r in results]

    def recognize(self, samples: np.ndarray,
                  hw_emb: Optional[np.ndarray] = None
                  ) -> Tuple[str, List[List[float]]]:
        return self.recognize_batch([samples], hw_emb)[0]


def _logsumexp_rows(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
