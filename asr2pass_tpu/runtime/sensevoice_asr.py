"""SenseVoice recognizer wrapper: pass-2-compatible multilingual CTC.

Role of the SenseVoice paths in sensevoice-small.cpp: offline forward with
language/textnorm meta ids (:596-642), greedy CTC (:323-377) or context-
graph-boosted prefix beam search (:392-440). Exposes the same
recognize/recognize_batch interface as ParaformerOffline so it drops into
OfflineRecognizer and TwoPassSession as the pass-2 model.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import SenseVoiceConfig
from asr2pass_tpu.decode.context_graph import ContextGraph
from asr2pass_tpu.decode.ctc import ctc_greedy, ctc_prefix_beam_search
from asr2pass_tpu.models import sensevoice
from asr2pass_tpu.models.sensevoice import NUM_META
from asr2pass_tpu.runtime.streaming_frontend import offline_frontend_batch
from asr2pass_tpu.text.vocab import Vocab

_BUCKETS = [64, 128, 256, 512, 1024]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


class SenseVoiceOffline:
    def __init__(self, params, cfg: SenseVoiceConfig, vocab: Vocab,
                 cmvn=None, lang: str = "auto", use_itn_token: bool = True,
                 context: Optional[ContextGraph] = None, beam: int = 0,
                 tp_mesh=None):
        # Megatron-sharded params over a ("dp","tp") mesh when given —
        # the north-star pod-scale SenseVoice pass-2 (BASELINE config 5);
        # GSPMD derives the collectives from the shardings
        if tp_mesh is not None:
            from asr2pass_tpu.parallel.sharding import shard_params

            params = shard_params(params, tp_mesh)
        self.tp_mesh = tp_mesh
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.cmvn = cmvn if cmvn is not None else (None, None)
        self.lang = lang
        self.use_itn_token = use_itn_token
        self.context = context
        self.beam = beam

    def set_lang(self, lang: str):
        self.lang = lang

    def _meta_ids(self, n: int):
        lid = self.cfg.lid_dict.get(self.lang, self.cfg.lid_dict["auto"])
        tn = (self.cfg.textnorm_dict["withitn"] if self.use_itn_token
              else self.cfg.textnorm_dict["woitn"])
        return (np.full(n, lid, np.int32), np.full(n, tn, np.int32))

    def _decode(self, logits: np.ndarray, length: int) -> List[int]:
        if self.beam > 1 or self.context is not None:
            logp = logits[:length] - _logsumexp(logits[:length])
            nbest = ctc_prefix_beam_search(
                logp[NUM_META:], length - NUM_META,
                beam=max(self.beam, 10), blank_id=self.cfg.blank_id,
                context=self.context,
                id_to_token=self.vocab.id2token,
            )
            return nbest[0][0] if nbest else []
        ids, _ = ctc_greedy(logits, length, blank_id=self.cfg.blank_id,
                            skip_first=NUM_META)
        return ids

    def recognize_batch(self, segments: List[np.ndarray], hw_emb=None,
                        langs: Optional[List[Optional[str]]] = None,
                        itn_flags: Optional[List[Optional[bool]]] = None
                        ) -> List[Tuple[str, list]]:
        """langs[i]/itn_flags[i] override the recognizer-level svs_lang /
        svs_itn per segment — the engine-batched path mixes connections
        with different first-message configs in one batch (the lid/textnorm
        prefix inputs, sensevoice-small.cpp:596-642)."""
        means, vars_ = self.cmvn
        feats = offline_frontend_batch(segments, self.cfg.frontend,
                                       means, vars_)
        results: List[Optional[Tuple[str, list]]] = [None] * len(feats)
        groups = {}
        for i, f in enumerate(feats):
            if f.shape[0] == 0:
                results[i] = ("", [])
                continue
            groups.setdefault(_bucket(f.shape[0]), []).append(i)
        # batch dim rides power-of-2 buckets capped at 16 like the
        # Paraformer path (bounded XLA programs; offline_asr._MAX_BATCH)
        chunks = [(bucket, idxs[j: j + 16])
                  for bucket, idxs in groups.items()
                  for j in range(0, len(idxs), 16)]
        for bucket, idxs in chunks:
            bb = 1
            while bb < len(idxs):
                bb *= 2
            batch = np.zeros((bb, bucket, self.cfg.frontend.lfr_dim),
                             np.float32)
            lens = [0] * bb
            for k, i in enumerate(idxs):
                batch[k, : feats[i].shape[0]] = feats[i]
                lens[k] = feats[i].shape[0]
            lid, tn = self._meta_ids(bb)
            for k, i in enumerate(idxs):
                if langs is not None and langs[i] is not None:
                    lid[k] = self.cfg.lid_dict.get(
                        langs[i], self.cfg.lid_dict["auto"])
                if itn_flags is not None and itn_flags[i] is not None:
                    tn[k] = (self.cfg.textnorm_dict["withitn"]
                             if itn_flags[i]
                             else self.cfg.textnorm_dict["woitn"])
            out = sensevoice.apply_jit(
                self.params, self.cfg, jnp.asarray(batch),
                jnp.asarray(lens, jnp.int32), jnp.asarray(lid),
                jnp.asarray(tn),
            )
            if self.beam > 1 or self.context is not None:
                # beam mode: the first-prune (per-frame candidate set)
                # runs ON DEVICE — sharded over the tp mesh when the CTC
                # head is vocab-sharded (candidates exchanged via
                # pmax/psum/all_gather collectives,
                # parallel/ctc_shard.py) — and only [T, k] candidates
                # cross the wire instead of [T, V] logits
                import jax as _jax

                from asr2pass_tpu.decode.ctc import (
                    ctc_prefix_beam_search_pruned,
                )
                from asr2pass_tpu.parallel.ctc_shard import (
                    ctc_first_prune,
                    ctc_first_prune_sharded,
                )

                kcand = 64
                v = out.logits.shape[-1]
                if (self.tp_mesh is not None
                        and v % self.tp_mesh.shape["tp"] == 0):
                    cid, clp = ctc_first_prune_sharded(
                        out.logits, self.tp_mesh, "tp", k=kcand)
                else:
                    cid, clp = ctc_first_prune(out.logits, k=kcand)
                meta_dev = jnp.argmax(out.logits[:, :NUM_META], -1)
                cid, clp, meta, lengths = _jax.device_get(
                    (cid, clp, meta_dev, out.lengths))
                for k, i in enumerate(idxs):
                    ln = int(lengths[k])
                    nbest = ctc_prefix_beam_search_pruned(
                        np.asarray(cid[k, NUM_META:ln]),
                        np.asarray(clp[k, NUM_META:ln], np.float32),
                        ln - NUM_META, beam=max(self.beam, 10),
                        blank_id=self.cfg.blank_id, context=self.context,
                        id_to_token=self.vocab.id2token)
                    ids = nbest[0][0] if nbest else []
                    self.last_meta = [int(x) for x in meta[k]]
                    results[i] = (self.vocab.to_string(ids), [])
                continue
            logits = np.asarray(out.logits)
            lengths = np.asarray(out.lengths)
            for k, i in enumerate(idxs):
                ids = self._decode(logits[k], int(lengths[k]))
                text = self.vocab.to_string(ids)
                # first NUM_META positions predict lang/emotion/event/
                # textnorm (the meta tokens CTCSearch strips,
                # sensevoice-small.cpp:323-377)
                self.last_meta = [int(x) for x in
                                  np.argmax(logits[k, :NUM_META], -1)]
                results[i] = (text, [])
        return [r if r is not None else ("", []) for r in results]

    def recognize(self, samples: np.ndarray, hw_emb=None
                  ) -> Tuple[str, list]:
        return self.recognize_batch([samples], hw_emb)[0]


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
