"""SenseVoice recognizer wrapper: pass-2-compatible multilingual CTC.

Role of the SenseVoice paths in sensevoice-small.cpp: offline forward with
language/textnorm meta ids (:596-642), greedy CTC (:323-377) or context-
graph-boosted prefix beam search (:392-440). Exposes the same
recognize/recognize_batch + dispatch_batch/finish_batch interface as
ParaformerOffline so it drops into OfflineRecognizer, TwoPassSession and
the engine's fused-fetch pass-2 lane.

Serving economics (CLAUDE.md round-trip rules): greedy runs ON DEVICE
(models/sensevoice.greedy_ids — only [B, U] ids cross the wire); beam
mode fetches the device-pruned [B, T, k] candidate set
(parallel/ctc_shard.py, tp-sharded when the CTC head is vocab-sharded)
plus the log-probs of the context graph's unit ids, force-included so
pruning can never hide a hotword from the bias. The ONE path that
fetches full [B, T, V] logits is TLG/WFST rescoring (the frame-
synchronous search consumes whole rows) — a per-connection opt-in, and
only the LM items of a batch pay it.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import SenseVoiceConfig
from asr2pass_tpu.decode.context_graph import ContextGraph
from asr2pass_tpu.models import sensevoice
from asr2pass_tpu.models.sensevoice import NUM_META
from asr2pass_tpu.runtime.streaming_frontend import offline_frontend_device
from asr2pass_tpu.text.vocab import Vocab

_BUCKETS = [64, 128, 256, 512, 1024]
_MAX_BATCH = 16          # same device-batch cap as offline_asr._MAX_BATCH
_KCAND = 64              # device first-prune width (beam mode)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


def context_unit_ids(context: Optional[ContextGraph], token2id
                     ) -> List[int]:
    """Every vocab id reachable in a context graph's trie — the id set
    force-included into the pruned beam's candidates."""
    if context is None:
        return []
    ids, stack = set(), [context.root]
    while stack:
        node = stack.pop()
        for tok, child in node.children.items():
            tid = token2id.get(tok)
            if tid is not None:
                ids.add(int(tid))
            stack.append(child)
    return sorted(ids)


class SenseVoiceOffline:
    def __init__(self, params, cfg: SenseVoiceConfig, vocab: Vocab,
                 cmvn=None, lang: str = "auto", use_itn_token: bool = True,
                 context: Optional[ContextGraph] = None, beam: int = 0,
                 lm_decoder=None, tp_mesh=None):
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
        # optional WFST/LM rescoring over the raw CTC frames — needs a
        # CTC-topology graph (tools/build_tlg.py --ctc-blank; the
        # reference drives the same frame-synchronous search for SVS,
        # sensevoice-small.cpp:442-494 + wfst-decoder.cpp:95-145). LM
        # items fetch full [T, V] logits (the decoder consumes whole
        # rows), so this is a per-connection opt-in, not the default.
        self.lm_decoder = lm_decoder

    def set_lang(self, lang: str):
        self.lang = lang

    def _meta_ids(self, n: int):
        lid = self.cfg.lid_dict.get(self.lang, self.cfg.lid_dict["auto"])
        tn = (self.cfg.textnorm_dict["withitn"] if self.use_itn_token
              else self.cfg.textnorm_dict["woitn"])
        return (np.full(n, lid, np.int32), np.full(n, tn, np.int32))

    def _ctx_for(self, contexts, i) -> Optional[ContextGraph]:
        if contexts is not None and contexts[i] is not None:
            return contexts[i]
        return self.context

    def dispatch_batch(self, segments: List[np.ndarray], hw_emb=None,
                       langs: Optional[List[Optional[str]]] = None,
                       itn_flags: Optional[List[Optional[bool]]] = None,
                       contexts: Optional[List] = None,
                       lm_decoders: Optional[List] = None,
                       feats_override=None):
        """Phase A: front-end + device DISPATCH only. Returns
        (pending, handles); `handles` are the device arrays finish_batch
        needs — the engine's fused tick batches their fetch with every
        other fetch so the tunnel round-trip is paid once.

        `hw_emb` is accepted for ParaformerOffline interface parity but
        carries no meaning here: SenseVoice hotword biasing is the
        context graph in the CTC beam (sensevoice-small.cpp:392-440),
        not NN embeddings — callers pass `contexts` (per segment) or
        construct the recognizer with `context=`.
        """
        from asr2pass_tpu.frontend.fbank import num_frames
        from asr2pass_tpu.frontend.lfr import lfr_len

        means, vars_ = self.cmvn
        fcfg = self.cfg.frontend
        bufs = [np.asarray(s, np.float32) for s in segments]
        ns = [num_frames(len(b), fcfg) for b in bufs]
        t_lfrs = [lfr_len(n, fcfg.lfr_m, fcfg.lfr_n) if n else 0
                  for n in ns]

        def lm_for(i):
            if lm_decoders is not None and lm_decoders[i] is not None:
                return lm_decoders[i]
            return self.lm_decoder

        results: List[Optional[Tuple[str, list]]] = [None] * len(bufs)
        metas: List[Optional[List[int]]] = [None] * len(bufs)
        groups = {}
        for i, t in enumerate(t_lfrs):
            if t == 0:
                results[i] = ("", [])
                continue
            groups.setdefault(_bucket(t), []).append(i)
        # batch dim rides power-of-2 buckets capped at 16 like the
        # Paraformer path (bounded XLA programs; offline_asr._MAX_BATCH)
        chunks = [(bucket, idxs[j: j + _MAX_BATCH])
                  for bucket, idxs in groups.items()
                  for j in range(0, len(idxs), _MAX_BATCH)]
        records = []
        handles: list = []
        for bucket, idxs in chunks:
            bb = 1
            while bb < len(idxs):
                bb *= 2
            lens = [0] * bb
            for k, i in enumerate(idxs):
                lens[k] = t_lfrs[i]
            # device front-end: ring-gather (engine lane, zero upload)
            # or one int16 audio upload; never a mel round-trip
            batch = (feats_override(idxs, bucket, bb)
                     if feats_override is not None else None)
            if batch is None:
                batch = offline_frontend_device(
                    [bufs[i] for i in idxs], [ns[i] for i in idxs],
                    bucket, fcfg, means, vars_, batch_b=bb)
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
                self.params, self.cfg, batch,
                jnp.asarray(lens, jnp.int32), jnp.asarray(lid),
                jnp.asarray(tn),
            )
            ids, counts, meta = sensevoice.greedy_ids(
                out, blank_id=self.cfg.blank_id)
            hlist = [ids, counts, meta, out.lengths]
            any_lm = any(lm_for(i) is not None for i in idxs)
            if any_lm:
                hlist.append(out.logits)
            beam_items = [i for i in idxs
                          if lm_for(i) is None
                          and (self.beam > 1
                               or self._ctx_for(contexts, i) is not None)]
            hw_ids: List[int] = []
            if beam_items:
                # device first-prune (per-frame candidate set) — sharded
                # over the tp mesh when the CTC head is vocab-sharded
                # (candidates exchanged via pmax/psum/all_gather
                # collectives, parallel/ctc_shard.py); only [T, k]
                # candidates cross the wire instead of [T, V] logits
                from asr2pass_tpu.parallel.ctc_shard import (
                    ctc_first_prune,
                    ctc_first_prune_gather,
                    ctc_first_prune_sharded,
                    ctc_gather_logp,
                )

                # force-include every context unit id so the top-k prune
                # can never hide a hotword token from the bias (the
                # reference biases the FULL-vocab beam,
                # ctc-prefix-decoder.cpp:280-299)
                uniq = set()
                for i in beam_items:
                    uniq.update(context_unit_ids(
                        self._ctx_for(contexts, i), self.vocab.token2id))
                hw_ids = sorted(uniq)
                padded = None
                if hw_ids:
                    # pad to a power of two: one compiled gather program
                    # per (bucket, padded-E) instead of per hotword list
                    e = 1
                    while e < len(hw_ids):
                        e *= 2
                    padded = hw_ids + [hw_ids[0]] * (e - len(hw_ids))
                v = out.logits.shape[-1]
                if (self.tp_mesh is not None
                        and v % self.tp_mesh.shape["tp"] == 0):
                    cid, clp = ctc_first_prune_sharded(
                        out.logits, self.tp_mesh, "tp", k=_KCAND)
                    hlist.append(cid)
                    hlist.append(clp)
                    if padded is not None:
                        # sharded case: the gather's re-normalization is
                        # distributed across the tp shards (GSPMD)
                        hlist.append(ctc_gather_logp(
                            out.logits, jnp.asarray(padded, jnp.int32)))
                elif padded is not None:
                    # fused: one log-softmax pass serves the prune AND
                    # the context-unit gather
                    cid, clp, hw = ctc_first_prune_gather(
                        out.logits, padded, k=_KCAND)
                    hlist.extend([cid, clp, hw])
                else:
                    cid, clp = ctc_first_prune(out.logits, k=_KCAND)
                    hlist.append(cid)
                    hlist.append(clp)
            records.append({"idxs": idxs, "beam": bool(beam_items),
                            "any_lm": any_lm, "hw_ids": hw_ids,
                            "off": len(handles), "n": len(hlist)})
            handles.extend(hlist)
        pending = {"records": records, "results": results, "metas": metas,
                   "contexts": contexts, "lm_for": lm_for}
        return pending, handles

    def finish_batch(self, pending, fetched, with_meta: bool = False):
        """Phase B: host decode over the FETCHED (numpy) arrays — greedy
        straight from the device-collapsed ids; beam items run the pruned
        prefix beam with their context graph."""
        results = pending["results"]
        metas = pending["metas"]
        contexts = pending["contexts"]
        lm_for = pending["lm_for"]
        for rec in pending["records"]:
            idxs = rec["idxs"]
            vals = list(fetched[rec["off"]: rec["off"] + rec["n"]])
            ids = np.asarray(vals.pop(0))
            counts = np.asarray(vals.pop(0))
            meta = np.asarray(vals.pop(0))
            lengths = np.asarray(vals.pop(0))
            logits_np = None
            if rec["any_lm"]:
                logits_np = np.asarray(vals.pop(0), np.float32)
            cid = clp = hw_lp = None
            if rec["beam"]:
                cid = np.asarray(vals.pop(0))
                clp = np.asarray(vals.pop(0), np.float32)
                if rec["hw_ids"]:
                    hw_lp = np.asarray(vals.pop(0), np.float32)
            for k, i in enumerate(idxs):
                ctx = self._ctx_for(contexts, i)
                lm = lm_for(i)
                if lm is not None:
                    # WFST frame-synchronous search over the raw CTC
                    # log-probs (meta rows stripped); the graph's T
                    # layer absorbs blanks/repeats
                    ln = int(lengths[k])
                    rows = logits_np[k, NUM_META:ln]
                    rows = rows - _logsumexp(rows)
                    lm.start_utterance()
                    text = lm.decode(rows, self.vocab.id2token)
                    metas[i] = [int(x) for x in meta[k]]
                    results[i] = (text, [])
                    continue
                if self.beam > 1 or ctx is not None:
                    from asr2pass_tpu.decode.ctc import (
                        ctc_prefix_beam_search_pruned,
                    )

                    ln = int(lengths[k])
                    fid = np.asarray(cid[k, NUM_META:ln])
                    flp = np.asarray(clp[k, NUM_META:ln])
                    if rec["hw_ids"]:
                        fid, flp = _merge_candidates(
                            fid, flp, rec["hw_ids"],
                            hw_lp[k, NUM_META:ln])
                    nbest = ctc_prefix_beam_search_pruned(
                        fid, flp, ln - NUM_META,
                        beam=max(self.beam, 10),
                        blank_id=self.cfg.blank_id, context=ctx,
                        id_to_token=self.vocab.id2token,
                        token2id=self.vocab.token2id)
                    tok_ids = nbest[0][0] if nbest else []
                else:
                    tok_ids = [int(x) for x in ids[k, : int(counts[k])]]
                # first NUM_META positions predict lang/emotion/event/
                # textnorm (the meta tokens CTCSearch strips,
                # sensevoice-small.cpp:323-377) — returned per segment,
                # never stashed on the (shared) recognizer
                metas[i] = [int(x) for x in meta[k]]
                results[i] = (self.vocab.to_string(tok_ids), [])
        out = [r if r is not None else ("", []) for r in results]
        if with_meta:
            return [(t, s, m) for (t, s), m in zip(out, metas)]
        return out

    def recognize_batch(self, segments: List[np.ndarray], hw_emb=None,
                        langs: Optional[List[Optional[str]]] = None,
                        itn_flags: Optional[List[Optional[bool]]] = None,
                        contexts: Optional[List] = None,
                        lm_decoders: Optional[List] = None,
                        feats_override=None,
                        with_meta: bool = False
                        ) -> List[Tuple[str, list]]:
        """langs[i]/itn_flags[i]/contexts[i] override the recognizer-level
        svs_lang / svs_itn / context per segment — the engine-batched path
        mixes connections with different first-message configs in one
        batch (the lid/textnorm prefix inputs,
        sensevoice-small.cpp:596-642). with_meta=True appends each
        segment's [lid, emotion, event, textnorm] argmax ids to the
        result tuples."""
        pending, handles = self.dispatch_batch(
            segments, hw_emb=hw_emb, langs=langs, itn_flags=itn_flags,
            contexts=contexts, lm_decoders=lm_decoders,
            feats_override=feats_override)
        fetched = jax.device_get(tuple(handles)) if handles else ()
        return self.finish_batch(pending, fetched, with_meta=with_meta)

    def recognize(self, samples: np.ndarray, hw_emb=None
                  ) -> Tuple[str, list]:
        return self.recognize_batch([samples], hw_emb)[0]


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def _merge_candidates(cid: np.ndarray, clp: np.ndarray,
                      hw_ids: List[int], hw_lp: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Append the context unit ids (+ their true logp) to each frame's
    pruned candidate set, masking entries the top-k already holds so the
    prefix beam never double-counts a token's probability mass."""
    t, k = cid.shape
    e = len(hw_ids)
    ids_arr = np.asarray(hw_ids, np.int32)
    out_ids = np.concatenate(
        [cid, np.broadcast_to(ids_arr, (t, e)).copy()], axis=1)
    extra = hw_lp[:, :e].copy()
    dup = (cid[:, :, None] == ids_arr[None, None, :]).any(axis=1)
    extra[dup] = -1e30    # dropped by the beam's low-prob gate
    out_lp = np.concatenate([clp, extra], axis=1)
    return out_ids, out_lp
