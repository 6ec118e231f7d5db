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
from asr2pass_tpu.runtime.streaming_frontend import (
    offline_frontend,
    offline_frontend_device,
)
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


# hotword-count buckets (rows of the compiled [N, D] embedding batch);
# bounded so per-connection hotword lists don't each compile a program
_HW_BUCKETS = [4, 8, 16, 32, 64]


def _hw_bucket(n: int) -> int:
    for b in _HW_BUCKETS:
        if n <= b:
            return b
    return -(-n // _HW_BUCKETS[-1]) * _HW_BUCKETS[-1]


class ParaformerOffline:
    def __init__(self, params, cfg: ParaformerConfig, vocab: Vocab,
                 cmvn=None, lm_decoder=None, sp_mesh=None,
                 sp_axis: str = "sp", sp_threshold: int = 4096,
                 tp_mesh=None):
        # optional tensor parallelism (SURVEY §2.5 model-parallel row):
        # params sharded Megatron-style over a ("dp","tp") mesh
        # (parallel/sharding.py rules); GSPMD inserts the ICI collectives
        # from the NamedShardings alone — the forward code is unchanged.
        if tp_mesh is not None:
            from asr2pass_tpu.parallel.sharding import shard_params

            params = shard_params(params, tp_mesh)
        self.tp_mesh = tp_mesh
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.cmvn = cmvn if cmvn is not None else (None, None)
        # optional LM beam decoder (BeamSearch/WfstDecoder path,
        # paraformer.cpp:410-419); greedy otherwise
        self.lm_decoder = lm_decoder
        # optional sequence parallelism (SURVEY §5 long-context): segments
        # longer than sp_threshold LFR frames run the encoder TIME-sharded
        # over sp_mesh. Default threshold 4096 (~4 min at 60 ms/frame) is
        # MEASURED: the single-shot attention kernel covers T<=4096 at
        # ~5-6.7k audio-s/s single-chip (scripts/bench_sp.py), so sharding
        # below that only adds all-gather/halo traffic; past it the
        # single-chip falls to the online-softmax fallback and dividing T
        # over idle chips wins.
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis
        self.sp_threshold = sp_threshold

    def _sp_pad_t(self, t: int) -> int:
        n = self.sp_mesh.shape[self.sp_axis]
        return -(-t // (n * 64)) * (n * 64)

    def _forward_sp(self, feats_list, lengths):
        """Long segments through the sequence-parallel path as a TRUE
        batch (VERDICT r3 item 8 — the path decoded segment-solo before):
        all segments share one padded T (a multiple of the mesh axis), so
        one sharded forward serves the group."""
        t = max(self._sp_pad_t(f.shape[0]) for f in feats_list)
        batch = np.zeros((len(feats_list), t, feats_list[0].shape[1]),
                         np.float32)
        for k, f in enumerate(feats_list):
            batch[k, : f.shape[0]] = f
        return paraformer.apply_sp(
            self.params, self.cfg, jnp.asarray(batch), list(lengths),
            self.sp_mesh, axis=self.sp_axis, max_tokens=t // 2 + 8)

    def _forward(self, feats_batch: np.ndarray, lengths: List[int],
                 hw_batch: Optional[np.ndarray] = None,
                 hw_lens: Optional[List[int]] = None):
        b, t, d = feats_batch.shape
        hw = hw_mask = None
        if hw_batch is not None and "hotword" in self.params["decoder"]:
            hw = jnp.asarray(hw_batch)
            ar = np.arange(hw_batch.shape[1])[None, :]
            hw_mask = jnp.asarray(
                (ar < np.asarray(hw_lens)[:, None]).astype(np.float32))
        # trained CIF fires ~1 token per 3+ LFR frames; T//2+8 slots halve
        # decoder FLOPs with ample margin
        return paraformer.apply_jit(
            self.params, self.cfg, jnp.asarray(feats_batch),
            jnp.asarray(lengths, jnp.int32), hw, hw_mask, t // 2 + 8,
        )

    def recognize_batch(self, segments: List[np.ndarray],
                        hw_emb: Optional[np.ndarray] = None,
                        hw_embs: Optional[List] = None,
                        lm_decoders: Optional[List] = None,
                        feats_override=None
                        ) -> List[Tuple[str, List[List[float]]]]:
        """Batch of raw-sample segments -> [(text, token_timestamps_s)].

        Segments are grouped per feature bucket and run as true batches —
        the TPU equivalent of FetchDynamic+GPU batching (audio.cpp:1052-1108,
        paraformer-torch.cpp:301-420).

        Per-item options (the engine-batched path serves many connections
        in one batch, each with its own first-message config,
        websocket-server-2pass.cpp:424-523):
          hw_embs[i]: per-segment compiled hotword embeddings [N_i, D]
          (hw_emb is the shared-for-all shorthand); segments with and
          without hotwords never share a device batch (the hotword
          cross-attention block must be bypassed entirely when absent).
          lm_decoders[i]: per-segment LM beam decoder (per-connection WFST
          handle role); falls back to self.lm_decoder.
        """
        import jax

        pending, handles = self.dispatch_batch(
            segments, hw_emb=hw_emb, hw_embs=hw_embs,
            lm_decoders=lm_decoders, feats_override=feats_override)
        fetched = jax.device_get(tuple(handles)) if handles else ()
        return self.finish_batch(pending, fetched)

    def dispatch_batch(self, segments: List[np.ndarray],
                       hw_emb: Optional[np.ndarray] = None,
                       hw_embs: Optional[List] = None,
                       lm_decoders: Optional[List] = None,
                       feats_override=None):
        """Phase A of recognize_batch: front-end + device DISPATCH only.
        Returns (pending, handles) — `handles` is a flat list of device
        arrays whose values finish_batch() needs; callers that own a
        combined per-tick fetch (the engine's fused tick) batch them with
        every other fetch so the tunnel round-trip is paid ONCE.

        The front-end runs ON DEVICE (offline_frontend_device): raw
        samples upload once as int16 and fbank+LFR+CMVN feed the model
        without any mel fetch or feats re-upload — the old
        fetch-mel/upload-feats shape moved ~4 MB per 60 s segment over
        the tunnel and its serialized device->host mel legs stalled the
        engine tick at steady state (capacity-256 soak)."""
        from asr2pass_tpu.frontend.fbank import num_frames
        from asr2pass_tpu.frontend.lfr import lfr_len

        means, vars_ = self.cmvn
        fcfg = self.cfg.frontend
        bufs = [np.asarray(s, np.float32) for s in segments]
        ns = [num_frames(len(b), fcfg) for b in bufs]
        t_lfrs = [lfr_len(n, fcfg.lfr_m, fcfg.lfr_n) if n else 0
                  for n in ns]
        if hw_embs is None:
            hw_embs = [hw_emb] * len(bufs)

        def lm_for(i):
            if lm_decoders is not None and lm_decoders[i] is not None:
                return lm_decoders[i]
            return self.lm_decoder

        results: List[Optional[Tuple[str, List[List[float]]]]] = \
            [None] * len(bufs)
        # group indices by (feature bucket, hotword batching key); segments
        # past the SP threshold take the sequence-parallel path solo
        groups = {}
        sp_idxs = []
        for i, t in enumerate(t_lfrs):
            if t == 0:
                results[i] = ("", [])
                continue
            if self.sp_mesh is not None and t > self.sp_threshold:
                sp_idxs.append(i)
                continue
            hw = hw_embs[i]
            hw_key = 0 if hw is None else _hw_bucket(hw.shape[0])
            groups.setdefault((_bucket(t), hw_key), []).append(i)
        chunks = [(bucket, hw_key, idxs[j: j + _MAX_BATCH])
                  for (bucket, hw_key), idxs in groups.items()
                  for j in range(0, len(idxs), _MAX_BATCH)]
        # SP segments batch by padded length (one sharded forward per
        # group instead of one per segment); their feats stay host-side
        # (the time-sharded encoder takes explicit arrays)
        sp_groups = {}
        for i in sp_idxs:
            sp_groups.setdefault(self._sp_pad_t(t_lfrs[i]), []).append(i)
        for idxs in sp_groups.values():
            sp_feats = [offline_frontend(bufs[i], fcfg, means, vars_)
                        for i in idxs]
            out = self._forward_sp(sp_feats, [t_lfrs[i] for i in idxs])
            for k, i in enumerate(idxs):
                results[i] = self._postprocess_one(
                    out, k, t_lfrs[i], lm_for(i))
        records = []
        handles: list = []
        for bucket, hw_key, idxs in chunks:
            bb = _batch_bucket(len(idxs))
            lens = [0] * bb   # padded rows have length 0 (mask empty)
            hw_batch = hw_lens = None
            if hw_key:
                d_model = hw_embs[idxs[0]].shape[1]
                hw_batch = np.zeros((bb, hw_key, d_model), np.float32)
                hw_lens = [0] * bb
            for k, i in enumerate(idxs):
                lens[k] = t_lfrs[i]
                if hw_key:
                    hw = hw_embs[i]
                    hw_batch[k, : hw.shape[0]] = hw
                    hw_lens[k] = hw.shape[0]
            # feats_override(idxs, bucket, bb): the engine's pass-2
            # lane serves segments straight from the device audio ring
            # (zero re-upload); None falls back to the int16 upload path
            batch = (feats_override(idxs, bucket, bb)
                     if feats_override is not None else None)
            if batch is None:
                batch = offline_frontend_device(
                    [bufs[i] for i in idxs], [ns[i] for i in idxs],
                    bucket, fcfg, means, vars_, batch_b=bb)
            out = self._forward(batch, lens, hw_batch, hw_lens)
            ids, counts = paraformer.greedy_ids(out)
            any_lm = any(lm_for(i) is not None for i in idxs)
            hlist = [ids, counts]
            if any_lm:
                hlist.append(out.logits)
            if self.cfg.predictor.use_timestamp:
                # one transfer per chunk; slicing device arrays per
                # segment costs a round-trip each
                hlist.append(out.us_alphas)
                hlist.append(out.us_cif_peak)
            records.append({"idxs": idxs, "lens": lens, "any_lm": any_lm,
                            "off": len(handles), "n": len(hlist)})
            handles.extend(hlist)
        pending = {"records": records, "results": results,
                   "lm_for": lm_for}
        return pending, handles

    def finish_batch(self, pending, fetched
                     ) -> List[Tuple[str, List[List[float]]]]:
        """Phase B: host post-processing over the FETCHED (numpy) arrays
        of dispatch_batch's handles — greedy/LM decode, timestamps."""
        results = pending["results"]
        lm_for = pending["lm_for"]
        for rec in pending["records"]:
            idxs, lens = rec["idxs"], rec["lens"]
            vals = list(fetched[rec["off"]: rec["off"] + rec["n"]])
            ids = np.asarray(vals.pop(0))
            counts = np.asarray(vals.pop(0))
            logits_np = None
            if rec["any_lm"]:
                logits_np = np.asarray(vals.pop(0), np.float32)
            us_a_np = us_p_np = None
            if self.cfg.predictor.use_timestamp:
                us_a_np = np.asarray(vals.pop(0))
                us_p_np = np.asarray(vals.pop(0))
            for k, i in enumerate(idxs):
                n = int(counts[k])
                tok_ids = [int(x) for x in ids[k, :n]]
                lm = lm_for(i)
                lm_text = None
                if lm is not None and n > 0:
                    rows = logits_np[k, :n]
                    rows = rows - _logsumexp_rows(rows)
                    lm.start_utterance()
                    lm_text = lm.decode(rows, self.vocab.id2token)
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
                    if lm_text is not None and lm_text != text:
                        # re-align CIF timestamps to the LM-rescored text
                        # (the reference re-derives stamps through the
                        # decoder path, wfst-decoder.cpp:59-92; we reuse
                        # the ITN smoothing alignment)
                        sm = ts_mod.timestamp_smooth(text, lm_text, merged)
                        if sm:
                            merged = sm
                        text = lm_text
                    results[i] = (text, merged)
                else:
                    results[i] = (self.vocab.to_string(tok_ids), [])
        return [r if r is not None else ("", []) for r in results]

    def _postprocess_one(self, out, k: int, length: int, lm):
        """Greedy/LM + timestamp post-processing for row k of a forward
        (the SP path decodes one long segment at a time)."""
        ids, counts = paraformer.greedy_ids(out)
        ids = np.asarray(ids)
        n = int(np.asarray(counts)[k])
        tok_ids = [int(x) for x in ids[k, :n]]
        lm_text = None
        if lm is not None and n > 0:
            rows = np.asarray(out.logits, np.float32)[k, :n]
            rows = rows - _logsumexp_rows(rows)
            lm.start_utterance()
            lm_text = lm.decode(rows, self.vocab.id2token)
            if not self.cfg.predictor.use_timestamp:
                return (lm_text, [])
        if self.cfg.predictor.use_timestamp:
            char_list = self.vocab.to_char_list(tok_ids)
            us_alphas = np.asarray(out.us_alphas)[k, : length * 3]
            us_peak = np.asarray(out.us_cif_peak)[k, : length * 3]
            _, _, token_ts = ts_mod.timestamp_from_peaks(
                us_alphas, us_peak, list(char_list))
            text, merged = ts_mod.post_process(char_list, token_ts)
            if lm_text is not None and lm_text != text:
                sm = ts_mod.timestamp_smooth(text, lm_text, merged)
                if sm:
                    merged = sm
                text = lm_text
            return (text, merged)
        return (self.vocab.to_string(tok_ids), [])

    def recognize(self, samples: np.ndarray,
                  hw_emb: Optional[np.ndarray] = None
                  ) -> Tuple[str, List[List[float]]]:
        return self.recognize_batch([samples], hw_emb=hw_emb)[0]


def _logsumexp_rows(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
