"""Hotword embedding compiler (the model_eb equivalent).

Role of Paraformer::CompileHotwordEmbedding (paraformer.cpp:592-693): each
hotword is tokenized to AM-unit ids (chars for Chinese; seg-dict/BPE or
<unk> for English words), padded to max length 10, run through an
embedding+LSTM, and the output row at the word's last position becomes its
[D] embedding; the matrix of all hotwords conditions the decoder's bias
cross-attention (sanm_decoder hotword block). A learned null row is always
prepended so the bias attention has a no-op target when no hotword fires.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import HotwordConfig
from asr2pass_tpu.models.layers import (
    embedding,
    embedding_init,
    lstm_apply,
    lstm_init,
)


def init(key, cfg: HotwordConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": embedding_init(k1, cfg.vocab_size, cfg.embed_dim),
        "lstm": lstm_init(k2, cfg.embed_dim, cfg.hidden_dim),
        "null": jax.random.normal(k3, (cfg.hidden_dim,), jnp.float32) * 0.02,
    }


def tokenize_hotword(word: str, vocab, seg_dict=None,
                     max_len: int = 10) -> List[int]:
    """Hotword -> AM unit ids: per-char for CJK; seg-dict BPE pieces (or
    whole-token / <unk>) for latin words (paraformer.cpp:602-640)."""
    ids: List[int] = []
    latin = ""

    def flush_latin():
        nonlocal latin
        if not latin:
            return
        if seg_dict is not None:
            for piece in seg_dict.get_tokens(latin):
                ids.append(vocab.token2id.get(piece,
                                              vocab.token2id.get("<unk>", 0)))
        else:
            ids.append(vocab.token2id.get(latin,
                                          vocab.token2id.get("<unk>", 0)))
        latin = ""

    for ch in word:
        if ord(ch) < 128:
            if ch.isspace():
                flush_latin()
            else:
                latin += ch
        else:
            flush_latin()
            ids.append(vocab.token2id.get(ch,
                                          vocab.token2id.get("<unk>", 0)))
    flush_latin()
    return ids[:max_len]


def compile_hotwords(params, cfg: HotwordConfig, words: List[str], vocab,
                     seg_dict=None) -> Optional[np.ndarray]:
    """[N hotwords] -> [N+1, D] embeddings (row 0 = null)."""
    if not words:
        return None
    # converted model_eb checkpoints carry no learned null row; the
    # reference derives it by running the compiler on a single <s>-token
    # entry (id 1, length 1) IN the hotword batch (paraformer.cpp:
    # 645-649) — same here, as row 0, so the whole compile stays ONE
    # device dispatch. Row position is irrelevant: the bias
    # cross-attention has no positional encoding over hotword rows.
    derive_null = "null" not in params
    n = len(words) + (1 if derive_null else 0)
    ids = np.zeros((n, cfg.max_hotword_len), np.int32)
    lens = np.zeros(n, np.int32)
    off = 0
    if derive_null:
        ids[0, 0] = 1
        lens[0] = 1
        off = 1
    for i, w in enumerate(words):
        toks = tokenize_hotword(w, vocab, seg_dict, cfg.max_hotword_len)
        if not toks:
            toks = [0]
        ids[off + i, : len(toks)] = toks
        lens[off + i] = len(toks)
    x = embedding(params["embed"], jnp.asarray(ids))
    hs = lstm_apply(params["lstm"], x)          # [N, L, H]
    rows = jnp.take_along_axis(
        hs, jnp.asarray(lens - 1)[:, None, None].astype(jnp.int32)
        .repeat(hs.shape[-1], axis=-1), axis=1
    )[:, 0, :]
    if derive_null:
        out = rows
    else:
        out = jnp.concatenate([params["null"][None, :], rows], axis=0)
    return np.asarray(out)


class SegDict:
    """English word -> BPE token list (seg_dict TSV,
    seg_dict.cpp:39-47 role)."""

    def __init__(self, path: Optional[str] = None):
        self.map = {}
        if path:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) == 2:
                        self.map[parts[0]] = parts[1].split()

    def get_tokens(self, word: str) -> List[str]:
        return self.map.get(word.lower(), [word.lower()])
