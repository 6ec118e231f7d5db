"""Paraformer fine-tune step (CE + CIF quantity loss), mesh-sharded.

The reference ships no training code (SURVEY.md §0) — this is an addition:
a minimal but real fine-tuning path so deployments can adapt the pass-2
model. Loss = label-smoothed CE over the parallel decoder's logits (teacher
acoustic embeddings from CIF fires) + the standard CIF quantity loss
|sum(alphas) − target_len|. The step jits over a ("dp","tp") Mesh with the
same GSPMD param shardings as inference (parallel/sharding.py); gradients
all-reduce over dp automatically.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from asr2pass_tpu.config import ParaformerConfig
from asr2pass_tpu.models import cif, paraformer, sanm_decoder, sanm_encoder
from asr2pass_tpu.models.layers import length_mask


class TrainBatch(NamedTuple):
    feats: jnp.ndarray      # [B, T, lfr_dim]
    feat_lens: jnp.ndarray  # [B]
    targets: jnp.ndarray    # [B, U] token ids
    target_lens: jnp.ndarray  # [B]


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def loss_fn(params, cfg: ParaformerConfig, batch: TrainBatch,
            label_smoothing: float = 0.1,
            quantity_weight: float = 1.0) -> Tuple[jnp.ndarray, dict]:
    mask = length_mask(batch.feat_lens, batch.feats.shape[1])
    enc = sanm_encoder.apply(params["encoder"], batch.feats, mask,
                             d_model=cfg.encoder.output_size,
                             heads=cfg.encoder.attention_heads)
    alphas = cif.alphas_head(params["predictor"], enc, cfg.predictor, mask)
    # quantity loss: predicted token mass vs target length
    qty = jnp.abs(jnp.sum(alphas, axis=1) - batch.target_lens.astype(jnp.float32))
    # scaled-alpha CIF (training-time): rescale alphas so each utterance
    # fires exactly target_len times, giving aligned acoustic embeddings
    scale = batch.target_lens.astype(jnp.float32) / jnp.maximum(
        jnp.sum(alphas, axis=1), 1e-6)
    alphas_scaled = alphas * scale[:, None]
    ac, counts, _, _ = cif.fire(enc, alphas_scaled,
                                cfg.predictor.threshold)
    u = batch.targets.shape[1]
    ac = ac[:, :u, :]
    tmask = length_mask(batch.target_lens, u)
    logits = sanm_decoder.apply(
        params["decoder"], ac, enc, enc_mask=mask, mask=tmask,
        cfg=cfg.decoder,
    )
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(batch.targets, v)
    soft = onehot * (1 - label_smoothing) + label_smoothing / v
    ce = -jnp.sum(soft * logp, axis=-1)
    ce = jnp.sum(ce * tmask) / jnp.maximum(jnp.sum(tmask), 1.0)
    qty_loss = jnp.mean(qty)
    loss = ce + quantity_weight * qty_loss
    acc = jnp.sum((jnp.argmax(logits, -1) == batch.targets) * tmask) \
        / jnp.maximum(jnp.sum(tmask), 1.0)
    return loss, {"ce": ce, "quantity": qty_loss, "acc": acc}


def train_step(params, opt_state, batch: TrainBatch, cfg: ParaformerConfig,
               optimizer) -> Tuple[Any, Any, dict]:
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics = dict(metrics, loss=loss)
    return params, opt_state, metrics


def make_sharded_train_step(cfg: ParaformerConfig, optimizer, mesh,
                            param_sharding, data_spec):
    """jit the full step with explicit mesh shardings (dp batch, tp
    params); returns step(params, opt_state, batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_shard = TrainBatch(
        feats=data_spec, feat_lens=data_spec,
        targets=data_spec, target_lens=data_spec,
    )

    def step(params, opt_state, batch):
        return train_step(params, opt_state, batch, cfg, optimizer)

    # opt_state mirrors params structure per-leaf; let jit infer from inputs
    return jax.jit(
        step,
        in_shardings=(param_sharding, None, batch_shard),
        out_shardings=(param_sharding, None, repl),
    )
