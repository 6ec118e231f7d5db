"""Mesh/sharding/training tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from asr2pass_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    ParaformerConfig,
    PredictorConfig,
    paraformer_tiny,
)
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.parallel.sharding import (
    data_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)
from asr2pass_tpu.train import train as train_mod


def _tp_cfg(tp=2):
    d = 32
    return ParaformerConfig(
        encoder=EncoderConfig(input_size=560, output_size=d, num_blocks=2,
                              attention_heads=tp, linear_units=4 * d),
        decoder=DecoderConfig(num_blocks=2, attention_heads=tp,
                              linear_units=4 * d),
        predictor=PredictorConfig(idim=d),
        vocab_size=64,
    )


def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    mesh = make_mesh(8, tp=4)
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4


def test_param_sharding_rules():
    cfg = _tp_cfg()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, tp=2)
    sh = param_shardings(params, mesh)
    # column-parallel qkv, row-parallel attention out (first layer 2-D)
    assert sh["encoder"]["first"]["att"]["qkv"]["w"].spec == P(None, "tp")
    assert sh["encoder"]["first"]["att"]["out"]["w"].spec == P("tp", None)
    # stacked layers carry an unsharded leading layer axis
    assert sh["encoder"]["rest"]["att"]["qkv"]["w"].spec == P(None, None, "tp")
    assert sh["encoder"]["rest"]["ffn"]["w2"]["w"].spec == P(None, "tp", None)
    assert sh["decoder"]["blocks"]["ffn"]["w1"]["w"].spec == P(None, None, "tp")
    # vocab head sharded over tp; layernorm replicated
    assert sh["decoder"]["out"]["w"].spec == P(None, "tp")
    assert sh["encoder"]["first"]["ln1"]["g"].spec == P()


def test_sharded_forward_matches_single_device():
    cfg = _tp_cfg()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 20, 560)).astype(np.float32)
    lengths = np.full(4, 20, np.int32)
    ref = paraformer.apply(params, cfg, jnp.asarray(feats),
                           jnp.asarray(lengths))

    mesh = make_mesh(8, tp=2)
    sp = shard_params(params, mesh)
    ds = data_sharding(mesh)
    f = jax.device_put(feats, ds)
    l = jax.device_put(lengths, ds)
    out = jax.jit(lambda p, x, n: paraformer.apply(p, cfg, x, n))(sp, f, l)
    np.testing.assert_array_equal(np.asarray(out.token_num),
                                  np.asarray(ref.token_num))
    n = int(ref.token_num[0])
    np.testing.assert_allclose(np.asarray(out.logits[0, :n]),
                               np.asarray(ref.logits[0, :n]),
                               rtol=2e-3, atol=2e-3)


def test_train_step_reduces_loss():
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    optimizer = train_mod.make_optimizer(lr=3e-3)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(1)
    batch = train_mod.TrainBatch(
        feats=jnp.asarray(rng.standard_normal((2, 24, 560)), jnp.float32),
        feat_lens=jnp.asarray([24, 24], jnp.int32),
        targets=jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 6)),
                            jnp.int32),
        target_lens=jnp.asarray([6, 6], jnp.int32),
    )
    step = jax.jit(lambda p, o, b: train_mod.train_step(p, o, b, cfg,
                                                        optimizer))
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_graft_entry_smoke():
    """entry() must return a jittable fn + args (shape-check only via
    eval_shape to keep CI fast)."""
    import __graft_entry__ as ge
    import importlib
    import sys

    # entry builds paraformer_large; too big for CPU CI — instead verify
    # the dryrun path end to end on the 8-device mesh
    ge.dryrun_multichip(8)
