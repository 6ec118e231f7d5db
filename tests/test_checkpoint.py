"""Train checkpoint save/restore resume-equivalence test."""
import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import paraformer_tiny
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.train import train as train_mod
from asr2pass_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


def _batch(seed=0):
    cfg = paraformer_tiny()
    rng = np.random.default_rng(seed)
    return train_mod.TrainBatch(
        feats=jnp.asarray(rng.standard_normal((2, 24, 560)), jnp.float32),
        feat_lens=jnp.asarray([24, 24], jnp.int32),
        targets=jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 6)),
                            jnp.int32),
        target_lens=jnp.asarray([6, 6], jnp.int32),
    )


def test_checkpoint_resume_equivalence(tmp_path):
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    optimizer = train_mod.make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(lambda p, o, b: train_mod.train_step(p, o, b, cfg,
                                                        optimizer))
    # two steps, checkpoint after the first
    params1, opt1, _ = step(params, opt_state, _batch(0))
    save_checkpoint(str(tmp_path / "ck"), params1, opt1, step=1)
    params2, opt2, m2 = step(params1, opt1, _batch(1))

    rp, ro, rstep = restore_checkpoint(str(tmp_path / "ck"), optimizer)
    assert rstep == 1
    params2b, opt2b, m2b = step(rp, ro, _batch(1))
    np.testing.assert_allclose(float(m2["loss"]), float(m2b["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(params2b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
