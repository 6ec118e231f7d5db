import time, numpy as np, jax.numpy as jnp, jax
from asr2pass_tpu.config import (VadConfig, paraformer_large, paraformer_large_online)
from asr2pass_tpu.models import fsmn_vad, paraformer
from asr2pass_tpu.runtime.engine import StreamEngine
from asr2pass_tpu.server.engine import ServerModels
from asr2pass_tpu.text.vocab import make_test_vocab
from asr2pass_tpu.utils import cast_floats

acfg = paraformer_large(); ocfg = paraformer_large_online()
init_a = jax.jit(lambda k: cast_floats(paraformer.init(k, acfg), jnp.bfloat16))
init_o = jax.jit(lambda k: cast_floats(paraformer.init(k, ocfg), jnp.bfloat16))
models = ServerModels(
    asr_params=init_a(jax.random.PRNGKey(0)), asr_cfg=acfg,
    vocab=make_test_vocab(acfg.vocab_size),
    online_params=init_o(jax.random.PRNGKey(1)), online_cfg=ocfg,
    vad_params=fsmn_vad.init(jax.random.PRNGKey(2), VadConfig()),
    vad_cfg=VadConfig(),
)
s = 128
eng = StreamEngine(models, capacity=s)
eng.warmup()
sids = [eng.open() for _ in range(s)]
rng = np.random.default_rng(0)
n_tick = 9600
T = {"vad": 0.0, "asr": 0.0, "p2": 0.0}
def stepped():
    t0 = time.perf_counter(); eng._vad_and_split()
    t1 = time.perf_counter(); eng._asr_step()
    t2 = time.perf_counter(); eng._pass2()
    t3 = time.perf_counter()
    return t1-t0, t2-t1, t3-t2
for k in range(24):
    x = rng.standard_normal((s, n_tick)).astype(np.float32) * 0.05
    if k % 8 < 5: x *= 6.0
    for j, sid in enumerate(sids): eng.feed(sid, x[j])
    a,b,c = stepped()
    if k >= 4: T["vad"] += a; T["asr"] += b; T["p2"] += c
n = 20
print({k: round(v/n*1000,1) for k,v in T.items()}, "ms/tick at", s, "streams")
