"""Whole-file offline pipeline e2e: VAD cut -> timestamp model -> punc ->
ITN -> sentence records; and the SenseVoice 2pass session."""
import dataclasses

import jax
import numpy as np
import pytest

from asr2pass_tpu.config import (
    PredictorConfig,
    VadConfig,
    paraformer_tiny,
    punc_tiny,
    sensevoice_tiny,
)
from asr2pass_tpu.models import ct_transformer, fsmn_vad, paraformer, sensevoice
from asr2pass_tpu.runtime.offline_api import OfflineRecognizer
from asr2pass_tpu.runtime.offline_asr import ParaformerOffline
from asr2pass_tpu.runtime.punc import Punctuator
from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline
from asr2pass_tpu.runtime.two_pass import TwoPassSession
from asr2pass_tpu.text.itn import ChineseITN
from asr2pass_tpu.text.punc_tokenizer import PuncTokenizer
from asr2pass_tpu.text.vocab import make_test_vocab


def _timestamp_cfg():
    cfg = paraformer_tiny()
    return dataclasses.replace(
        cfg, predictor=dataclasses.replace(cfg.predictor,
                                           use_timestamp=True))


def test_offline_pipeline_with_timestamps_punc_itn():
    cfg = _timestamp_cfg()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    asr = ParaformerOffline(params, cfg, vocab)
    pcfg = punc_tiny(300)
    punc = Punctuator(
        ct_transformer.init(jax.random.PRNGKey(1), pcfg), pcfg,
        PuncTokenizer(["<blank>", "<unk>"]
                      + [chr(0x4E00 + i) for i in range(200)]))
    vcfg = VadConfig()
    rec = OfflineRecognizer(
        asr,
        vad_params=fsmn_vad.init(jax.random.PRNGKey(2), vcfg),
        vad_cfg=vcfg, punc=punc, itn=ChineseITN(),
    )
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(48000) * 0.1).astype(np.float32)
    res = rec.transcribe(wave)
    assert res.snippet_time == 3.0
    assert len(res.text) > 0
    assert len(res.segments) >= 1
    # timestamp model produced per-token [b,e] ms pairs
    assert len(res.timestamps) > 0
    for b, e in res.timestamps:
        assert 0 <= b <= e <= 4000
    # sentence records align with the punctuated text
    assert len(res.stamp_sents) >= 1
    assert all("text_seg" in s and "ts_list" in s for s in res.stamp_sents)


def test_two_pass_with_sensevoice_pass2():
    """SVS as the pass-2 model inside the 2pass session (MODEL_SVS path of
    FunTpassInferBuffer, funasrruntime.cpp:583-587)."""
    from tests.test_two_pass import FakeVad

    pcfg = paraformer_tiny()
    pparams = paraformer.init(jax.random.PRNGKey(0), pcfg)
    scfg = sensevoice_tiny()
    sparams = sensevoice.init(jax.random.PRNGKey(1), scfg)
    from asr2pass_tpu.runtime.asr_stream import ParaformerOnlineStream

    online = ParaformerOnlineStream(pparams, pcfg,
                                    make_test_vocab(pcfg.vocab_size))
    svs = SenseVoiceOffline(sparams, scfg, make_test_vocab(scfg.vocab_size),
                            lang="zh")
    vad = FakeVad({0: [[100, -1]], 2: [[-1, 1900]]})
    sess = TwoPassSession(vad, online, svs, mode="2pass")
    finals = ""
    partials = ""
    for i in range(3):
        res = sess.feed(
            np.random.default_rng(i).standard_normal(16000)
            .astype(np.float32) * 0.1,
            is_final=(i == 2),
        )
        finals += res.final_text
        partials += res.partial
    assert isinstance(finals, str)
    assert len(partials) > 0
