"""Tooling tests: WER scorer semantics, quality filters."""
import numpy as np

from asr2pass_tpu.tools.compute_wer import (
    WerStats,
    align,
    score_pair,
    tokenize,
)
from asr2pass_tpu.tools.quality import (
    clipping_ratio,
    estimate_snr,
    passes_quality,
)


def test_tokenize_mixed():
    assert tokenize("你好 hello WORLD") == ["你", "好", "hello", "world"]
    assert tokenize("<noise> 你好") == ["你", "好"]
    assert tokenize("it's a-b") == ["it's", "a-b"]
    assert tokenize("你好，世界。") == ["你", "好", "世", "界"]


def test_score_pair_counts():
    stats, line = score_pair("你好世界", "你坏世界了")
    assert line["sub"] == 1      # 好->坏
    assert line["ins"] == 1      # 了
    assert line["del"] == 0
    assert abs(line["wer"] - 2 / 4) < 1e-9


def test_score_accumulates():
    stats = WerStats()
    stats, _ = score_pair("你好", "你好", stats)
    stats, _ = score_pair("天气", "天七", stats)
    assert stats.sentences == 2
    assert stats.ref_len == 4
    assert stats.errors == 1
    assert abs(stats.wer - 0.25) < 1e-9


def test_align_ops():
    ops, dist = align(["a", "b", "c"], ["a", "c"])
    assert dist == 1
    assert ops.count(2) == 1


def test_snr_separates_clean_and_noisy():
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000
    tone = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    # speech-like bursts over near-silence
    clean = tone * (np.repeat(rng.random(20) > 0.5, 1600)).astype(np.float32)
    clean += rng.standard_normal(32000).astype(np.float32) * 1e-4
    noisy = clean + rng.standard_normal(32000).astype(np.float32) * 0.5
    assert estimate_snr(clean) > estimate_snr(noisy)
    assert estimate_snr(clean) > 30


def test_clipping_detector():
    x = np.zeros(1000, np.float32)
    assert clipping_ratio(x) == 0.0
    x[:100] = 1.0
    assert clipping_ratio(x) == 0.1
    assert not passes_quality(x)


def test_segment_filter_cross_model_gate():
    """Two-model cross-check: segments kept only when the second model's
    transcript agrees within ins+del<2 / CER<=30%
    (run_seg_asr_filter.sh:104-116 gates)."""
    import numpy as np

    from asr2pass_tpu.tools.segment_filter import filter_segments

    segs = [(0, 1000), (1200, 2400), (2600, 3600)]

    class _Res:
        segments = segs

    class _Asr:
        def __init__(self, texts):
            self.texts = texts

        def recognize_batch(self, seg_audio):
            assert len(seg_audio) == len(self.texts)
            return [(t, []) for t in self.texts]

    class _Rec:
        def __init__(self, texts):
            self.asr = _Asr(texts)

        def transcribe(self, wave):
            return _Res()

    primary = _Rec(["你好世界", "完全不同的句子", "再见了"])
    cross = _Rec(["你好世界", "某个别的东西啊", "再见了"])
    wave = np.zeros(16000 * 4, np.float32)
    kept = filter_segments(primary, wave, 16000, cross_recognizer=cross)
    kept_texts = [t for _, _, t, _ in kept]
    assert kept_texts == ["你好世界", "再见了"]
    # agreeing-with-typo case passes the 30% CER gate
    primary2 = _Rec(["你好世界啊"])

    class _Res1:
        segments = [(0, 1000)]

    primary2.transcribe = lambda wave: _Res1()
    primary2.asr.texts = ["你好世界啊"]
    cross2 = _Rec(["你好世界的"])
    cross2.asr.recognize_batch = lambda sa: [("你好世界的", [])]
    kept2 = filter_segments(primary2, wave, 16000, cross_recognizer=cross2)
    assert len(kept2) == 1 and kept2[0][3] <= 0.30


def test_eval_cer_svs_dir_path(tmp_path):
    """tools/eval_cer --svs-dir: the SenseVoice in-process scoring path
    produces a CER report (mechanics; accuracy gating is CI'd on the
    learned model in test_learned_e2e)."""
    import wave as wave_mod

    import jax
    import numpy as np

    from asr2pass_tpu.config import sensevoice_tiny
    from asr2pass_tpu.models import sensevoice
    from asr2pass_tpu.runtime.model_zoo import save_svs_bundle
    from asr2pass_tpu.text.vocab import make_test_vocab
    from asr2pass_tpu.tools import eval_cer

    cfg = sensevoice_tiny()
    vocab = make_test_vocab(cfg.vocab_size)
    d = str(tmp_path / "svs")
    save_svs_bundle(d, sensevoice.init(jax.random.PRNGKey(0), cfg), cfg,
                    vocab.tokens)
    wav_path = tmp_path / "u0.wav"
    samples = (np.random.default_rng(3).standard_normal(16000) * 0.1
               ).clip(-1, 1)
    with wave_mod.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    (tmp_path / "wav.scp").write_text(f"u0 {wav_path}\n")
    (tmp_path / "text").write_text("u0 一七\n")
    report = tmp_path / "cer.json"
    rc = eval_cer.main(["--scp", str(tmp_path / "wav.scp"),
                        "--ref", str(tmp_path / "text"),
                        "--svs-dir", d, "--out", str(report)])
    assert rc == 0
    import json as _json

    rep = _json.loads(report.read_text(encoding="utf-8"))
    assert rep["sentences"] == 1
