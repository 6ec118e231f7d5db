"""Bulk transcription CLI over a saved model dir + wav.scp (BASELINE
config 2: long-audio wav.scp batch through VAD + pass-2)."""
import os
import wave as wavmod

import jax
import numpy as np

from asr2pass_tpu.config import VadConfig, paraformer_tiny
from asr2pass_tpu.models import fsmn_vad, paraformer
from asr2pass_tpu.runtime.model_zoo import save_offline_bundle, save_params
from asr2pass_tpu.text.vocab import make_test_vocab
from asr2pass_tpu.tools import transcribe


def _write_wav(path, seconds, seed):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(16000 * seconds)) * 0.1 * 32767
           ).astype("<i2")
    with wavmod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def test_transcribe_cli_end_to_end(tmp_path):
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    model_dir = str(tmp_path / "model")
    save_offline_bundle(model_dir, params, cfg,
                        make_test_vocab(cfg.vocab_size).tokens)
    vad_dir = str(tmp_path / "vad")
    os.makedirs(vad_dir)
    save_params(os.path.join(vad_dir, "weights.npz"),
                fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()))

    wavs = []
    for i in range(2):
        p = tmp_path / f"utt{i}.wav"
        _write_wav(p, 1.5 + i, seed=i)
        wavs.append((f"utt{i}", str(p)))
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(f"{n}\t{p}" for n, p in wavs))

    out_dir = str(tmp_path / "out")
    rc = transcribe.main([
        "--scp", str(scp), "--model-dir", model_dir, "--vad-dir", vad_dir,
        "--output-dir", out_dir,
    ])
    assert rc == 0
    text = (tmp_path / "out" / "text").read_text(encoding="utf-8")
    lines = dict(l.split("\t", 1) for l in text.strip().split("\n"))
    assert set(lines) == {"utt0", "utt1"}
    for n, _ in wavs:
        assert os.path.exists(os.path.join(out_dir, f"{n}.asr.txt"))
