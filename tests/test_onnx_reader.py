"""ONNX wire-format reader + JAX executor tests.

A minimal ONNX model is ENCODED by hand here (protobuf wire format), so
the parser round-trips without any onnx dependency; the real DNSMOS
checkpoints are exercised when the reference mount is present.
"""
import os

import numpy as np
import pytest

from asr2pass_tpu.tools.onnx_reader import OnnxExecutor, read_onnx

DNSMOS_DIR = "/root/reference/utils/DNSMOS"


# -- tiny protobuf writer (inverse of the reader, test-only) ---------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fno: int, wt: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | wt) + payload


def _len_field(fno: int, payload: bytes) -> bytes:
    return _field(fno, 2, _varint(len(payload)) + payload)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))  # FLOAT
    msg += _len_field(8, name.encode())
    msg += _len_field(9, arr.astype("<f4").tobytes())
    return msg


def _node(op: str, inputs, outputs, attrs=b"") -> bytes:
    msg = b""
    for i in inputs:
        msg += _len_field(1, i.encode())
    for o in outputs:
        msg += _len_field(2, o.encode())
    msg += _len_field(4, op.encode())
    msg += attrs
    return msg


def _value_info(name: str) -> bytes:
    return _len_field(1, name.encode())


def _make_model(tmp_path) -> str:
    """y = relu(x @ W + b), W 3x2, as a hand-encoded .onnx file."""
    w = np.arange(6, dtype=np.float32).reshape(3, 2) - 2.0
    b = np.array([0.5, -0.5], np.float32)
    graph = b""
    graph += _len_field(1, _node("MatMul", ["x", "W"], ["mm"]))
    graph += _len_field(1, _node("Add", ["mm", "b"], ["lin"]))
    graph += _len_field(1, _node("Relu", ["lin"], ["y"]))
    graph += _len_field(5, _tensor("W", w))
    graph += _len_field(5, _tensor("b", b))
    graph += _len_field(11, _value_info("x"))
    graph += _len_field(12, _value_info("y"))
    model = _len_field(7, graph)  # ModelProto.graph
    path = os.path.join(tmp_path, "tiny.onnx")
    with open(path, "wb") as f:
        f.write(model)
    return path, w, b


def test_roundtrip_and_execute(tmp_path):
    path, w, b = _make_model(str(tmp_path))
    g = read_onnx(path)
    assert g.inputs == ["x"]
    assert g.outputs == ["y"]
    assert [n.op_type for n in g.nodes] == ["MatMul", "Add", "Relu"]
    np.testing.assert_allclose(g.initializers["W"], w)
    x = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    y = np.asarray(OnnxExecutor(g)(x))
    np.testing.assert_allclose(y, np.maximum(x @ w + b, 0), rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(DNSMOS_DIR),
                    reason="reference DNSMOS models not mounted")
def test_real_dnsmos_graphs_execute():
    g = read_onnx(os.path.join(DNSMOS_DIR, "model_v8.onnx"))
    assert g.input_shapes[g.inputs[0]][1:] == [900, 120]
    x = np.zeros((1, 900, 120), np.float32)
    out = np.asarray(OnnxExecutor(g)(x))
    assert out.shape == (1, 1) and np.isfinite(out).all()


@pytest.mark.skipif(not os.path.isdir(DNSMOS_DIR),
                    reason="reference DNSMOS models not mounted")
def test_dnsmos_scorer_ranks_noise_below_clean():
    from asr2pass_tpu.tools.quality import DnsmosScorer

    sc = DnsmosScorer(DNSMOS_DIR)
    fs = 16000
    t = np.arange(fs * 10) / fs
    speech = ((0.25 * np.sin(2 * np.pi * 220 * t)
               + 0.15 * np.sin(2 * np.pi * 440 * t))
              * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)))
    rng = np.random.default_rng(0)
    clean = sc.score(speech.astype(np.float32))
    noisy = sc.score((speech * 0.5
                      + 0.2 * rng.standard_normal(len(t))
                      ).astype(np.float32))
    assert clean["p808_mos"] > noisy["p808_mos"]
    assert clean["ovrl"] > noisy["ovrl"]


@pytest.mark.skipif(not os.path.isdir(DNSMOS_DIR),
                    reason="reference DNSMOS models not mounted")
def test_dnsmos_empty_audio_terminates():
    from asr2pass_tpu.tools.quality import DnsmosScorer

    sc = DnsmosScorer(DNSMOS_DIR)
    out = sc.score(np.zeros(0, np.float32))
    assert out["p808_mos"] == 0.0
