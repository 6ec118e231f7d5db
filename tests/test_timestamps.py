"""Timestamp machinery tests against hand-computed expectations of the
reference formulas (util.cpp TimestampOnnx/PostProcess/Smooth/Sentence)."""
import numpy as np

from asr2pass_tpu.text.timestamps import (
    TIME_RATE,
    post_process,
    split_chi_eng_characters,
    stamps_to_ms,
    timestamp_from_peaks,
    timestamp_sentence,
    timestamp_smooth,
)


def test_split_chi_eng_characters():
    assert split_chi_eng_characters("你好world 123") == [
        "你", "好", "world", "1", "2", "3"]
    assert split_chi_eng_characters("a-b it's") == ["a-b", "it's"]
    assert split_chi_eng_characters("你，好。") == ["你", "，", "好", "。"]


def test_timestamp_from_peaks_exact_fires():
    # 3 tokens need 4 peaks; frames at 0, 10, 20, 30 of 32 frames
    n = 32
    peaks = np.zeros(n)
    for p in [0, 10, 20, 30]:
        peaks[p] = 1.0
    alphas = np.full(n, 4.0 / n)
    chars = ["你", "好", "吗"]
    out_chars, ts, token_ts = timestamp_from_peaks(alphas, peaks, chars)
    assert len(token_ts) == 3
    np.testing.assert_allclose(token_ts[0], [0.0, 10 * TIME_RATE])
    np.testing.assert_allclose(token_ts[1], [10 * TIME_RATE, 20 * TIME_RATE])
    # last token extends to num_frames (tail < threshold)
    np.testing.assert_allclose(token_ts[2], [20 * TIME_RATE, n * TIME_RATE])


def test_timestamp_from_peaks_rescale_fallback():
    # wrong peak count triggers the alpha-rescale path; still 1 ts per token
    n = 30
    peaks = np.zeros(n)
    peaks[0] = 1.0  # only 1 peak for 2 tokens
    alphas = np.random.default_rng(0).uniform(0.1, 0.3, n)
    chars = ["你", "好"]
    _, _, token_ts = timestamp_from_peaks(alphas, peaks, chars)
    assert len(token_ts) == 2
    for b, e in token_ts:
        assert e >= b >= 0


def test_timestamp_from_peaks_long_token_split():
    n = 60
    peaks = np.zeros(n)
    for p in [0, 50, 59]:
        peaks[p] = 1.0  # token 0 spans 50 frames > MAX_TOKEN_DURATION
    alphas = np.full(n, 3.0 / n)
    chars = ["你", "好"]
    out_chars, ts, token_ts = timestamp_from_peaks(alphas, peaks, chars)
    assert "<sil>" in out_chars
    assert len(token_ts) == 2
    assert token_ts[0][1] - token_ts[0][0] <= 30 * TIME_RATE + 1e-6


def test_post_process_bpe_and_spacing():
    raw = ["你", "he@@", "llo", "好"]
    ts = [[0.0, 0.1], [0.1, 0.2], [0.2, 0.3], [0.3, 0.4]]
    text, merged = post_process(raw, ts)
    assert text == "你hello好"
    assert len(merged) == 3
    np.testing.assert_allclose(merged[1], [0.1, 0.3])  # merged bpe span


def test_post_process_english_spacing():
    raw = ["hello", "world"]
    ts = [[0.0, 0.5], [0.5, 1.0]]
    text, merged = post_process(raw, ts)
    assert text == "hello world"
    assert len(merged) == 2


def test_stamps_to_ms_offset():
    out = stamps_to_ms([[0.5, 1.0]], offset_s=2.0)
    assert out == [[2500, 3000]]


def test_timestamp_smooth_identity():
    stamps = [[0, 100], [100, 200], [200, 300]]
    out = timestamp_smooth("你好吗", "你好吗", stamps)
    assert out == stamps


def test_timestamp_smooth_itn_contraction():
    # "一二三" -> "123": 3 original units -> 3 itn digits, same count
    stamps = [[0, 100], [100, 200], [200, 300]]
    out = timestamp_smooth("一二三", "123", stamps)
    assert out is not None
    assert len(out) == 3
    assert out[0][0] == 0 and out[-1][1] == 300


def test_timestamp_smooth_shrinking():
    # "一百二十三" (5 chars) -> "123" (3 units): spans redistributed
    stamps = [[0, 100], [100, 200], [200, 300], [300, 400], [400, 500]]
    out = timestamp_smooth("一百二十三", "123", stamps)
    assert out is not None
    assert len(out) == 3
    assert out[0][0] == 0 and out[-1][1] == 500


def test_timestamp_sentence():
    stamps = [[0, 100], [100, 200], [200, 300], [300, 400]]
    sents = timestamp_sentence("你好，世界。", stamps)
    assert len(sents) == 2
    assert sents[0]["punc"] == "，"
    assert sents[0]["start"] == 0 and sents[0]["end"] == 200
    assert sents[1]["punc"] == "。"
    assert sents[1]["ts_list"] == [[200, 300], [300, 400]]
