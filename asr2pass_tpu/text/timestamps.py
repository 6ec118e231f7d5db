"""Timestamp post-processing: CIF-peak alignment, ITN smoothing, sentences.

Behavioral ports of the reference's timestamp machinery (util.cpp), which is
directly user-visible in the websocket results:
  * timestamp_from_peaks — TimestampOnnx (util.cpp:838-963): bicif fires ->
    per-token [begin,end] with TIME_RATE = 10*6/1000/3 s/frame, the
    alpha-rescale fallback when #peaks != #tokens+1, <sil> insertion, and
    the MAX_TOKEN_DURATION=30-frame split
  * post_process — PostProcess (util.cpp:720-836): @@-BPE merge with
    timestamp begin carry, Chinese/English spacing; returns
    "text | t0, t1,t2, t3..."
  * timestamp_smooth — TimestampSmooth (util.cpp:397-567): char-level
    edit-distance alignment original-vs-ITN text, redistributing timestamps
    evenly over rewritten spans
  * timestamp_sentence — TimestampSentence (util.cpp:569-637):
    sentence-level {text_seg, punc, start, end, ts_list} records
"""
from __future__ import annotations

import json
from typing import List, Optional, Sequence, Tuple

START_END_THRESHOLD = 5.0
MAX_TOKEN_DURATION = 30.0
TIME_RATE = 10.0 * 6 / 1000 / 3  # 60 ms LFR frame, 3x upsampled predictor

_PUNC_SET = set("，。？、,?")


def _is_chinese_char(ch: str) -> bool:
    cp = ord(ch)
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0xF900 <= cp <= 0xFAFF)


def _is_punct_char(ch: str) -> bool:
    cp = ord(ch)
    if cp in (0x26, 0x27, 0x2D):  # & ' - appear inside dict words
        return False
    return ((0x21 <= cp <= 0x2F) or (0x3A <= cp <= 0x40)
            or (0x5B <= cp <= 0x60) or (0x7B <= cp <= 0x7E)
            or (0x2000 <= cp <= 0x206F) or (0x3000 <= cp <= 0x303F))


def split_chi_eng_characters(text: str) -> List[str]:
    """Chinese chars / digits / punctuation as single units; latin runs as
    words (TimestampSplitChiEngCharacters, util.cpp:320-366)."""
    out: List[str] = []
    word = ""
    for ch in text:
        if _is_chinese_char(ch) or ch.isdigit() or _is_punct_char(ch):
            if word:
                out.append(word)
                word = ""
            out.append(ch)
        elif ch == " ":
            if word:
                out.append(word)
                word = ""
        else:
            word += ch
    if word:
        out.append(word)
    return out


def is_punctuation_token(tok: str) -> bool:
    return len(tok) > 0 and all(c in _PUNC_SET for c in tok)


def timestamp_from_peaks(us_alphas: Sequence[float],
                         us_cif_peak: Sequence[float],
                         char_list: List[str],
                         begin_time_ms: float = 0.0,
                         total_offset: float = 0.0
                         ) -> Tuple[List[str], List[List[float]],
                                    List[List[float]]]:
    """Returns (char_list_with_sil, all timestamps s, token-only timestamps
    s) — the TimestampOnnx outputs."""
    char_list = list(char_list)
    if not char_list:
        return [], [], []
    if char_list and char_list[-1] == "</s>":
        char_list = char_list[:-1]
    if not char_list:
        return [], [], []
    cif_peak = list(us_cif_peak)
    num_frames = len(cif_peak)
    fire_place = [i + total_offset for i, p in enumerate(cif_peak)
                  if p > 1.0 - 1e-4]
    if len(fire_place) != len(char_list) + 1:
        # alpha-rescale fallback: renormalize alphas to fire exactly
        # #tokens+1 times, re-run the integrate pass (util.cpp:872-904)
        total = float(sum(us_alphas))
        scale = total / (len(char_list) + 1)
        if scale == 0:
            return [], [], []
        cif_peak = []
        s = 0.0
        for a in us_alphas:
            a = a / scale
            s += a
            cif_peak.append(s)
            if s >= 1.0 - 1e-4:
                s -= 1.0 - 1e-4
        idx = len(cif_peak) - 1
        while s >= 1.0 - 1e-4 and idx >= 0:
            if cif_peak[idx] < 1.0 - 1e-4:
                cif_peak[idx] = s
                s -= 1.0 - 1e-4
            idx -= 1
        fire_place = [i + total_offset for i, p in enumerate(cif_peak)
                      if p > 1.0 - 1e-4]
    if not fire_place:
        return [], [], []

    new_chars: List[str] = []
    ts: List[List[float]] = []
    if fire_place[0] > START_END_THRESHOLD:
        new_chars.append("<sil>")
        ts.append([0.0, fire_place[0] * TIME_RATE])
    num_peak = len(fire_place)
    for i in range(num_peak - 1):
        if i >= len(char_list):
            break
        new_chars.append(char_list[i])
        if (i == num_peak - 2 or MAX_TOKEN_DURATION < 0
                or fire_place[i + 1] - fire_place[i] < MAX_TOKEN_DURATION):
            ts.append([fire_place[i] * TIME_RATE,
                       fire_place[i + 1] * TIME_RATE])
        else:
            split = fire_place[i] + MAX_TOKEN_DURATION
            ts.append([fire_place[i] * TIME_RATE, split * TIME_RATE])
            ts.append([split * TIME_RATE, fire_place[i + 1] * TIME_RATE])
            new_chars.append("<sil>")
    if not ts:
        return [], [], []
    if num_frames - fire_place[-1] > START_END_THRESHOLD:
        end = (num_frames + fire_place[-1]) / 2.0
        ts[-1][1] = end * TIME_RATE
        ts.append([end * TIME_RATE, num_frames * TIME_RATE])
        new_chars.append("<sil>")
    else:
        ts[-1][1] = num_frames * TIME_RATE
    if begin_time_ms:
        for pair in ts:
            pair[0] += begin_time_ms / 1000.0
            pair[1] += begin_time_ms / 1000.0
    token_ts = [pair for ch, pair in zip(new_chars, ts) if ch != "<sil>"]
    return new_chars, ts, token_ts


def post_process(raw_char: List[str],
                 timestamp_list: List[List[float]]) -> Tuple[str, List[List[float]]]:
    """BPE merge + spacing; returns (text, merged timestamps s) —
    PostProcess (util.cpp:720-836) without the string serialization."""
    words: List[str] = []
    merged: List[List[float]] = []
    is_pre_english = False
    is_combining = False
    combine = ""
    begin = -1.0
    n = len(raw_char)
    for i, word in enumerate(raw_char):
        if word in ("<s>", "</s>", "<unk>"):
            continue
        ts = timestamp_list[i] if i < len(timestamp_list) else [0.0, 0.0]
        if "@@" in word:
            nxt_chinese = (i == n - 1) or (
                i < n - 1 and _is_chinese_char(raw_char[i + 1][:1] or " "))
            if nxt_chinese:
                word = word[:-2] + " "
                if is_combining:
                    combine += word
                    is_combining = False
                    word = combine
                    combine = ""
            else:
                combine += word[:-2]
                if not is_combining:
                    begin = ts[0]
                is_combining = True
                continue
        elif is_combining:
            combine += word
            is_combining = False
            word = combine
            combine = ""
        if word and _is_chinese_char(word[0]):
            words.append(word)
            merged.append(list(ts))
            is_pre_english = False
        else:
            if is_pre_english:
                words.append(" ")
            words.append(word)
            b = ts[0] if begin == -1 else begin
            merged.append([b, ts[1]])
            begin = -1.0
            is_pre_english = True
    return "".join(words), merged


def stamps_to_ms(merged: List[List[float]],
                 offset_s: float = 0.0) -> List[List[int]]:
    """[[b,e]] seconds -> int milliseconds with segment offset (the
    FunOfflineInferBuffer/FunTpassInferBuffer accumulation,
    funasrruntime.cpp:301-316,594-607)."""
    return [[int(1000 * (b + offset_s)), int(1000 * (e + offset_s))]
            for b, e in merged]


def timestamp_smooth(text: str, text_itn: str,
                     stamps: List[List[int]]) -> Optional[List[List[int]]]:
    """Redistribute `stamps` (aligned to `text` units) onto `text_itn`
    units after ITN rewriting (TimestampSmooth, util.cpp:397-567).
    Returns None on the reference's failure conditions."""
    chars = split_chi_eng_characters(text)
    chars_itn = split_chi_eng_characters(text_itn)
    if not stamps:
        return None
    m, n = len(chars), len(chars_itn)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if chars[i - 1] == chars_itn[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = min(dp[i - 1][j], dp[i][j - 1],
                               dp[i - 1][j - 1]) + 1
    a1: List[str] = []
    a2: List[str] = []

    def add(lst, w):
        if not is_punctuation_token(w):
            lst.insert(0, w)
        # punctuation is dropped from the alignment (TimestampAdd)

    i, j = m, n
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1]:
            add(a1, chars[i - 1])
            add(a2, chars_itn[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            add(a1, chars[i - 1])
            a2.insert(0, "")
            i -= 1
        elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
            a1.insert(0, "")
            add(a2, chars_itn[j - 1])
            j -= 1
        else:
            add(a1, chars[i - 1])
            add(a2, chars_itn[j - 1])
            i -= 1
            j -= 1
    # pad to equal length (punctuation drops can desync; reference relies on
    # deque pairing — mirror by right-padding the shorter side)
    while len(a1) < len(a2):
        a1.append("")
    while len(a2) < len(a1):
        a2.append("")

    out: List[List[int]] = []
    itn_count = 0
    idx_tp = 0
    idx_itn = 0
    tmp: List[List[int]] = []

    def flush(tmp, itn_count, out):
        if tmp and itn_count > 0:
            begin = tmp[0][0]
            end = tmp[-1][1]
            interval = (end - begin) // itn_count
            for k in range(itn_count):
                e = end if k == itn_count - 1 else begin + interval * (k + 1)
                out.append([begin + interval * k, e])

    for idx in range(len(a1)):
        if a1[idx] == a2[idx]:
            subsidy = False
            if itn_count > 0 and not tmp:
                if idx_tp >= len(stamps):
                    return None
                tmp.append(stamps[idx_tp])
                subsidy = True
                itn_count += 1
            if tmp:
                flush(tmp, itn_count, out)
                tmp = []
            if not subsidy:
                if idx_tp >= len(stamps):
                    return None
                out.append(list(stamps[idx_tp]))
            idx_tp += 1
            itn_count = 0
        else:
            if a1[idx]:
                if idx_tp >= len(stamps):
                    return None
                tmp.append(stamps[idx_tp])
                idx_tp += 1
            if a2[idx]:
                itn_count += 1
        if a2[idx]:
            idx_itn += 1
    if itn_count > 0 and not tmp:
        if out:
            tmp.append(out.pop())
            itn_count += 1
        else:
            return None
    if tmp:
        flush(tmp, itn_count, out)
    if len(out) != idx_itn:
        return None
    return out


def timestamp_sentence(text: str, stamps: List[List[int]]) -> List[dict]:
    """Sentence records {text_seg, punc, start, end, ts_list}
    (TimestampSentence, util.cpp:569-637)."""
    chars = split_chi_eng_characters(text)
    out: List[dict] = []
    idx_ts = 0
    start, end = -1, -1
    text_seg: List[str] = []
    ts_seg: List[List[int]] = []
    for ch in chars:
        if is_punctuation_token(ch):
            if ts_seg:
                start = ts_seg[0][0]
                end = ts_seg[-1][1]
            out.append({"text_seg": " ".join(text_seg), "punc": ch,
                        "start": start, "end": end,
                        "ts_list": [list(t) for t in ts_seg]})
            text_seg, ts_seg = [], []
            start, end = 0, 0
        elif idx_ts < len(stamps):
            text_seg.append(ch)
            ts_seg.append(stamps[idx_ts])
            idx_ts += 1
    if ts_seg:
        out.append({"text_seg": " ".join(text_seg), "punc": "",
                    "start": ts_seg[0][0], "end": ts_seg[-1][1],
                    "ts_list": [list(t) for t in ts_seg]})
    return out


def stamps_to_json(stamps: List[List[int]]) -> str:
    return json.dumps(stamps, separators=(",", ":"))
