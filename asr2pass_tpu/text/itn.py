"""Inverse text normalization (ITN) for Chinese (+ mixed English digits).

Role of the reference's WeTextProcessing-runtime port (itn-processor.cpp:
53-87 tagger∘input → reorder → verbalizer∘ → shortest path, with
ITN_ORDERS = date/fraction/money/measure/time, itn-token-parser.cpp:25-45).
Instead of loading compiled OpenFST tagger/verbalizer binaries, this is a
rule engine over the same categories — spelled-out Chinese numerals are
rewritten to digits in context: dates, times, fractions, percents, money,
measures, plain cardinals/decimals, and digit-string readings (幺=1).

The native/ C++ FST runtime can load real .fst models where exact
WeTextProcessing parity is required; this module is the default.
"""
from __future__ import annotations

import re
from typing import Optional

_DIGITS = {"零": 0, "〇": 0, "一": 1, "幺": 1, "二": 2, "两": 2, "三": 3,
           "四": 4, "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_UNITS = {"十": 10, "百": 100, "千": 1000}
_BIG_UNITS = {"万": 10 ** 4, "亿": 10 ** 8}
_NUM_CHARS = "零〇一幺二两三四五六七八九十百千万亿"
_NUM_RE = f"[{_NUM_CHARS}]+"


def _parse_digit_string(s: str) -> Optional[str]:
    """二零二五 -> '2025' (digit-by-digit reading)."""
    out = []
    for ch in s:
        if ch not in _DIGITS:
            return None
        out.append(str(_DIGITS[ch]))
    return "".join(out)


def _parse_section(s: str) -> Optional[int]:
    """Parse a <万 section like 三千五百二十一."""
    total = 0
    num = 0
    seen_unit = False
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in _DIGITS:
            if ch in ("零", "〇"):
                num = 0
            else:
                num = _DIGITS[ch]
            i += 1
        elif ch in _UNITS:
            unit = _UNITS[ch]
            if num == 0:
                num = 1  # 十五 = 15
            total += num * unit
            num = 0
            seen_unit = True
            i += 1
        else:
            return None
    total += num
    if not seen_unit and len(s) > 1 and all(c in _DIGITS for c in s):
        # multi-char pure digit sequence: read positionally (二零二五)
        return None
    return total


def parse_zh_number(s: str) -> Optional[str]:
    """Spelled Chinese numeral -> digit string, or None."""
    if not s or any(c not in _DIGITS and c not in _UNITS
                    and c not in _BIG_UNITS for c in s):
        return None
    if all(c in _DIGITS for c in s):
        if len(s) == 1:
            return str(_DIGITS[s])
        return _parse_digit_string(s)
    # split on 亿 then 万
    total = 0
    rest = s
    for ch, mul in (("亿", 10 ** 8), ("万", 10 ** 4)):
        if ch in rest:
            left, rest = rest.rsplit(ch, 1)
            sec = parse_zh_number(left) if left else "1"
            if sec is None or not sec.isdigit():
                return None
            total += int(sec) * mul
    if rest:
        # handle leading 十 (十五 = 15)
        sec = _parse_section(rest)
        if sec is None:
            return None
        # 三万零五百: rest picks up as-is
        total += sec
    return str(total)


def _num(m_str: str) -> str:
    v = parse_zh_number(m_str)
    return v if v is not None else m_str


class ChineseITN:
    """normalize(text) -> text with ITN applied (ITNModel::Normalize role,
    itn-processor.cpp:85-87)."""

    def __init__(self, enable: bool = True):
        self.enable = enable
        num = _NUM_RE
        self._rules = [
            # fraction / percent (X分之Y -> Y/X, 百分之X -> X%)
            (re.compile(f"百分之({num}(?:点{num})?)"),
             lambda m: f"{self._decimal(m.group(1))}%"),
            (re.compile(f"({num})分之({num})"),
             lambda m: f"{_num(m.group(2))}/{_num(m.group(1))}"),
            # date: X年X月X日/号
            (re.compile(f"({num})年({num})月({num})[日号]"),
             lambda m: f"{self._year(m.group(1))}年{_num(m.group(2))}月"
                       f"{_num(m.group(3))}日"),
            (re.compile(f"({num})月({num})[日号]"),
             lambda m: f"{_num(m.group(1))}月{_num(m.group(2))}日"),
            (re.compile(f"({num})年"),
             lambda m: f"{self._year(m.group(1))}年"),
            # time: X点X分X秒 / X点半 / X时X分
            (re.compile(f"({num})[点时]({num})分({num})秒"),
             lambda m: f"{_num(m.group(1))}:{self._two(m.group(2))}:"
                       f"{self._two(m.group(3))}"),
            (re.compile(f"({num})[点时]({num})分"),
             lambda m: f"{_num(m.group(1))}:{self._two(m.group(2))}"),
            (re.compile(f"({num})点半"),
             lambda m: f"{_num(m.group(1))}:30"),
            # money: X元/块/块钱
            (re.compile(f"({num}(?:点{num})?)[元](?!素)"),
             lambda m: f"{self._decimal(m.group(1))}元"),
            (re.compile(f"({num}(?:点{num})?)块钱?"),
             lambda m: f"{self._decimal(m.group(1))}元"),
            # decimal
            (re.compile(f"({num})点({num})"),
             lambda m: self._decimal(f"{m.group(1)}点{m.group(2)}")),
            # ordinal: 第X -> 第N
            (re.compile(f"第({num})"), lambda m: f"第{_num(m.group(1))}"),
            # plain cardinal (longest spans last)
            (re.compile(num), lambda m: _num(m.group(0))),
        ]

    @staticmethod
    def _two(s: str) -> str:
        v = _num(s)
        return v.zfill(2) if v.isdigit() else v

    @staticmethod
    def _year(s: str) -> str:
        d = _parse_digit_string(s)
        if d is not None and len(d) >= 2:
            return d
        return _num(s)

    @staticmethod
    def _decimal(s: str) -> str:
        if "点" in s:
            a, b = s.split("点", 1)
            ai = parse_zh_number(a)
            bi = _parse_digit_string(b)
            if ai is not None and bi is not None:
                return f"{ai}.{bi}"
            return s
        return _num(s)

    def normalize(self, text: str) -> str:
        if not self.enable or not text:
            return text
        out = text
        for pattern, repl in self._rules:
            out = pattern.sub(repl, out)
        return out
