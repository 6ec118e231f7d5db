"""ITN rule-engine tests over the reference's categories
(date/fraction/money/measure/time + cardinals, itn-token-parser ITN_ORDERS)."""
import pytest

from asr2pass_tpu.text.itn import ChineseITN, parse_zh_number


@pytest.fixture(scope="module")
def itn():
    return ChineseITN()


@pytest.mark.parametrize("zh,expect", [
    ("一", "1"),
    ("十", "10"),
    ("十五", "15"),
    ("二十三", "23"),
    ("一百二十三", "123"),
    ("一千零一", "1001"),
    ("三千五百", "3500"),
    ("一万二千三百四十五", "12345"),
    ("三万零五百", "30500"),
    ("一亿", "100000000"),
    ("两百", "200"),
    ("二零二五", "2025"),
    ("幺三五", "135"),
])
def test_parse_zh_number(zh, expect):
    assert parse_zh_number(zh) == expect


def test_cardinal(itn):
    assert itn.normalize("我有一百二十三个苹果") == "我有123个苹果"


def test_decimal(itn):
    assert itn.normalize("三点一四") == "3.14"


def test_percent(itn):
    assert itn.normalize("百分之五十") == "50%"
    assert itn.normalize("百分之三点五") == "3.5%"


def test_fraction(itn):
    assert itn.normalize("三分之二") == "2/3"


def test_date(itn):
    assert itn.normalize("二零二五年八月十七日") == "2025年8月17日"
    assert itn.normalize("三月五号") == "3月5日"


def test_time(itn):
    assert itn.normalize("三点十五分") == "3:15"
    assert itn.normalize("八点半") == "8:30"
    assert itn.normalize("十二点零五分三十秒") == "12:05:30"


def test_money(itn):
    assert itn.normalize("五十块钱") == "50元"
    assert itn.normalize("三点五元") == "3.5元"


def test_mixed_sentence(itn):
    out = itn.normalize("今天三月五号我花了五十块钱买了一百二十三个苹果")
    assert "3月5日" in out
    assert "50元" in out
    assert "123个" in out


def test_plain_text_unchanged(itn):
    assert itn.normalize("你好世界") == "你好世界"
    assert itn.normalize("hello world") == "hello world"
    assert itn.normalize("") == ""


def test_disabled_passthrough():
    itn = ChineseITN(enable=False)
    assert itn.normalize("一百") == "一百"


def test_measure_units(itn):
    # units whose first char is a numeral unit (千克, 千瓦时) must not be
    # folded into the number (ITN_ORDERS "measure", itn-token-parser.cpp)
    assert itn.normalize("体重七十五千克") == "体重75千克"
    assert itn.normalize("一千瓦时") == "1千瓦时"
    assert itn.normalize("三点五千克") == "3.5千克"
    assert itn.normalize("三百米") == "300米"
    # bare unit with no number stays text
    assert itn.normalize("每千克五元") == "每千克5元"
    # a 万-number keeps its 千: 两万五千米 is 25000 meters
    assert itn.normalize("两万五千米") == "25000米"


def test_negative_numbers(itn):
    assert itn.normalize("零下五摄氏度") == "-5摄氏度"
    assert itn.normalize("零下十二度") == "-12度"
    assert itn.normalize("负三点五度") == "-3.5度"


def test_colloquial_half_units(itn):
    assert itn.normalize("工资两万五") == "工资25000"
    assert itn.normalize("三千五") == "3500"
    assert itn.normalize("一百二") == "120"
    # explicit 零 pins the trailing digit to the ones place
    assert itn.normalize("三千零五") == "3005"
    assert itn.normalize("一百零二") == "102"


def test_protected_words(itn):
    # lexical numerals are not quantities
    assert itn.normalize("我们一起去") == "我们一起去"
    assert itn.normalize("万一出事") == "万一出事"
    assert itn.normalize("统一行动") == "统一行动"
    assert itn.normalize("这一度是难题") == "这一度是难题"
    assert itn.normalize("有一点累") == "有一点累"


def test_digit_sequence_reading(itn):
    # 幺 = 1 digit-by-digit reading (phone numbers)
    assert itn.normalize("电话幺三五二四六八零") == "电话13524680"


def test_wan_number_keeps_units_kilometer(itn):
    # bare 千 after 万 belongs to the unit, not the number
    assert itn.normalize("一万千米") == "10000千米"
    assert itn.normalize("两万千克") == "20000千克"
    assert itn.normalize("一万千瓦时") == "10000千瓦时"
    # with a digit after 万 the 千 is the number's
    assert itn.normalize("两万五千米") == "25000米"
