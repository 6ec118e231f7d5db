"""Forward TN + metrics tests; TN∘ITN consistency."""
from asr2pass_tpu.runtime.metrics import Metrics
from asr2pass_tpu.text.itn import ChineseITN
from asr2pass_tpu.tools.textnorm import digits_to_zh, int_to_zh, normalize_zh


def test_int_to_zh():
    assert int_to_zh(0) == "零"
    assert int_to_zh(10) == "十"
    assert int_to_zh(15) == "十五"
    assert int_to_zh(123) == "一百二十三"
    assert int_to_zh(1001) == "一千零一"
    assert int_to_zh(30500) == "三万零五百"
    assert int_to_zh(100000000) == "一亿"


def test_digits_to_zh():
    assert digits_to_zh("2025") == "二零二五"


def test_normalize_sentence():
    assert normalize_zh("我有123个苹果") == "我有一百二十三个苹果"
    assert "三点一四" in normalize_zh("圆周率是3.14")
    assert "百分之五十" in normalize_zh("50%的概率")


def test_tn_itn_roundtrip():
    """ITN(TN(x)) recovers the digits for plain cardinals."""
    itn = ChineseITN()
    for n in [7, 15, 123, 3500, 30500]:
        assert itn.normalize(int_to_zh(n)) == str(n)


def test_metrics_stages():
    m = Metrics()
    with m.stage("pass1"):
        pass
    with m.stage("pass1"):
        pass
    m.add_audio(12.0)
    rep = m.report()
    assert rep["stages"]["pass1"]["count"] == 2
    assert rep["audio_seconds"] == 12.0
