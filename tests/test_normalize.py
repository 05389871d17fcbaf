"""Golden tests for the pure-Python zh/en text normalizers.

The reference earns its WER numbers with WeTextProcessing
(`/root/reference/indextts/utils/front.py:115-138`), whose pynini build is
not installable in this image. The goldens below encode the tn rule-family
behavior (README examples and rule conventions) and run with NO tn/wetext
installed — that absence is itself asserted.
"""

import pytest

from indextts_tpu.text.normalize_en import (EnNormalizer, num_to_en, ord_to_en,
                                            year_to_en)
from indextts_tpu.text.normalize_zh import (ZhNormalizer, digits_reading,
                                            num_to_zh)


def test_no_tn_installed():
    with pytest.raises(ImportError):
        import tn  # noqa: F401
    with pytest.raises(ImportError):
        import wetext  # noqa: F401


# ---------------------------------------------------------------------------
# zh number verbalization
# ---------------------------------------------------------------------------

ZH_NUMS = [
    (0, "零"), (2, "二"), (10, "十"), (12, "十二"), (20, "二十"),
    (105, "一百零五"), (110, "一百一十"), (200, "二百"), (999, "九百九十九"),
    (1000, "一千"), (1001, "一千零一"), (10000, "一万"), (10015, "一万零一十五"),
    (100523, "十万零五百二十三"), (20000000, "二千万"),
    (100000000, "一亿"), (123456789, "一亿二千三百四十五万六千七百八十九"),
    (1000000100, "十亿零一百"),
]


@pytest.mark.parametrize("n,expect", ZH_NUMS)
def test_num_to_zh(n, expect):
    assert num_to_zh(n) == expect


def test_zh_digits_reading():
    assert digits_reading("2024") == "二零二四"
    assert digits_reading("13512345678", use_yao=True) == "幺三五幺二三四五六七八"


# ---------------------------------------------------------------------------
# zh normalizer goldens (WeTextProcessing README examples + rule families)
# ---------------------------------------------------------------------------

ZH_GOLDEN = [
    # README examples
    ("2.5平方电线", "二点五平方电线"),
    ("共4.6万块", "共四点六万块"),
    ("有62%的概率", "有百分之六十二的概率"),
    ("明天8:00起床", "明天八点起床"),
    ("咱们8:35在那见", "咱们八点三十五分在那见"),
    ("今天是2021/08/24", "今天是二零二一年八月二十四日"),
    # dates
    ("2024年1月5日开会", "二零二四年一月五日开会"),
    ("3月15号见", "三月十五号见"),
    ("1999年", "一九九九年"),
    ("10月1日", "十月一日"),
    # time
    ("12:30:45", "十二点三十分四十五秒"),
    ("9:05", "九点零五分"),
    # money / percent / fraction
    ("价格¥3.5", "价格三点五元"),
    ("价格$12", "价格十二美元"),
    ("占比3/4", "占比四分之三"),
    ("-3.5%", "负百分之三点五"),
    # telephone
    ("手机13512345678", "手机幺三五幺二三四五六七八"),
    ("固话0595-23865596", "固话零五九五二三八六五五九六"),
    # measure / liang rule
    ("温度-3°C", "温度负三摄氏度"),
    ("他有2个苹果", "他有两个苹果"),
    ("全长5km", "全长五千米"),
    ("重2两", "重二两"),
    # ranges and decimals
    ("大概3~5个", "大概三到五个"),
    ("圆周率是3.14", "圆周率是三点一四"),
    # digit strings
    ("编号007", "编号零零七"),
    ("全长10000米", "全长一万米"),
    # full-width digits
    ("１２个", "十二个"),
    # erhua and interjections pass through (remove_* = False in the reference)
    ("这儿有点儿意思啊", "这儿有点儿意思啊"),
]


@pytest.mark.parametrize("text,expect", ZH_GOLDEN)
def test_zh_normalizer(text, expect):
    assert ZhNormalizer().normalize(text) == expect


# ---------------------------------------------------------------------------
# en number verbalization
# ---------------------------------------------------------------------------

EN_NUMS = [
    (0, "zero"), (13, "thirteen"), (23, "twenty three"),
    (105, "one hundred five"), (1001, "one thousand one"),
    (1234567, "one million two hundred thirty four thousand five hundred "
              "sixty seven"),
]


@pytest.mark.parametrize("n,expect", EN_NUMS)
def test_num_to_en(n, expect):
    assert num_to_en(n) == expect


def test_ordinals():
    assert ord_to_en(1) == "first"
    assert ord_to_en(2) == "second"
    assert ord_to_en(3) == "third"
    assert ord_to_en(12) == "twelfth"
    assert ord_to_en(21) == "twenty first"
    assert ord_to_en(30) == "thirtieth"
    assert ord_to_en(100) == "one hundredth"


def test_years():
    assert year_to_en(1999) == "nineteen ninety nine"
    assert year_to_en(2024) == "twenty twenty four"
    assert year_to_en(2005) == "two thousand five"
    assert year_to_en(2000) == "two thousand"
    assert year_to_en(1900) == "nineteen hundred"
    assert year_to_en(1905) == "nineteen o five"


# ---------------------------------------------------------------------------
# en normalizer goldens
# ---------------------------------------------------------------------------

EN_GOLDEN = [
    ("I have 123 apples", "I have one hundred twenty three apples"),
    ("pi is 3.14", "pi is three point one four"),
    ("He won $5", "He won five dollars"),
    ("$1 only", "one dollar only"),
    ("$3.25 each", "three dollars twenty five cents each"),
    ("$3.5 million deal", "three point five million dollars deal"),
    ("50% off", "fifty percent off"),
    ("the 1st and 23rd", "the first and twenty third"),
    ("3/4 of them", "three quarters of them"),
    ("1/2 cup", "one half cup"),
    ("born in 1999", "born in nineteen ninety nine"),
    ("meet at 12:30", "meet at twelve thirty"),
    ("at 8:05 am", "at eight o five a m"),
    ("at 9:00", "at nine o'clock"),
    ("call 555-123-4567",
     "call five five five one two three four five six seven"),
    ("weighs 5kg", "weighs five kilograms"),
    ("1 km away", "one kilometer away"),
    ("January 5, 2024", "january fifth twenty twenty four"),
    ("5 January 2024", "the fifth of january twenty twenty four"),
    ("May 2024", "may twenty twenty four"),
    ("Mr. Smith vs Dr. Jones", "mister Smith versus doctor Jones"),
    ("room No. 42", "room number forty two"),
    ("1,234 items", "one thousand two hundred thirty four items"),
    ("it is -4°C", "it is minus four degrees celsius"),
    ("fish etc.", "fish et cetera"),
    ("A & B", "A and B"),
]


@pytest.mark.parametrize("text,expect", EN_GOLDEN)
def test_en_normalizer(text, expect):
    assert EnNormalizer().normalize(text) == expect


# ---------------------------------------------------------------------------
# integration through TextNormalizer (routing + protection passes intact)
# ---------------------------------------------------------------------------

def test_front_end_integration():
    from indextts_tpu.text.front import TextNormalizer

    tn_ = TextNormalizer()
    tn_.load()
    # zh routing: real number verbalization (not per-digit spell-out)
    assert tn_.normalize("这里有123个苹果") == "这里有一百二十三个苹果"
    # en routing
    assert "one hundred twenty three" in tn_.normalize("there are 123 apples")
    # pinyin protection still intact around normalization (non-jqx initials
    # stay as-written; jqx u-finals get the v-correction and uppercase)
    out = tn_.normalize("朝阳区读chao2阳区")
    assert "chao2" in out
    out = tn_.normalize("这个字读jue2对吗")
    assert "JVE2" in out
    # tech-term hyphens protected (digits still normalize; the reference
    # documents GPT-5-nano -> GPT-五-nano, front.py:232-237)
    out = tn_.normalize("GPT-5-nano发布了")
    assert "GPT-五-nano" in out
