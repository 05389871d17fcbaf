"""Golden tests for the pure-Python zh/en text normalizers.

The reference earns its WER numbers with WeTextProcessing
(`/root/reference/indextts/utils/front.py:115-138`), whose pynini build is
not installable in this image. The goldens below encode the tn rule-family
behavior (README examples and rule conventions) and run with NO tn/wetext
installed — that absence is itself asserted.

Externally-anchored vectors (published WeTextProcessing / speechio
cn_tn corpus examples, plus the behavioral corrections adopting them
forced) live in `tests/test_normalize_external.py`; where a case here
conflicted with a published vector, the normalizer was corrected and the
external file carries the authoritative golden.
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
    # ---- rule-family matrix (VERDICT r2 item 7) --------------------------
    # fractions: nested priorities, leading-zero denominators excluded
    ("1/2的人", "二分之一的人"),
    ("比例是15/100", "比例是一百分之十五"),
    ("7/8英寸", "八分之七英寸"),
    # hyphen and tilde ranges, incl. decimal endpoints
    ("3-5个工作日", "三到五个工作日"),
    ("1.5~2.5倍", "一点五到二点五倍"),
    ("10-20%", "百分之十到百分之二十"),
    # date ranges
    ("3月5日-8日放假", "三月五日到八日放假"),
    ("5号~8号有雨", "五号到八号有雨"),
    ("2021年-2023年在任", "二零二一年到二零二三年在任"),
    # telephone with 幺
    ("打10086", "打一万零八十六"),
    ("他的号码是15912345678", "他的号码是幺五九幺二三四五六七八"),
    ("报警电话110", "报警电话一百一十"),
    ("区号010-12345678", "区号零幺零幺二三四五六七八"),
    # measures: compound units, per-units, decimals
    ("限速60km/h", "限速六十千米每小时"),
    ("电费0.5kWh", "电费零点五千瓦时"),
    ("面积120m²", "面积一百二十平方米"),
    ("容量1.5L", "容量一点五升"),
    ("时延3ms", "时延三毫秒"),
    ("频率2.4GHz", "频率二点四吉赫兹"),
    ("内存512MB", "内存五百一十二兆字节"),
    ("体重65kg", "体重六十五千克"),
    ("气温-12°C", "气温负十二摄氏度"),
    ("角度45°", "角度四十五度"),
    # the 两-for-2 rule and its boundaries
    ("2位朋友", "两位朋友"),
    ("2次机会", "两次机会"),
    ("22个人", "二十二个人"),
    ("第2个", "第二个"),  # ordinal context beats the liang rule
    # money
    ("€99", "九十九欧元"),
    ("£3.5", "三点五英镑"),
    ("￥10000", "一万元"),
    # percent edge cases
    ("0.5%", "百分之零点五"),
    ("100%", "百分之一百"),
    ("-3%", "负百分之三"),
    # time edge cases
    ("23:59", "二十三点五十九分"),
    ("0:30", "零点三十分"),
    ("8:00:00", "八点零秒"),
    # dates edge cases
    ("2024/2/29", "二零二四年二月二十九日"),
    ("1998-12-01", "一九九八年十二月一日"),
    ("2月14号", "二月十四号"),
    # decimals / negatives
    ("-0.5度", "负零点五度"),
    ("增长0.01", "增长零点零一"),
    # large cardinals
    ("人口1400000000", "人口十四亿"),
    ("售价2999", "售价二千九百九十九"),
    # interjection sentences pass through untouched (remove_interjections
    # =False at front.py:115-138)
    ("哎呀真棒啊", "哎呀真棒啊"),
    ("嗯哼就这样吧", "嗯哼就这样吧"),
]


@pytest.mark.parametrize("text,expect", ZH_GOLDEN)
def test_zh_normalizer(text, expect):
    assert ZhNormalizer().normalize(text) == expect


# ---------------------------------------------------------------------------
# zh normalizer properties
# ---------------------------------------------------------------------------

_ZH_PROPERTY_CORPUS = [t for t, _ in ZH_GOLDEN] + [
    "连续数字1234567890123456789超长",
    "混合2024年3月15日14:30开会花¥25.5打车3km用时20min",
    "0开头0042编号和100,000大数",
    "小数.5和5.之类的残缺写法",
    "电话020-88888888分机8001转2",
    "负温-40°C到-10°C之间",
    "1~2~3连环范围",
    "85%的人和15%的人",
]


@pytest.mark.parametrize("text", _ZH_PROPERTY_CORPUS)
def test_zh_no_ascii_digits_survive(text):
    """Every ASCII digit must be verbalized — a surviving digit would be
    spelled out per-character by the tokenizer and wreck WER."""
    out = ZhNormalizer().normalize(text)
    assert not any(c.isdigit() for c in out), out


@pytest.mark.parametrize("text", _ZH_PROPERTY_CORPUS)
def test_zh_idempotent(text):
    """normalize(normalize(x)) == normalize(x) (tn FSTs accept their own
    output unchanged)."""
    n = ZhNormalizer()
    once = n.normalize(text)
    assert n.normalize(once) == once


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


EN_GOLDEN_EDGE = [
    # currency edges
    ("$0.99 sale", "ninety nine cents sale"),
    ("€2.50 fee", "two euros fifty cents fee"),
    ("£1.01", "one pound one penny"),
    ("$1,000,000 prize", "one million dollars prize"),
    ("$7 billion fund", "seven billion dollars fund"),
    # year edges
    ("in 2000", "in two thousand"),
    ("in 1900", "in nineteen hundred"),
    ("in 1905", "in nineteen o five"),
    ("in 2010s style", "in twenty tens style"),
    ("the 1980s", "the nineteen eighties"),
    # ordinal edges
    ("the 101st time", "the one hundred first time"),
    ("his 112th day", "his one hundred twelfth day"),
    ("20th century", "twentieth century"),
    ("the 3rd of May", "the third of may"),
    ("1000th customer", "one thousandth customer"),
]


@pytest.mark.parametrize("text,expect", EN_GOLDEN + EN_GOLDEN_EDGE)
def test_en_normalizer(text, expect):
    assert EnNormalizer().normalize(text) == expect


@pytest.mark.parametrize("text,expect", EN_GOLDEN + EN_GOLDEN_EDGE)
def test_en_idempotent(text, expect):
    n = EnNormalizer()
    assert n.normalize(expect) == expect


def test_en_no_digits_survive():
    n = EnNormalizer()
    for text, _ in EN_GOLDEN + EN_GOLDEN_EDGE:
        out = n.normalize(text)
        assert not any(c.isdigit() for c in out), (text, out)


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
