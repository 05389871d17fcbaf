"""Externally-anchored goldens for the zh normalizer (VERDICT r3 item 7).

Provenance. The reference normalizes with WeTextProcessing
(`/root/reference/indextts/utils/front.py:115-138`, zh config
remove_interjections=False, remove_erhua=False). Neither WeTextProcessing
nor its pynini toolchain is installable in this image and the image has no
network egress, so recorded library outputs cannot be produced here. The
vectors below are instead reproduced from the PUBLISHED example corpora of
the rule sources themselves:

- [WTP]  wenet-e2e/WeTextProcessing README usage examples
         (``normalizer.normalize("2.5平方电线")`` etc.).
- [SIO]  speechio/chinese_text_normalization README sample block — the
         categorized TN demonstration (固话/手机/分数/百分数/编号/纯数/
         日期/金钱/特殊 lines). WeTextProcessing documents benchmarking
         against this corpus, and its zh TN rules reproduce these outputs.
- [FAM]  same-rule variants of a cited vector (digits changed, same rule
         family) — anchored to the family's published behavior rather than
         a verbatim published string.

Each case is tagged. Verbatim-published cases ([WTP]/[SIO]) take priority:
where the previously self-derived goldens conflicted with them, the
NORMALIZER was corrected, not the golden. Behavioral corrections made when
these vectors were adopted (round 4):

1. Landline continuations (``0595-23865596或23880880``) now read the bare
   7/8-digit continuation digit-wise like the telephone before it, instead
   of as a 千万-scale cardinal. [SIO 固话]
2. ``+86`` before a mobile number reads 加八六 (and absorbs the
   separator), instead of "+八十六". [SIO 手机]
3. Pure digit runs of >= 12 digits (serials/IDs) read digit-wise instead
   of as 万亿-scale cardinals. [SIO 编号]
4. O2O/B2C/B2B/C2C/P2P read with English "to" (whitelist — a general
   [A-Z]2[A-Z] rule would corrupt H2O). [SIO 特殊]
5. Non-time colon pairs read as ratios: 1:5 -> 一比五 (H:MM times still
   win: 8:00 -> 八点). [SIO 数学/比例]
"""

import pytest

from indextts_tpu.text.normalize_zh import ZhNormalizer

_N = ZhNormalizer()

# ---------------------------------------------------------------------------
# [SIO] speechio/chinese_text_normalization README sample block, verbatim
# ---------------------------------------------------------------------------
SIO_VERBATIM = [
    ("固话:0595-23865596或23880880。",
     "固话:零五九五二三八六五五九六或二三八八零八八零。"),
    ("手机:+86 19859213959或15659451527。",
     "手机:加八六幺九八五九二幺三九五九或幺五六五九四五幺五二七。"),
    ("分数:32477/76391。",
     "分数:七万六千三百九十一分之三万二千四百七十七。"),
    ("百分数:80.03%。", "百分数:百分之八十点零三。"),
    ("编号:31520181154418。", "编号:三一五二零一八一一五四四一八。"),
    ("纯数:2983.07克或12345.60米。",
     "纯数:二千九百八十三点零七克或一万二千三百四十五点六零米。"),
    ("日期:1999年2月20日或09年3月15号。",
     "日期:一九九九年二月二十日或零九年三月十五号。"),
    ("金钱:12块5,34.5元,20.1万。", "金钱:十二块五,三十四点五元,二十点一万。"),
    ("特殊:O2O或B2C。", "特殊:O to O或B to C。"),
]

# ---------------------------------------------------------------------------
# [WTP] WeTextProcessing README usage examples, verbatim
# ---------------------------------------------------------------------------
WTP_VERBATIM = [
    ("2.5平方电线", "二点五平方电线"),
]

# ---------------------------------------------------------------------------
# [FAM] family variants anchored to the cited vectors above: the same rule
# applied to different digit material. One entry per family, several probes.
# ---------------------------------------------------------------------------
FAM = [
    # telephone family [SIO 固话/手机]
    ("010-65238888", "零幺零六五二三八八八八"),
    ("021-2369448或23694480。", "零二幺二三六九四四八或二三六九四四八零。"),
    ("13802938293", "幺三八零二九三八二九三"),
    ("+8613802938293", "加八六幺三八零二九三八二九三"),
    # fraction family [SIO 分数]
    ("3/4", "四分之三"),
    ("1/2的概率", "二分之一的概率"),
    ("105/206", "二百零六分之一百零五"),
    # percent family [SIO 百分数]
    ("62%", "百分之六十二"),
    ("0.5%", "百分之零点五"),
    ("-3.5%", "负百分之三点五"),
    ("100%", "百分之一百"),
    # long-identifier family [SIO 编号]
    ("440301198408154416", "四四零三零一一九八四零八一五四四一六"),
    ("123456789012", "一二三四五六七八九零一二"),
    # decimal + measure family [SIO 纯数 / WTP]
    ("2983.07克", "二千九百八十三点零七克"),
    ("12.60米", "十二点六零米"),
    ("3.14", "三点一四"),
    ("-0.5", "负零点五"),
    ("0.01", "零点零一"),
    # date family [SIO 日期]
    ("1999年2月20日", "一九九九年二月二十日"),
    ("09年3月15号", "零九年三月十五号"),
    ("2021年8月24日", "二零二一年八月二十四日"),
    ("2021/08/24", "二零二一年八月二十四日"),
    ("2021-08-24", "二零二一年八月二十四日"),
    ("8月24日", "八月二十四日"),
    ("10月1号", "十月一号"),
    # money family [SIO 金钱]
    ("12块5", "十二块五"),
    ("34.5元", "三十四点五元"),
    ("20.1万", "二十点一万"),
    ("￥13.5", "十三点五元"),
    ("$3.5", "三点五美元"),
    # special-abbrev family [SIO 特殊]
    ("B2B和C2C以及P2P", "B to B和C to C以及P to P"),
    # ratio family [SIO 数学]
    ("比例1:5", "比例一比五"),
    ("比分3:2", "比分三比二"),
    ("16:9的屏幕", "十六比九的屏幕"),
    # time family (H:MM wins over ratio) [SIO 数学/时间]
    ("8:00起床", "八点起床"),
    ("23:59", "二十三点五十九分"),
    ("08:05:59", "八点零五分五十九秒"),
    # cardinal family [SIO 纯数]
    ("3456万吨", "三千四百五十六万吨"),
    ("10000", "一万"),
    ("100500", "十万零五百"),
    ("-25", "负二十五"),
]


@pytest.mark.parametrize("text,want", SIO_VERBATIM,
                         ids=[t[:12] for t, _ in SIO_VERBATIM])
def test_sio_verbatim(text, want):
    assert _N.normalize(text) == want


@pytest.mark.parametrize("text,want", WTP_VERBATIM)
def test_wtp_verbatim(text, want):
    assert _N.normalize(text) == want


@pytest.mark.parametrize("text,want", FAM, ids=[t[:14] for t, _ in FAM])
def test_family_variants(text, want):
    assert _N.normalize(text) == want


def test_whitelist_does_not_touch_formulas():
    # the "to" rule is a whitelist: H2O must NOT read "H to O" (the digit
    # itself still verbalizes, like any digit between letters)
    assert "to" not in _N.normalize("H2O")


def test_corpus_size():
    # the external anchor set stays >= 50 vectors (VERDICT r3 item 7)
    assert len(SIO_VERBATIM) + len(WTP_VERBATIM) + len(FAM) >= 50


# ===========================================================================
# English section (r5 — VERDICT r4 item 6). Provenance: on Linux the
# reference loads WeTextProcessing's `tn.english.normalizer.Normalizer`
# (`/root/reference/indextts/utils/front.py:130-138`); WeTextProcessing
# documents its English rules as ported from NVIDIA NeMo's en_tn grammars.
# Neither pynini package is installable here (no egress), so the vectors
# are reproduced from the rule sources' PUBLISHED example corpora:
#
# - [NEMO] NVIDIA NeMo text_normalization docs + en grammar test data
#          examples (the upstream WeTextProcessing en states it ports):
#          cardinal without "and"/hyphens, decimal digit-wise after
#          "point", year two-digit pairs, money major/minor units,
#          dates "jan. 5, 2012 -> january fifth twenty twelve",
#          measures pluralized by value, 10:00a.m. -> "ten a m".
# - [FAM]  same-rule-family variants of a cited vector (digits changed,
#          same family behavior).
#
# Where the normalizer conflicted with these family behaviors it was
# CORRECTED (round 5), not the vector:
#  1. integer ranges "50-60" read "fifty to sixty" (was a glued
#     "fiftyminus sixty").
#  2. two-digit decades "the 90s"/"'90s" read "the nineties" (was the
#     pluralized cardinal "ninetys").
#  3. glued alphanumerics split as serials: "A4" -> "A four", "B2B" ->
#     "B two B" (was verbalized with no space: "Afour").
#  4. "-" only reads "minus" when NOT preceded by a letter ("mid-1990s"
#     no longer emits "midminus ...").
#  5. 1-800-style telephone prefixes read digit-wise with the trunk "1"
#     (was "oneminus eight hundredminus ...").
#  6. "24/7" is whitelisted to "twenty four seven" (was the fraction
#     "twenty four sevenths").
#  7. roman numerals (>= 2 chars): structural context reads cardinals
#     ("Chapter XIV" -> "Chapter fourteen"), name context reads regnal
#     ordinals ("Henry VIII" -> "Henry the eighth") — family previously
#     missing entirely.
#  8. (r5 review) roman name-context is a regnal-name WHITELIST and only
#     canonical roman strings convert — "any capitalized word" fired on
#     sentence-initial articles ("The IV drip" -> "The the fourth drip")
#     and roman_to_int accepted XXL.
#  9. (r5 review) year ranges keep year readings: "1939-1945" ->
#     "nineteen thirty nine to nineteen forty five", not thousand-scale
#     cardinals.
# ===========================================================================

from indextts_tpu.text.normalize_en import EnNormalizer

_EN = EnNormalizer()

EN_CASES = [
    # --- cardinal [NEMO: no "and", no hyphens] -----------------------------
    ("23", "twenty three"),
    ("123", "one hundred twenty three"),
    ("1,234,567",
     "one million two hundred thirty four thousand five hundred sixty seven"),
    ("-24", "minus twenty four"),                                   # [FAM]
    ("007", "zero zero seven"),                                     # [NEMO]
    # --- decimal [NEMO: fraction digit-wise after "point"] -----------------
    ("12.56", "twelve point five six"),
    ("-0.5", "minus zero point five"),                              # [FAM]
    ("3.14159", "three point one four one five nine"),              # [FAM]
    # --- ordinal [NEMO] ----------------------------------------------------
    ("21st", "twenty first"),
    ("2nd", "second"),                                              # [FAM]
    ("103rd", "one hundred third"),                                 # [FAM]
    ("12th", "twelfth"),                                            # [FAM]
    # --- date [NEMO: "jan. 5, 2012 -> january fifth twenty twelve"] --------
    ("Jan. 5, 2012", "january fifth twenty twelve"),
    ("January 21, 1999", "january twenty first nineteen ninety nine"),  # [FAM]
    ("5 January 2012", "the fifth of january twenty twelve"),       # [NEMO]
    ("May 2024", "may twenty twenty four"),                         # [FAM]
    # --- year [NEMO: two-digit pairs; o for x0x; hundred for xx00] ---------
    ("1984", "nineteen eighty four"),
    ("in 2005", "in two thousand five"),
    ("1905", "nineteen o five"),
    ("1900", "nineteen hundred"),
    ("the 1980s", "the nineteen eighties"),
    ("the 90s", "the nineties"),                                    # [FAM] corr. 2
    # --- time [NEMO: "10:00a.m. -> ten a m"] -------------------------------
    ("10:00 a.m.", "ten a m"),
    ("10:30", "ten thirty"),                                        # [FAM]
    ("8:05 pm", "eight o five p m"),                                # [FAM]
    ("12:00", "twelve o'clock"),                                    # [NEMO]
    # --- money [NEMO: major/minor units, scale words] ----------------------
    ("$123", "one hundred twenty three dollars"),
    ("$1.25", "one dollar twenty five cents"),
    ("$0.99", "ninety nine cents"),                                 # [FAM]
    ("$3.5 million", "three point five million dollars"),           # [NEMO]
    ("£12", "twelve pounds"),
    ("£1.50", "one pound fifty pence"),                             # [FAM]
    ("€50", "fifty euros"),                                         # [FAM]
    ("$1", "one dollar"),                                           # [FAM]
    # --- percent [FAM of the zh SIO percent family] ------------------------
    ("20%", "twenty percent"),
    ("80.03%", "eighty point zero three percent"),
    # --- measure [NEMO: pluralized by value] --------------------------------
    ("12 kg", "twelve kilograms"),
    ("1 km", "one kilometer"),
    ("3.5 km", "three point five kilometers"),                      # [FAM]
    ("100 km/h", "one hundred kilometers per hour"),                # [FAM]
    ("-3 °C", "minus three degrees celsius"),                       # [FAM]
    # --- fraction [NEMO: halves/quarters special-cased] ---------------------
    ("2/3", "two thirds"),
    ("1/2", "one half"),
    ("3/4", "three quarters"),
    # --- telephone [NEMO: digit-wise] ----------------------------------------
    ("555-123-4567", "five five five one two three four five six seven"),
    ("1-800-555-0199",
     "one eight zero zero five five five zero one nine nine"),      # corr. 5
    # --- ranges [NEMO range family] ------------------------------------------
    ("50-60", "fifty to sixty"),                                    # corr. 1
    ("page 5-10", "page five to ten"),                              # [FAM]
    # --- serial/alphanumeric [NEMO serial family] ----------------------------
    ("A4 paper", "A four paper"),                                   # corr. 3
    ("B2B", "B two B"),                                             # [FAM]
    ("MP3 player", "MP three player"),                              # [FAM]
    # --- roman numerals [NEMO roman family] ----------------------------------
    ("Chapter XIV", "Chapter fourteen"),                            # corr. 7
    ("Henry VIII", "Henry the eighth"),
    ("World War II", "World War two"),                              # [FAM]
    ("Elizabeth II", "Elizabeth the second"),                       # [FAM]
    # --- whitelist [NEMO whitelist.tsv subset] -------------------------------
    ("Mr. Smith", "mister Smith"),
    ("Mrs. Lee", "misses Lee"),
    ("Dr. Brown", "doctor Brown"),
    ("etc.", "et cetera"),
    ("No. 5", "number five"),
    ("24/7", "twenty four seven"),                                  # corr. 6
    # --- negative guards ------------------------------------------------------
    ("mid-1990s", "mid-nineteen nineties"),                         # corr. 4
    ("I love IV bags", "I love IV bags"),   # 2-char roman needs context
    # r5 review corrections: roman name-context is a whitelist (any
    # capitalized word fired on sentence-initial articles), non-canonical
    # roman strings never convert, year ranges keep year readings
    ("The IV drip was inserted", "The IV drip was inserted"),
    ("Sizes XXL and XL", "Sizes XXL and XL"),
    ("The XI meeting", "The XI meeting"),
    ("the war of 1939-1945",
     "the war of nineteen thirty nine to nineteen forty five"),
    ("2010-2015", "twenty ten to twenty fifteen"),
]


@pytest.mark.parametrize("text,expected", EN_CASES,
                         ids=[c[0] for c in EN_CASES])
def test_en_external_goldens(text, expected):
    assert _EN.normalize(text) == expected
