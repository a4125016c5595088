import pytest

from reazonspeech_tpu.core.text import (
    calculate_cer,
    cer,
    edit_distance,
    normalize,
    normalize_eval,
    num_to_ja,
)


# ---------------------------------------------------------------------------
# edit distance
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "a,b,d",
    [
        ("", "", 0),
        ("a", "", 1),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
        ("こんにちは", "こんばんは", 2),
        ("abc", "abc", 0),
        ("abc", "axc", 1),
    ],
)
def test_edit_distance(a, b, d):
    assert edit_distance(a, b) == d


# ---------------------------------------------------------------------------
# corpus (oneseg) normalizer: strip symbols, han->zen
# ---------------------------------------------------------------------------

def test_normalize_strips_symbols():
    assert normalize("こんにちは。") == "こんにちは"
    assert normalize("≪こんにちは!") == "こんにちは"
    assert normalize("(テスト)　です…") == "テストです"


def test_normalize_han2zen():
    assert normalize("abc123") == "ａｂｃ１２３"
    assert normalize("ABC") == "ＡＢＣ"


def test_cer():
    # 5 chars after normalize, 2 substitutions
    assert cer("こんにちは。", "こんばんは") == pytest.approx(2 / 5)
    assert cer("テスト", "テスト") == 0.0


# ---------------------------------------------------------------------------
# Japanese numerals (num2words ja parity)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "num,words",
    [
        ("0", "零"),
        ("1", "一"),
        ("10", "十"),
        ("11", "十一"),
        ("100", "百"),
        ("123", "百二十三"),
        ("1000", "千"),
        ("1111", "千百十一"),
        ("10000", "一万"),
        ("15000000", "千五百万"),
        ("100000000", "一億"),
        ("3.14", "三点一四"),
        ("0.5", "零点五"),
    ],
)
def test_num_to_ja(num, words):
    assert num_to_ja(num) == words


# ---------------------------------------------------------------------------
# evaluation normalizer: strip punct, zen->han, digits->kanji
# ---------------------------------------------------------------------------

def test_normalize_eval():
    assert normalize_eval("こんにちは、世界。") == "こんにちは世界"
    assert normalize_eval("ＡＢＣ１２３") == "ABC" + "百二十三"
    assert normalize_eval("3人") == "三人"
    assert normalize_eval("気温は25.5度") == "気温は二十五点五度"


def test_normalize_eval_overflow_returns_unchanged():
    s = "9" * 100  # beyond the numeral unit table
    out = normalize_eval(s)
    assert out == s


def test_calculate_cer():
    r = calculate_cer("こんにちは。", "こんにちは")
    assert r["distance"] == 0
    assert r["cer"] == 0.0
    assert r["length"] == 5

    r = calculate_cer("こんにちは", "こんばんは")
    assert r["distance"] == 2
    assert r["cer"] == pytest.approx(2 / 5)
