"""Text normalizers (reference re-exports whisper.normalizers,
__init__.py:2; evaluation harnesses normalize both sides before WER)."""

import pytest

from whisper_timestamped_tpu.normalizers import (
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishSpellingNormalizer,
    EnglishTextNormalizer,
    remove_symbols,
    remove_symbols_and_diacritics,
)


def test_remove_symbols_and_diacritics():
    assert remove_symbols_and_diacritics("héllo, wörld!") == "hello  world "
    assert remove_symbols("héllo!") == "héllo "
    assert remove_symbols_and_diacritics("a.b", keep=".") == "a.b"


def test_basic_normalizer():
    n = BasicTextNormalizer()
    assert n("Héllo, WORLD!!  ") == "héllo world"
    assert n("keep [this] out (and this) <also>") == "keep out"
    assert BasicTextNormalizer(remove_diacritics=True)("Héllo!") == "hello"


def test_basic_split_letters():
    n = BasicTextNormalizer(split_letters=True)
    assert n("ab cd") == "a b c d"


@pytest.mark.parametrize(
    "src,expect",
    [
        ("one hundred twenty three", "123"),
        ("one hundred and five", "105"),
        ("twenty-one", "21"),
        ("seventeen", "17"),
        ("two thousand and one", "2001"),
        ("three million four hundred thousand", "3400000"),
        ("zero", "0"),
        ("minus five", "-5"),
        ("three point one four", "3.14"),
        ("fifty percent", "50%"),
        ("five dollars", "$5"),
        ("five dollars and twenty cents", "$5.20"),
        ("twenty-first", "21st"),
        ("second", "2nd"),
        ("third", "3rd"),
        ("twelfth", "12th"),
        ("hundredth", "100th"),
        # separate numbers stay separate
        ("one two three", "1 2 3"),
        ("nineteen eighty", "19 80"),
        # non-numbers untouched
        ("one day at a time", "1 day at a time"),
        ("a hundred people", "a 100 people"),
    ],
)
def test_number_normalizer(src, expect):
    assert EnglishNumberNormalizer()(src) == expect


@pytest.mark.parametrize(
    "src,expect",
    [
        ("colour", "color"),
        ("colours", "colors"),
        ("colourful", "colorful"),
        ("favourite", "favorite"),
        ("centre", "center"),
        ("theatre", "theater"),
        ("organise", "organize"),
        ("organised", "organized"),
        ("organisation", "organization"),
        ("realise", "realize"),
        ("analyse", "analyze"),
        ("analysed", "analyzed"),
        ("travelled", "traveled"),
        ("travelling", "traveling"),
        ("defence", "defense"),
        ("programme", "program"),
        ("aluminium", "aluminum"),
        # NOT suffix-rule victims
        ("surprise", "surprise"),
        ("exercise", "exercise"),
        ("otherwise", "otherwise"),
        ("promise", "promise"),
        ("noise", "noise"),
        ("hour", "hour"),
        ("tour", "tour"),
        ("genre", "genre"),
        ("acre", "acre"),
    ],
)
def test_spelling_normalizer(src, expect):
    assert EnglishSpellingNormalizer()(src) == expect


@pytest.mark.parametrize(
    "src,expect",
    [
        ("Mr. Brown's colour TV won't work!", "mister browns color tv will not work"),
        ("I've got one hundred and five reasons.", "i have got 105 reasons"),
        ("They're organising the theatre [applause].",
         "they are organizing the theater"),
        ("It costs five dollars and twenty cents.", "it costs $5.20"),
        ("Dr. Smith travelled 3.5 km.", "doctor smith traveled 3.5 km"),
        ("twenty-first century", "21st century"),
        ("let's go, y'all!", "let us go you all"),
        ("He said 1,000 times", "he said 1000 times"),
    ],
)
def test_english_text_normalizer(src, expect):
    assert EnglishTextNormalizer()(src) == expect


def test_package_export():
    import whisper_timestamped_tpu as wtt

    assert wtt.normalizers.EnglishTextNormalizer is EnglishTextNormalizer
    assert wtt.normalizers.BasicTextNormalizer is BasicTextNormalizer
