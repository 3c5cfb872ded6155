"""Deterministic transliteration fixtures (hand-romanized, pinning both
the romanization table and the NFKD composition) + latin-name fallback."""

import pandas as pd
import pytest

from planetiler_ray.functions import language


@pytest.mark.parametrize("src,expected", language.TRANSLIT_FIXTURES)
def test_transliterate_fixture(src, expected):
    assert language.transliterate_str(src) == expected


def test_transliterate_series_and_empty():
    s = pd.Series(["Москва", None, "", "abc"])
    out = language.transliterate(s)
    assert out.tolist() == ["Moskva", "", "", "abc"]


def test_transliterate_idempotent_on_ascii():
    for _, latin in language.TRANSLIT_FIXTURES:
        if latin.isascii():
            assert language.transliterate_str(latin) == latin


def test_latin_name_uses_translit_fallback():
    name = pd.Series(["Paris", "Москва"])
    out = language.latin_name(name)
    assert out.tolist() == ["Paris", "Moskva"]
