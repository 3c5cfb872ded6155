"""Name-tag / language utilities + broadcast translation join.

Analogues of the reference's ``util/LanguageUtils.java:18-118`` (name-tag
validity, latin detection, transliteration fallback) and the
Wikidata-translations broadcast join (``util/Wikidata.java`` +
``Planetiler.java:925-927``): a small id->translations mapping is broadcast
once with ``ray.put`` and joined inside ``map_batches`` — no shuffle.

No ICU in this sandbox, so transliteration is a deterministic public-data
pipeline: a per-character romanization table (UNGEGN/BGN-style Cyrillic +
Greek, ICU-Latin-ASCII special letters, simple Hebrew/Arabic) composed
with NFKD combining-mark stripping.  CJK falls through to the configured
fallback, mirroring the reference's "latin name or fallback" contract.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa

_LATIN_RE = re.compile(
    "^[\\u0020-\\u007E\\u00A0-\\u024F\\u1E00-\\u1EFF\\u0300-\\u036F]*$"
)
_NAME_KEY_RE = re.compile(r"^name:(?P<lang>[a-z]{2,3}(?:-[A-Za-z]{2,4})?)$")


def is_latin(s: pd.Series) -> np.ndarray:
    """True where the string is entirely latin-script (LanguageUtils
    ``containsOnlyLatinCharacters``)."""
    return s.fillna("").map(lambda v: bool(_LATIN_RE.match(v))).to_numpy()


def valid_name_key(key: str) -> bool:
    """``name:<lang>`` tag-key validity (LanguageUtils ``isValidOsmNameTag``)."""
    return bool(_NAME_KEY_RE.match(key))


# Deterministic per-character Latin romanization table (round 5 — closes
# the NFKD-only gap vs the reference's ICU Any-Latin pipeline,
# ``util/ThreadLocalTransliterator.java:18``).  Built from PUBLIC
# romanization conventions: UNGEGN/BGN-style Cyrillic, UNGEGN Greek,
# ICU Latin-ASCII special-letter foldings.  Uppercase source letters map
# to Capitalized outputs (Ж -> Zh).  CJK and unmapped scripts pass
# through (callers fall back, mirroring the reference's latin-or-fallback
# contract).
_ROMAN = {
    # Latin letters NFKD cannot decompose (ICU Latin-ASCII foldings)
    "ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ŋ": "ng", "Ŋ": "Ng", "ı": "i", "ĸ": "k",
    # Cyrillic (BGN/PCGN-style, system-consistent)
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "yo", "ж": "zh", "з": "z", "и": "i", "й": "j", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts",
    "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "",
    "э": "e", "ю": "yu", "я": "ya", "є": "ye", "і": "i", "ї": "yi",
    "ґ": "g", "ў": "w", "ђ": "dj", "ј": "j", "љ": "lj", "њ": "nj",
    "ћ": "c", "џ": "dz",
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E",
    "Ё": "Yo", "Ж": "Zh", "З": "Z", "И": "I", "Й": "J", "К": "K",
    "Л": "L", "М": "M", "Н": "N", "О": "O", "П": "P", "Р": "R",
    "С": "S", "Т": "T", "У": "U", "Ф": "F", "Х": "Kh", "Ц": "Ts",
    "Ч": "Ch", "Ш": "Sh", "Щ": "Shch", "Ъ": "", "Ы": "Y", "Ь": "",
    "Э": "E", "Ю": "Yu", "Я": "Ya", "Є": "Ye", "І": "I", "Ї": "Yi",
    "Ґ": "G", "Ў": "W", "Ђ": "Dj", "Ј": "J", "Љ": "Lj", "Њ": "Nj",
    "Ћ": "C", "Џ": "Dz",
    # Greek (UNGEGN-style)
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "i", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "y", "φ": "f", "χ": "ch", "ψ": "ps",
    "ω": "o",
    "Α": "A", "Β": "V", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z",
    "Η": "I", "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M",
    "Ν": "N", "Ξ": "X", "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S",
    "Τ": "T", "Υ": "Y", "Φ": "F", "Χ": "Ch", "Ψ": "Ps", "Ω": "O",
    # Hebrew (simple consonantal)
    "א": "a", "ב": "b", "ג": "g", "ד": "d", "ה": "h", "ו": "v",
    "ז": "z", "ח": "ch", "ט": "t", "י": "y", "כ": "k", "ך": "k",
    "ל": "l", "מ": "m", "ם": "m", "נ": "n", "ן": "n", "ס": "s",
    "ע": "", "פ": "p", "ף": "f", "צ": "ts", "ץ": "ts", "ק": "k",
    "ר": "r", "ש": "sh", "ת": "t",
    # Arabic (simple)
    "ا": "a", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h",
    "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s",
    "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "",
    "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m",
    "ن": "n", "ه": "h", "و": "w", "ي": "y", "ة": "a", "ء": "",
    "ى": "a", "آ": "a", "أ": "a", "إ": "i", "ؤ": "w", "ئ": "y",
}
_ROMAN_TABLE = {ord(k): v for k, v in _ROMAN.items()}


def transliterate_str(v: str) -> str:
    """Deterministic Latin transliteration of one string: romanization
    table pass (catches precomposed letters like й whose NFKD base would
    lose the diacritic's meaning), then NFKD + combining-mark strip, then
    a second table pass over bases exposed by the decomposition
    (ή -> η -> i)."""
    v = v.translate(_ROMAN_TABLE)
    norm = unicodedata.normalize("NFKD", v)
    stripped = "".join(c for c in norm if not unicodedata.combining(c))
    return stripped.translate(_ROMAN_TABLE)


def transliterate(s: pd.Series) -> pd.Series:
    """Latin transliteration: romanization table + NFKD accent strip
    (:func:`transliterate_str` per value)."""
    return s.fillna("").map(transliterate_str)


#: HAND-DERIVED (source, expected-latin) fixtures — written from the
#: documented romanization conventions, NOT generated by the function, so
#: they pin both the table and the NFKD composition (unit tests + the
#: ``translit_names`` exact-oracle query build its SQL literals from the
#: expected column).
TRANSLIT_FIXTURES = [
    ("Москва", "Moskva"),
    ("Санкт-Петербург", "Sankt-Peterburg"),
    ("Нижний Новгород", "Nizhnij Novgorod"),
    ("Ярославль", "Yaroslavl"),
    ("Щецин", "Shchetsin"),
    ("Київ", "Kiyiv"),
    ("Беларусь", "Belarus"),
    ("Αθήνα", "Athina"),
    ("Θεσσαλονίκη", "Thessaloniki"),
    ("Αγία Νάπα", "Agia Napa"),
    ("Zürich", "Zurich"),
    ("São Paulo", "Sao Paulo"),
    ("Łódź", "Lodz"),
    ("København", "Kobenhavn"),
    ("Šibenik", "Sibenik"),
    ("İstanbul", "Istanbul"),
    ("Straße", "Strasse"),
    ("Tōkyō", "Tokyo"),
    ("תל אביב", "tl abyb"),
    ("東京", "東京"),  # CJK passes through (caller falls back)
]


def latin_name(name: pd.Series, name_en: pd.Series | None = None) -> pd.Series:
    """The reference's latin-name selection: name if latin, else name:en,
    else transliteration of name."""
    lat = is_latin(name)
    out = name.copy()
    if name_en is not None:
        out = out.where(lat, name_en)
        missing = ~lat & (name_en.isna() | (name_en == ""))
    else:
        missing = ~lat
    if missing.any():
        out.loc[missing] = transliterate(name[missing])
    return out


class TranslationJoiner:
    """Broadcast translation join stage: adds ``name_<lang>`` columns from a
    small id->{lang: name} mapping (the Wikidata-QID pattern).

    Usage:
        handle = ray.put({qid: {"en": ..., "de": ...}, ...})
        ds.map_batches(TranslationJoiner, fn_constructor_args=(handle, ["en"]),
                       batch_format="pyarrow", concurrency=(1, 4))
    """

    def __init__(self, translations_handle, langs: list[str],
                 key_col: str = "wikidata_id"):
        try:
            import ray

            if isinstance(translations_handle, ray.ObjectRef):
                translations_handle = ray.get(translations_handle)
        except ImportError:
            pass
        self.translations: dict = translations_handle
        self.langs = langs
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        for lang in self.langs:
            vals = [
                (self.translations.get(k) or {}).get(lang) if k is not None else None
                for k in keys
            ]
            batch = batch.append_column(f"name_{lang}", pa.array(vals, pa.string()))
        return batch
