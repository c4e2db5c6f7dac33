"""The ctypes libicui18n binding (functions/icu_ctypes.py) — the
zero-third-party path that runs the reference's REAL ICU key-folding
rules (MetadataUtils.php:416-433, conf/recordmanager.ini.sample:19-25
— behavioral spec, not code) on images where the PyICU wheel is
absent but the ICU shared library is present (every mainstream Linux
base, including this container)."""

import pytest

from recordmanager_spark.functions import icu_ctypes as IC
from recordmanager_spark.functions.keys import (
    _ICU_KEY_FOLDING_RULES,
    icu_available,
    normalize_key_py,
)

pytestmark = pytest.mark.skipif(
    not IC.available(), reason="libicui18n not loadable"
)


@pytest.fixture(scope="module")
def tr():
    return IC.Transliterator.createFromRules(
        "rm_key_folding", _ICU_KEY_FOLDING_RULES, IC.UTransDirection.FORWARD
    )


def test_reference_normalize_key_goldens(tr):
    # MetadataUtilsTest.php testNormalizeKey, default ini rules
    assert tr.transliterate("A -.*B  C") == "abc"
    assert tr.transliterate("ÖÄÅöäåüïé") == "oaaoaauie"
    assert tr.transliterate("AaÖÄÅöäåüï") == "aaoaaoaaui"


def test_han_kana_cyrillic_fold(tr):
    # capabilities beyond the data-driven table fold: Han -> pinyin
    assert tr.transliterate("北京") == "běijīng"
    assert tr.transliterate("とうきょう") == "toukyou"
    assert tr.transliterate("Война и мир") == "vojnaimir"


def test_empty_and_expansion(tr):
    assert tr.transliterate("") == ""
    # Han expands several-fold; exercise the buffer-growth retry with a
    # string long enough that 4x the UTF-16 input under-allocates only
    # if the retry loop is broken
    long_han = "漢" * 500
    out = tr.transliterate(long_han)
    assert out == "hàn" * 500


def test_documented_table_fold_divergences(tr):
    """The exact divergences keys.py documents between the default
    table fold and ICU — pinned so a future table change that silently
    'fixes' one direction gets noticed."""
    # ICU strips the en dash ([^letter number] Remove); the table
    # fold's ASCII strip ranges keep it
    assert tr.transliterate("a–b") == "ab"
    assert normalize_key_py("a–b") == "a–b"
    # digraph kana: ICU renders the digraph, the per-char table spells
    # it letter-by-letter
    assert tr.transliterate("きゃ") == "kya"
    assert normalize_key_py("きゃ") == "kiya"
    # sokuon gemination: ICU doubles the consonant, the table drops it
    assert tr.transliterate("がっこう") == "gakkou"
    assert normalize_key_py("がっこう") == "gakou"


def test_collator_swedish_after_z():
    coll = IC.Collator.createInstance("sv")
    words = ["ärlig", "zebra", "apa", "öga", "åka"]
    assert sorted(words, key=coll.key()) == [
        "apa", "zebra", "åka", "ärlig", "öga"
    ]
    assert coll.compare("apa", "zebra") < 0
    assert coll.compare("åka", "zebra") > 0
    assert coll.compare("apa", "apa") == 0


def test_icu_available_sees_ctypes_binding():
    assert icu_available() is True


def test_bad_rules_raise():
    with pytest.raises(IC.ICUError):
        IC.Transliterator.createFromRules("broken", ":: NotARealRule ;;[")
