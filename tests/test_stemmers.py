"""Golden-token tests for the 38-language stemmer set (stemmers.py;
reference index.rs:642-721 StemmerType, applied in tokenizer.rs:576-589).

Every language asserts (a) specific golden stems and (b) that inflected
forms of the same lemma merge to one stem — the property BM25 recall
actually depends on.
"""

import pytest

from seekstorm_tpu.schema import StemmerType
from seekstorm_tpu.stemmers import get_stem_fn, supported
from seekstorm_tpu.tokenizer import Analyzer, stem_token
from seekstorm_tpu.schema import TokenizerType


ALL_LANGS = [s for s in StemmerType if s != StemmerType.Null]


def test_every_reference_language_has_an_implementation():
    # the reference supports 38 StemmerType languages (index.rs:642-721)
    assert len(ALL_LANGS) == 38
    for st in ALL_LANGS:
        assert get_stem_fn(st) is not None, st


def test_supported_list():
    assert "German" in supported() and "Turkish" in supported()


# --- exact Snowball tier (NLTK) --------------------------------------------

GOLDEN_SNOWBALL = {
    StemmerType.English: [("running", "run"), ("connections", "connect")],
    StemmerType.Porter: [("running", "run"), ("caresses", "caress")],
    StemmerType.German: [("aufeinanderfolgenden", "aufeinanderfolg"),
                         ("häuser", "haus")],
    StemmerType.French: [("continuellement", "continuel"),
                         ("majestueusement", "majestu")],
    StemmerType.Spanish: [("corriendo", "corr"), ("canciones", "cancion")],
    StemmerType.Italian: [("abbandonata", "abbandon"),
                          ("pronunciare", "pronunc")],
    StemmerType.Portuguese: [("bonitas", "bonit"), ("quilométricas",
                                                    "quilométr")],
    StemmerType.Dutch: [("lichamelijke", "licham")],
    StemmerType.DutchPorter: [("lichamelijke", "licham")],
    StemmerType.Russian: [("красивые", "красив"), ("пробегала", "пробега")],
    StemmerType.Swedish: [("klokaste", "klok")],
    StemmerType.Norwegian: [("billigere", "billiger")],
    StemmerType.Danish: [("dejligst", "dej")],
    StemmerType.Finnish: [("edeltäjistään", "edeltäj")],
    StemmerType.Hungarian: [("babakocsi", "babakocs")],
    StemmerType.Romanian: [("frumoasă", "frumoas")],
    StemmerType.Arabic: [("الكلمات", "كلم")],
}


@pytest.mark.parametrize("st", list(GOLDEN_SNOWBALL))
def test_snowball_golden(st):
    fn = get_stem_fn(st)
    for word, want in GOLDEN_SNOWBALL[st]:
        assert fn(word) == want, (st, word, fn(word))


# --- light-stemmer tier ------------------------------------------------------

GOLDEN_LIGHT = {
    # golden stems
    StemmerType.Esperanto: [("hundojn", "hund"), ("belaj", "bel"),
                            ("kuras", "kur")],
    StemmerType.Czech: [("studentech", "student"), ("studenty", "student")],
    StemmerType.Polish: [("domami", "dom"), ("domach", "dom")],
    StemmerType.Turkish: [("kitaplardan", "kitap"), ("kitaplar", "kitap"),
                          ("evlerinden", "ev")],
    StemmerType.Greek: [("καλός", "καλ"), ("καλή", "καλ")],
    StemmerType.Catalan: [("cançons", "canç"), ("clarament", "clar")],
    StemmerType.Indonesian: [("kebijakan", "bijak"), ("menyapu", "sapu"),
                             ("bukunya", "buku")],
    StemmerType.Lithuanian: [("namuose", "nam"), ("namas", "nam")],
    StemmerType.Estonian: [("raamatutega", "raamatu")],
    StemmerType.Ukrainian: [("червоного", "червон"), ("червоний", "червон")],
    StemmerType.Serbian: [("gradovima", "grad"), ("gradova", "grad")],
    StemmerType.Irish: [("bhfear", "fear"), ("timpeallachta", "timpeall")],
    StemmerType.Basque: [("etxearen", "etx"), ("etxeak", "etx")],
    StemmerType.Persian: [("کتاب‌ها", "کتاب"), ("بزرگتر", "بزرگ")],
    StemmerType.Hindi: [("लड़कियाँ", "लड़क"), ("लड़का", "लड़क")],
    StemmerType.Lovins: [("nationally", "nat"), ("magnesia", "magnes")],
}


@pytest.mark.parametrize("st", list(GOLDEN_LIGHT))
def test_light_golden(st):
    fn = get_stem_fn(st)
    for word, want in GOLDEN_LIGHT[st]:
        assert fn(word) == want, (st, word, fn(word))


MERGE_LIGHT = {
    # inflections of one lemma must map to one stem
    StemmerType.Armenian: ["գիրքը", "գիրքի"],
    StemmerType.Nepali: ["किताबहरू", "किताबको"],
    StemmerType.Tamil: ["புத்தகங்கள்", "புத்தகம்"],
    StemmerType.Yiddish: ["בוךן", "בוך"],
    StemmerType.Sesotho: ["dikgomo", "kgomo"],
    StemmerType.Esperanto: ["hundo", "hundoj", "hundojn"],
    StemmerType.Turkish: ["kitap", "kitaplar", "kitapları"],
    StemmerType.Ukrainian: ["книга", "книги"],
    StemmerType.Polish: ["kobieta", "kobiety"],
}


@pytest.mark.parametrize("st", list(MERGE_LIGHT))
def test_light_merges_inflections(st):
    fn = get_stem_fn(st)
    stems = {fn(w) for w in MERGE_LIGHT[st]}
    assert len(stems) == 1, (st, {w: fn(w) for w in MERGE_LIGHT[st]})


# --- pipeline integration ----------------------------------------------------

def test_analyzer_uses_language_stemmer():
    a = Analyzer(TokenizerType.UnicodeAlphanumeric, StemmerType.German)
    assert a.analyze("häuser") == [get_stem_fn(StemmerType.German)("häuser")]


def test_stem_token_dispatch():
    assert stem_token("running", StemmerType.English) == "run"
    assert stem_token("running", StemmerType.Null) == "running"
    assert stem_token("kitaplar", StemmerType.Turkish) == "kitap"


def test_nonnative_stemmer_index_roundtrip(tmp_path):
    """A German-stemmed index matches inflected forms (Python ingest path —
    index.py gates the C++ path on native stemmer support)."""
    import seekstorm_tpu as st

    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(stemmer=StemmerType.German)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    assert not idx._native
    idx.index_document({"body": "die häuser sind groß"})
    idx.commit()
    rs = idx.search(st.SearchRequest(query="haus"))
    assert rs.result_count == 1
    rs = idx.search(st.SearchRequest(query="hauses"))
    assert rs.result_count == 1
