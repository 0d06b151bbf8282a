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


def test_nonnative_stemmer_index_roundtrip(tmp_path, monkeypatch):
    """With the native library disabled, a Turkish-stemmed index matches
    inflected forms via the Python ingest path (the gate index.py applies
    when the C++ stemmer is unavailable)."""
    import seekstorm_tpu as st

    monkeypatch.setenv("SEEKSTORM_TPU_NO_NATIVE", "1")
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(stemmer=StemmerType.Turkish)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    assert not idx._native
    idx.index_document({"body": "kitaplar okundu"})
    idx.commit()
    rs = idx.search(st.SearchRequest(query="kitap"))
    assert rs.result_count == 1
    rs = idx.search(st.SearchRequest(query="kitaplardan"))
    assert rs.result_count == 1


def test_light_native_parity_and_roundtrip(tmp_path):
    """Every light-tier language's C++ port is byte-identical to its
    Python implementation (tables are GENERATED from stemmers.py;
    control flow fuzz-verified), and a Turkish index now rides the
    native ingest fast path end-to-end."""
    import random

    import seekstorm_tpu as st
    from seekstorm_tpu import native as native_mod
    from seekstorm_tpu.native import snowball_stem_fn, _STEMMER_IDS
    from seekstorm_tpu.stemmers import _LIGHT

    if native_mod.load() is None:
        pytest.skip("native library not built")
    random.seed(11)
    alphas = {
        StemmerType.Turkish: "abcdefgiklmnoprstuvyzçğıöşü",
        StemmerType.Czech: "abcdehiklmnoprstuvyzáéěíůýčšž",
        StemmerType.Greek: "αβγδεζηθικλμνξοπρστυφχψωάέήίόύώς",
        StemmerType.Ukrainian: "абвгдежзиклмнопрстуфхцчшщьюяії",
        StemmerType.Indonesian: "abdeghijklmnoprstuwy",
        StemmerType.Hindi: "कखगचजटतदनपबमयरलवशसहािीुूेो",
        StemmerType.Irish: "abcdefghilmnoprstuáéíóú-",
        StemmerType.Serbian: "abcdefghijklmnoprstuvzđčćšž",
        StemmerType.Persian: "ابپتثجچحخدرزسشصطعغفقکگلمنوهی‌",
        StemmerType.Lovins: "abcdefghijklmnopqrstuvwxyz",
    }
    for stype, alpha in alphas.items():
        native = snowball_stem_fn(stype.value)
        assert native is not None, stype
        py = _LIGHT[stype]
        for _ in range(300):
            w = "".join(random.choice(alpha)
                        for _ in range(random.randint(1, 12)))
            assert native(w) == py(w), (stype, w, native(w), py(w))
    # remaining light languages at least dispatch natively
    for name, lid in _STEMMER_IDS.items():
        if lid >= 16:
            assert native_mod.stemmer_supported(name), name

    idx = st.create_index(
        tmp_path / "ix",
        [st.SchemaField("body", st.FieldType.Text, indexed=True)],
        meta=st.IndexMeta(stemmer=StemmerType.Turkish), shard_count=1)
    assert idx._native
    idx.index_document({"body": "kitaplar okundu"})
    idx.commit()
    assert idx.search(st.SearchRequest(query="kitaplardan")).result_count \
        == 1


# --- native Snowball ports (snowball.cpp) ------------------------------------

# languages with a C++ Snowball port (native._STEMMER_IDS ids >= 2);
# word lists exercise each algorithm's main suffix classes
NATIVE_PARITY_WORDS = {
    StemmerType.Danish: "hedens kærlighed venlighederne smukkeste "
                        "billigst bøgerne overraskende hemmeligheder",
    StemmerType.Norwegian: "kjærligheten forskjellige utdannelse "
                           "vanskelighetene regjeringens opplevelser",
    StemmerType.Swedish: "möjligheterna utbildningen verksamheten "
                         "förhållandena hemligheterna skickligast",
    StemmerType.German: "aufeinanderfolgenden möglichkeit größte straße "
                        "verantwortungsbewusstsein schwierigkeiten",
    StemmerType.Dutch: "mogelijkheden verantwoordelijkheden lichamelijk "
                       "onafhankelijkheid gebeurtenissen huizen",
    StemmerType.DutchPorter: "lichamelijke aardigheden eetbaar",
    StemmerType.French: "constitutionnellement responsabilités "
                        "malheureusement connaissance européennes châteaux",
    StemmerType.Spanish: "responsabilidades comiéndoselo organizaciones "
                         "universidades lógicamente dificultades",
    StemmerType.Italian: "abbandonata nazionalizzazione responsabilità "
                         "caratteristiche bellissimo guardandolo",
    StemmerType.Portuguese: "quilométricas responsabilidades "
                            "desenvolvimento características proposições",
    StemmerType.Romanian: "frumoasă studenţilor abilităţi "
                          "constituţional dezvoltarea caracteristicile",
    StemmerType.Russian: "красивые пробегала национализация "
                         "ответственности переосмысливающие девочек",
    StemmerType.Finnish: "edeltäjistään mahdollisuuksien koulutuksessa "
                         "järjestelmässä nopeimmista kauneimpia",
    StemmerType.Hungarian: "babakocsi asztalokkal lehetőségeknek "
                           "fejlesztésekről barátaink villannyal",
    # NLTK's ArabicStemmer leaks suffixes_verb_step1_success across stem()
    # calls; the native port implements fresh-call (pure function)
    # semantics, so the oracle below instantiates per word
    StemmerType.Arabic: "الكلمات المدرسة يكتبون مكتبة بالمدرسة "
                        "التكنولوجيا كتبتموها مدرستنا أصدقاؤهم",
}


@pytest.mark.parametrize("st", list(NATIVE_PARITY_WORDS))
def test_native_snowball_matches_nltk(st):
    """The C++ Snowball ports must be byte-exact vs NLTK's Snowball (the
    reference applies real Snowball for every language,
    tokenizer.rs:576-589)."""
    from seekstorm_tpu.native import snowball_stem_fn
    from nltk.stem.snowball import SnowballStemmer

    native = snowball_stem_fn(st.value)
    if native is None:
        pytest.skip("native library not built")
    name = _NLTK_NAMES[st]
    for w in NATIVE_PARITY_WORDS[st].split():
        # fresh stemmer per word: NLTK's Arabic stemmer is stateful
        # across calls (unreset success flag); parity is defined against
        # the pure per-word semantics the Snowball algorithm specifies
        oracle = SnowballStemmer(name).stem
        assert native(w) == oracle(w), (st, w, native(w), oracle(w))


_NLTK_NAMES = {
    StemmerType.Danish: "danish", StemmerType.Norwegian: "norwegian",
    StemmerType.Swedish: "swedish", StemmerType.German: "german",
    StemmerType.Dutch: "dutch", StemmerType.DutchPorter: "dutch",
    StemmerType.French: "french", StemmerType.Spanish: "spanish",
    StemmerType.Italian: "italian", StemmerType.Portuguese: "portuguese",
    StemmerType.Romanian: "romanian", StemmerType.Russian: "russian",
    StemmerType.Finnish: "finnish", StemmerType.Hungarian: "hungarian",
    StemmerType.Arabic: "arabic",
}


def test_native_stemmer_index_roundtrip(tmp_path):
    """A German-stemmed index now rides the C++ ingest fast path and
    matches inflected forms, byte-identically to the Python analyzer."""
    import seekstorm_tpu as st
    from seekstorm_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native library not built")
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(stemmer=StemmerType.German)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    assert idx._native
    idx.index_document({"body": "die häuser sind groß"})
    idx.commit()
    rs = idx.search(st.SearchRequest(query="haus"))
    assert rs.result_count == 1
    rs = idx.search(st.SearchRequest(query="hauses"))
    assert rs.result_count == 1
