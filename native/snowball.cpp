// Snowball stemmers, C++ ports for the native ingest fast path.
//
// Implements the published Snowball algorithms
// (snowballstem.org/algorithms/) for the languages the reference stems
// exactly (reference seekstorm/src/tokenizer.rs:576-589, index.rs:642-721
// via the snowball_stemmers_rs crate).  Byte-exactness is validated
// against NLTK's Snowball implementations in tests/test_stemmers.py
// (golden-vector parity per language).
//
// Words are std::u32string codepoint sequences, already lowercased by the
// tokenizer.  Regions R1/R2/RV are tracked as start indices into the
// word; truncating the word never moves a region start, which mirrors the
// parallel word/r1/r2 string truncation of the original description.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>

namespace sb {

using u32s = std::u32string;

static inline bool in_set(char32_t c, const char32_t* set) {
    for (const char32_t* p = set; *p; ++p)
        if (*p == c) return true;
    return false;
}

// region = word[rs:]; does it end with suffix?
static inline bool r_ends(const u32s& w, size_t rs, const u32s& suf) {
    return w.size() >= rs + suf.size()
        && std::equal(suf.begin(), suf.end(), w.end() - suf.size());
}

static inline bool ends(const u32s& w, const u32s& suf) {
    return w.size() >= suf.size()
        && std::equal(suf.begin(), suf.end(), w.end() - suf.size());
}

// Scandinavian R1 (nltk _r1_scandinavian): first non-vowel following a
// vowel, then clamped so at least 3 letters precede R1.
static size_t r1_scandinavian(const u32s& w, const char32_t* vowels) {
    for (size_t i = 1; i < w.size(); ++i) {
        if (!in_set(w[i], vowels) && in_set(w[i - 1], vowels)) {
            size_t rs = (i + 1 < 3) ? 3 : i + 1;
            return std::min(rs, w.size());
        }
    }
    return w.size();
}

// Standard R1/R2 (nltk _r1r2_standard).
static void r1r2_standard(const u32s& w, const char32_t* vowels,
                          size_t& r1s, size_t& r2s) {
    r1s = w.size();
    r2s = w.size();
    for (size_t i = 1; i < w.size(); ++i) {
        if (!in_set(w[i], vowels) && in_set(w[i - 1], vowels)) {
            r1s = i + 1;
            break;
        }
    }
    for (size_t i = r1s + 1; i < w.size(); ++i) {
        if (!in_set(w[i], vowels) && in_set(w[i - 1], vowels)) {
            r2s = i + 1;
            break;
        }
    }
}

// Standard RV (nltk _rv_standard).
static size_t rv_standard(const u32s& w, const char32_t* vowels) {
    size_t n = w.size();
    if (n < 2) return n;
    if (!in_set(w[1], vowels)) {
        for (size_t i = 2; i < n; ++i)
            if (in_set(w[i], vowels)) return i + 1;
        return n;
    }
    if (in_set(w[0], vowels) && in_set(w[1], vowels)) {
        for (size_t i = 2; i < n; ++i)
            if (!in_set(w[i], vowels)) return i + 1;
        return n;
    }
    return std::min<size_t>(3, n);
}

// Python-semantics slice s[a:b] with negative-index support (several
// algorithms compare short boundary slices whose Python clamping behavior
// matters for byte parity).
static u32s py_slice(const u32s& s, long a, long b) {
    long n = static_cast<long>(s.size());
    if (a < 0) a += n;
    if (b < 0) b += n;
    a = std::max(0L, std::min(a, n));
    b = std::max(0L, std::min(b, n));
    if (a >= b) return u32s();
    return s.substr(static_cast<size_t>(a), static_cast<size_t>(b - a));
}

static inline bool contains(const u32s& s, const u32s& sub) {
    return s.find(sub) != u32s::npos;
}

static void replace_all(u32s& s, char32_t from, const u32s& to) {
    u32s out;
    out.reserve(s.size());
    for (char32_t c : s) {
        if (c == from) out += to;
        else out.push_back(c);
    }
    s.swap(out);
}

// Python str.replace semantics for multi-codepoint needles.
static void replace_sub(u32s& s, const u32s& from, const u32s& to) {
    size_t pos = 0;
    while ((pos = s.find(from, pos)) != u32s::npos) {
        s.replace(pos, from.size(), to);
        pos += to.size();
    }
}

// ------------------------------------------------------------------ danish

static const char32_t DA_VOWELS[] = U"aeiouyæåø";
static const char32_t DA_S_END[] = U"abcdfghjklmnoprtvyzå";

static void stem_danish(u32s& w) {
    size_t r1s = r1_scandinavian(w, DA_VOWELS);

    static const u32s step1[] = {
        U"erendes", U"erende", U"hedens", U"ethed", U"erede", U"heden",
        U"heder", U"endes", U"ernes", U"erens", U"erets", U"ered", U"ende",
        U"erne", U"eren", U"erer", U"heds", U"enes", U"eres", U"eret",
        U"hed", U"ene", U"ere", U"ens", U"ers", U"ets", U"en", U"er",
        U"es", U"et", U"e", U"s"};
    for (const u32s& suf : step1) {
        if (r_ends(w, r1s, suf)) {
            if (suf == U"s") {
                if (w.size() >= 2 && in_set(w[w.size() - 2], DA_S_END))
                    w.pop_back();
            } else {
                w.resize(w.size() - suf.size());
            }
            break;
        }
    }

    static const u32s step2[] = {U"gd", U"dt", U"gt", U"kt"};
    for (const u32s& suf : step2) {
        if (r_ends(w, r1s, suf)) {
            w.pop_back();
            break;
        }
    }

    if (r_ends(w, r1s, U"igst")) w.resize(w.size() - 2);

    static const u32s step3[] = {U"elig", U"løst", U"lig", U"els",
                                 U"ig"};
    for (const u32s& suf : step3) {
        if (r_ends(w, r1s, suf)) {
            if (suf == U"løst") {
                w.pop_back();
            } else {
                w.resize(w.size() - suf.size());
                for (const u32s& s2 : step2) {
                    if (r_ends(w, r1s, s2)) {
                        w.pop_back();
                        break;
                    }
                }
            }
            break;
        }
    }

    // step 4: undouble a final double consonant (len > 3)
    static const char32_t DA_DBL[] = U"bcdfghjklmnpqrstvwxz";
    if (w.size() > 3 && w[w.size() - 1] == w[w.size() - 2]
        && in_set(w.back(), DA_DBL))
        w.pop_back();
}

// --------------------------------------------------------------- norwegian

static const char32_t NO_VOWELS[] = U"aeiouyæåø";
static const char32_t NO_S_END[] = U"bcdfghjlmnoprtvyz";

static void stem_norwegian(u32s& w) {
    size_t r1s = r1_scandinavian(w, NO_VOWELS);

    static const u32s step1[] = {
        U"hetenes", U"hetene", U"hetens", U"heter", U"heten", U"endes",
        U"ande", U"ende", U"edes", U"enes", U"erte", U"ede", U"ane",
        U"ene", U"ens", U"ers", U"ets", U"het", U"ast", U"ert", U"en",
        U"ar", U"er", U"as", U"es", U"et", U"a", U"e", U"s"};
    for (const u32s& suf : step1) {
        if (r_ends(w, r1s, suf)) {
            if (suf == U"erte" || suf == U"ert") {
                w.resize(w.size() - suf.size());
                w += U"er";
            } else if (suf == U"s") {
                bool ok = false;
                if (w.size() >= 2) {
                    char32_t p = w[w.size() - 2];
                    ok = in_set(p, NO_S_END)
                        || (p == U'k' && w.size() >= 3
                            && !in_set(w[w.size() - 3], NO_VOWELS));
                }
                if (ok) w.pop_back();
            } else {
                w.resize(w.size() - suf.size());
            }
            break;
        }
    }

    static const u32s step2[] = {U"dt", U"vt"};
    for (const u32s& suf : step2) {
        if (r_ends(w, r1s, suf)) {
            w.pop_back();
            break;
        }
    }

    static const u32s step3[] = {U"hetslov", U"eleg", U"elig", U"elov",
                                 U"slov", U"leg", U"eig", U"lig", U"els",
                                 U"lov", U"ig"};
    for (const u32s& suf : step3) {
        if (r_ends(w, r1s, suf)) {
            w.resize(w.size() - suf.size());
            break;
        }
    }
}

// ----------------------------------------------------------------- swedish

static const char32_t SV_VOWELS[] = U"aeiouyäåö";
static const char32_t SV_S_END[] = U"bcdfghjklmnoprtvy";

static void stem_swedish(u32s& w) {
    size_t r1s = r1_scandinavian(w, SV_VOWELS);

    static const u32s step1[] = {
        U"heterna", U"hetens", U"heter", U"heten", U"anden", U"arnas",
        U"ernas", U"ornas", U"andes", U"andet", U"arens", U"arna",
        U"erna", U"orna", U"ande", U"arne", U"aste", U"aren", U"ades",
        U"erns", U"ade", U"are", U"ern", U"ens", U"het", U"ast", U"ad",
        U"en", U"ar", U"er", U"or", U"as", U"es", U"at", U"a", U"e",
        U"s"};
    for (const u32s& suf : step1) {
        if (r_ends(w, r1s, suf)) {
            if (suf == U"s") {
                if (w.size() >= 2 && in_set(w[w.size() - 2], SV_S_END))
                    w.pop_back();
            } else {
                w.resize(w.size() - suf.size());
            }
            break;
        }
    }

    static const u32s step2[] = {U"dd", U"gd", U"nn", U"dt", U"gt",
                                 U"kt", U"tt"};
    for (const u32s& suf : step2) {
        if (r_ends(w, r1s, suf)) {
            w.pop_back();
            break;
        }
    }

    static const u32s step3[] = {U"fullt", U"löst", U"els", U"lig",
                                 U"ig"};
    for (const u32s& suf : step3) {
        if (r_ends(w, r1s, suf)) {
            if (suf == U"els" || suf == U"lig" || suf == U"ig")
                w.resize(w.size() - suf.size());
            else
                w.pop_back();
            break;
        }
    }
}

// ------------------------------------------------------------------ german
//
// Mirrors the nltk GermanStemmer byte-for-byte, including its parallel
// word/r1/r2 string truncation and short-slice clamping.

static const char32_t DE_VOWELS[] = U"aeiouyäöü";
static const char32_t DE_S_END[] = U"bdfghklmnrt";
static const char32_t DE_ST_END[] = U"bdfghklmnt";

static void stem_german(u32s& word) {
    replace_all(word, U'ß', U"ss");

    for (size_t i = 1; i + 1 < word.size(); ++i) {
        if (in_set(word[i - 1], DE_VOWELS)
            && in_set(word[i + 1], DE_VOWELS)) {
            if (word[i] == U'u') word[i] = U'U';
            else if (word[i] == U'y') word[i] = U'Y';
        }
    }

    size_t r1s, r2s;
    r1r2_standard(word, DE_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));

    // R1 adjusted so at least 3 letters precede it
    for (size_t i = 1; i < word.size(); ++i) {
        if (!in_set(word[i], DE_VOWELS) && in_set(word[i - 1], DE_VOWELS)) {
            if (i + 1 < 3) r1 = py_slice(word, 3, (long)word.size());
            break;
        }
    }

    long n;
    static const u32s step1[] = {U"ern", U"em", U"er", U"en", U"es",
                                 U"e", U"s"};
    for (const u32s& suf : step1) {
        if (ends(r1, suf)) {
            n = (long)suf.size();
            if ((suf == U"en" || suf == U"es" || suf == U"e")
                && py_slice(word, -n - 4, -n) == U"niss") {
                word = py_slice(word, 0, -n - 1);
                r1 = py_slice(r1, 0, -n - 1);
                r2 = py_slice(r2, 0, -n - 1);
            } else if (suf == U"s") {
                if (word.size() >= 2
                    && in_set(word[word.size() - 2], DE_S_END)) {
                    word.pop_back();
                    if (!r1.empty()) r1.pop_back();
                    if (!r2.empty()) r2.pop_back();
                }
            } else {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
                r2 = py_slice(r2, 0, -n);
            }
            break;
        }
    }

    static const u32s step2[] = {U"est", U"en", U"er", U"st"};
    for (const u32s& suf : step2) {
        if (ends(r1, suf)) {
            if (suf == U"st") {
                if (word.size() >= 3
                    && in_set(word[word.size() - 3], DE_ST_END)
                    && word.size() - 3 >= 3) {
                    word = py_slice(word, 0, -2);
                    r1 = py_slice(r1, 0, -2);
                    r2 = py_slice(r2, 0, -2);
                }
            } else {
                n = (long)suf.size();
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
                r2 = py_slice(r2, 0, -n);
            }
            break;
        }
    }

    static const u32s step3[] = {U"isch", U"lich", U"heit", U"keit",
                                 U"end", U"ung", U"ig", U"ik"};
    for (const u32s& suf : step3) {
        if (ends(r2, suf)) {
            n = (long)suf.size();
            if (suf == U"end" || suf == U"ung") {
                if (contains(py_slice(r2, -n - 2, -n), U"ig")
                    && !contains(py_slice(r2, -n - 3, -n - 2), U"e"))
                    word = py_slice(word, 0, -n - 2);
                else
                    word = py_slice(word, 0, -n);
            } else if ((suf == U"ig" || suf == U"ik" || suf == U"isch")
                       && !contains(py_slice(r2, -n - 1, -n), U"e")) {
                word = py_slice(word, 0, -n);
            } else if (suf == U"lich" || suf == U"heit") {
                if (contains(py_slice(r1, -n - 2, -n), U"er")
                    || contains(py_slice(r1, -n - 2, -n), U"en"))
                    word = py_slice(word, 0, -n - 2);
                else
                    word = py_slice(word, 0, -n);
            } else if (suf == U"keit") {
                if (contains(py_slice(r2, -n - 4, -n), U"lich"))
                    word = py_slice(word, 0, -n - 4);
                else if (contains(py_slice(r2, -n - 2, -n), U"ig"))
                    word = py_slice(word, 0, -n - 2);
                else
                    word = py_slice(word, 0, -n);
            }
            break;
        }
    }

    replace_all(word, U'ä', U"a");
    replace_all(word, U'ö', U"o");
    replace_all(word, U'ü', U"u");
    replace_all(word, U'U', U"u");
    replace_all(word, U'Y', U"y");
}

// ------------------------------------------------------------------- dutch

static const char32_t NL_VOWELS[] = U"aeiouyè";

static inline bool nl_dbl(const u32s& w) {
    return ends(w, U"kk") || ends(w, U"dd") || ends(w, U"tt");
}

static void stem_dutch(u32s& word) {
    bool step2_success = false;

    static const std::pair<char32_t, char32_t> acc[] = {
        {U'ä', U'a'}, {U'á', U'a'}, {U'ë', U'e'}, {U'é', U'e'},
        {U'í', U'i'}, {U'ï', U'i'}, {U'ö', U'o'}, {U'ó', U'o'},
        {U'ü', U'u'}, {U'ú', U'u'}};
    for (char32_t& c : word)
        for (auto& p : acc)
            if (c == p.first) c = p.second;

    if (!word.empty() && word[0] == U'y') word[0] = U'Y';
    for (size_t i = 1; i < word.size(); ++i)
        if (in_set(word[i - 1], NL_VOWELS) && word[i] == U'y')
            word[i] = U'Y';
    for (size_t i = 1; i + 1 < word.size(); ++i)
        if (in_set(word[i - 1], NL_VOWELS) && word[i] == U'i'
            && in_set(word[i + 1], NL_VOWELS))
            word[i] = U'I';

    size_t r1s, r2s;
    r1r2_standard(word, NL_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    for (size_t i = 1; i < word.size(); ++i) {
        if (!in_set(word[i], NL_VOWELS) && in_set(word[i - 1], NL_VOWELS)) {
            if (i + 1 < 3) r1 = py_slice(word, 3, (long)word.size());
            break;
        }
    }

    long n;
    static const u32s step1[] = {U"heden", U"ene", U"en", U"se", U"s"};
    for (const u32s& suf : step1) {
        if (ends(r1, suf)) {
            n = (long)suf.size();
            if (suf == U"heden") {
                word = py_slice(word, 0, -n) + U"heid";
                r1 = py_slice(r1, 0, -n) + U"heid";
                if (ends(r2, U"heden"))
                    r2 = py_slice(r2, 0, -n) + U"heid";
            } else if ((suf == U"ene" || suf == U"en")
                       && !ends(word, U"heden")
                       && word.size() >= (size_t)n + 1
                       && !in_set(word[word.size() - n - 1], NL_VOWELS)
                       && py_slice(word, -n - 3, -n) != U"gem") {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
                r2 = py_slice(r2, 0, -n);
                if (nl_dbl(word)) {
                    word.pop_back();
                    if (!r1.empty()) r1.pop_back();
                    if (!r2.empty()) r2.pop_back();
                }
            } else if ((suf == U"se" || suf == U"s")
                       && word.size() >= (size_t)n + 1
                       && !in_set(word[word.size() - n - 1], NL_VOWELS)
                       && word[word.size() - n - 1] != U'j') {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
                r2 = py_slice(r2, 0, -n);
            }
            break;
        }
    }

    if (ends(r1, U"e") && word.size() >= 2
        && !in_set(word[word.size() - 2], NL_VOWELS)) {
        step2_success = true;
        word.pop_back();
        if (!r1.empty()) r1.pop_back();
        if (!r2.empty()) r2.pop_back();
        if (nl_dbl(word)) {
            word.pop_back();
            if (!r1.empty()) r1.pop_back();
            if (!r2.empty()) r2.pop_back();
        }
    }

    if (ends(r2, U"heid") && word.size() >= 5
        && word[word.size() - 5] != U'c') {
        word = py_slice(word, 0, -4);
        r1 = py_slice(r1, 0, -4);
        r2 = py_slice(r2, 0, -4);
        if (ends(r1, U"en") && word.size() >= 3
            && !in_set(word[word.size() - 3], NL_VOWELS)
            && py_slice(word, -5, -2) != U"gem") {
            word = py_slice(word, 0, -2);
            r1 = py_slice(r1, 0, -2);
            r2 = py_slice(r2, 0, -2);
            if (nl_dbl(word)) {
                word.pop_back();
                if (!r1.empty()) r1.pop_back();
                if (!r2.empty()) r2.pop_back();
            }
        }
    }

    static const u32s step3b[] = {U"baar", U"lijk", U"bar", U"end",
                                  U"ing", U"ig"};
    for (const u32s& suf : step3b) {
        if (ends(r2, suf)) {
            if (suf == U"end" || suf == U"ing") {
                word = py_slice(word, 0, -3);
                r2 = py_slice(r2, 0, -3);
                if (ends(r2, U"ig") && word.size() >= 3
                    && word[word.size() - 3] != U'e') {
                    word = py_slice(word, 0, -2);
                } else if (nl_dbl(word)) {
                    word.pop_back();
                }
            } else if (suf == U"ig") {
                if (word.size() >= 3 && word[word.size() - 3] != U'e')
                    word = py_slice(word, 0, -2);
            } else if (suf == U"lijk") {
                word = py_slice(word, 0, -4);
                r1 = py_slice(r1, 0, -4);
                if (ends(r1, U"e") && word.size() >= 2
                    && !in_set(word[word.size() - 2], NL_VOWELS)) {
                    word.pop_back();
                    if (nl_dbl(word)) word.pop_back();
                }
            } else if (suf == U"baar") {
                word = py_slice(word, 0, -4);
            } else if (suf == U"bar") {
                if (step2_success) word = py_slice(word, 0, -3);
            }
            break;
        }
    }

    if (word.size() >= 4 && !in_set(word.back(), NL_VOWELS)
        && word.back() != U'I') {
        u32s mid = py_slice(word, -3, -1);
        if ((mid == U"aa" || mid == U"ee" || mid == U"oo" || mid == U"uu")
            && !in_set(word[word.size() - 4], NL_VOWELS)) {
            char32_t last = word.back();
            word = py_slice(word, 0, -3);
            word.push_back(mid[0]);
            word.push_back(last);
        }
    }

    replace_all(word, U'I', U"i");
    replace_all(word, U'Y', U"y");
}

// ------------------------------------------------------------------ french
//
// Mirrors nltk FrenchStemmer: regions r1/r2/rv are STALE string copies
// (computed once, then word mutates), several checks are substring
// containment ("suffix in r2"), and rindex-1 uses Python negative-index
// wraparound.

static const char32_t FR_VOWELS[] = U"aeiouyâàëéêèïîôûù";

static u32s fr_rv(const u32s& w) {
    if (w.size() < 2) return u32s();
    u32s head = py_slice(w, 0, 3);
    if (head == U"par" || head == U"col" || head == U"tap"
        || (in_set(w[0], FR_VOWELS) && in_set(w[1], FR_VOWELS)))
        return py_slice(w, 3, (long)w.size());
    for (size_t i = 1; i < w.size(); ++i)
        if (in_set(w[i], FR_VOWELS))
            return py_slice(w, (long)i + 1, (long)w.size());
    return u32s();
}

static void stem_french(u32s& word) {
    bool step1_success = false;
    bool rv_ending_found = false;
    bool step2a_success = false;
    bool step2b_success = false;

    for (size_t i = 1; i < word.size(); ++i)
        if (word[i - 1] == U'q' && word[i] == U'u') word[i] = U'U';
    for (size_t i = 1; i + 1 < word.size(); ++i) {
        if (in_set(word[i - 1], FR_VOWELS)
            && in_set(word[i + 1], FR_VOWELS)) {
            if (word[i] == U'u') word[i] = U'U';
            else if (word[i] == U'i') word[i] = U'I';
        }
        if (in_set(word[i - 1], FR_VOWELS)
            || in_set(word[i + 1], FR_VOWELS)) {
            if (word[i] == U'y') word[i] = U'Y';
        }
    }

    size_t r1s, r2s;
    r1r2_standard(word, FR_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    u32s rv = fr_rv(word);

    static const u32s step1[] = {
        U"issements", U"issement", U"atrices", U"atrice", U"ateurs",
        U"ations", U"logies", U"usions", U"utions", U"ements", U"amment",
        U"emment", U"ances", U"iqUes", U"ismes", U"ables", U"istes",
        U"ateur", U"ation", U"logie", U"usion", U"ution", U"ences",
        U"ement", U"euses", U"ments", U"ance", U"iqUe", U"isme", U"able",
        U"iste", U"ence", U"ités", U"ives", U"eaux", U"euse", U"ment",
        U"eux", U"ité", U"ive", U"ifs", U"aux", U"if"};
    auto in2 = [&](const u32s& x) { return contains(r2, x); };
    for (const u32s& suf : step1) {
        if (!ends(word, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"eaux") {
            word.pop_back();
            step1_success = true;
        } else if (suf == U"euse" || suf == U"euses") {
            if (contains(r2, suf)) {
                word = py_slice(word, 0, -n);
                step1_success = true;
            } else if (contains(r1, suf)) {
                word = py_slice(word, 0, -n) + U"eux";
                step1_success = true;
            }
        } else if ((suf == U"ement" || suf == U"ements")
                   && contains(rv, suf)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
            if (py_slice(word, -2, (long)word.size()) == U"iv"
                && in2(U"iv")) {
                word = py_slice(word, 0, -2);
                if (py_slice(word, -2, (long)word.size()) == U"at"
                    && in2(U"at"))
                    word = py_slice(word, 0, -2);
            } else if (py_slice(word, -3, (long)word.size()) == U"eus") {
                if (in2(U"eus")) word = py_slice(word, 0, -3);
                else if (contains(r1, U"eus"))
                    word = py_slice(word, 0, -1) + U"x";
            } else if (py_slice(word, -3, (long)word.size()) == U"abl"
                       || py_slice(word, -3, (long)word.size()) == U"iqU") {
                if (in2(U"abl") || in2(U"iqU"))
                    word = py_slice(word, 0, -3);
            } else if (py_slice(word, -3, (long)word.size()) == U"ièr"
                       || py_slice(word, -3, (long)word.size()) == U"Ièr") {
                if (contains(rv, U"ièr") || contains(rv, U"Ièr"))
                    word = py_slice(word, 0, -3) + U"i";
            }
        } else if (suf == U"amment" && contains(rv, suf)) {
            word = py_slice(word, 0, -n) + U"ant";
            rv = py_slice(rv, 0, -(long)6) + U"ant";
            rv_ending_found = true;
        } else if (suf == U"emment" && contains(rv, suf)) {
            word = py_slice(word, 0, -n) + U"ent";
            rv_ending_found = true;
        } else if ((suf == U"ment" || suf == U"ments")
                   && contains(rv, suf)
                   && !(rv.size() >= suf.size()
                        && rv.compare(0, suf.size(), suf) == 0)) {
            size_t idx = rv.rfind(suf);
            long pos = (long)idx - 1;
            if (pos < 0) pos += (long)rv.size();
            if (in_set(rv[(size_t)pos], FR_VOWELS)) {
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
                rv_ending_found = true;
            }
        } else if (suf == U"aux" && contains(r1, suf)) {
            word = py_slice(word, 0, -2) + U"l";
            step1_success = true;
        } else if ((suf == U"issement" || suf == U"issements")
                   && contains(r1, suf)
                   && word.size() >= (size_t)n + 1
                   && !in_set(word[word.size() - n - 1], FR_VOWELS)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
        } else if ((suf == U"ance" || suf == U"iqUe" || suf == U"isme"
                    || suf == U"able" || suf == U"iste" || suf == U"eux"
                    || suf == U"ances" || suf == U"iqUes"
                    || suf == U"ismes" || suf == U"ables"
                    || suf == U"istes")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
        } else if ((suf == U"atrice" || suf == U"ateur" || suf == U"ation"
                    || suf == U"atrices" || suf == U"ateurs"
                    || suf == U"ations")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
            if (py_slice(word, -2, (long)word.size()) == U"ic") {
                if (in2(U"ic")) word = py_slice(word, 0, -2);
                else word = py_slice(word, 0, -2) + U"iqU";
            }
        } else if ((suf == U"logie" || suf == U"logies")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n) + U"log";
            step1_success = true;
        } else if ((suf == U"usion" || suf == U"ution" || suf == U"usions"
                    || suf == U"utions")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n) + U"u";
            step1_success = true;
        } else if ((suf == U"ence" || suf == U"ences")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n) + U"ent";
            step1_success = true;
        } else if ((suf == U"ité" || suf == U"ités") && contains(r2, suf)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
            if (py_slice(word, -4, (long)word.size()) == U"abil") {
                if (in2(U"abil")) word = py_slice(word, 0, -4);
                else word = py_slice(word, 0, -2) + U"l";
            } else if (py_slice(word, -2, (long)word.size()) == U"ic") {
                if (in2(U"ic")) word = py_slice(word, 0, -2);
                else word = py_slice(word, 0, -2) + U"iqU";
            } else if (py_slice(word, -2, (long)word.size()) == U"iv") {
                if (in2(U"iv")) word = py_slice(word, 0, -2);
            }
        } else if ((suf == U"if" || suf == U"ive" || suf == U"ifs"
                    || suf == U"ives")
                   && contains(r2, suf)) {
            word = py_slice(word, 0, -n);
            step1_success = true;
            if (py_slice(word, -2, (long)word.size()) == U"at"
                && in2(U"at")) {
                word = py_slice(word, 0, -2);
                if (py_slice(word, -2, (long)word.size()) == U"ic") {
                    if (in2(U"ic")) word = py_slice(word, 0, -2);
                    else word = py_slice(word, 0, -2) + U"iqU";
                }
            }
        }
        break;
    }

    static const u32s step2a[] = {
        U"issaIent", U"issantes", U"iraIent", U"issante", U"issants",
        U"issions", U"irions", U"issais", U"issait", U"issant",
        U"issent", U"issiez", U"issons", U"irais", U"irait", U"irent",
        U"iriez", U"irons", U"iront", U"isses", U"issez", U"îmes",
        U"îtes", U"irai", U"iras", U"irez", U"isse", U"ies", U"ira",
        U"ît", U"ie", U"ir", U"is", U"it", U"i"};
    static const u32s step2b[] = {
        U"eraIent", U"assions", U"erions", U"assent", U"assiez",
        U"èrent", U"erais", U"erait", U"eriez", U"erons", U"eront",
        U"aIent", U"antes", U"asses", U"ions", U"erai", U"eras",
        U"erez", U"âmes", U"âtes", U"ante", U"ants", U"asse", U"ées",
        U"era", U"iez", U"ais", U"ait", U"ant", U"ée", U"és", U"er",
        U"ez", U"ât", U"ai", U"as", U"é", U"a"};
    static const u32s grp_er[] = {
        U"eraIent", U"erions", U"èrent", U"erais", U"erait", U"eriez",
        U"erons", U"eront", U"erai", U"eras", U"erez", U"ées", U"era",
        U"iez", U"ée", U"és", U"er", U"ez", U"é"};
    static const u32s grp_a[] = {
        U"assions", U"assent", U"assiez", U"aIent", U"antes", U"asses",
        U"âmes", U"âtes", U"ante", U"ants", U"asse", U"ais", U"ait",
        U"ant", U"ât", U"ai", U"as", U"a"};

    if (!step1_success || rv_ending_found) {
        for (const u32s& suf : step2a) {
            if (ends(word, suf)) {
                if (contains(rv, suf) && rv.size() > suf.size()) {
                    size_t idx = rv.rfind(suf);
                    long pos = (long)idx - 1;
                    if (pos < 0) pos += (long)rv.size();
                    if (!in_set(rv[(size_t)pos], FR_VOWELS)) {
                        word = py_slice(word, 0, -(long)suf.size());
                        step2a_success = true;
                    }
                }
                break;
            }
        }
        if (!step2a_success) {
            for (const u32s& suf : step2b) {
                if (ends(rv, suf)) {
                    if (suf == U"ions" && contains(r2, U"ions")) {
                        word = py_slice(word, 0, -4);
                        step2b_success = true;
                    } else if (std::find(std::begin(grp_er),
                                         std::end(grp_er), suf)
                               != std::end(grp_er)) {
                        word = py_slice(word, 0, -(long)suf.size());
                        step2b_success = true;
                    } else if (std::find(std::begin(grp_a),
                                         std::end(grp_a), suf)
                               != std::end(grp_a)) {
                        word = py_slice(word, 0, -(long)suf.size());
                        rv = py_slice(rv, 0, -(long)suf.size());
                        step2b_success = true;
                        if (ends(rv, U"e")) word = py_slice(word, 0, -1);
                    }
                    break;
                }
            }
        }
    }

    if (step1_success || step2a_success || step2b_success) {
        if (!word.empty()) {
            if (word.back() == U'Y')
                word = py_slice(word, 0, -1) + U"i";
            else if (word.back() == U'ç')
                word = py_slice(word, 0, -1) + U"c";
        }
    } else {
        static const char32_t FR_S_PREV[] = U"aiouès";
        if (word.size() >= 2 && word.back() == U's'
            && !in_set(word[word.size() - 2], FR_S_PREV))
            word.pop_back();
        static const u32s step4[] = {U"ière", U"Ière", U"ion", U"ier",
                                     U"Ier", U"e", U"ë"};
        for (const u32s& suf : step4) {
            if (ends(word, suf)) {
                if (contains(rv, suf)) {
                    if (suf == U"ion" && contains(r2, suf)
                        && rv.size() >= 4
                        && (rv[rv.size() - 4] == U's'
                            || rv[rv.size() - 4] == U't')) {
                        word = py_slice(word, 0, -3);
                    } else if (suf == U"ière" || suf == U"Ière"
                               || suf == U"ier" || suf == U"Ier") {
                        word = py_slice(word, 0, -(long)suf.size())
                            + U"i";
                    } else if (suf == U"e") {
                        word.pop_back();
                    } else if (suf == U"ë"
                               && py_slice(word, -3, -1) == U"gu") {
                        word.pop_back();
                    }
                    break;
                }
            }
        }
    }

    if (ends(word, U"enn") || ends(word, U"onn") || ends(word, U"ett")
        || ends(word, U"ell") || ends(word, U"eill"))
        word.pop_back();

    for (size_t i = 1; i < word.size(); ++i) {
        char32_t c = word[word.size() - i];
        if (in_set(c, FR_VOWELS)) {
            if (i != 1 && (c == U'é' || c == U'è'))
                word[word.size() - i] = U'e';
            break;
        }
    }

    replace_all(word, U'I', U"i");
    replace_all(word, U'U', U"u");
    replace_all(word, U'Y', U"y");
}

// ----------------------------------------------------------------- spanish

static const char32_t ES_VOWELS[] = U"aeiouáéíóúü";

static u32s es_unaccent(u32s w) {
    for (char32_t& c : w) {
        switch (c) {
            case U'á': c = U'a'; break;
            case U'é': c = U'e'; break;
            case U'í': c = U'i'; break;
            case U'ó': c = U'o'; break;
            case U'ú': c = U'u'; break;
            default: break;
        }
    }
    return w;
}

static void stem_spanish(u32s& word) {
    bool step1_success = false;

    size_t r1s, r2s;
    r1r2_standard(word, ES_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    size_t rvs = rv_standard(word, ES_VOWELS);
    u32s rv = word.substr(std::min(rvs, word.size()));

    static const u32s step0[] = {U"selas", U"selos", U"sela", U"selo",
                                 U"las", U"les", U"los", U"nos", U"me",
                                 U"se", U"la", U"le", U"lo"};
    static const u32s ger[] = {U"ando", U"ándo", U"ar", U"ár", U"er",
                               U"ér", U"iendo", U"iéndo", U"ir", U"ír"};
    for (const u32s& suf : step0) {
        if (!(ends(word, suf) && ends(rv, suf))) continue;
        long n = (long)suf.size();
        u32s rvh = py_slice(rv, 0, -n);
        bool hit = false;
        for (const u32s& g : ger)
            if (ends(rvh, g)) { hit = true; break; }
        if (!hit && ends(rvh, U"yendo")
            && ends(py_slice(word, 0, -n), U"uyendo"))
            hit = true;
        if (hit) {
            word = es_unaccent(py_slice(word, 0, -n));
            r1 = es_unaccent(py_slice(r1, 0, -n));
            r2 = es_unaccent(py_slice(r2, 0, -n));
            rv = es_unaccent(rvh);
        }
        break;
    }

    static const u32s step1[] = {
        U"amientos", U"imientos", U"amiento", U"imiento", U"acion",
        U"aciones", U"uciones", U"adoras", U"adores", U"ancias",
        U"logías", U"encias", U"amente", U"idades", U"anzas", U"ismos",
        U"ables", U"ibles", U"istas", U"adora", U"ación", U"antes",
        U"ancia", U"logía", U"ución", U"encia", U"mente", U"anza",
        U"icos", U"icas", U"ismo", U"able", U"ible", U"ista", U"osos",
        U"osas", U"ador", U"ante", U"idad", U"ivas", U"ivos", U"ico",
        U"ica", U"oso", U"osa", U"iva", U"ivo"};
    static const u32s grp_ador[] = {U"adora", U"ador", U"ación",
                                    U"adoras", U"adores", U"acion",
                                    U"aciones", U"ante", U"antes",
                                    U"ancia", U"ancias"};
    for (const u32s& suf : step1) {
        if (!ends(word, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"amente" && ends(r1, suf)) {
            step1_success = true;
            word = py_slice(word, 0, -6);
            r2 = py_slice(r2, 0, -6);
            rv = py_slice(rv, 0, -6);
            if (ends(r2, U"iv")) {
                word = py_slice(word, 0, -2);
                r2 = py_slice(r2, 0, -2);
                rv = py_slice(rv, 0, -2);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else if (ends(r2, U"os") || ends(r2, U"ic")
                       || ends(r2, U"ad")) {
                word = py_slice(word, 0, -2);
                rv = py_slice(rv, 0, -2);
            }
        } else if (ends(r2, suf)) {
            step1_success = true;
            if (std::find(std::begin(grp_ador), std::end(grp_ador), suf)
                != std::end(grp_ador)) {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"ic")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else if (suf == U"logía" || suf == U"logías") {
                word = py_slice(word, 0, -n) + U"log";
                rv = py_slice(rv, 0, -n) + U"log";
            } else if (suf == U"ución" || suf == U"uciones") {
                word = py_slice(word, 0, -n) + U"u";
                rv = py_slice(rv, 0, -n) + U"u";
            } else if (suf == U"encia" || suf == U"encias") {
                word = py_slice(word, 0, -n) + U"ente";
                rv = py_slice(rv, 0, -n) + U"ente";
            } else if (suf == U"mente") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"ante") || ends(r2, U"able")
                    || ends(r2, U"ible")) {
                    word = py_slice(word, 0, -4);
                    rv = py_slice(rv, 0, -4);
                }
            } else if (suf == U"idad" || suf == U"idades") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                static const u32s pres[] = {U"abil", U"ic", U"iv"};
                for (const u32s& p : pres) {
                    if (ends(r2, p)) {
                        word = py_slice(word, 0, -(long)p.size());
                        rv = py_slice(rv, 0, -(long)p.size());
                    }
                }
            } else if (suf == U"ivo" || suf == U"iva" || suf == U"ivos"
                       || suf == U"ivas") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else {
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
            }
        }
        break;
    }

    if (!step1_success) {
        static const u32s step2a[] = {U"yeron", U"yendo", U"yamos",
                                      U"yais", U"yan", U"yen", U"yas",
                                      U"yes", U"ya", U"ye", U"yo",
                                      U"yó"};
        for (const u32s& suf : step2a) {
            long n = (long)suf.size();
            if (ends(rv, suf)
                && py_slice(word, -n - 1, -n) == U"u") {
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
                break;
            }
        }
        static const u32s step2b[] = {
            U"aríamos", U"eríamos", U"iríamos", U"iéramos", U"iésemos",
            U"aríais", U"aremos", U"eríais", U"eremos", U"iríais",
            U"iremos", U"ierais", U"ieseis", U"asteis", U"isteis",
            U"ábamos", U"áramos", U"ásemos", U"arían", U"arías",
            U"aréis", U"erían", U"erías", U"eréis", U"irían",
            U"irías", U"iréis", U"ieran", U"iesen", U"ieron",
            U"iendo", U"ieras", U"ieses", U"abais", U"arais",
            U"aseis", U"éamos", U"arán", U"arás", U"aría", U"erán",
            U"erás", U"ería", U"irán", U"irás", U"iría", U"iera",
            U"iese", U"aste", U"iste", U"aban", U"aran", U"asen",
            U"aron", U"ando", U"abas", U"adas", U"idas", U"aras",
            U"ases", U"íais", U"ados", U"idos", U"amos", U"imos",
            U"emos", U"ará", U"aré", U"erá", U"eré", U"irá", U"iré",
            U"aba", U"ada", U"ida", U"ara", U"ase", U"ían", U"ado",
            U"ido", U"ías", U"áis", U"éis", U"ía", U"ad", U"ed",
            U"id", U"an", U"ió", U"ar", U"er", U"ir", U"as", U"ís",
            U"en", U"es"};
        for (const u32s& suf : step2b) {
            if (ends(rv, suf)) {
                long n = (long)suf.size();
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (suf == U"en" || suf == U"es" || suf == U"éis"
                    || suf == U"emos") {
                    if (ends(word, U"gu")) word = py_slice(word, 0, -1);
                    if (ends(rv, U"gu")) rv = py_slice(rv, 0, -1);
                }
                break;
            }
        }
    }

    static const u32s step3[] = {U"os", U"a", U"e", U"o", U"á", U"é",
                                 U"í", U"ó"};
    for (const u32s& suf : step3) {
        if (ends(rv, suf)) {
            long n = (long)suf.size();
            word = py_slice(word, 0, -n);
            if (suf == U"e" || suf == U"é") {
                rv = py_slice(rv, 0, -n);
                if (py_slice(word, -2, (long)word.size()) == U"gu"
                    && ends(rv, U"u"))
                    word = py_slice(word, 0, -1);
            }
            break;
        }
    }

    word = es_unaccent(word);
}

// ----------------------------------------------------------------- italian

static const char32_t IT_VOWELS[] = U"aeiouàèìòù";

static void stem_italian(u32s& word) {
    bool step1_success = false;

    for (char32_t& c : word) {
        switch (c) {
            case U'á': c = U'à'; break;
            case U'é': c = U'è'; break;
            case U'í': c = U'ì'; break;
            case U'ó': c = U'ò'; break;
            case U'ú': c = U'ù'; break;
            default: break;
        }
    }
    for (size_t i = 1; i < word.size(); ++i)
        if (word[i - 1] == U'q' && word[i] == U'u') word[i] = U'U';
    for (size_t i = 1; i + 1 < word.size(); ++i) {
        if (in_set(word[i - 1], IT_VOWELS)
            && in_set(word[i + 1], IT_VOWELS)) {
            if (word[i] == U'u') word[i] = U'U';
            else if (word[i] == U'i') word[i] = U'I';
        }
    }

    size_t r1s, r2s;
    r1r2_standard(word, IT_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    size_t rvs = rv_standard(word, IT_VOWELS);
    u32s rv = word.substr(std::min(rvs, word.size()));

    static const u32s step0[] = {
        U"gliela", U"gliele", U"glieli", U"glielo", U"gliene", U"sene",
        U"mela", U"mele", U"meli", U"melo", U"mene", U"tela", U"tele",
        U"teli", U"telo", U"tene", U"cela", U"cele", U"celi", U"celo",
        U"cene", U"vela", U"vele", U"veli", U"velo", U"vene", U"gli",
        U"ci", U"la", U"le", U"li", U"lo", U"mi", U"ne", U"si", U"ti",
        U"vi"};
    for (const u32s& suf : step0) {
        if (ends(rv, suf)) {
            long n = (long)suf.size();
            u32s p4 = py_slice(rv, -n - 4, -n);
            u32s p2 = py_slice(rv, -n - 2, -n);
            if (p4 == U"ando" || p4 == U"endo") {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
            } else if (p2 == U"ar" || p2 == U"er" || p2 == U"ir") {
                word = py_slice(word, 0, -n) + U"e";
                r1 = py_slice(r1, 0, -n) + U"e";
                r2 = py_slice(r2, 0, -n) + U"e";
                rv = py_slice(rv, 0, -n) + U"e";
            }
            break;
        }
    }

    static const u32s step1[] = {
        U"atrice", U"atrici", U"azione", U"azioni", U"uzione", U"uzioni",
        U"usione", U"usioni", U"amento", U"amenti", U"imento", U"imenti",
        U"amente", U"abile", U"abili", U"ibile", U"ibili", U"mente",
        U"atore", U"atori", U"logia", U"logie", U"anza", U"anze",
        U"iche", U"ichi", U"ismo", U"ismi", U"ista", U"iste", U"isti",
        U"istà", U"istè", U"istì", U"ante", U"anti", U"enza", U"enze",
        U"ico", U"ici", U"ica", U"ice", U"oso", U"osi", U"osa", U"ose",
        U"ità", U"ivo", U"ivi", U"iva", U"ive"};
    for (const u32s& suf : step1) {
        if (!ends(word, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"amente" && ends(r1, suf)) {
            step1_success = true;
            word = py_slice(word, 0, -6);
            r2 = py_slice(r2, 0, -6);
            rv = py_slice(rv, 0, -6);
            if (ends(r2, U"iv")) {
                word = py_slice(word, 0, -2);
                r2 = py_slice(r2, 0, -2);
                rv = py_slice(rv, 0, -2);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else if (ends(r2, U"os") || ends(r2, U"ic")) {
                word = py_slice(word, 0, -2);
                rv = py_slice(rv, 0, -2);
            } else if (ends(r2, U"abil")) {
                word = py_slice(word, 0, -4);
                rv = py_slice(rv, 0, -4);
            }
        } else if ((suf == U"amento" || suf == U"amenti"
                    || suf == U"imento" || suf == U"imenti")
                   && ends(rv, suf)) {
            step1_success = true;
            word = py_slice(word, 0, -6);
            rv = py_slice(rv, 0, -6);
        } else if (ends(r2, suf)) {
            step1_success = true;
            if (suf == U"azione" || suf == U"azioni" || suf == U"atore"
                || suf == U"atori") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"ic")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else if (suf == U"logia" || suf == U"logie") {
                // nltk quirk preserved: rv is reassigned from WORD here
                word = py_slice(word, 0, -2);
                rv = py_slice(word, 0, -2);
            } else if (suf == U"uzione" || suf == U"uzioni"
                       || suf == U"usione" || suf == U"usioni") {
                word = py_slice(word, 0, -5);
                rv = py_slice(rv, 0, -5);
            } else if (suf == U"enza" || suf == U"enze") {
                word = py_slice(word, 0, -n) + U"te";
                rv = py_slice(rv, 0, -n) + U"te";
            } else if (suf == U"ità") {
                word = py_slice(word, 0, -3);
                r2 = py_slice(r2, 0, -3);
                rv = py_slice(rv, 0, -3);
                if (ends(r2, U"ic") || ends(r2, U"iv")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                } else if (ends(r2, U"abil")) {
                    word = py_slice(word, 0, -4);
                    rv = py_slice(rv, 0, -4);
                }
            } else if (suf == U"ivo" || suf == U"ivi" || suf == U"iva"
                       || suf == U"ive") {
                word = py_slice(word, 0, -3);
                r2 = py_slice(r2, 0, -3);
                rv = py_slice(rv, 0, -3);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    r2 = py_slice(r2, 0, -2);
                    rv = py_slice(rv, 0, -2);
                    if (ends(r2, U"ic")) {
                        word = py_slice(word, 0, -2);
                        rv = py_slice(rv, 0, -2);
                    }
                }
            } else {
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
            }
        }
        break;
    }

    if (!step1_success) {
        static const u32s step2[] = {
            U"erebbero", U"irebbero", U"assero", U"assimo", U"eranno",
            U"erebbe", U"eremmo", U"ereste", U"eresti", U"essero",
            U"iranno", U"irebbe", U"iremmo", U"ireste", U"iresti",
            U"iscano", U"iscono", U"issero", U"arono", U"avamo",
            U"avano", U"avate", U"eremo", U"erete", U"erono", U"evamo",
            U"evano", U"evate", U"iremo", U"irete", U"irono", U"ivamo",
            U"ivano", U"ivate", U"ammo", U"ando", U"asse", U"assi",
            U"emmo", U"enda", U"ende", U"endi", U"endo", U"erai",
            U"erei", U"Yamo", U"iamo", U"immo", U"irai", U"irei",
            U"isca", U"isce", U"isci", U"isco", U"ano", U"are", U"ata",
            U"ate", U"ati", U"ato", U"ava", U"avi", U"avo", U"erà",
            U"ere", U"erò", U"ete", U"eva", U"evi", U"evo", U"irà",
            U"ire", U"irò", U"ita", U"ite", U"iti", U"ito", U"iva",
            U"ivi", U"ivo", U"ono", U"uta", U"ute", U"uti", U"uto",
            U"ar", U"ir"};
        for (const u32s& suf : step2) {
            if (ends(rv, suf)) {
                word = py_slice(word, 0, -(long)suf.size());
                rv = py_slice(rv, 0, -(long)suf.size());
                break;
            }
        }
    }

    static const char32_t IT_FINAL[] = U"aeioàèìò";
    if (!rv.empty() && in_set(rv.back(), IT_FINAL)) {
        word = py_slice(word, 0, -1);
        rv = py_slice(rv, 0, -1);
        if (ends(rv, U"i")) {
            word = py_slice(word, 0, -1);
            rv = py_slice(rv, 0, -1);
        }
    }
    if (ends(rv, U"ch") || ends(rv, U"gh")) word = py_slice(word, 0, -1);

    replace_all(word, U'I', U"i");
    replace_all(word, U'U', U"u");
}

// -------------------------------------------------------------- portuguese

static const char32_t PT_VOWELS[] = U"aeiouáéíóúâêô";

static void stem_portuguese(u32s& word) {
    bool step1_success = false, step2_success = false;

    replace_all(word, U'ã', U"a~");
    replace_all(word, U'õ', U"o~");
    replace_sub(word, U"qü", U"qu");
    replace_sub(word, U"gü", U"gu");

    size_t r1s, r2s;
    r1r2_standard(word, PT_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    size_t rvs = rv_standard(word, PT_VOWELS);
    u32s rv = word.substr(std::min(rvs, word.size()));

    static const u32s step1[] = {
        U"amentos", U"imentos", U"uço~es", U"amento", U"imento",
        U"adoras", U"adores", U"aço~es", U"logias", U"ências", U"amente",
        U"idades", U"anças", U"ismos", U"istas", U"adora", U"aça~o",
        U"antes", U"ância", U"logia", U"uça~o", U"ência", U"mente",
        U"idade", U"ança", U"ezas", U"icos", U"icas", U"ismo", U"ável",
        U"ível", U"ista", U"osos", U"osas", U"ador", U"ante", U"ivas",
        U"ivos", U"iras", U"eza", U"ico", U"ica", U"oso", U"osa",
        U"iva", U"ivo", U"ira"};
    for (const u32s& suf : step1) {
        if (!ends(word, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"amente" && ends(r1, suf)) {
            step1_success = true;
            word = py_slice(word, 0, -6);
            r2 = py_slice(r2, 0, -6);
            rv = py_slice(rv, 0, -6);
            if (ends(r2, U"iv")) {
                word = py_slice(word, 0, -2);
                r2 = py_slice(r2, 0, -2);
                rv = py_slice(rv, 0, -2);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else if (ends(r2, U"os") || ends(r2, U"ic")
                       || ends(r2, U"ad")) {
                word = py_slice(word, 0, -2);
                rv = py_slice(rv, 0, -2);
            }
        } else if ((suf == U"ira" || suf == U"iras") && ends(rv, suf)
                   && py_slice(word, -n - 1, -n) == U"e") {
            step1_success = true;
            word = py_slice(word, 0, -n) + U"ir";
            rv = py_slice(rv, 0, -n) + U"ir";
        } else if (ends(r2, suf)) {
            step1_success = true;
            if (suf == U"logia" || suf == U"logias") {
                word = py_slice(word, 0, -n) + U"log";
                rv = py_slice(rv, 0, -n) + U"log";
            } else if (suf == U"uça~o" || suf == U"uço~es") {
                word = py_slice(word, 0, -n) + U"u";
                rv = py_slice(rv, 0, -n) + U"u";
            } else if (suf == U"ência" || suf == U"ências") {
                word = py_slice(word, 0, -n) + U"ente";
                rv = py_slice(rv, 0, -n) + U"ente";
            } else if (suf == U"mente") {
                word = py_slice(word, 0, -5);
                r2 = py_slice(r2, 0, -5);
                rv = py_slice(rv, 0, -5);
                if (ends(r2, U"ante") || ends(r2, U"avel")
                    || ends(r2, U"ivel")) {
                    word = py_slice(word, 0, -4);
                    rv = py_slice(rv, 0, -4);
                }
            } else if (suf == U"idade" || suf == U"idades") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"ic") || ends(r2, U"iv")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                } else if (ends(r2, U"abil")) {
                    word = py_slice(word, 0, -4);
                    rv = py_slice(rv, 0, -4);
                }
            } else if (suf == U"iva" || suf == U"ivo" || suf == U"ivas"
                       || suf == U"ivos") {
                word = py_slice(word, 0, -n);
                r2 = py_slice(r2, 0, -n);
                rv = py_slice(rv, 0, -n);
                if (ends(r2, U"at")) {
                    word = py_slice(word, 0, -2);
                    rv = py_slice(rv, 0, -2);
                }
            } else {
                word = py_slice(word, 0, -n);
                rv = py_slice(rv, 0, -n);
            }
        }
        break;
    }

    if (!step1_success) {
        static const u32s step2[] = {
            U"aríamos", U"eríamos", U"iríamos", U"ássemos", U"êssemos",
            U"íssemos", U"aríeis", U"eríeis", U"iríeis", U"ásseis",
            U"ésseis", U"ísseis", U"áramos", U"éramos", U"íramos",
            U"ávamos", U"aremos", U"eremos", U"iremos", U"ariam",
            U"eriam", U"iriam", U"assem", U"essem", U"issem", U"ara~o",
            U"era~o", U"ira~o", U"arias", U"erias", U"irias", U"ardes",
            U"erdes", U"irdes", U"asses", U"esses", U"isses", U"astes",
            U"estes", U"istes", U"áreis", U"areis", U"éreis", U"ereis",
            U"íreis", U"ireis", U"áveis", U"íamos", U"armos", U"ermos",
            U"irmos", U"aria", U"eria", U"iria", U"asse", U"esse",
            U"isse", U"aste", U"este", U"iste", U"arei", U"erei",
            U"irei", U"aram", U"eram", U"iram", U"avam", U"arem",
            U"erem", U"irem", U"ando", U"endo", U"indo", U"adas",
            U"idas", U"arás", U"aras", U"erás", U"eras", U"irás",
            U"avas", U"ares", U"eres", U"ires", U"íeis", U"ados",
            U"idos", U"ámos", U"amos", U"emos", U"imos", U"iras",
            U"ada", U"ida", U"ará", U"ara", U"erá", U"era", U"irá",
            U"ava", U"iam", U"ado", U"ido", U"ias", U"ais", U"eis",
            U"ira", U"ia", U"ei", U"am", U"em", U"ar", U"er", U"ir",
            U"as", U"es", U"is", U"eu", U"iu", U"ou"};
        for (const u32s& suf : step2) {
            if (ends(rv, suf)) {
                step2_success = true;
                word = py_slice(word, 0, -(long)suf.size());
                rv = py_slice(rv, 0, -(long)suf.size());
                break;
            }
        }
    }

    if (step1_success || step2_success) {
        if (ends(rv, U"i") && word.size() >= 2
            && word[word.size() - 2] == U'c') {
            word = py_slice(word, 0, -1);
            rv = py_slice(rv, 0, -1);
        }
    }

    if (!step1_success && !step2_success) {
        static const u32s step4[] = {U"os", U"a", U"i", U"o", U"á",
                                     U"í", U"ó"};
        for (const u32s& suf : step4) {
            if (ends(rv, suf)) {
                word = py_slice(word, 0, -(long)suf.size());
                rv = py_slice(rv, 0, -(long)suf.size());
                break;
            }
        }
    }

    if (ends(rv, U"e") || ends(rv, U"é") || ends(rv, U"ê")) {
        word = py_slice(word, 0, -1);
        rv = py_slice(rv, 0, -1);
        if ((ends(word, U"gu") && ends(rv, U"u"))
            || (ends(word, U"ci") && ends(rv, U"i")))
            word = py_slice(word, 0, -1);
    } else if (ends(word, U"ç")) {
        word = py_slice(word, 0, -1) + U"c";
    }

    replace_sub(word, U"a~", U"ã");
    replace_sub(word, U"o~", U"õ");
}

// --------------------------------------------------------------- romanian
//
// NLTK-quirk-preserving: steps 0-2 test `suffix in r1/r2` (substring
// containment against region snapshots that are NOT retruncated as the
// word shrinks), step 3's vowel guard omits 'u' and indexes the FIRST
// occurrence of the suffix in rv — all mirrored for byte parity.
// Diacritics are the pre-1993 cedilla forms (U+015F, U+0163) the Snowball
// algorithm (and NLTK) use.

static const char32_t RO_VOWELS[] = U"aeiouăâî";

static void stem_romanian(u32s& word) {
    bool step1_success = false, step2_success = false;

    for (size_t i = 1; i + 1 < word.size(); ++i) {
        if (in_set(word[i - 1], RO_VOWELS)
            && in_set(word[i + 1], RO_VOWELS)) {
            if (word[i] == U'u') word[i] = U'U';
            else if (word[i] == U'i') word[i] = U'I';
        }
    }

    size_t r1s, r2s;
    r1r2_standard(word, RO_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));
    size_t rvs = rv_standard(word, RO_VOWELS);
    u32s rv = word.substr(std::min(rvs, word.size()));

    // STEP 0: plurals and simplifications
    static const u32s step0[] = {
        U"iilor", U"ului", U"elor", U"iile", U"ilor", U"atei",
        U"aţie", U"aţia", U"aua", U"ele", U"iua", U"iei",
        U"ile", U"ul", U"ea", U"ii"};
    for (const u32s& suf : step0) {
        if (!ends(word, suf)) continue;
        if (contains(r1, suf)) {
            long n = (long)suf.size();
            if (suf == U"ul" || suf == U"ului") {
                word = py_slice(word, 0, -n);
                if (contains(rv, suf)) rv = py_slice(rv, 0, -n);
                else rv.clear();
            } else if (suf == U"aua" || suf == U"atei"
                       || (suf == U"ile"
                           && py_slice(word, -5, -3) != U"ab")) {
                word = py_slice(word, 0, -2);
            } else if (suf == U"ea" || suf == U"ele" || suf == U"elor") {
                word = py_slice(word, 0, -n) + U"e";
                if (contains(rv, suf)) rv = py_slice(rv, 0, -n) + U"e";
                else rv.clear();
            } else if (suf == U"ii" || suf == U"iua" || suf == U"iei"
                       || suf == U"iile" || suf == U"iilor"
                       || suf == U"ilor") {
                word = py_slice(word, 0, -n) + U"i";
                if (contains(rv, suf)) rv = py_slice(rv, 0, -n) + U"i";
                else rv.clear();
            } else if (suf == U"aţie" || suf == U"aţia") {
                word = py_slice(word, 0, -1);
            }
        }
        break;
    }

    // STEP 1: combining suffixes (repeat until no replacement)
    static const u32s step1[] = {
        U"abilitate", U"abilitati", U"abilităţi",
        U"ibilitate", U"abilităi", U"ivitate", U"ivitati",
        U"ivităţi", U"icitate", U"icitati",
        U"icităţi", U"icatori", U"ivităi",
        U"icităi", U"icator", U"aţiune", U"atoare",
        U"ătoare", U"iţiune", U"itoare", U"iciva", U"icive",
        U"icivi", U"icivă", U"icala", U"icale", U"icali",
        U"icală", U"ativa", U"ative", U"ativi", U"ativă",
        U"atori", U"ători", U"itiva", U"itive", U"itivi",
        U"itivă", U"itori", U"iciv", U"ical", U"ativ", U"ator",
        U"ător", U"itiv", U"itor"};
    while (true) {
        bool replacement_done = false;
        for (const u32s& suf : step1) {
            if (!ends(word, suf)) continue;
            if (contains(r1, suf)) {
                step1_success = true;
                replacement_done = true;
                long n = (long)suf.size();
                if (suf == U"abilitate" || suf == U"abilitati"
                    || suf == U"abilităi"
                    || suf == U"abilităţi") {
                    word = py_slice(word, 0, -n) + U"abil";
                } else if (suf == U"ibilitate") {
                    word = py_slice(word, 0, -5);
                } else if (suf == U"ivitate" || suf == U"ivitati"
                           || suf == U"ivităi"
                           || suf == U"ivităţi") {
                    word = py_slice(word, 0, -n) + U"iv";
                } else if (suf == U"icitate" || suf == U"icitati"
                           || suf == U"icităi"
                           || suf == U"icităţi"
                           || suf == U"icator" || suf == U"icatori"
                           || suf == U"iciv" || suf == U"iciva"
                           || suf == U"icive" || suf == U"icivi"
                           || suf == U"icivă" || suf == U"ical"
                           || suf == U"icala" || suf == U"icale"
                           || suf == U"icali" || suf == U"icală") {
                    word = py_slice(word, 0, -n) + U"ic";
                } else if (suf == U"ativ" || suf == U"ativa"
                           || suf == U"ative" || suf == U"ativi"
                           || suf == U"ativă" || suf == U"aţiune"
                           || suf == U"atoare" || suf == U"ator"
                           || suf == U"atori" || suf == U"ătoare"
                           || suf == U"ător" || suf == U"ători") {
                    word = py_slice(word, 0, -n) + U"at";
                    if (contains(r2, suf))
                        r2 = py_slice(r2, 0, -n) + U"at";
                } else if (suf == U"itiv" || suf == U"itiva"
                           || suf == U"itive" || suf == U"itivi"
                           || suf == U"itivă" || suf == U"iţiune"
                           || suf == U"itoare" || suf == U"itor"
                           || suf == U"itori") {
                    word = py_slice(word, 0, -n) + U"it";
                    if (contains(r2, suf))
                        r2 = py_slice(r2, 0, -n) + U"it";
                }
            } else {
                step1_success = false;
            }
            break;
        }
        if (!replacement_done) break;
    }

    // STEP 2: standard suffixes
    static const u32s step2[] = {
        U"abila", U"abile", U"abili", U"abilă", U"ibila", U"ibile",
        U"ibili", U"ibilă", U"atori", U"itate", U"itati",
        U"ităţi", U"abil", U"ibil", U"oasa", U"oasă",
        U"oase", U"anta", U"ante", U"anti", U"antă", U"ator",
        U"ităi", U"iune", U"iuni", U"isme", U"ista", U"iste",
        U"isti", U"istă", U"işti", U"ata", U"ată",
        U"ati", U"ate", U"uta", U"ută", U"uti", U"ute", U"ita",
        U"ită", U"iti", U"ite", U"ica", U"ice", U"ici",
        U"ică", U"osi", U"oşi", U"ant", U"iva", U"ive",
        U"ivi", U"ivă", U"ism", U"ist", U"at", U"ut", U"it",
        U"ic", U"os", U"iv"};
    for (const u32s& suf : step2) {
        if (!ends(word, suf)) continue;
        if (contains(r2, suf)) {
            step2_success = true;
            if (suf == U"iune" || suf == U"iuni") {
                if (word.size() >= 5
                    && word[word.size() - 5] == U'ţ')
                    word = py_slice(word, 0, -5) + U"t";
            } else if (suf == U"ism" || suf == U"isme" || suf == U"ist"
                       || suf == U"ista" || suf == U"iste"
                       || suf == U"isti" || suf == U"istă"
                       || suf == U"işti") {
                word = py_slice(word, 0, -(long)suf.size()) + U"ist";
            } else {
                word = py_slice(word, 0, -(long)suf.size());
            }
        }
        break;
    }

    // STEP 3: verb suffixes
    if (!step1_success && !step2_success) {
        static const u32s step3[] = {
            U"seserăţi", U"aserăţi",
            U"iserăţi", U"âserăţi",
            U"userăţi", U"seserăm", U"aserăm",
            U"iserăm", U"âserăm", U"userăm",
            U"serăţi", U"seseşi", U"seseră",
            U"ească", U"arăţi", U"urăţi",
            U"irăţi", U"ârăţi", U"aseşi",
            U"aseră", U"iseşi", U"iseră",
            U"âseşi", U"âseră", U"useşi",
            U"useră", U"serăm", U"sesem", U"indu",
            U"ându", U"ează", U"eşti", U"eşte",
            U"ăşti", U"ăşte", U"eaţi",
            U"iaţi", U"arăm", U"urăm", U"irăm",
            U"ârăm", U"asem", U"isem", U"âsem", U"usem",
            U"seşi", U"seră", U"sese", U"are", U"ere",
            U"ire", U"âre", U"ind", U"ând", U"eze", U"ezi",
            U"esc", U"ăsc", U"eam", U"eai", U"eau", U"iam",
            U"iai", U"iau", U"aşi", U"ară", U"uşi",
            U"ură", U"işi", U"iră", U"âşi",
            U"âră", U"ase", U"ise", U"âse", U"use",
            U"aţi", U"eţi", U"iţi", U"âţi",
            U"sei", U"ez", U"am", U"ai", U"au", U"ea", U"ia", U"ui",
            U"âi", U"ăm", U"em", U"im", U"âm", U"se"};
        static const u32s grp = U"seserăţi|seserăm|"
            U"serăţi|seseşi|seseră|serăm|sesem|"
            U"seşi|seră|sese|aţi|eţi|iţi|"
            U"âţi|sei|ăm|em|im|âm|se";
        for (const u32s& suf : step3) {
            if (!ends(word, suf)) continue;
            if (contains(rv, suf)) {
                bool in_grp = false;
                {
                    size_t a = 0;
                    while (a <= grp.size()) {
                        size_t b = grp.find(U'|', a);
                        if (b == u32s::npos) b = grp.size();
                        if (grp.substr(a, b - a) == suf) {
                            in_grp = true;
                            break;
                        }
                        a = b + 1;
                    }
                }
                if (in_grp) {
                    word = py_slice(word, 0, -(long)suf.size());
                    rv = py_slice(rv, 0, -(long)suf.size());
                } else {
                    size_t pos = rv.find(suf);
                    static const char32_t RO_G3[] =
                        U"aeioăâî";
                    if (pos != 0 && pos != u32s::npos
                        && !in_set(rv[pos - 1], RO_G3))
                        word = py_slice(word, 0, -(long)suf.size());
                }
                break;
            }
        }
    }

    // STEP 4: final vowel
    static const u32s step4[] = {U"ie", U"a", U"e", U"i", U"ă"};
    for (const u32s& suf : step4) {
        if (ends(word, suf)) {
            if (contains(rv, suf))
                word = py_slice(word, 0, -(long)suf.size());
            break;
        }
    }

    replace_all(word, U'I', U"i");
    replace_all(word, U'U', U"u");
}

// ---------------------------------------------------------------- russian
//
// NLTK formulation: transliterate Cyrillic to a Roman working alphabet
// (multi-char digraphs "i^a"/"i^u"/"e`"/"sh"/...), stem in Roman space,
// transliterate back with ordered longest-first replaces.  Words with no
// codepoint above U+00FF are returned unchanged (NLTK's chr_exceeded
// gate).

static bool ru_starts(const u32s& s, const u32s& pre) {
    return s.size() >= pre.size()
        && std::equal(pre.begin(), pre.end(), s.begin());
}

static void ru_regions(const u32s& word, u32s& rv, u32s& r2) {
    // placeholder space: i^a->A, i^u->U, e`->E so digraph vowels are
    // single codepoints for the region scan
    u32s w = word;
    replace_sub(w, U"i^a", U"A");
    replace_sub(w, U"i^u", U"U");
    replace_sub(w, U"e`", U"E");
    static const char32_t RU_V[] = U"AUEaeiouy";
    u32s r1;
    for (size_t i = 1; i < w.size(); ++i)
        if (!in_set(w[i], RU_V) && in_set(w[i - 1], RU_V)) {
            r1 = w.substr(i + 1);
            break;
        }
    r2.clear();
    for (size_t i = 1; i < r1.size(); ++i)
        if (!in_set(r1[i], RU_V) && in_set(r1[i - 1], RU_V)) {
            r2 = r1.substr(i + 1);
            break;
        }
    rv.clear();
    for (size_t i = 0; i < w.size(); ++i)
        if (in_set(w[i], RU_V)) {
            rv = w.substr(i + 1);
            break;
        }
    replace_sub(r2, U"A", U"i^a");
    replace_sub(r2, U"U", U"i^u");
    replace_sub(r2, U"E", U"e`");
    replace_sub(rv, U"A", U"i^a");
    replace_sub(rv, U"U", U"i^u");
    replace_sub(rv, U"E", U"e`");
}

static void stem_russian(u32s& word) {
    bool exceeded = false;
    for (char32_t c : word)
        if (c > 0xFF) { exceeded = true; break; }
    if (!exceeded) return;

    // cyrillic -> roman (both cases, NLTK order)
    static const std::pair<const char32_t*, const char32_t*> C2R[] = {
        {U"А", U"a"}, {U"а", U"a"}, {U"Б", U"b"}, {U"б", U"b"},
        {U"В", U"v"}, {U"в", U"v"}, {U"Г", U"g"}, {U"г", U"g"},
        {U"Д", U"d"}, {U"д", U"d"}, {U"Е", U"e"}, {U"е", U"e"},
        {U"Ё", U"e"}, {U"ё", U"e"}, {U"Ж", U"zh"}, {U"ж", U"zh"},
        {U"З", U"z"}, {U"з", U"z"}, {U"И", U"i"}, {U"и", U"i"},
        {U"Й", U"i`"}, {U"й", U"i`"}, {U"К", U"k"}, {U"к", U"k"},
        {U"Л", U"l"}, {U"л", U"l"}, {U"М", U"m"}, {U"м", U"m"},
        {U"Н", U"n"}, {U"н", U"n"}, {U"О", U"o"}, {U"о", U"o"},
        {U"П", U"p"}, {U"п", U"p"}, {U"Р", U"r"}, {U"р", U"r"},
        {U"С", U"s"}, {U"с", U"s"}, {U"Т", U"t"}, {U"т", U"t"},
        {U"У", U"u"}, {U"у", U"u"}, {U"Ф", U"f"}, {U"ф", U"f"},
        {U"Х", U"kh"}, {U"х", U"kh"}, {U"Ц", U"t^s"}, {U"ц", U"t^s"},
        {U"Ч", U"ch"}, {U"ч", U"ch"}, {U"Ш", U"sh"}, {U"ш", U"sh"},
        {U"Щ", U"shch"}, {U"щ", U"shch"}, {U"Ъ", U"''"}, {U"ъ", U"''"},
        {U"Ы", U"y"}, {U"ы", U"y"}, {U"Ь", U"'"}, {U"ь", U"'"},
        {U"Э", U"e`"}, {U"э", U"e`"}, {U"Ю", U"i^u"}, {U"ю", U"i^u"},
        {U"Я", U"i^a"}, {U"я", U"i^a"}};
    for (auto& pr : C2R) replace_sub(word, pr.first, pr.second);

    bool step1_success = false, adjectival_removed = false,
         verb_removed = false, undouble_success = false,
         superlative_removed = false;

    u32s rv, r2;
    ru_regions(word, rv, r2);

    auto cut = [&](long n) {
        word = py_slice(word, 0, -n);
        r2 = py_slice(r2, 0, -n);
        rv = py_slice(rv, 0, -n);
    };
    // preceding-"a" guard shared by the conditional suffix groups
    auto a_precedes = [&](long n) {
        return py_slice(rv, -n - 3, -n) == U"i^a"
            || py_slice(rv, -n - 1, -n) == U"a";
    };

    // Step 1: perfective gerund
    static const u32s pg[] = {U"ivshis'", U"yvshis'", U"vshis'",
                              U"ivshi", U"yvshi", U"vshi", U"iv", U"yv",
                              U"v"};
    for (const u32s& suf : pg) {
        if (!ends(rv, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"v" || suf == U"vshi" || suf == U"vshis'") {
            if (a_precedes(n)) {
                cut(n);
                step1_success = true;
                break;
            }
        } else {
            cut(n);
            step1_success = true;
            break;
        }
    }

    if (!step1_success) {
        static const u32s refl[] = {U"si^a", U"s'"};
        for (const u32s& suf : refl) {
            if (ends(rv, suf)) {
                cut((long)suf.size());
                break;
            }
        }

        // adjectival: participle prefixes ("i^ushch","shch","vsh","em"
        // [len>=4],"nn") require a preceding a / i^a; plain adjective
        // endings are removed unconditionally (mirrors NLTK's explicit
        // group list exactly — "ui^ushch*", "ivsh*", "yvsh*", "emu",
        // "em" fall through to the unconditional branch)
        static const u32s adj[] = {
            U"ui^ushchi^ui^u", U"ui^ushchi^ai^a", U"ui^ushchimi",
            U"ui^ushchymi", U"ui^ushchego", U"ui^ushchogo",
            U"ui^ushchemu", U"ui^ushchomu", U"ui^ushchikh",
            U"ui^ushchykh", U"ui^ushchui^u", U"ui^ushchaia",
            U"ui^ushchoi^u", U"ui^ushchei^u", U"i^ushchi^ui^u",
            U"i^ushchi^ai^a", U"ui^ushchee", U"ui^ushchie",
            U"ui^ushchye", U"ui^ushchoe", U"ui^ushchei`",
            U"ui^ushchii`", U"ui^ushchyi`", U"ui^ushchoi`",
            U"ui^ushchem", U"ui^ushchim", U"ui^ushchym", U"ui^ushchom",
            U"i^ushchimi", U"i^ushchymi", U"i^ushchego", U"i^ushchogo",
            U"i^ushchemu", U"i^ushchomu", U"i^ushchikh", U"i^ushchykh",
            U"i^ushchui^u", U"i^ushchai^a", U"i^ushchoi^u",
            U"i^ushchei^u", U"i^ushchee", U"i^ushchie", U"i^ushchye",
            U"i^ushchoe", U"i^ushchei`", U"i^ushchii`", U"i^ushchyi`",
            U"i^ushchoi`", U"i^ushchem", U"i^ushchim", U"i^ushchym",
            U"i^ushchom", U"shchi^ui^u", U"shchi^ai^a", U"ivshi^ui^u",
            U"ivshi^ai^a", U"yvshi^ui^u", U"yvshi^ai^a", U"shchimi",
            U"shchymi", U"shchego", U"shchogo", U"shchemu", U"shchomu",
            U"shchikh", U"shchykh", U"shchui^u", U"shchai^a",
            U"shchoi^u", U"shchei^u", U"ivshimi", U"ivshymi",
            U"ivshego", U"ivshogo", U"ivshemu", U"ivshomu", U"ivshikh",
            U"ivshykh", U"ivshui^u", U"ivshai^a", U"ivshoi^u",
            U"ivshei^u", U"yvshimi", U"yvshymi", U"yvshego",
            U"yvshogo", U"yvshemu", U"yvshomu", U"yvshikh", U"yvshykh",
            U"yvshui^u", U"yvshai^a", U"yvshoi^u", U"yvshei^u",
            U"vshi^ui^u", U"vshi^ai^a", U"shchee", U"shchie",
            U"shchye", U"shchoe", U"shchei`", U"shchii`", U"shchyi`",
            U"shchoi`", U"shchem", U"shchim", U"shchym", U"shchom",
            U"ivshee", U"ivshie", U"ivshye", U"ivshoe", U"ivshei`",
            U"ivshii`", U"ivshyi`", U"ivshoi`", U"ivshem", U"ivshim",
            U"ivshym", U"ivshom", U"yvshee", U"yvshie", U"yvshye",
            U"yvshoe", U"yvshei`", U"yvshii`", U"yvshyi`", U"yvshoi`",
            U"yvshem", U"yvshim", U"yvshym", U"yvshom", U"vshimi",
            U"vshymi", U"vshego", U"vshogo", U"vshemu", U"vshomu",
            U"vshikh", U"vshykh", U"vshui^u", U"vshai^a", U"vshoi^u",
            U"vshei^u", U"emi^ui^u", U"emi^ai^a", U"nni^ui^u",
            U"nni^ai^a", U"vshee", U"vshie", U"vshye", U"vshoe",
            U"vshei`", U"vshii`", U"vshyi`", U"vshoi`", U"vshem",
            U"vshim", U"vshym", U"vshom", U"emimi", U"emymi",
            U"emego", U"emogo", U"ememu", U"emomu", U"emikh",
            U"emykh", U"emui^u", U"emai^a", U"emoi^u", U"emei^u",
            U"nnimi", U"nnymi", U"nnego", U"nnogo", U"nnemu",
            U"nnomu", U"nnikh", U"nnykh", U"nnui^u", U"nnai^a",
            U"nnoi^u", U"nnei^u", U"emee", U"emie", U"emye", U"emoe",
            U"emei`", U"emii`", U"emyi`", U"emoi`", U"emem", U"emim",
            U"emym", U"emom", U"nnee", U"nnie", U"nnye", U"nnoe",
            U"nnei`", U"nnii`", U"nnyi`", U"nnoi`", U"nnem", U"nnim",
            U"nnym", U"nnom", U"i^ui^u", U"i^ai^a", U"imi", U"ymi",
            U"ego", U"ogo", U"emu", U"omu", U"ikh", U"ykh", U"ui^u",
            U"ai^a", U"oi^u", U"ei^u", U"ee", U"ie", U"ye", U"oe",
            U"ei`", U"ii`", U"yi`", U"oi`", U"em", U"im", U"ym",
            U"om"};
        for (const u32s& suf : adj) {
            if (!ends(rv, suf)) continue;
            bool conditional =
                (ru_starts(suf, U"i^ushch") || ru_starts(suf, U"shch")
                 || ru_starts(suf, U"vsh") || ru_starts(suf, U"nn")
                 || (ru_starts(suf, U"em") && suf.size() >= 4));
            long n = (long)suf.size();
            if (conditional) {
                if (a_precedes(n)) {
                    cut(n);
                    adjectival_removed = true;
                    break;
                }
            } else {
                cut(n);
                adjectival_removed = true;
                break;
            }
        }

        if (!adjectival_removed) {
            static const u32s verb[] = {
                U"esh'", U"ei`te", U"ui`te", U"ui^ut", U"ish'",
                U"ete", U"i`te", U"i^ut", U"nno", U"ila", U"yla",
                U"ena", U"ite", U"ili", U"yli", U"ilo", U"ylo",
                U"eno", U"i^at", U"uet", U"eny", U"it'", U"yt'",
                U"ui^u", U"la", U"na", U"li", U"em", U"lo", U"no",
                U"et", U"ny", U"t'", U"ei`", U"ui`", U"il", U"yl",
                U"im", U"ym", U"en", U"it", U"yt", U"i^u", U"i`",
                U"l", U"n"};
            static const u32s verb_cond[] = {
                U"la", U"na", U"ete", U"i`te", U"li", U"i`", U"l",
                U"em", U"n", U"lo", U"no", U"et", U"i^ut", U"ny",
                U"t'", U"esh'", U"nno"};
            for (const u32s& suf : verb) {
                if (!ends(rv, suf)) continue;
                bool conditional = false;
                for (const u32s& c : verb_cond)
                    if (c == suf) { conditional = true; break; }
                long n = (long)suf.size();
                if (conditional) {
                    if (a_precedes(n)) {
                        cut(n);
                        verb_removed = true;
                        break;
                    }
                } else {
                    cut(n);
                    verb_removed = true;
                    break;
                }
            }
        }

        if (!adjectival_removed && !verb_removed) {
            static const u32s noun[] = {
                U"ii^ami", U"ii^akh", U"i^ami", U"ii^am", U"i^akh",
                U"ami", U"iei`", U"i^am", U"iem", U"akh", U"ii^u",
                U"'i^u", U"ii^a", U"'i^a", U"ev", U"ov", U"ie",
                U"'e", U"ei", U"ii", U"ei`", U"oi`", U"ii`", U"em",
                U"am", U"om", U"i^u", U"i^a", U"a", U"e", U"i",
                U"i`", U"o", U"u", U"y", U"'"};
            for (const u32s& suf : noun) {
                if (ends(rv, suf)) {
                    cut((long)suf.size());
                    break;
                }
            }
        }
    }

    // Step 2: remove final "i"
    if (ends(rv, U"i")) {
        word = py_slice(word, 0, -1);
        r2 = py_slice(r2, 0, -1);
    }

    // Step 3: derivational (checked in R2)
    static const u32s deriv[] = {U"ost'", U"ost"};
    for (const u32s& suf : deriv) {
        if (ends(r2, suf)) {
            word = py_slice(word, 0, -(long)suf.size());
            break;
        }
    }

    // Step 4: undouble n / superlative / soft sign
    if (ends(word, U"nn")) {
        word = py_slice(word, 0, -1);
        undouble_success = true;
    }
    if (!undouble_success) {
        static const u32s sup[] = {U"ei`she", U"ei`sh"};
        for (const u32s& suf : sup) {
            if (ends(word, suf)) {
                word = py_slice(word, 0, -(long)suf.size());
                superlative_removed = true;
                break;
            }
        }
        if (ends(word, U"nn")) word = py_slice(word, 0, -1);
    }
    if (!undouble_success && !superlative_removed) {
        if (ends(word, U"'")) word = py_slice(word, 0, -1);
    }

    // roman -> cyrillic (NLTK replace order: digraphs first)
    static const std::pair<const char32_t*, const char32_t*> R2C[] = {
        {U"i^u", U"ю"}, {U"i^a", U"я"}, {U"shch", U"щ"}, {U"kh", U"х"},
        {U"t^s", U"ц"}, {U"ch", U"ч"}, {U"e`", U"э"}, {U"i`", U"й"},
        {U"sh", U"ш"}, {U"k", U"к"}, {U"e", U"е"}, {U"zh", U"ж"},
        {U"a", U"а"}, {U"b", U"б"}, {U"v", U"в"}, {U"g", U"г"},
        {U"d", U"д"}, {U"z", U"з"}, {U"i", U"и"}, {U"l", U"л"},
        {U"m", U"м"}, {U"n", U"н"}, {U"o", U"о"}, {U"p", U"п"},
        {U"r", U"р"}, {U"s", U"с"}, {U"t", U"т"}, {U"u", U"у"},
        {U"f", U"ф"}, {U"''", U"ъ"}, {U"y", U"ы"}, {U"'", U"ь"}};
    for (auto& pr : R2C) replace_sub(word, pr.first, pr.second);
}

// ---------------------------------------------------------------- finnish

static const char32_t FI_VOWELS[] = U"aeiouyäö";
static const char32_t FI_RESTRICTED[] = U"aeiouäö";
static const char32_t FI_CONS[] = U"bcdfghjklmnpqrstvwxz";

static bool fi_long_vowel(const u32s& s) {
    if (s.size() != 2) return false;
    static const u32s lv[] = {U"aa", U"ee", U"ii", U"oo", U"uu",
                              U"ää", U"öö"};
    for (const u32s& v : lv)
        if (s == v) return true;
    return false;
}

static bool fi_double_cons(const u32s& s) {
    if (s.size() != 2 || s[0] != s[1]) return false;
    return in_set(s[0], FI_CONS) && s[0] != U'y';
}

static void stem_finnish(u32s& word) {
    bool step3_success = false;

    size_t r1s, r2s;
    r1r2_standard(word, FI_VOWELS, r1s, r2s);
    u32s r1 = word.substr(std::min(r1s, word.size()));
    u32s r2 = word.substr(std::min(r2s, word.size()));

    auto cut = [&](long n) {
        word = py_slice(word, 0, -n);
        r1 = py_slice(r1, 0, -n);
        r2 = py_slice(r2, 0, -n);
    };
    auto wat = [&](long i) -> char32_t {
        // Python word[i] for negative i, '\0' when out of range (callers
        // only reach in-range offsets; see region-start>=2 invariant)
        long n = (long)word.size();
        if (i < 0) i += n;
        return (i >= 0 && i < n) ? word[(size_t)i] : U'\0';
    };

    // STEP 1: particles
    static const u32s step1[] = {U"kaan", U"kään", U"sti", U"kin",
                                 U"han", U"hän", U"ko", U"kö", U"pa",
                                 U"pä"};
    for (const u32s& suf : step1) {
        if (!ends(r1, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"sti") {
            if (contains(r2, suf)) cut(3);
        } else {
            if (in_set(wat(-n - 1), U"ntaeiouyäö")) cut(n);
        }
        break;
    }

    // STEP 2: possessives
    static const u32s step2[] = {U"nsa", U"nsä", U"mme", U"nne", U"si",
                                 U"ni", U"an", U"än", U"en"};
    for (const u32s& suf : step2) {
        if (!ends(r1, suf)) continue;
        if (suf == U"si") {
            if (wat(-3) != U'k') cut(2);
        } else if (suf == U"ni") {
            cut(2);
            if (ends(word, U"kse")) word = py_slice(word, 0, -3) + U"ksi";
            if (ends(r1, U"kse")) r1 = py_slice(r1, 0, -3) + U"ksi";
            if (ends(r2, U"kse")) r2 = py_slice(r2, 0, -3) + U"ksi";
        } else if (suf == U"an") {
            u32s p2 = py_slice(word, -4, -2), p3 = py_slice(word, -5, -2);
            if (p2 == U"ta" || p2 == U"na" || p3 == U"ssa" || p3 == U"sta"
                || p3 == U"lla" || p3 == U"lta")
                cut(2);
        } else if (suf == U"än") {
            u32s p2 = py_slice(word, -4, -2), p3 = py_slice(word, -5, -2);
            if (p2 == U"tä" || p2 == U"nä" || p3 == U"ssä" || p3 == U"stä"
                || p3 == U"llä" || p3 == U"ltä")
                cut(2);
        } else if (suf == U"en") {
            u32s p3 = py_slice(word, -5, -2);
            if (p3 == U"lle" || p3 == U"ine") cut(2);
        } else {
            cut(3);
        }
        break;
    }

    // STEP 3: cases
    static const u32s step3[] = {
        U"siin", U"tten", U"seen", U"han", U"hen", U"hin", U"hon",
        U"hän", U"hön", U"den", U"tta", U"ttä", U"ssa", U"ssä",
        U"sta", U"stä", U"lla", U"llä", U"lta", U"ltä", U"lle",
        U"ksi", U"ine", U"ta", U"tä", U"na", U"nä", U"a", U"ä",
        U"n"};
    for (const u32s& suf : step3) {
        if (!ends(r1, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"han" || suf == U"hen" || suf == U"hin"
            || suf == U"hon" || suf == U"hän" || suf == U"hön") {
            char32_t v = suf[1];  // vowel matching the illative harmony
            if (wat(-4) == v) {
                cut(3);
                step3_success = true;
            }
        } else if (suf == U"siin" || suf == U"den" || suf == U"tten") {
            if (wat(-n - 1) == U'i'
                && in_set(wat(-n - 2), FI_RESTRICTED)) {
                cut(n);
                step3_success = true;
            } else {
                continue;  // try the next suffix (NLTK's `continue`)
            }
        } else if (suf == U"seen") {
            if (fi_long_vowel(py_slice(word, -6, -4))) {
                cut(4);
                step3_success = true;
            } else {
                continue;
            }
        } else if (suf == U"a" || suf == U"ä") {
            if (in_set(wat(-2), FI_VOWELS) && in_set(wat(-3), FI_CONS)) {
                cut(1);
                step3_success = true;
            }
        } else if (suf == U"tta" || suf == U"ttä") {
            if (wat(-4) == U'e') {
                cut(3);
                step3_success = true;
            }
        } else if (suf == U"n") {
            cut(1);
            step3_success = true;
            u32s t = py_slice(word, -2, (long)word.size());
            if (t == U"ie" || fi_long_vowel(t)) cut(1);
        } else {
            cut(n);
            step3_success = true;
        }
        break;
    }

    // STEP 4: other endings (checked in R2)
    static const u32s step4[] = {U"impi", U"impa", U"impä", U"immi",
                                 U"imma", U"immä", U"mpi", U"mpa",
                                 U"mpä", U"mmi", U"mma", U"mmä",
                                 U"eja", U"ejä"};
    for (const u32s& suf : step4) {
        if (!ends(r2, suf)) continue;
        if (suf == U"mpi" || suf == U"mpa" || suf == U"mpä"
            || suf == U"mmi" || suf == U"mma" || suf == U"mmä") {
            if (py_slice(word, -5, -3) != U"po") cut(3);
        } else {
            cut((long)suf.size());
        }
        break;
    }

    // STEP 5: plurals
    if (step3_success && r1.size() >= 1
        && (r1.back() == U'i' || r1.back() == U'j')) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
    } else if (!step3_success && r1.size() >= 2 && r1.back() == U't'
               && in_set(r1[r1.size() - 2], FI_VOWELS)) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
        r2 = py_slice(r2, 0, -1);
        if (ends(r2, U"imma")) {
            word = py_slice(word, 0, -4);
            r1 = py_slice(r1, 0, -4);
        } else if (ends(r2, U"mma") && py_slice(r2, -5, -3) != U"po") {
            word = py_slice(word, 0, -3);
            r1 = py_slice(r1, 0, -3);
        }
    }

    // STEP 6: tidying
    if (fi_long_vowel(py_slice(r1, -2, (long)r1.size()))) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
    }
    if (r1.size() >= 2 && in_set(r1[r1.size() - 2], FI_CONS)
        && in_set(r1.back(), U"aäei")) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
    }
    if (ends(r1, U"oj") || ends(r1, U"uj")) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
    }
    if (ends(r1, U"jo")) {
        word = py_slice(word, 0, -1);
        r1 = py_slice(r1, 0, -1);
    }
    // double consonant followed by zero or more vowels: drop one
    for (size_t i = 1; i < word.size(); ++i) {
        char32_t c = word[word.size() - i];
        if (in_set(c, FI_VOWELS)) continue;
        if (i == 1) {
            if (fi_double_cons(py_slice(word, -2, (long)word.size())))
                word = py_slice(word, 0, -1);
        } else {
            if (fi_double_cons(py_slice(word, -(long)i - 1,
                                        -(long)i + 1)))
                word = py_slice(word, 0, -(long)i)
                    + py_slice(word, -(long)i + 1, (long)word.size());
        }
        break;
    }
}

// --------------------------------------------------------------- hungarian
//
// NLTK-quirk-preserving: R1 for vowel-initial words is computed from the
// first occurrence of the DIGRAPH'S LAST LETTER anywhere in the word
// (NLTK's word.index(digraph[-1])), and step 5 checks both factive
// suffixes without breaking — both mirrored for byte parity.

static const char32_t HU_VOWELS[] = U"aeiouöüáéíóõúû";

static const u32s HU_DIGRAPHS[] = {U"cs", U"dz", U"dzs", U"gy", U"ly",
                                   U"ny", U"ty", U"zs"};
static const u32s HU_DOUBLE[] = {
    U"bb", U"cc", U"ccs", U"dd", U"ff", U"gg", U"ggy", U"jj", U"kk",
    U"ll", U"lly", U"mm", U"nn", U"nny", U"pp", U"rr", U"ss", U"ssz",
    U"tt", U"tty", U"vv", U"zz", U"zzs"};

static u32s hu_r1(const u32s& word) {
    if (word.empty()) return u32s();
    if (in_set(word[0], HU_VOWELS)) {
        for (const u32s& dg : HU_DIGRAPHS) {
            if (word.find(dg, 1) != u32s::npos) {
                size_t p = word.find(dg.back());
                if (p != u32s::npos && p + 1 <= word.size())
                    return word.substr(p + 1);
                return u32s();
            }
        }
        for (size_t i = 1; i < word.size(); ++i)
            if (!in_set(word[i], HU_VOWELS)) return word.substr(i + 1);
    } else {
        for (size_t i = 1; i < word.size(); ++i)
            if (in_set(word[i], HU_VOWELS)) return word.substr(i + 1);
    }
    return u32s();
}

static void stem_hungarian(u32s& word) {
    u32s r1 = hu_r1(word);

    // STEP 1: instrumental case (undouble before "al"/"el")
    if (ends(r1, U"al") || ends(r1, U"el")) {
        for (const u32s& dc : HU_DOUBLE) {
            long n = (long)dc.size();
            if (py_slice(word, -2 - n, -2) == dc) {
                word = py_slice(word, 0, -4)
                    + py_slice(word, -3, -2);
                if (py_slice(r1, -2 - n, -2) == dc)
                    r1 = py_slice(r1, 0, -4) + py_slice(r1, -3, -2);
                break;
            }
        }
    }

    // STEP 2: frequent cases
    static const u32s step2[] = {
        U"képpen", U"onként", U"enként", U"anként", U"képp", U"ként",
        U"ban", U"ben", U"nak", U"nek", U"val", U"vel", U"tól",
        U"tõl", U"ról", U"rõl", U"ból", U"bõl", U"hoz", U"hez",
        U"höz", U"nál", U"nél", U"ért", U"kor", U"ba", U"be", U"ra",
        U"re", U"ig", U"at", U"et", U"ot", U"öt", U"ul", U"ül",
        U"vá", U"vé", U"en", U"on", U"an", U"ön", U"n", U"t"};
    for (const u32s& suf : step2) {
        if (!ends(word, suf)) continue;
        if (ends(r1, suf)) {
            long n = (long)suf.size();
            word = py_slice(word, 0, -n);
            r1 = py_slice(r1, 0, -n);
            if (ends(r1, U"á")) {
                word = py_slice(word, 0, -1) + U"a";
                r1 = py_slice(r1, 0, -1) + U"a";
            } else if (ends(r1, U"é")) {
                word = py_slice(word, 0, -1) + U"e";
                r1 = py_slice(r1, 0, -1) + U"e";
            }
        }
        break;
    }

    // STEP 3: special cases
    static const u32s step3[] = {U"ánként", U"án", U"én"};
    for (const u32s& suf : step3) {
        if (!ends(r1, suf)) continue;
        long n = (long)suf.size();
        const char32_t* rep = (suf == U"én") ? U"e" : U"a";
        word = py_slice(word, 0, -n) + rep;
        r1 = py_slice(r1, 0, -n) + rep;
        break;
    }

    // STEP 4: other cases
    static const u32s step4[] = {U"astul", U"estül", U"ástul",
                                 U"éstül", U"stul", U"stül"};
    for (const u32s& suf : step4) {
        if (!ends(r1, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"ástul") {
            word = py_slice(word, 0, -n) + U"a";
            r1 = py_slice(r1, 0, -n) + U"a";
        } else if (suf == U"éstül") {
            word = py_slice(word, 0, -n) + U"e";
            r1 = py_slice(r1, 0, -n) + U"e";
        } else {
            word = py_slice(word, 0, -n);
            r1 = py_slice(r1, 0, -n);
        }
        break;
    }

    // STEP 5: factive case (undouble; NLTK checks both suffixes)
    static const u32s step5[] = {U"á", U"é"};
    for (const u32s& suf : step5) {
        if (!ends(r1, suf)) continue;
        for (const u32s& dc : HU_DOUBLE) {
            long n = (long)dc.size();
            if (py_slice(word, -1 - n, -1) == dc) {
                word = py_slice(word, 0, -3) + py_slice(word, -2, -1);
                if (py_slice(r1, -1 - n, -1) == dc)
                    r1 = py_slice(r1, 0, -3) + py_slice(r1, -2, -1);
                break;
            }
        }
    }

    // STEP 6: owned
    static const u32s step6[] = {U"oké", U"öké", U"aké", U"eké",
                                 U"áké", U"áéi", U"éké", U"ééi",
                                 U"ké", U"éi", U"éé", U"é"};
    for (const u32s& suf : step6) {
        if (!ends(r1, suf)) continue;
        long n = (long)suf.size();
        if (suf == U"áké" || suf == U"áéi") {
            word = py_slice(word, 0, -n) + U"a";
            r1 = py_slice(r1, 0, -n) + U"a";
        } else if (suf == U"éké" || suf == U"ééi" || suf == U"éé") {
            word = py_slice(word, 0, -n) + U"e";
            r1 = py_slice(r1, 0, -n) + U"e";
        } else {
            word = py_slice(word, 0, -n);
            r1 = py_slice(r1, 0, -n);
        }
        break;
    }

    // STEP 7: singular owner
    static const u32s step7[] = {
        U"ájuk", U"éjük", U"ünk", U"unk", U"juk", U"jük", U"ánk",
        U"énk", U"nk", U"uk", U"ük", U"em", U"om", U"am", U"od",
        U"ed", U"ad", U"öd", U"ja", U"je", U"ám", U"ád", U"ém",
        U"éd", U"m", U"d", U"a", U"e", U"o", U"á", U"é"};
    for (const u32s& suf : step7) {
        if (!ends(word, suf)) continue;
        if (ends(r1, suf)) {
            long n = (long)suf.size();
            if (suf == U"ánk" || suf == U"ájuk" || suf == U"ám"
                || suf == U"ád" || suf == U"á") {
                word = py_slice(word, 0, -n) + U"a";
                r1 = py_slice(r1, 0, -n) + U"a";
            } else if (suf == U"énk" || suf == U"éjük" || suf == U"ém"
                       || suf == U"éd" || suf == U"é") {
                word = py_slice(word, 0, -n) + U"e";
                r1 = py_slice(r1, 0, -n) + U"e";
            } else {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
            }
        }
        break;
    }

    // STEP 8: plural owner
    static const u32s step8[] = {
        U"jaitok", U"jeitek", U"jaink", U"jeink", U"aitok", U"eitek",
        U"áitok", U"éitek", U"jaim", U"jeim", U"jaid", U"jeid",
        U"eink", U"aink", U"itek", U"jeik", U"jaik", U"áink",
        U"éink", U"aim", U"eim", U"aid", U"eid", U"jai", U"jei",
        U"ink", U"aik", U"eik", U"áim", U"áid", U"áik", U"éim",
        U"éid", U"éik", U"im", U"id", U"ai", U"ei", U"ik", U"ái",
        U"éi", U"i"};
    for (const u32s& suf : step8) {
        if (!ends(word, suf)) continue;
        if (ends(r1, suf)) {
            long n = (long)suf.size();
            if (suf == U"áim" || suf == U"áid" || suf == U"ái"
                || suf == U"áink" || suf == U"áitok" || suf == U"áik") {
                word = py_slice(word, 0, -n) + U"a";
                r1 = py_slice(r1, 0, -n) + U"a";
            } else if (suf == U"éim" || suf == U"éid" || suf == U"éi"
                       || suf == U"éink" || suf == U"éitek"
                       || suf == U"éik") {
                word = py_slice(word, 0, -n) + U"e";
                r1 = py_slice(r1, 0, -n) + U"e";
            } else {
                word = py_slice(word, 0, -n);
                r1 = py_slice(r1, 0, -n);
            }
        }
        break;
    }

    // STEP 9: plural
    static const u32s step9[] = {U"ák", U"ék", U"ök", U"ok", U"ek",
                                 U"ak", U"k"};
    for (const u32s& suf : step9) {
        if (!ends(word, suf)) continue;
        if (ends(r1, suf)) {
            long n = (long)suf.size();
            if (suf == U"ák") word = py_slice(word, 0, -n) + U"a";
            else if (suf == U"ék") word = py_slice(word, 0, -n) + U"e";
            else word = py_slice(word, 0, -n);
        }
        break;
    }
}

// ----------------------------------------------------------------- arabic
//
// Snowball Arabic light stemmer (snowballstem.org arabic/stem_Unicode.sbl
// lineage), matching NLTK's port with FRESH-CALL semantics: NLTK leaks
// `suffixes_verb_step1_success` across stem() calls (it is the one flag
// its stem() forgets to reset), so parity is defined against a fresh
// stemmer instance per word — the pure function the algorithm specifies.

static bool ar_starts(const u32s& s, const u32s& pre) {
    return s.size() >= pre.size()
        && std::equal(pre.begin(), pre.end(), s.begin());
}

static bool ar_in(const u32s& s, std::initializer_list<const char32_t*> set) {
    for (const char32_t* p : set)
        if (s == p) return true;
    return false;
}

static void stem_arabic(u32s& token) {
    bool is_verb = true, is_noun = true, is_defined = false;
    bool sv1 = false, sv2a = false, sv2b = false;
    bool sn2c2 = false, sn1a_unused = false, sn2a = false, sn2b = false,
         sn1b = false;
    bool p2a = false, p3a = false, p3b = false;
    (void)sn1a_unused;

    // checks 1: definite articles (run on the RAW token, before
    // normalization — NLTK order)
    {
        static const u32s c1[] = {U"كال",
                                  U"بال",
                                  U"ال", U"لل"};
        for (const u32s& pre : c1) {
            if (!ar_starts(token, pre)) continue;
            if (pre.size() == 3 && token.size() > 4) {
                is_noun = true; is_verb = false; is_defined = true;
                break;
            }
            if (pre.size() == 2 && token.size() > 3) {
                is_noun = true; is_verb = false; is_defined = true;
                break;
            }
        }
    }
    // checks 2: feminine endings
    {
        if (ends(token, U"ة") && token.size() > 2) {
            is_noun = true; is_verb = false;
        } else if (ends(token, U"ات") && token.size() > 3) {
            is_noun = true; is_verb = false;
        }
    }

    // normalize_pre: strip diacritics / tatweel / punctuation ('-' is in
    // NLTK's character classes via its chained-range regexes)
    {
        u32s out;
        out.reserve(token.size());
        for (char32_t c : token) {
            if ((c >= 0x064B && c <= 0x0652) || c == 0x0640
                || (c >= 0x060C && c <= 0x061B) || c == 0x061F
                || c == U'-')
                continue;
            out.push_back(c);
        }
        token.swap(out);
    }
    if (token.size() <= 2) return;

    if (is_verb) {
        // Suffix_Verb_Step1
        {
            static const u32s s1[] = {
                U"ه", U"ك", U"ني", U"نا",
                U"ها", U"هم", U"هن",
                U"كم", U"كن",
                U"هما", U"كما",
                U"كمو"};
            for (const u32s& suf : s1) {
                if (!ends(token, suf)) continue;
                if (suf.size() == 1 && token.size() >= 4) {
                    token = py_slice(token, 0, -1);
                    sv1 = true;
                    break;
                }
                if (suf.size() == 2 && token.size() >= 5) {
                    token = py_slice(token, 0, -2);
                    sv1 = true;
                    break;
                }
                if (suf.size() == 3 && token.size() >= 6) {
                    token = py_slice(token, 0, -3);
                    sv1 = true;
                    break;
                }
            }
        }
        auto verb_step2a = [&]() {
            static const u32s s2a[] = {
                U"ت", U"ا", U"ن", U"ي",
                U"نا", U"تا", U"تن",
                U"ان", U"ون", U"ين",
                U"تما"};
            for (const u32s& suf : s2a) {
                if (!(ends(token, suf) && token.size() > 3)) continue;
                if (suf == U"ت" && token.size() >= 4) {
                    token = py_slice(token, 0, -1);
                    sv2a = true;
                    break;
                }
                if (ar_in(suf, {U"ا", U"ن", U"ي"})
                    && token.size() >= 4) {
                    token = py_slice(token, 0, -1);
                    sv2a = true;
                    break;
                }
                if (ar_in(suf, {U"نا", U"تا",
                                U"تن"})
                    && token.size() >= 5) {
                    token = py_slice(token, 0, -2);
                    sv2a = true;
                    break;
                }
                if (ar_in(suf, {U"ان", U"ون",
                                U"ين"})
                    && token.size() > 5) {
                    token = py_slice(token, 0, -2);
                    sv2a = true;
                    break;
                }
                if (suf == U"تما" && token.size() >= 6) {
                    token = py_slice(token, 0, -3);
                    sv2a = true;
                    break;
                }
            }
        };
        if (sv1) {
            verb_step2a();
            if (!sv2a) {
                // Suffix_Verb_Step2c — NLTK iterates ("و","تمو"):
                // the 1-char "و" fires first on every "تمو" ending too
                if (ends(token, U"و") && token.size() >= 4) {
                    token = py_slice(token, 0, -1);
                } else if (ends(token, U"تمو")
                           && token.size() >= 6) {
                    token = py_slice(token, 0, -3);
                }
            }
        } else {
            // Suffix_Verb_Step2b
            if (ends(token, U"وا") && token.size() >= 5) {
                token = py_slice(token, 0, -2);
                sv2b = true;
            } else if (ends(token, U"تم")
                       && token.size() >= 5) {
                token = py_slice(token, 0, -2);
                sv2b = true;
            }
            if (!sv2b) verb_step2a();
        }
    }

    if (is_noun) {
        auto noun_step2a = [&]() {
            static const u32s s2a[] = {U"ا", U"ي", U"و"};
            for (const u32s& suf : s2a) {
                if (ends(token, suf) && token.size() > 4) {
                    token = py_slice(token, 0, -1);
                    sn2a = true;
                    break;
                }
            }
        };
        auto noun_step2b = [&]() {
            // NLTK quirk preserved: __suffix_noun_step2b is the STRING
            // "ات", so its loop iterates the characters 'ا' and 'ت' —
            // a word ending in EITHER loses its last TWO letters
            if ((ends(token, U"ا") || ends(token, U"ت"))
                && token.size() >= 5) {
                token = py_slice(token, 0, -2);
                sn2b = true;
            }
        };
        auto noun_step2c1 = [&]() {
            if (ends(token, U"ت") && token.size() >= 4)
                token = py_slice(token, 0, -1);
        };
        // Suffix_Noun_Step2c2
        if (ends(token, U"ة") && token.size() >= 3) {
            token = py_slice(token, 0, -1);
            sn2c2 = true;
        }
        if (!sn2c2) {
            if (!is_defined) {
                // Suffix_Noun_Step1a
                static const u32s s1a[] = {
                    U"ي", U"ك", U"ه",
                    U"نا", U"كم", U"ها",
                    U"هن", U"هم",
                    U"كما", U"هما"};
                for (const u32s& suf : s1a) {
                    if (!ends(token, suf)) continue;
                    if (suf.size() == 1 && token.size() >= 4) {
                        token = py_slice(token, 0, -1);
                        break;
                    }
                    if (suf.size() == 2 && token.size() >= 5) {
                        token = py_slice(token, 0, -2);
                        break;
                    }
                    if (suf.size() == 3 && token.size() >= 6) {
                        token = py_slice(token, 0, -3);
                        break;
                    }
                }
                noun_step2a();
                if (!sn2a) noun_step2b();
                if (!sn2b && !sn2a) noun_step2c1();
            } else {
                // Suffix_Noun_Step1b
                if (ends(token, U"ن") && token.size() > 5) {
                    token = py_slice(token, 0, -1);
                    sn1b = true;
                }
                if (sn1b) {
                    noun_step2a();
                    if (!sn2a) noun_step2b();
                    if (!sn2b && !sn2a) noun_step2c1();
                } else {
                    if (!is_defined) noun_step2a();
                    noun_step2b();
                }
            }
        }
        // Suffix_Noun_Step3: ya' nisbiya
        if (ends(token, U"ي") && token.size() >= 3)
            token = py_slice(token, 0, -1);
    }

    if (!is_noun && is_verb) {
        // Suffix_All_alef_maqsura
        if (ends(token, U"ى"))
            token = py_slice(token, 0, -1) + U"ي";
    }

    // Prefix_Step1
    {
        static const std::pair<const char32_t*, const char32_t*> p1[] = {
            {U"أأ", U"أ"}, {U"أآ", U"آ"},
            {U"أؤ", U"ؤ"}, {U"أا", U"ا"},
            {U"أإ", U"إ"}};
        // NLTK iterates ("أ","أأ","أآ","أؤ","أا","أإ"): the 1-char "أ"
        // prefix matches first for every candidate but has no action
        // branch, so only the 2-char replacements can fire
        if (token.size() > 3) {
            for (auto& pr : p1) {
                if (ar_starts(token, pr.first)) {
                    token = u32s(pr.second) + token.substr(2);
                    break;
                }
            }
        }
    }
    // Prefix_Step2a
    {
        static const u32s p2[] = {U"فال",
                                  U"وال"};
        for (const u32s& pre : p2) {
            if (ar_starts(token, pre) && token.size() > 5) {
                token = token.substr(pre.size());
                p2a = true;
                break;
            }
        }
    }
    if (!p2a) {
        // Prefix_Step2b
        static const u32s p2[] = {U"ف", U"و"};
        for (const u32s& pre : p2) {
            if (ar_starts(token, pre) && token.size() > 3) {
                u32s first2 = token.substr(0, 2);
                if (!ar_in(first2, {U"وا", U"فا"})) {
                    token = token.substr(pre.size());
                    break;
                }
            }
        }
    }
    // Prefix_Step3a_Noun
    {
        static const u32s p3[] = {U"ال", U"لل",
                                  U"كال",
                                  U"بال"};
        for (const u32s& pre : p3) {
            if (!ar_starts(token, pre)) continue;
            if (pre.size() == 2 && token.size() > 4) {
                token = token.substr(2);
                p3a = true;
                break;
            }
            if (pre.size() == 3 && token.size() > 5) {
                token = token.substr(3);
                break;
            }
        }
    }
    if (!p3a && is_noun) {
        // Prefix_Step3b_Noun
        static const u32s p3[] = {U"ب", U"ك", U"ل",
                                  U"بب", U"كك"};
        for (const u32s& pre : p3) {
            if (!ar_starts(token, pre)) continue;
            if (token.size() > 3) {
                if (pre == U"ب") {
                    token = token.substr(1);
                    p3b = true;
                    break;
                }
                if (pre == U"بب" || pre == U"كك") {
                    token = u32s(1, pre[1]) + token.substr(2);
                    p3b = true;
                    break;
                }
            }
            if ((pre == U"ك" || pre == U"ل")
                && token.size() > 4) {
                token = token.substr(1);
                p3b = true;
                break;
            }
        }
    } else if (!p3b && is_verb) {
        // Prefix_Step3_Verb
        static const u32s p3[] = {U"سي", U"ست",
                                  U"سن", U"سأ"};
        for (const u32s& pre : p3) {
            if (ar_starts(token, pre) && token.size() > 4) {
                token = u32s(1, pre[1]) + token.substr(2);
                break;
            }
        }
        // Prefix_Step4_Verb
        static const u32s p4[] = {U"يست",
                                  U"نست",
                                  U"تست"};
        for (const u32s& pre : p4) {
            if (ar_starts(token, pre) && token.size() > 4) {
                token = u32s(U"است") + token.substr(3);
                is_verb = true;
                is_noun = false;
                break;
            }
        }
    }

    // normalize_post
    {
        static const u32s hamzat[] = {U"أ", U"إ", U"آ",
                                      U"ؤ", U"ئ"};
        for (const u32s& h : hamzat) {
            if (ends(token, h)) {
                token = py_slice(token, 0, -1) + U"ء";
                break;
            }
        }
        if (!token.empty()
            && (token[0] == 0x0622 || token[0] == 0x0623
                || token[0] == 0x0625))
            token[0] = 0x0627;
        for (char32_t& c : token) {
            if (c == 0x0624) c = 0x0648;
            else if (c == 0x0626) c = 0x064a;
        }
        for (char32_t& c : token) {
            if (c == 0x0623 || c == 0x0622 || c == 0x0625) c = 0x0627;
        }
    }
}

// ------------------------------------------------------------- dispatch

typedef void (*stem_fn)(u32s&);

struct Entry {
    int id;
    stem_fn fn;
};

// ids must match seekstorm_tpu/native.py SNOWBALL_IDS
static stem_fn dispatch(int lang) {
    switch (lang) {
        case 2: return stem_danish;
        case 3: return stem_norwegian;
        case 4: return stem_swedish;
        case 5: return stem_german;
        case 6: return stem_dutch;
        case 7: return stem_french;
        case 8: return stem_spanish;
        case 9: return stem_italian;
        case 10: return stem_portuguese;
        case 11: return stem_romanian;
        case 12: return stem_russian;
        case 13: return stem_finnish;
        case 14: return stem_hungarian;
        case 15: return stem_arabic;
        default: return nullptr;
    }
}

}  // namespace sb

// light-tier stemmers (light_stemmers.cpp): lang ids >= 16
namespace ls_api {
bool stem_inplace(int lang, std::u32string& w);
}

extern "C" {

// Stems one word of n codepoints in place; cap is the buffer capacity
// (stemming can GROW a word: German ß -> ss).  Returns the new length,
// -1 if the language id has no native stemmer, -2 if cap is too small.
int st_snowball_stem(int lang, uint32_t* cps, int n, int cap) {
    std::u32string w(reinterpret_cast<const char32_t*>(cps),
                     static_cast<size_t>(n));
    sb::stem_fn fn = sb::dispatch(lang);
    if (fn) fn(w);
    else if (!ls_api::stem_inplace(lang, w)) return -1;
    int m = static_cast<int>(w.size());
    if (m > cap) return -2;
    std::memcpy(cps, w.data(), static_cast<size_t>(m) * 4);
    return m;
}

int st_snowball_has(int lang) {
    if (sb::dispatch(lang) != nullptr) return 1;
    std::u32string probe;  // dispatch probe: empty word, no-op stem
    return ls_api::stem_inplace(lang, probe) ? 1 : 0;
}

}  // extern "C"

// internal hook for seekstorm_native.cpp's tokenizer fast path
namespace sb_api {
bool stem_inplace(int lang, std::u32string& w) {
    sb::stem_fn fn = sb::dispatch(lang);
    if (fn) {
        fn(w);
        return true;
    }
    return ls_api::stem_inplace(lang, w);
}
}  // namespace sb_api
