// Light-tier stemmers, C++ ports of seekstorm_tpu/stemmers.py (the
// Python implementations are the parity oracle; suffix/prefix tables are
// GENERATED from them by gen_light_tables.py so the lists can never
// drift).  These cover the reference StemmerType languages without a
// byte-exact Snowball oracle available offline; porting them natively
// lets EVERY language ride the C++ ingest fast path (index.py gates
// _native on stemmer support).
//
// Control-flow semantics mirrored exactly:
//   strip_longest(w, sufs, min_stem): first suffix IN TABLE ORDER whose
//     removal leaves >= min_stem codepoints is stripped; else unchanged.
//   strip_iter(...): repeat up to `rounds` times while the word changes.

#include <cstdint>
#include <string>

#include "light_stemmer_tables.h"

namespace ls {

using u32s = std::u32string;

static inline size_t cstr_len(const char32_t* s) {
    size_t n = 0;
    while (s[n]) n++;
    return n;
}

// allocation-free suffix/prefix tests against C-string tables (this is
// the per-token ingest hot loop; constructing a u32string per table
// entry would dominate stemming cost)
static inline bool ends_c(const u32s& w, const char32_t* suf, size_t m) {
    if (w.size() < m) return false;
    const char32_t* p = w.data() + (w.size() - m);
    for (size_t i = 0; i < m; i++)
        if (p[i] != suf[i]) return false;
    return true;
}

static inline bool starts_c(const u32s& w, const char32_t* pre, size_t m) {
    if (w.size() < m) return false;
    for (size_t i = 0; i < m; i++)
        if (w[i] != pre[i]) return false;
    return true;
}

static inline bool ends(const u32s& w, const u32s& suf) {
    return ends_c(w, suf.data(), suf.size());
}

static inline bool starts(const u32s& w, const u32s& pre) {
    return starts_c(w, pre.data(), pre.size());
}

static bool strip_longest(u32s& w, const char32_t* const* sufs, int n,
                          size_t min_stem) {
    for (int i = 0; i < n; i++) {
        size_t m = cstr_len(sufs[i]);
        if (w.size() >= m + min_stem && ends_c(w, sufs[i], m)) {
            w.resize(w.size() - m);
            return true;
        }
    }
    return false;
}

static void strip_iter(u32s& w, const char32_t* const* sufs, int n,
                       size_t min_stem, int rounds) {
    for (int r = 0; r < rounds; r++) {
        if (!strip_longest(w, sufs, n, min_stem)) break;
    }
}

static inline bool in_str(char32_t c, const char32_t* set) {
    for (const char32_t* p = set; *p; ++p)
        if (*p == c) return true;
    return false;
}

// ---------------------------------------------------------------- simple

static void stem_esperanto(u32s& w) {
    strip_longest(w, LS_EO_SUF, LS_EO_SUF_N, 2);
}

static void stem_czech(u32s& w) {
    if (strip_longest(w, LS_CS_CASE, LS_CS_CASE_N, 3)) {
        // palatalization pairs are flattened (from, to) in LS_CS_PALAT
        for (int i = 0; i < LS_CS_PALAT_N; i += 2) {
            u32s a(LS_CS_PALAT[i]);
            if (ends(w, a)) {
                w.resize(w.size() - a.size());
                w += LS_CS_PALAT[i + 1];
                break;
            }
        }
    }
}

static void stem_polish(u32s& w) {
    strip_longest(w, LS_PL_ADJ, LS_PL_ADJ_N, 3);
    strip_longest(w, LS_PL_VERB, LS_PL_VERB_N, 3);
    strip_longest(w, LS_PL_NOUN, LS_PL_NOUN_N, 3);
}

static void stem_ukrainian(u32s& w) {
    size_t rv = w.size();
    for (size_t i = 0; i < w.size(); i++) {
        if (in_str(w[i], LS_UK_VOWELS[0])) { rv = i + 1; break; }
    }
    size_t ms = rv > 2 ? rv : 2;
    if (strip_longest(w, LS_UK_PGERUND, LS_UK_PGERUND_N, ms)) return;
    if (strip_longest(w, LS_UK_ADJ, LS_UK_ADJ_N, ms)) return;
    if (strip_longest(w, LS_UK_VERB, LS_UK_VERB_N, ms)) return;
    strip_longest(w, LS_UK_NOUN, LS_UK_NOUN_N, ms);
}

static void stem_serbian(u32s& w) {
    u32s out;
    out.reserve(w.size() + 2);
    for (char32_t c : w) {
        if (c == U'đ') { out += U"dj"; }  // đ
        else out.push_back(c);
    }
    w.swap(out);
    strip_longest(w, LS_SR_SUF, LS_SR_SUF_N, 3);
}

static void stem_greek(u32s& w) {
    const char32_t* from = LS_EL_ACCENT_FROM[0];
    const char32_t* to = LS_EL_ACCENT_TO[0];
    for (char32_t& c : w) {
        for (int i = 0; from[i]; i++)
            if (c == from[i]) { c = to[i]; break; }
        if (c == U'ς') c = U'σ';  // final sigma
    }
    strip_longest(w, LS_EL_SUF, LS_EL_SUF_N, 3);
}

static void stem_catalan(u32s& w) {
    strip_iter(w, LS_CA_SUF, LS_CA_SUF_N, 3, 2);
}

static void stem_irish(u32s& w) {
    for (int i = 0; i < LS_GA_MUT_N; i += 2) {
        u32s pre(LS_GA_MUT[i]);
        if (starts(w, pre)) {
            w = u32s(LS_GA_MUT[i + 1]) + w.substr(pre.size());
            break;
        }
    }
    if (w.size() > 3 && w[0] == U'h'
        && in_str(w[1], U"aeiouáéíóú"))
        w = w.substr(1);
    strip_longest(w, LS_GA_SUF, LS_GA_SUF_N, 3);
}

static void stem_basque(u32s& w) {
    strip_iter(w, LS_EU_SUF, LS_EU_SUF_N, 3, 2);
}

static void stem_armenian(u32s& w) {
    strip_longest(w, LS_HY_SUF, LS_HY_SUF_N, 3);
}

static void stem_lithuanian(u32s& w) {
    strip_longest(w, LS_LT_SUF, LS_LT_SUF_N, 3);
}

static void stem_estonian(u32s& w) {
    strip_longest(w, LS_ET_SUF, LS_ET_SUF_N, 3);
}

static void stem_hindi(u32s& w) {
    strip_longest(w, LS_HI_SUF, LS_HI_SUF_N, 1);
}

static void stem_nepali(u32s& w) {
    strip_longest(w, LS_NE_SUF, LS_NE_SUF_N, 2);
}

static void stem_tamil(u32s& w) {
    strip_longest(w, LS_TA_SUF, LS_TA_SUF_N, 2);
    // plural nasal assimilation undo: ...ங் -> ...ம்
    u32s ng = U"ங்", m = U"ம்";
    if (ends(w, ng)) {
        w.resize(w.size() - ng.size());
        w += m;
    }
}

static void stem_persian(u32s& w) {
    u32s out;
    out.reserve(w.size());
    for (char32_t c : w)
        if (c != 0x200C) out.push_back(c);  // ZWNJ joins clitics
    w.swap(out);
    strip_iter(w, LS_FA_SUF, LS_FA_SUF_N, 2, 2);
}

static void stem_indonesian(u32s& w) {
    strip_longest(w, LS_ID_PART, LS_ID_PART_N, 3);
    strip_longest(w, LS_ID_POSS, LS_ID_POSS_N, 3);
    // derivational prefixes (groups in priority order; one removal)
    static const char32_t* const G0[] = {U"meng", U"meny", U"men",
                                         U"mem", U"me"};
    static const char32_t* const G1[] = {U"peng", U"peny", U"pen",
                                         U"pem", U"pe"};
    static const char32_t* const G2[] = {U"ber", U"be"};
    static const char32_t* const G3[] = {U"ter", U"te"};
    static const char32_t* const G4[] = {U"di"};
    static const char32_t* const G5[] = {U"ke"};
    static const char32_t* const G6[] = {U"se"};
    struct Grp { const char32_t* const* p; int n; };
    static const Grp groups[] = {{G0, 5}, {G1, 5}, {G2, 2}, {G3, 2},
                                 {G4, 1}, {G5, 1}, {G6, 1}};
    u32s removed;
    for (const Grp& g : groups) {
        bool hit = false;
        for (int i = 0; i < g.n; i++) {
            u32s pre(g.p[i]);
            if (starts(w, pre) && w.size() - pre.size() >= 3) {
                u32s cand = w.substr(pre.size());
                if (pre == U"meny" || pre == U"peny") cand = U"s" + cand;
                w = cand;
                removed = pre;
                hit = true;
                break;
            }
        }
        if (hit) break;
    }
    // ke-...-an / peng-...-an confixes: suffix is -an, never -kan
    if ((removed == U"ke" || removed == U"peng" || removed == U"peny"
         || removed == U"pen" || removed == U"pem" || removed == U"pe")
        && ends(w, U"an") && w.size() - 2 >= 3) {
        w.resize(w.size() - 2);
        return;
    }
    strip_longest(w, LS_ID_SUF, LS_ID_SUF_N, 3);
}

static bool tr_harmony_ok(const u32s& w, size_t stem_len,
                          const char32_t* suf) {
    const char32_t* back = LS_TR_BACK[0];
    const char32_t* front = LS_TR_FRONT[0];
    char32_t sv = 0, fv = 0;
    for (size_t i = stem_len; i-- > 0;) {
        if (in_str(w[i], back) || in_str(w[i], front)) {
            sv = w[i];
            break;
        }
    }
    for (const char32_t* p = suf; *p; ++p) {
        if (in_str(*p, back) || in_str(*p, front)) { fv = *p; break; }
    }
    if (!sv || !fv) return true;
    return in_str(sv, back) == in_str(fv, back);
}

static void stem_turkish(u32s& w) {
    for (int r = 0; r < 3; r++) {
        bool changed = false;
        for (int i = 0; i < LS_TR_SUF_N; i++) {
            size_t m = cstr_len(LS_TR_SUF[i]);
            if (w.size() >= m + 2 && ends_c(w, LS_TR_SUF[i], m)
                && tr_harmony_ok(w, w.size() - m, LS_TR_SUF[i])) {
                w.resize(w.size() - m);
                changed = true;
                break;
            }
        }
        if (!changed) break;
    }
}

static void stem_yiddish(u32s& w) {
    if (starts(w, U"גע") && w.size() > 5)  // גע participle
        w = w.substr(2);
    strip_longest(w, LS_YI_SUF, LS_YI_SUF_N, 3);
}

static void stem_sesotho(u32s& w) {
    for (int i = 0; i < LS_ST_PRE_N; i++) {
        u32s pre(LS_ST_PRE[i]);
        if (starts(w, pre) && w.size() - pre.size() >= 3) {
            w = w.substr(pre.size());
            break;
        }
    }
    strip_longest(w, LS_ST_SUF, LS_ST_SUF_N, 3);
}

static void stem_lovins(u32s& w) {
    for (int i = 0; i < LS_LOVINS_END_N; i++) {
        size_t m = cstr_len(LS_LOVINS_END[i]);
        if (w.size() >= m + 2 && ends_c(w, LS_LOVINS_END[i], m)) {
            w.resize(w.size() - m);
            break;
        }
    }
    if (w.size() >= 2 && w[w.size() - 1] == w[w.size() - 2]
        && in_str(w.back(), U"bdglmnprst"))
        w.resize(w.size() - 1);
    for (int i = 0; i < LS_LOVINS_RECODE_N; i += 2) {
        size_t m = cstr_len(LS_LOVINS_RECODE[i]);
        if (ends_c(w, LS_LOVINS_RECODE[i], m)) {
            w.resize(w.size() - m);
            w += LS_LOVINS_RECODE[i + 1];
            break;
        }
    }
}

typedef void (*stem_fn)(u32s&);

// ids must match seekstorm_tpu/native.py _STEMMER_IDS (16..36)
static stem_fn dispatch(int lang) {
    switch (lang) {
        case 16: return stem_armenian;
        case 17: return stem_basque;
        case 18: return stem_catalan;
        case 19: return stem_czech;
        case 20: return stem_esperanto;
        case 21: return stem_estonian;
        case 22: return stem_greek;
        case 23: return stem_hindi;
        case 24: return stem_indonesian;
        case 25: return stem_irish;
        case 26: return stem_lithuanian;
        case 27: return stem_lovins;
        case 28: return stem_nepali;
        case 29: return stem_persian;
        case 30: return stem_polish;
        case 31: return stem_serbian;
        case 32: return stem_sesotho;
        case 33: return stem_tamil;
        case 34: return stem_turkish;
        case 35: return stem_ukrainian;
        case 36: return stem_yiddish;
        default: return nullptr;
    }
}

}  // namespace ls

// hook merged into snowball.cpp's sb_api (ids < 16 route to Snowball)
namespace ls_api {
bool stem_inplace(int lang, std::u32string& w) {
    ls::stem_fn fn = ls::dispatch(lang);
    if (!fn) return false;
    fn(w);
    return true;
}
}  // namespace ls_api
