// ThreadSanitizer stress driver for the native host library.
//
// Mirrors the real process's concurrency shape (SURVEY §5 sanitizers row):
//   * per shard, ONE ingest writer (the Python side serializes writers
//     under shard.ingest_lock) racing MANY realtime readers
//     (term_postings / term_doc_positions / stats / doc_count run from
//     searcher threads with the GIL released);
//   * several shards ingesting in parallel (independent accumulators);
//   * concurrent st_rescore / st_exact_eval over shared read-only CSR
//     arrays (the WAND host rescore runs from every searcher thread);
//   * concurrent tokenization sharing one immutable StCfg.
//
// Build + run: make -C native tsan && ./native/stress_tsan
// Exit code 0 + no TSAN report = clean.  Run once per round
// (tests/test_native.py::test_tsan_stress when g++ is available).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
struct StCfg;
struct StAccum;
StCfg* st_cfg_new(int, int, int, const uint8_t*, int64_t, const uint8_t*,
                  int64_t, uint64_t, uint64_t);
void st_cfg_free(StCfg*);
StAccum* st_accum_new(int);
void st_accum_free(StAccum*);
int st_accum_doc_count(StAccum*);
int st_accum_add_doc(StAccum*, StCfg*, const uint8_t*, const int64_t*,
                     int32_t*);
void st_accum_stats(StAccum*, int64_t*, int64_t*, int64_t*);
int64_t st_accum_term_postings(StAccum*, uint64_t, uint16_t*, uint16_t*,
                               int64_t);
int64_t st_accum_term_doc_positions(StAccum*, uint64_t, int32_t, uint16_t*,
                                    uint16_t*, int64_t);
int64_t st_tokenize_text(StCfg*, const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t st_exact_eval(int, const uint32_t*, const float*, const int64_t*,
                      const float*, const uint8_t*, const int32_t*,
                      const int64_t*, int, int64_t, const int64_t*,
                      const int64_t*, const uint32_t*, const float*, int64_t,
                      float*, int64_t*, int64_t*);
void st_rescore(int, const uint64_t*, const uint64_t*, const int64_t*,
                const float*, int, const int32_t*, const uint8_t*,
                const int64_t*, const int64_t*, const int64_t*,
                const int32_t*, const int64_t*, int, int,
                const int64_t*, const int64_t*, const uint32_t*,
                const float*, int64_t, float*, int64_t*, int64_t*,
                int64_t*);
}

namespace {

// FNV-1a, matching the library's internal term hash (seekstorm_native.cpp)
uint64_t term_hash(const char* s, size_t n) {
    uint64_t h = 0xCBF29CE484222325ULL;
    for (size_t i = 0; i < n; i++) {
        h ^= (unsigned char)s[i];
        h *= 0x100000001B3ULL;
    }
    return h;
}

constexpr int N_SHARDS = 2;
constexpr int N_READERS = 2;
constexpr int N_DOCS = 120;

std::atomic<bool> stop_readers{false};
std::atomic<long> reader_hits{0};

void ingest_worker(StAccum* a, StCfg* cfg, int seed) {
    char buf[256];
    for (int d = 0; d < N_DOCS; d++) {
        int n = snprintf(buf, sizeof buf,
                         "w%03d common w%03d filler body w%03d",
                         (seed + d) % 50, (seed + 3 * d) % 50,
                         (seed + 7 * d) % 50);
        int64_t offs[2] = {0, n};
        int32_t lens[1];
        st_accum_add_doc(a, cfg, (const uint8_t*)buf, offs, lens);
    }
}

void reader_worker(StAccum* a, int tid) {
    const char* probe = "common";
    uint64_t h = term_hash(probe, 6);
    std::vector<uint16_t> ids(65536), tfs(65536);
    uint16_t otf[1];
    std::vector<uint16_t> pos(4096);
    while (!stop_readers.load(std::memory_order_acquire)) {
        int64_t np = st_accum_term_postings(a, h, ids.data(), tfs.data(),
                                            (int64_t)ids.size());
        if (np > 0) {
            reader_hits.fetch_add(1, std::memory_order_relaxed);
            int32_t docid = ids[(size_t)(np - 1)];
            st_accum_term_doc_positions(a, h, docid, otf, pos.data(),
                                        (int64_t)pos.size());
        }
        int64_t t, p, x;
        st_accum_stats(a, &t, &p, &x);
        st_accum_doc_count(a);
        (void)tid;
        // 1-vCPU CI hosts: don't starve the writers
        std::this_thread::yield();
    }
}

void tokenize_worker(StCfg* cfg) {
    const char* text = "The Quick brown FOX jumps over 42 lazy dogs";
    std::vector<uint8_t> out(1024);
    for (int i = 0; i < 300; i++)
        st_tokenize_text(cfg, (const uint8_t*)text,
                         (int64_t)strlen(text), out.data(),
                         (int64_t)out.size());
}

// shared read-only rescore fixture: 2 slots over 4 blocks, 1 shard
struct RescoreFixture {
    std::vector<uint32_t> keys0, keys1;
    std::vector<float> imps0, imps1;
    std::vector<int32_t> blk_shard;
    std::vector<int64_t> base, del_flat, del_off;
    std::vector<float> w;
    RescoreFixture() {
        for (uint32_t b = 0; b < 4; b++)
            for (uint32_t d = 0; d < 512; d += 2) {
                keys0.push_back((b << 16) | d);
                imps0.push_back(1.0f + (float)(d % 7));
                if (d % 3 == 0) {
                    keys1.push_back((b << 16) | d);
                    imps1.push_back(2.0f);
                }
            }
        blk_shard.assign(4, 0);
        base.assign(1, 0);
        del_flat.assign(1, 0);
        del_off.assign(2, 0);
        w = {0.5f, 1.5f};
    }
};

void rescore_worker(const RescoreFixture& fx) {
    uint64_t kp[2] = {(uint64_t)fx.keys0.data(), (uint64_t)fx.keys1.data()};
    uint64_t ip[2] = {(uint64_t)fx.imps0.data(), (uint64_t)fx.imps1.data()};
    int64_t slen[2] = {(int64_t)fx.keys0.size(), (int64_t)fx.keys1.size()};
    int32_t q_slots[2] = {0, 1};
    uint8_t q_flags[2] = {4, 4};
    int64_t qs_off[2] = {0, 2};
    std::vector<int64_t> buckets;
    for (int64_t b = 0; b < 32; b++) buckets.push_back(b);
    int64_t qoff[2] = {0, (int64_t)buckets.size()};
    std::vector<float> out_s(64);
    std::vector<int64_t> out_g(64);
    int64_t out_m[1], out_f[1];
    for (int i = 0; i < 60; i++) {
        st_rescore(2, kp, ip, slen, fx.w.data(), 1, q_slots, q_flags,
                   qs_off, buckets.data(), qoff, fx.blk_shard.data(),
                   fx.base.data(), 1, 2048, fx.del_flat.data(),
                   fx.del_off.data(), nullptr, nullptr, 64,
                   out_s.data(), out_g.data(), out_m, out_f);
    }
    // exact-eval over the same fixture
    std::vector<uint32_t> keys(fx.keys0);
    keys.insert(keys.end(), fx.keys1.begin(), fx.keys1.end());
    std::vector<float> imps(fx.imps0);
    imps.insert(imps.end(), fx.imps1.begin(), fx.imps1.end());
    int64_t offs[3] = {0, (int64_t)fx.keys0.size(), (int64_t)keys.size()};
    uint8_t flags[2] = {4, 4};
    std::vector<float> wss = {0.5f, 1.5f};
    int64_t cnt[1];
    for (int i = 0; i < 20; i++)
        st_exact_eval(2, keys.data(), imps.data(), offs, wss.data(), flags,
                      fx.blk_shard.data(), fx.base.data(), 1,
                      4 * 65536, fx.del_flat.data(), fx.del_off.data(),
                      nullptr, nullptr, 64, out_s.data(), out_g.data(),
                      cnt);
}

}  // namespace

int main() {
    StCfg* cfg = st_cfg_new(/*UnicodeAlphanumericFolded*/ 2, /*stemmer*/ 0,
                            0, nullptr, 0, nullptr, 0, 0, 0);
    std::vector<StAccum*> accums;
    for (int s = 0; s < N_SHARDS; s++) accums.push_back(st_accum_new(1));

    std::vector<std::thread> threads;
    for (int s = 0; s < N_SHARDS; s++) {
        threads.emplace_back(ingest_worker, accums[s], cfg, 13 * s);
        for (int r = 0; r < N_READERS; r++)
            threads.emplace_back(reader_worker, accums[s], r);
    }
    threads.emplace_back(tokenize_worker, cfg);
    threads.emplace_back(tokenize_worker, cfg);
    RescoreFixture fx;
    threads.emplace_back(rescore_worker, std::cref(fx));
    threads.emplace_back(rescore_worker, std::cref(fx));

    // writers finish first (fixed doc count), then release the readers
    for (int s = 0; s < N_SHARDS; s++) threads[(size_t)s * (1 + N_READERS)]
        .join();
    stop_readers.store(true, std::memory_order_release);
    for (auto& t : threads)
        if (t.joinable()) t.join();

    long total_docs = 0;
    for (auto* a : accums) total_docs += st_accum_doc_count(a);
    printf("stress_tsan: %ld docs ingested, %ld reader hits\n", total_docs,
           reader_hits.load());
    for (auto* a : accums) st_accum_free(a);
    st_cfg_free(cfg);
    return total_docs == (long)N_SHARDS * N_DOCS ? 0 : 1;
}
