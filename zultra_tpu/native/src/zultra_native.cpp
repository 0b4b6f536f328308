// zultra_tpu native engine: full per-window DEFLATE pipeline.
//
// Fresh C++ implementation of the window compressor with the same decision
// semantics as the byte-parity-validated Python spec engine
// (zultra_tpu/{matchfinder,parse,blocks,stream}.py; ultimate origin:
// the reference zultra's src/matchfinder.c, blockdeflate.c, libzultra.c).
//
// The Python layer orchestrates streaming/framing/sharding and calls
// zn_compress_window per window; everything inside a window (suffix array,
// LCP intervals, match walk, cost DP, block splitting, Huffman tables,
// token emission, stored fallback) runs here at native speed.
//
// Exported C ABI (ctypes):
//   zn_suffix_array        — stage export for tests / cross-validation
//   zn_build_matchtable    — stage export (SA+PLCP+intervals+walk)
//   zn_optimize_matches    — stage export (cost DP)
//   zn_compress_window     — the production path
//   zn_version

#include <atomic>
#include <chrono>
#include <mutex>
#include <climits>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "entropy.hpp"
#include "sais.hpp"

// Set ZN_PROFILE=1 to print a per-window stage timing breakdown to stderr.
namespace zn {
struct StageTimer {
    using clock = std::chrono::steady_clock;
    clock::time_point last = clock::now();
    bool enabled = std::getenv("ZN_PROFILE") != nullptr;
    void mark(const char* stage) {
        if (!enabled) return;
        auto now = clock::now();
        double ms = std::chrono::duration<double, std::milli>(now - last).count();
        std::fprintf(stderr, "[zn] %-14s %7.1f ms\n", stage, ms);
        last = now;
    }
};
// ZN_PROFILE=2 adds a plan_block sub-stage breakdown (summed across the
// planner threads, so totals can exceed wall clock).
struct SubStages {
    std::atomic<int64_t> dp_ns{0}, recount_ns{0}, tables_ns{0}, greedy_ns{0};
    void dump_and_reset() {
        const char* env = std::getenv("ZN_PROFILE");
        if (env && env[0] == '2') {
            std::fprintf(stderr,
                         "[zn]   plan sub: dp %.1f ms, recount %.1f ms, "
                         "tables %.1f ms, greedy %.1f ms (thread-summed)\n",
                         dp_ns.load() / 1e6, recount_ns.load() / 1e6,
                         tables_ns.load() / 1e6, greedy_ns.load() / 1e6);
        }
        dp_ns = recount_ns = tables_ns = greedy_ns = 0;
    }
};
inline SubStages& substages() {
    static SubStages s;
    return s;
}
struct SubTimer {
    std::atomic<int64_t>& acc;
    std::chrono::steady_clock::time_point t0;
    explicit SubTimer(std::atomic<int64_t>& a)
        : acc(a), t0(std::chrono::steady_clock::now()) {}
    ~SubTimer() {
        acc += std::chrono::duration_cast<std::chrono::nanoseconds>(
                   std::chrono::steady_clock::now() - t0).count();
    }
};
} // namespace zn

namespace zn {

// -- format constants -------------------------------------------------------

constexpr int32_t kMinMatch = 3;
constexpr int32_t kMaxMatch = 258;
constexpr int32_t kMaxOffset = 32768;
constexpr int32_t kLcpShift = 22;
constexpr uint32_t kLcpMask = 0x1FFu << kLcpShift;
constexpr uint32_t kPosMask = (1u << kLcpShift) - 1;
constexpr uint32_t kVisited = 0x80000000u;
constexpr uint32_t kExclVisited = 0x7FFFFFFFu;
constexpr int32_t kMatchesPerPos = 8;
constexpr int32_t kLeaveAlone = 40;
constexpr int32_t kMaxSplits = 64;
constexpr int32_t kNumLiteralSyms = 288;
constexpr int32_t kNumOffsetSyms = 32;
constexpr int32_t kEodSym = 256;
constexpr int32_t kMatchLenSymStart = 257;
constexpr int32_t kNumMatchLenSyms = 29;

// -- symbol mapping tables (generated at startup from the RFC code specs) ----

struct SymbolTables {
    uint16_t len_sym[256];
    uint8_t len_extra[256];
    uint16_t len_base[256];
    uint16_t off_sym[512];
    uint8_t off_extra[512];
    uint16_t off_base[512];
    uint8_t rev_len_bits[kNumMatchLenSyms];
    uint8_t rev_off_bits[kNumOffsetSyms];

    SymbolTables() {
        struct Code { int extra; int first; };
        static const Code length_codes[29] = {
            {0,3},{0,4},{0,5},{0,6},{0,7},{0,8},{0,9},{0,10},
            {1,11},{1,13},{1,15},{1,17},{2,19},{2,23},{2,27},{2,31},
            {3,35},{3,43},{3,51},{3,59},{4,67},{4,83},{4,99},{4,115},
            {5,131},{5,163},{5,195},{5,227},{0,258}};
        static const Code offset_codes[30] = {
            {0,1},{0,2},{0,3},{0,4},{1,5},{1,7},{2,9},{2,13},
            {3,17},{3,25},{4,33},{4,49},{5,65},{5,97},{6,129},{6,193},
            {7,257},{7,385},{8,513},{8,769},{9,1025},{9,1537},
            {10,2049},{10,3073},{11,4097},{11,6145},{12,8193},{12,12289},
            {13,16385},{13,24577}};

        for (int c = 0; c < 29; ++c) {
            int span = 1 << length_codes[c].extra;
            int lo = length_codes[c].first - kMinMatch;
            for (int e = lo; e < lo + span && e < 256; ++e) {
                len_sym[e] = (uint16_t)(kMatchLenSymStart + c);
                len_extra[e] = (uint8_t)length_codes[c].extra;
                len_base[e] = (uint16_t)lo;
            }
            rev_len_bits[c] = (uint8_t)length_codes[c].extra;
        }
        len_sym[255] = 285; len_extra[255] = 0; len_base[255] = 255;

        std::memset(off_sym, 0, sizeof(off_sym));
        std::memset(off_extra, 0, sizeof(off_extra));
        std::memset(off_base, 0, sizeof(off_base));
        for (int c = 0; c < 30; ++c) {
            int span = 1 << offset_codes[c].extra;
            for (int off = offset_codes[c].first; off < offset_codes[c].first + span; ++off) {
                int idx = off <= 256 ? off - 1 : 256 + ((off - 1 - 256) >> 7);
                off_sym[idx] = (uint16_t)c;
                off_extra[idx] = (uint8_t)offset_codes[c].extra;
                off_base[idx] = (uint16_t)offset_codes[c].first;
            }
            rev_off_bits[c] = (uint8_t)offset_codes[c].extra;
        }
        rev_off_bits[30] = rev_off_bits[31] = 0;
    }

    static int32_t off_index(int32_t offset) {
        int32_t idx = offset - 1;
        return idx < 256 ? idx : 256 + ((idx - 256) >> 7);
    }
};

static const SymbolTables T;

// -- match finder -----------------------------------------------------------

struct MatchFinder {
    std::vector<uint32_t> intervals;
    std::vector<uint32_t> pos_data;
    // Scratch kept across windows (the job pool reuses MatchFinder
    // instances, so these retain capacity and avoid refaulting pages).
    std::vector<int32_t> sa_scratch;
    std::vector<int32_t> plcp_scratch;
    std::vector<int32_t> phi_scratch;
    std::vector<uint16_t> sais_s_scratch;
    std::vector<int32_t> sais_sa_scratch;
    int32_t n;

    void build(const uint8_t* data, int32_t size) {
        n = size;
        intervals.resize(n);
        pos_data.resize(n + 1);

        sa_scratch.resize(n);
        std::vector<int32_t>& sa = sa_scratch;
        StageTimer t2;
        suffix_array(data, n, sa.data(), &sais_s_scratch, &sais_sa_scratch);
        t2.mark("  sais");

        // Permuted LCP via the Φ method (amortized O(n)).
        plcp_scratch.resize(n);
        std::vector<int32_t>& plcp = plcp_scratch;
        {
            phi_scratch.resize(n);
            std::vector<int32_t>& phi = phi_scratch;
            phi[sa[0]] = -1;
            for (int32_t r = 1; r < n; ++r) phi[sa[r]] = sa[r - 1];
            int32_t l = 0;
            for (int32_t i = 0; i < n; ++i) {
                int32_t j = phi[i];
                if (j < 0) { plcp[i] = 0; l = 0; continue; }
                const int32_t cap = n - (i > j ? i : j);
                // Word-at-a-time extension: compare 8 bytes per step and
                // locate the first differing byte with a ctz, byte-stepping
                // only the <8-byte tail at the buffer end. The ctz>>3 step
                // assumes little-endian byte order (first differing byte is
                // in the lowest differing bits); guarded below.
                static_assert(__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__,
                              "word-at-a-time LCP extension requires a "
                              "little-endian host (use clz on big-endian)");
                while (l + 8 <= cap) {
                    uint64_t a, b;
                    std::memcpy(&a, data + i + l, 8);
                    std::memcpy(&b, data + j + l, 8);
                    const uint64_t x = a ^ b;
                    if (x) { l += (int32_t)(__builtin_ctzll(x) >> 3); break; }
                    l += 8;
                }
                if (l + 8 > cap)
                    while (l < cap && data[i + l] == data[j + l]) ++l;
                plcp[i] = l;
                if (l > 0) --l;
            }
        }

        t2.mark("  plcp");
        // Pack SA+LCP (lcp < MIN → 0, clamp to MAX).
        intervals[0] = (uint32_t)sa[0];
        for (int32_t r = 1; r < n; ++r) {
            int32_t lcp = plcp[sa[r]];
            if (lcp < kMinMatch) lcp = 0;
            if (lcp > kMaxMatch) lcp = kMaxMatch;
            intervals[r] = (uint32_t)sa[r] | ((uint32_t)lcp << kLcpShift);
        }

        t2.mark("  pack");
        // Interval tree from the SA+LCP sweep.
        std::vector<uint32_t> stack(513);
        uint32_t* top = stack.data();
        *top = 0;
        uint32_t next_idx = 1;
        uint32_t prev_pos = intervals[0] & kPosMask;
        intervals[0] = 0;

        for (int32_t r = 1; r < n; ++r) {
            const uint32_t next_pos = intervals[r] & kPosMask;
            const uint32_t next_lcp = intervals[r] & kLcpMask;
            const uint32_t top_lcp = *top & kLcpMask;

            if (next_lcp == top_lcp) {
                pos_data[prev_pos] = *top;
            } else if (next_lcp > top_lcp) {
                *++top = next_lcp | next_idx++;
                pos_data[prev_pos] = *top;
            } else {
                pos_data[prev_pos] = *top;
                for (;;) {
                    const uint32_t closed = *top-- & kPosMask;
                    const uint32_t super_lcp = *top & kLcpMask;
                    if (next_lcp == super_lcp) {
                        intervals[closed] = *top;
                        break;
                    } else if (next_lcp > super_lcp) {
                        *++top = next_lcp | next_idx++;
                        intervals[closed] = *top;
                        break;
                    } else {
                        intervals[closed] = *top;
                    }
                }
            }
            prev_pos = next_pos;
        }
        pos_data[prev_pos] = *top;
        for (; top > stack.data(); --top)
            intervals[*top & kPosMask] = *(top - 1);
        t2.mark("  tree");
    }

    // Lazy interval-ascent walk; returns number of matches written to out
    // as (length, offset) pairs, longest first.
    int32_t matches_at(int32_t pos, uint16_t* out, int32_t max_matches) {
        uint32_t ref = pos_data[pos];
        pos_data[pos] = 0;

        uint32_t super_ref;
        while ((super_ref = intervals[ref & kPosMask]) & kLcpMask) {
            intervals[ref & kPosMask] = (uint32_t)pos | kVisited;
            ref = super_ref;
        }

        if (super_ref == 0) {
            if (ref != 0) intervals[ref & kPosMask] = (uint32_t)pos | kVisited;
            return 0;
        }

        uint32_t match_pos = super_ref & kExclVisited;
        int32_t count = 0;
        for (;;) {
            while ((super_ref = pos_data[match_pos]) > ref)
                match_pos = intervals[super_ref & kPosMask] & kExclVisited;
            intervals[ref & kPosMask] = (uint32_t)pos | kVisited;
            pos_data[match_pos] = ref;

            if (count < max_matches) {
                int32_t offset = pos - (int32_t)match_pos;
                if (offset <= kMaxOffset) {
                    out[count * 2] = (uint16_t)(ref >> kLcpShift);
                    out[count * 2 + 1] = (uint16_t)offset;
                    ++count;
                }
            }
            if (super_ref == 0) break;
            ref = super_ref;
            match_pos = intervals[ref & kPosMask] & kExclVisited;
        }
        return count;
    }
};

// Build the full match table for [start, end): 8 (length, offset) uint16
// pairs per position, lengths clamped to the window end, zero-padded.
static void build_match_table(MatchFinder& mf, int32_t start, int32_t end, uint16_t* table) {
    uint16_t scratch[2];
    for (int32_t i = 0; i < start; ++i) mf.matches_at(i, scratch, 0);

    for (int32_t i = start; i < end; ++i) {
        // The first interval deref of the NEXT position's ascent is a
        // data-dependent miss; issue it one iteration early.
        if (i + 1 < end)
            __builtin_prefetch(&mf.intervals[mf.pos_data[i + 1] & kPosMask]);
        uint16_t* row = table + (int64_t)i * kMatchesPerPos * 2;
        int32_t found = mf.matches_at(i, row, kMatchesPerPos);
        int32_t max_len = end - i;
        for (int32_t m = 0; m < kMatchesPerPos; ++m) {
            if (m >= found) {
                row[m * 2] = 0;
                row[m * 2 + 1] = 0;
            } else if (row[m * 2] > max_len) {
                row[m * 2] = (uint16_t)max_len;
            }
        }
    }
}

// -- greedy token chain -------------------------------------------------------
//
// The greedy parse (always take the longest match, else a literal) is fully
// determined by row 0 of the match table, so every consumer that walks it —
// the block splitter's drift statistics, its per-segment entropy evaluations,
// and the planner's first histogram — can share one precomputed, packed
// per-position token: skip (9 bits) | lit-or-len symbol (9 bits) |
// offset symbol or 31=none (5 bits). Walking 4-byte tokens instead of
// 32-byte match-table rows cuts the splitter's cache traffic ~8x.
// (Replaces repeated table walks; reference counterpart:
// /root/reference/src/blockdeflate.c block splitting re-walks matches.)

constexpr uint32_t kTokSkipMask = 0x1FF;
constexpr uint32_t kTokNoOffSym = 31;

static void build_greedy_chain(const uint8_t* window, const uint16_t* table,
                               int32_t start, int32_t end, uint32_t* tok) {
    for (int32_t i = start; i < end; ++i) {
        const uint16_t* row = table + (int64_t)i * kMatchesPerPos * 2;
        const int32_t length = row[0];
        if (length >= kMinMatch) {
            int32_t e = length - kMinMatch;
            if (e > 255) e = 255;
            const uint32_t s1 = T.off_sym[SymbolTables::off_index(row[1])];
            tok[i] = (uint32_t)length | ((uint32_t)T.len_sym[e] << 9) | (s1 << 18);
        } else {
            tok[i] = 1u | ((uint32_t)window[i] << 9) | (kTokNoOffSym << 18);
        }
    }
}

// -- cost DP ----------------------------------------------------------------

static void optimize_matches(const HuffEncoder& lit, const HuffEncoder& off,
                             const uint8_t* window, const uint16_t* table,
                             int32_t start, int32_t end,
                             uint16_t* best, int32_t* cost) {
    if (end <= start) return;

    // Truncated-length candidates are evaluated as a packed min-reduce:
    // value = (bit_cost << 6) | (63 - k). Minimizing picks the smallest
    // cost and, on ties, the LARGEST length — exactly the semantics of the
    // reference's downward scan with strict improvement. Costs stay below
    // 2^25 (≤15 bits/byte over ≤2 MB), so the shift cannot overflow int32.
    int32_t cached6[kLeaveAlone];
    for (int32_t i = 0; i < kLeaveAlone; ++i) {
        const int32_t varlen = lit.code_length[T.len_sym[i]] + T.len_extra[i];
        cached6[i] = (varlen << 6) | (63 - (i + kMinMatch));
    }
    // Offset bit cost by bucketed offset index, hoisted out of the row loop
    // (the two table indirections per candidate become one).
    int32_t off_cost[512];
    for (int32_t oidx = 0; oidx < 512; ++oidx)
        off_cost[oidx] = off.code_length[T.off_sym[oidx]] + T.off_extra[oidx];

    cost[end] = 0;
    for (int32_t i = end - 1; i >= start; --i) {
        int32_t best_cost = lit.code_length[window[i]] + cost[i + 1];
        int32_t best_len = 0;
        int32_t best_off = 0;

        const uint16_t* row = table + (int64_t)i * kMatchesPerPos * 2;

        // The k-dependent part of a truncated candidate's packed value is
        // shared by every row at this position, so one prefix-min pass over
        // k = MIN..lmax replaces the per-row downward sweeps: the sweep min
        // for a row of clamped length L is exactly packed_pm[L]. Rows are
        // emitted longest-first by the walk (interval LCPs strictly decrease
        // along the ascent; clamping preserves non-increasing order), so the
        // FIRST row under kLeaveAlone carries the largest short length —
        // build the prefix-min lazily when that row is reached.
        int32_t packed_pm[kLeaveAlone];
        int32_t pm_len = 0;  // packed_pm is valid for k in [MIN, pm_len]

        for (int32_t m = 0; m < kMatchesPerPos; ++m) {
            const int32_t length = row[m * 2];
            if (length < kMinMatch) break;
            const int32_t offset = row[m * 2 + 1];
            const int32_t offset_size = off_cost[SymbolTables::off_index(offset)];

            int32_t match_len = length;
            if (i + match_len > end) match_len = end - i;

            if (length >= kLeaveAlone) {
                // Unsigned-wrap semantics: a clamped length below MIN maps
                // to index 255, like the reference's unsigned parameter.
                int32_t e = match_len - kMinMatch;
                if ((uint32_t)e > 255u) e = 255;
                int32_t cur = lit.code_length[T.len_sym[e]] + T.len_extra[e] +
                              offset_size + cost[i + match_len];
                if (best_cost > cur) {
                    best_cost = cur;
                    best_len = match_len;
                    best_off = offset;
                }
            } else if (match_len >= kMinMatch) {
                // (match_len < MIN after block-end clamping means the sweep
                // range is empty — packed stays INT32_MAX in the reference
                // formulation and can never win; skip the row.)
                if (match_len > pm_len) {
                    // Normally built exactly once (at the first short row);
                    // the rebuild-from-MIN guard keeps the result correct
                    // even if a longer short row ever appeared later.
                    const int32_t* cost_base = cost + i;
                    int32_t pm = INT32_MAX;
                    for (int32_t k = kMinMatch; k <= match_len; ++k) {
                        const int32_t v = cached6[k - kMinMatch] + (cost_base[k] << 6);
                        pm = pm < v ? pm : v;
                        packed_pm[k] = pm;
                    }
                    pm_len = match_len;
                }
                const int32_t packed = packed_pm[match_len];
                const int32_t cur = (packed >> 6) + offset_size;
                if (best_cost > cur) {
                    best_cost = cur;
                    best_len = 63 - (packed & 63);
                    best_off = offset;
                }
            }
        }
        cost[i] = best_cost;
        best[i * 2] = (uint16_t)best_len;
        best[i * 2 + 1] = (uint16_t)best_off;
    }
}

// -- token walks ------------------------------------------------------------

// Accumulate greedy/final token histograms (+ EOD). ``stride`` is the
// uint16-pair stride between positions (8 for the match table, 1 for best).
static void token_entropy(HuffEncoder& lit, HuffEncoder& off, const uint8_t* window,
                          const uint16_t* tokens, int32_t stride,
                          int32_t start, int32_t end) {
    int32_t i = start;
    while (i < end) {
        const uint16_t* tok = tokens + (int64_t)i * stride * 2;
        const int32_t length = tok[0];
        if (length >= kMinMatch) {
            int32_t e = length - kMinMatch;
            if (e > 255) e = 255;
            lit.entropy[T.len_sym[e]]++;
            off.entropy[T.off_sym[SymbolTables::off_index(tok[1])]]++;
            i += length;
        } else {
            lit.entropy[window[i]]++;
            ++i;
        }
    }
    lit.entropy[kEodSym]++;
}

// Greedy-parse histograms from the packed token chain (identical symbol
// accounting to token_entropy over the match table, ~8x less cache traffic).
static void token_entropy_chain(HuffEncoder& lit, HuffEncoder& off,
                                const uint32_t* tok, int32_t start, int32_t end) {
    int32_t i = start;
    while (i < end) {
        const uint32_t t = tok[i];
        lit.entropy[(t >> 9) & kTokSkipMask]++;
        const uint32_t s1 = t >> 18;
        if (s1 != kTokNoOffSym) off.entropy[s1]++;
        i += (int32_t)(t & kTokSkipMask);
    }
    lit.entropy[kEodSym]++;
}

static void post_optimize(const HuffEncoder& lit, const HuffEncoder& off,
                          const uint8_t* window, uint16_t* best,
                          int32_t start, int32_t end) {
    int32_t i = start;
    while (i < end) {
        const int32_t length = best[i * 2];
        if (length >= kMinMatch) {
            const int32_t offset = best[i * 2 + 1];
            const int32_t start_idx = i;
            i += length;
            if (offset < 1 || offset > kMaxOffset) continue;

            int32_t e = length - kMinMatch;
            if (e > 255) e = 255;
            const int32_t oidx = SymbolTables::off_index(offset);
            const int32_t match_cost = lit.code_length[T.len_sym[e]] + T.len_extra[e] +
                                       off.code_length[T.off_sym[oidx]] + T.off_extra[oidx];

            int64_t literals_cost = 0;
            bool undefined = false;
            for (int32_t j = 0; j < length && literals_cost < match_cost; ++j) {
                int32_t cur = lit.code_length[window[start_idx + j]];
                if (cur == 0) { undefined = true; break; }
                literals_cost += cur;
            }
            if (undefined) continue;
            if (literals_cost < match_cost)
                for (int32_t j = 0; j < length; ++j) best[(start_idx + j) * 2] = 0;
        } else {
            ++i;
        }
    }
}

static bool write_tokens(const HuffEncoder& lit, const HuffEncoder& off,
                         const uint8_t* window, const uint16_t* best,
                         int32_t start, int32_t end, BitWriter& bw) {
    int32_t i = start;
    while (i < end) {
        const int32_t length = best[i * 2];
        if (length >= kMinMatch) {
            const int32_t offset = best[i * 2 + 1];
            if (offset < 1 || offset > kMaxOffset) return false;
            int32_t e = length - kMinMatch;
            int32_t eidx = e > 255 ? 255 : e;
            lit.write_codeword(T.len_sym[eidx], bw);
            bw.put_bits((uint32_t)(e - T.len_base[eidx]), T.len_extra[eidx]);
            const int32_t oidx = SymbolTables::off_index(offset);
            off.write_codeword(T.off_sym[oidx], bw);
            bw.put_bits((uint32_t)(offset - T.off_base[oidx]), T.off_extra[oidx]);
            i += length;
        } else {
            lit.write_codeword(window[i], bw);
            ++i;
        }
        if (bw.overflow) return false;
    }
    lit.write_codeword(kEodSym, bw);
    return !bw.overflow;
}

// -- block-level cost evaluation --------------------------------------------

static void prepare_cost_evaluation(HuffEncoder& lit, HuffEncoder& off,
                                    const uint32_t* tok,
                                    int32_t start, int32_t size) {
    lit.init(kNumLiteralSyms, 15);
    off.init(kNumOffsetSyms, 15);
    token_entropy_chain(lit, off, tok, start, start + size);
}

static const int32_t kStaticLitLens[4][2] = {{144, 8}, {112, 9}, {24, 7}, {8, 8}};

static void fill_static_lengths(HuffEncoder& lit, HuffEncoder& off) {
    int32_t i = 0;
    for (auto& seg : kStaticLitLens)
        for (int32_t k = 0; k < seg[0]; ++k) lit.code_length[i++] = seg[1];
    for (i = 0; i < kNumOffsetSyms; ++i) off.code_length[i] = 5;
}

static int64_t evaluate_static_cost(const HuffEncoder& lit, const HuffEncoder& off) {
    int32_t static_lens[kNumLiteralSyms];
    {
        int32_t i = 0;
        for (auto& seg : kStaticLitLens)
            for (int32_t k = 0; k < seg[0]; ++k) static_lens[i++] = seg[1];
    }
    int64_t cost = 0;
    for (int32_t i = 0; i < kMatchLenSymStart; ++i)
        cost += (int64_t)lit.entropy[i] * static_lens[i];
    for (int32_t i = kMatchLenSymStart; i < kMatchLenSymStart + kNumMatchLenSyms; ++i)
        cost += (int64_t)lit.entropy[i] * (static_lens[i] + T.rev_len_bits[i - kMatchLenSymStart]);
    for (int32_t i = 0; i < kNumOffsetSyms; ++i)
        cost += (int64_t)off.entropy[i] * (5 + T.rev_off_bits[i]);
    return cost + 3;
}

static int64_t evaluate_dynamic_cost(const HuffEncoder& lit, const HuffEncoder& off) {
    int64_t cost = 0;
    for (int32_t i = 0; i < kMatchLenSymStart; ++i)
        cost += (int64_t)lit.entropy[i] * lit.code_length[i];
    for (int32_t i = kMatchLenSymStart; i < kMatchLenSymStart + kNumMatchLenSyms; ++i)
        cost += (int64_t)lit.entropy[i] * (lit.code_length[i] + T.rev_len_bits[i - kMatchLenSymStart]);
    for (int32_t i = 0; i < kNumOffsetSyms; ++i)
        cost += (int64_t)off.entropy[i] * (off.code_length[i] + T.rev_off_bits[i]);

    const int32_t n_lit = lit.defined_var_lengths_count(257);
    const int32_t n_off = off.defined_var_lengths_count(1);
    int32_t lens[kNumLiteralSyms + kNumOffsetSyms];
    std::memcpy(lens, lit.code_length, n_lit * sizeof(int32_t));
    std::memcpy(lens + n_lit, off.code_length, n_off * sizeof(int32_t));

    HuffEncoder te;
    te.init(kNumCodeLenSyms, 7);
    update_var_lengths_entropy(te, n_lit + n_off, lens, 7);
    te.estimate_dynamic_codelens();

    cost += 5 + 5 + 4;
    cost += 3 * te.raw_table_size();
    cost += get_var_lengths_size(te, n_lit + n_off, lens, kMaxCodesMask);
    return cost + 3;
}

static int64_t estimated_dynamic_cost_of_entropy(HuffEncoder& lit, HuffEncoder& off) {
    lit.estimate_dynamic_codelens();
    off.estimate_dynamic_codelens();
    return evaluate_dynamic_cost(lit, off);
}

// -- block splitting --------------------------------------------------------

static void split_recursive(const uint32_t* tok,
                            int32_t start, int32_t size, int32_t depth,
                            int32_t max_splits, std::vector<int32_t>& splits) {
    if ((int32_t)splits.size() >= max_splits) return;
    if (depth >= 6 || size < 8192) return;

    HuffEncoder lit, off;
    prepare_cost_evaluation(lit, off, tok, start, size);
    const int64_t total_cost = estimated_dynamic_cost_of_entropy(lit, off);
    int32_t total_lit_ent[kNumLiteralSyms], total_off_ent[kNumOffsetSyms];
    std::memcpy(total_lit_ent, lit.entropy, sizeof(total_lit_ent));
    std::memcpy(total_off_ent, off.entropy, sizeof(total_off_ent));

    HuffEncoder left_lit, left_off, right_lit, right_off, seg_lit, seg_off;
    left_lit.init(kNumLiteralSyms, 15);
    left_off.init(kNumOffsetSyms, 15);
    right_lit.init(kNumLiteralSyms, 15);
    right_off.init(kNumOffsetSyms, 15);

    uint32_t stat[18] = {0}, new_stat[18] = {0};
    uint32_t n_stats = 0, n_new_stats = 0;
    int32_t last_good_split = -1;
    int32_t last_left_end = start;
    int32_t best_split = start + size;
    int64_t best_delta = 0;

    const int32_t end = start + size;
    int32_t i = start;
    while (i < end) {
        const uint32_t t = tok[i];
        const int32_t length = (int32_t)(t & kTokSkipMask);
        if ((t >> 18) != kTokNoOffSym) {
            new_stat[length >= 9 ? 17 : 16]++;
            ++n_new_stats;
            i += length;
        } else {
            const uint8_t byte = (uint8_t)((t >> 9) & 0xFF);
            new_stat[((byte >> 4) & 0xC) | (byte & 0x3)]++;
            ++n_new_stats;
            ++i;
        }

        if (n_new_stats >= 256 && (i - start) >= 512) {
            if (n_stats) {
                uint32_t total_delta = 0;
                for (int32_t j = 0; j < 18; ++j) {
                    const uint32_t expected = stat[j] * n_new_stats;
                    const uint32_t actual = new_stat[j] * n_stats;
                    total_delta += expected > actual ? expected - actual : actual - expected;
                }

                if ((total_delta / n_new_stats) >= (n_stats * 45 / 100) && last_good_split >= 0) {
                    prepare_cost_evaluation(seg_lit, seg_off, tok,
                                            last_left_end, last_good_split - last_left_end);
                    for (int32_t j = 0; j < kNumLiteralSyms; ++j)
                        left_lit.entropy[j] += seg_lit.entropy[j];
                    for (int32_t j = 0; j < kNumOffsetSyms; ++j)
                        left_off.entropy[j] += seg_off.entropy[j];
                    left_lit.entropy[kEodSym] = 1;

                    for (int32_t j = 0; j < kNumLiteralSyms; ++j)
                        right_lit.entropy[j] = total_lit_ent[j] - left_lit.entropy[j];
                    for (int32_t j = 0; j < kNumOffsetSyms; ++j)
                        right_off.entropy[j] = total_off_ent[j] - left_off.entropy[j];
                    right_lit.entropy[kEodSym] = 1;

                    const int64_t left_cost = estimated_dynamic_cost_of_entropy(left_lit, left_off);
                    const int64_t right_cost = estimated_dynamic_cost_of_entropy(right_lit, right_off);
                    const int64_t delta = total_cost - (left_cost + right_cost);
                    if (delta >= 0 && (best_split == start + size || best_delta < delta)) {
                        best_split = last_good_split;
                        best_delta = delta;
                    }
                    last_left_end = last_good_split;
                }
            }
            for (int32_t j = 0; j < 18; ++j) {
                n_stats += new_stat[j];
                stat[j] += new_stat[j];
                new_stat[j] = 0;
            }
            n_new_stats = 0;
            last_good_split = i;
        }
    }

    if (best_split != start + size) {
        split_recursive(tok, start, best_split - start, depth + 1, max_splits, splits);
        if ((int32_t)splits.size() < max_splits) splits.push_back(best_split);
        split_recursive(tok, best_split, end - best_split, depth + 1, max_splits, splits);
    }
}

static std::vector<int32_t> block_split(const uint32_t* tok,
                                        int32_t start, int32_t size) {
    std::vector<int32_t> splits;
    split_recursive(tok, start, size, 0, kMaxSplits - 1, splits);
    if ((int32_t)splits.size() < kMaxSplits) splits.push_back(start + size);
    return splits;
}

// -- per-block deflate ------------------------------------------------------
//
// Planning (expensive: greedy entropy, 3+1 DP convergence passes, table
// construction, CL mask search) is independent per block and runs on a
// thread pool. Emission is cheap and stays sequential because every bit
// position depends on the previous block's bit phase.

struct BlockPlan {
    int32_t start = 0;
    int32_t size = 0;
    bool is_dynamic = false;
    HuffEncoder lit, off, te;
    int32_t best_mask = -1;
    int32_t n_lit = 0, n_off = 0;
    int32_t lens[kNumLiteralSyms + kNumOffsetSyms];
};

static void plan_block(const uint8_t* window, const uint16_t* table,
                       const uint32_t* tok, uint16_t* best,
                       int32_t* cost_scratch, BlockPlan& plan) {
    const int32_t start = plan.start;
    const int32_t size = plan.size;
    const int32_t end = start + size;

    // Static vs dynamic choice from the greedy parse.
    {
        zn::SubTimer t_(zn::substages().greedy_ns);
        HuffEncoder glit, goff;
        prepare_cost_evaluation(glit, goff, tok, start, size);
        const int64_t static_cost = evaluate_static_cost(glit, goff);
        glit.estimate_dynamic_codelens();
        goff.estimate_dynamic_codelens();
        const int64_t dynamic_cost = evaluate_dynamic_cost(glit, goff);
        plan.is_dynamic = !(static_cost <= dynamic_cost);
    }

    HuffEncoder& lit = plan.lit;
    HuffEncoder& off = plan.off;
    lit.init(kNumLiteralSyms, 15);
    off.init(kNumOffsetSyms, 15);

    if (!plan.is_dynamic) {
        fill_static_lengths(lit, off);
        lit.build_static_codewords();
        off.build_static_codewords();
        optimize_matches(lit, off, window, table, start, end, best, cost_scratch);
        return;
    }

    constexpr int32_t kConvergencePasses = 3;
    token_entropy_chain(lit, off, tok, start, end);
    lit.build_dynamic_codewords();
    off.build_dynamic_codewords();

    // Convergence memoization: a pass whose (default-filled) code lengths
    // equal the previous pass's reproduces the identical parse and
    // histogram, so the DP and the recount can be skipped — a pure
    // identity, not an approximation (the reference just re-runs them).
    int32_t prev_lit_lengths[kNumLiteralSyms];
    int32_t prev_off_lengths[kNumOffsetSyms];
    bool have_prev = false;

    for (int32_t pass = 0; pass <= kConvergencePasses; ++pass) {
        for (int32_t sidx = 0; sidx < kNumLiteralSyms; ++sidx)
            if (lit.code_length[sidx] == 0) lit.code_length[sidx] = 9;
        for (int32_t sidx = 0; sidx < kNumOffsetSyms; ++sidx)
            if (off.code_length[sidx] == 0) off.code_length[sidx] = 6;

        const bool converged = have_prev &&
            std::memcmp(prev_lit_lengths, lit.code_length, sizeof(prev_lit_lengths)) == 0 &&
            std::memcmp(prev_off_lengths, off.code_length, sizeof(prev_off_lengths)) == 0;
        std::memcpy(prev_lit_lengths, lit.code_length, sizeof(prev_lit_lengths));
        std::memcpy(prev_off_lengths, off.code_length, sizeof(prev_off_lengths));
        have_prev = true;

        if (!converged) {
            {
                zn::SubTimer t_(zn::substages().dp_ns);
                optimize_matches(lit, off, window, table, start, end, best,
                                 cost_scratch);
            }
            zn::SubTimer t_(zn::substages().recount_ns);
            std::memset(lit.entropy, 0, sizeof(lit.entropy));
            std::memset(off.entropy, 0, sizeof(off.entropy));
            token_entropy(lit, off, window, best, 1, start, end);
        }

        if (pass == kConvergencePasses) {
            int32_t n_offset_lens = 0;
            for (int32_t sidx = 0; n_offset_lens < 2 && sidx < kNumOffsetSyms - 2; ++sidx)
                if (off.entropy[sidx]) ++n_offset_lens;
            if (n_offset_lens == 0) {
                off.entropy[0] = off.entropy[1] = 1;
            } else if (n_offset_lens == 1) {
                if (off.entropy[0]) off.entropy[1] = 1;
                else off.entropy[0] = 1;
            }
        }
        lit.build_dynamic_codewords();
        off.build_dynamic_codewords();
    }

    post_optimize(lit, off, window, best, start, end);

    zn::SubTimer t_tables(zn::substages().tables_ns);
    // A/B test the Zopfli RLE histogram rewrite.
    {
        HuffEncoder opt_lit = lit, opt_off = off;
        const int64_t cur_cost = evaluate_dynamic_cost(opt_lit, opt_off);
        optimize_histogram_for_rle(kNumLiteralSyms, opt_lit.entropy);
        optimize_histogram_for_rle(kNumOffsetSyms, opt_off.entropy);
        opt_lit.build_dynamic_codewords();
        opt_off.build_dynamic_codewords();
        const int64_t opt_cost = evaluate_dynamic_cost(opt_lit, opt_off);
        if (opt_cost < cur_cost) {
            lit = opt_lit;
            off = opt_off;
        }
    }

    plan.n_lit = lit.defined_var_lengths_count(257);
    plan.n_off = off.defined_var_lengths_count(1);
    std::memcpy(plan.lens, lit.code_length, plan.n_lit * sizeof(int32_t));
    std::memcpy(plan.lens + plan.n_lit, off.code_length, plan.n_off * sizeof(int32_t));

    HuffEncoder& te = plan.te;
    te.init(kNumCodeLenSyms, 7);
    int64_t best_tables_cost = 0;
    int32_t best_mask = -1;
    for (int32_t mask = 0; mask <= kMaxCodesMask; mask >= 7 ? mask += 2 : ++mask) {
        update_var_lengths_entropy(te, plan.n_lit + plan.n_off, plan.lens, (uint32_t)mask);
        te.build_dynamic_codewords();
        const int64_t cur = get_var_lengths_size(te, plan.n_lit + plan.n_off, plan.lens, (uint32_t)mask);
        if (best_mask == -1 || best_tables_cost >= cur) {
            best_mask = mask;
            best_tables_cost = cur;
        }
        std::memset(te.entropy, 0, sizeof(te.entropy));
    }
    plan.best_mask = best_mask;
    update_var_lengths_entropy(te, plan.n_lit + plan.n_off, plan.lens, (uint32_t)best_mask);
    te.build_dynamic_codewords();
}

static bool emit_block(const BlockPlan& plan, const uint8_t* window,
                       const uint16_t* best, BitWriter& bw) {
    if (plan.is_dynamic) {
        const int32_t n_cl = plan.te.raw_table_size();
        if (plan.n_lit > 286 || plan.n_off > 30 || n_cl > kNumCodeLenSyms) return false;
        bw.put_bits((uint32_t)(plan.n_lit - 257), 5);
        bw.put_bits((uint32_t)(plan.n_off - 1), 5);
        bw.put_bits((uint32_t)(n_cl - 4), 4);
        for (int32_t k = 0; k < n_cl; ++k)
            bw.put_bits((uint32_t)plan.te.code_length[kCodeLenSymOrder[k]], 3);
        if (bw.overflow) return false;
        if (!write_var_lengths(plan.te, plan.n_lit + plan.n_off, plan.lens,
                               (uint32_t)plan.best_mask, bw))
            return false;
    }
    return write_tokens(plan.lit, plan.off, window, best,
                        plan.start, plan.start + plan.size, bw);
}

// -- window compressor ------------------------------------------------------
//
// Split into begin (everything expensive and bit-phase independent: match
// finding, splitting, per-block planning) and emit (bit-phase dependent,
// cheap). The Python streaming layer pipelines begin() calls for
// consecutive windows across threads and emits in order, so two windows'
// planning overlaps while the bitstream stays sequential.

struct WindowJob {
    std::vector<uint8_t> window;  // owned copy (prev + in_size bytes)
    int32_t prev = 0;
    int32_t in_size = 0;
    MatchFinder mf;
    std::vector<uint16_t> table;
    std::vector<uint32_t> tok;  // packed greedy token chain
    std::vector<uint16_t> best;
    std::vector<BlockPlan> plans;
};

// Job pool: windows are uniform in size within a stream, so recycling
// jobs keeps their buffers' pages warm instead of refaulting ~70 MB of
// fresh allocations per window.
static std::mutex g_job_pool_mutex;
static std::vector<WindowJob*> g_job_pool;

static WindowJob* acquire_job() {
    std::lock_guard<std::mutex> lock(g_job_pool_mutex);
    if (!g_job_pool.empty()) {
        WindowJob* job = g_job_pool.back();
        g_job_pool.pop_back();
        return job;
    }
    return new WindowJob();
}

static void release_job(WindowJob* job) {
    if (!job) return;
    job->plans.clear();
    std::lock_guard<std::mutex> lock(g_job_pool_mutex);
    if (g_job_pool.size() < 4) g_job_pool.push_back(job);
    else delete job;
}

static WindowJob* window_begin(const uint8_t* window_data, int32_t prev, int32_t in_size,
                               int32_t n_threads_req,
                               const uint16_t* ext_table = nullptr) {
    WindowJob* job = acquire_job();
    const int32_t n = prev + in_size;
    job->prev = prev;
    job->in_size = in_size;
    job->window.assign(window_data, window_data + n);
    const uint8_t* window = job->window.data();
    StageTimer timer;

    job->table.resize((int64_t)n * kMatchesPerPos * 2);
    if (ext_table) {
        // Precomputed match table (e.g. the device staircase matchfinder);
        // skip the SA + interval walk entirely.
        std::memcpy(job->table.data(), ext_table,
                    (size_t)n * kMatchesPerPos * 2 * sizeof(uint16_t));
        timer.mark("ext table");
    } else {
        MatchFinder& mf = job->mf;
        mf.build(window, n);
        timer.mark("sa+intervals");
        build_match_table(mf, prev, n, job->table.data());
        timer.mark("match walk");
    }

    job->best.assign((int64_t)n * 2, 0);

    job->tok.resize(n);
    build_greedy_chain(window, job->table.data(), prev, n, job->tok.data());

    const std::vector<int32_t> splits = block_split(job->tok.data(), prev, in_size);
    timer.mark("block split");

    // Plan every block (DP convergence + tables), in parallel when the
    // window has several blocks.
    {
        int32_t in_start = 0;
        size_t split_idx = 0;
        while (in_start < in_size) {
            const int32_t block_size = splits[split_idx++] - (in_start + prev);
            job->plans.emplace_back();
            BlockPlan& plan = job->plans.back();
            plan.start = prev + in_start;
            plan.size = block_size;
            in_start += block_size;
        }
    }
    std::vector<BlockPlan>& plans = job->plans;

    int32_t n_threads = n_threads_req > 0 ? n_threads_req
                                          : (int32_t)std::thread::hardware_concurrency();
    if (const char* env = std::getenv("ZN_THREADS")) n_threads = std::atoi(env);
    if (n_threads < 1) n_threads = 1;
    if (n_threads > (int32_t)plans.size()) n_threads = (int32_t)plans.size();

    if (n_threads <= 1) {
        std::vector<int32_t> cost_scratch(n + 1);
        for (BlockPlan& plan : plans)
            plan_block(window, job->table.data(), job->tok.data(), job->best.data(),
                       cost_scratch.data(), plan);
    } else {
        std::atomic<size_t> next{0};
        auto worker = [&] {
            std::vector<int32_t> cost_scratch(n + 1);
            for (;;) {
                const size_t idx = next.fetch_add(1);
                if (idx >= plans.size()) break;
                plan_block(window, job->table.data(), job->tok.data(), job->best.data(),
                           cost_scratch.data(), plans[idx]);
            }
        };
        std::vector<std::thread> threads;
        for (int32_t t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
        worker();
        for (auto& th : threads) th.join();
    }
    timer.mark("block plan");
    zn::substages().dump_and_reset();
    return job;
}

static int64_t window_emit(WindowJob* job, int32_t window_is_last,
                           uint8_t* out, int64_t out_cap,
                           uint32_t* bits_data, int32_t* bits_count) {
    const uint8_t* window = job->window.data();
    const uint16_t* best = job->best.data();

    BitWriter bw;
    bw.out = out;
    bw.cap = out_cap;
    bw.offset = 0;
    bw.bits_data = *bits_data;
    bw.bits_count = *bits_count;

    for (size_t bi = 0; bi < job->plans.size(); ++bi) {
        const BlockPlan& plan = job->plans[bi];
        const int32_t is_final =
            (window_is_last && bi + 1 == job->plans.size()) ? 1 : 0;

        const int64_t saved_offset = bw.offset;
        const uint32_t saved_bits = bw.bits_data;
        const int32_t saved_count = bw.bits_count;

        bw.put_bits((uint32_t)is_final, 1);
        bw.put_bits(plan.is_dynamic ? 2 : 1, 2);

        const int64_t prev_offset = bw.offset;
        const bool ok = !bw.overflow && emit_block(plan, window, best, bw);
        if (!ok || bw.overflow || (bw.offset - prev_offset) > plan.size) {
            // Stored fallback: rewind, emit ≤65535-byte stored sub-blocks.
            bw.offset = saved_offset;
            bw.bits_data = saved_bits;
            bw.bits_count = saved_count;
            bw.overflow = false;

            int32_t sub_offset = 0;
            int32_t remaining_block = plan.size;
            while (remaining_block) {
                int32_t sub_size = remaining_block;
                int32_t sub_final = is_final;
                if (sub_size > 65535) { sub_size = 65535; sub_final = 0; }
                bw.put_bits((uint32_t)sub_final, 1);
                bw.put_bits(0, 2);
                bw.flush_bits();
                const uint8_t header[4] = {
                    (uint8_t)(sub_size & 0xFF), (uint8_t)(sub_size >> 8),
                    (uint8_t)((sub_size & 0xFF) ^ 0xFF), (uint8_t)(((sub_size >> 8) & 0xFF) ^ 0xFF)};
                bw.put_bytes(header, 4);
                bw.put_bytes(window + plan.start + sub_offset, sub_size);
                if (bw.overflow) return -1;
                sub_offset += sub_size;
                remaining_block -= sub_size;
            }
        }
    }

    if (window_is_last)
        if (!bw.flush_bits()) return -1;

    *bits_data = bw.bits_data;
    *bits_count = bw.bits_count;
    return bw.offset;
}

static int64_t compress_window(const uint8_t* window, int32_t prev, int32_t in_size,
                               int32_t window_is_last,
                               uint8_t* out, int64_t out_cap,
                               uint32_t* bits_data, int32_t* bits_count) {
    WindowJob* job = window_begin(window, prev, in_size, 0);
    const int64_t result = window_emit(job, window_is_last, out, out_cap, bits_data, bits_count);
    release_job(job);
    return result;
}

} // namespace zn

// -- C ABI ------------------------------------------------------------------

extern "C" {

const char* zn_version() { return "zultra_tpu-native-0.1"; }

int32_t zn_suffix_array(const uint8_t* data, int32_t n, int32_t* sa) {
    zn::suffix_array(data, n, sa);
    return 0;
}

// Build the full match table for a window: out is (end * 8 * 2) uint16.
int32_t zn_build_matchtable(const uint8_t* window, int32_t n, int32_t start,
                            uint16_t* table) {
    zn::MatchFinder mf;
    mf.build(window, n);
    zn::build_match_table(mf, start, n, table);
    return 0;
}

// Cost DP given code-length tables; best is (end * 2) uint16.
void zn_optimize_matches(const int32_t* lit_lens, const int32_t* off_lens,
                         const uint8_t* window, const uint16_t* table,
                         int32_t start, int32_t end, uint16_t* best) {
    zn::HuffEncoder lit, off;
    lit.init(zn::kNumLiteralSyms, 15);
    off.init(zn::kNumOffsetSyms, 15);
    std::memcpy(lit.code_length, lit_lens, zn::kNumLiteralSyms * sizeof(int32_t));
    std::memcpy(off.code_length, off_lens, zn::kNumOffsetSyms * sizeof(int32_t));
    std::vector<int32_t> cost(end + 1);
    zn::optimize_matches(lit, off, window, table, start, end, best, cost.data());
}

int64_t zn_compress_window(const uint8_t* window, int32_t prev, int32_t in_size,
                           int32_t window_is_last,
                           uint8_t* out, int64_t out_cap,
                           uint32_t* bits_data, int32_t* bits_count) {
    return zn::compress_window(window, prev, in_size, window_is_last, out, out_cap,
                               bits_data, bits_count);
}

// Pipelined variant: begin() runs everything bit-phase independent and may
// execute concurrently for several windows; emit() is called in stream
// order and frees the job.
void* zn_window_begin(const uint8_t* window, int32_t prev, int32_t in_size,
                      int32_t n_threads) {
    return zn::window_begin(window, prev, in_size, n_threads);
}

// As zn_window_begin, but with an externally computed match table
// ((prev+in_size) * 8 * 2 uint16 of length,offset rows) — used by the jax
// engine to combine the device matchfinder with the native block planner.
void* zn_window_begin_with_table(const uint8_t* window, int32_t prev, int32_t in_size,
                                 int32_t n_threads, const uint16_t* table) {
    return zn::window_begin(window, prev, in_size, n_threads, table);
}

int64_t zn_window_emit(void* job, int32_t window_is_last,
                       uint8_t* out, int64_t out_cap,
                       uint32_t* bits_data, int32_t* bits_count) {
    zn::WindowJob* wj = (zn::WindowJob*)job;
    const int64_t result = zn::window_emit(wj, window_is_last, out, out_cap, bits_data, bits_count);
    zn::release_job(wj);
    return result;
}

void zn_window_free(void* job) { zn::release_job((zn::WindowJob*)job); }

// -- plan serialization -------------------------------------------------------
// A planned window's emit-relevant state (window bytes, chosen tokens,
// per-block plans) as a flat blob, so multi-host "windows" mode can plan
// windows on worker processes/hosts and emit, in stream order and at the
// true bit phase, on host 0. The encoding is an explicit fixed layout —
// every multi-byte field is written little-endian byte by byte, never via
// struct memcpy — so blobs are valid across compilers, ABIs, and
// endianness (i.e., over a real DCN between heterogeneous hosts).
//
//   u32 magic "ZPL2" | i32 prev | i32 in_size | i32 n_plans |
//   u8 window[prev+in_size] | u16 best[2*(prev+in_size)] |
//   n_plans * plan, where plan =
//     i32 start | i32 size | u8 is_dynamic |
//     encoder lit | encoder off |
//     [if dynamic: i32 best_mask | i32 n_lit | i32 n_off |
//      encoder te | u8 lens[n_lit+n_off]]
//   and encoder = u16 n_symbols | u8 max_code_length |
//     u8 code_length[n_symbols] | u16 code_word[n_symbols]
// (Code lengths are ≤15 and codewords ≤15 bits by construction, so u8/u16
// are exact. Encoder entropy[] is planning-only state and is not carried;
// deserialized jobs are emit-only, which is all host 0 does with them.)

static const uint32_t kPlanMagic = 0x5A504C32;  // "ZPL2"

static inline void wr_u16(uint8_t*& p, uint32_t v) {
    p[0] = (uint8_t)v; p[1] = (uint8_t)(v >> 8); p += 2;
}
static inline void wr_u32(uint8_t*& p, uint32_t v) {
    p[0] = (uint8_t)v; p[1] = (uint8_t)(v >> 8);
    p[2] = (uint8_t)(v >> 16); p[3] = (uint8_t)(v >> 24); p += 4;
}
static inline uint32_t rd_u16(const uint8_t*& p) {
    uint32_t v = (uint32_t)p[0] | ((uint32_t)p[1] << 8); p += 2; return v;
}
static inline uint32_t rd_u32(const uint8_t*& p) {
    uint32_t v = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                 ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
    p += 4; return v;
}

static int64_t encoder_wire_size(const zn::HuffEncoder& e) {
    return 3 + (int64_t)e.n_symbols * 3;
}

static void write_encoder(uint8_t*& p, const zn::HuffEncoder& e) {
    wr_u16(p, (uint32_t)e.n_symbols);
    *p++ = (uint8_t)e.max_code_length;
    for (int32_t i = 0; i < e.n_symbols; ++i) *p++ = (uint8_t)e.code_length[i];
    for (int32_t i = 0; i < e.n_symbols; ++i) wr_u16(p, e.code_word[i]);
}

static bool read_encoder(const uint8_t*& p, const uint8_t* end, zn::HuffEncoder& e) {
    if (end - p < 3) return false;
    const int32_t n_symbols = (int32_t)rd_u16(p);
    const int32_t max_len = *p++;
    if (n_symbols < 0 || n_symbols > zn::kMaxSymbols || end - p < (int64_t)n_symbols * 3)
        return false;
    e.init(n_symbols, max_len);
    for (int32_t i = 0; i < n_symbols; ++i) e.code_length[i] = *p++;
    for (int32_t i = 0; i < n_symbols; ++i) e.code_word[i] = rd_u16(p);
    return true;
}

static int64_t plan_wire_size(const zn::BlockPlan& plan) {
    int64_t sz = 4 + 4 + 1 + encoder_wire_size(plan.lit) + encoder_wire_size(plan.off);
    if (plan.is_dynamic)
        sz += 12 + encoder_wire_size(plan.te) + (int64_t)(plan.n_lit + plan.n_off);
    return sz;
}

int64_t zn_window_serialized_size(void* job) {
    zn::WindowJob* wj = (zn::WindowJob*)job;
    const int64_t n = wj->prev + wj->in_size;
    int64_t sz = (int64_t)(4 + 12) + n + n * 4;
    for (const zn::BlockPlan& plan : wj->plans) sz += plan_wire_size(plan);
    return sz;
}

int64_t zn_window_serialize(void* job, uint8_t* out, int64_t cap) {
    zn::WindowJob* wj = (zn::WindowJob*)job;
    const int64_t need = zn_window_serialized_size(job);
    if (cap < need) return -1;
    uint8_t* p = out;
    wr_u32(p, kPlanMagic);
    wr_u32(p, (uint32_t)wj->prev);
    wr_u32(p, (uint32_t)wj->in_size);
    wr_u32(p, (uint32_t)wj->plans.size());
    const int64_t n = wj->prev + wj->in_size;
    std::memcpy(p, wj->window.data(), n); p += n;
    for (int64_t i = 0; i < n * 2; ++i) wr_u16(p, wj->best[i]);
    for (const zn::BlockPlan& plan : wj->plans) {
        wr_u32(p, (uint32_t)plan.start);
        wr_u32(p, (uint32_t)plan.size);
        *p++ = plan.is_dynamic ? 1 : 0;
        write_encoder(p, plan.lit);
        write_encoder(p, plan.off);
        if (plan.is_dynamic) {
            wr_u32(p, (uint32_t)plan.best_mask);
            wr_u32(p, (uint32_t)plan.n_lit);
            wr_u32(p, (uint32_t)plan.n_off);
            write_encoder(p, plan.te);
            for (int32_t i = 0; i < plan.n_lit + plan.n_off; ++i)
                *p++ = (uint8_t)plan.lens[i];
        }
    }
    return p - out;
}

void* zn_window_deserialize(const uint8_t* blob, int64_t size) {
    const uint8_t* p = blob;
    const uint8_t* end = blob + size;
    if (size < 16 || rd_u32(p) != kPlanMagic) return nullptr;
    const int32_t prev = (int32_t)rd_u32(p);
    const int32_t in_size = (int32_t)rd_u32(p);
    const int32_t n_plans = (int32_t)rd_u32(p);
    const int64_t n = (int64_t)prev + in_size;
    if (prev < 0 || in_size < 0 || n_plans < 0 || n <= 0 || end - p < n + n * 4)
        return nullptr;
    zn::WindowJob* wj = zn::acquire_job();
    wj->prev = prev;
    wj->in_size = in_size;
    wj->window.assign(p, p + n); p += n;
    wj->best.resize(n * 2);
    for (int64_t i = 0; i < n * 2; ++i) wj->best[i] = (uint16_t)rd_u16(p);
    wj->plans.resize(n_plans);
    for (zn::BlockPlan& plan : wj->plans) {
        if (end - p < 9) { zn::release_job(wj); return nullptr; }
        plan.start = (int32_t)rd_u32(p);
        plan.size = (int32_t)rd_u32(p);
        plan.is_dynamic = *p++ != 0;
        if (!read_encoder(p, end, plan.lit) || !read_encoder(p, end, plan.off)) {
            zn::release_job(wj); return nullptr;
        }
        if (plan.is_dynamic) {
            if (end - p < 12) { zn::release_job(wj); return nullptr; }
            plan.best_mask = (int32_t)rd_u32(p);
            plan.n_lit = (int32_t)rd_u32(p);
            plan.n_off = (int32_t)rd_u32(p);
            const int64_t n_lens = (int64_t)plan.n_lit + plan.n_off;
            if (plan.n_lit < 0 || plan.n_off < 0 ||
                n_lens > (int64_t)(sizeof(plan.lens) / sizeof(plan.lens[0])) ||
                !read_encoder(p, end, plan.te) || end - p < n_lens) {
                zn::release_job(wj); return nullptr;
            }
            for (int64_t i = 0; i < n_lens; ++i) plan.lens[i] = *p++;
        } else {
            plan.best_mask = -1;
            plan.n_lit = plan.n_off = 0;
        }
    }
    return wj;
}

// -- v2 wire format: window bytes omitted (the stitcher reattaches them
// from the corpus it already holds) and the best-token array stored as
// walk-order (len, off) pairs only — ~1.5 B per corpus byte on text vs
// v1's 5 B. Token count is derived from the walk itself.
static const uint32_t kPlanMagic2 = 0x5A504C33;  // "ZPL3"

static int64_t count_walk_tokens(const zn::WindowJob* wj) {
    const int64_t n = (int64_t)wj->prev + wj->in_size;
    int64_t i = wj->prev, count = 0;
    while (i < n) {
        const int32_t len = wj->best[i * 2];
        i += len >= zn::kMinMatch ? len : 1;
        ++count;
    }
    return count;
}

int64_t zn_window_serialized_size_v2(void* job) {
    zn::WindowJob* wj = (zn::WindowJob*)job;
    int64_t sz = (int64_t)(4 + 12) + count_walk_tokens(wj) * 4;
    for (const zn::BlockPlan& plan : wj->plans) sz += plan_wire_size(plan);
    return sz;
}

int64_t zn_window_serialize_v2(void* job, uint8_t* out, int64_t cap) {
    zn::WindowJob* wj = (zn::WindowJob*)job;
    const int64_t need = zn_window_serialized_size_v2(job);
    if (cap < need) return -1;
    uint8_t* p = out;
    wr_u32(p, kPlanMagic2);
    wr_u32(p, (uint32_t)wj->prev);
    wr_u32(p, (uint32_t)wj->in_size);
    wr_u32(p, (uint32_t)wj->plans.size());
    const int64_t n = (int64_t)wj->prev + wj->in_size;
    for (int64_t i = wj->prev; i < n;) {
        const uint16_t len = wj->best[i * 2];
        wr_u16(p, len);
        wr_u16(p, wj->best[i * 2 + 1]);
        i += len >= zn::kMinMatch ? len : 1;
    }
    for (const zn::BlockPlan& plan : wj->plans) {
        wr_u32(p, (uint32_t)plan.start);
        wr_u32(p, (uint32_t)plan.size);
        *p++ = plan.is_dynamic ? 1 : 0;
        write_encoder(p, plan.lit);
        write_encoder(p, plan.off);
        if (plan.is_dynamic) {
            wr_u32(p, (uint32_t)plan.best_mask);
            wr_u32(p, (uint32_t)plan.n_lit);
            wr_u32(p, (uint32_t)plan.n_off);
            write_encoder(p, plan.te);
            for (int32_t i = 0; i < plan.n_lit + plan.n_off; ++i)
                *p++ = (uint8_t)plan.lens[i];
        }
    }
    return p - out;
}

void* zn_window_deserialize_v2(const uint8_t* blob, int64_t size,
                               const uint8_t* window, int64_t window_n) {
    const uint8_t* p = blob;
    const uint8_t* end = blob + size;
    if (size < 16 || rd_u32(p) != kPlanMagic2) return nullptr;
    const int32_t prev = (int32_t)rd_u32(p);
    const int32_t in_size = (int32_t)rd_u32(p);
    const int32_t n_plans = (int32_t)rd_u32(p);
    const int64_t n = (int64_t)prev + in_size;
    if (prev < 0 || in_size < 0 || n_plans < 0 || n <= 0 || window_n != n)
        return nullptr;
    zn::WindowJob* wj = zn::acquire_job();
    wj->prev = prev;
    wj->in_size = in_size;
    wj->window.assign(window, window + n);
    wj->best.assign(n * 2, 0);
    for (int64_t i = prev; i < n;) {
        if (end - p < 4) { zn::release_job(wj); return nullptr; }
        const uint16_t len = (uint16_t)rd_u16(p);
        const uint16_t off = (uint16_t)rd_u16(p);
        wj->best[i * 2] = len;
        wj->best[i * 2 + 1] = off;
        i += len >= zn::kMinMatch ? len : 1;
    }
    wj->plans.resize(n_plans);
    for (zn::BlockPlan& plan : wj->plans) {
        if (end - p < 9) { zn::release_job(wj); return nullptr; }
        plan.start = (int32_t)rd_u32(p);
        plan.size = (int32_t)rd_u32(p);
        plan.is_dynamic = *p++ != 0;
        if (!read_encoder(p, end, plan.lit) || !read_encoder(p, end, plan.off)) {
            zn::release_job(wj); return nullptr;
        }
        if (plan.is_dynamic) {
            if (end - p < 12) { zn::release_job(wj); return nullptr; }
            plan.best_mask = (int32_t)rd_u32(p);
            plan.n_lit = (int32_t)rd_u32(p);
            plan.n_off = (int32_t)rd_u32(p);
            const int64_t n_lens = (int64_t)plan.n_lit + plan.n_off;
            if (plan.n_lit < 0 || plan.n_off < 0 ||
                n_lens > (int64_t)(sizeof(plan.lens) / sizeof(plan.lens[0])) ||
                !read_encoder(p, end, plan.te) || end - p < n_lens) {
                zn::release_job(wj); return nullptr;
            }
            for (int64_t i = 0; i < n_lens; ++i) plan.lens[i] = *p++;
        } else {
            plan.best_mask = -1;
            plan.n_lit = plan.n_off = 0;
        }
    }
    return wj;
}

} // extern "C"
