// SA-IS suffix array construction (Nong, Zhang & Chan, "Two Efficient
// Algorithms for Linear Time Suffix Array Construction").
//
// Written from scratch for zultra_tpu's native engine. This replaces the
// role of libdivsufsort in the reference (src/libdivsufsort/) with a
// different algorithm family; the output permutation is identical because
// the suffix array of a string is unique.
#pragma once

#include <cstdint>
#include <cstring>
#include <type_traits>
#include <vector>

namespace zn {

namespace detail {

// Generic SA-IS over an integer sequence that ends with a unique smallest
// sentinel (s[n-1] is strictly smaller than every other element).
template <typename T>
void sais_with_sentinel(const T* s, int32_t* sa, int32_t n, int32_t alphabet_size) {
    if (n == 1) { sa[0] = 0; return; }

    // Symbol + type bit fused into one word so the induce loops issue ONE
    // data-dependent load per entry instead of two (symbol and type hit
    // different cache lines as separate arrays). The backward type scan
    // writes comb directly; there is no standalone type array.
    using U = typename std::make_unsigned<T>::type;
    constexpr U kTypeBit = (U)1 << (sizeof(U) * 8 - 1);
    constexpr U kSymMask = kTypeBit - 1;
    std::vector<U> comb(n);
    comb[n - 1] = (U)s[n - 1] | kTypeBit;
    for (int32_t i = n - 2; i >= 0; --i) {
        U t;
        if (s[i] < s[i + 1]) t = kTypeBit;
        else if (s[i] > s[i + 1]) t = 0;
        else t = comb[i + 1] & kTypeBit;
        comb[i] = (U)s[i] | t;
    }
    auto is_lms = [&](int32_t i) {
        return i > 0 && (comb[i] & kTypeBit) && !(comb[i - 1] & kTypeBit);
    };

    std::vector<int32_t> bucket_count(alphabet_size, 0);
    for (int32_t i = 0; i < n; ++i) bucket_count[s[i]]++;
    std::vector<int32_t> bucket_heads(alphabet_size), bucket_tails(alphabet_size);
    auto reset_heads = [&] {
        int32_t acc = 0;
        for (int32_t c = 0; c < alphabet_size; ++c) { bucket_heads[c] = acc; acc += bucket_count[c]; }
    };
    auto reset_tails = [&] {
        int32_t acc = 0;
        for (int32_t c = 0; c < alphabet_size; ++c) { acc += bucket_count[c]; bucket_tails[c] = acc; }
    };

    auto induce = [&](const std::vector<int32_t>& lms_order) {
        std::memset(sa, -1, sizeof(int32_t) * n);
        // Seed: LMS suffixes at their bucket tails, in the given order
        // (walked backward so earlier entries land closer to the tail).
        reset_tails();
        for (int32_t k = (int32_t)lms_order.size() - 1; k >= 0; --k) {
            int32_t p = lms_order[k];
            sa[--bucket_tails[s[p]]] = p;
        }
        // Induce L-type suffixes left to right.
        reset_heads();
        for (int32_t i = 0; i < n; ++i) {
            int32_t p = sa[i];
            if (i + 4 < n && sa[i + 4] > 0) __builtin_prefetch(&comb[sa[i + 4] - 1]);
            if (p > 0) {
                const U c = comb[p - 1];
                if (!(c & kTypeBit)) sa[bucket_heads[c]++] = p - 1;
            }
        }
        // Induce S-type suffixes right to left.
        reset_tails();
        for (int32_t i = n - 1; i >= 0; --i) {
            int32_t p = sa[i];
            if (i - 4 >= 0 && sa[i - 4] > 0) __builtin_prefetch(&comb[sa[i - 4] - 1]);
            if (p > 0) {
                const U c = comb[p - 1];
                if (c & kTypeBit) sa[--bucket_tails[c & kSymMask]] = p - 1;
            }
        }
    };

    // Pass 1: induce from unsorted LMS positions to sort LMS substrings.
    std::vector<int32_t> lms_positions;
    lms_positions.reserve(n / 2 + 1);
    for (int32_t i = 1; i < n; ++i)
        if (is_lms(i)) lms_positions.push_back(i);
    int32_t n_lms = (int32_t)lms_positions.size();
    if (n_lms == 0) {
        // Strictly decreasing string: SA is the reverse identity... but the
        // sentinel is always S-type and position n-1 preceded by L is LMS,
        // so this only happens for n == 1 handled above. Defensive:
        induce({});
        return;
    }

    induce(lms_positions);

    // Name sorted LMS substrings.
    std::vector<int32_t> sorted_lms;
    sorted_lms.reserve(n_lms);
    for (int32_t i = 0; i < n; ++i)
        if (is_lms(sa[i])) sorted_lms.push_back(sa[i]);

    // Two LMS positions are never adjacent (an LMS needs an L before an S),
    // so names can live at position>>1 — half the footprint. (The vector
    // still value-initializes; only the footprint halving is claimed. Every
    // slot read below is written first, so the zero-fill is semantically
    // unnecessary but cheap relative to the induce passes.)
    std::vector<int32_t> name_of(n / 2 + 1);
    int32_t name_count = 0;
    int32_t prev = -1;
    for (int32_t k = 0; k < n_lms; ++k) {
        int32_t cur = sorted_lms[k];
        bool differs = (prev < 0);
        if (!differs) {
            // Compare LMS substrings at prev and cur (ends at next LMS incl.)
            for (int32_t d = 0;; ++d) {
                bool prev_end = d > 0 && is_lms(prev + d);
                bool cur_end = d > 0 && is_lms(cur + d);
                if (prev_end && cur_end) break;
                if (prev_end != cur_end || s[prev + d] != s[cur + d]) { differs = true; break; }
            }
        }
        if (differs) { ++name_count; prev = cur; }
        name_of[cur >> 1] = name_count - 1;
    }

    // Order LMS suffixes.
    std::vector<int32_t> lms_rank(n_lms);
    for (int32_t k = 0; k < n_lms; ++k) lms_rank[k] = name_of[lms_positions[k] >> 1];

    std::vector<int32_t> lms_sorted_by_suffix(n_lms);
    if (name_count == n_lms) {
        for (int32_t k = 0; k < n_lms; ++k) lms_sorted_by_suffix[lms_rank[k]] = lms_positions[k];
    } else {
        // Recurse on the reduced string (its last element is the sentinel's
        // LMS name 0? — the sentinel position n-1 is LMS and its substring
        // is the unique smallest, so lms_rank.back() == 0 and is unique).
        std::vector<int32_t> sub_sa(n_lms);
        sais_with_sentinel(lms_rank.data(), sub_sa.data(), n_lms, name_count);
        for (int32_t k = 0; k < n_lms; ++k) lms_sorted_by_suffix[k] = lms_positions[sub_sa[k]];
    }

    induce(lms_sorted_by_suffix);
}

} // namespace detail

// Suffix array of a byte string (no sentinel requirement). Appends an
// internal sentinel by shifting the alphabet. The optional scratch
// vectors let callers reuse the two O(n) temporaries across invocations.
inline void suffix_array(const uint8_t* data, int32_t n, int32_t* sa,
                         std::vector<uint16_t>* s_scratch = nullptr,
                         std::vector<int32_t>* sa_scratch = nullptr) {
    if (n <= 0) return;
    if (n == 1) { sa[0] = 0; return; }
    std::vector<uint16_t> s_local;
    std::vector<int32_t> sa_local;
    // uint16 top-level text: values 0..256 fit, and the induce loops'
    // random loads then touch half the cache footprint of an int32 text.
    std::vector<uint16_t>& s = s_scratch ? *s_scratch : s_local;
    std::vector<int32_t>& sa_tmp = sa_scratch ? *sa_scratch : sa_local;
    s.resize(n + 1);
    sa_tmp.resize(n + 1);
    for (int32_t i = 0; i < n; ++i) s[i] = (uint16_t)(data[i] + 1);
    s[n] = 0;
    detail::sais_with_sentinel(s.data(), sa_tmp.data(), n + 1, 257);
    // Drop the sentinel suffix (always first).
    std::memcpy(sa, sa_tmp.data() + 1, sizeof(int32_t) * n);
}

} // namespace zn
