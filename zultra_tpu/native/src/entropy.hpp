// Entropy layer of the native engine: bit writer, Huffman encoder
// (Moffat–Katajainen lengths, Kraft limiting, canonical codes), the
// CL-table RLE walk and the Zopfli-style histogram rewrite.
//
// Fresh implementation with the same decision semantics as
// zultra_tpu/huffman.py + bitwriter.py (which are byte-parity-validated
// against the reference zultra binary; see reference
// src/huffman/huffencoder.c, huffutils.c, bitwriter.c for the origins of
// each rule).
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>

namespace zn {

constexpr int kMaxSymbols = 288;
constexpr int kNumCodeLenSyms = 19;
constexpr int kMaxCodesMask = 31;

// RFC 1951 section 3.2.7 transmission order of CL symbols.
constexpr int16_t kCodeLenSymOrder[kNumCodeLenSyms] = {
    16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15};

// ---------------------------------------------------------------------------
// Bit writer: LSB-first, ≤16 bits per put, byte-granular offset.
// ---------------------------------------------------------------------------

struct BitWriter {
    uint8_t* out = nullptr;
    int64_t cap = 0;
    int64_t offset = 0;
    uint32_t bits_data = 0;
    int32_t bits_count = 0;
    bool overflow = false;

    bool put_bits(uint32_t value, int32_t nbits) {
        bits_data |= value << bits_count;
        bits_count += nbits;
        while (bits_count >= 8) {
            if (offset >= cap) { overflow = true; return false; }
            out[offset++] = (uint8_t)bits_data;
            bits_data >>= 8;
            bits_count -= 8;
        }
        return true;
    }

    bool flush_bits() {
        if (bits_count > 0) {
            if (offset >= cap) { overflow = true; return false; }
            out[offset++] = (uint8_t)(bits_data & ((1u << bits_count) - 1));
            bits_data = 0;
            bits_count = 0;
        }
        return true;
    }

    bool put_bytes(const uint8_t* data, int64_t n) {
        if (offset + n > cap) { overflow = true; return false; }
        std::memcpy(out + offset, data, (size_t)n);
        offset += n;
        return true;
    }
};

// ---------------------------------------------------------------------------
// Huffman encoder
// ---------------------------------------------------------------------------

struct HuffEncoder {
    int32_t n_symbols = 0;
    int32_t max_code_length = 0;
    int32_t entropy[kMaxSymbols];
    uint32_t code_word[kMaxSymbols];
    int32_t code_length[kMaxSymbols];

    void init(int32_t symbols, int32_t max_len) {
        n_symbols = symbols;
        max_code_length = max_len;
        std::memset(entropy, 0, sizeof(entropy));
        std::memset(code_word, 0, sizeof(code_word));
        std::memset(code_length, 0, sizeof(code_length));
    }

    // Sort indices ascending by (key[idx], idx) — the canonical total order
    // every tie-break in this codec derives from.
    template <typename Key>
    static void order_by(int32_t* idx, int32_t count, const Key* key) {
        std::sort(idx, idx + count, [key](int32_t a, int32_t b) {
            if (key[a] != key[b]) return key[a] < key[b];
            return a < b;
        });
    }

    // Moffat–Katajainen in-place minimum-redundancy code lengths over the
    // used symbols; no length limiting here.
    void estimate_dynamic_codelens() {
        int32_t queue[kMaxSymbols];
        int64_t a[kMaxSymbols];
        int32_t used = 0;
        for (int32_t i = 0; i < n_symbols; ++i)
            if (entropy[i]) queue[used++] = i;

        if (used > 1) {
            order_by(queue, used, entropy);
            for (int32_t i = 0; i < used; ++i) a[i] = entropy[queue[i]];

            const int32_t n = used;
            int32_t leaf = 0, internal = 0;
            for (int32_t t = 0; t < n - 1; ++t) {
                int64_t w;
                if (leaf >= n || (internal < t && a[internal] < a[leaf])) {
                    w = a[internal];
                    a[internal++] = t + 1;
                } else {
                    w = a[leaf++];
                }
                if (leaf >= n || (internal < t && a[internal] < a[leaf])) {
                    w += a[internal];
                    a[internal++] = t + 1;
                } else {
                    w += a[leaf++];
                }
                a[t] = w;
            }
            a[n - 2] = 0;
            for (int32_t t = n - 3; t >= 0; --t) a[t] = a[a[t] - 1] + 1;

            int32_t avail = 1, seen = 0, depth = 0, next = n - 1, t = n - 2;
            while (avail > 0) {
                while (t >= 0 && a[t] == depth) { ++seen; --t; }
                while (avail > seen) { a[next--] = depth; --avail; }
                avail = seen << 1;
                ++depth;
                seen = 0;
            }

            std::memset(code_length, 0, sizeof(code_length));
            for (int32_t i = 0; i < used; ++i) code_length[queue[i]] = (int32_t)a[i];
        } else {
            // ≤1 used symbol: a single 1-bit code pinned to symbol 0
            // (mirrors the reference quirk; the used symbol keeps length 0).
            std::memset(code_length, 0, sizeof(code_length));
            code_length[0] = 1;
        }
    }

    static uint32_t reverse_bits16(uint32_t w, int32_t nbits) {
        w = ((w & 0x5555u) << 1) | ((w & 0xAAAAu) >> 1);
        w = ((w & 0x3333u) << 2) | ((w & 0xCCCCu) >> 2);
        w = ((w & 0x0F0Fu) << 4) | ((w & 0xF0F0u) >> 4);
        w = ((w & 0x00FFu) << 8) | ((w & 0xFF00u) >> 8);
        return w >> (16 - nbits);
    }

    void issue_canonical(const int32_t* order, int32_t count) {
        if (count <= 0) return;
        uint32_t word = 0;
        int32_t length = code_length[order[0]];
        for (int32_t i = 0; i < count; ++i) {
            code_word[order[i]] = reverse_bits16(word, length);
            if (i + 1 < count) {
                int32_t next_length = code_length[order[i + 1]];
                word = (word + 1) << (next_length - length);
                length = next_length;
            }
        }
    }

    void build_static_codewords() {
        int32_t queue[kMaxSymbols];
        std::iota(queue, queue + n_symbols, 0);
        order_by(queue, n_symbols, code_length);
        issue_canonical(queue, n_symbols);
    }

    void build_dynamic_codewords() {
        estimate_dynamic_codelens();

        int32_t queue[kMaxSymbols];
        int32_t used = 0;
        for (int32_t i = 0; i < n_symbols; ++i)
            if (code_length[i]) queue[used++] = i;

        if (used > 0 && max_code_length > 0) {
            order_by(queue, used, code_length);
            const int32_t max_len = max_code_length;
            if (code_length[queue[used - 1]] > max_len) {
                // Clamp, then repair the Kraft sum: lengthen rarest codes,
                // then re-shorten the most frequent ones if room remains.
                int64_t kraft = 0;
                const int64_t full = 1ll << max_len;
                for (int32_t i = used - 1; i >= 0; --i) {
                    int32_t sym = queue[i];
                    if (code_length[sym] > max_len) code_length[sym] = max_len;
                    kraft += full >> code_length[sym];
                }
                for (int32_t i = used - 1; kraft > full && i >= 0; --i) {
                    int32_t sym = queue[i];
                    while (code_length[sym] < max_len && kraft > full) {
                        ++code_length[sym];
                        kraft -= full >> code_length[sym];
                    }
                }
                for (int32_t i = 0; kraft < full && i < used; ++i) {
                    int32_t sym = queue[i];
                    while (kraft + (full >> code_length[sym]) <= full) {
                        kraft += full >> code_length[sym];
                        --code_length[sym];
                    }
                }
                order_by(queue, used, code_length);
            }
        }
        issue_canonical(queue, used);
    }

    bool write_codeword(int32_t symbol, BitWriter& bw) const {
        return bw.put_bits(code_word[symbol], code_length[symbol]);
    }

    int32_t raw_table_size() const {
        int32_t i = n_symbols;
        while (i > 4 && !code_length[kCodeLenSymOrder[i - 1]]) --i;
        return i;
    }

    int32_t defined_var_lengths_count(int32_t min_symbols) const {
        int32_t i = n_symbols;
        while (i > min_symbols && !code_length[i - 1]) --i;
        return i;
    }
};

// ---------------------------------------------------------------------------
// CL-table RLE walk (one template walk, three uses: count/cost/emit).
// Run segmentation and the run-of-7/8 special cases follow the reference
// exactly (see zultra_tpu/huffman.py _walk_var_lengths).
// ---------------------------------------------------------------------------

template <typename OnLit, typename On16, typename On17, typename On18>
inline void walk_var_lengths(const int32_t* code_lengths, int32_t n, uint32_t mask,
                             OnLit&& on_lit, On16&& on16, On17&& on17, On18&& on18) {
    int32_t i = 0;
    while (i < n) {
        int32_t run = 1;
        while (i + run < n && code_lengths[i + run] == code_lengths[i]) ++run;

        if (code_lengths[i] == 0) {
            if (run >= 3) {
                while (run >= 11 && (mask & 4)) {
                    int32_t chunk = run > 138 ? 138 : run;
                    on18(chunk);
                    run -= chunk;
                    i += chunk;
                }
                while (run >= 3 && (mask & 2)) {
                    int32_t chunk = run > 10 ? 10 : run;
                    on17(chunk);
                    run -= chunk;
                    i += chunk;
                }
                if (run) { on_lit(code_lengths[i]); ++i; }
            } else {
                on_lit(code_lengths[i]);
                ++i;
            }
        } else {
            int32_t len = code_lengths[i] > 15 ? 15 : code_lengths[i];
            on_lit(len);
            ++i;
            --run;
            if (run == 7 && (mask & 1) && !(mask & 8)) {
                on16(4); run -= 4; i += 4;
                on16(3); run -= 3; i += 3;
            } else if (run == 8 && (mask & 1) && !(mask & 16)) {
                on16(4); run -= 4; i += 4;
                on16(4); run -= 4; i += 4;
            }
            while (run >= 3 && (mask & 1)) {
                int32_t chunk = run > 6 ? 6 : run;
                on16(chunk);
                run -= chunk;
                i += chunk;
            }
        }
    }
}

inline void update_var_lengths_entropy(HuffEncoder& te, int32_t n, const int32_t* lens, uint32_t mask) {
    walk_var_lengths(lens, n, mask,
        [&](int32_t l) { te.entropy[l]++; },
        [&](int32_t) { te.entropy[16]++; },
        [&](int32_t) { te.entropy[17]++; },
        [&](int32_t) { te.entropy[18]++; });
}

inline int64_t get_var_lengths_size(const HuffEncoder& te, int32_t n, const int32_t* lens, uint32_t mask) {
    int64_t bits = 0;
    walk_var_lengths(lens, n, mask,
        [&](int32_t l) { bits += te.code_length[l]; },
        [&](int32_t) { bits += te.code_length[16] + 2; },
        [&](int32_t) { bits += te.code_length[17] + 3; },
        [&](int32_t) { bits += te.code_length[18] + 7; });
    return bits;
}

inline bool write_var_lengths(const HuffEncoder& te, int32_t n, const int32_t* lens, uint32_t mask, BitWriter& bw) {
    walk_var_lengths(lens, n, mask,
        [&](int32_t l) { te.write_codeword(l, bw); },
        [&](int32_t chunk) { te.write_codeword(16, bw); bw.put_bits(chunk - 3, 2); },
        [&](int32_t chunk) { te.write_codeword(17, bw); bw.put_bits(chunk - 3, 3); },
        [&](int32_t chunk) { te.write_codeword(18, bw); bw.put_bits(chunk - 11, 7); });
    return !bw.overflow;
}

// ---------------------------------------------------------------------------
// Zopfli-style histogram rewrite for RLE-friendlier code length tables.
// ---------------------------------------------------------------------------

inline void optimize_histogram_for_rle(int32_t length, int32_t* counts) {
    while (length >= 0) {
        if (length == 0) return;
        if (counts[length - 1] != 0) break;
        --length;
    }

    bool good_for_rle[kMaxSymbols] = {false};
    int32_t symbol = counts[0];
    int32_t stride = 0;
    for (int32_t i = 0; i <= length; ++i) {
        if (i == length || counts[i] != symbol) {
            if ((symbol == 0 && stride >= 5) || (symbol != 0 && stride >= 7))
                for (int32_t k = 0; k < stride; ++k) good_for_rle[i - k - 1] = true;
            stride = 1;
            if (i != length) symbol = counts[i];
        } else {
            ++stride;
        }
    }

    stride = 0;
    int64_t limit = counts[0];
    int64_t sum = 0;
    for (int32_t i = 0; i <= length; ++i) {
        bool boundary = (i == length) || good_for_rle[i] ||
            (counts[i] > limit ? counts[i] - limit : limit - counts[i]) >= 4;
        if (boundary) {
            if (stride >= 4 || (stride >= 3 && sum == 0)) {
                int64_t count = (sum + stride / 2) / stride;
                if (count < 1) count = 1;
                if (sum == 0) count = 0;
                for (int32_t k = 0; k < stride; ++k) counts[i - k - 1] = (int32_t)count;
            }
            stride = 0;
            sum = 0;
            if (i < length - 3)
                limit = (counts[i] + counts[i + 1] + counts[i + 2] + counts[i + 3] + 2) / 4;
            else if (i < length)
                limit = counts[i];
            else
                limit = 0;
        }
        ++stride;
        if (i != length) sum += counts[i];
    }
}

} // namespace zn
