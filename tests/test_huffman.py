"""Unit tests for the entropy layer: Moffat–Katajainen code lengths vs a
heap-based Huffman oracle, Kraft validity of length-limited codes,
canonical codeword prefix-freeness, and the CL RLE walk."""

import heapq
import itertools

import numpy as np
import pytest

from zultra_tpu.bitwriter import BitWriter
from zultra_tpu.huffman import (
    HuffmanEncoder,
    get_var_lengths_size,
    make_tables_encoder,
    moffat_katajainen_code_lengths,
    optimize_histogram_for_rle,
    update_var_lengths_entropy,
    write_var_lengths,
)


def huffman_cost_oracle(freqs):
    """Total weighted path length of an optimal binary prefix code."""
    heap = list(freqs)
    heapq.heapify(heap)
    cost = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    return cost


@pytest.mark.parametrize("seed", range(20))
def test_mk_lengths_are_optimal(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(2, 80))
    freqs = sorted(int(x) for x in rng.randint(1, 10000, n))
    lengths = moffat_katajainen_code_lengths(freqs)
    # Optimal total cost
    assert sum(f * l for f, l in zip(freqs, lengths)) == huffman_cost_oracle(freqs)
    # Complete Kraft sum
    assert sum(2.0 ** -l for l in lengths) == pytest.approx(1.0)
    # Monotone: rarer symbols never get shorter codes
    assert all(lengths[i] >= lengths[i + 1] for i in range(n - 1))


@pytest.mark.parametrize("seed", range(10))
def test_limited_codes_are_valid(seed):
    rng = np.random.RandomState(100 + seed)
    enc = HuffmanEncoder(288, 15, 0)
    # Skewed distribution to force length limiting
    n_used = int(rng.randint(30, 288))
    for i in range(n_used):
        enc.entropy[i] = int(rng.geometric(1e-4)) if rng.rand() < 0.3 else int(rng.randint(1, 5))
    enc.build_dynamic_codewords()
    used = [i for i in range(288) if enc.code_length[i]]
    assert all(enc.code_length[i] <= 15 for i in used)
    # Complete code (zlib requires it)
    assert sum(2.0 ** -enc.code_length[i] for i in used) == pytest.approx(1.0)
    # Canonical codewords are prefix-free: check via decoding table
    codes = {}
    for i in used:
        # bit-reversed storage; reconstruct MSB-first string
        word = enc.code_word[i]
        bits = "".join(str((word >> k) & 1) for k in range(enc.code_length[i]))
        codes[i] = bits
    assert len(set(codes.values())) == len(codes)
    for a, b in itertools.combinations(codes.values(), 2):
        assert not a.startswith(b) and not b.startswith(a)


def test_single_symbol_quirk():
    """Zero or one used symbols assign a 1-bit code to symbol 0 regardless
    (reference huffencoder.c:263-267)."""
    enc = HuffmanEncoder(288, 15, 0)
    enc.entropy[256] = 5
    enc.estimate_dynamic_codelens()
    assert enc.code_length[0] == 1
    assert enc.code_length[256] == 0


def test_rle_walk_roundtrip():
    """The cost walk must equal the bits actually written, for every mask."""
    rng = np.random.RandomState(7)
    code_lengths = []
    while len(code_lengths) < 300:
        run = int(rng.randint(1, 20))
        val = int(rng.choice([0, 0, 3, 5, 7, 9, 12]))
        code_lengths += [val] * run
    code_lengths = code_lengths[:300]

    mask = 0
    while mask <= 31:
        tables = make_tables_encoder()
        update_var_lengths_entropy(tables, len(code_lengths), code_lengths, mask)
        tables.build_dynamic_codewords()
        cost = get_var_lengths_size(tables, len(code_lengths), code_lengths, mask)
        out = bytearray(4096)
        writer = BitWriter(out)
        write_var_lengths(tables, len(code_lengths), code_lengths, mask, writer)
        bits_written = writer.offset * 8 + writer.bits_count
        assert bits_written == cost, f"mask {mask}"
        mask = mask + 2 if mask >= 7 else mask + 1


def test_optimize_for_rle_preserves_zeros():
    counts = [5, 5, 5, 5, 0, 0, 0, 0, 0, 0]
    optimize_histogram_for_rle(10, counts)
    # Trailing zeros must remain zero (no invalid symbols added).
    assert counts[4:] == [0] * 6
