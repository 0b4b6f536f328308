"""Container checksums as mesh-friendly reductions.

Adler-32 over a byte shard is a pair of sums:
    a = 1 + Σ b_i                 (mod 65521)
    b = len + Σ (len - i) · b_i   (mod 65521)
and two shards combine associatively:
    a = a1 + a2 - 1
    b = b1 + b2 - 1 + (a1 - 1) · len2        (all mod 65521)
so per-shard (a, b, len) triples reduce with psum-style tree combines over
ICI; the device-side work is two jnp reductions.

CRC-32 distributes through its GF(2) structure:
    crc(s1 || s2) = shift(crc(s1), len2) XOR crc(0-prefix || s2)
where shift is multiplication by x^(8·len2) in GF(2)[x]/poly — a 32×32
bit-matrix power. ``crc32_combine`` mirrors zlib's crc32_combine so
shards hash independently (host zlib at GB/s or on-device) and reduce in
log(num_shards) combines.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np

ADLER_BASE = 65521


_ADLER_CHUNK = 2048  # keeps per-chunk weighted sums within int32


@jax.jit
def _adler_chunk_sums(chunks: jnp.ndarray):
    """Per-chunk (Σ b, Σ (L-i)·b) — the O(n) device work. With chunk
    length 2048 the weighted sum is ≤ 255·L(L+1)/2 ≈ 5.4e8 < 2^31."""
    b = chunks.astype(jnp.int32)
    s1 = jnp.sum(b, axis=1)
    weights = jnp.arange(chunks.shape[1], 0, -1, dtype=jnp.int32)
    s2 = jnp.sum(b * weights[None, :], axis=1)
    return s1, s2


def adler32_jax(data, value: int = 1) -> int:
    """Adler-32 of a byte array: per-chunk sums on device, O(n/2048)
    modular combine on the host. ``value`` is the running checksum
    (1 for a fresh stream), like zlib.adler32."""
    arr = np.asarray(data, dtype=np.uint8)
    n = int(arr.shape[0])
    if n == 0:
        return value
    m = -(-n // _ADLER_CHUNK)
    padded = np.zeros(m * _ADLER_CHUNK, dtype=np.uint8)
    padded[:n] = arr
    s1, s2 = _adler_chunk_sums(jnp.asarray(padded.reshape(m, _ADLER_CHUNK)))
    s1 = np.asarray(s1, dtype=np.int64) % ADLER_BASE
    s2 = np.asarray(s2, dtype=np.int64) % ADLER_BASE
    # Byte g = c·L + i has global weight n - g = (n - (c+1)·L) + (L - i):
    # the local weighted sum s2_c plus a per-chunk constant times s1_c
    # (zero padding contributes nothing to either local sum).
    diffs = (n - np.arange(1, m + 1, dtype=np.int64) * _ADLER_CHUNK) % ADLER_BASE
    a = int(np.sum(s1) % ADLER_BASE)
    weighted = int(np.sum(s2 + diffs * s1) % ADLER_BASE)
    shard_b = (weighted + n) % ADLER_BASE
    shard = (shard_b << 16) | ((a + 1) % ADLER_BASE)
    return adler32_combine(value, shard, n)


def adler32_combine(adler1: int, adler2: int, len2: int) -> int:
    """Combine adler32(seq1) and adler32(seq2) into adler32(seq1||seq2)."""
    a1, b1 = adler1 & 0xFFFF, (adler1 >> 16) & 0xFFFF
    a2, b2 = adler2 & 0xFFFF, (adler2 >> 16) & 0xFFFF
    a = (a1 + a2 - 1) % ADLER_BASE
    b = (b1 + b2 + (a1 - 1) * (len2 % ADLER_BASE)) % ADLER_BASE
    return (b << 16) | a


# -- CRC-32 GF(2) combine ----------------------------------------------------

_CRC_POLY = 0xEDB88320


def _gf2_matrix_times(mat, vec):
    total = 0
    i = 0
    while vec:
        if vec & 1:
            total ^= mat[i]
        vec >>= 1
        i += 1
    return total


def _gf2_matrix_square(square, mat):
    for i in range(32):
        square[i] = _gf2_matrix_times(mat, mat[i])


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc32(seq1||seq2) from crc32(seq1), crc32(seq2), len(seq2).
    Same GF(2) matrix-power method as zlib's crc32_combine."""
    if len2 <= 0:
        return crc1
    even = [0] * 32
    odd = [0] * 32

    odd[0] = _CRC_POLY
    row = 1
    for i in range(1, 32):
        odd[i] = row
        row <<= 1

    _gf2_matrix_square(even, odd)
    _gf2_matrix_square(odd, even)

    while True:
        _gf2_matrix_square(even, odd)
        if len2 & 1:
            crc1 = _gf2_matrix_times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        _gf2_matrix_square(odd, even)
        if len2 & 1:
            crc1 = _gf2_matrix_times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break

    return crc1 ^ crc2


def crc32_sharded(shards) -> int:
    """CRC-32 of the concatenation of byte shards, each hashed
    independently (tree-combinable across hosts)."""
    crc = 0
    for shard in shards:
        crc = crc32_combine(crc, zlib.crc32(bytes(shard)) & 0xFFFFFFFF, len(shard))
    return crc
