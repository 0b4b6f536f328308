"""Native (C++) engine: stage-level cross-validation against the spec
engine and byte parity against the reference on larger corpora."""

import numpy as np
import pytest

import zultra_tpu as zt

try:
    from zultra_tpu import native
    from zultra_tpu.native import NativeEngine  # noqa: F401

    HAVE_NATIVE = True
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native library unavailable")


@pytest.mark.parametrize("seed", range(8))
def test_native_suffix_array_matches_numpy(seed):
    from zultra_tpu.suffix import suffix_array_numpy

    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 3000))
    alphabet = int(rng.choice([1, 2, 4, 256]))
    data = rng.randint(0, max(alphabet, 1), n).astype(np.uint8)
    assert np.array_equal(native.suffix_array(data), suffix_array_numpy(data))


@pytest.mark.parametrize("seed", range(4))
def test_native_match_table_matches_spec(seed):
    from zultra_tpu.matchfinder import find_all_matches

    rng = np.random.RandomState(100 + seed)
    n = int(rng.randint(500, 4000))
    start = int(rng.randint(0, n // 4))
    data = rng.randint(0, 7, n).astype(np.uint8)
    spec_table = find_all_matches(data, start, n)
    native_table = native.build_match_table(data, start).astype(np.int32)
    assert np.array_equal(spec_table[start:], native_table[start:])


def test_native_equals_spec_bytes(lz_corpus):
    """The two engines must emit identical streams."""
    for name in ("lz_16384_32_0.6", "lz_4096_3_0.9", "source_code"):
        data = lz_corpus[name]
        zt.set_engine("spec")
        spec_out = zt.compress(data, zt.FLAG_GZIP_FRAMING)
        zt.set_engine("native")
        native_out = zt.compress(data, zt.FLAG_GZIP_FRAMING)
        assert spec_out == native_out, name
    zt.set_engine("native")


def test_native_parity_large(ref_lib, lz_corpus_large):
    for name, data in lz_corpus_large.items():
        for flags in (zt.FLAG_GZIP_FRAMING, zt.FLAG_ZLIB_FRAMING):
            assert zt.compress(data, flags) == ref_lib.compress(data, flags), name


def test_native_parity_multiwindow(ref_lib, lz_corpus_large):
    data = b"".join(lz_corpus_large.values())  # several MB, mixed content
    ref = ref_lib.compress(data, zt.FLAG_GZIP_FRAMING)
    assert zt.compress(data, zt.FLAG_GZIP_FRAMING) == ref


def test_native_parity_small_block_multiwindow(ref_lib, lz_corpus_large):
    data = lz_corpus_large["lz_262144_256_0.2"]
    ref = ref_lib.compress(data, zt.FLAG_GZIP_FRAMING, max_block_size=32768)
    assert zt.compress(data, zt.FLAG_GZIP_FRAMING, 32768) == ref


def test_native_streaming_chunks(lz_corpus_large):
    data = lz_corpus_large["lz_65536_32_0.6"] * 3
    oneshot = zt.compress(data, zt.FLAG_ZLIB_FRAMING, max_block_size=65536)
    stream = zt.Stream(zt.FLAG_ZLIB_FRAMING, max_block_size=65536)
    out = bytearray()
    for i in range(0, len(data), 10000):
        out += stream.compress(data[i : i + 10000], zt.CONTINUE)
    out += stream.compress(b"", zt.FINALIZE)
    assert bytes(out) == oneshot


def test_threaded_compression_is_deterministic(lz_corpus_large):
    """The window pipeline + block threads must not introduce any
    nondeterminism: repeated runs emit identical bytes."""
    import zultra_tpu as zt

    data = b"".join(lz_corpus_large.values())
    first = zt.compress(data, zt.FLAG_GZIP_FRAMING, max_block_size=65536)
    for _ in range(2):
        assert zt.compress(data, zt.FLAG_GZIP_FRAMING, max_block_size=65536) == first
