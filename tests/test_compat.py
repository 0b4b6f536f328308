"""zlib-style cooperative API tests."""

import zlib

import zultra_tpu as zt
from zultra_tpu.compat import OK, STREAM_END, ZultraStream, memory_compress


def test_compat_stream_drip(lz_corpus):
    data = lz_corpus["lz_16384_32_0.6"]
    expect = zt.compress(data, zt.FLAG_ZLIB_FRAMING)

    strm = ZultraStream(zt.FLAG_ZLIB_FRAMING)
    out = bytearray()
    # Feed in chunks, drain with a tiny avail_out budget.
    for i in range(0, len(data), 5000):
        strm.next_in = data[i : i + 5000]
        status, piece = strm.compress(zt.CONTINUE, max_out=777)
        out += piece
    while True:
        status, piece = strm.compress(zt.FINALIZE, max_out=777)
        out += piece
        if status == STREAM_END:
            break
    assert bytes(out) == expect
    assert strm.total_in == len(data)
    assert strm.total_out == len(expect)


def test_compat_memory_compress(lz_corpus):
    data = lz_corpus["lz_4096_3_0.9"]
    assert memory_compress(data, zt.FLAG_GZIP_FRAMING) == zt.compress(
        data, zt.FLAG_GZIP_FRAMING
    )


def test_compat_checksum_counter(lz_corpus):
    data = lz_corpus["lz_4096_256_0.2"]
    strm = ZultraStream(zt.FLAG_ZLIB_FRAMING)
    strm.next_in = data
    while strm.compress(zt.FINALIZE, max_out=4096)[0] != STREAM_END:
        pass
    assert strm.adler == zlib.adler32(data)


def test_emitter_bug_surfaces_not_stored(monkeypatch):
    """A real bug in the block emitter must raise, not be masked as a
    silent stored-block fallback (only BitWriterError means 'expanded')."""
    import pytest

    import zultra_tpu.stream as stream_mod
    from zultra_tpu.engine import SpecEngine

    def broken_block_deflate(*args, **kwargs):
        raise ValueError("synthetic emitter bug")

    monkeypatch.setattr(stream_mod, "block_deflate", broken_block_deflate)
    strm = stream_mod.Stream(0)
    strm.engine = SpecEngine()  # spec path reaches the Python emitter
    with pytest.raises(ValueError, match="synthetic emitter bug"):
        strm.compress(b"hello world, hello world", stream_mod.FINALIZE)
