"""CLI surface tests (compress/verify/bench/self-test/dictionary)."""

import subprocess
import sys
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, cwd="/tmp"):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "HOME": "/root"}
    return subprocess.run(
        [sys.executable, "-m", "zultra_tpu.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env,
    )


def test_cli_compress_verify(tmp_path):
    src = REPO / "README.md"
    out = tmp_path / "out.gz"
    result = run_cli(["-v", "-c", "-gzip", str(src), str(out)])
    assert result.returncode == 0, result.stderr
    assert "verified OK" in result.stdout
    assert zlib.decompress(out.read_bytes(), 31) == src.read_bytes()


def test_cli_zlib_dictionary(tmp_path):
    src = REPO / "SURVEY.md"
    out = tmp_path / "out.zz"
    result = run_cli(["-zlib", "-D", str(src), "-c", str(src), str(out)])
    assert result.returncode == 0, result.stderr


def test_cli_dictionary_requires_zlib(tmp_path):
    result = run_cli(["-gzip", "-D", "x", str(REPO / "README.md"), str(tmp_path / "o")])
    assert result.returncode != 0
    assert "zlib" in result.stderr


def test_cli_quicktest():
    result = run_cli(["-quicktest"])
    assert result.returncode == 0, result.stderr
    assert "self-tests passed" in result.stdout


def test_cli_usage_error():
    result = run_cli([])
    assert result.returncode != 0
    assert "usage" in result.stderr


def test_cli_output_matches_reference_cli(ref_binary, lz_corpus_large, tmp_path):
    """File-level byte parity between the two CLIs (both feed the stream
    in 16 KB chunks; sizes chosen to straddle chunk and window edges)."""
    import subprocess as sp

    base = b"".join(lz_corpus_large.values())
    for size in (48944, 16384 * 3, 16384 * 3 + 1, 1048576 + 5, len(base)):
        data = base[:size]
        src = tmp_path / f"in_{size}.bin"
        src.write_bytes(data)
        ref_out = tmp_path / f"ref_{size}.gz"
        my_out = tmp_path / f"my_{size}.gz"
        sp.run([str(ref_binary), "-gzip", str(src), str(ref_out)],
               check=True, capture_output=True)
        result = run_cli(["-gzip", str(src), str(my_out)])
        assert result.returncode == 0, result.stderr
        assert my_out.read_bytes() == ref_out.read_bytes(), size


def test_cli_empty_input_clean_error(tmp_path):
    """An empty input file exits with a clean error, not a traceback."""
    inp = tmp_path / "empty.bin"
    inp.write_bytes(b"")
    out = tmp_path / "empty.gz"
    r = subprocess.run(
        [sys.executable, "-m", "zultra_tpu.cli", "-gzip", str(inp), str(out)],
        capture_output=True, text=True, cwd=Path(__file__).resolve().parent.parent,
    )
    assert r.returncode == 100
    assert "Traceback" not in r.stderr
    assert "error compressing" in r.stderr
