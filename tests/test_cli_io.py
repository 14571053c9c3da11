"""CLI + I/O engine black-box tests — the analog of the reference's
shell suites (tests/test-lz4-basic.sh etc., SURVEY.md §4.2) run
in-process against lz4_tpu.cli.main.
"""
import os
import struct
import subprocess
import sys

import pytest

from conftest import needs_oracle
import ref_oracle
from lz4_tpu.cli import main as cli_main
from lz4_tpu.io.engine import SparseWriter, list_frames
from lz4_tpu.utils.datagen import gen_buffer, mixed_corpus


@pytest.fixture
def corpus(tmp_path):
    p = tmp_path / "data.bin"
    p.write_bytes(mixed_corpus(200000, seed=77))
    return p


def run_cli(*args):
    return cli_main(["lz4-tpu", "--backend", "host", *map(str, args)])


def test_compress_decompress_roundtrip(corpus, tmp_path):
    assert run_cli("-f", corpus) == 0
    lz4f = str(corpus) + ".lz4"
    assert os.path.exists(lz4f)
    out = tmp_path / "out.bin"
    assert run_cli("-d", "-f", lz4f, out) == 0
    assert out.read_bytes() == corpus.read_bytes()


def test_levels_and_flags(corpus, tmp_path):
    sizes = {}
    for flags in (["-1"], ["-9"], ["--fast=8"], ["-BD"], ["-B7"],
                  ["-BX"], ["--no-frame-crc"], ["--content-size"]):
        dst = tmp_path / ("x" + "".join(f.strip("-=") for f in flags)
                          + ".lz4")
        assert run_cli("-f", *flags, corpus, dst) == 0
        out = tmp_path / "rt.bin"
        assert run_cli("-d", "-f", dst, out) == 0
        assert out.read_bytes() == corpus.read_bytes()
        sizes[tuple(flags)] = dst.stat().st_size
    assert sizes[("-9",)] < sizes[("-1",)]          # HC compresses harder
    assert sizes[("-BD",)] <= sizes[("-1",)]        # linked helps


def test_test_mode_and_errors(corpus, tmp_path):
    assert run_cli("-f", corpus) == 0
    lz4f = str(corpus) + ".lz4"
    assert run_cli("-t", lz4f) == 0
    # corrupting a payload byte must fail the checksum/test
    blob = bytearray(open(lz4f, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    bad = tmp_path / "bad.lz4"
    bad.write_bytes(blob)
    with pytest.raises(SystemExit):
        run_cli("-t", bad)


def test_multiple_and_recursive(tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.bin").write_bytes(gen_buffer(5000, seed=i))
    assert run_cli("-r", "-f", d) == 0
    for i in range(3):
        assert (d / f"f{i}.bin.lz4").exists()


def test_legacy_format(corpus, tmp_path):
    dst = tmp_path / "leg.lz4"
    assert run_cli("-l", "-f", corpus, dst) == 0
    magic = struct.unpack("<I", dst.read_bytes()[:4])[0]
    assert magic == 0x184C2102
    out = tmp_path / "leg.out"
    assert run_cli("-d", "-f", dst, out) == 0
    assert out.read_bytes() == corpus.read_bytes()


def test_dictionary_cli(tmp_path):
    base = gen_buffer(65536, match_prob=0.8, seed=4)
    dict_p = tmp_path / "dict.bin"
    dict_p.write_bytes(base)
    data_p = tmp_path / "data.bin"
    data_p.write_bytes(base[:30000] + gen_buffer(10000, seed=5))
    plain = tmp_path / "plain.lz4"
    withd = tmp_path / "withd.lz4"
    assert run_cli("-f", data_p, plain) == 0
    assert run_cli("-f", "-D", dict_p, data_p, withd) == 0
    assert withd.stat().st_size < plain.stat().st_size
    out = tmp_path / "rt.bin"
    assert run_cli("-d", "-f", "-D", dict_p, withd, out) == 0
    assert out.read_bytes() == data_p.read_bytes()


def test_sparse_writer(tmp_path):
    payload = b"A" * 100 + b"\x00" * 100000 + b"B" * 100
    p = tmp_path / "sparse.bin"
    with open(p, "wb") as f:
        w = SparseWriter(f)
        for i in range(0, len(payload), 7777):
            w.write(payload[i: i + 7777])
        w.close()
    assert p.read_bytes() == payload


def test_list_frames(corpus, tmp_path):
    assert run_cli("-f", "--content-size", corpus) == 0
    frames = list_frames(str(corpus) + ".lz4")
    assert len(frames) == 1
    assert frames[0].frame_type == "LZ4Frame"
    assert frames[0].content_size == corpus.stat().st_size


def test_skippable_passthrough(tmp_path, corpus):
    from lz4_tpu.frame.writer import compress_frame, write_skippable_frame
    data = corpus.read_bytes()
    blob = write_skippable_frame(b"metadata!") + compress_frame(data)
    src = tmp_path / "skip.lz4"
    src.write_bytes(blob)
    out = tmp_path / "skip.out"
    assert run_cli("-d", "-f", src, out) == 0
    assert out.read_bytes() == data


@needs_oracle
def test_cli_interop_both_ways(corpus, tmp_path):
    # ours -> reference
    ours = tmp_path / "ours.lz4"
    assert run_cli("-f", corpus, ours) == 0
    r = ref_oracle.ref_cli(["-d", "-f", str(ours), str(tmp_path / "a.out")])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "a.out").read_bytes() == corpus.read_bytes()
    # reference -> ours (with block checksums + content size)
    refz = tmp_path / "ref.lz4"
    r = ref_oracle.ref_cli(["-9", "-BX", "--content-size", "-f",
                            str(corpus), str(refz)])
    assert r.returncode == 0, r.stderr
    out = tmp_path / "b.out"
    assert run_cli("-d", "-f", refz, out) == 0
    assert out.read_bytes() == corpus.read_bytes()


def test_fast_launcher_roundtrip(tmp_path):
    """scripts/lz4-tpu (-S fast-start) compresses and decompresses a
    real frame end-to-end in a fresh process."""
    import shutil
    launcher = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "lz4-tpu")
    if not (os.path.exists(launcher) and shutil.which("sh")):
        pytest.skip("launcher or sh unavailable")
    src = tmp_path / "f.bin"
    src.write_bytes(b"launcher smoke " * 4000)
    lz4f = tmp_path / "f.bin.lz4"
    out = tmp_path / "f.out"
    env = dict(os.environ)
    r = subprocess.run(["sh", launcher, "-1", "-f", "-q", str(src),
                        str(lz4f)], env=env, capture_output=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(["sh", launcher, "-d", "-f", "-q", str(lz4f),
                        str(out)], env=env, capture_output=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == src.read_bytes()
