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


def _walk_frame_blocks(path):
    """Yield (csize, is_uncompressed, payload) for each data block of a
    single-LZ4F-frame file (the checkFrame walk, tests/checkFrame.c)."""
    raw = path.read_bytes()
    from lz4_tpu.frame.format import parse_frame_header
    info, hlen = parse_frame_header(raw)
    pos = hlen
    while True:
        (word,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        if word == 0:
            return
        csize = word & 0x7FFFFFFF
        yield csize, bool(word >> 31), raw[pos: pos + csize]
        pos += csize
        if info.block_checksum:
            pos += 4


def test_custom_block_sizes(tmp_path):
    """-B#bytes analog of tests/test_custom_block_sizes.sh: exact byte
    sizes are honored end-to-end (every block carries <= B input bytes)
    and the frame header advertises the covering standard tier
    (lz4io.c:286-300, lz4cli.c:612-649)."""
    from lz4_tpu.block.ref_codec import decompress_block
    src = tmp_path / "d.bin"
    src.write_bytes(mixed_corpus(300_000, seed=11))
    # (custom size, covering tier id); tier boundaries exact like the sh
    cases = [(32, 4), (65535, 4), (65536, 4), (65537, 5),
             (262143, 5), (262144, 5), (262145, 6), (33000, 4)]
    for bsize, want_tier in cases:
        dst = tmp_path / f"d_{bsize}.lz4"
        assert run_cli("-f", f"-B{bsize}", src, dst) == 0
        from lz4_tpu.frame.format import parse_frame_header
        info, _ = parse_frame_header(dst.read_bytes())
        assert info.block_size_id == want_tier, (bsize, info.block_size_id)
        total = 0
        for csize, stored, payload in _walk_frame_blocks(dst):
            if stored:
                dsize = csize
            else:
                dsize = len(decompress_block(payload, bsize))
            assert dsize <= bsize
            total += dsize
        assert total == 300_000
        out = tmp_path / "d.out"
        assert run_cli("-d", "-f", dst, out) == 0
        assert out.read_bytes() == src.read_bytes()
    # below 32 and the 8..31 gap are refused (lz4cli badusage analog)
    for bad in (8, 31):
        with pytest.raises(SystemExit):
            run_cli("-f", f"-B{bad}", src, tmp_path / "x.lz4")


def test_block_property_chaining(tmp_path):
    """-B accepts chained size/D/I/X properties in one token
    (lz4cli.c:612-649) and -BI cancels -BD."""
    src = tmp_path / "c.bin"
    src.write_bytes(mixed_corpus(200_000, seed=12))
    from lz4_tpu.frame.format import parse_frame_header
    chained = tmp_path / "c1.lz4"
    assert run_cli("-f", "-B4DX", src, chained) == 0
    info, _ = parse_frame_header(chained.read_bytes())
    assert info.block_size_id == 4
    assert not info.block_independent
    assert info.block_checksum
    # -BD then -BI: independent wins
    indep = tmp_path / "c2.lz4"
    assert run_cli("-f", "-BD", "-BI", "-B4", src, indep) == 0
    info, _ = parse_frame_header(indep.read_bytes())
    assert info.block_independent
    for p in (chained, indep):
        out = tmp_path / "c.out"
        assert run_cli("-d", "-f", p, out) == 0
        assert out.read_bytes() == src.read_bytes()


def test_lz4c_alias_legacy_commands(tmp_path):
    """argv[0]=lz4c enables the legacy command set -c0/-c1/-c2/-hc/-y
    (lz4cli.c:433-444, 523-530)."""
    src = tmp_path / "l.bin"
    src.write_bytes(mixed_corpus(120_000, seed=13))
    dst = tmp_path / "l.lz4"
    out = tmp_path / "l.out"
    for flag in ("-c0", "-c1", "-hc"):
        assert cli_main(["lz4c", "--backend", "host", flag, "-y",
                         str(src), str(dst)]) == 0
        assert run_cli("-d", "-f", dst, out) == 0
        assert out.read_bytes() == src.read_bytes()
    # without the alias "-c0" parses as -c + level 0 (reference
    # semantics, lz4cli.c:520-535) — no rejection to assert


@needs_oracle
def test_custom_block_size_interop(tmp_path):
    """Same -B33000 command line on both CLIs: each side decodes the
    other's output (the interop contract of lz4cli.c:556-577)."""
    src = tmp_path / "i.bin"
    src.write_bytes(mixed_corpus(200_000, seed=14))
    ours = tmp_path / "ours.lz4"
    assert run_cli("-f", "-B33000", src, ours) == 0
    r = ref_oracle.ref_cli(["-d", "-f", str(ours),
                            str(tmp_path / "a.out")])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "a.out").read_bytes() == src.read_bytes()
    refz = tmp_path / "ref.lz4"
    r = ref_oracle.ref_cli(["-B33000", "-f", str(src), str(refz)])
    assert r.returncode == 0, r.stderr
    out = tmp_path / "b.out"
    assert run_cli("-d", "-f", refz, out) == 0
    assert out.read_bytes() == src.read_bytes()


def test_max_dist_mode(tmp_path):
    """--max-dist=# caps every match offset in the emitted frame (the
    wave-friendly fast mode); output stays standard and round-trips
    through the plain decoder."""
    src = tmp_path / "w.bin"
    src.write_bytes(mixed_corpus(200_000, seed=91))
    capped = tmp_path / "w.lz4"
    assert run_cli("-f", "--max-dist=2000", "-B4", src, capped) == 0
    out = tmp_path / "w.out"
    assert run_cli("-d", "-f", capped, out) == 0
    assert out.read_bytes() == src.read_bytes()
    # walk every block: offsets <= 2000
    from lz4_tpu.block.ref_codec import decompress_block
    for csize, stored, payload in _walk_frame_blocks(capped):
        if stored:
            continue
        p = 0
        while p < len(payload):
            tok = payload[p]; p += 1
            ll = tok >> 4
            if ll == 15:
                while payload[p] == 255:
                    ll += 255; p += 1
                ll += payload[p]; p += 1
            p += ll
            if p >= len(payload):
                break
            off = payload[p] | (payload[p + 1] << 8); p += 2
            assert 1 <= off <= 2000
            if (tok & 15) == 15:
                while payload[p] == 255:
                    p += 1
                p += 1
