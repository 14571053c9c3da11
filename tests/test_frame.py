"""Frame layer: round trips, random chunking (frametest.c analog), interop
with the reference CLI, linked blocks, dictionaries, skippable/legacy."""
import os
import struct
import tempfile

import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.frame.format import FrameError, FrameInfo, Preferences, parse_frame_header
from lz4_tpu.frame.reader import FrameDecompressor, decompress_frame, get_frame_info
from lz4_tpu.frame.writer import (
    CDict,
    FrameCompressor,
    compress_frame,
    compress_legacy_frame,
    write_skippable_frame,
)
from lz4_tpu.utils.datagen import gen_buffer


DATA = gen_buffer(300000, match_prob=0.7, seed=42)


def prefs(**kw):
    fi = FrameInfo(**kw)
    return Preferences(frame_info=fi)


@pytest.mark.parametrize("kw", [
    {},
    {"block_size_id": 4},
    {"block_size_id": 5},
    {"block_size_id": 6},
    {"block_independent": False},
    {"block_checksum": True},
    {"content_checksum": False},
    {"block_independent": False, "block_checksum": True},
])
def test_roundtrip_configs(kw):
    comp = compress_frame(DATA, prefs=prefs(**kw))
    assert decompress_frame(comp) == DATA


def test_roundtrip_sizes():
    for n in [0, 1, 12, 13, 100, 65535, 65536, 65537, 200000]:
        d = gen_buffer(n, match_prob=0.6, seed=n) if n else b""
        comp = compress_frame(d)
        assert decompress_frame(comp) == d


def test_content_size_stored_and_checked():
    comp = compress_frame(DATA, store_content_size=True)
    info = get_frame_info(comp)
    assert info.content_size == len(DATA)
    assert decompress_frame(comp) == DATA
    # corrupt declared size → decoder must reject
    bad = bytearray(comp)
    bad[6] ^= 1  # low byte of content size
    # header checksum catches it first
    with pytest.raises(FrameError):
        decompress_frame(bytes(bad))


def test_streaming_writer_matches_oneshot_decode():
    c = FrameCompressor(prefs=prefs(block_size_id=4, block_independent=False))
    out = bytearray(c.begin())
    for i in range(0, len(DATA), 7777):
        out += c.update(DATA[i:i + 7777])
    out += c.end()
    assert decompress_frame(bytes(out)) == DATA


def test_streaming_reader_random_chunking():
    comp = compress_frame(DATA, prefs=prefs(block_size_id=4,
                                            block_independent=False,
                                            block_checksum=True))
    rng = np.random.default_rng(3)
    dec = FrameDecompressor()
    out = bytearray()
    pos = 0
    while pos < len(comp):
        n = int(rng.integers(1, 5000))
        produced, consumed = dec.feed(comp[pos:pos + n])
        out += produced
        pos += consumed
        assert consumed > 0 or dec.frame_done
    assert dec.frame_done
    assert bytes(out) == DATA


def test_flush_boundaries():
    c = FrameCompressor(prefs=prefs())
    out = bytearray(c.begin())
    out += c.update(DATA[:1000])
    out += c.flush()
    out += c.update(DATA[1000:5000])
    out += c.flush()
    out += c.update(DATA[5000:])
    out += c.end()
    assert decompress_frame(bytes(out)) == DATA


def test_multi_frame_concatenation():
    comp = compress_frame(DATA[:1000]) + compress_frame(DATA[1000:2000])
    assert decompress_frame(comp) == DATA[:2000]


def test_skippable_frames():
    blob = write_skippable_frame(b"metadata-payload", sub_id=3)
    comp = blob + compress_frame(DATA[:500]) + write_skippable_frame(b"x" * 100)
    assert decompress_frame(comp) == DATA[:500]


def test_bad_magic_rejected():
    with pytest.raises(FrameError):
        decompress_frame(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_corrupt_block_checksum_rejected():
    comp = bytearray(compress_frame(DATA[:70000],
                                    prefs=prefs(block_checksum=True)))
    comp[30] ^= 0xFF
    with pytest.raises(FrameError):
        decompress_frame(bytes(comp))


def test_corrupt_content_checksum_rejected():
    comp = bytearray(compress_frame(DATA[:70000]))
    comp[-1] ^= 0xFF
    with pytest.raises(FrameError):
        decompress_frame(bytes(comp))


def test_dictionary_roundtrip():
    dict_content = gen_buffer(65536, match_prob=0.8, seed=9)
    data = dict_content[:3000] + b"novel" + dict_content[60000:63000]
    cd = CDict(dict_content, dict_id=77)
    comp = compress_frame(data, cdict=cd)
    info = get_frame_info(comp)
    assert info.dict_id == 77
    assert decompress_frame(comp, dict_content=dict_content) == data
    plain = compress_frame(data)
    assert len(comp) < len(plain)


def test_legacy_roundtrip():
    comp = compress_legacy_frame(DATA)
    assert decompress_frame(comp) == DATA
    # legacy followed by a modern frame
    comp2 = comp + compress_frame(b"tail-frame")
    assert decompress_frame(comp2) == DATA + b"tail-frame"


def test_hc_levels_in_frames():
    d = DATA[:100000]
    sizes = {}
    for level in (0, 3, 9, 12):
        comp = compress_frame(d, level=level)
        assert decompress_frame(comp) == d
        sizes[level] = len(comp)
    assert sizes[9] <= sizes[0]
    assert sizes[12] <= sizes[9] * 1.01


# ------------------------------------------------------------------ interop
@needs_oracle
def test_reference_cli_decodes_our_frames():
    from ref_oracle import ref_cli
    for kw, level in [({}, 0), ({"block_independent": False}, 0),
                      ({"block_checksum": True}, 0),
                      ({"block_size_id": 5}, 0), ({}, 9)]:
        comp = compress_frame(DATA, prefs=prefs(**kw), level=level)
        r = ref_cli(["-d", "-c"], stdin=comp)
        assert r.returncode == 0, r.stderr
        assert r.stdout == DATA
        t = ref_cli(["-t", "-v"], stdin=comp)
        assert t.returncode == 0, t.stderr


@needs_oracle
def test_we_decode_reference_cli_frames():
    from ref_oracle import ref_cli
    for args in (["-1"], ["-9"], ["-B4"], ["-B7"], ["-BD"], ["-B5", "-BX"],
                 ["--content-size"], ["-l", "-1"]):
        r = ref_cli(args + ["-c"], stdin=DATA)
        assert r.returncode == 0, (args, r.stderr)
        assert decompress_frame(r.stdout) == DATA, args


@needs_oracle
def test_reference_decodes_our_legacy():
    from ref_oracle import ref_cli
    comp = compress_legacy_frame(DATA)
    r = ref_cli(["-d", "-c"], stdin=comp)
    assert r.returncode == 0, r.stderr
    assert r.stdout == DATA


@needs_oracle
def test_skippable_golden_sample():
    golden = "/root/reference/tests/goldenSamples/skip.bin"
    if not os.path.exists(golden):
        pytest.skip("no golden sample")
    with open(golden, "rb") as f:
        blob = f.read()
    # must decode to the same output as the reference CLI
    from ref_oracle import ref_cli
    r = ref_cli(["-d", "-c"], stdin=blob)
    assert decompress_frame(blob) == r.stdout


@needs_oracle
def test_frame_size_parity():
    from ref_oracle import ref_cli
    r = ref_cli(["-1", "-B4", "-c"], stdin=DATA)
    ours = compress_frame(DATA, prefs=prefs(block_size_id=4))
    assert len(ours) <= len(r.stdout) * 1.01, (len(ours), len(r.stdout))


def test_byte_at_a_time_streaming():
    """Feed the push decoder one byte at a time through a multi-block
    frame — the harshest chunking of the dstage state machine."""
    from lz4_tpu.frame.reader import FrameDecompressor
    from lz4_tpu.frame.writer import compress_frame
    from lz4_tpu.frame.format import FrameInfo, Preferences
    from lz4_tpu.utils.datagen import gen_buffer

    data = gen_buffer(200000, match_prob=0.7, seed=42)
    prefs = Preferences(frame_info=FrameInfo(block_checksum=True))
    blob = compress_frame(data, prefs=prefs)
    dec = FrameDecompressor()
    out = bytearray()
    for i in range(len(blob)):
        produced, consumed = dec.feed(blob[i: i + 1])
        out += produced
        assert consumed in (0, 1)
    assert dec.frame_done and bytes(out) == data


def test_lz4file_chunked_reads():
    from io import BytesIO
    from lz4_tpu.frame.file import Lz4FrameReader, Lz4FrameWriter
    from lz4_tpu.utils.datagen import gen_buffer

    data = gen_buffer(150000, match_prob=0.6, seed=9)
    buf = BytesIO()
    w = Lz4FrameWriter(buf)
    for i in range(0, len(data), 7001):
        w.write(data[i: i + 7001])
    w.close()
    buf.seek(0)
    r = Lz4FrameReader(buf)
    out = bytearray()
    while True:
        chunk = r.read(1234)
        if not chunk:
            break
        out += chunk
    assert bytes(out) == data
