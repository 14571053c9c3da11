"""Wave (128-lane lockstep) match finder + emitter tests.

Runs the kernel in interpret mode on the forced-CPU mesh; the real-chip
behaviour is exercised by tools/session_wave_encode.py and the bench
(the one-hot/take_along_axis equivalence is pinned here).
"""
import numpy as np
import pytest

from lz4_tpu.block.encode_wave import (MAX_DIST, emit_from_decisions,
                                       encode_wave_batch,
                                       find_matches_batch)
from lz4_tpu.block.ref_codec import decompress_block


def _walk_max_offset(blk: bytes) -> int:
    p = 0
    mx = 0
    while p < len(blk):
        tok = blk[p]
        p += 1
        ll = tok >> 4
        if ll == 15:
            while True:
                v = blk[p]
                p += 1
                ll += v
                if v != 255:
                    break
        p += ll
        if p >= len(blk):
            break
        off = blk[p] | (blk[p + 1] << 8)
        p += 2
        mx = max(mx, off)
        if (tok & 15) == 15:
            while True:
                v = blk[p]
                p += 1
                if v != 255:
                    break
    return mx


def _corpus_blocks():
    from lz4_tpu.utils.datagen import mixed_corpus
    data = mixed_corpus(4 * 65536, seed=20260820)
    rng = np.random.default_rng(11)
    return [
        data[:65536],
        data[65536: 2 * 65536],
        b"",
        b"a",
        bytes(13),
        b"ab" * 6,
        b"xyz" * 9000,
        bytes(65536),                                     # mega-run
        rng.integers(0, 256, 65536, np.uint8).tobytes(),  # incompressible
        rng.integers(0, 4, 40000, np.uint8).tobytes(),    # dense matches
        (b"0123456789abcdef" * 4096)[:65536],             # periodic
        data[: 12],                                       # < MFLIMIT+1
    ]


def test_roundtrip_and_cap():
    blocks = _corpus_blocks()
    streams = encode_wave_batch(blocks, interpret=True)
    for b, s in zip(blocks, streams):
        assert decompress_block(s, max(1, len(b))) == b
        assert _walk_max_offset(s) <= MAX_DIST


def test_c_emitter_matches_python_oracle():
    native = pytest.importorskip("lz4_tpu.native")
    bc = native.blockcodec
    blocks = [b for b in _corpus_blocks() if True]
    dec = find_matches_batch(blocks, interpret=True)
    decT = np.ascontiguousarray(dec.T)
    c_streams = bc.wave_emit_decisions(blocks, decT[: len(blocks)])
    for i, b in enumerate(blocks):
        assert c_streams[i] == emit_from_decisions(b, decT[i])


def test_ratio_sane():
    """The capped wave encode must stay within the documented size
    envelope of the uncapped host encoder on mixed data (~1.2-1.3x; a
    regression to literal-mostly output would blow far past this)."""
    from lz4_tpu.utils.datagen import mixed_corpus
    native = pytest.importorskip("lz4_tpu.native")
    bc = native.blockcodec
    data = mixed_corpus(4 * 65536, seed=7)
    blocks = [data[i * 65536:(i + 1) * 65536] for i in range(4)]
    streams = encode_wave_batch(blocks, interpret=True)
    tot_w = sum(map(len, streams))
    tot_u = sum(len(bc.compress(b)) for b in blocks)
    assert tot_w < 1.45 * tot_u


def test_max_dist_knob():
    blocks = [(b"Q" * 100 + bytes(range(256)) * 12) * 20]
    for md in (256, 1024):
        s = encode_wave_batch(blocks, interpret=True, max_dist=md)[0]
        assert decompress_block(s, len(blocks[0])) == blocks[0]
        assert _walk_max_offset(s) <= md


def test_engine_wave_encode_route(monkeypatch):
    """TpuBackend routes --max-dist fast-mode batches through the wave
    match finder (default-on), round-tripping through the default-on
    wave decode tier and the strict host decoder."""
    monkeypatch.setenv("LZ4_TPU_PALLAS_CPU", "1")
    from lz4_tpu.parallel.engine import TpuBackend
    from lz4_tpu.utils.datagen import mixed_corpus
    be = TpuBackend()
    assert be.wave_encode and be.wave_decode      # round-5 defaults
    srcs = [mixed_corpus(30000 + 1000 * i, seed=90 + i)
            for i in range(4)]
    comps = be.compress_batch(srcs, level=1, max_dist=2000)
    for s, c in zip(srcs, comps):
        assert _walk_max_offset(c) <= 2000
        assert decompress_block(c, len(s)) == s
    # engine wave decode of its own wave-encoded streams
    out = be.decompress_batch(comps, [len(s) for s in srcs])
    assert out == srcs


def test_onehot_equals_take_along_axis():
    """The production one-hot select path must agree with the interpret
    take_along_axis path (decode_wave pins the same equivalence)."""
    blocks = _corpus_blocks()[:4]
    a = find_matches_batch(blocks, interpret=True, use_onehot=False)
    b = find_matches_batch(blocks, interpret=True, use_onehot=True)
    assert np.array_equal(a, b)
