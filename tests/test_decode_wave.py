"""128-lane lockstep wavefront decoder tests (block/decode_wave.py).

Interpret-mode correctness against the wave splitter's streams: the
kernel must reproduce the source bytes for every lane, including match
overlap, far offsets, piece-boundary fragments, short lanes, and mixed
batches. One test pins the one-hot select path (the real-chip path) to
the take_along_axis interpret path.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lz4_tpu import native
from lz4_tpu.block.decode_wave import WCAP, wave_decode_batch
from lz4_tpu.utils.datagen import gen_buffer, gen_text, mixed_corpus

try:
    bc = native.blockcodec
except ImportError:  # pragma: no cover
    bc = None

pytestmark = pytest.mark.skipif(bc is None, reason="native unavailable")


def split_batch(srcs, max_pieces):
    arenas = np.zeros((len(srcs), max_pieces, WCAP), np.uint8)
    out_lens = []
    for i, s in enumerate(srcs):
        comp = bc.compress(s)
        r = bc.wave_split(comp, max_pieces=max_pieces, out_cap=len(s))
        assert r is not None
        arena, out_len = r
        assert out_len == len(s)
        arenas[i, : arena.shape[0]] = arena
        out_lens.append(out_len)
    return arenas, out_lens


def test_wave_kernel_roundtrip_mixed():
    srcs = [
        gen_text(6000, seed=1),
        gen_buffer(6000, match_prob=0.95, seed=2),   # long matches
        os.urandom(6000),                            # all literals
        b"a" * 6000,                                 # offset-1 overlap
        b"abcdefg" * 857,                            # offset-7 overlap
        mixed_corpus(6000, seed=3),
        gen_text(100, seed=4),                       # sub-piece lane
        gen_text(4096, seed=5),                      # exact piece multiple
    ]
    arenas, out_lens = split_batch(srcs, max_pieces=6)
    out = wave_decode_batch(arenas, out_lens, interpret=True)
    for i, s in enumerate(srcs):
        assert out[i] == s, f"lane {i} mismatch"


def test_wave_kernel_far_offsets():
    """Matches reaching beyond the 2 KB near window exercise the
    full-history escape."""
    base = gen_text(3000, seed=7)
    src = base + os.urandom(4000) + base[:2500] + gen_text(2000, seed=8)
    arenas, out_lens = split_batch([src], max_pieces=12)
    out = wave_decode_batch(arenas, out_lens, interpret=True)
    assert out[0] == src


def test_wave_kernel_hc_streams():
    src = mixed_corpus(9000, seed=9)
    comp = bc.compress_hc(src, 9)
    r = bc.wave_split(comp, max_pieces=9, out_cap=len(src))
    arena, out_len = r
    arenas = np.zeros((1, 9, WCAP), np.uint8)
    arenas[0, : arena.shape[0]] = arena
    out = wave_decode_batch(arenas, [out_len], interpret=True)
    assert out[0] == src


def test_wave_kernel_onehot_equivalence():
    """The one-hot select path (the real-chip lowering) must produce
    byte-identical output to the take_along_axis interpret path."""
    srcs = [gen_text(3000, seed=11), b"xy" * 1500, os.urandom(3000)]
    arenas, out_lens = split_batch(srcs, max_pieces=3)
    a = wave_decode_batch(arenas, out_lens, interpret=True,
                          use_onehot=False)
    b = wave_decode_batch(arenas, out_lens, interpret=True,
                          use_onehot=True)
    assert a == b == srcs


def test_wave_kernel_full_lane_count():
    """All 128 lanes busy with distinct streams."""
    srcs = [gen_text(2048 + 13 * i, seed=20 + i) for i in range(128)]
    arenas, out_lens = split_batch(srcs, max_pieces=4)
    out = wave_decode_batch(arenas, out_lens, interpret=True)
    for i, s in enumerate(srcs):
        assert out[i] == s, f"lane {i} mismatch"


def test_engine_wave_tier(monkeypatch):
    """TpuBackend routes 64KB-tier no-dict decodes through the wave
    kernel when LZ4_TPU_WAVE_DECODE=1, byte-identical to host, with
    the canonical error on malformed streams."""
    monkeypatch.setenv("LZ4_TPU_PALLAS_CPU", "1")
    monkeypatch.setenv("LZ4_TPU_WAVE_DECODE", "1")
    from lz4_tpu.block.ref_codec import BlockDecodeError
    from lz4_tpu.parallel.engine import TpuBackend
    be = TpuBackend()
    srcs = [gen_text(40000 + 321 * i, seed=50 + i) for i in range(5)]
    comps = [bc.compress(s) for s in srcs]
    out = be.decompress_batch(comps, [len(s) for s in srcs])
    assert out == srcs
    # structural corruption (truncation): splitter rejects, the strict
    # host decoder raises the canonical error (bit flips that keep the
    # stream well-formed are the frame checksums' job, not the block
    # decoder's)
    bad = comps[0][: len(comps[0]) // 2]
    with pytest.raises(BlockDecodeError):
        be.decompress_batch([bad] + comps[1:],
                            [len(s) for s in srcs])


def test_engine_wave_small_tier(monkeypatch):
    """Small-block batches ride the NP=4 shape (4 KB pieces), not the
    64 KB tier's full row loop."""
    monkeypatch.setenv("LZ4_TPU_PALLAS_CPU", "1")
    monkeypatch.setenv("LZ4_TPU_WAVE_DECODE", "1")
    from lz4_tpu.parallel.engine import TpuBackend
    be = TpuBackend()
    srcs = [gen_text(3000 + 100 * i, seed=70 + i) for i in range(6)]
    comps = [bc.compress(s) for s in srcs]
    out = be.decompress_batch(comps, [len(s) for s in srcs])
    assert out == srcs
