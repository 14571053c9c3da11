"""WAVE-format splitter tests (lz4t_wave_split, blockcodec.c).

The wave format is the internal re-layout consumed by the 128-lane
lockstep decode kernel (block/decode_wave.py): fixed-address pieces of
exactly 1024 output bytes, chain-free sequences with capped lengths.
This suite checks the format contract the kernel relies on, against a
pure-python reference decoder, over our encoder's streams, the
reference encoder's streams (oracle), and HC streams.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lz4_tpu import native
from lz4_tpu.utils.datagen import gen_buffer, gen_text, mixed_corpus

try:
    bc = native.blockcodec
except ImportError:  # pragma: no cover
    bc = None

pytestmark = pytest.mark.skipif(bc is None, reason="native unavailable")

WOUT, WCAP = 1024, 1088


def wave_decode(arena: np.ndarray, out_len: int, hist: bytes = b"") -> bytes:
    """Pure-python reference decoder of the WAVE format (mirrors the
    grammar in blockcodec.c lz4t_wave_split's header comment)."""
    out = bytearray(hist)
    base = len(hist)
    for k in range(arena.shape[0]):
        piece = arena[k]
        p = 0
        target = min(out_len, (k + 1) * WOUT) + base
        while len(out) < target:
            tok = int(piece[p]); p += 1
            ln, mn = tok >> 4, tok & 15
            if ln == 15:
                ln = 15 + int(piece[p]); p += 1
            assert ln <= 255
            out += piece[p: p + ln].tobytes(); p += ln
            if mn > 0:
                off = int(piece[p]) | (int(piece[p + 1]) << 8); p += 2
                m = mn
                if mn == 15:
                    m = 15 + int(piece[p]); p += 1
                assert 1 <= m <= 255 and off >= 1
                for _ in range(m):
                    out.append(out[-off])
            assert len(out) <= target, "sequence crossed a piece boundary"
        assert p <= WCAP
    return bytes(out[base:])


def wave_seq_starts(arena: np.ndarray, out_len: int) -> list[int]:
    """Output positions of every wave-sequence start."""
    starts = []
    opos = 0
    for k in range(arena.shape[0]):
        piece = arena[k]
        p = 0
        target = min(out_len, (k + 1) * WOUT)
        while opos < target:
            starts.append(opos)
            tok = int(piece[p]); p += 1
            ln, mn = tok >> 4, tok & 15
            if ln == 15:
                ln = 15 + int(piece[p]); p += 1
            p += ln
            opos += ln
            if mn > 0:
                p += 2
                m = mn
                if mn == 15:
                    m = 15 + int(piece[p]); p += 1
                opos += m
    return starts


CORPORA = [
    gen_buffer(65536, match_prob=0.6, seed=1),
    gen_buffer(65536, match_prob=0.97, seed=2),        # RLE-ish
    gen_text(65536, seed=3),
    os.urandom(65536),                                 # incompressible
    mixed_corpus(65536, seed=4),
    gen_text(5000, seed=5),                            # short block
    b"a" * 65536,                                      # max-length matches
    b"xy" * 32768,
    mixed_corpus(64000, seed=6) + b"\x00" * 1536,      # zero tail
]


@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_wave_roundtrip(i):
    src = CORPORA[i]
    comp = bc.compress(src)
    r = bc.wave_split(comp, out_cap=len(src))
    assert r is not None
    arena, out_len = r
    assert out_len == len(src)
    assert arena.shape[0] == -(-len(src) // WOUT)
    assert wave_decode(arena, out_len) == src


@pytest.mark.parametrize("i", [0, 2, 4, 6])
def test_row_start_invariant(i):
    """<= 2 sequence starts per 4-byte output row, and per-row comp
    consumption bounded — the kernel's 2-parse-slot / 5-word-lookahead
    contract."""
    src = CORPORA[i]
    comp = bc.compress(src)
    arena, out_len = bc.wave_split(comp, out_cap=len(src))
    starts = wave_seq_starts(arena, out_len)
    rows = np.asarray(starts) // 4
    _, counts = np.unique(rows, return_counts=True)
    assert counts.max() <= 2


def test_wave_hc_and_reference_streams():
    """HC streams and (when the oracle is built) reference-encoder
    streams re-lay and round-trip identically."""
    src = mixed_corpus(65536, seed=9)
    for comp in [bc.compress_hc(src, 9), bc.compress_hc(src, 12)]:
        arena, out_len = bc.wave_split(comp, out_cap=len(src))
        assert wave_decode(arena, out_len) == src
    import ref_oracle
    if ref_oracle.ensure_built():
        comp = ref_oracle.ref_compress_block(src, 1)
        arena, out_len = bc.wave_split(comp, out_cap=len(src))
        assert wave_decode(arena, out_len) == src
        comp = ref_oracle.ref_compress_block(src, 12)
        arena, out_len = bc.wave_split(comp, out_cap=len(src))
        assert wave_decode(arena, out_len) == src


def test_wave_malformed_rejected():
    src = mixed_corpus(20000, seed=10)
    comp = bytearray(bc.compress(src))
    assert bc.wave_split(bytes(comp), out_cap=len(src)) is not None
    # offset beyond history
    bad = bytes([0x04, ord("a"), ord("b"), ord("c"), ord("d"),
                 0xFF, 0xFF] + [0] * 8)
    assert bc.wave_split(bad, out_cap=65536) is None
    # truncated literal run
    assert bc.wave_split(bytes([0xF0, 0x41]), out_cap=65536) is None
    assert bc.wave_split(b"", out_cap=65536) is None
    # capacity: too many pieces
    big = bc.compress(mixed_corpus(65536, seed=11))
    assert bc.wave_split(big, max_pieces=3, out_cap=65536) is None


def test_wave_dict_history():
    """hist_len admits offsets reaching the linked-mode history."""
    hist = gen_text(65536, seed=12)
    src = hist[:3000] + gen_text(30000, seed=13)
    comp = bc.compress(src, dict_prefix=hist)
    # without history the back-references must be rejected
    r0 = bc.wave_split(comp, out_cap=len(src), hist_len=0)
    r1 = bc.wave_split(comp, out_cap=len(src), hist_len=len(hist))
    assert r1 is not None
    arena, out_len = r1
    assert wave_decode(arena, out_len, hist=hist[-65536:]) == src
    if r0 is not None:
        # only valid if the stream truly never referenced the dict
        assert wave_decode(*r0) == src
