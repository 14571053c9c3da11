"""Native (C) HC tier: chunked optimal parser on large blocks, reentrant
tables, favor_dec_speed, and the host -T# thread fan-out.

Regression anchor: lz4t_compress_hc of a 1 MB block at level >= 3 used
to mutually recurse with lz4t_compress_opt (ADVICE r1, high) — the
chunked DP (native/hccodec.c, OPT_CHUNK windows) removes the fallback
entirely.
"""
import pytest

from lz4_tpu.block.backend import HostBackend
from lz4_tpu.block.ref_codec import decompress_block
from lz4_tpu.utils.datagen import gen_buffer

try:
    from lz4_tpu import native
    CODEC = native.blockcodec
except Exception:            # pragma: no cover
    CODEC = None

pytestmark = pytest.mark.skipif(CODEC is None, reason="native unavailable")


@pytest.mark.parametrize("level", [2, 5, 9, 12])
@pytest.mark.parametrize("size", [300_000, 1_000_000])
def test_large_block_levels(level, size):
    data = gen_buffer(size, match_prob=0.6, seed=31)
    comp = CODEC.compress_hc(data, level=level)
    assert decompress_block(comp, len(data)) == data


def test_large_block_beats_small_chunked_quality():
    # -12 of a 1 MB block must be a real optimal parse, not a silent
    # level-9 fallback: it must not be larger than level 9's output
    data = gen_buffer(1_000_000, match_prob=0.7, seed=32)
    l9 = len(CODEC.compress_hc(data, level=9))
    l12 = len(CODEC.compress_hc(data, level=12))
    assert l12 <= l9


def test_chunk_seam_with_dict():
    hist = gen_buffer(65536, match_prob=0.8, seed=33)
    data = gen_buffer(600_000, match_prob=0.75, seed=34)
    comp = CODEC.compress_hc(data, level=9, dict_prefix=hist)
    assert decompress_block(comp, len(data), dict_prefix=hist) == data


def test_favor_dec_speed_native():
    data = gen_buffer(200_000, match_prob=0.8, seed=35)
    plain = CODEC.compress_hc(data, level=10)
    favor = CODEC.compress_hc(data, level=10, favor_dec_speed=True)
    assert decompress_block(favor, len(data)) == data
    # favoring decode speed may cost ratio, never correctness
    assert len(favor) >= len(plain) * 0.98


def test_thread_fanout_matches_serial():
    blocks = [gen_buffer(65536, match_prob=0.6, seed=40 + i)
              for i in range(8)]
    serial = HostBackend(nb_workers=0).compress_batch(blocks, level=9)
    par = HostBackend(nb_workers=4).compress_batch(blocks, level=9)
    assert serial == par
    par_fast = HostBackend(nb_workers=4).compress_batch(blocks, level=1)
    assert par_fast == HostBackend().compress_batch(blocks, level=1)
    outs = HostBackend(nb_workers=4).decompress_batch(
        par, [len(b) for b in blocks])
    assert outs == blocks


def test_large_vs_reference_size():
    from conftest import ORACLE
    if not ORACLE:
        pytest.skip("oracle unavailable")
    from ref_oracle import ref_compress_block
    data = gen_buffer(1_000_000, match_prob=0.65, seed=36)
    for level in (9, 12):
        ours = len(CODEC.compress_hc(data, level=level))
        theirs = len(ref_compress_block(data, level=level))
        assert ours <= theirs * 1.02, (level, ours, theirs)
