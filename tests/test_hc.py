"""HC tier: ratio ladder, interop, favor-dec-speed, dict support."""
import pytest

from conftest import needs_oracle
from lz4_tpu.block.ref_codec import compress_block, decompress_block
from lz4_tpu.hc.codec import compress_block_hc
from lz4_tpu.utils.datagen import gen_buffer

DATA = gen_buffer(65536, match_prob=0.65, seed=21)


@pytest.mark.parametrize("level", [2, 3, 6, 9, 10, 12])
def test_roundtrip_levels(level):
    comp = compress_block_hc(DATA, level=level)
    assert decompress_block(comp, len(DATA)) == DATA


def test_ratio_ladder():
    fast = len(compress_block(DATA))
    l9 = len(compress_block_hc(DATA, level=9))
    l12 = len(compress_block_hc(DATA, level=12))
    assert l9 <= fast
    assert l12 <= l9


@needs_oracle
@pytest.mark.parametrize("level", [3, 9, 12])
def test_size_vs_reference_hc(level):
    from ref_oracle import ref_compress_block
    ours = len(compress_block_hc(DATA, level=level))
    theirs = len(ref_compress_block(DATA, level=level))
    # within 2% of reference HC at the same level (match finders differ)
    assert ours <= theirs * 1.02, (level, ours, theirs)


@needs_oracle
def test_reference_decodes_hc(level=9):
    from ref_oracle import ref_decompress_block
    comp = compress_block_hc(DATA, level=level)
    assert ref_decompress_block(comp, len(DATA)) == DATA


def test_favor_dec_speed_roundtrips():
    comp = compress_block_hc(DATA, level=10, favor_dec_speed=True)
    assert decompress_block(comp, len(DATA)) == DATA


def test_hc_with_dict():
    hist = gen_buffer(65536, match_prob=0.8, seed=22)
    data = hist[100:4000] + b"x" + hist[30000:34000]
    comp = compress_block_hc(data, level=9, dict_prefix=hist)
    assert decompress_block(comp, len(data), dict_prefix=hist) == data
    assert len(comp) < len(compress_block_hc(data, level=9))


def test_empty_and_tiny():
    for d in (b"", b"a", b"ab" * 6):
        comp = compress_block_hc(d, level=12)
        assert decompress_block(comp, len(d)) == d
