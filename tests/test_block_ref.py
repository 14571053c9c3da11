"""Host-oracle block codec: round trips, interop with reference liblz4,
format edge rules."""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.ref_codec import (
    BlockDecodeError,
    compress_block,
    decompress_block,
)
from lz4_tpu.constants import compress_bound
from lz4_tpu.utils.datagen import gen_buffer


def corpora():
    yield b""
    yield b"a"
    yield b"abcabcabcabcabcabcabcabcabc"
    yield b"x" * 13
    yield b"x" * 12          # too short for any match
    yield b"x" * 100000      # extreme RLE
    yield bytes(range(256)) * 64
    yield gen_buffer(65536, match_prob=0.7, seed=3)
    yield gen_buffer(65536, match_prob=0.0, seed=4)   # incompressible
    yield gen_buffer(200000, match_prob=0.9, seed=5)
    yield np.random.default_rng(6).integers(0, 4, 70000, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("i,data", list(enumerate(corpora())))
def test_roundtrip(i, data):
    comp = compress_block(data)
    assert len(comp) <= compress_bound(len(data))
    out = decompress_block(comp, len(data))
    assert out == data


@needs_oracle
@pytest.mark.parametrize("i,data", list(enumerate(corpora())))
def test_reference_decodes_ours(i, data):
    from ref_oracle import ref_decompress_block
    comp = compress_block(data)
    assert ref_decompress_block(comp, len(data)) == data


@needs_oracle
@pytest.mark.parametrize("i,data", list(enumerate(corpora())))
def test_we_decode_reference(i, data):
    from ref_oracle import ref_compress_block
    if not data:
        return
    comp = ref_compress_block(data)
    assert decompress_block(comp, len(data)) == data


@needs_oracle
def test_size_parity_vs_reference():
    """Compressed size must be <= reference (exact matcher beats the lossy
    hash table)."""
    from ref_oracle import ref_compress_block
    for seed, p in [(1, 0.8), (2, 0.6), (3, 0.3)]:
        data = gen_buffer(65536, match_prob=p, seed=seed)
        ours = len(compress_block(data))
        theirs = len(ref_compress_block(data))
        assert ours <= theirs * 1.005, (seed, p, ours, theirs)


def test_dict_prefix_roundtrip():
    hist = gen_buffer(70000, match_prob=0.8, seed=7)
    data = hist[1000:3000] + b"fresh content 123" + hist[50000:52000]
    comp = compress_block(data, dict_prefix=hist)
    out = decompress_block(comp, len(data), dict_prefix=hist[-65535:])
    assert out == data
    # with dict the block should compress far better than without
    assert len(comp) < len(compress_block(data))


@needs_oracle
def test_dict_interop():
    from ref_oracle import ref_decompress_block
    hist = gen_buffer(65536, match_prob=0.8, seed=8)
    data = hist[:4000] + b"tail"
    comp = compress_block(data, dict_prefix=hist)
    assert ref_decompress_block(comp, len(data), dict_prefix=hist) == data


def test_partial_decode():
    data = gen_buffer(30000, match_prob=0.7, seed=9)
    comp = compress_block(data)
    for target in [0, 1, 100, 15000, 29999, 30000]:
        out = decompress_block(comp, target, partial=True)
        assert out == data[:target]


def test_malformed_inputs_rejected():
    data = gen_buffer(10000, match_prob=0.7, seed=10)
    comp = bytearray(compress_block(data))
    with pytest.raises(BlockDecodeError):
        decompress_block(bytes(comp[:-3]), 10000)     # truncated
    with pytest.raises(BlockDecodeError):
        decompress_block(b"", 10)                      # empty
    # offset of zero
    bad = bytes([0x10, ord("a"), 0x00, 0x00, 0x00])
    with pytest.raises(BlockDecodeError):
        decompress_block(bad, 100)
    # output overflow
    with pytest.raises(BlockDecodeError):
        decompress_block(compress_block(data), len(data) - 1)


def test_acceleration_tradeoff():
    data = gen_buffer(65536, match_prob=0.7, seed=11)
    sizes = [len(compress_block(data, acceleration=a)) for a in (1, 8, 64)]
    assert sizes[0] <= sizes[1] <= sizes[2]
    for a in (1, 8, 64):
        comp = compress_block(data, acceleration=a)
        assert decompress_block(comp, len(data)) == data


def test_native_destsize():
    """Fill-output mode: valid stream, byte-exact prefix, fits budget
    (LZ4_compress_destSize analog)."""
    import pytest
    try:
        from lz4_tpu import native
        bc = native.blockcodec
    except ImportError:
        pytest.skip("native backend unavailable")
    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.utils.datagen import gen_buffer
    raw = gen_buffer(50000, match_prob=0.6, seed=3)
    for cap in (64, 500, 4000, 20000, 200000):
        comp, consumed = bc.compress_destsize(raw, cap)
        assert len(comp) <= cap
        assert 0 <= consumed <= len(raw)
        if consumed:
            dec = decompress_block(comp, consumed)
            assert dec == raw[:consumed]
