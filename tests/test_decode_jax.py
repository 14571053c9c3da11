"""Vectorized JAX decoder vs the host oracle + reference encoder output."""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.decode_jax import decode_blocks_host
from lz4_tpu.block.ref_codec import BlockDecodeError, compress_block
from lz4_tpu.hc.codec import compress_block_hc
from lz4_tpu.utils.datagen import gen_buffer


def corpora():
    yield b""
    yield b"a"
    yield b"abcabcabcabcabcabcabcabcabc"
    yield b"x" * 13
    yield b"x" * 100000            # deep RLE chains (offset 1)
    yield bytes(range(256)) * 64
    yield gen_buffer(65536, match_prob=0.7, seed=3)
    yield gen_buffer(65536, match_prob=0.0, seed=4)
    yield gen_buffer(65535, match_prob=0.9, seed=5)
    yield gen_buffer(300, match_prob=0.95, seed=6)
    yield np.random.default_rng(7).integers(0, 3, 70000, dtype=np.uint8).tobytes()


def test_roundtrip_batch():
    data = list(corpora())
    comp = [compress_block(d) for d in data]
    out = decode_blocks_host(comp, [max(len(d), 1) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_roundtrip_hc_streams():
    data = [gen_buffer(65536, match_prob=0.7, seed=s) for s in range(3)]
    comp = [compress_block_hc(d, level=l) for d, l in zip(data, (3, 9, 12))]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want


@needs_oracle
def test_decodes_reference_streams():
    from ref_oracle import ref_compress_block
    data = [d for d in corpora() if d]
    comp = [ref_compress_block(d) for d in data]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want
    comp_hc = [ref_compress_block(d, level=9) for d in data]
    out = decode_blocks_host(comp_hc, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_dict_decode():
    hist = gen_buffer(70000, match_prob=0.8, seed=8)
    data = hist[100:2100] + b"new" + hist[60000:62000]
    comp = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([comp], [len(data)],
                             dict_prefixes=[hist[-65535:]])
    assert out[0] == data


def test_short_dict_decode():
    hist = b"hello world, this is history"
    data = b"hello world, this is history repeated"
    comp = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([comp], [len(data)], dict_prefixes=[hist])
    assert out[0] == data


def test_malformed_flagged():
    data = gen_buffer(30000, match_prob=0.7, seed=9)
    comp = compress_block(data)
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([comp[:-4]], [len(data)])
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([bytes([0x10, ord("a"), 0, 0, 0])], [100])
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([comp], [len(data) - 1])   # output overflow


def test_mixed_batch_capacities():
    blocks = [compress_block(gen_buffer(n, match_prob=0.6, seed=n))
              for n in (100, 5000, 65536)]
    outs = decode_blocks_host(blocks, [100, 5000, 65536])
    assert [len(o) for o in outs] == [100, 5000, 65536]


def test_fuzz_roundtrip():
    rng = np.random.default_rng(11)
    data, comp = [], []
    for _ in range(40):
        n = int(rng.integers(0, 3000))
        p = float(rng.random())
        d = gen_buffer(n, match_prob=p, seed=int(rng.integers(1 << 30))) if n else b""
        data.append(d)
        comp.append(compress_block(d))
    out = decode_blocks_host(comp, [max(1, len(d)) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_decode_64k_text_blocks():
    """64 KB text blocks produce dense, deeply-chained matches — a
    regression gate for future chase redesigns (a round-1 experiment
    silently mis-decoded exactly this shape)."""
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.block.decode_jax import decode_blocks_host
    from lz4_tpu.utils.datagen import gen_text
    bs = 65536
    blocks = [gen_text(bs, seed=i) for i in range(3)]
    comp = HostBackend().compress_batch(blocks)
    out = decode_blocks_host(comp, [bs] * 3)
    assert out == blocks


def test_device_partial_decode():
    """LZ4_decompress_safe_partial analog on device (lz4.c:2450-2560):
    target sweep, truncated input, dict mode."""
    from lz4_tpu.block.ref_codec import compress_block
    from lz4_tpu.utils.datagen import gen_text
    raw = gen_text(30000, seed=3)
    comp = compress_block(raw)
    for target in (0, 1, 100, 7777, 29999, 30000):
        out = decode_blocks_host([comp], [target], partial=True)[0]
        assert out == raw[:target]
    half = decode_blocks_host([comp[: len(comp) // 2]], [30000],
                              partial=True)[0]
    assert raw.startswith(half) and half
    hist = gen_text(65536, seed=9)
    data = hist[100:8000]
    c2 = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([c2], [4000], dict_prefixes=[hist],
                             partial=True)[0]
    assert out == data[:4000]


def test_big_tier_device_decode():
    """Blocks above the 64 KB tier decode on device: the parse helper
    packs position | byte << SH with SH sized to cap_in (so length
    extensions parsed at stream offsets beyond 2^17 still decode)."""
    from lz4_tpu.hc.codec import compress_block_hc

    data = [
        gen_buffer(262144, match_prob=0.6, seed=21),
        gen_buffer(200000, match_prob=0.05, seed=22),  # mostly literals:
        # the compressed stream is ~200 KB, so late tokens sit past 2^17
        (gen_buffer(1000, match_prob=0.9, seed=23) * 300)[:262144],
    ]
    comp = [compress_block(d) for d in data]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want
    # and an HC stream with long matches (255-chained match lengths)
    d = (b"A" * 70000 + gen_buffer(150000, match_prob=0.3, seed=24))
    c = compress_block_hc(d, level=9)
    (got,) = decode_blocks_host([c], [len(d)])
    assert got == d
