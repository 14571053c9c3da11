"""Vectorized JAX encoder: round-trip, interop, ratio and dict tests.

Mirrors the reference test strategy (SURVEY.md §4): XXH32/byte-exact
round-trip oracles over seeded corpora of controlled compressibility,
plus cross-decoder interop vs liblz4.
"""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.encode_jax import encode_blocks_host
from lz4_tpu.block.ref_codec import compress_block, decompress_block
from lz4_tpu.utils.datagen import gen_buffer


CASES = [
    b"",
    b"a",
    b"abcd" * 3,
    b"hello world hello world hello world hello",
    b"\x00" * 1000,
    b"ab" * 4000,                      # period-2 RLE
    bytes(range(256)) * 16,            # period-256
]


def _rt(raw: bytes) -> bytes:
    comp = encode_blocks_host([raw])[0]
    return decompress_block(comp, max(len(raw), 1)) if raw else \
        decompress_block(comp, 1)


@pytest.mark.parametrize("raw", CASES, ids=range(len(CASES)))
def test_roundtrip_small(raw):
    assert _rt(raw) == raw


@pytest.mark.parametrize("prob", [0.0, 0.3, 0.7, 0.95])
def test_roundtrip_seeded(prob):
    raw = gen_buffer(32768, match_prob=prob, seed=int(prob * 100))
    assert _rt(raw) == raw


def test_roundtrip_incompressible():
    rng = np.random.default_rng(5)
    raw = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    comp = encode_blocks_host([raw])[0]
    assert decompress_block(comp, len(raw)) == raw
    # worst case stays within compress_bound
    from lz4_tpu.constants import compress_bound
    assert len(comp) <= compress_bound(len(raw))


def test_batch_mixed_sizes():
    blocks = [gen_buffer(1000 + 997 * i, match_prob=0.5, seed=i)
              for i in range(5)]
    comp = encode_blocks_host(blocks)
    for raw, c in zip(blocks, comp):
        assert decompress_block(c, len(raw)) == raw


def test_linked_blocks_dict():
    data = gen_buffer(3 * 16384, match_prob=0.8, seed=9)
    bs = 16384
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)]
    prefixes = [None] + [data[max(0, i - 65536): i]
                         for i in range(bs, len(data), bs)]
    comp = encode_blocks_host(blocks, dict_prefixes=prefixes)
    # linked blocks must decode with their history, and exploiting the
    # dict must help vs independent compression
    indep = encode_blocks_host(blocks)
    for i, (raw, c) in enumerate(zip(blocks, comp)):
        assert decompress_block(c, bs, dict_prefix=prefixes[i]) == raw
    assert sum(map(len, comp)) <= sum(map(len, indep))


def test_ratio_competitive_with_host_oracle():
    """The vectorized parse must stay within 15% of the exact host
    matcher's compressed size on typical data."""
    raw = gen_buffer(65536, match_prob=0.7, seed=7)
    jax_size = len(encode_blocks_host([raw])[0])
    host_size = len(compress_block(raw))
    assert jax_size <= host_size * 1.15


@needs_oracle
def test_ref_decodes_our_blocks():
    import ref_oracle
    for prob, seed in [(0.3, 1), (0.7, 2), (0.95, 3)]:
        raw = gen_buffer(49152, match_prob=prob, seed=seed)
        comp = encode_blocks_host([raw])[0]
        assert ref_oracle.ref_decompress_block(comp, len(raw)) == raw


@needs_oracle
def test_size_parity_vs_reference():
    """Compressed size must be <= reference's on standard corpora
    (BASELINE.json north star), modulo a small tolerance on the
    pathological highly-repetitive case."""
    import ref_oracle
    worst = 0.0
    for prob, seed in [(0.3, 11), (0.5, 12), (0.7, 13)]:
        raw = gen_buffer(65536, match_prob=prob, seed=seed)
        ours = len(encode_blocks_host([raw])[0])
        ref = len(ref_oracle.ref_compress_block(raw, 1))
        worst = max(worst, ours / ref)
    assert worst <= 1.0, f"worst size ratio vs reference: {worst:.3f}"
