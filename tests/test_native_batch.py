"""Native batch entry points: equivalence, edge cases, error paths."""
import numpy as np
import pytest

pytest.importorskip("lz4_tpu.native")
from lz4_tpu import native
from lz4_tpu.block.backend import HostBackend
from lz4_tpu.block.ref_codec import BlockDecodeError
from lz4_tpu.utils.datagen import gen_buffer, gen_text

try:
    BC = native.blockcodec
except ImportError:                      # no compiler in env
    BC = None

pytestmark = pytest.mark.skipif(BC is None, reason="no native backend")


def _mixed_blocks():
    rng = np.random.default_rng(5)
    return [
        b"",
        b"x",
        b"hello world " * 700,
        gen_text(65536, seed=1),
        rng.bytes(40000),                      # incompressible
        b"\x00" * 65536,
        gen_buffer(12345, 0.7, seed=2),
    ]


def test_batch_compress_roundtrips_mixed_sizes():
    blocks = _mixed_blocks()
    comp = BC.compress_batch(blocks)
    for b, c in zip(blocks, comp):
        assert BC.decompress(c, max(len(b), 1)) == b


def test_batch_decompress_matches_per_block():
    blocks = _mixed_blocks()
    comp = [BC.compress(b) for b in blocks]
    outs = BC.decompress_batch(comp, [max(len(b), 1) for b in blocks])
    assert outs == [BC.decompress(c, max(len(b), 1))
                    for c, b in zip(comp, blocks)]
    assert outs == blocks or outs[:1] == [b""]  # empty decodes to b""


def test_batch_decompress_flags_malformed_block_index():
    blocks = [gen_text(4096, seed=3), gen_text(4096, seed=4)]
    comp = [BC.compress(b) for b in blocks]
    comp[1] = comp[1][:-3]                      # truncate -> malformed
    with pytest.raises(BlockDecodeError):
        BC.decompress_batch(comp, [4096, 4096])


def test_backend_batch_equals_scalar_paths():
    blocks = [gen_text(30000, seed=i) for i in range(6)]
    hb0 = HostBackend(nb_workers=0)
    hb4 = HostBackend(nb_workers=4)
    c0 = hb0.compress_batch(blocks, level=1)
    c4 = hb4.compress_batch(blocks, level=1)
    assert c0 == c4
    d0 = hb0.decompress_batch(c0, [len(b) for b in blocks])
    d4 = hb4.decompress_batch(c0, [len(b) for b in blocks])
    assert d0 == d4 == blocks


def test_backend_dict_batches_bypass_fast_path():
    # linked prefixes route through the per-block dict path and still
    # round-trip
    hb = HostBackend(nb_workers=0)
    data = gen_text(200000, seed=7)
    bs = 65536
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)]
    prefixes = [None] + [blocks[i - 1] for i in range(1, len(blocks))]
    comp = hb.compress_batch(blocks, level=1, dict_prefixes=prefixes)
    out = hb.decompress_batch(comp, [len(b) for b in blocks],
                              dict_prefixes=prefixes)
    assert out == blocks
