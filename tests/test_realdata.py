"""Real-file corpus regression tests.

Round 1's synthetic datagen corpora missed a real-data encoder bug
(spurious back-extension at block starts: the wb/wb2 compare words are
zero-fill below source position 4/8 and fill-vs-fill XOR reads as a
match). These tests pin the minimized repro and run genuine file bytes
through every device encode path.
"""
import jax
import pytest

from conftest import needs_oracle
from lz4_tpu.block.encode_jax import encode_blocks_host
from lz4_tpu.block.ref_codec import decompress_block
from lz4_tpu.utils.realcorpus import real_corpus

jax.config.update("jax_platforms", "cpu")


def test_block_start_back_extension():
    # minimized from the real corpus: candidate at position 2 with a
    # fill-polluted back-extension used to corrupt the first bytes
    b = b"d\n        return"
    c = encode_blocks_host([b])[0]
    assert decompress_block(c, len(b)) == b
    for extra in (b")", b"))", b"x\n  ", b"\x00\x00"):
        b2 = extra + b
        c2 = encode_blocks_host([b2])[0]
        assert decompress_block(c2, len(b2)) == b2


@pytest.mark.parametrize("kw", [{}, {"n_cand": 8, "lazy": True}],
                         ids=["fast", "hc"])
def test_real_corpus_roundtrip(kw):
    data = real_corpus(2 * 1024 * 1024)
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    comp = encode_blocks_host(blocks, **kw)
    for b, c in zip(blocks, comp):
        assert decompress_block(c, len(b)) == b


def test_real_corpus_device_decode():
    from lz4_tpu.block.decode_jax import decode_blocks_host
    from lz4_tpu.block.ref_codec import compress_block
    data = real_corpus(512 * 1024)
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    comp = [compress_block(b) for b in blocks]
    outs = decode_blocks_host(comp, [len(b) for b in blocks])
    assert outs == blocks


def test_real_corpus_segmented_big():
    from lz4_tpu.parallel.engine import TpuBackend
    be = TpuBackend(codec=None, max_device_size=4 * 1024 * 1024)
    be.device_dict_mode = True
    data = real_corpus(1024 * 1024 + 7777)
    out = be.compress_batch([data], level=1)[0]
    assert decompress_block(out, len(data)) == data


@needs_oracle
def test_real_corpus_reference_interop():
    import ref_oracle
    data = real_corpus(512 * 1024)
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    comp = encode_blocks_host(blocks)
    for b, c in zip(blocks, comp):
        assert ref_oracle.ref_decompress_block(c, len(b)) == b
