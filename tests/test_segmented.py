"""Segmented big-block device encode (256KB-4MB tiers via linked 64KB
segments + host seam folding, parallel/engine.py merge_segment_streams)."""
import os

import pytest

from conftest import needs_oracle
from lz4_tpu.block.backend import HostBackend
from lz4_tpu.block.ref_codec import decompress_block
from lz4_tpu.parallel.engine import TpuBackend
from lz4_tpu.utils.datagen import gen_text, mixed_corpus


def _backend():
    be = TpuBackend(codec=None, max_device_size=4 * 1024 * 1024)
    be.device_dict_mode = True
    return be


CASES = {
    "256K-text": gen_text(262144, seed=61),
    "1M-mixed": mixed_corpus(1048576, seed=62),
    "odd-300001": mixed_corpus(300001, seed=63),
    "128K-random": os.urandom(131072),
    "100K-rle": b"ab" * 50000,
}


@pytest.mark.parametrize("name", list(CASES))
def test_big_block_roundtrip(name):
    b = CASES[name]
    be = _backend()
    out = be.compress_batch([b], level=1)[0]
    assert decompress_block(out, len(b)) == b
    # sizes must stay within a whisker of the host C encoder (seam costs)
    host = HostBackend().compress_batch([b], level=1)[0]
    assert len(out) <= len(host) * 1.03


def test_big_block_with_dict_and_hc():
    hist = gen_text(65536, seed=64)
    data = hist[:40000] + mixed_corpus(200000, seed=65)
    be = _backend()
    out = be.compress_batch([data], level=1, dict_prefixes=[hist])[0]
    assert decompress_block(out, len(data), dict_prefix=hist) == data
    out2 = be.compress_batch([data], level=2, dict_prefixes=[hist])[0]
    assert decompress_block(out2, len(data), dict_prefix=hist) == data
    assert len(out2) <= len(out)


@needs_oracle
def test_big_block_reference_decodes():
    import ref_oracle
    be = _backend()
    for name in ("256K-text", "1M-mixed", "odd-300001"):
        b = CASES[name]
        out = be.compress_batch([b], level=1)[0]
        assert ref_oracle.ref_decompress_block(out, len(b)) == b, name


def test_big_frame_through_cli_paths():
    """-B6 frames produced via the segmented device path must decode by
    our frame reader."""
    from lz4_tpu.frame.format import FrameInfo, Preferences
    from lz4_tpu.frame.reader import decompress_frame
    from lz4_tpu.frame.writer import compress_frame
    data = mixed_corpus(3 * 1048576 + 12345, seed=66)
    prefs = Preferences(frame_info=FrameInfo(block_size_id=6))
    blob = compress_frame(data, prefs=prefs, backend=_backend())
    assert decompress_frame(blob) == data
