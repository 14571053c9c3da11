"""Encoder token-merge regression tests.

The merge pass (encode_jax._emit_one stage 4) collapses contiguous
same-offset continuation chains produced when the carried forward
context caps a measured match length. These tests pin its correctness
on data engineered to force truncation-and-continuation, and its size
win vs the reference encoder.
"""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.encode_jax import ENC_NW, encode_blocks_host
from lz4_tpu.block.ref_codec import decompress_block


def _periodic(period: int, n: int, seed: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    unit = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
    return (unit * (n // period + 1))[:n]


@pytest.mark.parametrize("period", [48, 97, 260, 1021])
def test_long_periodic_matches_roundtrip(period):
    # period > ext cap (4*NW) forces context-capped match measurement;
    # candidates advance in lockstep inside the period, so the merge
    # must reassemble full-length matches without corrupting offsets
    raw = _periodic(period, 65536)
    comp = encode_blocks_host([raw])[0]
    assert decompress_block(comp, len(raw)) == raw
    # a full-period match chain should compress to well under 5% of n
    assert len(comp) < len(raw) // 20


def test_interleaved_runs_roundtrip():
    # alternating structured/unstructured spans: merges must stop at
    # every literal boundary
    rng = np.random.default_rng(9)
    parts = []
    for i in range(40):
        if i % 2:
            parts.append(rng.integers(0, 256, 331, dtype=np.uint8)
                         .tobytes())
        else:
            parts.append(_periodic(53 + i, 1200, seed=i))
    raw = b"".join(parts)[:65536]
    comp = encode_blocks_host([raw])[0]
    assert decompress_block(comp, len(raw)) == raw


@needs_oracle
def test_merge_beats_reference_on_long_periods():
    import ref_oracle as ro
    raw = _periodic(4 * ENC_NW + 17, 65536)   # just past the ext cap
    ours = len(encode_blocks_host([raw])[0])
    ref = len(ro.ref_compress_block(raw, 1))
    assert ours <= ref
