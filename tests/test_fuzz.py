"""Randomized round-trip + robustness fuzzing — the tests/fuzzer.c and
tests/frametest.c analog (SURVEY.md §4.1): seeded PRNG, random blocks
from compressible noise, random dictionaries/levels, corruption and
truncation of decode inputs, random chunking of the streaming APIs.
Bounded cycles so the suite stays fast; a seed env knob widens runs.
"""
import os
import random

import numpy as np
import pytest

from lz4_tpu.block.backend import HostBackend
from lz4_tpu.block.encode_jax import encode_blocks_host
from lz4_tpu.block.ref_codec import (
    BlockDecodeError,
    compress_block,
    decompress_block,
)
from lz4_tpu.frame.format import FrameError, Preferences, FrameInfo
from lz4_tpu.frame.reader import FrameDecompressor, decompress_frame
from lz4_tpu.frame.writer import FrameCompressor, compress_frame
from lz4_tpu.utils.datagen import gen_buffer

N_CYCLES = int(os.environ.get("LZ4_TPU_FUZZ_CYCLES", "30"))
SEED = int(os.environ.get("LZ4_TPU_FUZZ_SEED", "20260816"))


def _random_block(rng: random.Random) -> bytes:
    size = rng.choice([0, 1, 5, 13, 64, 1000, 5000, 20000])
    prob = rng.choice([0.0, 0.3, 0.7, 0.95])
    return gen_buffer(size, match_prob=prob, seed=rng.randrange(1 << 30))


def test_block_roundtrip_fuzz():
    rng = random.Random(SEED)
    for cycle in range(N_CYCLES):
        raw = _random_block(rng)
        use_dict = rng.random() < 0.4
        dict_prefix = (_random_block(rng) or b"x") if use_dict else None
        level = rng.choice([1, 1, 1, 2, 5, 9, 12])
        if level >= 2:
            from lz4_tpu.hc.codec import compress_block_hc
            comp = compress_block_hc(raw, level=level,
                                     dict_prefix=dict_prefix)
        elif rng.random() < 0.5:
            comp = encode_blocks_host([raw],
                                      dict_prefixes=[dict_prefix])[0]
        else:
            comp = compress_block(raw, dict_prefix=dict_prefix)
        dec = decompress_block(comp, max(1, len(raw)),
                               dict_prefix=dict_prefix)
        assert dec == raw, f"cycle {cycle}"


def test_decoder_rejects_corruption():
    """Corrupted/truncated blocks must raise, never mis-decode the
    originals or crash (lz4.h:200-203 safety contract)."""
    rng = random.Random(SEED + 1)
    raw = gen_buffer(8000, match_prob=0.6, seed=3)
    comp = bytearray(compress_block(raw))
    for _ in range(N_CYCLES):
        blob = bytearray(comp)
        op = rng.randrange(3)
        if op == 0:     # flip a byte
            blob[rng.randrange(len(blob))] ^= 1 + rng.randrange(255)
        elif op == 1:   # truncate
            del blob[rng.randrange(1, len(blob)):]
        else:           # insert garbage
            blob[rng.randrange(len(blob)):0] = bytes([rng.randrange(256)])
        try:
            out = decompress_block(bytes(blob), len(raw))
            # a mutation may still be a valid stream; output must just
            # be within bounds
            assert len(out) <= len(raw)
        except BlockDecodeError:
            pass


def test_jax_decoder_rejects_corruption():
    from lz4_tpu.block.decode_jax import decode_blocks_host
    rng = random.Random(SEED + 2)
    raw = gen_buffer(8000, match_prob=0.6, seed=3)
    comp = bytearray(compress_block(raw))
    for _ in range(10):
        blob = bytearray(comp)
        if rng.random() < 0.5:
            blob[rng.randrange(len(blob))] ^= 1 + rng.randrange(255)
        else:
            del blob[rng.randrange(1, len(blob)):]
        try:
            out = decode_blocks_host([bytes(blob)], [len(raw)])[0]
            assert len(out) <= len(raw)
        except BlockDecodeError:
            pass


def test_frame_random_chunking():
    """Random input/output chunking of the streaming frame APIs
    (frametest.c:997 analog)."""
    rng = random.Random(SEED + 3)
    for cycle in range(8):
        data = gen_buffer(rng.choice([0, 100, 70000, 200000]),
                          match_prob=0.7, seed=cycle)
        info = FrameInfo(
            block_size_id=rng.choice([4, 5]),
            block_independent=rng.random() < 0.5,
            block_checksum=rng.random() < 0.5,
            content_checksum=rng.random() < 0.5,
        )
        comp = FrameCompressor(Preferences(frame_info=info))
        out = bytearray(comp.begin())
        pos = 0
        while pos < len(data):
            step = rng.randrange(1, 50000)
            out += comp.update(data[pos: pos + step])
            pos += step
            if rng.random() < 0.2:
                out += comp.flush()
        out += comp.end()

        dec = FrameDecompressor()
        got = bytearray()
        pos = 0
        blob = bytes(out)
        while not dec.frame_done:
            step = rng.randrange(1, 30000)
            produced, consumed = dec.feed(blob[pos: pos + step])
            got += produced
            pos += consumed
            assert pos <= len(blob)
        assert bytes(got) == data, f"cycle {cycle}"


def test_frame_corruption_detected():
    rng = random.Random(SEED + 4)
    data = gen_buffer(50000, match_prob=0.7, seed=1)
    blob = compress_frame(data)     # content checksum on by default
    for _ in range(N_CYCLES):
        bad = bytearray(blob)
        bad[rng.randrange(len(bad))] ^= 1 + rng.randrange(255)
        try:
            out = decompress_frame(bytes(bad))
            assert out == data      # only if the flip hit dead space
        except (FrameError, BlockDecodeError, ValueError):
            pass


def test_partial_decode_sweep():
    """LZ4_decompress_safe_partial analog: every target length."""
    raw = gen_buffer(5000, match_prob=0.7, seed=2)
    comp = compress_block(raw)
    for target in [0, 1, 7, 100, 2500, 4999, 5000]:
        out = decompress_block(comp, target, partial=True)
        assert out == raw[:target]


@pytest.mark.skipif(not os.environ.get("LZ4_TPU_TORTURE"),
                    reason="set LZ4_TPU_TORTURE=1 for the 90s torture run")
def test_torture_long():
    """The reference's `fuzzer -T90s` analog + differential decode vs
    liblz4 (tools/torture.py). Env-gated: too slow for every CI run."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "torture.py"),
         "--cpu", "--seconds", os.environ.get("LZ4_TPU_TORTURE_SECONDS",
                                              "90")],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_torture_short():
    """Always-on 25 s differential torture cycle (host C + chunked DP
    vs real liblz4 via tools/torture.py --no-device): plain `pytest -q`
    now covers the differential fuzzer (round-3 verdict #8). The 90 s
    device-codec run stays env-gated above."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "torture.py"),
         "--no-device", "--wave", "--seconds", "25"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
