"""Device XXH32 (scan + Pallas interpret) vs the host/native oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from lz4_tpu.xxh32 import xxh32
from lz4_tpu.xxh32_device import (
    HAVE_PALLAS,
    xxh32_blocks,
    xxh32_blocks_pallas,
)
from lz4_tpu.utils.datagen import gen_buffer


def _batch(cases, cap):
    B = len(cases)
    data = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(cases):
        data[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    return jnp.asarray(data), jnp.asarray(lens)


CASES = [b"", b"a", b"abc", b"0123456789abcde", b"0123456789abcdef",
         b"0123456789abcdef0", gen_buffer(1000, seed=1),
         gen_buffer(4096, seed=2), gen_buffer(4095, seed=3),
         gen_buffer(4093, seed=4)]


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_xxh32_blocks_scan(seed):
    cap = 4096
    data, lens = _batch(CASES, cap)
    got = np.asarray(xxh32_blocks(data, lens, seed, cap=cap))
    for i, c in enumerate(CASES):
        assert got[i] == xxh32(c, seed), f"case {i}"


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_xxh32_blocks_pallas_interpret():
    cap = 4096
    data, lens = _batch(CASES, cap)
    got = np.asarray(xxh32_blocks_pallas(data, lens, 0, cap=cap,
                                         interpret=True))
    for i, c in enumerate(CASES):
        assert got[i] == xxh32(c, 0), f"case {i}"
