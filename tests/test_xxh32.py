"""XXH32 against published test vectors and the reference library."""
import os

import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.xxh32 import XXH32State, xxh32, _xxh32_py

# Published xxHash32 sanity vectors (from the public xxhash spec)
VECTORS = [
    (b"", 0, 0x02CC5D05),
    (b"", 0x9E3779B1, 0x36B78AE7),
]


@pytest.mark.parametrize("data,seed,want", VECTORS)
def test_vectors(data, seed, want):
    assert xxh32(data, seed) == want


def test_python_backend_matches_default():
    rng = np.random.default_rng(0)
    for n in [0, 1, 3, 4, 15, 16, 17, 63, 64, 1000, 4096]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _xxh32_py(data, 0) == xxh32(data, 0)
        assert _xxh32_py(data, 12345) == xxh32(data, 12345)


@needs_oracle
def test_against_reference():
    from ref_oracle import ref_xxh32
    rng = np.random.default_rng(1)
    for n in [0, 1, 5, 14, 15, 16, 17, 31, 32, 100, 65536, 100001]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (0, 1, 0xDEADBEEF):
            assert xxh32(data, seed) == ref_xxh32(data, seed), (n, seed)


def test_streaming_matches_oneshot():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    for chunks in ([100000], [1] * 50 + [99950], [7, 9, 15, 16, 17, 99936],
                   [65536, 34464]):
        st = XXH32State(seed=7)
        pos = 0
        for c in chunks:
            st.update(data[pos:pos + c])
            pos += c
        assert pos == len(data)
        assert st.digest() == xxh32(data, 7)


def test_native_backend_if_available():
    if os.environ.get("LZ4_TPU_NO_NATIVE"):
        pytest.skip("native disabled")
    try:
        from lz4_tpu.native import xxh
    except ImportError:
        pytest.skip("no compiler")
    data = b"hello world, native backend check" * 100
    assert xxh.xxh32(data, 0) == _xxh32_py(data, 0)
