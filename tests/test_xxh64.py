"""XXH64: known vectors, python-vs-C agreement, streaming == one-shot."""
import os
import random

from lz4_tpu.xxh64 import XXH64State, xxh64


def _py(data, seed=0):
    return XXH64State(seed).update(data).digest()


def test_known_vectors():
    # canonical public vectors
    assert _py(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_python_matches_native():
    try:
        from lz4_tpu import native
        if native._load() is None:
            return
    except Exception:
        return
    rng = random.Random(7)
    for n in (0, 1, 3, 4, 7, 8, 31, 32, 33, 100, 4096, 70001):
        data = rng.randbytes(n)
        seed = rng.randrange(1 << 64)
        assert _py(data, seed) == xxh64(data, seed), n


def test_streaming_equals_oneshot():
    rng = random.Random(9)
    data = rng.randbytes(100_000)
    st = XXH64State(12345)
    i = 0
    while i < len(data):
        step = rng.randrange(1, 7000)
        st.update(data[i:i + step])
        i += step
    assert st.digest() == _py(data, 12345)
