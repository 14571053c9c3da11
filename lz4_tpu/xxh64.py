"""XXH64 — one-shot + streaming, pure python with a ctypes fast path.

The LZ4 formats themselves only ever use XXH32 (frame header/block/
content checksums), but the reference vendors the full xxhash pair
(lib/xxhash.c, SURVEY.md §2 #13); XXH64 completes that surface for
users who relied on it. Algorithm: the public xxHash64 specification —
like XXH32 this is (b)-class unavoidable similarity: the algorithm IS
the spec and output must be bit-exact.
"""
from __future__ import annotations

M64 = (1 << 64) - 1
P64_1 = 11400714785074694791
P64_2 = 14029467366897019727
P64_3 = 1609587929392839161
P64_4 = 9650029242287828579
P64_5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, val: int) -> int:
    acc = (acc + val * P64_2) & M64
    return (_rotl(acc, 31) * P64_1) & M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P64_1 + P64_4) & M64


def _finalize(h: int, tail: bytes) -> int:
    i, n = 0, len(tail)
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(tail[i:i + 8], "little"))
        h = (_rotl(h, 27) * P64_1 + P64_4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(tail[i:i + 4], "little") * P64_1) & M64
        h = (_rotl(h, 23) * P64_2 + P64_3) & M64
        i += 4
    while i < n:
        h ^= (tail[i] * P64_5) & M64
        h = (_rotl(h, 11) * P64_1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 0) -> int:
    try:
        from lz4_tpu import native
        lib = native._load()
        if lib is not None:
            import ctypes
            lib.lz4t_xxh64.restype = ctypes.c_uint64
            lib.lz4t_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                       ctypes.c_uint64]
            return lib.lz4t_xxh64(bytes(data), len(data), seed & M64)
    except Exception:
        pass
    return XXH64State(seed).update(data).digest()


class XXH64State:
    """Streaming XXH64 (reset/update/digest)."""

    def __init__(self, seed: int = 0):
        self.seed = seed & M64
        self.reset()

    def reset(self) -> "XXH64State":
        s = self.seed
        self._v = [(s + P64_1 + P64_2) & M64, (s + P64_2) & M64, s,
                   (s - P64_1) & M64]
        self._buf = b""
        self._total = 0
        return self

    def update(self, data: bytes) -> "XXH64State":
        data = bytes(data)
        self._total += len(data)
        buf = self._buf + data
        v = self._v
        i = 0
        while i + 32 <= len(buf):
            for k in range(4):
                v[k] = _round(v[k], int.from_bytes(
                    buf[i + 8 * k: i + 8 * k + 8], "little"))
            i += 32
        self._buf = buf[i:]
        return self

    def digest(self) -> int:
        v = self._v
        if self._total >= 32:
            h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12)
                 + _rotl(v[3], 18)) & M64
            for k in range(4):
                h = _merge(h, v[k])
        else:
            h = (self.seed + P64_5) & M64
        h = (h + self._total) & M64
        return _finalize(h, self._buf)
