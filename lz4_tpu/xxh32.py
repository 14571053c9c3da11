"""XXH32 — clean-room implementation of the public xxHash32 algorithm.

Implements the published XXH32 specification (the reference vendors it at
lib/xxhash.c; the algorithm itself is public:
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). Used for
the LZ4 frame header-checksum byte, optional block checksums and the
content checksum.

Three backends:
  * a vectorized numpy one-shot (fast enough for tests / small data),
  * a streaming accumulator class (frame content checksums of arbitrary
    length, incremental updates),
  * an optional native C backend (lz4_tpu/native) used automatically when
    available — the production host path.
"""
from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M32, 13) * _P1) & _M32


def _avalanche(h: int) -> int:
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def _np_u32(data) -> np.ndarray:
    buf = np.frombuffer(memoryview(data), dtype=np.uint8)
    return buf


def xxh32(data, seed: int = 0) -> int:
    """One-shot XXH32 of a bytes-like object."""
    native = _native()
    if native is not None:
        return native.xxh32(bytes(data) if not isinstance(data, (bytes, bytearray, memoryview)) else data, seed)
    return _xxh32_py(data, seed)


def _xxh32_py(data, seed: int = 0) -> int:
    buf = _np_u32(data)
    n = buf.size
    seed &= _M32
    pos = 0
    if n >= 16:
        nstripes = n // 16
        # Vectorized lane processing: each accumulator consumes every 4th
        # 32-bit word. The per-stripe chain is serial, but numpy evaluates
        # the four lanes' word streams without a Python inner loop per byte.
        words = (
            buf[: nstripes * 16]
            .view("<u4")
            .reshape(nstripes, 4)
            .astype(np.uint64)
        )
        accs = [
            (seed + _P1 + _P2) & _M32,
            (seed + _P2) & _M32,
            seed,
            (seed - _P1) & _M32,
        ]
        for s in range(nstripes):
            w = words[s]
            for i in range(4):
                accs[i] = _round(accs[i], int(w[i]))
        h = (_rotl(accs[0], 1) + _rotl(accs[1], 7)
             + _rotl(accs[2], 12) + _rotl(accs[3], 18)) & _M32
        pos = nstripes * 16
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    # 4-byte words of the tail
    while pos + 4 <= n:
        w = int(buf[pos]) | int(buf[pos + 1]) << 8 | int(buf[pos + 2]) << 16 | int(buf[pos + 3]) << 24
        h = (_rotl((h + w * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + int(buf[pos]) * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    return _avalanche(h)


class XXH32State:
    """Streaming XXH32 (reset/update/digest), mirroring the public
    streaming contract (xxhash.h:169-241 behaviourally)."""

    def __init__(self, seed: int = 0):
        self.reset(seed)

    def reset(self, seed: int = 0) -> None:
        seed &= _M32
        self._seed = seed
        self._acc = [
            (seed + _P1 + _P2) & _M32,
            (seed + _P2) & _M32,
            seed,
            (seed - _P1) & _M32,
        ]
        self._buf = b""
        self._total = 0
        self._large = False

    def update(self, data) -> None:
        data = bytes(data)
        self._total += len(data)
        data = self._buf + data
        nstripes = len(data) // 16
        if nstripes:
            self._large = True
            native = _native()
            if native is not None:
                self._acc = list(native.xxh32_rounds(data[: nstripes * 16], self._acc))
            else:
                words = np.frombuffer(data[: nstripes * 16], dtype="<u4").reshape(nstripes, 4)
                a = self._acc
                for s in range(nstripes):
                    w = words[s]
                    for i in range(4):
                        a[i] = _round(a[i], int(w[i]))
                self._acc = a
        self._buf = data[nstripes * 16:]

    def digest(self) -> int:
        if self._large:
            h = (_rotl(self._acc[0], 1) + _rotl(self._acc[1], 7)
                 + _rotl(self._acc[2], 12) + _rotl(self._acc[3], 18)) & _M32
        else:
            h = (self._seed + _P5) & _M32
        h = (h + self._total) & _M32
        buf = self._buf
        pos = 0
        while pos + 4 <= len(buf):
            w = int.from_bytes(buf[pos:pos + 4], "little")
            h = (_rotl((h + w * _P3) & _M32, 17) * _P4) & _M32
            pos += 4
        while pos < len(buf):
            h = (_rotl((h + buf[pos] * _P5) & _M32, 11) * _P1) & _M32
            pos += 1
        return _avalanche(h)


_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Lazy-load the C backend; returns None when unavailable."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from lz4_tpu.native import xxh as _x
            _NATIVE = _x
        except Exception:
            _NATIVE = None
    return _NATIVE


def xxh32_batch(blocks: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH32 of many equal-capacity blocks (uint8 [B, cap]) with per-block
    lengths. Used for per-block checksums of a batch. numpy fallback loops
    per block; the native backend does it in C."""
    native = _native()
    out = np.empty(blocks.shape[0], dtype=np.uint32)
    for i in range(blocks.shape[0]):
        data = blocks[i, : int(lengths[i])].tobytes()
        out[i] = native.xxh32(data, seed) if native is not None else _xxh32_py(data, seed)
    return out
