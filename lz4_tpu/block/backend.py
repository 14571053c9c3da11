"""Block-codec backend protocol.

The frame layer drives block compression through this interface (the
analog of lz4frame's compressFunc_t dispatch table, lz4frame.c:952-962)
so the same frame code runs over:
  * HostBackend  — numpy/C oracle codec (small inputs, tests, CLI fallback)
  * TPU backends — batched vectorized JAX/Pallas engines
                   (lz4_tpu.parallel.engine), which consume whole lists of
                   blocks at once: frame-level batching IS the TPU
                   data-parallel decomposition.
"""
from __future__ import annotations

from typing import Protocol, Sequence


class BlockBackend(Protocol):
    def compress_batch(
        self,
        blocks: Sequence[bytes],
        *,
        level: int = 0,
        acceleration: int = 1,
        dict_prefixes: Sequence[bytes | None] | None = None,
    ) -> list[bytes]:
        ...

    def decompress_batch(
        self,
        blocks: Sequence[bytes],
        max_outs: Sequence[int],
        *,
        dict_prefixes: Sequence[bytes | None] | None = None,
    ) -> list[bytes]:
        ...


class HostBackend:
    """Host block codec: native C fast path (lz4_tpu.native.blockcodec)
    with the numpy oracle as fallback; HC levels use the python HC tier."""

    def __init__(self):
        try:
            from lz4_tpu import native
            self._native = native.blockcodec
        except Exception:
            self._native = None

    def compress_batch(self, blocks, *, level=0, acceleration=1,
                       dict_prefixes=None):
        from lz4_tpu.block.ref_codec import compress_block
        from lz4_tpu.hc.codec import compress_block_hc
        out = []
        for i, b in enumerate(blocks):
            d = dict_prefixes[i] if dict_prefixes else None
            if level >= 2 and self._native is not None:
                out.append(self._native.compress_hc(b, level=level,
                                                    dict_prefix=d))
            elif level >= 2:
                out.append(compress_block_hc(b, level=level, dict_prefix=d))
            elif self._native is not None:
                out.append(self._native.compress(
                    b, dict_prefix=d, acceleration=max(1, acceleration)))
            else:
                out.append(compress_block(b, acceleration=max(1, acceleration),
                                          dict_prefix=d))
        return out

    def decompress_batch(self, blocks, max_outs, *, dict_prefixes=None):
        from lz4_tpu.block.ref_codec import decompress_block
        out = []
        for i, b in enumerate(blocks):
            d = dict_prefixes[i] if dict_prefixes else None
            if self._native is not None:
                out.append(self._native.decompress(b, max_outs[i],
                                                   dict_prefix=d))
            else:
                out.append(decompress_block(b, max_outs[i], dict_prefix=d))
        return out


_DEFAULT: BlockBackend | None = None


def default_backend() -> BlockBackend:
    """Process-wide default backend. Starts as HostBackend; the parallel
    engine installs a TPU backend via set_default_backend()."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = HostBackend()
    return _DEFAULT


def set_default_backend(b: BlockBackend | None) -> None:
    global _DEFAULT
    _DEFAULT = b
