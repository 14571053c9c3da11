"""lz4_tpu — a TPU-native LZ4 codec framework (JAX / XLA / Pallas).

Public API mirrors the capability surface of the reference lz4/lz4
project (block codec with acceleration + HC levels, the .lz4 frame
format with streaming and dictionaries, legacy/skippable frames, a
CLI, and a benchmark harness) re-designed TPU-first: batched
vectorized kernels over device meshes instead of serial byte cursors.
"""

__version__ = "0.1.0"

from lz4_tpu.constants import compress_bound  # noqa: F401
from lz4_tpu.xxh32 import xxh32, XXH32State  # noqa: F401


def compress(data: bytes, level: int = 1, **kw) -> bytes:
    """One-shot frame compression (LZ4F_compressFrame analog)."""
    from lz4_tpu.frame.writer import compress_frame
    return compress_frame(data, level=level, **kw)


def decompress(data: bytes, **kw) -> bytes:
    """One-shot frame decompression (LZ4F_decompress analog)."""
    from lz4_tpu.frame.reader import decompress_frame
    return decompress_frame(data, **kw)
