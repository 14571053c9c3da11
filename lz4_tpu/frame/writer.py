"""LZ4 frame compression: one-shot and streaming writers.

Behavioural parity targets (SURVEY.md §2 #10, #12):
  * LZ4F_compressFrame / Begin / Update / Flush / End
    (lz4frame.c:329-1241) — block cutting, uncompressed-block fallback,
    optional block checksums, content checksum, endmark, linked-block
    64 KB carry.
  * LZ4F_CDict (lz4frame.c:531-588) — reusable digested dictionary.

TPU-first design difference: in linked mode each block's dictionary is a
slice of the *raw input* (the previous 64 KB), which is known before any
compression happens — so linked blocks are compressed as one parallel
batch instead of the reference's serial per-block streaming state. Frame
bytes remain fully standard.
"""
from __future__ import annotations

import struct

from lz4_tpu.block.backend import BlockBackend, default_backend
from lz4_tpu.constants import (
    BLOCK_SIZES,
    BLOCK_UNCOMPRESSED_FLAG,
    LEGACY_BLOCKSIZE,
    LEGACY_MAGIC,
    LZ4_DISTANCE_MAX,
    LZ4F_MAGIC_SKIPPABLE_START,
    optimal_block_size_id,
)
from lz4_tpu.frame.format import FrameInfo, Preferences, write_frame_header
from lz4_tpu.xxh32 import XXH32State, xxh32


class CDict:
    """Digested dictionary, shareable across frames/threads
    (LZ4F_CDict analog). Keeps the last 64 KB of dict content."""

    def __init__(self, dict_content: bytes, dict_id: int | None = None):
        self.content = bytes(dict_content)[-LZ4_DISTANCE_MAX:]
        self.dict_id = dict_id


def compress_frame_bound(src_size: int, prefs: Preferences | None = None) -> int:
    """Worst-case frame size (LZ4F_compressFrameBound analog)."""
    prefs = prefs or Preferences()
    bs = prefs.frame_info.block_max_size
    if prefs.block_size:
        bs = min(bs, max(32, prefs.block_size))
    nblocks = max(1, -(-src_size // bs))
    per_block = 4 + (4 if prefs.frame_info.block_checksum else 0)
    from lz4_tpu.constants import compress_bound
    return 19 + nblocks * per_block + compress_bound(src_size) + 8


def compress_frame(
    data: bytes,
    level: int = 0,
    prefs: Preferences | None = None,
    *,
    acceleration: int = 1,
    cdict: CDict | None = None,
    backend: BlockBackend | None = None,
    store_content_size: bool = False,
) -> bytes:
    """One-shot frame compression (LZ4F_compressFrame analog).

    Negative `level` maps to acceleration (CLI --fast semantics); levels
    >= 2 use the HC tier.
    """
    prefs = prefs or Preferences()
    backend = backend or default_backend()
    data = bytes(data)
    if level < 0:
        acceleration = max(acceleration, -level)
        level = 0
    info = FrameInfo(**vars(prefs.frame_info))
    if store_content_size or info.content_size is not None:
        info.content_size = len(data)
    if cdict is not None and cdict.dict_id is not None:
        info.dict_id = cdict.dict_id
    bs = info.block_max_size
    if prefs.block_size:
        # exact custom block size (-B#bytes): blocks carry at most this
        # many input bytes under the covering standard tier
        bs = min(bs, max(32, prefs.block_size))
    # single-block frame: shrink block size, independent (lz4frame.c:428-524)
    if len(data) <= bs:
        info.block_size_id = optimal_block_size_id(len(data))
        info.block_independent = True
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)] or [b""]

    dict_prefixes: list[bytes | None] = []
    base = cdict.content if cdict is not None else None
    for i in range(len(blocks)):
        start = i * bs
        if info.block_independent:
            dict_prefixes.append(base)
        else:
            lo = max(0, start - LZ4_DISTANCE_MAX)
            prefix = data[lo:start]
            if base and start < LZ4_DISTANCE_MAX:
                prefix = (base + prefix)[-LZ4_DISTANCE_MAX:]
            dict_prefixes.append(prefix if prefix else base)

    comp = backend.compress_batch(blocks, level=level,
                                  acceleration=acceleration,
                                  dict_prefixes=dict_prefixes,
                                  favor_dec_speed=prefs.favor_dec_speed)

    out = bytearray(write_frame_header(info))
    for raw, c in zip(blocks, comp):
        out += _write_block(raw, c, info)
    out += struct.pack("<I", 0)   # endmark
    if info.content_checksum:
        out += struct.pack("<I", xxh32(data, 0))
    return bytes(out)


def _write_block(raw: bytes, comp: bytes, info: FrameInfo) -> bytes:
    """Emit one data block, falling back to stored-uncompressed when
    compression does not help (LZ4F_makeBlock, lz4frame.c:883-908)."""
    if len(comp) == 0 or len(comp) >= len(raw):
        payload = raw
        hdr = struct.pack("<I", len(raw) | BLOCK_UNCOMPRESSED_FLAG)
    else:
        payload = comp
        hdr = struct.pack("<I", len(comp))
    block = hdr + payload
    if info.block_checksum:
        block += struct.pack("<I", xxh32(payload, 0))
    return block


class FrameCompressor:
    """Streaming frame writer (LZ4F_compressBegin/Update/Flush/End analog,
    lz4frame.c:690-1241). Buffers input to whole blocks; in linked mode
    carries the trailing 64 KB as the next block's dictionary."""

    def __init__(self, prefs: Preferences | None = None, *, level: int = 0,
                 acceleration: int = 1, cdict: CDict | None = None,
                 backend: BlockBackend | None = None,
                 max_dist: int = 65535):
        self.prefs = prefs or Preferences()
        self.level = level
        self.acceleration = acceleration
        # match-offset cap (wave-friendly streams; standard format)
        self.max_dist = max_dist
        if level < 0:
            self.acceleration = max(acceleration, -level)
            self.level = 0
        self.cdict = cdict
        self.backend = backend or default_backend()
        self._info: FrameInfo | None = None
        self._buf = bytearray()
        self._history = bytearray(cdict.content) if cdict else bytearray()
        self._xxh = XXH32State(0)
        self._total = 0
        self._started = False
        self._ended = False

    def begin(self) -> bytes:
        assert not self._started
        self._started = True
        self._info = FrameInfo(**vars(self.prefs.frame_info))
        if self.cdict is not None and self.cdict.dict_id is not None:
            self._info.dict_id = self.cdict.dict_id
        return write_frame_header(self._info)

    def update(self, data: bytes) -> bytes:
        """Consume input; returns any complete frame bytes produced."""
        assert self._started and not self._ended
        data = bytes(data)
        self._xxh.update(data)
        self._total += len(data)
        bs = self._cut_size()
        out = bytearray()
        # batch all complete blocks in one backend call; whole blocks
        # are sliced straight from the input when the carry buffer is
        # empty (the bytearray round trip copied every block twice —
        # ~30% of CLI compress wall time)
        blocks, prefixes = [], []
        pos = 0
        n = len(data)
        while not self._buf and n - pos >= bs:
            raw = data[pos: pos + bs]
            pos += bs
            blocks.append(raw)
            prefixes.append(self._current_prefix())
            self._advance_history(raw)
        if pos < n:
            self._buf += data[pos:]
        while len(self._buf) >= bs:
            raw = bytes(self._buf[:bs])
            del self._buf[:bs]
            blocks.append(raw)
            prefixes.append(self._current_prefix())
            self._advance_history(raw)
        if blocks:
            kw = {}
            if self.max_dist < 65535:
                kw["max_dist"] = self.max_dist
            comp = self.backend.compress_batch(
                blocks, level=self.level, acceleration=self.acceleration,
                dict_prefixes=prefixes,
                favor_dec_speed=self.prefs.favor_dec_speed, **kw)
            for raw, c in zip(blocks, comp):
                out += _write_block(raw, c, self._info)
        if self.prefs.auto_flush:
            out += self.flush()
        return bytes(out)

    def _cut_size(self) -> int:
        """Data bytes per block: the exact -B#bytes size when set,
        else the frame tier max (lz4io.c:286-300 analog)."""
        bs = self._info.block_max_size
        if self.prefs.block_size:
            bs = min(bs, max(32, self.prefs.block_size))
        return bs

    def _current_prefix(self) -> bytes | None:
        if self._info.block_independent:
            return self.cdict.content if self.cdict else None
        h = bytes(self._history[-LZ4_DISTANCE_MAX:])
        return h if h else None

    def _advance_history(self, raw: bytes) -> None:
        if not self._info.block_independent:
            self._history += raw
            if len(self._history) > LZ4_DISTANCE_MAX:
                del self._history[: len(self._history) - LZ4_DISTANCE_MAX]

    def update_uncompressed(self, data: bytes) -> bytes:
        """Emit `data` as stored (uncompressed) blocks without running
        the compressor (LZ4F_uncompressedUpdate analog,
        lz4frame.h:649-747). Flushes buffered compressed input first to
        preserve ordering; linked-mode history still advances."""
        assert self._started and not self._ended
        data = bytes(data)
        out = bytearray(self.flush())
        self._xxh.update(data)
        self._total += len(data)
        bs = self._cut_size()
        for i in range(0, len(data), bs):
            raw = data[i: i + bs]
            hdr = struct.pack("<I", len(raw) | BLOCK_UNCOMPRESSED_FLAG)
            block = hdr + raw
            if self._info.block_checksum:
                block += struct.pack("<I", xxh32(raw, 0))
            out += block
            self._advance_history(raw)
        return bytes(out)

    def flush(self) -> bytes:
        """Compress buffered partial block now (LZ4F_flush analog)."""
        if not self._buf:
            return b""
        raw = bytes(self._buf)
        self._buf.clear()
        prefix = self._current_prefix()
        self._advance_history(raw)
        kw = {}
        if self.max_dist < 65535:
            kw["max_dist"] = self.max_dist
        comp = self.backend.compress_batch(
            [raw], level=self.level, acceleration=self.acceleration,
            dict_prefixes=[prefix],
            favor_dec_speed=self.prefs.favor_dec_speed, **kw)[0]
        return bytes(_write_block(raw, comp, self._info))

    def end(self) -> bytes:
        """Flush + endmark + content checksum (LZ4F_compressEnd analog)."""
        assert self._started and not self._ended
        out = bytearray(self.flush())
        out += struct.pack("<I", 0)
        if self._info.content_checksum:
            out += struct.pack("<I", self._xxh.digest())
        if (self._info.content_size is not None
                and self._info.content_size != self._total):
            from lz4_tpu.frame.format import FrameError
            raise FrameError("frameSize_wrong",
                             f"declared {self._info.content_size}, got {self._total}")
        self._ended = True
        return bytes(out)


def write_skippable_frame(payload: bytes, sub_id: int = 0) -> bytes:
    """Skippable frame: 0x184D2A5X magic + LE32 size + payload
    (doc/lz4_Frame_format.md:308-345)."""
    assert 0 <= sub_id <= 0xF
    return struct.pack("<II", LZ4F_MAGIC_SKIPPABLE_START + sub_id,
                       len(payload)) + payload


def compress_legacy_frame(data: bytes, level: int = 0, *,
                          backend: BlockBackend | None = None) -> bytes:
    """Legacy .lz4 format: magic 0x184C2102 + per-8MB-block
    [LE32 csize][compressed] (doc/lz4_Frame_format.md:348-396)."""
    backend = backend or default_backend()
    data = bytes(data)
    out = bytearray(struct.pack("<I", LEGACY_MAGIC))
    blocks = [data[i: i + LEGACY_BLOCKSIZE]
              for i in range(0, len(data), LEGACY_BLOCKSIZE)] or [b""]
    comp = backend.compress_batch(blocks, level=level)
    for c in comp:
        out += struct.pack("<I", len(c)) + c
    return bytes(out)
