"""Batch frame decode over the 128-lane wave tiers.

The device's batch dimension is the frame/stream axis: up to 128
INDEPENDENT frames decode in lockstep, one per lane. For linked-block
frames (-BD, LZ4F_updateDict semantics, lz4frame.c:1527-1592) each
frame's 64 KB history rides the device-resident OUT ring between
segment calls (decode_wave.wave_decode_linked), so the serial
cross-block dependency never leaves the chip — the wave answer to the
reference's rolling-prefix copy (lz4io.c:741-744).

This is the TPU-native shape of "multithreaded decode": where the
reference pipelines ONE stream through threads, the device decodes 128
streams abreast. Single-frame/CLI paths keep the sequential
FrameDecompressor; this surface serves many-stream workloads (object
stores, shard sets, -m batches).
"""
from __future__ import annotations

import struct

from lz4_tpu.constants import BLOCK_UNCOMPRESSED_FLAG
from lz4_tpu.frame.format import FrameError, header_size, parse_frame_header
from lz4_tpu.frame.reader import decompress_frame
from lz4_tpu.xxh32 import xxh32


def _walk_frame(frame: bytes):
    """Parse header + split the block payloads of one LZ4F frame.
    Returns (info, payloads, raw_flags, content_checksum_word)."""
    info, used = parse_frame_header(frame[: header_size(frame)])
    pos = used
    payloads, raw_flags = [], []
    while True:
        if pos + 4 > len(frame):
            raise FrameError("frameDecoding_alreadyStarted",
                             "truncated frame")
        word = struct.unpack("<I", frame[pos: pos + 4])[0]
        pos += 4
        if word == 0:
            break
        size = word & ~BLOCK_UNCOMPRESSED_FLAG
        if size > info.block_max_size:
            raise FrameError("maxBlockSize_invalid")
        if pos + size > len(frame):
            raise FrameError("frameDecoding_alreadyStarted",
                             "truncated block")
        payloads.append(frame[pos: pos + size])
        raw_flags.append(bool(word & BLOCK_UNCOMPRESSED_FLAG))
        pos += size
        if info.block_checksum:
            if pos + 4 > len(frame):
                raise FrameError("frameDecoding_alreadyStarted",
                                 "truncated block checksum")
            want = struct.unpack("<I", frame[pos: pos + 4])[0]
            if xxh32(payloads[-1], 0) != want:
                raise FrameError("blockChecksum_invalid")
            pos += 4
    csum = None
    if info.content_checksum:
        if pos + 4 > len(frame):
            raise FrameError("frameDecoding_alreadyStarted",
                             "truncated content checksum")
        csum = struct.unpack("<I", frame[pos: pos + 4])[0]
        pos += 4
    return info, payloads, raw_flags, csum, pos


def compress_frames_wave(datas: list[bytes], *,
                         max_dist: int = 2048,
                         block_independent: bool = False,
                         content_checksum: bool = True,
                         interpret: bool | None = None) -> list[bytes]:
    """Compress a batch of payloads into .lz4 frames on the 128-lane
    wave ENCODE tier (64 KB-tier blocks, offsets capped at max_dist so
    the frames also decode on the wave tiers). Linked (-BD) by default:
    each lane's blocks see their stream history through the kernel's
    mod-2^16 table (encode_wave_linked). The output is standard LZ4F,
    decodable by reference liblz4/lz4 CLI."""
    from lz4_tpu.block.encode_wave import (LANES, encode_wave_batch,
                                           encode_wave_linked)
    from lz4_tpu.frame.format import FrameInfo, write_frame_header
    results: list[bytes] = []
    for g in range(0, len(datas), LANES):
        grp = [bytes(d) for d in datas[g: g + LANES]]
        streams_raw = [[d[i: i + 65536]
                        for i in range(0, max(len(d), 1), 65536)]
                       for d in grp]
        if block_independent:
            flat = [b for s in streams_raw for b in s]
            enc_flat = encode_wave_batch(flat, interpret=interpret,
                                         max_dist=max_dist)
            enc, k = [], 0
            for s in streams_raw:
                enc.append(enc_flat[k: k + len(s)])
                k += len(s)
        else:
            enc = encode_wave_linked(streams_raw, interpret=interpret,
                                     max_dist=max_dist)
        for d, raws, comps in zip(grp, streams_raw, enc):
            info = FrameInfo(block_size_id=4,
                             block_independent=block_independent,
                             content_checksum=content_checksum)
            parts = [write_frame_header(info)]
            for raw, comp in zip(raws, comps):
                if len(comp) >= len(raw) and raw:
                    # stored block beats expansion (LZ4F_makeBlock
                    # fallback, lz4frame.c:883-908)
                    parts.append(struct.pack(
                        "<I", len(raw) | BLOCK_UNCOMPRESSED_FLAG))
                    parts.append(raw)
                else:
                    parts.append(struct.pack("<I", len(comp)))
                    parts.append(comp)
            parts.append(b"\x00\x00\x00\x00")
            if content_checksum:
                parts.append(struct.pack("<I", xxh32(d, 0)))
            results.append(b"".join(parts))
    return results


def decompress_frames_wave(frames: list[bytes], *,
                           interpret: bool | None = None,
                           byte_phase: bool = False) -> list[bytes]:
    """Decode a batch of .lz4 frames, riding the wave tiers where the
    frames qualify (64 KB-tier blocks, compressed payloads, no dict);
    non-qualifying or wave-rejected frames fall back to the sequential
    decoder per frame. Byte-exact, checksum-verified."""
    results: list[bytes | None] = [None] * len(frames)
    linked_idx: list[int] = []
    linked_streams: list[list[bytes]] = []
    metas = {}
    for i, f in enumerate(frames):
        try:
            info, payloads, raws, csum, _ = _walk_frame(bytes(f))
            ok = (info.frame_type == "lz4"
                  and info.block_size_id == 4
                  and payloads
                  and not any(raws))
            if not ok:
                raise ValueError("not wave-eligible")
            metas[i] = (info, csum)
            linked_idx.append(i)
            linked_streams.append(payloads)
        except Exception:
            results[i] = decompress_frame(frames[i])
    # lockstep-decode eligible frames, <=128 lanes at a time, linked
    # and independent alike (independent frames simply never look back
    # across a boundary, which the ring serves trivially)
    from lz4_tpu.block.decode_wave import LANES, wave_decode_linked
    for g in range(0, len(linked_idx), LANES):
        idxs = linked_idx[g: g + LANES]
        streams = linked_streams[g: g + LANES]
        try:
            outs = wave_decode_linked(streams, interpret=interpret,
                                      byte_phase=byte_phase)
        except Exception:
            outs = None
        for k, i in enumerate(idxs):
            if outs is None:
                results[i] = decompress_frame(frames[i])
                continue
            out = outs[k]
            info, csum = metas[i]
            if csum is not None and xxh32(out, 0) != csum:
                raise FrameError("contentChecksum_invalid")
            if (info.content_size is not None
                    and len(out) != info.content_size):
                raise FrameError("frameSize_wrong")
            results[i] = out
    return results  # type: ignore[return-value]
