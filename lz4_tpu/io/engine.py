"""File I/O engine — the L4 layer (programs/lz4io.c analog).

Behavioural parity targets (SURVEY.md §2 #16-21):
  * LZ4IO_prefs_t           -> IoPrefs dataclass
  * LZ4IO_compressFilename / decompressFilename, multiple-file drivers,
    stdin/stdout streaming, pass-through, test mode (-t)
  * magic-number decoder dispatch (LZ4F / legacy / skippable /
    pass-through), multi-frame concatenation (lz4io.c:2349-2436)
  * sparse-file writer (zero-run elision + seek, lz4io.c:1604-1684)
  * --list frame walker (lz4io.c:2563-2907)
  * dictionary loading (last 64 KB, lz4io.c:1015-1073)
  * legacy format compression (-l, lz4io.c:765-985)

TPU-first design difference: the reference fans 4 MB chunks over a
pthread pool; here each 4 MB read is cut into frame blocks and handed to
the (batched, device-parallel) block backend in ONE call — the device
grid is the worker pool. A reader thread keeps the device fed while the
main thread writes ordered output (the 3-stage pipeline of
lz4io.c:709-762 with the WriteRegister made implicit by batch order).
"""
from __future__ import annotations

import os
import struct
import sys
import threading
import time
import queue
from dataclasses import dataclass, field

from lz4_tpu.constants import (
    BLOCK_SIZES,
    LEGACY_MAGIC,
    LZ4_DISTANCE_MAX,
    LZ4F_MAGIC,
    LZ4F_MAGIC_SKIPPABLE_MASK,
    LZ4F_MAGIC_SKIPPABLE_START,
)
from lz4_tpu.frame.format import FrameError, FrameInfo, Preferences
from lz4_tpu.frame.reader import FrameDecompressor
from lz4_tpu.frame.writer import (
    CDict,
    FrameCompressor,
    compress_legacy_frame,
)

CHUNK = 4 * 1024 * 1024       # read granularity (lz4io.c:1180)
LZ4_EXTENSION = ".lz4"


@dataclass
class IoPrefs:
    """LZ4IO_prefs_t analog (lz4io.c:193-209)."""
    overwrite: bool = True
    pass_through: bool = False
    test_mode: bool = False
    # the CLI/IO default is 4 MB blocks (LZ4_BLOCKSIZEID_DEFAULT=7,
    # lz4conf.h:68) — NOT the frame library's 64 KB default; with 64 KB
    # independent blocks a multi-MB file compresses ~10% worse than the
    # reference CLI's defaults
    block_size_id: int = 7
    # exact -B#bytes block size (lz4io.c:286-300): blocks carry at most
    # this many input bytes; the frame header advertises the covering
    # standard tier. None = cut at the tier max.
    block_custom_size: int | None = None
    block_checksum: bool = False
    stream_checksum: bool = True
    block_independence: bool = True
    sparse_file_support: bool = True
    content_size_flag: bool = False
    favor_dec_speed: bool = False
    # match-offset cap for the fast tier (wave-friendly streams whose
    # matches all land in the lockstep decoder's near window; standard
    # format; 65535 = no cap). CLI: --max-dist=#
    max_dist: int = 65535
    bench_seconds: float = 3.0     # -i# (bench.c g_nbSeconds analog)
    dictionary_filename: str | None = None
    remove_src_file: bool = False
    nb_workers: int = 0
    level: int = 1
    acceleration: int = 1
    legacy_format: bool = False
    verbosity: int = 2


class IoError(RuntimeError):
    pass


class ProgressDisplay:
    """Throttled stderr progress line (the DISPLAYUPDATE analog,
    lz4io.c:109-110, 630-634) plus a final wall/CPU time summary
    (LZ4IO_finalTimeDisplay, lz4io.c:118-136). Active at verbosity >= 2
    when stderr is a terminal, or always at verbosity >= 4."""

    REFRESH = 0.15

    def __init__(self, prefs: "IoPrefs", total_in: int | None = None):
        v = prefs.verbosity
        self.enabled = (v >= 4) or (v >= 2 and sys.stderr.isatty())
        self.show_final = v >= 3
        self.total = total_in
        self._last = 0.0
        self._t0 = time.perf_counter()
        self._cpu0 = time.process_time()

    def update(self, done_in: int, done_out: int) -> None:
        if not self.enabled:
            return
        now = time.perf_counter()
        if now - self._last < self.REFRESH:
            return
        self._last = now
        if self.total:
            pct = 100.0 * done_in / max(1, self.total)
            sys.stderr.write(f"\rRead : {done_in >> 20} MB ({pct:.2f}%) ")
        else:
            sys.stderr.write(f"\rRead : {done_in >> 20} MB ")
        sys.stderr.flush()

    def finish(self, msg: str) -> None:
        if self.enabled:
            sys.stderr.write("\r" + " " * 60 + "\r")
        if self.show_final:
            wall = time.perf_counter() - self._t0
            cpu = time.process_time() - self._cpu0
            sys.stderr.write(f"{msg}\nDone in {wall:.2f} s  "
                             f"(cpu load : {0 if wall == 0 else 100 * cpu / wall:.0f}%)\n")
            sys.stderr.flush()


def _open_src(path: str):
    if path == "-" or path == "stdin":
        return sys.stdin.buffer
    return open(path, "rb")


def _open_dst(path: str, prefs: IoPrefs):
    if path == "-" or path == "stdout":
        return sys.stdout.buffer
    if os.path.exists(path) and not prefs.overwrite:
        raise IoError(f"{path} already exists; use -f to overwrite")
    return open(path, "wb")


def load_dictionary(prefs: IoPrefs) -> CDict | None:
    """Read the last 64 KB of the dictionary file (lz4io.c:1015-1073)."""
    if not prefs.dictionary_filename:
        return None
    with open(prefs.dictionary_filename, "rb") as f:
        try:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            f.seek(max(0, size - LZ4_DISTANCE_MAX))
            content = f.read()
        except OSError:       # unseekable: stream it through a window
            content = b""
            while True:
                b = f.read(65536)
                if not b:
                    break
                content = (content + b)[-LZ4_DISTANCE_MAX:]
    return CDict(content)


# ---------------------------------------------------------------------------
# compression
# ---------------------------------------------------------------------------

def _reader(f, q: queue.Queue) -> None:
    while True:
        chunk = f.read(CHUNK)
        q.put(chunk)
        if not chunk:
            return


def compress_file(src_path: str, dst_path: str | None,
                  prefs: IoPrefs | None = None, *, backend=None) -> tuple[int, int]:
    """Compress one file/stream; returns (bytes_in, bytes_out)."""
    prefs = prefs or IoPrefs()
    if dst_path is None:
        dst_path = "-" if src_path == "-" else src_path + LZ4_EXTENSION
    cdict = load_dictionary(prefs)
    fin = _open_src(src_path)
    fout = _open_dst(dst_path, prefs)
    total_in = total_out = 0
    try:
        if prefs.legacy_format:
            data = fin.read()
            total_in = len(data)
            out = compress_legacy_frame(data, prefs.level, backend=backend)
            fout.write(out)
            total_out = len(out)
        else:
            info = FrameInfo(
                block_size_id=prefs.block_size_id,
                block_independent=prefs.block_independence,
                block_checksum=prefs.block_checksum,
                content_checksum=prefs.stream_checksum,
            )
            if prefs.content_size_flag and src_path not in ("-", "stdin"):
                try:
                    info.content_size = os.path.getsize(src_path)
                except OSError:
                    pass
            fprefs = Preferences(frame_info=info,
                                 favor_dec_speed=prefs.favor_dec_speed,
                                 block_size=prefs.block_custom_size)
            comp = FrameCompressor(fprefs, level=prefs.level,
                                   acceleration=prefs.acceleration,
                                   cdict=cdict, backend=backend,
                                   max_dist=prefs.max_dist)
            hdr = comp.begin()
            fout.write(hdr)
            total_out += len(hdr)
            try:
                fsize = (os.path.getsize(src_path)
                         if src_path not in ("-", "stdin") else None)
            except OSError:
                fsize = None
            prog = ProgressDisplay(prefs, fsize)
            # pipelined read: a reader thread keeps the device fed
            q: queue.Queue = queue.Queue(maxsize=2)
            t = threading.Thread(target=_reader, args=(fin, q), daemon=True)
            t.start()
            while True:
                chunk = q.get()
                if not chunk:
                    break
                total_in += len(chunk)
                out = comp.update(chunk)
                fout.write(out)
                total_out += len(out)
                prog.update(total_in, total_out)
            tail = comp.end()
            fout.write(tail)
            total_out += len(tail)
            t.join()
            prog.finish(
                f"Compressed {total_in} bytes into {total_out} bytes "
                f"==> {0 if not total_in else 100.0 * total_out / total_in:.2f}%")
    finally:
        if fin is not sys.stdin.buffer:
            fin.close()
        if fout is not sys.stdout.buffer:
            fout.close()
    if prefs.remove_src_file and src_path not in ("-", "stdin"):
        os.unlink(src_path)
    return total_in, total_out


# ---------------------------------------------------------------------------
# sparse writer (lz4io.c:1604-1684 analog)
# ---------------------------------------------------------------------------

class SparseWriter:
    """Elides zero runs with seeks; a final truncate materializes the
    trailing hole. Only used on seekable regular files."""

    def __init__(self, f, enabled: bool = True):
        self.f = f
        self.enabled = enabled and f.seekable() and f is not sys.stdout.buffer
        self._pending = 0     # bytes of zeros not yet materialized

    GRAN = 4096

    def write(self, data: bytes) -> None:
        if not self.enabled:
            self.f.write(data)
            return
        import numpy as np
        view = memoryview(data)
        n = len(view)
        GRAN = self.GRAN
        npages = n // GRAN
        # vectorized zero-page detection + run coalescing: one write
        # per contiguous non-zero run instead of one per 4 KB page
        if npages:
            pages = np.frombuffer(view[: npages * GRAN], np.uint8) \
                .reshape(npages, GRAN)
            nz = pages.any(axis=1)
            edges = np.flatnonzero(np.diff(
                np.concatenate(([False], nz, [False])).astype(np.int8)))
            pos = 0
            for a, b in zip(edges[::2], edges[1::2]):
                gap = int(a) * GRAN - pos
                if gap:
                    self._pending += gap
                if self._pending:
                    self.f.seek(self._pending, os.SEEK_CUR)
                    self._pending = 0
                self.f.write(view[int(a) * GRAN: int(b) * GRAN])
                pos = int(b) * GRAN
            self._pending += npages * GRAN - pos
        tail = view[npages * GRAN:]
        if tail:
            if bytes(tail).count(0) == len(tail):
                self._pending += len(tail)
            else:
                if self._pending:
                    self.f.seek(self._pending, os.SEEK_CUR)
                    self._pending = 0
                self.f.write(tail)

    def close(self) -> None:
        if self.enabled and self._pending:
            # materialize the final hole (fwriteSparseEnd analog)
            self.f.seek(self._pending - 1, os.SEEK_CUR)
            self.f.write(b"\x00")
            self._pending = 0


# ---------------------------------------------------------------------------
# decompression
# ---------------------------------------------------------------------------

class _NullSink:
    def write(self, data):
        pass

    def seekable(self):
        return False


class _AsyncWriter:
    """Decode/IO overlap: host writes run on a dedicated thread behind
    a bounded queue — the single-writer pool of the reference's MT
    decode pipeline (lz4io.c:1942-2203, its NEWS:3 "+60%" win). The
    queue depth bounds in-flight buffers like the reference's
    BufferPool; order is preserved by the single queue."""

    def __init__(self, sink, depth: int = 4):
        self.sink = sink
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.err: BaseException | None = None
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self) -> None:
        while True:
            item = self.q.get()
            if item is None:
                return
            if self.err is None:
                try:
                    self.sink.write(item)
                except BaseException as e:   # surfaced on next write/close
                    self.err = e

    def write(self, data) -> None:
        if self.err:
            raise self.err
        if data:
            self.q.put(data)

    def close(self) -> None:
        self.q.put(None)
        self.t.join()
        if self.err:
            raise self.err


def decompress_file(src_path: str, dst_path: str | None,
                    prefs: IoPrefs | None = None, *, backend=None) -> tuple[int, int]:
    """Decompress one file/stream (multi-frame, magic dispatch).
    Returns (bytes_in, bytes_out)."""
    prefs = prefs or IoPrefs()
    if dst_path is None and not prefs.test_mode:
        if src_path.endswith(LZ4_EXTENSION):
            dst_path = src_path[: -len(LZ4_EXTENSION)]
        elif src_path == "-":
            dst_path = "-"
        else:
            raise IoError(f"cannot determine destination for {src_path}")
    cdict = load_dictionary(prefs)
    dict_content = cdict.content if cdict else None
    fin = _open_src(src_path)
    if prefs.test_mode:
        raw_out = _NullSink()
    else:
        raw_out = _open_dst(dst_path, prefs)
    sparse = SparseWriter(raw_out, prefs.sparse_file_support)
    sink = _AsyncWriter(sparse)
    total_in = total_out = 0
    try:
        fsize = (os.path.getsize(src_path)
                 if src_path not in ("-", "stdin") else None)
    except OSError:
        fsize = None
    prog = ProgressDisplay(prefs, fsize)
    # read-ahead thread: overlaps file input with decode + write (the
    # reference's decode/IO overlap, lz4io.c:1942-2203, ~+60%)
    rq: queue.Queue = queue.Queue(maxsize=2)
    rt = threading.Thread(target=_reader, args=(fin, rq), daemon=True)
    rt.start()
    at_eof = False

    def read_next() -> bytes:
        nonlocal at_eof
        if at_eof:
            return b""
        chunk = rq.get()
        if not chunk:
            at_eof = True
        return chunk

    try:
        pending = b""
        nframes = 0
        while True:
            if len(pending) < 4:
                more = read_next()
                if more:
                    pending += more
                    total_in += len(more)
                elif not pending:
                    break
            if len(pending) < 4:
                if nframes == 0:
                    raise FrameError("frameHeader_incomplete",
                                     f"{len(pending)} trailing bytes")
                break
            magic = struct.unpack("<I", pending[:4])[0]
            known = (magic in (LZ4F_MAGIC, LEGACY_MAGIC)
                     or (magic & LZ4F_MAGIC_SKIPPABLE_MASK)
                     == LZ4F_MAGIC_SKIPPABLE_START)
            if not known:
                if prefs.pass_through and nframes == 0:
                    sink.write(pending)
                    total_out += len(pending)
                    while True:
                        b = read_next()
                        if not b:
                            break
                        total_in += len(b)
                        sink.write(b)
                        total_out += len(b)
                    pending = b""
                    break
                raise FrameError("frameType_unknown",
                                 f"magic 0x{magic:08X} in {src_path}")
            dec = FrameDecompressor(backend=backend,
                                    dict_content=dict_content,
                                    zero_copy=True)
            while True:
                out, consumed = dec.feed(pending)
                pending = pending[consumed:]
                sink.write(out)
                total_out += len(out)
                prog.update(total_in, total_out)
                if dec.frame_done:
                    pending = dec.legacy_lookahead + pending
                    break
                if not pending:
                    more = read_next()
                    if not more:
                        if dec.at_legacy_eof_boundary:
                            break
                        raise FrameError("frameDecoding_alreadyStarted",
                                         "truncated frame")
                    total_in += len(more)
                    pending = more
            nframes += 1
        prog.finish(f"Decompressed {total_out} bytes from {total_in} "
                    "compressed bytes")
    finally:
        try:
            sink.close()       # drain the write thread
        finally:
            sparse.close()
            if fin is not sys.stdin.buffer:
                fin.close()
            if not prefs.test_mode and raw_out is not sys.stdout.buffer:
                raw_out.close()
    if prefs.remove_src_file and not prefs.test_mode \
            and src_path not in ("-", "stdin"):
        os.unlink(src_path)
    return total_in, total_out


# ---------------------------------------------------------------------------
# --list (lz4io.c:2563-2907 analog)
# ---------------------------------------------------------------------------

@dataclass
class FrameSummary:
    frame_type: str
    block_size_id: int | None
    compressed_size: int
    content_size: int | None
    block_checksum: bool = False
    content_checksum: bool = False


def list_frames(path: str) -> list[FrameSummary]:
    """Walk every frame in a .lz4 file, skipping block payloads via the
    block headers (LZ4IO_getCompressedFileInfo analog)."""
    out = []
    with open(path, "rb") as f:
        while True:
            start = f.tell()
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            magic = struct.unpack("<I", hdr)[0]
            if (magic & LZ4F_MAGIC_SKIPPABLE_MASK) == \
                    LZ4F_MAGIC_SKIPPABLE_START:
                size = struct.unpack("<I", f.read(4))[0]
                f.seek(size, os.SEEK_CUR)
                out.append(FrameSummary("SkippableFrame", None,
                                        f.tell() - start, size))
            elif magic == LEGACY_MAGIC:
                decoded = 0
                while True:
                    word = f.read(4)
                    if len(word) < 4:
                        break
                    csz = struct.unpack("<I", word)[0]
                    if csz == LEGACY_MAGIC or csz == LZ4F_MAGIC or \
                       (csz & LZ4F_MAGIC_SKIPPABLE_MASK) == \
                       LZ4F_MAGIC_SKIPPABLE_START:
                        f.seek(-4, os.SEEK_CUR)
                        break
                    f.seek(csz, os.SEEK_CUR)
                    decoded += 1
                out.append(FrameSummary("LegacyFrame", None,
                                        f.tell() - start, None))
            elif magic == LZ4F_MAGIC:
                from lz4_tpu.frame.format import (header_size,
                                                  parse_frame_header)
                probe = hdr + f.read(15)
                need = header_size(probe)
                info, used = parse_frame_header(probe[:need])
                f.seek(start + used)
                content = 0
                unknowable = False   # compressed blocks hide their size
                while True:
                    word = f.read(4)
                    if len(word) < 4:
                        raise FrameError("frameDecoding_alreadyStarted",
                                         "truncated frame in --list")
                    bh = struct.unpack("<I", word)[0]
                    if bh == 0:
                        break
                    size = bh & 0x7FFFFFFF
                    if bh & 0x80000000:
                        content += size
                    else:
                        unknowable = True
                    f.seek(size + (4 if info.block_checksum else 0),
                           os.SEEK_CUR)
                if info.content_checksum:
                    f.seek(4, os.SEEK_CUR)
                if info.content_size is not None:
                    csize = info.content_size
                else:
                    csize = None if unknowable else content
                out.append(FrameSummary(
                    "LZ4Frame", info.block_size_id, f.tell() - start,
                    csize, info.block_checksum, info.content_checksum))
            else:
                raise FrameError("frameType_unknown",
                                 f"magic 0x{magic:08X} at {start}")
    return out


def format_list_output(paths: list[str], verbose: bool = False) -> str:
    """Human-readable --list table (lz4io.c:2855-2907 analog)."""
    lines = []
    multi = len(paths) > 1
    for path in paths:
        frames = list_frames(path)
        fsize = os.path.getsize(path)
        if verbose:
            lines.append("%-10s %-14s %-8s %-12s %-12s %-9s %s" % (
                "Frame", "Type", "Block", "Compressed", "Uncompressed",
                "Ratio", "Filename"))
            for i, fr in enumerate(frames):
                bs = {4: "64KB", 5: "256KB", 6: "1MB", 7: "4MB"}.get(
                    fr.block_size_id, "-")
                unc = str(fr.content_size) if fr.content_size is not None \
                    else "-"
                ratio = ("%.2f%%" % (100 * fr.compressed_size /
                                     fr.content_size)
                         if fr.content_size else "-")
                lines.append("%-10d %-14s %-8s %-12d %-12s %-9s %s" % (
                    i, fr.frame_type, bs, fr.compressed_size, unc, ratio,
                    os.path.basename(path)))
        else:
            nframes = len(frames)
            types = sorted({fr.frame_type for fr in frames})
            tname = types[0] if len(types) == 1 else "Mixed"
            total_unc = 0
            unknown = False
            for fr in frames:
                if fr.content_size is None:
                    unknown = True
                else:
                    total_unc += fr.content_size
            unc = "-" if unknown else str(total_unc)
            ratio = "-" if unknown or not total_unc else \
                "%.2f%%" % (100 * fsize / total_unc)
            if not lines:
                lines.append("%-8s %-14s %-12s %-12s %-9s %s" % (
                    "Frames", "Type", "Compressed", "Uncompressed",
                    "Ratio", "Filename"))
            lines.append("%-8d %-14s %-12d %-12s %-9s %s" % (
                nframes, tname, fsize, unc, ratio,
                os.path.basename(path)))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# multiple files / recursion (lz4io.c:1531-1590 analog)
# ---------------------------------------------------------------------------

def expand_paths(paths: list[str], recursive: bool) -> list[str]:
    out = []
    for p in paths:
        if os.path.isdir(p):
            if recursive:
                for root, _dirs, files in os.walk(p):
                    out.extend(os.path.join(root, x) for x in sorted(files))
            else:
                raise IoError(f"{p} is a directory (use -r)")
        else:
            out.append(p)
    return out
