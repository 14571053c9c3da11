"""Native (C) host-runtime components, compiled on demand with the system
compiler and loaded via ctypes. No pip/pybind dependency.

The TPU compute path is JAX/Pallas; these native pieces are the host
runtime around it (checksums, fast host-side block codec for tiny inputs
and the CLI's pass-through paths) — the analog of the reference's C core
being its *entire* runtime.

Set LZ4_TPU_NO_NATIVE=1 to force the pure-python fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import sysconfig
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None


class _BuildError(RuntimeError):
    pass


def _so_path() -> str:
    tag = sysconfig.get_platform().replace("-", "_")
    return os.path.join(_HERE, f"_lz4t_native_{tag}.so")


def _sources():
    return [os.path.join(_HERE, f) for f in sorted(os.listdir(_HERE))
            if f.endswith(".c")]


def _build(so: str) -> None:
    srcs = _sources()
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-fPIC", "-shared", "-std=c11", "-Wall",
           "-o", so] + srcs
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        raise _BuildError(str(e))
    if proc.returncode != 0:
        raise _BuildError(proc.stderr)


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    if os.environ.get("LZ4_TPU_NO_NATIVE"):
        return None
    so = _so_path()
    try:
        srcs = _sources()
        if (not os.path.exists(so)
                or any(os.path.getmtime(s) > os.path.getmtime(so) for s in srcs)):
            # Build into a temp file then rename: atomic under concurrent use.
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
            os.close(fd)
            try:
                _build(tmp)
                os.replace(tmp, so)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        _LIB = ctypes.CDLL(so)
    except (OSError, _BuildError) as e:
        print(f"lz4_tpu: native backend unavailable ({e}); using python fallbacks",
              file=sys.stderr)
        return None
    _configure(_LIB)
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    lib.lz4t_xxh32.restype = ctypes.c_uint32
    lib.lz4t_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
    lib.lz4t_xxh32_rounds.restype = None
    lib.lz4t_xxh32_rounds.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.POINTER(ctypes.c_uint32)]
    lib.lz4t_compress_block.restype = ctypes.c_long
    lib.lz4t_compress_block.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_int]
    lib.lz4t_decompress_block.restype = ctypes.c_long
    lib.lz4t_decompress_block.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long]
    lib.lz4t_compress_hc.restype = ctypes.c_long
    lib.lz4t_compress_hc.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.lz4t_compress_destsize.restype = ctypes.c_long
    lib.lz4t_compress_destsize.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long)]
    lib.lz4t_compress_batch.restype = ctypes.c_long
    lib.lz4t_compress_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.lz4t_decompress_batch.restype = ctypes.c_long
    lib.lz4t_decompress_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.lz4t_split_stream.restype = ctypes.c_long
    lib.lz4t_split_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.lz4t_compress_block_maxd.restype = ctypes.c_long
    lib.lz4t_compress_block_maxd.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_long]
    lib.lz4t_compress_lazy.restype = ctypes.c_long
    lib.lz4t_compress_lazy.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.lz4t_wave_split_batch.restype = ctypes.c_long
    lib.lz4t_wave_split_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.lz4t_wave_split.restype = ctypes.c_long
    lib.lz4t_wave_split.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_int32)]
    lib.lz4t_wave_emit_decisions.restype = ctypes.c_long
    lib.lz4t_wave_emit_decisions.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int32)]
    lib.lz4t_frame_state_size.restype = ctypes.c_long
    lib.lz4t_frame_state_size.argtypes = []
    lib.lz4t_frame_stage.restype = ctypes.c_long
    lib.lz4t_frame_stage.argtypes = [ctypes.c_void_p]
    lib.lz4t_frame_state_init.restype = None
    lib.lz4t_frame_state_init.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_char_p, ctypes.c_long]
    lib.lz4t_frame_pump.restype = ctypes.c_long
    lib.lz4t_frame_pump.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]


class _XXH:
    """ctypes facade matching what lz4_tpu.xxh32 expects."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib

    def xxh32(self, data, seed: int = 0) -> int:
        data = bytes(data)
        return self._lib.lz4t_xxh32(data, len(data), seed & 0xFFFFFFFF)

    def xxh32_rounds(self, data, accs):
        data = bytes(data)
        arr = (ctypes.c_uint32 * 4)(*[a & 0xFFFFFFFF for a in accs])
        self._lib.lz4t_xxh32_rounds(data, len(data), arr)
        return [arr[0], arr[1], arr[2], arr[3]]


class _BlockCodec:
    """ctypes facade over the C block codec (host fast path)."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        import threading
        self._tls = threading.local()

    def _scratch(self, nbytes: int):
        """Reusable per-thread output arena for the batch paths: a
        fresh np.empty page-faults its whole extent inside the C call
        (~15% of batch decode time); reuse keeps pages resident."""
        import numpy as np
        buf = getattr(self._tls, "buf", None)
        if buf is None or buf.size < nbytes:
            buf = np.empty(max(nbytes, 1 << 20), np.uint8)
            self._tls.buf = buf
        return buf

    def compress(self, data: bytes, dict_prefix: bytes | None = None,
                 acceleration: int = 1) -> bytes:
        from lz4_tpu.constants import compress_bound
        data = bytes(data)
        d = bytes(dict_prefix or b"")[-65535:]
        buf = ctypes.create_string_buffer(d + data, len(d) + len(data))
        # src must point at the data start, history contiguous before it
        src = ctypes.cast(ctypes.byref(buf, len(d)), ctypes.c_char_p)
        cap = compress_bound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = self._lib.lz4t_compress_block(
            src, len(data), dst, cap, len(d), max(1, acceleration))
        if n <= 0:
            raise RuntimeError("native compression failed")
        return dst.raw[:n]

    def compress_hc(self, data: bytes, level: int = 9,
                    dict_prefix: bytes | None = None,
                    favor_dec_speed: bool = False) -> bytes:
        from lz4_tpu.constants import compress_bound
        data = bytes(data)
        d = bytes(dict_prefix or b"")[-65535:]
        buf = ctypes.create_string_buffer(d + data, len(d) + len(data))
        src = ctypes.cast(ctypes.byref(buf, len(d)), ctypes.c_char_p)
        cap = compress_bound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = self._lib.lz4t_compress_hc(src, len(data), dst, cap, len(d),
                                       level, 1 if favor_dec_speed else 0)
        if n <= 0:
            raise RuntimeError("native HC compression failed")
        return dst.raw[:n]

    def compress_batch(self, blocks, acceleration: int = 1) -> list[bytes]:
        """Batch compression of independent dict-less blocks in ONE C
        call: the block list is passed as a pointer array (zero-copy),
        outputs land in a strided numpy buffer. Removes the per-block
        ctypes/copy overhead of compress() — the host analog of the
        device path's whole-batch dispatch."""
        import numpy as np

        from lz4_tpu.constants import compress_bound
        n = len(blocks)
        if n == 0:
            return []
        blocks = [bytes(b) for b in blocks]
        stride = compress_bound(max(len(b) for b in blocks))
        ptrs = (ctypes.c_char_p * n)(*blocks)
        lens = np.asarray([len(b) for b in blocks], np.int32)
        dst = self._scratch(n * stride)[: n * stride].reshape(n, stride)
        sizes = np.empty(n, np.int32)
        r = self._lib.lz4t_compress_batch(
            ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, dst.ctypes.data_as(ctypes.c_void_p), stride,
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max(1, acceleration))
        if r != 0:
            raise RuntimeError(f"native batch compression failed ({r})")
        return [dst[i, : sizes[i]].tobytes() for i in range(n)]

    def decompress_batch(self, blocks, max_outs) -> list[bytes]:
        """Batch decode of independent dict-less blocks in ONE C call
        (pointer array in, strided buffer out)."""
        import numpy as np
        n = len(blocks)
        if n == 0:
            return []
        blocks = [bytes(b) for b in blocks]
        stride = max(1, max(max_outs))
        ptrs = (ctypes.c_char_p * n)(*blocks)
        clens = np.asarray([len(b) for b in blocks], np.int32)
        caps = np.asarray(max_outs, np.int32)
        dst = self._scratch(n * stride)[: n * stride].reshape(n, stride)
        out_lens = np.empty(n, np.int32)
        r = self._lib.lz4t_decompress_batch(
            ptrs, clens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, dst.ctypes.data_as(ctypes.c_void_p), stride,
            caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if r != 0:
            from lz4_tpu.block.ref_codec import BlockDecodeError
            raise BlockDecodeError(
                f"native decoder rejected stream (block {-r - 1})")
        return [dst[i, : out_lens[i]].tobytes() for i in range(n)]

    def compress_destsize(self, data: bytes, dst_cap: int) -> tuple[bytes, int]:
        """Fill-output mode (LZ4_compress_destSize analog): pack as much
        of `data` as fits in exactly dst_cap bytes. Returns
        (compressed, consumed_src_bytes)."""
        data = bytes(data)
        dst = ctypes.create_string_buffer(max(1, dst_cap))
        consumed = ctypes.c_long(0)
        n = self._lib.lz4t_compress_destsize(
            data, len(data), dst, dst_cap, ctypes.byref(consumed))
        return dst.raw[:n], consumed.value

    def split_stream(self, comp: bytes, *, piece_cap: int = 66816,
                     max_pieces: int = 72, out_limit: int = 65536,
                     out_cap: int | None = None):
        """Split one LZ4 sequence stream into linked <= out_limit
        pieces for the device big-block decode path (see
        lz4t_split_stream in blockcodec.c). Returns (pieces_arena
        uint8[np, piece_cap], piece_lens int32[np], piece_outs
        int32[np]) or None when the stream is malformed (caller falls
        back to the strict host decoder for the real error)."""
        import numpy as np
        comp = bytes(comp)
        arena = np.zeros((max_pieces, piece_cap), np.uint8)
        plens = np.zeros(max_pieces, np.int32)
        pouts = np.zeros(max_pieces, np.int32)
        if out_cap is None:
            out_cap = max_pieces * out_limit
        r = self._lib.lz4t_split_stream(
            comp, len(comp), arena.ctypes.data_as(ctypes.c_void_p),
            piece_cap, max_pieces, out_limit, out_cap,
            plens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pouts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if r < 0:
            return None
        return arena[:r], plens[:r], pouts[:r]

    def compress_maxd(self, data: bytes, max_dist: int,
                      acceleration: int = 1,
                      dict_prefix: bytes | None = None) -> bytes:
        """Fast compression with match offsets capped at max_dist —
        produces fully standard streams whose matches all land in the
        wavefront decoder's cheap near window (decode_wave.py)."""
        from lz4_tpu.constants import compress_bound
        data = bytes(data)
        d = bytes(dict_prefix or b"")[-65535:]
        buf = ctypes.create_string_buffer(d + data, len(d) + len(data))
        src = ctypes.cast(ctypes.byref(buf, len(d)), ctypes.c_char_p)
        cap = compress_bound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = self._lib.lz4t_compress_block_maxd(
            src, len(data), dst, cap, len(d), max(1, acceleration),
            max_dist)
        if n <= 0:
            raise RuntimeError("native compression failed")
        return dst.raw[:n]

    def compress_lazy(self, data: bytes, tries: int,
                      dict_prefix: bytes | None = None) -> bytes:
        """The lazy hash-chain tier at an explicit search depth
        (compress_lazy in hccodec.c — the byte-parity oracle for the
        device HC kernel's state-machine parse)."""
        from lz4_tpu.constants import compress_bound
        data = bytes(data)
        d = bytes(dict_prefix or b"")[-65535:]
        buf = ctypes.create_string_buffer(d + data, len(d) + len(data))
        src = ctypes.cast(ctypes.byref(buf, len(d)), ctypes.c_char_p)
        cap = compress_bound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = self._lib.lz4t_compress_lazy(src, len(data), dst, cap,
                                         len(d), tries, 0)
        if n <= 0:
            raise RuntimeError("native lazy compression failed")
        return dst.raw[:n]

    WAVE_OUT = 1024
    WAVE_CAP = 1088

    def wave_split_batch(self, comps, *, max_pieces: int = 64,
                         out_caps=None):
        """Batch wave re-layout in ONE C call (GIL released):
        returns (arenas uint8[n, max_pieces, 1088], out_lens int32[n])
        or None when any stream is malformed (caller falls back)."""
        import numpy as np
        n = len(comps)
        comps = [bytes(c) for c in comps]
        arenas = np.zeros((n, max_pieces, self.WAVE_CAP), np.uint8)
        lens = np.asarray([len(c) for c in comps], np.int32)
        caps = np.asarray(out_caps if out_caps is not None
                          else [max_pieces * self.WAVE_OUT] * n,
                          np.int32)
        out_lens = np.zeros(n, np.int32)
        ptrs = (ctypes.c_char_p * n)(*comps)
        r = self._lib.lz4t_wave_split_batch(
            ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, arenas.ctypes.data_as(ctypes.c_void_p), max_pieces,
            caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if r != 0:
            return None
        return arenas, out_lens

    def wave_split(self, comp: bytes, *, max_pieces: int = 64,
                   out_cap: int = 65536, hist_len: int = 0):
        """Re-lay one LZ4 block stream into the 128-lane kernel's WAVE
        format (lz4t_wave_split in blockcodec.c): fixed-address pieces
        of exactly 1024 output bytes, chain-free capped sequences.
        Returns (arena uint8[n_pieces, 1088], out_len) or None when
        the stream is malformed / exceeds capacity."""
        import numpy as np
        comp = bytes(comp)
        arena = np.zeros((max_pieces, self.WAVE_CAP), np.uint8)
        out_len = ctypes.c_int32(0)
        r = self._lib.lz4t_wave_split(
            comp, len(comp), arena.ctypes.data_as(ctypes.c_void_p),
            max_pieces, out_cap, hist_len, ctypes.byref(out_len))
        if r < 0:
            return None
        return arena[:r], int(out_len.value)

    def wave_emit_decisions(self, blocks, decT) -> list[bytes]:
        """Serialize the wave match finder's dense per-row decisions
        (encode_wave.py) into standard LZ4 block streams in ONE C call
        (catch-up + end-rule re-checks applied in C). decT: int32
        (nblocks, n_rows) C-contiguous."""
        import numpy as np

        from lz4_tpu.constants import compress_bound
        n = len(blocks)
        if n == 0:
            return []
        blocks = [bytes(b) for b in blocks]
        decT = np.ascontiguousarray(decT, np.int32)
        stride = compress_bound(max(len(b) for b in blocks))
        ptrs = (ctypes.c_char_p * n)(*blocks)
        lens = np.asarray([len(b) for b in blocks], np.int32)
        dst = self._scratch(n * stride)[: n * stride].reshape(n, stride)
        sizes = np.empty(n, np.int32)
        r = self._lib.lz4t_wave_emit_decisions(
            ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, decT.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            decT.shape[1], dst.ctypes.data_as(ctypes.c_void_p), stride,
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if r != 0:
            raise RuntimeError(f"wave emit failed ({r})")
        return [dst[i, : sizes[i]].tobytes() for i in range(n)]

    # -------------------------------------------------- frame pump
    # (framewalk.c — the lz4io.c:1942-2203 decode-engine analog: one C
    # call per run of complete frame blocks, GIL released)

    FW_FLAG_BLOCK_CHECKSUM = 1
    FW_FLAG_INDEPENDENT = 2
    FW_FLAG_CONTENT_CHECKSUM = 4
    FW_FLAG_VERIFY = 8

    def frame_state_new(self, *, block_checksum: bool, independent: bool,
                        content_checksum: bool, verify: bool,
                        block_max: int, dict_content: bytes | None = None):
        st = ctypes.create_string_buffer(
            self._lib.lz4t_frame_state_size())
        flags = ((self.FW_FLAG_BLOCK_CHECKSUM if block_checksum else 0)
                 | (self.FW_FLAG_INDEPENDENT if independent else 0)
                 | (self.FW_FLAG_CONTENT_CHECKSUM if content_checksum
                    else 0)
                 | (self.FW_FLAG_VERIFY if verify else 0))
        d = bytes(dict_content or b"")
        self._lib.lz4t_frame_state_init(st, flags, block_max, d, len(d))
        return st

    def frame_stage(self, st) -> int:
        return int(self._lib.lz4t_frame_stage(st))

    def frame_pump(self, st, data, offset: int, out_cap: int):
        """Decode complete blocks from data[offset:] into a fresh
        arena (out_cap must be >= the frame's block_max). Returns
        (status, produced_view, consumed): status 1 = frame done,
        0 = need more input or output space, negative = error code
        (-2 blockChecksum, -3 contentChecksum, -4 blockSize,
        -5 malformed block). produced_view is a zero-copy memoryview
        over a per-call buffer — safe to hold, hand straight to a
        writer (the end-to-end path's copies were ~30% of CLI decode
        wall time)."""
        import numpy as np
        view = np.frombuffer(data, np.uint8)[offset:]
        out = np.empty(out_cap, np.uint8)
        consumed = ctypes.c_long(0)
        produced = ctypes.c_long(0)
        status = self._lib.lz4t_frame_pump(
            st, view.ctypes.data_as(ctypes.c_void_p), view.size,
            out.ctypes.data_as(ctypes.c_void_p), out_cap,
            ctypes.byref(consumed), ctypes.byref(produced))
        return (int(status), out[: produced.value].data,
                int(consumed.value))

    def decompress(self, comp: bytes, max_out: int,
                   dict_prefix: bytes | None = None) -> bytes:
        comp = bytes(comp)
        d = bytes(dict_prefix or b"")[-65535:]
        dst = ctypes.create_string_buffer(max(1, max_out))
        n = self._lib.lz4t_decompress_block(
            comp, len(comp), dst, max_out, d, len(d))
        if n < 0:
            from lz4_tpu.block.ref_codec import BlockDecodeError
            raise BlockDecodeError("native decoder rejected stream")
        return dst.raw[:n]


def __getattr__(name: str):
    if name in ("xxh", "blockcodec"):
        lib = _load()
        if lib is None:
            raise ImportError("native backend unavailable")
        return _XXH(lib) if name == "xxh" else _BlockCodec(lib)
    raise AttributeError(name)
