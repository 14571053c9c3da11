"""In-memory benchmark harness — `lz4 -b` analog (programs/bench.c).

Methodology parity (bench.c:360-620): the input is split into
independent blocks at the frame block size, compression and
decompression run in separate best-of timed loops (>= nb_seconds each),
and every round trip is XXH32-verified. Reports MB/s + ratio per level.
"""
from __future__ import annotations

import sys
import time

from lz4_tpu.xxh32 import xxh32

NB_SECONDS_DEFAULT = 3.0


def _split(data: bytes, bs: int) -> list[bytes]:
    return [data[i: i + bs] for i in range(0, len(data), bs)] or [b""]


def bench_mem(data: bytes, level: int, prefs, *, backend=None,
              nb_seconds: float = NB_SECONDS_DEFAULT,
              dictionary: bytes | None = None) -> dict:
    """BMK_benchMem analog: returns {level, ratio, comp_MBs, dec_MBs}.
    `dictionary` benches the dict-compression path (bench.c dictBuf)."""
    from lz4_tpu.block.backend import default_backend
    backend = backend or default_backend()
    bs = prefs.block_size_id and __import__(
        "lz4_tpu.constants", fromlist=["BLOCK_SIZES"]).BLOCK_SIZES[
        prefs.block_size_id]
    blocks = _split(data, bs)
    dict_prefixes = [dictionary] * len(blocks) if dictionary else None
    crc_orig = xxh32(data)

    def timed_best(fn):
        best = float("inf")
        elapsed = 0.0
        runs = 0
        result = None
        while elapsed < nb_seconds or runs < 2:
            t0 = time.perf_counter()
            result = fn()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            elapsed += dt
            runs += 1
        return best, result

    t_comp, comp = timed_best(lambda: backend.compress_batch(
        blocks, level=level, acceleration=prefs.acceleration,
        dict_prefixes=dict_prefixes))
    csize = sum(len(c) for c in comp)
    # stored-block fallback parity with the frame layer: oversized
    # compressed blocks would be stored raw on the wire
    wire = sum(min(len(c), len(b)) + 4 for c, b in zip(comp, blocks))

    max_outs = [len(b) for b in blocks]
    t_dec, dec = timed_best(lambda: backend.decompress_batch(
        comp, max_outs, dict_prefixes=dict_prefixes))
    rt = b"".join(dec)
    if xxh32(rt) != crc_orig:
        raise RuntimeError("benchmark round-trip corruption detected")

    n = len(data)
    return {
        "level": level,
        "ratio": n / wire if wire else 0.0,
        "comp_MBs": (n / 1e6) / t_comp,
        "dec_MBs": (n / 1e6) / t_dec,
        "csize": csize,
    }


def bench_decode_only(blob: bytes, *, backend=None,
                      nb_seconds: float = NB_SECONDS_DEFAULT) -> dict:
    """Decode-only benchmark of an existing .lz4 file (bench.c:126-143
    behaviour when inputs are already compressed)."""
    import time as _t

    from lz4_tpu.frame.reader import decompress_frame

    best = float("inf")
    elapsed = 0.0
    runs = 0
    out = b""
    while elapsed < nb_seconds or runs < 2:
        t0 = _t.perf_counter()
        out = decompress_frame(blob, backend=backend)
        dt = _t.perf_counter() - t0
        best = min(best, dt)
        elapsed += dt
        runs += 1
    return {"level": 0, "ratio": len(out) / len(blob) if blob else 0.0,
            "comp_MBs": 0.0, "dec_MBs": (len(out) / 1e6) / best,
            "csize": len(blob)}


def bench_files(paths: list[str], levels: list[int], prefs, *,
                backend=None, nb_seconds: float = NB_SECONDS_DEFAULT,
                out=sys.stderr) -> list[dict]:
    datas = []
    for p in paths:
        if p == "-":
            datas.append(sys.stdin.buffer.read())
        else:
            with open(p, "rb") as f:
                datas.append(f.read())
    data = b"".join(datas)
    # decode-only mode when every input is already an LZ4 frame
    from lz4_tpu.constants import LZ4F_MAGIC, LEGACY_MAGIC
    import struct as _s
    if all(len(d) >= 4 and _s.unpack("<I", d[:4])[0] in
           (LZ4F_MAGIC, LEGACY_MAGIC) for d in datas):
        results = []
        for d in datas:
            r = bench_decode_only(d, backend=backend,
                                  nb_seconds=nb_seconds)
            results.append(r)
            out.write("decode-only: %9d -> ratio %5.3f, %7.1f MB/s\n" % (
                r["csize"], r["ratio"], r["dec_MBs"]))
        return results
    dictionary = None
    if getattr(prefs, "dictionary_filename", None):
        from lz4_tpu.io.engine import load_dictionary
        cd = load_dictionary(prefs)
        dictionary = cd.content if cd else None
    results = []
    for level in levels:
        r = bench_mem(data, level, prefs, backend=backend,
                      nb_seconds=nb_seconds, dictionary=dictionary)
        results.append(r)
        out.write(
            "%2d : %9d -> %9d (%5.3f), %7.1f MB/s, %7.1f MB/s\n" % (
                level, len(data), r["csize"], r["ratio"],
                r["comp_MBs"], r["dec_MBs"]))
    return results
