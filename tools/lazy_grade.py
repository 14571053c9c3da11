"""Grade the new lazy chain tier (hccodec.c compress_lazy) against the
reference CLI per level 3-9: compressed size ratio, round-trip
correctness (native decoder), and single-thread speed at level 9.

Usage: python tools/lazy_grade.py [--mb 4] [--block 65536]
"""
from __future__ import annotations

import argparse
import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

TRIES = {3: 4, 4: 8, 5: 16, 6: 32, 7: 64, 8: 128, 9: 256}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=4)
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--levels", default="3,4,5,6,7,8,9")
    args = ap.parse_args()

    import ref_oracle
    assert ref_oracle.ensure_built()
    from lz4_tpu import native
    from lz4_tpu.block import ref_codec
    from lz4_tpu.utils.datagen import gen_text, mixed_corpus
    from lz4_tpu.utils.realcorpus import real_corpus

    codec = native.blockcodec
    lib = codec._lib
    lib.lz4t_compress_lazy.restype = ctypes.c_long
    lib.lz4t_compress_lazy.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int]

    from lz4_tpu.constants import compress_bound

    def lazy(blk: bytes, tries: int) -> bytes:
        cap = compress_bound(len(blk))
        dst = ctypes.create_string_buffer(cap)
        n = lib.lz4t_compress_lazy(blk, len(blk), dst, cap, 0, tries, 0)
        assert n > 0, "lazy tier failed"
        return dst.raw[:n]

    nb = args.mb * 1024 * 1024
    corpora = {
        "real": real_corpus(nb),
        "text": gen_text(nb, seed=11),
        "mixed": mixed_corpus(nb, seed=11),
    }
    bs = args.block
    levels = [int(x) for x in args.levels.split(",")]

    print(f"{'level':>5} " + " ".join(f"{k:>10}" for k in corpora)
          + f" {'worst':>10}")
    for lv in levels:
        row = []
        for name, data in corpora.items():
            data = data[: len(data) - len(data) % bs]
            ours = theirs = 0
            for i in range(0, len(data), bs):
                blk = data[i: i + bs]
                c = lazy(blk, TRIES[lv])
                # round-trip against the strict host decoder
                back = codec.decompress(c, len(blk))
                assert back == blk, f"round-trip FAIL lv{lv} {name}@{i}"
                ours += len(c)
                theirs += len(ref_oracle.ref_compress_block(blk, lv))
            row.append(ours / theirs)
        print(f"{lv:>5} " + " ".join(f"{r:>10.5f}" for r in row)
              + f" {max(row):>10.5f}", flush=True)

    # speed at levels 9 and 3 (single thread, best of 5 passes)
    data = corpora["real"]
    data = data[: len(data) - len(data) % bs]
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)]
    for lv in (3, 9):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for blk in blocks:
                lazy(blk, TRIES[lv])
            best = min(best, time.perf_counter() - t0)
        print(f"lazy -{lv}: {len(data) / 1e6 / best:.1f} MB/s "
              f"({len(data) // 1e6:.0f} MB real corpus)")
        # DP comparison
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for blk in blocks:
                codec.compress_hc(blk, level=lv)
            best = min(best, time.perf_counter() - t0)
        print(f"  dp -{lv}: {len(data) / 1e6 / best:.1f} MB/s")
        # reference lib for context
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for blk in blocks:
                ref_oracle.ref_compress_block(blk, lv)
            best = min(best, time.perf_counter() - t0)
        print(f" ref -{lv}: {len(data) / 1e6 / best:.1f} MB/s")


if __name__ == "__main__":
    main()
