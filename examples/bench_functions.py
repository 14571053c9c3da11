"""Per-function micro-benchmark example — the bench_functions.c analog.

Times the individual public entry points (block fast/HC compress, block
decompress, frame one-shot) on host; for the per-stage DEVICE breakdown
(sorts, gathers, scans, end-to-end kernels) run tools/fullbench.py.
"""
import time

from lz4_tpu.block.backend import HostBackend
from lz4_tpu.frame.reader import decompress_frame
from lz4_tpu.frame.writer import compress_frame
from lz4_tpu.utils.datagen import mixed_corpus

N = 4 * 1024 * 1024


def timed(name, fn, nbytes, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<28} {nbytes / 1e6 / best:8.1f} MB/s")
    return r


def main():
    data = mixed_corpus(N, seed=9)
    blocks = [data[i: i + 65536] for i in range(0, len(data), 65536)]
    be = HostBackend()
    comp = timed("block compress (fast)",
                 lambda: be.compress_batch(blocks), N)
    timed("block compress (HC -9)",
          lambda: be.compress_batch(blocks, level=9), N)
    timed("block decompress",
          lambda: be.decompress_batch(comp, [len(b) for b in blocks]), N)
    blob = timed("frame compress", lambda: compress_frame(data), N)
    timed("frame decompress", lambda: decompress_frame(blob), N)


if __name__ == "__main__":
    main()
