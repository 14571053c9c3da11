"""On-chip measurement of the 128-lane wavefront decoder.

Hygiene: health-check the chip first (a trivial jit with a 60 s
budget); the kernel itself runs under this process only — kill by PID
if it hangs. Timing per CLAUDE.md discipline: N async dispatches, one
dependent sync, subtract one ~24.5 ms relay RTT.

Stages:
  health    trivial jit
  compile   wave kernel for the production shape (NP pieces)
  verify    decode a real-corpus batch, compare bytes vs host decode
  time      amortized MB/s on the batch
Env: LZ4_TPU_WAVE_NP (default 64), LZ4_TPU_WAVE_MB (default 8 MB of
corpus = one 128-lane batch of 64 KB blocks), LZ4_TPU_WAVE_NEAR.

Logs JSON lines to /tmp/sessWAVE.log.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessWAVE.log"), "a",
           buffering=1)
RTT = 0.0245
ASYNC_N = 8


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    on_cpu = "--cpu" in sys.argv
    if on_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    t0 = time.time()
    _ = np.asarray(jax.jit(lambda a: a * 2)(jnp.arange(64))).sum()
    log(event="health", platform=jax.devices()[0].platform,
        s=round(time.time() - t0, 1))

    from lz4_tpu import native
    from lz4_tpu.block.decode_wave import (
        LANES, RPP, WCAP, _wave_decode_raw, pack_warena)
    NEAR = int(os.environ.get("LZ4_TPU_WAVE_NEAR", "512"))
    from lz4_tpu.utils.realcorpus import real_corpus

    bc = native.blockcodec
    NP = int(os.environ.get("LZ4_TPU_WAVE_NP", "64"))
    BS = NP * 1024
    data = real_corpus(LANES * BS)
    blocks = [data[i * BS:(i + 1) * BS] for i in range(LANES)]

    t0 = time.time()
    maxd = int(os.environ.get("LZ4_TPU_WAVE_MAXD", "0"))
    if maxd:
        comps = [bc.compress_maxd(b, maxd) for b in blocks]
        ref = bc.compress_batch(blocks)
        log(event="maxd_ratio", maxd=maxd,
            size_vs_uncapped=round(sum(map(len, comps))
                                   / sum(map(len, ref)), 4))
    else:
        comps = bc.compress_batch(blocks)
    arenas = np.zeros((LANES, NP, WCAP), np.uint8)
    out_lens = []
    for i, c in enumerate(comps):
        r = bc.wave_split(c, max_pieces=NP, out_cap=BS)
        assert r is not None, f"lane {i} split failed"
        arena, ol = r
        arenas[i, : arena.shape[0]] = arena
        out_lens.append(ol)
    split_s = time.time() - t0
    warena_np = pack_warena(arenas)
    log(event="prep", split_s=round(split_s, 2),
        host_split_MBs=round(LANES * BS / 1e6 / split_s, 1),
        comp_MB=round(sum(len(c) for c in comps) / 1e6, 1))

    warena = jnp.asarray(warena_np)
    _ = np.asarray(warena[0, 0])          # force upload
    n_rows = NP * RPP

    t0 = time.time()
    bp = bool(maxd)      # per-byte phase-2 wins when offsets are capped
    out = _wave_decode_raw(warena, n_rows=n_rows, interpret=on_cpu,
                           use_onehot=True, near_rows=NEAR,
                           byte_phase=bp)
    _ = np.asarray(out[-1, -1])
    log(event="compile_plus_first_run", s=round(time.time() - t0, 1))

    # verify all lanes
    flat = np.ascontiguousarray(np.asarray(out).T).astype("<u4") \
        .view(np.uint8).reshape(LANES, n_rows * 4)
    bad = [i for i in range(LANES)
           if flat[i, : out_lens[i]].tobytes() != blocks[i]]
    log(event="verify", bad_lanes=bad[:8], n_bad=len(bad))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [_wave_decode_raw(warena, n_rows=n_rows, interpret=on_cpu,
                               use_onehot=True, near_rows=NEAR,
                               byte_phase=bp)
              for _ in range(ASYNC_N)]
        _ = np.asarray(rs[-1][-1, -1])
        dt = (time.perf_counter() - t0 - RTT) / ASYNC_N
        best = min(best, dt)
    total = LANES * BS
    log(event="timing", per_call_ms=round(best * 1e3, 1),
        ns_per_row=round(best / n_rows * 1e9, 1),
        mbs=round(total / 1e6 / best, 1))


if __name__ == "__main__":
    main()
