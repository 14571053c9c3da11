"""On-chip session: the 128-lane lockstep wave ENCODE kernel
(block/encode_wave.py).

Stages:
  1. compile the 64 KB-tier match-finder shape (n_rows=16384) on the
     real chip (one-time; persistent cache);
  2. correctness: decisions -> C emitter -> strict host decode, vs the
     source blocks, plus liblz4-oracle round trip;
  3. amortized-8 timing with one dependent sync minus one relay RTT
     (CLAUDE.md measurement discipline), reporting kernel MB/s and the
     end-to-end (kernel + download + emit) MB/s;
  4. size accounting vs the host C capped/uncapped encoders.

Run: python tools/session_wave_encode.py   (logs to /tmp/sessWE.log)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessWE.log"), "a",
           buffering=1)
RTT = 0.0245
ASYNC_N = 8


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from lz4_tpu import native
    from lz4_tpu.block.encode_wave import (_encode_wave_raw,
                                           pack_input)
    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.utils.realcorpus import real_corpus

    bc = native.blockcodec
    interp = jax.devices()[0].platform == "cpu"
    log(stage="start", platform=jax.devices()[0].platform)

    data = real_corpus(16 * 1024 * 1024)
    blocks = [data[i * 65536:(i + 1) * 65536] for i in range(128)]
    n_rows = 16384
    inp, lens = pack_input(blocks, n_rows)
    inp_j, lens_j = jnp.asarray(inp), jnp.asarray(lens)

    t0 = time.time()
    dec = _encode_wave_raw(inp_j, lens_j, n_rows=n_rows,
                           interpret=interp, use_onehot=not interp)
    first = np.asarray(dec[-1, -1])
    log(stage="compiled", secs=round(time.time() - t0, 1),
        probe=int(first))

    # ---- correctness: emit + strict decode + liblz4 oracle
    decT = np.ascontiguousarray(np.asarray(dec).T)
    streams = bc.wave_emit_decisions(blocks, decT[:128])
    bad = 0
    for i, (b, s) in enumerate(zip(blocks, streams)):
        if decompress_block(s, len(b)) != b:
            bad += 1
            log(stage="verify_fail", i=i)
    log(stage="verified", bad=bad, n=len(blocks))
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        import ref_oracle
        if ref_oracle.ensure_built():
            ok = sum(ref_oracle.ref_decompress_block(s, len(b)) == b
                     for b, s in zip(blocks[:16], streams[:16]))
            log(stage="liblz4_oracle", ok=ok, n=16)
    except Exception as e:
        log(stage="liblz4_oracle_skip", err=str(e))

    # ---- size accounting
    tot_w = sum(map(len, streams))
    tot_c = sum(len(bc.compress_maxd(b, 2048)) for b in blocks)
    tot_u = sum(len(bc.compress(b)) for b in blocks)
    log(stage="size", wave=tot_w, c_maxd=tot_c, c_uncapped=tot_u,
        vs_maxd=round(tot_w / tot_c, 4),
        vs_uncapped=round(tot_w / tot_u, 4))

    # ---- kernel timing (amortized-8, one dependent sync, minus RTT)
    if not interp:
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            rs = [_encode_wave_raw(inp_j, lens_j, n_rows=n_rows,
                                   interpret=False, use_onehot=True)
                  for _ in range(ASYNC_N)]
            np.asarray(rs[-1][-1, -1])
            best = min(best, (time.perf_counter() - t0 - RTT) / ASYNC_N)
        mbs = 128 * 65536 / 1e6 / best
        log(stage="kernel_timing", ms=round(best * 1e3, 1),
            mbs=round(mbs, 1),
            ns_per_step=round(best * 1e9 / 65536, 1))

        # end-to-end: upload + kernel + download + emit (relay-bound
        # in this environment; recorded for honesty)
        t0 = time.perf_counter()
        dec2 = _encode_wave_raw(inp_j, lens_j, n_rows=n_rows,
                                interpret=False, use_onehot=True)
        decT2 = np.ascontiguousarray(np.asarray(dec2).T)
        streams2 = bc.wave_emit_decisions(blocks, decT2[:128])
        dt = time.perf_counter() - t0
        log(stage="end_to_end", ms=round(dt * 1e3, 1),
            mbs=round(128 * 65536 / 1e6 / dt, 1),
            nstreams=len(streams2))


if __name__ == "__main__":
    main()
