"""Round-3 v4 decode kernel on-chip measurement.

Measures decode_blocks_pallas (the v4 branch-free-parse revision) on
the real corpus with host-C-encoded streams: full / litonly / nocopy
cost split, plus the linked (dict) mode. Compares against the r2
numbers recorded in /tmp/sessR3D.log (base 18.8 on this exact corpus).

Logs JSON lines to /tmp/sessR3E.log. Run: python tools/session_r3e.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR3E.log"), "a",
           buffering=1)


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from lz4_tpu.block import decode_pallas as dp
    from lz4_tpu.utils.realcorpus import real_corpus
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.constants import compress_bound

    BS = 65536
    B = 32
    data = real_corpus(B * BS)[: B * BS]
    blocks = [data[i: i + BS] for i in range(0, len(data), BS)]
    hb = HostBackend(nb_workers=0)
    comp = hb.compress_batch(blocks, level=1)
    cap_in = compress_bound(BS)
    carr = np.zeros((B, cap_in), np.uint8)
    clens = np.zeros(B, np.int32)
    for i, c in enumerate(comp):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    cj = jnp.asarray(carr)
    lj = jnp.asarray(clens)
    n = B * BS
    log(event="setup", blocks=B, comp_total=int(clens.sum()))

    def bench(name, fn, check=False):
        try:
            t0 = time.time()
            r = fn()
            np.asarray(r[0])
            tc = time.time() - t0
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                r = fn()
                np.asarray(r[1][-1])   # dependent sync on olen
                np.asarray(r[0][-1, -1])
                best = min(best, time.perf_counter() - t0)
            mbs = n / 1e6 / best
            ok = None
            if check:
                out = np.asarray(r[0])
                ol = np.asarray(r[1])
                er = np.asarray(r[2])
                ok = (not er.any()) and all(
                    out[i, : ol[i]].tobytes() == blocks[i]
                    for i in range(B))
            log(event=name, compile_s=round(tc, 1),
                best_ms=round(best * 1e3, 1), MBs=round(mbs, 1),
                roundtrip=ok)
        except Exception as e:
            log(event=name + "_failed", error=str(e)[:1000])

    bench("v4_full", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False), check=True)
    bench("v4_litonly", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False, mode="litonly"))
    bench("v4_nocopy", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False, mode="nocopy"))

    # linked/dict mode: re-encode with 64K rolling history
    dicts = np.zeros((B, 65536), np.uint8)
    dlens = np.zeros(B, np.int32)
    prefixes = []
    for i in range(B):
        hist = data[max(0, i * BS - 65536): i * BS]
        dicts[i, 65536 - len(hist):] = np.frombuffer(hist, np.uint8)
        dlens[i] = len(hist)
        prefixes.append(hist if hist else None)
    comp_l = hb.compress_batch(blocks, level=1, dict_prefixes=prefixes)
    carr2 = np.zeros((B, cap_in), np.uint8)
    cl2 = np.zeros(B, np.int32)
    for i, c in enumerate(comp_l):
        carr2[i, : len(c)] = np.frombuffer(c, np.uint8)
        cl2[i] = len(c)
    cj2, lj2 = jnp.asarray(carr2), jnp.asarray(cl2)
    dj, dlj = jnp.asarray(dicts), jnp.asarray(dlens)
    bench("v4_linked", lambda: dp.decode_blocks_pallas(
        cj2, lj2, dj, dlj, cap_out=BS, interpret=False), check=True)

    log(event="done")


if __name__ == "__main__":
    main()
