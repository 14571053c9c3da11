"""One-process TPU measurement session: batch scaling + dict-graph probe.

Measures, on the real chip (one TPU process at a time!), logging JSON
lines incrementally to /tmp/sessA.log:

  1. encode/decode throughput at B = 32 / 64 / 128 on the real-file
     corpus (the parse scans are flat-cost in B and the relay adds ~27ms
     per dispatch, so larger batches amortize both — CLAUDE.md round-3
     lever #2), including per-shape compile wall time.
  2. the has_dict (linked/dict-mode) graph compile probe at B=32 —
     round-1 observed >1h compiles for the N=128K sort graphs; if this
     lands in sane time the engine can flip LZ4_TPU_DEVICE_DICT on
     (lever #1).

Usage:  python tools/session_bscale.py [max_B] [probe_dict]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessA.log")


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from lz4_tpu.block.decode_jax import DICT_CAP as DCAP
    from lz4_tpu.block.decode_jax import decode_blocks
    from lz4_tpu.block.encode_jax import DICT_CAP, encode_blocks
    from lz4_tpu.constants import compress_bound
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    max_b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    probe_dict = (sys.argv[2] != "0") if len(sys.argv) > 2 else True

    bs = 65536
    total = 48 * 1024 * 1024
    data = real_corpus(total)
    nb = len(data) // bs
    src_all = np.frombuffer(data[: nb * bs], np.uint8).reshape(nb, bs)
    log(event="start", device=str(jax.devices()[0].platform), blocks=nb)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    def timed(name, fn, reps=3):
        t0 = time.perf_counter()
        r = fn()
        sync(r)
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return r, t_first, best

    if probe_dict:
        # linked/dict-mode graph probe at B=32 (encode, then decode):
        # every 64 KB block sees the previous block's bytes as history —
        # the flagship MT linked-chunk path (lz4io.c:1130-1160)
        B = 32
        srcs = jnp.asarray(src_all[:B])
        lens = jnp.full(B, bs, jnp.int32)
        dnp = np.zeros((B, DICT_CAP), np.uint8)
        dnp[1:] = src_all[:B - 1]
        dbufs = jnp.asarray(dnp)
        dlens = jnp.full(B, DICT_CAP, jnp.int32).at[0].set(0)
        log(event="dict_encode_compile_start", B=B)

        def enc_d():
            return encode_blocks(srcs, lens, dbufs, dlens, cap_n=bs,
                                 has_dict=True)

        (o, cs, _), t_first, t_best = timed("enc_dict", enc_d)
        mb = B * bs / 1e6
        log(event="dict_encode", B=B, compile_s=round(t_first, 1),
            best_s=round(t_best, 3), MBs=round(mb / t_best, 1),
            csize=int(np.asarray(cs).sum()))

        comp_np = np.asarray(o)
        csz = np.asarray(cs).astype(np.int32)
        comp_j = jnp.asarray(comp_np)
        clens = jnp.asarray(csz)
        ddnp = np.zeros((B, DCAP), np.uint8)
        ddnp[1:] = src_all[:B - 1]
        ddb = jnp.asarray(ddnp)
        ddl = jnp.full(B, DCAP, jnp.int32).at[0].set(0)
        log(event="dict_decode_compile_start", B=B)

        def dec_d():
            return decode_blocks(comp_j, clens, ddb, ddl, cap_out=bs,
                                 has_dict=True)

        (do, dl, de), t_first, t_best = timed("dec_dict", dec_d)
        ok = np.asarray(do).tobytes() == data[: B * bs]
        log(event="dict_decode", B=B, compile_s=round(t_first, 1),
            best_s=round(t_best, 3), MBs=round(mb / t_best, 1),
            err=int(np.asarray(de).max()), roundtrip=bool(ok))

    comp_cache = {}
    bs_list = tuple(int(x) for x in os.environ.get(
        "LZ4_TPU_SESSION_BS", "32,64,128").split(","))
    for B in bs_list:
        if B > max_b:
            break
        K = (nb // B) * B
        srcs = jnp.asarray(src_all[:K])
        lens = jnp.full(B, bs, jnp.int32)
        dbufs = jnp.zeros((B, DICT_CAP), jnp.uint8)
        dlens = jnp.zeros(B, jnp.int32)

        def enc():
            outs, sizes = [], []
            for i in range(0, K, B):
                o, cs, _ = encode_blocks(srcs[i: i + B], lens, dbufs,
                                         dlens, cap_n=bs, has_dict=False)
                outs.append(o)
                sizes.append(cs)
            return outs, sizes

        (outs, sizes), t_first, t_best = timed(f"enc_B{B}", enc)
        mb = K * bs / 1e6
        log(event="encode", B=B, compile_s=round(t_first, 1),
            best_s=round(t_best, 3), MBs=round(mb / t_best, 1))

        comp_np = np.concatenate([np.asarray(o) for o in outs], axis=0)
        csz = np.concatenate([np.asarray(s) for s in sizes])
        comp_cache[B] = (comp_np, csz)
        comp_j = jnp.asarray(comp_np)
        clens = jnp.asarray(csz.astype(np.int32))
        ddb = jnp.zeros((B, DCAP), jnp.uint8)
        ddl = jnp.zeros(B, jnp.int32)

        def dec():
            res = []
            for i in range(0, K, B):
                res.append(decode_blocks(comp_j[i: i + B],
                                         clens[i: i + B], ddb, ddl,
                                         cap_out=bs, has_dict=False))
            return res

        res, t_first, t_best = timed(f"dec_B{B}", dec)
        errs = max(int(np.asarray(e).max()) for _, _, e in res)
        rt_ok = np.concatenate(
            [np.asarray(o) for o, _, _ in res], axis=0).tobytes() \
            == data[: K * bs]
        log(event="decode", B=B, compile_s=round(t_first, 1),
            best_s=round(t_best, 3), MBs=round(mb / t_best, 1),
            err=errs, roundtrip=bool(rt_ok))

    log(event="done")


if __name__ == "__main__":
    main()
