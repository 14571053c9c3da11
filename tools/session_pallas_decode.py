"""TPU session: lower + validate + time the Pallas serial-block decoder.

Encodes the real-file corpus on the host C tier (format-legal input,
no device encode compile), then times decode_blocks_pallas at B=32 x
64 KB against round-trip verification. Logs JSON lines to
/tmp/sessPD.log.

Usage: python tools/session_pallas_decode.py [--mb N] [--b B]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessPD.log")


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
    from lz4_tpu.block.decode_pallas import decode_blocks_pallas
    from lz4_tpu.constants import compress_bound
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    def argval(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    bs = 65536
    B = argval("--b", 32)
    total = argval("--mb", 48) * 1024 * 1024
    data = real_corpus(total)
    nb = len(data) // bs
    K = (nb // B) * B
    log(event="start", device=str(jax.devices()[0].platform), blocks=K,
        B=B)

    linked = "--linked" in sys.argv
    if linked:
        # produce linked streams with the Pallas encoder itself (each
        # block's history = previous block), then decode them with the
        # dict-mode kernel
        from lz4_tpu.block.encode_pallas import encode_blocks_pallas
        src_np = np.frombuffer(data[: K * bs], np.uint8).reshape(K, bs)
        dn = np.zeros((K, 65536), np.uint8)
        dn[1:] = src_np[:-1]
        dl_np = np.full(K, 65536, np.int32)
        dl_np[0] = 0
        dicts_j = jnp.asarray(dn)
        dlens_j = jnp.asarray(dl_np)
        lens_e = jnp.full(B, bs, jnp.int32)
        hblocks = []
        for i in range(0, K, B):
            o, cs, _ = encode_blocks_pallas(
                jnp.asarray(src_np[i: i + B]), lens_e,
                dicts_j[i: i + B], dlens_j[i: i + B], cap_n=bs,
                interpret=False)
            o, cs = np.asarray(o), np.asarray(cs)
            hblocks += [o[k, : cs[k]].tobytes() for k in range(B)]
    else:
        hblocks = native.blockcodec.compress_batch(
            [data[i * bs: (i + 1) * bs] for i in range(K)])
    cap_in = compress_bound(bs)
    comp_np = np.zeros((K, cap_in), np.uint8)
    csz = np.zeros(K, np.int32)
    for i, c in enumerate(hblocks):
        comp_np[i, : len(c)] = np.frombuffer(c, np.uint8)
        csz[i] = len(c)
    comp_j = jnp.asarray(comp_np)
    clens = jnp.asarray(csz)
    log(event="encoded", csize=int(csz.sum()))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    modes = os.environ.get("LZ4_TPU_SESSION_MODES", "full").split(",")

    for mode in modes:
        def dec():
            res = []
            for i in range(0, K, B):
                res.append(decode_blocks_pallas(
                    comp_j[i: i + B], clens[i: i + B],
                    dicts_j[i: i + B] if linked else None,
                    dlens_j[i: i + B] if linked else None,
                    cap_out=bs, interpret=False, mode=mode))
            return res

        log(event="compile_start", mode=mode)
        t0 = time.perf_counter()
        try:
            res = dec()
            sync(res[-1])
        except Exception as e:
            log(event="lowering_failed", mode=mode, error=str(e)[:2000])
            raise
        t_first = time.perf_counter() - t0
        log(event="compiled", mode=mode, compile_s=round(t_first, 1))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            res = dec()
            sync(res[-1])
            best = min(best, time.perf_counter() - t0)
        errs = max(int(np.asarray(e).max()) for _, _, e in res)
        ok = np.concatenate([np.asarray(o) for o, _, _ in res],
                            axis=0).tobytes() == data[: K * bs]
        mb = K * bs / 1e6
        log(event="decode", linked=linked, mode=mode, best_s=round(best, 3),
            MBs=round(mb / best, 1), err=errs,
            roundtrip=bool(ok) if mode == "full" else None)
    log(event="done")


if __name__ == "__main__":
    main()
