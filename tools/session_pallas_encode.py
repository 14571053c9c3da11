"""TPU session: lower + validate + time the Pallas serial-block encoder.

Encodes the real-file corpus at B x 64 KB via encode_blocks_pallas,
verifies every block against the host C decoder, grades compressed size
vs the host C greedy tier, and times best-of passes (optionally at
several acceleration values). Logs JSON lines to /tmp/sessPE.log.

Usage: python tools/session_pallas_encode.py [--mb N] [--b B] [--cpu]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessPE.log")


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
    from lz4_tpu.block.encode_pallas import encode_blocks_pallas
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
    src_np = np.frombuffer(data[: K * bs], np.uint8).reshape(K, bs)
    src = jnp.asarray(src_np)
    lens = jnp.full(B, bs, jnp.int32)
    log(event="start", device=str(jax.devices()[0].platform), blocks=K,
        B=B)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    accels = [int(a) for a in os.environ.get(
        "LZ4_TPU_SESSION_ACCELS", "1").split(",")]
    linked = "--linked" in sys.argv
    if linked:
        # every block sees the previous one as history (lz4io.c linked
        # chunks); block 0 has none
        dn = np.zeros((K, 65536), np.uint8)
        dn[1:] = src_np[:-1]
        dl_np = np.full(K, 65536, np.int32)
        dl_np[0] = 0
        dicts_j = jnp.asarray(dn)
        dlens_j = jnp.asarray(dl_np)

    for accel in accels:
        def enc():
            res = []
            for i in range(0, K, B):
                res.append(encode_blocks_pallas(
                    src[i: i + B], lens,
                    dicts_j[i: i + B] if linked else None,
                    dlens_j[i: i + B] if linked else None,
                    cap_n=bs, acceleration=accel,
                    interpret=False))
            return res

        log(event="compile_start", accel=accel)
        t0 = time.perf_counter()
        res = enc()
        sync(res[-1])
        log(event="compiled", accel=accel,
            compile_s=round(time.perf_counter() - t0, 1))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            res = enc()
            sync(res[-1])
            best = min(best, time.perf_counter() - t0)
        outs = np.concatenate([np.asarray(o) for o, _, _ in res], axis=0)
        csz = np.concatenate([np.asarray(c) for _, c, _ in res])
        mb = K * bs / 1e6
        # verify every block with the independent host C decoder
        blocks = [outs[i, : csz[i]].tobytes() for i in range(K)]
        try:
            if linked:
                from lz4_tpu.block.ref_codec import decompress_block
                ok = True
                for i in range(K):
                    hist = data[(i - 1) * bs: i * bs] if i else b""
                    if decompress_block(blocks[i], bs,
                                        dict_prefix=hist)                             != data[i * bs: (i + 1) * bs]:
                        ok = False
                        break
            else:
                dec = native.blockcodec.decompress_batch(blocks, [bs] * K)
                ok = b"".join(dec) == data[: K * bs]
        except Exception as e:
            ok = False
            log(event="decode_error", error=str(e)[:500])
        hsize = sum(len(c) for c in native.blockcodec.compress_batch(
            [data[i * bs: (i + 1) * bs] for i in range(K)]))
        log(event="encode", linked=linked, accel=accel, best_s=round(best, 3),
            MBs=round(mb / best, 1), roundtrip=bool(ok),
            csize=int(csz.sum()),
            vs_hostC=round(int(csz.sum()) / hsize, 4))
    log(event="done")


if __name__ == "__main__":
    main()
