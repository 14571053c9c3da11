"""One-process TPU measurement: decode batch scaling (B = 32/64/128)
on the current (lane-packed) decode graph, host-C-encoded real corpus.

Decode-only twin of session_bscale: the parse scans are flat-cost in B
and the relay adds ~27 ms per dispatch, so larger batches amortize
both; encode scaling is measured separately (tools/session_encfg.py)
because encoder graph changes invalidated the joint run.

Usage: python tools/session_dscale.py
Logs JSON lines to /tmp/sessD.log.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessD.log")


def main() -> None:
    import jax
    if os.environ.get("LZ4_TPU_SESSION_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from lz4_tpu import native
    from lz4_tpu.block.decode_jax import DICT_CAP as DCAP
    from lz4_tpu.block.decode_jax import decode_blocks
    from lz4_tpu.constants import compress_bound
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    bs = 65536
    total = int(os.environ.get("LZ4_TPU_SESSION_MB", "48")) * 1024 * 1024
    data = real_corpus(total)
    nb = len(data) // bs
    src_all = np.frombuffer(data[: nb * bs], np.uint8).reshape(nb, bs)
    log(event="start", device=str(jax.devices()[0].platform), blocks=nb)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    hblocks = native.blockcodec.compress_batch(
        [src_all[i].tobytes() for i in range(nb)])
    cap_in = compress_bound(bs)
    comp_np = np.zeros((nb, cap_in), np.uint8)
    csz = np.zeros(nb, np.int32)
    for i, c in enumerate(hblocks):
        comp_np[i, : len(c)] = np.frombuffer(c, np.uint8)
        csz[i] = len(c)
    log(event="encoded_host", csize=int(csz.sum()))

    bs_list = tuple(int(x) for x in os.environ.get(
        "LZ4_TPU_SESSION_BS", "32,64,128").split(","))
    for B in bs_list:
        K = (nb // B) * B
        comp_j = jnp.asarray(comp_np[:K])
        clens = jnp.asarray(csz[:K])
        ddb = jnp.zeros((B, DCAP), jnp.uint8)
        ddl = jnp.zeros(B, jnp.int32)

        def dec():
            res = []
            for i in range(0, K, B):
                res.append(decode_blocks(comp_j[i: i + B],
                                         clens[i: i + B], ddb, ddl,
                                         cap_out=bs, has_dict=False))
            return res

        log(event="compile_start", B=B)
        t0 = time.perf_counter()
        res = dec()
        sync(res[-1])
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = dec()
            sync(res[-1])
            best = min(best, time.perf_counter() - t0)
        errs = max(int(np.asarray(e).max()) for _, _, e in res)
        ok = np.concatenate([np.asarray(o) for o, _, _ in res],
                            axis=0).tobytes() == data[: K * bs]
        mb = K * bs / 1e6
        log(event="decode", B=B, compile_s=round(t_first, 1),
            best_s=round(best, 3), MBs=round(mb / best, 1), err=errs,
            roundtrip=bool(ok))

    log(event="done")


if __name__ == "__main__":
    main()
