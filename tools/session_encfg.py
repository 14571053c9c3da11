"""One-process TPU A/B: encoder stage-1 configuration frontier.

Variants of (NW carried forward-context words, n_cand scored sorted
neighbours) that all grade <= reference L1 size on the real corpus
(tools notes / docs/tpu_perf_notes.md):

    (5, 2)  committed default — 5 payload lanes, 2 candidates
    (4, 3)  0.975 on the 8 MB real slice
    (3, 4)  0.969 — two fewer sort lanes, two more elementwise passes

Sort payload lanes cost ~1-2 ms per 32x66K pass; each extra candidate
costs NW elementwise XOR/compare passes (~0.2-0.9 ms each) — which way
the trade goes is a device measurement, not an estimate.

Each variant patches encode_jax.ENC_NW and jits a fresh wrapper
(n_cand is a static arg). Output sizes are logged so the size ordering
can be confirmed on-device too.

Usage: python tools/session_encfg.py
Logs JSON lines to /tmp/sessE.log.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessE.log")


def main() -> None:
    import jax
    if os.environ.get("LZ4_TPU_SESSION_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from lz4_tpu.block import encode_jax as E
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    bs = 65536
    B = 32
    total = int(os.environ.get("LZ4_TPU_SESSION_MB", "48")) * 1024 * 1024
    data = real_corpus(total)
    nb = len(data) // bs
    K = (nb // B) * B
    src_all = np.frombuffer(data[: K * bs], np.uint8).reshape(K, bs)
    log(event="start", device=str(jax.devices()[0].platform), blocks=K)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    lens = jnp.full(B, bs, jnp.int32)
    dbufs = jnp.zeros((B, E.DICT_CAP), jnp.uint8)
    dlens = jnp.zeros(B, jnp.int32)

    variants = [(5, 2), (3, 4), (4, 3)]
    env = os.environ.get("LZ4_TPU_SESSION_VARIANTS")
    if env:
        variants = [tuple(int(x) for x in s.split(":"))
                    for s in env.split(",")]

    for nw, nc in variants:
        E.ENC_NW = nw

        @functools.partial(jax.jit, static_argnames=("cap_n", "n_cand"))
        def enc_fn(src, lens, db, dl, *, cap_n, n_cand):
            mt = functools.partial(E._match_tables, cap_n=cap_n,
                                   has_dict=False, n_cand=n_cand,
                                   lazy=False, lite=False)
            nm, nmml, pk, off = jax.vmap(mt)(src, lens, db, dl)
            tokpos = E._parse_hops(nm, nmml, d0=0, cap_n=cap_n)
            em = functools.partial(E._emit_one, cap_n=cap_n,
                                   has_dict=False)
            return jax.vmap(em)(src, lens, db, dl, tokpos, pk, off)

        def enc():
            res = []
            for i in range(0, K, B):
                res.append(enc_fn(jnp.asarray(src_all[i: i + B]), lens,
                                  dbufs, dlens, cap_n=bs, n_cand=nc))
            return res

        log(event="compile_start", nw=nw, n_cand=nc)
        t0 = time.perf_counter()
        res = enc()
        sync(res[-1])
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = enc()
            sync(res[-1])
            best = min(best, time.perf_counter() - t0)
        csize = int(sum(int(np.asarray(cs).sum()) for _, cs, _ in res))
        mb = K * bs / 1e6
        log(event="encode", nw=nw, n_cand=nc,
            compile_s=round(t_first, 1), best_s=round(best, 3),
            MBs=round(mb / best, 1), csize=csize)

    log(event="done")


if __name__ == "__main__":
    main()
