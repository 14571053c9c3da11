"""One-process TPU A/B: decode COMP_ROUNDS (token-level offset
composition depth) on the real-file corpus.

Each composition round costs ~2 token-width 4-lane sorts inside every
decode; each saved chase round is a full-width random gather (~22 ms at
32x64K). The right trade moved when literals became pre-resolved and the
intra-token escape landed (both shorten chains independently), so the
round-2 default (3) needs re-measurement. Each variant is a fresh jit
wrapper around the same traced functions with the module global patched
(the env knob LZ4_TPU_DECODE_COMP_ROUNDS only binds at import).

Usage: python tools/session_comprounds.py [rounds...]   (default 0 1 3)
Logs JSON lines to /tmp/sessCR.log.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessCR.log")


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from lz4_tpu.block import decode_jax
    from lz4_tpu.block.decode_jax import DICT_CAP as DCAP
    from lz4_tpu.block.encode_jax import DICT_CAP, encode_blocks
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    variants = [int(a) for a in sys.argv[1:]] or [0, 1, 3]
    bs = 65536
    B = 32
    total = 16 * 1024 * 1024
    data = real_corpus(total)
    nb = len(data) // bs
    K = (nb // B) * B
    src_all = np.frombuffer(data[: K * bs], np.uint8).reshape(K, bs)
    log(event="start", device=str(jax.devices()[0].platform), blocks=K,
        variants=variants)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][-1, -1])

    # encode once (same graph as the driver bench's non-scan chunk)
    lens = jnp.full(B, bs, jnp.int32)
    dbufs = jnp.zeros((B, DICT_CAP), jnp.uint8)
    dlens = jnp.zeros(B, jnp.int32)
    outs, sizes = [], []
    for i in range(0, K, B):
        o, cs, _ = encode_blocks(jnp.asarray(src_all[i: i + B]), lens,
                                 dbufs, dlens, cap_n=bs, has_dict=False)
        outs.append(o)
        sizes.append(cs)
    sync(outs[-1])
    comp_np = np.concatenate([np.asarray(o) for o in outs], axis=0)
    csz = np.concatenate([np.asarray(s) for s in sizes]).astype(np.int32)
    comp_j = jnp.asarray(comp_np)
    clens = jnp.asarray(csz)
    ddb = jnp.zeros((B, DCAP), jnp.uint8)
    ddl = jnp.zeros(B, jnp.int32)
    log(event="encoded", csize=int(csz.sum()))

    for rounds in variants:
        decode_jax.COMP_ROUNDS = rounds

        @functools.partial(jax.jit, static_argnames=("cap_out", "has_dict"))
        def dec_fn(comp, comp_lens, db, dl, *, cap_out, has_dict):
            out_caps = jnp.full(comp.shape[0], cap_out, jnp.int32)
            recs, err, seen_last = decode_jax._parse_tokens(
                comp, comp_lens, cap_out=cap_out, partial=False)
            fn = functools.partial(decode_jax._decode_one, cap_out=cap_out,
                                   has_dict=has_dict, partial=False)
            return jax.vmap(fn)(comp, comp_lens, db, dl, out_caps,
                                *recs, err, seen_last)

        def dec():
            res = []
            for i in range(0, K, B):
                res.append(dec_fn(comp_j[i: i + B], clens[i: i + B],
                                  ddb, ddl, cap_out=bs, has_dict=False))
            return res

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
        log(event="decode", comp_rounds=rounds,
            compile_s=round(t_first, 1), best_s=round(best, 3),
            MBs=round(mb / best, 1), err=errs, roundtrip=bool(ok))

    log(event="done")


if __name__ == "__main__":
    main()
