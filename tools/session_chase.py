"""One-process TPU A/B: decode straggler-chase formulation + big-tier
decode compile probe.

  1. CHASE_RANK=0 (committed scatter phase 2, W2=cap/4 — warm graph)
     vs CHASE_RANK=1 (rank-space compacted doubling, W2=cap/2 — fresh
     compile) on the real-file corpus at B=32 x 64 KB. The rank variant
     swaps the per-round W2-wide scatter for nothing (rounds become
     pure compacted takes) at the price of one extra 3-lane sort.
  2. cap_out=256 KB decode graph compile probe at B=8 (one dispatch of
     a tier above 64 KB): measures the big-tier decode compile cost
     through the relay so the engine's max_device_decode_size default
     can be lifted with evidence (VERDICT r1 weak #2).

Module globals are patched per variant (the env knobs bind at import);
each variant re-jits the same traced functions.

Usage: python tools/session_chase.py [do_rank] [do_bigtier]
Logs JSON lines to /tmp/sessC.log.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessC.log")


def main() -> None:
    import jax
    if os.environ.get("LZ4_TPU_SESSION_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from lz4_tpu.block import decode_jax
    from lz4_tpu.block.decode_jax import DICT_CAP as DCAP
    from lz4_tpu.block.encode_jax import DICT_CAP, encode_blocks
    from lz4_tpu.constants import compress_bound
    from lz4_tpu.utils.realcorpus import real_corpus

    log_f = open(LOG_PATH, "a", buffering=1)

    def log(**kw):
        kw["t"] = round(time.time(), 1)
        log_f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    do_rank = (sys.argv[1] != "0") if len(sys.argv) > 1 else True
    do_big = (sys.argv[2] != "0") if len(sys.argv) > 2 else True

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

    # encode once (same graph as the driver bench chunk — warm)
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

    def make_dec(cap_out):
        @functools.partial(jax.jit, static_argnames=("cap_out", "has_dict"))
        def dec_fn(comp, comp_lens, db, dl, *, cap_out, has_dict):
            out_caps = jnp.full(comp.shape[0], cap_out, jnp.int32)
            recs, err, seen_last = decode_jax._parse_tokens(
                comp, comp_lens, cap_out=cap_out, partial=False)
            fn = functools.partial(decode_jax._decode_one, cap_out=cap_out,
                                   has_dict=has_dict, partial=False)
            return jax.vmap(fn)(comp, comp_lens, db, dl, out_caps,
                                *recs, err, seen_last)
        return dec_fn

    if do_rank:
        for rank in (False, True):
            decode_jax.CHASE_RANK = rank
            dec_fn = make_dec(bs)

            def dec():
                res = []
                for i in range(0, K, B):
                    res.append(dec_fn(comp_j[i: i + B], clens[i: i + B],
                                      ddb, ddl, cap_out=bs, has_dict=False))
                return res

            t0 = time.perf_counter()
            r = dec()
            sync(r[-1])
            t_first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = dec()
                sync(r[-1])
                best = min(best, time.perf_counter() - t0)
            mb = K * bs / 1e6
            outv = np.concatenate([np.asarray(x[0]) for x in r], axis=0)
            errv = max(int(np.asarray(x[2]).max()) for x in r)
            ok = outv.reshape(-1).tobytes() == data[: K * bs]
            log(event="rank_chase", rank=bool(rank),
                compile_s=round(t_first, 1), best_s=round(best, 3),
                MBs=round(mb / best, 1), err=errv, roundtrip=bool(ok))

    if do_big:
        # 256 KB tier probe: B=8 blocks (2 MB out/dispatch, the engine's
        # per-tier dispatch width), host-C-encoded streams
        decode_jax.CHASE_RANK = True
        from lz4_tpu.block.backend import HostBackend
        cap_out = 262144
        B2 = 8
        blocks = [data[i * cap_out: (i + 1) * cap_out] for i in range(B2)]
        hb = HostBackend()
        comp_b = hb.compress_batch(blocks, level=1)
        cap_in = compress_bound(cap_out)
        cb = np.zeros((B2, cap_in), np.uint8)
        cl = np.zeros(B2, np.int32)
        for i, c in enumerate(comp_b):
            cb[i, : len(c)] = np.frombuffer(c, np.uint8)
            cl[i] = len(c)
        db2 = jnp.zeros((B2, DCAP), jnp.uint8)
        dl2 = jnp.zeros(B2, jnp.int32)
        dec_fn = make_dec(cap_out)
        log(event="bigtier_compile_start", cap_out=cap_out, B=B2)
        t0 = time.perf_counter()
        r = dec_fn(jnp.asarray(cb), jnp.asarray(cl), db2, dl2,
                   cap_out=cap_out, has_dict=False)
        sync(r)
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = dec_fn(jnp.asarray(cb), jnp.asarray(cl), db2, dl2,
                       cap_out=cap_out, has_dict=False)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        outv = np.asarray(r[0])
        ok = outv.reshape(-1).tobytes() == data[: B2 * cap_out]
        log(event="bigtier_decode", cap_out=cap_out, B=B2,
            compile_s=round(t_first, 1), best_s=round(best, 3),
            MBs=round(B2 * cap_out / 1e6 / best, 1),
            err=int(np.asarray(r[2]).max()), roundtrip=bool(ok))

    log(event="done")


if __name__ == "__main__":
    main()
