"""One-process TPU A/B: decode chase formulations on the refactored
(lane-packed) decode graph, real-file corpus, B=32 x 64 KB.

Variants (each a fresh jit of the same module functions with patched
module knobs, the session_comprounds pattern):

  sort=k  — k leading full-width doubling rounds as merge-by-sort
            (2 one-payload-lane sorts per round, straight-line)
            instead of serialized full-width takes
  rank=1  — straggler phase in compacted rank space (no per-round
            scatter) with the phase-1 threshold at cap/2

Every variant's output is round-trip-verified against the corpus —
this doubles as the on-device lowering validation the r1 composition
bug taught us to demand (sorts under loops miscompiled; these are
unrolled straight-line).

Usage: python tools/session_r3chase.py
Logs JSON lines to /tmp/sessR3.log.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_PATH = os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR3.log")


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

    # encode on the host C tier (format-legal input is all the decode
    # A/B needs; skips a device encode compile)
    from lz4_tpu import native
    from lz4_tpu.constants import compress_bound
    hblocks = native.blockcodec.compress_batch(
        [src_all[i].tobytes() for i in range(K)])
    cap_in = compress_bound(bs)
    comp_np = np.zeros((K, cap_in), np.uint8)
    csz = np.zeros(K, np.int32)
    for i, c in enumerate(hblocks):
        comp_np[i, : len(c)] = np.frombuffer(c, np.uint8)
        csz[i] = len(c)
    comp_j = jnp.asarray(comp_np)
    clens = jnp.asarray(csz)
    ddb = jnp.zeros((B, DCAP), jnp.uint8)
    ddl = jnp.zeros(B, jnp.int32)
    log(event="encoded", csize=int(csz.sum()))

    variants = [(1, False), (2, False), (0, True), (1, True), (0, False)]
    env = os.environ.get("LZ4_TPU_SESSION_VARIANTS")
    if env:
        variants = [(int(s.split(":")[0]), s.split(":")[1] == "1")
                    for s in env.split(",")]

    for sort_rounds, rank in variants:
        decode_jax.CHASE_SORT_ROUNDS = sort_rounds
        decode_jax.CHASE_RANK = rank

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

        log(event="compile_start", sort=sort_rounds, rank=rank)
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
        log(event="decode", sort=sort_rounds, rank=bool(rank),
            compile_s=round(t_first, 1), best_s=round(best, 3),
            MBs=round(mb / best, 1), err=errs, roundtrip=bool(ok))

    log(event="done")


if __name__ == "__main__":
    main()
