"""Per-stage device micro-benchmark (the reference's fullbench analog,
tests/fullbench.c:170-516): times every primitive class the codec is
built from, plus the end-to-end block codec per corpus type, so perf
regressions are attributable to a stage.

Usage:
    python tools/fullbench.py            # real device (TPU under axon)
    python tools/fullbench.py --cpu      # forced-CPU sanity run
    python tools/fullbench.py --b 32 --block 65536 --seconds 2

Prints one JSON line per stage: {"stage": ..., "ms": ..., "net_ms": ...,
"MBs": ...} where net_ms subtracts the measured empty-dispatch overhead
(the remote relay costs ~27 ms per dispatch+sync; block_until_ready is
not a barrier, so sync is a dependent device->host transfer).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(m):
    print(f"[fullbench] {m}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=32, help="batch of blocks")
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--seconds", type=float, default=1.5)
    ap.add_argument("--stages", default="", help="comma filter")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from lz4_tpu.block.decode_jax import DICT_CAP as DDC
    from lz4_tpu.block.decode_jax import decode_blocks
    from lz4_tpu.block.encode_jax import DICT_CAP, encode_blocks
    from lz4_tpu.utils.datagen import gen_buffer, gen_text

    B, NB = args.b, args.block
    N = NB + 272                        # the encoder's padded width class
    rng = np.random.default_rng(7)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.reshape(-1)[-1:])

    def timeit(name, fn, *xs, bytes_moved=None, jit=True):
        if args.stages and name not in args.stages.split(","):
            return None
        # already-jitted codec entry points are called directly so this
        # run warms the exact executables bench.py dispatches
        f = jax.jit(fn) if jit else fn
        r = f(*xs)
        sync(r)                          # compile + warm
        best, elapsed, runs = float("inf"), 0.0, 0
        while (elapsed < args.seconds or runs < 3) and runs < 40:
            t0 = time.perf_counter()
            r = f(*xs)
            sync(r)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            elapsed += dt
            runs += 1
        return name, best

    # ---- operands -------------------------------------------------------
    k32 = jnp.asarray(rng.integers(0, 2**31, (B, N), dtype=np.int32))
    p1 = jnp.asarray(rng.integers(0, 2**31, (B, N), dtype=np.int32))
    u8 = jnp.asarray(rng.integers(0, 256, (B, N), dtype=np.uint8))
    gidx = jnp.asarray(rng.integers(0, N, (B, N), dtype=np.int32))

    results = []

    def record(out, bytes_moved=None):
        if out is None:
            return
        name, best = out
        row = {"stage": name, "ms": round(best * 1e3, 2)}
        if results and results[0]["stage"] == "noop":
            row["net_ms"] = round(best * 1e3 - results[0]["ms"], 2)
        if bytes_moved:
            row["MBs"] = round(bytes_moved / 1e6 / best, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    # dispatch+sync floor
    record(timeit("noop", lambda x: x[:1, :1] + 1, k32))
    record(timeit("elementwise", lambda x: (x ^ (x >> 3)) + 1, k32),
           bytes_moved=B * N * 8)
    record(timeit("cumsum", lambda x: jnp.cumsum(x, axis=1), k32))
    record(timeit("cummin_rev",
                  lambda x: jax.lax.cummin(x, axis=1, reverse=True), k32))
    record(timeit("sort1", lambda k: jax.lax.sort((k,), num_keys=1), k32))
    record(timeit("sort2",
                  lambda k, p: jax.lax.sort((k, p), num_keys=1), k32, p1))
    record(timeit(
        "sort7",
        lambda k, p: jax.lax.sort((k, p, p + 1, p + 2, p + 3, p + 4, p + 5),
                                  num_keys=1), k32, p1))
    record(timeit("gather_rand",
                  lambda p, i: jax.vmap(jnp.take)(p, i), p1, gidx),
           bytes_moved=B * N * 4)
    from lz4_tpu.block.decode_jax import sort_gather
    record(timeit("sort_gather",
                  lambda p, i: jax.vmap(sort_gather)(p, i), p1, gidx),
           bytes_moved=B * N * 4)
    record(timeit("gather_u8",
                  lambda p, i: jax.vmap(jnp.take)(p, i), u8, gidx),
           bytes_moved=B * N)

    # serial scan cost: the parse-loop shape (2 dynamic takes per hop)
    def scan_hops(p, steps, unroll):
        pe = p[:, : N - 8]

        def one(c, row):
            return jnp.take(row, jnp.clip(c + 3, 0, N - 9)), c

        def body(c, _):
            outs = []
            for _u in range(unroll):
                c, o = jax.vmap(one)(c, pe)
                outs.append(o)
            return c, tuple(outs)

        c, outs = jax.lax.scan(body, jnp.zeros(B, jnp.int32), None,
                               length=steps)
        return c

    record(timeit("scan_16k_u1", lambda p: scan_hops(p, 16386, 1), p1))
    record(timeit("scan_4k_u4", lambda p: scan_hops(p, 4097, 4), p1))

    # one 2-lane take per hop (the r3 parse-table pattern: pairing
    # (nm, ml) / (tok, ext) on a minor axis halves the dependent-take
    # chain — this stage proves the paired take costs the same as one)
    def scan_hops2(p, steps):
        tab = jnp.stack([p[:, : N - 8], p[:, : N - 8] + 1], axis=-1)

        def body(c, _):
            g = jnp.take_along_axis(
                tab, jnp.clip(c[:, None, None] + 3, 0, N - 9), axis=1)
            return g[:, 0, 0] - g[:, 0, 1] + 1 + c, c

        c, _ = jax.lax.scan(body, jnp.zeros(B, jnp.int32), None,
                            length=steps)
        return c

    record(timeit("scan_16k_2lane", lambda p: scan_hops2(p, 16386), p1))

    # ---- end-to-end codec per corpus type -------------------------------
    corpora = {
        "text": gen_text(B * NB, seed=11),
        "mixed": gen_buffer(B * NB, match_prob=0.55, seed=12),
        "rle": b"\x00" * (B * NB),
        "random": rng.bytes(B * NB),
    }
    dicts_e = jnp.zeros((B, DICT_CAP), jnp.uint8)
    dl_e = jnp.zeros(B, jnp.int32)
    dicts_d = jnp.zeros((B, DDC), jnp.uint8)
    dl_d = jnp.zeros(B, jnp.int32)
    lens = jnp.full(B, NB, jnp.int32)

    # decode stage split: fresh jits of the internal phases (the
    # module-level decode_blocks jit caches on shapes, so the
    # CHASE_RMAX_OVERRIDE knob needs its own wrapper)
    from lz4_tpu.block import decode_jax as _dj
    import functools as _ft

    def _dec_floor(c, s, *, cap_out):
        out_caps = jnp.full(c.shape[0], cap_out, jnp.int32)
        recs, err, seen = _dj._parse_tokens(c, s, cap_out=cap_out,
                                            partial=False)
        fn = _ft.partial(_dj._decode_one, cap_out=cap_out,
                         has_dict=False, partial=False)
        return jax.vmap(fn)(c, s, dicts_d, dl_d, out_caps, *recs, err, seen)

    for cname, blob in corpora.items():
        srcb = jnp.asarray(np.frombuffer(blob, np.uint8).reshape(B, NB))
        out = timeit(f"encode_{cname}",
                     lambda s: encode_blocks(s, lens, dicts_e, dl_e,
                                             cap_n=NB, has_dict=False),
                     srcb, jit=False)
        record(out, bytes_moved=B * NB)
        comp, csizes, _ = encode_blocks(srcb, lens, dicts_e, dl_e,
                                        cap_n=NB, has_dict=False)
        comp = jnp.asarray(np.asarray(comp))
        csz = jnp.asarray(np.asarray(csizes).astype(np.int32))
        out = timeit(f"decode_{cname}",
                     lambda c, s: decode_blocks(c, s, dicts_d, dl_d,
                                                cap_out=NB,
                                                has_dict=False),
                     comp, csz, jit=False)
        record(out, bytes_moved=B * NB)
        if cname in ("text", "mixed", "rle"):
            # parse scan alone, then everything-but-the-chase: the
            # difference attributes the chase share per corpus
            out = timeit(
                f"dparse_{cname}",
                lambda c, s: _dj._parse_tokens(c, s, cap_out=NB,
                                               partial=False),
                comp, csz)
            record(out, bytes_moved=B * NB)
            _dj.CHASE_RMAX_OVERRIDE = 0
            try:
                out = timeit(f"dfloor_{cname}",
                             jax.jit(_ft.partial(_dec_floor, cap_out=NB)),
                             comp, csz, jit=False)
                record(out, bytes_moved=B * NB)
            finally:
                _dj.CHASE_RMAX_OVERRIDE = None
        if cname in ("text", "mixed"):
            # acceleration graph (--fast>=4): fewer sort payload lanes
            out = timeit(f"encode_fast_{cname}",
                         lambda s: encode_blocks(s, lens, dicts_e, dl_e,
                                                 cap_n=NB, has_dict=False,
                                                 lite=True),
                         srcb, jit=False)
            record(out, bytes_moved=B * NB)

    _log("summary:")
    for r in results:
        _log(f"  {r['stage']:<16} {r['ms']:>9.2f} ms"
             + (f"  {r.get('MBs', ''):>8} MB/s" if 'MBs' in r else ""))


if __name__ == "__main__":
    main()
