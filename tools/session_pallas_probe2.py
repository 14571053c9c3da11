"""TPU probes for the Pallas decoder v3 design.

P1: SMEM capacity — can a (16640,) int32 input (a full 64KB+pad block
    packed 4 bytes/word) live in SMEM per grid step, and what does a
    scalar-unit parse loop over it cost?
P2: megacore — does dimension_semantics=("parallel",) run grid steps
    on two cores (2x wall time on an embarrassingly parallel grid)?

Logs JSON lines to /tmp/sessP2.log.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessP2.log"), "a",
           buffering=1)


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = jax.devices()[0]
    log(event="device", platform=d.platform, kind=getattr(d, "device_kind", "?"),
        num=len(jax.devices()))

    # ---- P1: SMEM block input + scalar parse walk ---------------------
    WORDS = 16640          # 66,560 bytes packed 4/word

    def k_smem(words_ref, n_ref, out_ref):
        b = pl.program_id(0)
        n = n_ref[b]

        def body(st):
            p, acc = st
            w = words_ref[b, p // 4]
            byte = (w >> (8 * (p % 4))) & 255
            # mimic a token parse: a couple of scalar ops + data-dep step
            step = 1 + (byte & 3)
            return p + step, acc + byte

        p, acc = jax.lax.while_loop(lambda st: st[0] < n, body,
                                    (jnp.int32(0), jnp.int32(0)))
        out_ref[b] = acc

    B = 8
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**31 - 1, (B, WORDS), dtype=np.int32)
    ns = np.full(B, 65536, np.int32)

    try:
        f = pl.pallas_call(
            k_smem,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        t0 = time.perf_counter()
        r = f(jnp.asarray(words), jnp.asarray(ns))
        got = np.asarray(r)
        t_compile = time.perf_counter() - t0
        # expected (host replay)
        flat = words.view(np.uint32)
        exp = np.zeros(B, np.int64)
        for i in range(B):
            p = acc = 0
            w = words[i]
            while p < 65536:
                byte = (int(w[p // 4]) >> (8 * (p % 4))) & 255
                p += 1 + (byte & 3)
                acc += byte
            exp[i] = acc & 0xFFFFFFFF
        ok = all(int(got[i]) & 0xFFFFFFFF == int(exp[i]) for i in range(B))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = f(jnp.asarray(words), jnp.asarray(ns))
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        # ~26k iterations/block avg (step avg 2.5) * 8 blocks
        iters = B * 65536 / 2.5
        log(event="p1_smem_parse", ok=bool(ok), compile_s=round(t_compile, 1),
            best_s=round(best, 4), ns_per_iter=round(best / iters * 1e9, 1))
    except Exception as e:
        log(event="p1_failed", error=str(e)[:1500])

    # ---- P2: megacore probe -------------------------------------------
    def k_burn(x_ref, o_ref):
        def body(i, acc):
            return acc * 1.000001 + x_ref[0]

        o_ref[pl.program_id(0)] = jax.lax.fori_loop(
            0, 200000, body, jnp.float32(0.0))

    for sem in ("arbitrary", "parallel"):
        try:
            f = pl.pallas_call(
                functools.partial(k_burn),
                grid=(16,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((16,), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem,)),
            )
            x = jnp.ones((1,), jnp.float32)
            r = f(x)
            np.asarray(r)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                r = f(x)
                np.asarray(r)
                best = min(best, time.perf_counter() - t0)
            log(event="p2_megacore", semantics=sem, best_s=round(best, 4))
        except Exception as e:
            log(event="p2_failed", semantics=sem, error=str(e)[:800])

    log(event="done")


if __name__ == "__main__":
    main()
