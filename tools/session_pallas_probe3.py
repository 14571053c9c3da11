"""Isolate Mosaic scalar-loop costs for the v3 decoder design.

Variants, each a while_loop on SMEM data (one 66KB packed block/step):
  a) dep-load chain: p advances by 1 + (byte & 3)  [the P1 probe]
  b) fixed stride p += 3, still loads byte (load off the critical path)
  c) no load: byte = p & 255 synthetic
  d) dep-load chain but 8 independent lanes interleaved in one carry
     (ILP probe: does interleaving hide the latency?)
  e) fori_loop fixed-count with a dependent load chain (acc-indexed)

Logs to /tmp/sessP3.log.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessP3.log"), "a",
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

    WORDS = 16640
    B = 8
    rng = np.random.default_rng(0)
    words_np = rng.integers(0, 2**31 - 1, (B, WORDS), dtype=np.int32)
    words = jnp.asarray(words_np)
    ns = jnp.full((B,), 65536, jnp.int32)

    GRID = int(os.environ.get("LZ4_TPU_P3_GRID", str(B)))

    def run(kern, n_iter_est, name, reps=5):
        n_iter_est *= GRID / B
        try:
            f = pl.pallas_call(
                kern,
                grid=(GRID,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )
            r = f(words, ns)
            np.asarray(r)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(words, ns))
                best = min(best, time.perf_counter() - t0)
            log(event=name, best_s=round(best, 4),
                ns_per_iter=round(best / n_iter_est * 1e9, 2))
        except Exception as e:
            log(event=name + "_failed", error=str(e)[:1200])

    # a) dependent-load chain
    def k_a(w_ref, n_ref, o_ref):
        b = pl.program_id(0) % 8
        n = n_ref[b]

        def body(st):
            p, acc = st
            byte = (w_ref[b, p // 4] >> (8 * (p % 4))) & 255
            return p + 1 + (byte & 3), acc + byte

        p, acc = jax.lax.while_loop(lambda st: st[0] < n, body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[b] = acc

    run(k_a, B * 65536 / 2.5, "a_dep_chain")

    # b) fixed stride, load present but off the address chain
    def k_b(w_ref, n_ref, o_ref):
        b = pl.program_id(0) % 8
        n = n_ref[b]

        def body(st):
            p, acc = st
            byte = (w_ref[b, p // 4] >> (8 * (p % 4))) & 255
            return p + 3, acc + byte

        p, acc = jax.lax.while_loop(lambda st: st[0] < n, body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[b] = acc

    run(k_b, B * 65536 / 3, "b_fixed_stride")

    # c) no load at all
    def k_c(w_ref, n_ref, o_ref):
        b = pl.program_id(0) % 8
        n = n_ref[b]

        def body(st):
            p, acc = st
            byte = (p * 7) & 255
            return p + 1 + (byte & 3), acc + byte

        p, acc = jax.lax.while_loop(lambda st: st[0] < n, body,
                                    (jnp.int32(0), jnp.int32(0)))
        o_ref[b] = acc

    run(k_c, B * 65536 / 2.5, "c_no_load")

    # d) 8 interleaved independent dep-chains within ONE grid step
    #    (each lane walks its own region of the same block)
    def k_d(w_ref, n_ref, o_ref):
        b = pl.program_id(0) % 8
        seg = n_ref[b] // 8

        def body(st):
            ps = st[:8]
            accs = st[8:16]
            ends = st[16:24]
            out = []
            outa = []
            for k in range(8):
                p = ps[k]
                byte = (w_ref[b, p // 4] >> (8 * (p % 4))) & 255
                adv = jnp.where(p < ends[k], 1 + (byte & 3), jnp.int32(0))
                out.append(p + adv)
                outa.append(accs[k] + jnp.where(p < ends[k], byte, 0))
            return tuple(out) + tuple(outa) + st[16:24]

        def cond(st):
            c = jnp.int32(0)
            for k in range(8):
                c = c + (st[k] < st[16 + k]).astype(jnp.int32)
            return c > 0

        init = tuple(jnp.int32(k) * seg for k in range(8)) \
            + tuple(jnp.int32(0) for _ in range(8)) \
            + tuple(jnp.int32(k + 1) * seg for k in range(8))
        st = jax.lax.while_loop(cond, body, init)
        acc = st[8]
        for k in range(9, 16):
            acc = acc + st[k]
        o_ref[b] = acc

    run(k_d, B * 65536 / 2.5, "d_interleave8")

    # e) fori_loop with a dependent load chain (loop count static)
    def k_e(w_ref, n_ref, o_ref):
        b = pl.program_id(0) % 8

        def body(i, st):
            p, acc = st
            byte = (w_ref[b, p // 4] >> (8 * (p % 4))) & 255
            return (p + 1 + (byte & 3)) % 65536, acc + byte

        p, acc = jax.lax.fori_loop(0, 26214, body,
                                   (jnp.int32(0), jnp.int32(0)))
        o_ref[b] = acc

    run(k_e, B * 26214, "e_fori_dep")

    log(event="done")


if __name__ == "__main__":
    main()
