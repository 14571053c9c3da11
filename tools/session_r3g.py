"""Encode kernel cost split (RTT-amortized): where do the 53 ms go?

Variants of the greedy hash-table kernel (copies of
block/encode_pallas.py's kernel with stages stripped):
  full    : as shipped
  nolits  : literal bytes not copied (op still advances)
  noemit  : no output writes at all (match search + parse only)
  nosrch  : emission only, matches forced every 16th position (fake
            parse — lower bound on emission cost; not size-correct)

Run: python tools/session_r3g.py  (logs /tmp/sessR3G.log)
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR3G.log"), "a",
           buffering=1)


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lz4_tpu.utils.realcorpus import real_corpus
    from lz4_tpu.constants import LASTLITERALS, MFLIMIT, compress_bound

    LANES = 128
    HASH_LOG = 15
    HASH_MUL = np.int32(np.uint32(2654435761))
    SKIP_TRIGGER = 6

    BS = 65536
    B = 32
    data = real_corpus(B * BS)[: B * BS]
    n = B * BS
    n_words = -(-(BS + 2 * LANES) // 4)
    n_words += (-n_words) % 128
    s = np.zeros((B, n_words * 4), np.uint8)
    s[:, :BS] = np.frombuffer(data, np.uint8).reshape(B, BS)
    b4 = s.reshape(B, 1, n_words, 4).astype(np.int32)
    src32 = jnp.asarray(b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
                        | (b4[..., 3] << 24))
    lens = jnp.full(B, BS, jnp.int32)
    bound = compress_bound(BS)
    w_out = -(-(bound + 4) // 4)
    w_out += (-w_out) % 128

    def make_kernel(mode):
        def kern(len_ref, src_ref, out_ref, csize_ref, table):
            b = pl.program_id(0)
            nb = len_ref[b]
            mflimit = nb - MFLIMIT
            matchlimit = nb - LASTLITERALS

            def rbyte(q):
                q = jnp.clip(q, 0, 4 * n_words - 1)
                return (src_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

            def read4(q):
                q = jnp.clip(q, 0, 4 * (n_words - 1) - 1)
                w1 = src_ref[0, 0, q >> 2]
                w2 = src_ref[0, 0, (q >> 2) + 1]
                sh = 8 * (q & 3)
                lo = jax.lax.shift_right_logical(w1, sh)
                hi = jnp.where(sh == 0, 0, w2 << ((32 - sh) & 31))
                return lo | hi

            def hash4(seq):
                return jax.lax.shift_right_logical(
                    seq * HASH_MUL, 32 - HASH_LOG) & ((1 << HASH_LOG) - 1)

            def wbyte(q, v):
                idx = q >> 2
                sh = 8 * (q & 3)
                w = out_ref[0, 0, idx]
                out_ref[0, 0, idx] = (w & ~(255 << sh)) | ((v & 255) << sh)

            def emit_len(op, ln, enable):
                def go(op):
                    def body(st):
                        op, ln2 = st
                        wbyte(op, 255)
                        return op + 1, ln2 - 255

                    op, ln2 = jax.lax.while_loop(
                        lambda st: st[1] >= 255, body, (op, ln))
                    wbyte(op, ln2)
                    return op + 1

                return jax.lax.cond(enable, go, lambda op: op, op)

            def copy_lits(op, a0, ln):
                if mode == "nolits":
                    return op + ln

                def body(st):
                    i, op = st
                    wbyte(op, rbyte(i))
                    return i + 1, op + 1

                _, op = jax.lax.while_loop(lambda st: st[0] < a0 + ln,
                                           body, (a0, op))
                return op

            def fwd_count(q1, q2, maxn):
                def body(st):
                    c, go = st
                    x = read4(q1 + c) ^ read4(q2 + c)
                    b0 = x & 255
                    b1 = x & 0xFF00
                    b2 = x & 0xFF0000
                    nbb = jnp.where(b0 != 0, 0,
                                    jnp.where(b1 != 0, 1,
                                              jnp.where(b2 != 0, 2, 3)))
                    add = jnp.where(x == 0, 4, nbb)
                    add = jnp.minimum(add, maxn - c)
                    return c + add, (x == 0) & (c + add < maxn)

                c, _ = jax.lax.while_loop(lambda st: st[1], body,
                                          (jnp.int32(0), maxn > 0))
                return c

            def parse_body(st):
                p, anchor, op, srch = st
                seq = read4(p)
                h = hash4(seq)
                e = table[h]
                table[h] = (b << 18) | p
                cand = e & 0x3FFFF
                if mode == "nosrch":
                    hit = (p - anchor) >= 16
                else:
                    hit = ((jax.lax.shift_right_logical(e, 18) == b)
                           & (cand < p) & (cand >= 0)
                           & (p - cand <= 65535)
                           & (read4(cand) == seq))

                def miss_fn(st):
                    p, anchor, op, srch = st
                    return (p + jax.lax.shift_right_logical(
                        srch, SKIP_TRIGGER), anchor, op, srch + 1)

                def hit_fn(st):
                    p, anchor, op, srch = st

                    def back(st2):
                        p2, c2 = st2
                        return p2 - 1, c2 - 1

                    if mode == "nosrch":
                        p2, cand2 = p, jnp.maximum(p - 16, 0)
                    else:
                        p2, cand2 = jax.lax.while_loop(
                            lambda st2: (st2[0] > anchor) & (st2[1] > 0)
                            & (rbyte(st2[0] - 1) == rbyte(st2[1] - 1)),
                            back, (p, cand))
                    offset = p2 - cand2
                    ml = 4 + fwd_count(p2 + 4, cand2 + 4,
                                       matchlimit - (p2 + 4))
                    litlen = p2 - anchor
                    m4 = ml - 4
                    if mode == "noemit":
                        op2 = op + 3 + litlen
                    else:
                        tok = ((jnp.minimum(litlen, 15) << 4)
                               | jnp.minimum(m4, 15))
                        wbyte(op, tok)
                        op2 = op + 1
                        op2 = emit_len(op2, litlen - 15, litlen >= 15)
                        op2 = copy_lits(op2, anchor, litlen)
                        wbyte(op2, offset & 255)
                        wbyte(op2 + 1, offset >> 8)
                        op2 = op2 + 2
                        op2 = emit_len(op2, m4 - 15, m4 >= 15)
                    t2 = p2 + ml - 2
                    table[hash4(read4(t2))] = (b << 18) | t2
                    return (p2 + ml, p2 + ml, op2,
                            jnp.int32(1 << SKIP_TRIGGER))

                return jax.lax.cond(hit, hit_fn, miss_fn,
                                    (p, anchor, op, srch))

            p, anchor, op, _ = jax.lax.while_loop(
                lambda st: st[0] <= mflimit, parse_body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(1 << SKIP_TRIGGER)))
            litlen = jnp.maximum(nb - anchor, 0)
            if mode == "noemit":
                op = op + 1 + litlen
            else:
                wbyte(op, jnp.minimum(litlen, 15) << 4)
                op = op + 1
                op = emit_len(op, litlen - 15, litlen >= 15)
                op = copy_lits(op, anchor, litlen)
            csize_ref[b] = op

        return kern

    def make(mode):
        f = pl.pallas_call(
            make_kernel(mode),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, n_words), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, w_out), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, w_out), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((1 << HASH_LOG,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        return f

    def sync(r):
        np.asarray(jax.tree.leaves(r)[0].ravel()[-1])

    for mode in ("full", "nolits", "noemit", "nosrch"):
        try:
            f = make(mode)
            r = f(lens, src32)
            sync(r)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                rs = [f(lens, src32) for _ in range(8)]
                sync(rs[-1])
                best = min(best, time.perf_counter() - t0)
            per = (best - 0.0245) / 8
            csz = int(np.asarray(r[1]).sum())
            log(event=mode, per_ms=round(per * 1e3, 2),
                MBs=round(n / 1e6 / per, 1), csize=csz)
        except Exception as e:
            log(event=mode + "_failed", error=str(e)[:400])

    log(event="done")


if __name__ == "__main__":
    main()
