"""Find the decode-parse pathology: the encode kernel sustains
~50 ns/iteration with a bigger scalar body, while the decode parse
pays ~400-700 ns/sequence. Variants (parse only, no copies), all on
the same real-corpus host-encoded streams:

  a_current : the shipped v6 parse state machine (bool carries,
              2 rare lax.cond escapes, compound loop cond)
  b_int32   : bool carries replaced by int32
  c_nocond  : lax.cond escapes replaced by pure selects (parse is
              WRONG for >1-byte 255-chains; cost signal only)
  d_minimal : c + loop cond reduced to p < M (no done/err in state)

Logs JSON lines to /tmp/sessR3F.log. Run: python tools/session_r3f.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR3F.log"), "a",
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
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.constants import compress_bound, MINMATCH

    BS = 65536
    B = 32
    data = real_corpus(B * BS)[: B * BS]
    blocks = [data[i: i + BS] for i in range(0, len(data), BS)]
    hb = HostBackend(nb_workers=0)
    comp = hb.compress_batch(blocks, level=1)
    cap_in = compress_bound(BS)
    carr = np.zeros((B, cap_in), np.uint8)
    clens = np.zeros(B, np.int32)
    nseq = 0
    for i, c in enumerate(comp):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
        # count sequences by a quick host parse
        p = 0
        while p < len(c):
            tok = c[p]
            lit = tok >> 4
            p += 1
            if lit == 15:
                while c[p] == 255:
                    lit += 255
                    p += 1
                lit += c[p]
                p += 1
            p += lit
            nseq += 1
            if p >= len(c):
                break
            p += 2
            if (tok & 15) == 15:
                while c[p] == 255:
                    p += 1
                p += 1
    log(event="setup", blocks=B, comp_total=int(clens.sum()), nseq=nseq)
    n = B * BS
    W = -(-cap_in // 4) + 128
    warr = np.zeros((B, 1, W), np.int32)
    w4 = np.zeros((B, W * 4), np.uint8)
    w4[:, :cap_in] = carr
    warr = w4.reshape(B, 1, W, 4).astype(np.int32)
    words_np = (warr[..., 0] | (warr[..., 1] << 8) | (warr[..., 2] << 16)
                | (warr[..., 3] << 24))
    words = jnp.asarray(words_np)
    lens = jnp.asarray(clens)

    def make(kern):
        f = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        return jax.jit(lambda l, w: f(l, w))

    def bench(name, kern):
        try:
            f = make(kern)
            t0 = time.time()
            r = np.asarray(f(lens, words))
            tc = time.time() - t0
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                r = f(lens, words)
                np.asarray(r[-1])
                best = min(best, time.perf_counter() - t0)
            log(event=name, compile_s=round(tc, 1),
                best_ms=round(best * 1e3, 1),
                MBs=round(n / 1e6 / best, 1),
                ns_per_seq=round(best / nseq * 1e9, 1),
                osum=int(np.asarray(r).sum()))
        except Exception as e:
            log(event=name + "_failed", error=str(e)[:600])

    def read4(w_ref, b, q):
        del b  # w_ref is a (1,1,W) block: always index 0
        w1 = w_ref[0, 0, q >> 2]
        w2 = w_ref[0, 0, (q >> 2) + 1]
        sh = 8 * (q & 3)
        lo = jax.lax.shift_right_logical(w1, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w2, 31 - sh), 1)
        return lo | hi

    def rbyte(w_ref, b, q):
        del b
        return (w_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

    def ext_len(w_ref, b, pos):
        def body(st):
            q, acc, _go = st
            v = rbyte(w_ref, b, q)
            return q + 1, acc + v, v == 255

        q, acc, _ = jax.lax.while_loop(
            lambda st: st[2], body, (pos, jnp.int32(0), True))
        return acc, q

    # ---- a: current v6 parse ------------------------------------------
    def k_a(len_ref, w_ref, o_ref):
        b = pl.program_id(0)
        M = len_ref[b]
        ow = jnp.int32(65536)

        def body(st):
            p, o, err, done = st
            w0 = read4(w_ref, b, p)
            litnib = (w0 >> 4) & 15
            matnib = w0 & 15
            e0 = (w0 >> 8) & 255
            one_ext = (litnib == 15).astype(jnp.int32)
            litlen_f = jnp.where(one_ext == 1, 15 + e0, litnib)
            lit_start_f = p + 1 + one_ext
            litlen, lit_start = jax.lax.cond(
                (one_ext == 1) & (e0 == 255),
                lambda _: (lambda ea: (270 + ea[0], ea[1]))(
                    ext_len(w_ref, b, p + 2)),
                lambda _: (litlen_f, lit_start_f), 0)
            lit_end = lit_start + litlen
            w1 = read4(w_ref, b, jnp.minimum(lit_end, M))
            offset = w1 & 0xFFFF
            m0 = (w1 >> 16) & 255
            m_ext = ((matnib == 15) & (lit_end < M)).astype(jnp.int32)
            mext_f = jnp.where(m_ext == 1, m0, 0)
            next_p_f = lit_end + 2 + m_ext
            mext, next_p = jax.lax.cond(
                (m_ext == 1) & (m0 == 255),
                lambda _: (lambda ea: (255 + ea[0], ea[1]))(
                    ext_len(w_ref, b, lit_end + 3)),
                lambda _: (mext_f, next_p_f), 0)
            mlen = MINMATCH + matnib + mext
            is_last = lit_end >= M
            serr = err | (is_last & (lit_end != M)) | ((o + litlen) > ow)
            o_mid = o + litlen
            bad_mid = (next_p > M) | (offset == 0) | (lit_end > M - 8)
            serr = serr | (~is_last & bad_mid)
            do_match = ~is_last & ~serr
            serr = serr | (do_match & ((o_mid - offset) < 0))
            serr = serr | (do_match & ((o_mid + mlen) > ow))
            serr = serr | (do_match & (o_mid > ow - 12))
            do_match = do_match & ~serr
            o_next = jnp.where(do_match, o_mid + mlen,
                               jnp.where(serr, o, o_mid))
            return next_p, o_next, serr, done | is_last | serr

        p, o, err, done = jax.lax.while_loop(
            lambda st: (st[0] < M) & ~st[2] & ~st[3], body,
            (jnp.int32(0), jnp.int32(0), M < 0, M < 0))
        o_ref[b] = jnp.where(err | ~done, 0, o)

    bench("a_current", k_a)

    # ---- b: int32 carries ---------------------------------------------
    def k_b(len_ref, w_ref, o_ref):
        b = pl.program_id(0)
        M = len_ref[b]
        ow = jnp.int32(65536)

        def body(st):
            p, o, bad = st
            w0 = read4(w_ref, b, p)
            litnib = (w0 >> 4) & 15
            matnib = w0 & 15
            e0 = (w0 >> 8) & 255
            one_ext = (litnib == 15).astype(jnp.int32)
            litlen_f = jnp.where(one_ext == 1, 15 + e0, litnib)
            lit_start_f = p + 1 + one_ext
            litlen, lit_start = jax.lax.cond(
                (one_ext == 1) & (e0 == 255),
                lambda _: (lambda ea: (270 + ea[0], ea[1]))(
                    ext_len(w_ref, b, p + 2)),
                lambda _: (litlen_f, lit_start_f), 0)
            lit_end = lit_start + litlen
            w1 = read4(w_ref, b, jnp.minimum(lit_end, M))
            offset = w1 & 0xFFFF
            m0 = (w1 >> 16) & 255
            m_ext = ((matnib == 15) & (lit_end < M)).astype(jnp.int32)
            mext_f = jnp.where(m_ext == 1, m0, 0)
            next_p_f = lit_end + 2 + m_ext
            mext, next_p = jax.lax.cond(
                (m_ext == 1) & (m0 == 255),
                lambda _: (lambda ea: (255 + ea[0], ea[1]))(
                    ext_len(w_ref, b, lit_end + 3)),
                lambda _: (mext_f, next_p_f), 0)
            mlen = MINMATCH + matnib + mext
            is_last = lit_end >= M
            o_mid = o + litlen
            src = o_mid - offset
            viol = ((is_last & (lit_end != M)) | ((o + litlen) > ow)
                    | (~is_last & ((next_p > M) | (offset == 0)
                                   | (lit_end > M - 8) | (src < 0)
                                   | ((o_mid + mlen) > ow)
                                   | (o_mid > ow - 12))))
            o_next = o_mid + jnp.where(is_last, 0, mlen)
            p_next = jnp.where(
                is_last, jnp.where(lit_end == M, M + 1, M + 9), next_p)
            p_next = jnp.where(viol, M + 9, p_next)
            return p_next, o_next, bad | viol.astype(jnp.int32)

        p, o, bad = jax.lax.while_loop(
            lambda st: st[0] < M, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        o_ref[b] = jnp.where((bad == 0) & (p == M + 1), o, 0)

    bench("b_int32", k_b)

    # ---- c: no lax.cond (single-ext-byte parse, cost signal only) -----
    def k_c(len_ref, w_ref, o_ref):
        b = pl.program_id(0)
        M = len_ref[b]
        Wb = jnp.int32(4 * (W - 1) - 1)

        def body(st):
            p, o, bad = st
            w0 = read4(w_ref, b, jnp.minimum(p, Wb))
            litnib = (w0 >> 4) & 15
            matnib = w0 & 15
            e0 = (w0 >> 8) & 255
            one_ext = (litnib == 15).astype(jnp.int32)
            litlen = jnp.where(one_ext == 1, 15 + e0, litnib)
            lit_end = p + 1 + one_ext + litlen
            w1 = read4(w_ref, b, jnp.minimum(lit_end, M))
            offset = w1 & 0xFFFF
            m0 = (w1 >> 16) & 255
            m_ext = ((matnib == 15) & (lit_end < M)).astype(jnp.int32)
            mext = jnp.where(m_ext == 1, m0, 0)
            next_p = lit_end + 2 + m_ext
            mlen = MINMATCH + matnib + mext
            is_last = lit_end >= M
            o_next = o + litlen + jnp.where(is_last, 0, mlen)
            viol = (is_last & (lit_end != M)) | (~is_last & (offset == 0))
            p_next = jnp.where(
                is_last, jnp.where(lit_end == M, M + 1, M + 9), next_p)
            return p_next, o_next, bad | viol.astype(jnp.int32)

        p, o, bad = jax.lax.while_loop(
            lambda st: st[0] < M, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        o_ref[b] = jnp.where((bad == 0) & (p == M + 1), o, 0)

    bench("c_nocond", k_c)

    # ---- d: minimal — c without the viol bookkeeping ------------------
    def k_d(len_ref, w_ref, o_ref):
        b = pl.program_id(0)
        M = len_ref[b]
        Wb = jnp.int32(4 * (W - 1) - 1)

        def body(st):
            p, o = st
            w0 = read4(w_ref, b, jnp.minimum(p, Wb))
            litnib = (w0 >> 4) & 15
            matnib = w0 & 15
            e0 = (w0 >> 8) & 255
            one_ext = (litnib == 15).astype(jnp.int32)
            litlen = jnp.where(one_ext == 1, 15 + e0, litnib)
            lit_end = p + 1 + one_ext + litlen
            w1 = read4(w_ref, b, jnp.minimum(lit_end, M))
            m0 = (w1 >> 16) & 255
            m_ext = ((matnib == 15) & (lit_end < M)).astype(jnp.int32)
            mext = jnp.where(m_ext == 1, m0, 0)
            next_p = lit_end + 2 + m_ext
            mlen = MINMATCH + matnib + mext
            is_last = lit_end >= M
            o_next = o + litlen + jnp.where(is_last, 0, mlen)
            return jnp.where(is_last, M + 1, next_p), o_next

        p, o = jax.lax.while_loop(
            lambda st: st[0] < M, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[b] = o

    bench("d_minimal", k_d)

    log(event="done")


if __name__ == "__main__":
    main()
