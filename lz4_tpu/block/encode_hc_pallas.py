"""Pallas serial-block LZ4-HC encoder — hash-chain search on TPU.

The device analog of the reference's hashChain tier (levels 3-9,
LZ4HC_compress_hashChain / LZ4HC_InsertAndGetWiderMatch,
/root/reference/lib/lz4hc.c:884-1310), built on the fast kernel's
measured machine model (encode_pallas.py): one block per grid step,
all parsing on the scalar unit from packed SMEM words, the pending-
word sequential emitter, cond-free outer loop.

Round-4 revision: the parse is the reference's FULL 3-match overlap
arbitration — the _Search2/_Search3 goto graph (lz4hc.c:1157-1310)
converted to a lax.switch state machine, with the wider-match search
(LZ4HC_InsertAndGetWiderMatch incl. the can-beat filter,
lz4hc.c:884-1104) and the level-9 repeat-pattern analysis
(countPattern/reverseCountPattern jumps, lz4hc.c:811-1059). The port
mirrors the host lazy tier (compress_lazy, native/hccodec.c) structure
exactly and produces BYTE-IDENTICAL streams to it at every routed
level and depth (tests/test_encode_hc_pallas.py), which in turn grades
byte-identical to the reference hashChain — so device HC levels 3-9
are exact-parity with the reference (round-3 verdict #4 closed).

TPU-side representation choices:

  * the chain table stores 16-bit PREVIOUS-OCCURRENCE DELTAS packed
    two per int32 SMEM word (the reference's chainTable is 64K u16,
    lz4hc.h:235-250) — a delta past the 64 KB window doubles as the
    chain terminator; head entries carry a grid-step tag so neither
    table is ever cleared;
  * search positions strictly increase across the whole parse (an
    invariant of the reference's goto graph: every next probe lands
    past the previous one because m.len counts back-extension), so
    delta-chain walks are exactly equivalent to the reference's
    absolute-index walks;
  * all inserts happen in order through insert_range (LZ4HC_Insert
    analog); searched positions are NOT self-inserted.

No dictionary mode: linked/dict HC batches route to the host tier
(engine gate).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lz4_tpu.constants import LASTLITERALS, MFLIMIT, compress_bound

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

HASH_LOG = 15
HASH_MUL = np.int32(np.uint32(2654435761))
WINDOW = 65535

#: search depth per level 0..12 — the reference's nbSearches ladder
#: (lz4hc.c:92-106 / kTries in native/hccodec.c); the parse is now the
#: full 3-match arbitration, so no extra depth is needed
K_DEPTH = (4, 4, 4, 4, 8, 16, 32, 64, 128, 256, 256, 256, 256)


def _hc_kernel(len_ref, src_ref, out_ref, csize_ref, trail_ref,
               head, chainw, *, n_words: int, w_out: int, depth: int,
               favor: int = 0):
    """One block per grid step; no-dict HC chain parse.
    head: (2^HASH_LOG,) int32 scratch — last position+1 per hash, with
    a grid-step tag in the high bits (never cleared); chainw:
    (2^15,) int32 scratch — 2x16-bit prev deltas, overwritten as
    positions insert (stale halves terminate via the window check)."""
    b = pl.program_id(0)
    bt = b & 0x3FFF
    n = len_ref[b]
    mflimit = n - MFLIMIT
    matchlimit = n - LASTLITERALS
    # pattern analysis kicks in at nbSearches > 128, i.e. level 9
    # (lz4hc.c:1133)
    pa = depth > 128

    def rbyte(q):
        return (src_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

    def read4(q):
        w1 = src_ref[0, 0, q >> 2]
        w2 = src_ref[0, 0, (q >> 2) + 1]
        sh = 8 * (q & 3)
        lo = jax.lax.shift_right_logical(w1, sh)
        hi = jax.lax.shift_left(jax.lax.shift_left(w2, 31 - sh), 1)
        return lo | hi

    def hash4(seq):
        return jax.lax.shift_right_logical(
            seq * HASH_MUL, 32 - HASH_LOG) & ((1 << HASH_LOG) - 1)

    def chain_get(q):
        w = chainw[q >> 1]
        return jax.lax.shift_right_logical(w, (q & 1) * 16) & 0xFFFF

    def chain_set(q, d):
        sh = (q & 1) * 16
        w = chainw[q >> 1]
        chainw[q >> 1] = (w & ~(0xFFFF << sh)) | ((d & 0xFFFF) << sh)

    def insert(q):
        """head[h] -> q, chain[q] -> delta to the previous occurrence.
        head entries carry a 14-bit grid tag; a stale-tag head means
        'no chain' (delta 0 terminates). Re-inserting the current head
        is a no-op (a zero self-delta would sever q's chain tail)."""
        seq = read4(q)
        h = hash4(seq)
        e = head[h]
        prev = e & 0x3FFFF
        stale = jax.lax.shift_right_logical(e, 18) != bt
        same = ~stale & (prev == q)
        d = q - prev
        d = jnp.where(stale | (d > WINDOW) | (d <= 0), 0, d)
        old = chain_get(q)
        chain_set(q, jnp.where(same, old, d))
        head[h] = (bt << 18) | q

    def fwd_count(q1, q2, maxn):
        """Equal bytes at src[q1+i]==src[q2+i], i<maxn, 8 per iter."""
        def ctzb(x):
            return jnp.where(x & 255 != 0, 0,
                             jnp.where(x & 0xFF00 != 0, 1,
                                       jnp.where(x & 0xFF0000 != 0, 2,
                                                 3)))

        def body(st):
            c, go = st
            x1 = read4(q1 + c) ^ read4(q2 + c)
            x2 = read4(q1 + c + 4) ^ read4(q2 + c + 4)
            add = jnp.where(x1 != 0, ctzb(x1),
                            jnp.where(x2 != 0, 4 + ctzb(x2), 8))
            add = jnp.minimum(add, maxn - c)
            return c + add, (x1 == 0) & (x2 == 0) & (c + add < maxn)

        c, _ = jax.lax.while_loop(lambda st: st[1], body,
                                  (jnp.int32(0), maxn > 0))
        return c

    def back_count(q1, q2, maxn):
        """Equal bytes at src[q1-1-i]==src[q2-1-i], i<maxn (byte/iter:
        back runs are short)."""
        def body(st):
            c, go = st
            eq = (rbyte(q1 - 1 - c) == rbyte(q2 - 1 - c)) & (c + 1 <= maxn)
            return c + eq.astype(jnp.int32), eq & (c + 1 < maxn)

        c, _ = jax.lax.while_loop(lambda st: st[1], body,
                                  (jnp.int32(0), maxn > 0))
        return c

    def read16c(q):
        """16-bit LE read with a >=0 clamp: the can-beat filter may
        form an out-of-range address for candidates that cannot beat
        anyway (see lazy_search in native/hccodec.c) — the clamp only
        changes reads whose outcome is irrelevant."""
        return read4(jnp.maximum(q, 0)) & 0xFFFF

    def count_pat_fwd(q, pat, limit):
        """Run length of the repeating 4-byte pattern starting at q
        (LZ4HC_countPattern analog, lz4hc.c:820-848)."""
        def wb(st):
            p, _ = st
            ok = (p + 4 <= limit) & (read4(p) == pat)
            return jnp.where(ok, p + 4, p), ok

        p, _ = jax.lax.while_loop(lambda st: st[1], wb,
                                  (q, jnp.bool_(True)))
        x = pat
        go = jnp.bool_(True)
        for _ in range(3):
            ok = go & (p < limit) & (rbyte(p) == (x & 255))
            p = p + ok.astype(jnp.int32)
            go = ok
            x = jax.lax.shift_right_logical(x, 8) | jax.lax.shift_left(x, 24)
        return p - q

    def count_pat_rev(q, pat, low):
        """Run length of the pattern ending at q, scanning backwards
        (LZ4HC_reverseCountPattern analog, lz4hc.c:853-868)."""
        def wb(st):
            p, _ = st
            ok = (p >= low + 4) & (read4(p - 4) == pat)
            return jnp.where(ok, p - 4, p), ok

        p, _ = jax.lax.while_loop(lambda st: st[1], wb,
                                  (q, jnp.bool_(True)))
        x = pat
        go = jnp.bool_(True)
        for _ in range(3):
            hb = jax.lax.shift_right_logical(x, 24) & 255
            ok = go & (p > low) & (rbyte(jnp.maximum(p - 1, 0)) == hb)
            p = p - ok.astype(jnp.int32)
            go = ok
            x = jax.lax.shift_left(x, 8) | jax.lax.shift_right_logical(x, 24)
        return q - p

    def lazy_search(pos, lowpos, longest0, ni):
        """Widest match whose start may back-extend to lowpos, beating
        longest0 — the LZ4HC_InsertAndGetWiderMatch port mirrored from
        the host lazy tier (lazy_search, native/hccodec.c; reference
        lz4hc.c:884-1104) including the can-beat filter and, at
        pa (nbSearches > 128, i.e. level 9), the repeat-pattern
        analysis (lz4hc.c:987-1059). Positions [ni, pos) are inserted
        first (LZ4HC_Insert analog); pos itself is NOT inserted.
        Returns (len, off, back, ni'): off == 0 means nothing beat."""
        ni2 = insert_range(ni, pos)
        pat = read4(pos)
        h = hash4(pat)
        e = head[h]
        stale = jax.lax.shift_right_logical(e, 18) != bt
        prev = e & 0x3FFFF
        lowest = jnp.maximum(pos - WINDOW, 0)
        lookback = pos - lowpos
        c0 = prev
        alive0 = ~stale & (c0 >= lowest) & (c0 < pos)

        def body(st):
            c, tries, lg, offb, backb, rep, spl = st
            # ---- score candidate c (filter + wider extension) -------
            filt = read16c(lowpos + lg - 1) == \
                read16c(c - lookback + lg - 1)
            ok = filt & (read4(c) == pat)
            if favor:
                ok = ok & ~((pos - c) < 8)
            fl = jnp.where(ok, fwd_count(pos + 4, c + 4,
                                         matchlimit - (pos + 4)),
                           jnp.int32(-4))
            bk = jnp.where(ok & (lookback > 0),
                           back_count(pos, c, jnp.minimum(lookback, c)),
                           0)
            tot = 4 + fl + bk
            better = ok & (tot > lg)
            lg = jnp.where(better, tot, lg)
            offb = jnp.where(better, pos - c, offb)
            backb = jnp.where(better, bk, backb)

            # ---- next candidate -------------------------------------
            dlt = chain_get(c)
            if pa:
                pa_hit = (c > 0) & (dlt == 1)

                def detect(_):
                    periodic = ((pat & 0xFFFF) ==
                                jax.lax.shift_right_logical(pat, 16)) \
                        & ((pat & 255) ==
                           jax.lax.shift_right_logical(pat, 24))
                    spl_n = jnp.where(
                        periodic,
                        count_pat_fwd(pos + 4, pat, matchlimit) + 4,
                        spl)
                    return jnp.where(periodic, 2, 1), spl_n

                rep, spl = jax.lax.cond(
                    pa_hit & (rep == 0), detect,
                    lambda _: (rep, spl), 0)
                cand = c - 1
                applies = pa_hit & (rep == 2) & (cand >= lowest) \
                    & (read4(jnp.maximum(cand, 0)) == pat)

                def pat_arm(args):
                    lg, offb, backb = args
                    fwd_pat = count_pat_fwd(cand + 4, pat,
                                            matchlimit) + 4
                    back_pat = count_pat_rev(cand, pat, jnp.int32(0))
                    back_pat = jnp.where(cand - back_pat < lowest,
                                         cand - lowest, back_pat)
                    seg = back_pat + fwd_pat
                    fits = (seg >= spl) & (fwd_pat <= spl)
                    c_fit = cand + fwd_pat - spl
                    c_nf = cand - back_pat
                    lb0 = (lookback == 0) & ~fits
                    max_ml = jnp.minimum(seg, spl)
                    upd = lb0 & (lg < max_ml)
                    brk = upd & (pos - c_nf > WINDOW)
                    lg2 = jnp.where(upd & ~brk, max_ml, lg)
                    off2 = jnp.where(upd & ~brk, pos - c_nf, offb)
                    back2 = jnp.where(upd & ~brk, 0, backb)
                    dlt2 = chain_get(jnp.maximum(c_nf, 0))
                    nc_lb0 = c_nf - dlt2
                    dead_lb0 = brk | (dlt2 == 0) | (nc_lb0 < lowest)
                    nc = jnp.where(fits, c_fit,
                                   jnp.where(lb0, nc_lb0, c_nf))
                    dead = jnp.where(
                        fits, c_fit < lowest,
                        jnp.where(lb0, dead_lb0, c_nf < lowest))
                    return nc, dead, lg2, off2, back2

                def norm_arm(args):
                    lg, offb, backb = args
                    nc = c - dlt
                    return nc, (dlt == 0) | (nc < lowest), lg, offb, \
                        backb

                nc, dead, lg, offb, backb = jax.lax.cond(
                    applies, pat_arm, norm_arm, (lg, offb, backb))
            else:
                nc = c - dlt
                dead = (dlt == 0) | (nc < lowest)
            return (nc, jnp.where(dead, 0, tries - 1), lg, offb,
                    backb, rep, spl)

        init = (c0, jnp.where(alive0, jnp.int32(depth), 0), longest0,
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
        _, _, lg, offb, backb = jax.lax.while_loop(
            lambda st: st[1] > 0, body, init)[:5]
        return lg, offb, backb, ni2

    # ---- pending-word emitter (see encode_pallas.py) -----------------
    def emit1(op, pend, v):
        sh = 8 * (op & 3)
        pend2 = pend | ((v & 255) << sh)
        out_ref[0, 0, op >> 2] = pend2
        return op + 1, jnp.where((op & 3) == 3, 0, pend2)

    def emit_len(op, pend, ln, enable):
        def chain_fn(st):
            op, pend = st

            def body(st):
                op, pend, ln2 = st
                op, pend = emit1(op, pend, jnp.int32(255))
                return op, pend, ln2 - 255

            op, pend, ln2 = jax.lax.while_loop(
                lambda st: st[2] >= 255, body, (op, pend, ln))
            op, pend = emit1(op, pend, ln2)
            return op, pend

        def fast(st):
            op, pend = st
            sh = 8 * (op & 3)
            pend2 = pend | ((ln & 255) << sh)
            out_ref[0, 0, op >> 2] = jnp.where(enable, pend2, pend)
            en = enable.astype(jnp.int32)
            return (op + en,
                    jnp.where(enable & ((op & 3) == 3), 0,
                              jnp.where(enable, pend2, pend)))

        return jax.lax.cond(enable & (ln >= 255), chain_fn, fast,
                            (op, pend))

    def copy_lits(op, pend, a0, ln):
        def body(st):
            i, q, pnd = st
            w = read4(a0 + i)
            sh = 8 * (q & 3)
            out_ref[0, 0, q >> 2] = pnd | jax.lax.shift_left(w, sh)
            hi = jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w, 31 - sh), 1)
            return i + 4, q + 4, hi

        _, qf, pnd_f = jax.lax.while_loop(lambda st: st[0] < ln, body,
                                          (jnp.int32(0), op, pend))
        out_ref[0, 0, qf >> 2] = pnd_f
        op2 = op + ln
        pend2 = out_ref[0, 0, op2 >> 2] & ((1 << (8 * (op2 & 3))) - 1)
        return op2, pend2

    # ---- parse: scan + arbitration ladder -----------------------------
    def insert_range(a, b):
        """Insert positions [a, b) in order; returns max(a, b).
        Insertion order is strictly monotone across the whole parse —
        an out-of-order insert would regress heads and sever chains."""
        def body(q):
            insert(q)
            return q + 1

        end = jax.lax.while_loop(lambda q: q < b, body, a)
        return jnp.maximum(end, a)

    OPTIMAL_ML = 18

    def emit_one(op, pend, anchor, ip, off, mlen, enable):
        """Emit one sequence: [anchor, ip) literals + (off, mlen) match,
        under `enable` (LZ4HC_encodeSequence analog, lz4hc.c:268-355)."""
        def do(st):
            op, pend = st
            litlen = ip - anchor
            mlc = mlen - 4
            tok = ((jnp.minimum(litlen, 15) << 4)
                   | jnp.minimum(mlc, 15))
            op, pend = emit1(op, pend, tok)
            op, pend = emit_len(op, pend, litlen - 15, litlen >= 15)
            op, pend = copy_lits(op, pend, anchor, litlen)
            op, pend = emit1(op, pend, off & 255)
            op, pend = emit1(op, pend, off >> 8)
            op, pend = emit_len(op, pend, mlc - 15, mlc >= 15)
            return op, pend

        return jax.lax.cond(enable, do, lambda s: s, (op, pend))

    # ---- parse: the reference's 3-match overlap arbitration
    # (_Search2/_Search3, lz4hc.c:1157-1310) as a state machine — the
    # goto graph of the host lazy tier (compress_lazy in
    # native/hccodec.c, graded byte-identical to the reference), one
    # lazy_search per iteration. States: 0 scan, 1 Search2, 2 Search3,
    # 3 done. Carry: (state, ip, anchor, m1l, m1o, s0, m0l, m0o, s2,
    # m2l, m2o, ni, op, pend); m3/s3 never survive an iteration.
    S_SCAN, S_S2, S_S3 = 0, 1, 2

    def scan_arm(cy):
        (state, ip, anchor, m1l, m1o, s0, m0l, m0o, s2, m2l, m2o,
         ni, op, pend) = cy

        def done(args):
            ip, ni = args
            return jnp.int32(3), ip, jnp.int32(0), jnp.int32(0), ni

        def do(args):
            ip, ni = args
            ml, mo, _mb, ni2 = lazy_search(ip, ip, jnp.int32(3), ni)
            hit = (ml >= 4) & (mo > 0)
            return (jnp.where(hit, jnp.int32(S_S2), jnp.int32(S_SCAN)),
                    jnp.where(hit, ip, ip + 1), ml, mo, ni2)

        state2, ip2, ml, mo, ni2 = jax.lax.cond(
            ip > mflimit, done, do, (ip, ni))
        hit = state2 == S_S2
        # start0 save (lz4hc.c:1160)
        return (state2, ip2, anchor,
                jnp.where(hit, ml, m1l), jnp.where(hit, mo, m1o),
                jnp.where(hit, ip2, s0),
                jnp.where(hit, ml, m0l), jnp.where(hit, mo, m0o),
                s2, m2l, m2o, ni2, op, pend)

    def s2_arm(cy):
        (state, ip, anchor, m1l, m1o, s0, m0l, m0o, _s2, _m2l, _m2o,
         ni, op, pend) = cy
        can2 = ip + m1l <= mflimit
        probe = ip + m1l - 2

        def srch(args):
            ni, = args
            return lazy_search(probe, ip, m1l, ni)

        def nos(args):
            ni, = args
            return m1l, jnp.int32(0), jnp.int32(0), ni

        m2l, m2o, m2b, ni = jax.lax.cond(can2, srch, nos, (ni,))
        s2 = probe - m2b
        better = can2 & (m2l > m1l) & (m2o > 0)

        # no better: emit m1, back to scan (lz4hc.c:1177-1183)
        emitA = ~better
        op, pend = emit_one(op, pend, anchor, ip, m1o, m1l, emitA)
        ipA = ip + m1l

        # start0 restore (lz4hc.c:1186-1189)
        restore = better & (s0 < ip) & (s2 < ip + m0l)
        ipB = jnp.where(restore, s0, ip)
        m1lB = jnp.where(restore, m0l, m1l)
        m1oB = jnp.where(restore, m0o, m1o)
        # first match too small: drop it (lz4hc.c:1192-1196)
        small = better & ((s2 - ipB) < 3)
        ipB2 = jnp.where(small, s2, ipB)
        m1lB2 = jnp.where(small, m2l, m1lB)
        m1oB2 = jnp.where(small, m2o, m1oB)

        state2 = jnp.where(emitA, jnp.int32(S_SCAN),
                           jnp.where(small, jnp.int32(S_S2),
                                     jnp.int32(S_S3)))
        return (state2,
                jnp.where(emitA, ipA, ipB2),
                jnp.where(emitA, ipA, anchor),
                jnp.where(emitA, m1l, m1lB2),
                jnp.where(emitA, m1o, m1oB2),
                s0, m0l, m0o, s2, m2l, m2o, ni, op, pend)

    def s3_arm(cy):
        (state, ip, anchor, m1l, m1o, s0, m0l, m0o, s2, m2l, m2o,
         ni, op, pend) = cy
        # pre-trim m1 so it leaves >= MINMATCH of m2 (lz4hc.c:1199-1210)
        close = (s2 - ip) < OPTIMAL_ML
        nml = jnp.minimum(m1l, OPTIMAL_ML)
        nml = jnp.where(ip + nml > s2 + m2l - 4, s2 - ip + m2l - 4, nml)
        corr = nml - (s2 - ip)
        app = close & (corr > 0)
        s2 = jnp.where(app, s2 + corr, s2)
        m2l = jnp.where(app, m2l - corr, m2l)

        can3 = s2 + m2l <= mflimit
        probe3 = s2 + m2l - 3

        def srch(args):
            ni, = args
            return lazy_search(probe3, s2, m2l, ni)

        def nos(args):
            ni, = args
            return m2l, jnp.int32(0), jnp.int32(0), ni

        m3l, m3o, m3b, ni = jax.lax.cond(can3, srch, nos, (ni,))
        s3 = probe3 - m3b
        better3 = can3 & (m3l > m2l) & (m3o > 0)

        # case A: no better third — emit m1 (trimmed to s2) then m2
        # (lz4hc.c:1222-1239)
        caseA = ~better3
        m1lA = jnp.where(s2 < ip + m1l, s2 - ip, m1l)
        op, pend = emit_one(op, pend, anchor, ip, m1o, m1lA, caseA)
        anchorA = ip + m1lA
        op, pend = emit_one(op, pend, anchorA, s2, m2o, m2l, caseA)
        ipA = s2 + m2l

        # case B: m3 too close (lz4hc.c:1242-1270)
        nearB = better3 & (s3 < ip + m1l + 3)
        b1 = nearB & (s3 >= ip + m1l)    # m2 removed, emit m1, m3->m1
        overB1 = s2 < ip + m1l
        corrB1 = ip + m1l - s2
        s2b = jnp.where(overB1, s2 + corrB1, s2)
        m2lb = jnp.where(overB1, m2l - corrB1, m2l)
        degraded = m2lb < 4
        s2b = jnp.where(degraded, s3, s2b)
        m2lb = jnp.where(degraded, m3l, m2lb)
        m2ob = jnp.where(degraded, m3o, m2o)
        op, pend = emit_one(op, pend, anchor, ip, m1o, m1l, b1)
        anchorB1 = ip + m1l
        b2 = nearB & ~b1                 # m3 replaces m2, stay S3

        # case C: three ascending matches — emit trimmed m1, shift
        # (lz4hc.c:1277-1305)
        caseC = better3 & ~nearB
        overC = s2 < ip + m1l
        closeC = (s2 - ip) < OPTIMAL_ML
        m1lC0 = jnp.minimum(m1l, OPTIMAL_ML)
        m1lC0 = jnp.where(ip + m1lC0 > s2 + m2l - 4,
                          s2 - ip + m2l - 4, m1lC0)
        corrC = m1lC0 - (s2 - ip)
        appC = overC & closeC & (corrC > 0)
        m1lC = jnp.where(overC,
                         jnp.where(closeC, m1lC0, s2 - ip), m1l)
        s2c = jnp.where(appC, s2 + corrC, s2)
        m2lc = jnp.where(appC, m2l - corrC, m2l)
        op, pend = emit_one(op, pend, anchor, ip, m1o, m1lC, caseC)
        anchorC = ip + m1lC

        # combine
        state2 = jnp.where(caseA, jnp.int32(S_SCAN),
                           jnp.where(b1, jnp.int32(S_S2),
                                     jnp.int32(S_S3)))
        ip2 = jnp.where(caseA, ipA,
                        jnp.where(b1, s3,
                                  jnp.where(b2, ip, s2c)))
        anchor2 = jnp.where(caseA, ipA,
                            jnp.where(b1, anchorB1,
                                      jnp.where(caseC, anchorC,
                                                anchor)))
        m1l2 = jnp.where(b1, m3l, jnp.where(caseC, m2lc, m1l))
        m1o2 = jnp.where(b1, m3o, jnp.where(caseC, m2o, m1o))
        s0_2 = jnp.where(b1, s2b, s0)
        m0l2 = jnp.where(b1, m2lb, m0l)
        m0o2 = jnp.where(b1, m2ob, m0o)
        s2_2 = jnp.where(b2 | caseC, s3, s2)
        m2l2 = jnp.where(b2 | caseC, m3l, m2l)
        m2o2 = jnp.where(b2 | caseC, m3o, m2o)
        return (state2, ip2, anchor2, m1l2, m1o2, s0_2, m0l2, m0o2,
                s2_2, m2l2, m2o2, ni, op, pend)

    def machine(cy):
        return jax.lax.switch(cy[0], (scan_arm, s2_arm, s3_arm), cy)

    z = jnp.int32(0)
    fin = jax.lax.while_loop(
        lambda cy: cy[0] < 3, machine,
        (jnp.int32(S_SCAN), z, z, z, z, z, z, z, z, z, z, z, z, z))
    anchor, op, pend = fin[2], fin[12], fin[13]

    litlen = jnp.maximum(n - anchor, 0)
    op, pend = emit1(op, pend, jnp.minimum(litlen, 15) << 4)
    op, pend = emit_len(op, pend, litlen - 15, litlen >= 15)
    op, pend = copy_lits(op, pend, anchor, litlen)

    csize_ref[b] = op
    trail_ref[b] = litlen


@functools.partial(jax.jit, static_argnames=("cap_n", "level",
                                             "interpret", "favor"))
def _encode_hc_raw(src32, lens, *, cap_n: int, level: int,
                   interpret: bool, favor: bool):
    B, _, n_words = src32.shape
    bound = compress_bound(cap_n)
    w_out = -(-(bound + 4) // 4)
    w_out += (-w_out) % 128
    lv = min(max(level, 0), 12)
    kern = functools.partial(
        _hc_kernel, n_words=n_words, w_out=w_out,
        depth=int(K_DEPTH[lv]), favor=int(bool(favor)))
    out_w, csizes, trailing = pl.pallas_call(
        kern,
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, w_out), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1 << HASH_LOG,), jnp.int32),
                        pltpu.SMEM((1 << 15,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lens.astype(jnp.int32), src32)
    w = out_w.reshape(B, w_out)
    by = jnp.stack([w & 255, (w >> 8) & 255, (w >> 16) & 255,
                    jax.lax.shift_right_logical(w, 24) & 255], axis=-1)
    out = by.reshape(B, w_out * 4)[:, :bound].astype(jnp.uint8)
    return out, csizes, trailing


def encode_blocks_hc_pallas(src, lens, *, cap_n: int, level: int = 9,
                            interpret: bool | None = None,
                            favor_dec_speed: bool = False):
    """Batched no-dict HC block encode on the serial-kernel path.
    Contract matches encode_blocks_pallas (minus dict args)."""
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, width = src.shape
    assert width <= cap_n
    n_words = -(-(cap_n + 256) // 4)
    n_words += (-n_words) % 128
    from lz4_tpu.block.encode_pallas import _pack_words
    words = _pack_words(src, n_words)
    return _encode_hc_raw(words, lens, cap_n=cap_n, level=int(level),
                          interpret=bool(interpret),
                          favor=bool(favor_dec_speed))
