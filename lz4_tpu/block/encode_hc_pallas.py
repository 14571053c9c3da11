"""Pallas serial-block LZ4-HC encoder — hash-chain search on TPU.

The device analog of the reference's hashChain tier (levels 3-9,
LZ4HC_compress_hashChain / LZ4HC_InsertAndGetWiderMatch,
/root/reference/lib/lz4hc.c:884-1310), built on the fast kernel's
measured machine model (encode_pallas.py): one block per grid step,
all parsing on the scalar unit from packed SMEM words, the pending-
word sequential emitter, cond-free outer loop.

Differences from the reference's search, chosen TPU-first:

  * the chain table stores 16-bit PREVIOUS-OCCURRENCE DELTAS packed
    two per int32 SMEM word (the reference's chainTable is 64K u16,
    lz4hc.h:235-250) — a delta past the 64 KB window doubles as the
    chain terminator;
  * candidates are scored by their WIDER length: each one back-extends
    toward the anchor before forward extension, the core idea of
    LZ4HC_InsertAndGetWiderMatch (lz4hc.c:884-1104) without the
    chainSwap machinery;
  * one-step lazy arbitration repeats while the next position finds a
    strictly longer match (the Search2 loop skeleton, lz4hc.c:1157-
    1310);
  * the depth ladder runs DEEPER than the reference's nbSearches at
    the same level (kDepth below) to buy back the parse quality of the
    reference's 3-candidate overlap arbitration — graded to stay at or
    under the reference size per level (tools/hc_grade_device.py).

Graded size parity vs the reference (tools/hc_grade_device.py, 2 MB
of real/text/mixed 64 KB blocks, with the start0-restore rule):
level 3 worst 0.99797, level 4 0.99981 — at or under the reference at
the engine-routed levels. Level 5 lands +5 BYTES over on the mixed
corpus (depth-independent — a single structural arbitration decision)
and levels 7-9 grade 1.003-1.006x over (Search3 3-match juggling and
level-9 pattern analysis are the remainder), so 5+ route to the host
DP tier, which holds <= reference at every level.

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

#: search depth per level 0..12 (levels 3-9 are the device tier; the
#: reference's nbSearches ladder is 4..256, lz4hc.c:92-106 — ours runs
#: deeper to compensate for the simpler arbitration)
K_DEPTH = (8, 8, 8, 12, 24, 96, 96, 160, 256, 512, 512, 512, 512)
#: sufficient length: accept immediately (targetLength analog)
K_SUFF = (64, 64, 64, 64, 96, 128, 192, 256, 384, 512, 512, 512, 512)


def _hc_kernel(len_ref, src_ref, out_ref, csize_ref, trail_ref,
               head, chainw, *, n_words: int, w_out: int, depth: int,
               suff: int, favor: int = 0):
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

    def search_min(q, lowback, min_len):
        """Wider-match chain search at q: walks up to `depth`
        candidates, scoring back+fwd extension (back-extension bounded
        by lowback — LZ4HC_InsertAndGetWiderMatch's iLowLimit). Only
        totals strictly above min_len are reported. Also INSERTS q."""
        anchor = lowback
        seq = read4(q)
        h = hash4(seq)
        e = head[h]
        prev = e & 0x3FFFF
        stale = jax.lax.shift_right_logical(e, 18) != bt
        same = ~stale & (prev == q)
        d0 = q - prev
        d0 = jnp.where(stale | (d0 > WINDOW) | (d0 <= 0), 0, d0)
        d0 = jnp.where(same, chain_get(q), d0)
        chain_set(q, d0)
        head[h] = (bt << 18) | q
        back_room = q - anchor

        def body(st):
            c, tries, bl, bs, bc = st
            # candidate total width: back + 4 + fwd (validated)
            ok = read4(c) == seq
            fl = jnp.where(ok, fwd_count(q + 4, c + 4,
                                         matchlimit - (q + 4)), -4)
            bk = jnp.where(ok & (c > 0),
                           back_count(q, c, jnp.minimum(back_room, c)),
                           0)
            tot = 4 + fl + bk
            better = ok & (tot > bl)
            if favor:
                better = better & ~((q - c) < 8)
            bl = jnp.where(better, tot, bl)
            bs = jnp.where(better, q - bk, bs)
            bc = jnp.where(better, c - bk, bc)
            dlt = chain_get(c)
            nxt = c - dlt
            dead = (dlt == 0) | (q - nxt > WINDOW) | (nxt < 0) \
                | (bl >= suff)
            return nxt, jnp.where(dead, 0, tries - 1), bl, bs, bc

        c0 = q - d0
        init = (c0, jnp.where(d0 == 0, 0, jnp.int32(depth)),
                min_len, q, q)
        _, _, bl, bs, bc = jax.lax.while_loop(
            lambda st: st[1] > 0, body, init)
        return bl, bs, bc

    def search(q, anchor):
        return search_min(q, anchor, jnp.int32(0))

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

    def scan(p, anchor):
        """Walk positions (stride 1 — HC has no skip accelerator,
        lz4hc.c:1121-1310) until a chain match lands. Returns
        (ml, ms, mc, last_ins)."""
        def body(s):
            sp, _ml, _ms, _mc = s
            ml, ms, mc = search(sp, anchor)
            hit = ml >= 4
            return (jnp.where(hit, sp, sp + 1), ml, ms, mc)

        def cond(s):
            return (s[1] < 4) & (s[0] <= mflimit)

        sp, ml, ms, mc = jax.lax.while_loop(
            cond, body, (p, jnp.int32(0), p, p))
        return ml, ms, mc, sp + 1

    OPTIMAL_ML = 18

    def ladder_body(st):
        """The reference hashChain arbitration (lz4hc.c:1157-1310),
        folded into one loop: the current match m1 at ip is probed for
        a strictly-longer OVERLAPPING match near its end
        (ip + ml1 - 2, back-extension bounded by ip); no better ->
        emit m1 and scan on; better-but-immediate (< 3 bytes in) ->
        replace; otherwise truncate m1 against the newcomer (with the
        OPTIMAL_ML correction) and promote m2 to m1. (ip0, ml00, mc0)
        remember the ladder run's ORIGINAL match: when replaces have
        moved m1 forward and the newest match still starts inside the
        original's span, the original is restored (the start0 rule,
        lz4.c:1186-1189) — squeezing m1 between m0 and m2."""
        (ip, ml1, mc1, ip0, ml00, mc0, anchor, op, pend,
         last_ins) = st
        # the reference probes at end-2 (Search2); end-3 was
        # graded and rejected (better on text, worse on mixed)
        probe_q = ip + ml1 - 2
        can = ip + ml1 <= mflimit
        last_ins = insert_range(last_ins,
                                jnp.where(can, probe_q, last_ins))
        # wider search (insert of probe_q is harmless when past
        # mflimit: a real position, validated like any candidate)
        ml2, ms2, mc2 = search_min(probe_q, ip, ml1)
        last_ins = jnp.maximum(last_ins, probe_q + 1)
        found2 = can & (ml2 > ml1)
        # start0 restore (lz4hc.c:1186-1189)
        restored = found2 & (ip0 < ip) & (ms2 < ip0 + ml00)
        ip = jnp.where(restored, ip0, ip)
        ml1 = jnp.where(restored, ml00, ml1)
        mc1 = jnp.where(restored, mc0, mc1)
        repl = found2 & ((ms2 - ip) < 3)
        emit_case = ~repl
        d = ms2 - ip
        overlap = ms2 < ip + ml1
        # OPTIMAL_ML correction (lz4hc.c:1198-1211): keep m1's emitted
        # length near 18 by shifting the seam into m2 (m2 stays >= 4)
        new_ml = jnp.minimum(jnp.minimum(ml1, OPTIMAL_ML), d + ml2 - 4)
        corr = jnp.maximum(new_ml - d, 0)
        use_corr = found2 & ~repl & (d < OPTIMAL_ML)
        ms2 = jnp.where(use_corr, ms2 + corr, ms2)
        mc2 = jnp.where(use_corr, mc2 + corr, mc2)
        ml2 = jnp.where(use_corr, ml2 - corr, ml2)
        ml1e = jnp.where(
            found2,
            jnp.where(d < OPTIMAL_ML, new_ml,
                      jnp.where(overlap, d, ml1)),
            ml1)

        def do_emit(st2):
            op, pend = st2
            litlen = ip - anchor
            offset = ip - mc1
            mlc = ml1e - 4
            tok = ((jnp.minimum(litlen, 15) << 4)
                   | jnp.minimum(mlc, 15))
            op, pend = emit1(op, pend, tok)
            op, pend = emit_len(op, pend, litlen - 15, litlen >= 15)
            op, pend = copy_lits(op, pend, anchor, litlen)
            op, pend = emit1(op, pend, offset & 255)
            op, pend = emit1(op, pend, offset >> 8)
            op, pend = emit_len(op, pend, mlc - 15, mlc >= 15)
            return op, pend

        op, pend = jax.lax.cond(emit_case, do_emit, lambda s: s,
                                (op, pend))
        anchor = jnp.where(emit_case, ip + ml1e, anchor)

        def next_scan(args):
            anchor2, last_ins2 = args
            li = insert_range(last_ins2, anchor2)
            mln, msn, mcn, li2 = scan(anchor2, anchor2)
            return (jnp.where(mln >= 4, msn, jnp.int32(-1)), mln, mcn,
                    jnp.maximum(li, li2))

        def next_carry(args):
            del args
            return ms2, ml2, mc2, last_ins

        ipn, ml1n, mc1n, last_ins = jax.lax.cond(
            found2, next_carry, next_scan, (anchor, last_ins))
        # a fresh ladder run (any emit, or a scan result) resets the
        # remembered original; replaces keep it
        ip0n = jnp.where(repl, ip0, ipn)
        ml0n = jnp.where(repl, ml00, ml1n)
        mc0n = jnp.where(repl, mc0, mc1n)
        return (ipn, ml1n, mc1n, ip0n, ml0n, mc0n, anchor, op, pend,
                last_ins)

    mlA, msA, mcA, liA = scan(jnp.int32(0), jnp.int32(0))
    ipA = jnp.where(mlA >= 4, msA, jnp.int32(-1))
    _, _, _, _, _, _, anchor, op, pend, _ = jax.lax.while_loop(
        lambda st: st[0] >= 0, ladder_body,
        (ipA, mlA, mcA, ipA, mlA, mcA,
         jnp.int32(0), jnp.int32(0), jnp.int32(0), liA))

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
        depth=int(K_DEPTH[lv]), suff=int(K_SUFF[lv]),
        favor=int(bool(favor)))
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
