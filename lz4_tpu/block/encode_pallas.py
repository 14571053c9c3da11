"""Pallas serial-block LZ4 encoder — the greedy hash-table design on TPU.

The sort/scan encoder (encode_jax.py) pays ~5-15 ms per full-width sort
pass per 2 MB chunk; its per-byte cost is architectural (every stage is
a batched 66K-row pass). This kernel is the opposite corner: ONE block
per grid step, compressed sequentially like the reference's hot loop
(LZ4_compress_generic, lz4.c:855-1262), built on the round-3 probe
result that Mosaic scalar SMEM loads cost ~12 cycles and scalar loop
iterations ~10 ns (tools/session_pallas_probe3.py):

  * the source block is passed as 4-bytes-per-int32 words in SMEM; all
    reads (hash words, match probes, extension compares) are scalar
    loads + shifts — no vector unit at all;
  * the hash table is a 2^15-entry SMEM scratch; entries carry a grid-
    step tag so the table is never cleared (a stale hit is validated by
    the 4-byte compare like any other candidate, and a false positive
    only costs the probe — the emitted stream is correct either way);
  * match extension compares 4 bytes per iteration with a first-diff
    byte select; back-extension walks bytes (reference lz4.c:1002-1008);
  * the compressed stream is written byte-at-a-time into SMEM output
    words with masked insert (no output zeroing needed);
  * `acceleration` is the reference's skip trigger verbatim
    (lz4.c:711, 1023-1053): a miss advances by (searchMatchNb++ >> 6),
    seeded at acceleration << 6.

Parity notes vs our other encoders: greedy parse + tail-insert at
p+ml-2 mirrors native/blockcodec.c (measured ~1.0x reference L1 size);
the XLA graph encoder (2-candidate scoring + token merge) stays the
choice where ratio beats speed.
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

LANES = 128
HASH_LOG = 16
HASH_MUL = np.int32(np.uint32(2654435761))   # Knuth multiplier (format const)
SKIP_TRIGGER = 6


def _encode_kernel(len_ref, dlen_ref, accel_ref, src_ref, out_ref,
                   csize_ref, trail_ref, table, *, n_words: int,
                   w_out: int, d0: int, dict_stride: int = 1, max_dist: int = 65535):
    """One block per grid step. src_ref: (1, 1, n_words) int32 SMEM
    (bytes packed 4/word LE) laid out as [d0 history bytes | block];
    out_ref: (1, 1, w_out) int32 SMEM; csize/trail: SMEM scalars;
    table: (2^HASH_LOG,) int32 SMEM scratch. d0 > 0 is dict/linked mode
    (lz4.c:1375-1459 usingExtDict analog): candidates may reach back
    into the history window and matches span the boundary."""
    b = pl.program_id(0)
    bt = b & 63                            # entry tag (6 bits)
    n = len_ref[b]
    # RUNTIME acceleration (reference range 1..65537, lz4.c:52-58): a
    # scalar input, not a compile-time constant — one compiled program
    # serves every --fast=# level
    accel0 = accel_ref[0] << SKIP_TRIGGER
    d = jnp.minimum(dlen_ref[b], d0) if d0 else jnp.int32(0)
    low = d0 - d                           # first valid history byte
    mflimit = d0 + n - MFLIMIT             # last pos a match may start at
    matchlimit = d0 + n - LASTLITERALS     # match bytes end here

    def rbyte(q):
        """Scalar byte read (q stays in the padded buffer: all parse
        positions are within [low-1, d0+n+2*LANES))."""
        return (src_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

    def read4(q):
        """4 LE bytes at byte offset q as one int32 (unclamped: the
        source buffer carries >= 2*LANES spare bytes)."""
        w1 = src_ref[0, 0, q >> 2]
        w2 = src_ref[0, 0, (q >> 2) + 1]
        sh = 8 * (q & 3)
        lo = jax.lax.shift_right_logical(w1, sh)
        # branch-free high half: << (31-sh) << 1 is 0 when sh == 0
        hi = jax.lax.shift_left(jax.lax.shift_left(w2, 31 - sh), 1)
        return lo | hi

    def hash4(seq):
        return jax.lax.shift_right_logical(
            seq * HASH_MUL, 32 - HASH_LOG) & ((1 << HASH_LOG) - 1)

    def emit1(op, pend, v):
        """Sequential pending-word emitter: the output is written
        strictly left to right, so the current word accumulates in a
        register and every emit stores it whole — no read-modify-write
        load (the old wbyte paid an SMEM load per byte)."""
        sh = 8 * (op & 3)
        pend2 = pend | ((v & 255) << sh)
        out_ref[0, 0, op >> 2] = pend2
        return op + 1, jnp.where((op & 3) == 3, 0, pend2)

    def emit_len(op, pend, ln, enable):
        """Length continuation bytes for a 15+ field (ln = value - 15).
        The single-byte case (value 15..269) is BRANCH-FREE: the byte
        is stored unconditionally and op advances by `enable` — when
        disabled the garbage byte sits past the frontier and the next
        emit overwrites it. Only the rare >= 270 chain branches."""
        def chain(st):
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

        return jax.lax.cond(enable & (ln >= 255), chain, fast,
                            (op, pend))

    def copy_lits(op, pend, a0, ln):
        """Literal copy, 4 bytes per iteration: each store writes a
        whole output word (pending low part | 4 source bytes shifted
        into phase), the spill carries to the next store. Overruns up
        to 3 bytes past the run; later emits overwrite them (the same
        frontier argument as the decoder's wfront)."""
        def body(st):
            i, q, pnd = st
            w = read4(a0 + i)
            sh = 8 * (q & 3)
            out_ref[0, 0, q >> 2] = pnd | jax.lax.shift_left(w, sh)
            # w >> (32-sh), giving 0 at sh == 0 (two shifts <= 31)
            hi = jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w, 31 - sh), 1)
            return i + 4, q + 4, hi

        _, qf, pnd_f = jax.lax.while_loop(lambda st: st[0] < ln, body,
                                          (jnp.int32(0), op, pend))
        # flush the final spill carry (bytes [word start, qf) of the
        # word past the last store)
        out_ref[0, 0, qf >> 2] = pnd_f
        op2 = op + ln
        # reconstruct the pending word from memory (stores above are
        # eager, so the word at op2 is now current; at a word boundary
        # the mask is 0 and the stale read is discarded)
        pend2 = out_ref[0, 0, op2 >> 2] & ((1 << (8 * (op2 & 3))) - 1)
        return op2, pend2

    def _ctzb(x):
        """Index of the first nonzero byte of x (x != 0 -> 0..3)."""
        return jnp.where(x & 255 != 0, 0,
                         jnp.where(x & 0xFF00 != 0, 1,
                                   jnp.where(x & 0xFF0000 != 0, 2, 3)))

    def fwd_count(q1, q2, maxn):
        """Bytes equal at src[q1+i] == src[q2+i], i < maxn (8/iter —
        the two 4-byte compares are independent loads that the VLIW
        packs together; LZ4_count analog, lz4.c:615-703)."""
        def body(st):
            c, go = st
            x1 = read4(q1 + c) ^ read4(q2 + c)
            x2 = read4(q1 + c + 4) ^ read4(q2 + c + 4)
            add = jnp.where(x1 != 0, _ctzb(x1),
                            jnp.where(x2 != 0, 4 + _ctzb(x2), 8))
            add = jnp.minimum(add, maxn - c)
            return c + add, (x1 == 0) & (x2 == 0) & (c + add < maxn)

        c, _ = jax.lax.while_loop(lambda st: st[1], body,
                                  (jnp.int32(0), maxn > 0))
        return c

    # history pre-insert (linked/dict mode): hash the valid window so
    # the parse can match into it — the reference's LZ4_loadDict /
    # attach pattern (lz4.c:1375-1414); the default stride of 3 is the
    # reference's own _ld_fast trade (lz4.c:1587-1656): linked encode
    # 27.7 -> 35.2 MB/s for +0.4% size
    if d0:
        def dins(q):
            table[hash4(read4(q))] = (bt << 26) | q
            return q + dict_stride

        jax.lax.while_loop(lambda q: q < d0, dins, low)

    def scan(p, srch):
        """Scan to the next validated match (insert + probe + skip,
        lz4.c:1023-1053). Returns (hit?, p, cand, srch). Measured
        model (tools + /tmp scan probes): loop-iteration overhead
        ~10 ns dwarfs SMEM loads (~2-3 ns), so the full 4-byte
        candidate validation stays IN the scan (an extra per-hit
        lax.cond costs more than the loads it saves)."""
        def scan_body(s):
            # TWO positions per iteration (straight-line VLIW packing
            # measured 1.5x a single-position loop): exact skip-policy
            # parity — gap one uses srch>>6, gap two (srch+1)>>6
            sp, ssr, _hit, _cand = s
            step = jax.lax.shift_right_logical(ssr, SKIP_TRIGGER)
            sp1 = sp + step
            # clamp the speculative position's MEMORY ops: with runtime
            # acceleration up to 65537 the step can overshoot the
            # source pad (matchlimit keeps read4 in-buffer; inserting
            # the clamped real position repeatedly is a no-op via the
            # insert same-guard)
            sp1c = jnp.minimum(sp1, matchlimit)
            seq0 = read4(sp)
            h0 = hash4(seq0)
            e0 = table[h0]
            table[h0] = (bt << 26) | sp
            cand0 = e0 & 0x3FFFF
            hit0 = ((jax.lax.shift_right_logical(e0, 26) == bt)
                    & (cand0 < sp) & (cand0 >= low)
                    & (sp - cand0 <= max_dist) & (read4(cand0) == seq0))
            seq1 = read4(sp1c)
            h1 = hash4(seq1)
            e1 = table[h1]
            # on hit0 the single-step reference loop never visited p1:
            # keep the entry unchanged via select-store
            table[h1] = jnp.where(hit0, e1, (bt << 26) | sp1c)
            cand1 = e1 & 0x3FFFF
            hit1 = (~hit0 & (sp1 <= mflimit)
                    & (jax.lax.shift_right_logical(e1, 26) == bt)
                    & (cand1 < sp1) & (cand1 >= low)
                    & (sp1 - cand1 <= max_dist) & (read4(cand1) == seq1))
            hit = hit0 | hit1
            padv = sp1 + jax.lax.shift_right_logical(ssr + 1,
                                                     SKIP_TRIGGER)
            return (jnp.where(hit, jnp.where(hit0, sp, sp1), padv),
                    jnp.where(hit, ssr, ssr + 2), hit,
                    jnp.where(hit0, cand0, cand1))

        p, srch, hit, cand = jax.lax.while_loop(
            lambda s: ~s[2] & (s[0] <= mflimit), scan_body,
            (p, srch, jnp.bool_(False), jnp.int32(0)))
        return hit, p, cand, srch

    def parse_body(st):
        """One SEQUENCE per iteration, NO lax.cond anywhere on the
        common path: the loop condition itself is "a match was
        found", the body processes it unconditionally and then scans
        for the next one."""
        p, cand, anchor, op, pend, srch = st

        # back-extension (lz4.c:1002-1008 analog)
        def back(st2):
            p2, c2 = st2
            return p2 - 1, c2 - 1

        p2, cand2 = jax.lax.while_loop(
            lambda st2: (st2[0] > anchor) & (st2[1] > low)
            & (rbyte(st2[0] - 1) == rbyte(st2[1] - 1)),
            back, (p, cand))
        offset = p2 - cand2
        ml = (p - p2) + 4 + fwd_count(p + 4, cand + 4,
                                      matchlimit - (p + 4))
        litlen = p2 - anchor
        m4 = ml - 4

        # token
        tok = (jnp.minimum(litlen, 15) << 4) | jnp.minimum(m4, 15)
        op2, pend2 = emit1(op, pend, tok)
        op2, pend2 = emit_len(op2, pend2, litlen - 15, litlen >= 15)
        op2, pend2 = copy_lits(op2, pend2, anchor, litlen)
        op2, pend2 = emit1(op2, pend2, offset & 255)
        op2, pend2 = emit1(op2, pend2, offset >> 8)
        op2, pend2 = emit_len(op2, pend2, m4 - 15, m4 >= 15)

        # tail insert (blockcodec.c ip-2 pattern: denser table near
        # match ends measurably improves the next-match hit rate)
        t2 = p2 + ml - 2
        s2 = read4(t2)
        table[hash4(s2)] = (bt << 26) | t2

        hit, pn, candn, srchn = scan(p2 + ml, accel0)
        anchor2 = p2 + ml
        return (jnp.where(hit, pn, jnp.int32(-1)), candn, anchor2,
                op2, pend2, srchn)

    hit0, p0, cand0, srch0 = scan(jnp.int32(d0), accel0)
    _, _, anchor, op, pend, _ = jax.lax.while_loop(
        lambda st: st[0] >= 0, parse_body,
        (jnp.where(hit0, p0, jnp.int32(-1)), cand0, jnp.int32(d0),
         jnp.int32(0), jnp.int32(0), srch0))

    # tail: the final literal run (>= LASTLITERALS bytes by construction)
    litlen = jnp.maximum(d0 + n - anchor, 0)
    op, pend = emit1(op, pend, jnp.minimum(litlen, 15) << 4)
    op, pend = emit_len(op, pend, litlen - 15, litlen >= 15)
    op, pend = copy_lits(op, pend, anchor, litlen)

    csize_ref[b] = op
    trail_ref[b] = litlen


@functools.partial(jax.jit, static_argnames=("cap_n", "interpret",
                                             "d0", "dict_stride",
                                             "max_dist"))
def _encode_pallas_raw(src32, lens, dlens, accel, *, cap_n: int,
                       interpret: bool, d0: int, dict_stride: int,
                       max_dist: int = 65535):
    B, _, n_words = src32.shape
    bound = compress_bound(cap_n)
    w_out = -(-(bound + 4) // 4)
    w_out += (-w_out) % 128
    kern = functools.partial(_encode_kernel, n_words=n_words,
                             w_out=w_out, d0=d0,
                             dict_stride=dict_stride,
                             max_dist=max_dist)
    out_w, csizes, trailing = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        scratch_shapes=[pltpu.SMEM((1 << HASH_LOG,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lens.astype(jnp.int32), dlens.astype(jnp.int32),
      accel.astype(jnp.int32), src32)
    w = out_w.reshape(B, w_out)
    by = jnp.stack([w & 255, (w >> 8) & 255, (w >> 16) & 255,
                    jax.lax.shift_right_logical(w, 24) & 255], axis=-1)
    out = by.reshape(B, w_out * 4)[:, :bound].astype(jnp.uint8)
    return out, csizes, trailing


def _pack_words(bytes2d, n_words):
    B, width = bytes2d.shape
    s32 = jnp.pad(bytes2d.astype(jnp.int32),
                  ((0, 0), (0, n_words * 4 - width)))
    b4 = s32.reshape(B, 1, n_words, 4)
    return (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
            | (b4[..., 3] << 24))


def encode_blocks_pallas(src, lens, dict_bufs=None, dict_lens=None, *,
                         cap_n: int, acceleration: int = 1,
                         interpret: bool | None = None,
                         dict_stride: int = 3,
                         max_dist: int = 65535):
    """Batched block encode on the serial-kernel path.

    Same contract as encode_jax.encode_blocks:
    src uint8[B, cap_n], lens int32[B],
    dict_bufs uint8[B, 65536] right-aligned history (or None),
    dict_lens int32[B] →
    (out uint8[B, compress_bound(cap_n)], csizes int32[B],
     trailing int32[B]).
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, width = src.shape
    assert width <= cap_n
    has_dict = dict_bufs is not None
    d0 = 65536 if has_dict else 0
    n_words = -(-(d0 + cap_n + 2 * LANES) // 4)
    n_words += (-n_words) % 128
    if has_dict:
        full = jnp.concatenate(
            [dict_bufs.astype(jnp.uint8), src.astype(jnp.uint8)], axis=1)
        dlens = dict_lens
    else:
        full = src
        dlens = jnp.zeros((B,), jnp.int32)
    words = _pack_words(full, n_words)
    # reference acceleration range (lz4.c:52-58), runtime scalar
    acc = jnp.asarray([min(max(int(acceleration), 1), 65537)], jnp.int32)
    # max_dist < 65535 caps match offsets (wave-friendly streams whose
    # matches all land in the lockstep decoder's near window — the
    # device side of lz4t_compress_block_maxd; standard format either way)
    return _encode_pallas_raw(words, lens, dlens, acc, cap_n=cap_n,
                              interpret=bool(interpret), d0=d0,
                              dict_stride=int(dict_stride),
                              max_dist=int(max_dist))
