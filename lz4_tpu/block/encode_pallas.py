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
HASH_LOG = 15
HASH_MUL = np.int32(np.uint32(2654435761))   # Knuth multiplier (format const)
SKIP_TRIGGER = 6


def _encode_kernel(len_ref, dlen_ref, src_ref, out_ref, csize_ref,
                   trail_ref, table, *, n_words: int, w_out: int,
                   d0: int, acceleration: int = 1, dict_stride: int = 1):
    """One block per grid step. src_ref: (1, 1, n_words) int32 SMEM
    (bytes packed 4/word LE) laid out as [d0 history bytes | block];
    out_ref: (1, 1, w_out) int32 SMEM; csize/trail: SMEM scalars;
    table: (2^HASH_LOG,) int32 SMEM scratch. d0 > 0 is dict/linked mode
    (lz4.c:1375-1459 usingExtDict analog): candidates may reach back
    into the history window and matches span the boundary."""
    b = pl.program_id(0)
    n = len_ref[b]
    d = jnp.minimum(dlen_ref[b], d0) if d0 else jnp.int32(0)
    low = d0 - d                           # first valid history byte
    mflimit = d0 + n - MFLIMIT             # last pos a match may start at
    matchlimit = d0 + n - LASTLITERALS     # match bytes end here

    def rbyte(q):
        q = jnp.clip(q, 0, 4 * n_words - 1)
        return (src_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

    def read4(q):
        """4 LE bytes at byte offset q (clamped) as one int32."""
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
        """Masked byte insert into the packed output words."""
        idx = q >> 2
        sh = 8 * (q & 3)
        w = out_ref[0, 0, idx]
        out_ref[0, 0, idx] = (w & ~(255 << sh)) | ((v & 255) << sh)

    def emit_len(op, ln, enable):
        """Length continuation bytes for a 15+ field (ln = value - 15).
        enable=False writes nothing and returns op unchanged (wbyte has
        side effects, so this must be a real branch, not a select)."""
        def go(op):
            def body(st):
                op, ln2 = st
                wbyte(op, 255)
                return op + 1, ln2 - 255

            op, ln2 = jax.lax.while_loop(lambda st: st[1] >= 255, body,
                                         (op, ln))
            wbyte(op, ln2)
            return op + 1

        return jax.lax.cond(enable, go, lambda op: op, op)

    def copy_lits(op, a0, ln):
        def body(st):
            i, op = st
            wbyte(op, rbyte(i))
            return i + 1, op + 1

        _, op = jax.lax.while_loop(lambda st: st[0] < a0 + ln, body,
                                   (a0, op))
        return op

    def fwd_count(q1, q2, maxn):
        """Bytes equal at src[q1+i] == src[q2+i], i < maxn (4/iter)."""
        def body(st):
            c, go = st
            x = read4(q1 + c) ^ read4(q2 + c)
            b0 = x & 255
            b1 = x & 0xFF00
            b2 = x & 0xFF0000
            nb = jnp.where(b0 != 0, 0,
                           jnp.where(b1 != 0, 1,
                                     jnp.where(b2 != 0, 2, 3)))
            add = jnp.where(x == 0, 4, nb)
            add = jnp.minimum(add, maxn - c)
            return c + add, (x == 0) & (c + add < maxn)

        c, _ = jax.lax.while_loop(lambda st: st[1], body,
                                  (jnp.int32(0), maxn > 0))
        return c

    # history pre-insert (linked/dict mode): hash the valid window so
    # the parse can match into it — the reference's LZ4_loadDict /
    # attach pattern (lz4.c:1375-1414)
    if d0:
        def dins(q):
            table[hash4(read4(q))] = (b << 18) | q
            return q + dict_stride

        jax.lax.while_loop(lambda q: q < d0, dins, low)

    def parse_body(st):
        p, anchor, op, srch = st
        seq = read4(p)
        h = hash4(seq)
        e = table[h]
        table[h] = (b << 18) | p
        cand = e & 0x3FFFF
        hit = ((jax.lax.shift_right_logical(e, 18) == b)
               & (cand < p) & (cand >= low) & (p - cand <= 65535)
               & (read4(cand) == seq))

        def miss_fn(st):
            p, anchor, op, srch = st
            return (p + jax.lax.shift_right_logical(srch, SKIP_TRIGGER),
                    anchor, op, srch + 1)

        def hit_fn(st):
            p, anchor, op, srch = st

            # back-extension (lz4.c:1002-1008 analog)
            def back(st2):
                p2, c2 = st2
                return p2 - 1, c2 - 1

            p2, cand2 = jax.lax.while_loop(
                lambda st2: (st2[0] > anchor) & (st2[1] > low)
                & (rbyte(st2[0] - 1) == rbyte(st2[1] - 1)),
                back, (p, cand))
            offset = p2 - cand2
            ml = 4 + fwd_count(p2 + 4, cand2 + 4,
                               matchlimit - (p2 + 4))
            litlen = p2 - anchor
            m4 = ml - 4

            # token
            tok = (jnp.minimum(litlen, 15) << 4) | jnp.minimum(m4, 15)
            wbyte(op, tok)
            op2 = op + 1
            op2 = emit_len(op2, litlen - 15, litlen >= 15)
            op2 = copy_lits(op2, anchor, litlen)
            wbyte(op2, offset & 255)
            wbyte(op2 + 1, offset >> 8)
            op2 = op2 + 2
            op2 = emit_len(op2, m4 - 15, m4 >= 15)

            # tail insert (blockcodec.c ip-2 pattern: denser table near
            # match ends measurably improves the next-match hit rate)
            t2 = p2 + ml - 2
            table[hash4(read4(t2))] = (b << 18) | t2
            return (p2 + ml, p2 + ml, op2,
                    jnp.int32(acceleration << SKIP_TRIGGER))

        return jax.lax.cond(hit, hit_fn, miss_fn, (p, anchor, op, srch))

    p, anchor, op, _ = jax.lax.while_loop(
        lambda st: st[0] <= mflimit, parse_body,
        (jnp.int32(d0), jnp.int32(d0), jnp.int32(0),
         jnp.int32(acceleration << SKIP_TRIGGER)))

    # tail: the final literal run (>= LASTLITERALS bytes by construction)
    litlen = jnp.maximum(d0 + n - anchor, 0)
    wbyte(op, jnp.minimum(litlen, 15) << 4)
    op = op + 1
    op = emit_len(op, litlen - 15, litlen >= 15)
    op = copy_lits(op, anchor, litlen)

    csize_ref[b] = op
    trail_ref[b] = litlen


@functools.partial(jax.jit, static_argnames=("cap_n", "acceleration",
                                             "interpret", "d0",
                                             "dict_stride"))
def _encode_pallas_raw(src32, lens, dlens, *, cap_n: int,
                       acceleration: int, interpret: bool, d0: int,
                       dict_stride: int):
    B, _, n_words = src32.shape
    bound = compress_bound(cap_n)
    w_out = -(-(bound + 4) // 4)
    w_out += (-w_out) % 128
    kern = functools.partial(_encode_kernel, n_words=n_words,
                             w_out=w_out, d0=d0,
                             acceleration=acceleration,
                             dict_stride=dict_stride)
    out_w, csizes, trailing = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
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
    )(lens.astype(jnp.int32), dlens.astype(jnp.int32), src32)
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
                         dict_stride: int = 1):
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
    return _encode_pallas_raw(words, lens, dlens, cap_n=cap_n,
                              acceleration=int(acceleration),
                              interpret=bool(interpret), d0=d0,
                              dict_stride=int(dict_stride))
