"""Pallas serial-block LZ4 decoder — the wildcopy design on TPU.

The sort/scan decoder (decode_jax.py) is bound by XLA's batched
full-width passes (~22 ms per 32x64K gather, ~1-2 ms per sort lane,
docs/tpu_perf_notes.md); its per-byte cost is architectural. This
kernel takes the opposite corner: ONE block per grid step, decoded
sequentially in VMEM exactly like the reference's hot loop
(LZ4_decompress_generic, lz4.c:2022-2445), with the TPU twist that
every copy is a 128-lane vector op.

Round-3 revision, built on the RTT-corrected machine model (every
dispatch through the remote relay carries ~24.5 ms of latency, so all
measurements amortize N async dispatches over one sync — see
tools/session_r3e.py and the /tmp scan probes): scalar ALU is
sub-ns/op when VLIW-packed, SMEM loads are a few ns, untaken control
flow is free, and a take_along_axis gather costs ~250 ns. Per-seq
costs on dense 64 KB streams: parse ~78 ns, literal copy ~29 ns,
match copy ~70 ns → ~54 MB/s single-core. Design:

  * parses on the SCALAR unit from a packed-words SMEM copy,
    select-based: ONE read4 fetches token + two literal-ext bytes,
    ONE read4 fetches offset + two match-ext bytes, so 255-chains of
    <= 2 ext bytes resolve branch-free and a single merged lax.cond
    escape covers the freak longer chains (lz4.c:1978-2014);
  * keeps the output block in VMEM as one-byte-per-lane int32 rows
    with a 128-byte PAD row in front, so a "window read" of 128/256
    consecutive bytes at ANY byte offset is a single 2/3-row load +
    one roll + one select — the aligned-source trick: reading at
    (src - dst%128) lands bytes directly in destination phase, no
    second roll, no broadcast;
  * short copies are FRONTIER writes (wfront): left-masked only —
    everything right of the copy is garbage that the next sequence's
    write overwrites, saving the length clamp and a scalar->vector
    compare per copy (the moral analog of wildCopy8/32 overrun,
    lz4.c:463-572);
  * only truly overlapping matches (mlen > offset, not offset < 128)
    pay the ~250 ns periodic gather — the vector inc32table/
    dec64table (lz4.c:2406-2418); non-overlapping matches at any
    offset are one straight window + wfront;
  * long copies (> 128 bytes) walk full rows, straight or periodic,
    selected once per copy (not per row);
  * K blocks per grid step and U sequences per iteration (static,
    default 1): measured flat, kept as knobs; `loose` drops the two
    end-of-block MFLIMIT checks for the big-block splitter's linked
    pieces (native/blockcodec.c lz4t_split_stream — the splitter
    itself enforces them block-wide). The packed-words SMEM copy
    double-buffers, bounding the direct tier at 256 KB.

Error semantics mirror decode_jax._parse_tokens / _decode_one bit for
bit (the sound-subset contract): any malformed stream sets err and the
output is discarded by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lz4_tpu.constants import MINMATCH

try:  # Pallas import is optional (CPU interpret mode used in tests)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

LANES = 128
PAD = LANES          # front pad row on both VMEM buffers (aligned windows)


def _decode_kernel(len_ref, dlen_ref, words_ref, comp_ref, dict_ref,
                   out_ref, olen_ref, err_ref, *, cap_out: int,
                   r_in: int, r_out: int, d0: int = 0, K: int = 1,
                   U: int = 1, mode: str = "full",
                   loose: bool = False):
    """K blocks per grid step, one fused while_loop. words_ref:
    (K, 1, W) int32 SMEM — the compressed bytes packed 4/word
    little-endian (scalar parse side); comp_ref: (K, r_in, 128) int32
    bytes VMEM with one PAD row in front (literal copy side); out_ref:
    (K, r_out, 128) int32 bytes, laid out
    [PAD row | d0 history rows | cap_out data | spare];
    len/olen/err: SMEM scalars indexed g*K+k. d0 > 0 is dict/linked
    mode: dict_ref (K, d0//128, 128) holds the right-aligned history,
    copied into the output rows after the pad so match sources reach it
    transparently (lz4.c:2461-2508 usingDict analog); decoded bytes
    start at logical position d0 (buffer byte PAD + d0)."""
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
    # flat byte index over a (2, 128) slab
    fi2 = lane2 + LANES * jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 0)
    fi8 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
           + LANES * jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0))
    ow = jnp.int32(d0 + cap_out)
    Ms = [len_ref[g * K + k] for k in range(K)]
    if d0:
        # first valid history byte per block
        lows = [d0 - jnp.minimum(dlen_ref[g * K + k], d0) for k in range(K)]
        for k in range(K):
            out_ref[k, 1: 1 + d0 // LANES, :] = dict_ref[k]
    else:
        lows = [jnp.int32(0)] * K

    def rbyte(k, q):
        """Scalar byte read from the packed SMEM copy (caller keeps q
        inside the padded word buffer)."""
        return (words_ref[k, 0, q >> 2] >> (8 * (q & 3))) & 255

    def read4(k, q):
        """4 LE bytes at byte offset q as one int32 (q unclipped: the
        word buffer carries >= 8 spare zero bytes past the data)."""
        w1 = words_ref[k, 0, q >> 2]
        w2 = words_ref[k, 0, (q >> 2) + 1]
        sh = 8 * (q & 3)
        lo = jax.lax.shift_right_logical(w1, sh)
        # branch-free high half: << (31-sh) << 1 is 0 when sh == 0
        hi = jax.lax.shift_left(jax.lax.shift_left(w2, 31 - sh), 1)
        return lo | hi

    def window2(ref, k, pos, rmax):
        """(2, 128) slab with v[i] = ref_bytes[pos + i], i in [0, 256)
        — one 3-row load + one roll + one select. pos is a BUFFER
        coordinate (>= 1 given the PAD row; callers align pos to the
        destination phase so the result needs no second roll). The
        clamp only ever fires on err-doomed streams."""
        row = jnp.clip(pos // LANES, 0, rmax - 3)
        l = pos % LANES
        slab = ref[k, pl.ds(row, 3), :]                  # (3, 128)
        r = pltpu.roll(slab, -l, 1)
        return jnp.where(lane2 < LANES - l, r[0:2, :], r[1:3, :])

    def window1(ref, k, pos, rmax):
        """(1, 128) variant of window2."""
        row = jnp.clip(pos // LANES, 0, rmax - 2)
        l = pos % LANES
        slab = ref[k, pl.ds(row, 2), :]                  # (2, 128)
        r = pltpu.roll(slab, -l, 1)
        return jnp.where(lane < LANES - l, r[0:1, :], r[1:2, :])

    def wfront(k, dst, v2):
        """FRONTIER write: bytes dst.. to the end of the 2-row window
        get slab values; bytes before dst are preserved. No right
        boundary — everything past the copy's true length is garbage
        that the NEXT sequence's write (which starts exactly at the
        frontier) overwrites, and garbage past the final frontier is
        sliced off by the caller. Saves the length clamp and one
        scalar->vector compare per copy vs a two-sided mask."""
        q = dst + PAD
        row = jnp.clip(q // LANES, 0, r_out - 2)
        start = q % LANES
        old = out_ref[k, pl.ds(row, 2), :]
        out_ref[k, pl.ds(row, 2), :] = jnp.where(fi2 >= start, v2, old)

    def ext_len(k, pos):
        """Resolve a 255-chain: scalar loads until a byte != 255.
        Returns (total extra, end position past the chain)."""
        def body(st):
            q, acc, _go = st
            v = rbyte(k, q)
            return q + 1, acc + v, v == 255

        q, acc, _ = jax.lax.while_loop(
            lambda st: st[2], body, (pos, jnp.int32(0), True))
        return acc, q

    def copy_long(ref, k, rmax, pos0, dst0, length, off):
        """Row-walking fallback for copies > 128 bytes. pos0 is the
        source BUFFER coordinate; off == 0 -> straight forward copy
        (also used for matches with offset >= 128: every row's source
        precedes its dest); 0 < off < 128 -> periodic pattern from a
        seed window."""
        small = (off > 0) & (off < LANES)
        offs = jnp.maximum(off, 1)
        pat8 = jnp.broadcast_to(window1(ref, k, pos0, rmax), (8, LANES))

        def body_straight(st):
            cur, rem = st
            start = cur % LANES
            n = jnp.minimum(LANES - start, rem)
            v = window1(ref, k, pos0 + (cur - dst0) - start, rmax)
            m = (lane >= start) & (lane < start + n)
            q = cur + PAD
            rowc = jnp.clip(q // LANES, 0, r_out - 1)
            old = out_ref[k, pl.ds(rowc, 1), :]
            out_ref[k, pl.ds(rowc, 1), :] = jnp.where(m, v, old)
            return cur + n, rem - n

        def body_periodic(st):
            cur, rem = st
            start = cur % LANES
            n = jnp.minimum(LANES - start, rem)
            c0 = (cur - start - dst0) % offs
            idx8 = (c0 + fi8[0:1, :]) % offs
            v = jnp.take_along_axis(
                pat8, jnp.broadcast_to(idx8, (8, LANES)), axis=1)[0:1, :]
            m = (lane >= start) & (lane < start + n)
            q = cur + PAD
            rowc = jnp.clip(q // LANES, 0, r_out - 1)
            old = out_ref[k, pl.ds(rowc, 1), :]
            out_ref[k, pl.ds(rowc, 1), :] = jnp.where(m, v, old)
            return cur + n, rem - n

        def go(body):
            def run(_):
                jax.lax.while_loop(lambda st: st[1] > 0, body,
                                   (dst0, jnp.maximum(length, 0)))
                return 0
            return run

        jax.lax.cond(small, go(body_periodic), go(body_straight), 0)

    def sub_body(k, st):
        """One sequence step of block k (guarded: frozen when the
        block is finished or errored). The body is BRANCH-FREE on the
        common path: every select is a jnp.where, the only control
        flow is the rare multi-byte 255-chain escape and the rare
        >128-byte copy escape — in-order VLIW cores pay for branches,
        not for instructions (tools/session_r3e.py: halving the parse
        instruction count moved the floor 0%)."""
        p, o, err, done = st
        M = Ms[k]
        low = lows[k]
        if K == 1 and U == 1:
            # the loop cond already guarantees liveness — no guard ops
            active = jnp.bool_(True)
        else:
            active = (p < M) & ~err & ~done
            # frozen blocks re-execute with a carried p that a
            # malformed 255-chain can have made enormous: clamp the
            # parse reads (results are discarded via the freeze)
            p = jnp.where(active, p, jnp.minimum(p, M))
        # ---- scalar parse (lz4.c:2279-2335), select-based ------------
        # chains of <= 2 extension bytes resolve branch-free from bytes
        # already in w0/w1; ONE merged lax.cond escape covers the freak
        # >= 3-byte chains (litlen >= 525 / mlen >= 529) — an untaken
        # cond still costs ~17 ns/seq, so two were merged into one
        w0 = read4(k, p)
        litnib = (w0 >> 4) & 15
        matnib = w0 & 15
        e0 = (w0 >> 8) & 255             # 1st literal-ext byte if any
        e1 = (w0 >> 16) & 255            # 2nd literal-ext byte if any
        lit15 = litnib == 15
        lx2 = lit15 & (e0 == 255)
        litlen_f = jnp.where(
            lit15, 15 + e0 + jnp.where(lx2, e1, 0), litnib)
        lit_start_f = p + 1 + lit15.astype(jnp.int32) \
            + lx2.astype(jnp.int32)
        lit_end_f = lit_start_f + litlen_f
        # offset + first two match-ext bytes in one read (clamped once:
        # a doomed oversized litlen may push lit_end past the buffer,
        # but any sequence surviving the checks below has
        # lit_end <= M - 8)
        w1 = read4(k, jnp.minimum(lit_end_f, M))
        offset_f = w1 & 0xFFFF
        m0 = (w1 >> 16) & 255
        m1 = jax.lax.shift_right_logical(w1, 24) & 255
        m15 = (matnib == 15) & (lit_end_f < M)
        mx2 = m15 & (m0 == 255)
        mext_f = jnp.where(m15, m0 + jnp.where(mx2, m1, 0), 0)
        next_p_f = lit_end_f + 2 + m15.astype(jnp.int32) \
            + mx2.astype(jnp.int32)

        def slow_parse(_):
            # full 255-chain resolution (lz4.c:1978-2014)
            def lit_chain(_):
                ea, eq = ext_len(k, p + 1)
                return 15 + ea, eq

            ll, ls = jax.lax.cond(
                lit15, lit_chain, lambda _: (litlen_f, lit_start_f), 0)
            le = ls + ll
            w1s = read4(k, jnp.minimum(le, M))

            def mat_chain(_):
                eb, ebq = ext_len(k, le + 2)
                return eb, ebq

            mex, npp = jax.lax.cond(
                (matnib == 15) & (le < M), mat_chain,
                lambda _: (jnp.int32(0), le + 2), 0)
            return ll, ls, mex, npp, w1s & 0xFFFF

        litlen, lit_start, mext, next_p, offset = jax.lax.cond(
            active & ((lx2 & (e1 == 255)) | (mx2 & (m1 == 255))),
            slow_parse,
            lambda _: (litlen_f, lit_start_f, mext_f, next_p_f,
                       offset_f), 0)
        lit_end = lit_start + litlen
        mlen = MINMATCH + matnib + mext

        is_last = lit_end >= M
        # parsing restrictions — mirror decode_jax._parse_tokens
        # (reference analog lz4.c:2279-2318); o is d0-based in dict mode
        serr = err | (is_last & (lit_end != M)) | ((o + litlen) > ow)

        # ---- literal copy: one unconditional frontier write ----------
        if mode != "nocopy":
            start = o % LANES
            # aligned window: reading at (lit_start - start) puts byte
            # j of the run at slab position start + j
            v2 = window2(comp_ref, k, PAD + lit_start - start, r_in)
            wfront(k, o, v2)

            @pl.when(active & ~serr & (litlen > LANES))
            def _():
                copy_long(comp_ref, k, r_in, PAD + lit_start, o, litlen,
                          jnp.int32(0))
        o_mid = o + litlen

        # ---- match half (absent on the last sequence) -----------------
        # `loose` drops the two end-of-block MFLIMIT rules that only
        # hold for whole blocks (lz4.c:242-249): the splitter-produced
        # linked pieces of a big block legally end right after a match
        bad_mid = (next_p > M) | (offset == 0)
        if not loose:
            bad_mid = bad_mid | (lit_end > M - 8)
        serr = serr | (~is_last & bad_mid)
        do_match = ~is_last & ~serr
        serr = serr | (do_match & ((o_mid - offset) < low))
        serr = serr | (do_match & ((o_mid + mlen) > ow))
        if not loose:
            serr = serr | (do_match & (o_mid > ow - 12))
        do_match = active & do_match & ~serr

        if mode not in ("nocopy", "litonly"):
            # overlap only exists when mlen > offset — NON-overlapping
            # matches take the straight window path at ANY offset
            # (slab bytes [0, mlen) all precede the frontier), so the
            # ~250 ns gather runs only for true self-referential
            # patterns (the vector inc32table/dec64table,
            # lz4.c:2406-2418)
            overlap = mlen > offset
            src0 = o_mid - offset
            start2 = o_mid % LANES

            @pl.when(do_match & (mlen <= LANES) & ~overlap)
            def _():
                v2 = window2(out_ref, k, PAD + src0 - start2, r_out)
                wfront(k, o_mid, v2)

            @pl.when(do_match & (mlen <= LANES) & overlap)
            def _():
                w = jnp.broadcast_to(
                    window1(out_ref, k, PAD + src0, r_out), (2, LANES))
                offs = jnp.maximum(offset, 1)
                idx2 = jnp.minimum((fi2 - start2) % offs, LANES - 1)
                vm = jnp.take_along_axis(w, idx2, axis=1)
                wfront(k, o_mid, vm)

            @pl.when(do_match & (mlen > LANES))
            def _():
                copy_long(out_ref, k, r_out, PAD + src0, o_mid, mlen,
                          offset)

        o_next = jnp.where(do_match, o_mid + mlen,
                           jnp.where(serr, o, o_mid))
        done_next = done | is_last | serr
        if K == 1 and U == 1:
            return next_p, o_next, serr, done_next
        # freeze finished/errored blocks
        return (jnp.where(active, next_p, p),
                jnp.where(active, o_next, o),
                jnp.where(active, serr, err),
                jnp.where(active, done_next, done))

    def seq_body(sts):
        # U > 1: each loop iteration advances every block by U
        # sequences (guarded) — amortizes loop overhead and gives the
        # VLIW scheduler two sequences' worth of work to pack
        for _ in range(U):
            sts = tuple(sub_body(k, sts[k]) for k in range(K))
        return sts

    def seq_cond(sts):
        go = jnp.bool_(False)
        for k in range(K):
            p, _, err, done = sts[k]
            go = go | ((p < Ms[k]) & ~err & ~done)
        return go

    init = tuple((jnp.int32(0), jnp.int32(d0), Ms[k] < 0, Ms[k] < 0)
                 for k in range(K))
    final = jax.lax.while_loop(seq_cond, seq_body, init)
    for k in range(K):
        _, o, err, done = final[k]
        err = err | ~done                # truncated / endless stream
        olen_ref[g * K + k] = jnp.where(err, 0, o - d0)
        err_ref[g * K + k] = err.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_out", "interpret",
                                             "mode", "d0", "K", "U",
                                             "loose"))
def _decode_pallas_raw(comp32, comp_lens, dict32, dlens, *, cap_out: int,
                       interpret: bool, mode: str = "full", d0: int = 0,
                       K: int = 1, U: int = 1, loose: bool = False):
    B, r_in, _ = comp32.shape
    assert B % K == 0
    # rows: PAD + dict + data + window spill (window2 reads 3 rows)
    r_out = 1 + -(-(d0 + cap_out) // LANES) + 3
    r_out += (-r_out) % 8
    # scalar-parse copy: the same bytes packed 4/word little-endian,
    # one (K, 1, W) SMEM block per grid step. The VMEM copy carries the
    # PAD row; the word copy must NOT (parse positions are raw), so
    # drop the first 32 words.
    W = r_in * LANES // 4 - 32
    b4 = comp32.reshape(B, 1, r_in * LANES // 4, 4)[:, :, 32:, :]
    words = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
             | (b4[..., 3] << 24))
    kern = functools.partial(_decode_kernel, cap_out=cap_out,
                             r_in=r_in, r_out=r_out, d0=d0, K=K, U=U,
                             mode=mode, loose=loose)
    out, olen, errs = pl.pallas_call(
        kern,
        grid=(B // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, r_in, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((K, max(d0 // LANES, 1), LANES),
                         lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, r_out, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, r_out, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(comp_lens.astype(jnp.int32), dlens.astype(jnp.int32), words,
      comp32, dict32)
    flat = out.reshape(B, r_out * LANES)[:, PAD + d0: PAD + d0 + cap_out] \
        .astype(jnp.uint8)
    return flat, olen, errs


def default_interleave() -> int:
    """Blocks decoded per grid step (the scalar-parse ILP knob).
    Overridable via LZ4_TPU_DECODE_K."""
    import os
    try:
        return max(1, int(os.environ.get("LZ4_TPU_DECODE_K", "1")))
    except ValueError:  # pragma: no cover
        return 1


def decode_blocks_pallas(comp, comp_lens, dict_bufs=None, dict_lens=None,
                         *, cap_out: int, interpret: bool | None = None,
                         mode: str = "full", K: int | None = None,
                         U: int | None = None, loose: bool = False):
    """Batched block decode on the serial-kernel path.

    Same contract as decode_jax.decode_blocks:
    comp uint8[B, cap_in], comp_lens int32[B],
    dict_bufs uint8[B, 65536] right-aligned history (or None),
    dict_lens int32[B] →
    (out uint8[B, cap_out], out_lens int32[B], errs int32[B]).

    K = blocks interleaved per grid step; the batch is padded with
    zero-length blocks (decoded as err, sliced off here) to a multiple
    of K.
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if K is None:
        K = default_interleave()
    B, cap_in = comp.shape
    K = min(K, B)
    Bp = -(-B // K) * K
    # rows: PAD row + data + parse/window spill (>= 4 spare rows: the
    # unclipped read4 and oversized-litlen windows stay in-buffer)
    r_in = 1 + -(-(cap_in + 4 * LANES) // LANES)
    r_in += (-r_in) % 8
    pad = r_in * LANES - cap_in - PAD
    comp32 = jnp.pad(comp.astype(jnp.int32),
                     ((0, 0), (PAD, pad))).reshape(B, r_in, LANES)
    if Bp != B:
        comp32 = jnp.pad(comp32, ((0, Bp - B), (0, 0), (0, 0)))
        comp_lens = jnp.pad(comp_lens, (0, Bp - B))
    has_dict = dict_bufs is not None
    d0 = 65536 if has_dict else 0
    if has_dict:
        dict32 = dict_bufs.astype(jnp.int32).reshape(
            B, d0 // LANES, LANES)
        dlens = dict_lens
        if Bp != B:
            dict32 = jnp.pad(dict32, ((0, Bp - B), (0, 0), (0, 0)))
            dlens = jnp.pad(dlens, (0, Bp - B))
    else:
        dict32 = jnp.zeros((Bp, 1, LANES), jnp.int32)
        dlens = jnp.zeros((Bp,), jnp.int32)
    if U is None:
        import os
        U = max(1, int(os.environ.get("LZ4_TPU_DECODE_U", "1")))
    out, olen, errs = _decode_pallas_raw(
        comp32, comp_lens, dict32, dlens, cap_out=cap_out,
        interpret=bool(interpret), mode=mode, d0=d0, K=K, U=U,
        loose=loose)
    if Bp != B:
        out, olen, errs = out[:B], olen[:B], errs[:B]
    return out, olen, errs
