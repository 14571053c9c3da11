"""128-lane lockstep ("wavefront") LZ4 match finder — block-per-lane.

The encode answer to decode_wave.py (round-4's 7x decode swing): 128
independent <= 64 KB blocks are match-scanned simultaneously, one block
per lane, with ALL scan state in (1, 128) vector registers. The serial
Pallas encoder (encode_pallas.py) pays ~28 ns per scan position on ONE
block at a time; here one lockstep step advances the SAME position in
128 blocks at once, so the per-byte cost divides by the lane count.

What makes lockstep possible (the dual of the decode wave's re-layout):
the step index IS the input position. Every lane processes position q
at step q, so every input load is a UNIFORM row read (free on the VPU);
the only per-lane-divergent accesses are
  1. the hash-table probe/insert  — one-hot passes over an (H, 128)
     VMEM table (~0.16 ns/row, the measured one-hot law), and
  2. the match verify/extend byte — one one-hot fetch from a 513-row
     near window of the input (the same 2 KB window the wave DECODER
     uses, which is why this tier pairs with --max-dist=2K streams).

Per step, each lane is either SCANNING (hash x[q:q+4], probe, insert,
optionally start a match) or MATCHING (compare x[q] against
x[cand + q - a]; on mismatch, record the finished match). A candidate
that dies before 4 verified bytes records nothing — min-match 4 by
construction, the failed bytes stay literals.

Matches are recorded as dense per-ROW decisions: one int32 per 4 input
bytes, off(16b) | end_sub(2b) | (mlen-4)(14b), written as a perfectly
uniform (1, 128) row store and DMA-staged to HBM. Two match ends are
always >= 5 positions apart, so one slot per row never collides; the
kernel force-ends matches at 16 KB so mlen-4 fits its 14 bits (a
mega-run simply chains a follow-up match at ~3 bytes/16KB cost). The
host C emitter (lz4t_wave_emit_decisions, native/blockcodec.c) turns
decisions into standard LZ4 sequence bytes at memcpy speed: the kernel
does the expensive part (match FINDING), the format serialization stays
host-side exactly like the wave decoder's host splitter.

Hash-table trick: each (h, lane) entry packs TWO 16-bit absolute
positions (most-recent low, previous high) — the insert pass reads the
old entry anyway, so chain depth 2 costs zero extra scans; the probe
takes the most recent candidate that lies inside the distance cap.

End-of-block rules (MFLIMIT=12 start bound, LASTLITERALS=5,
lz4.c:242-249) are enforced by the start/extend masks and re-checked by
the emitter.

Reference analog: LZ4_compress_generic's hot loop (lz4.c:930-1338),
redesigned for 128-lane lockstep rather than ported; the distance cap
is the favor-dec-speed trade taken to its TPU conclusion
(lz4hc.c:926-928 precedent), giving streams that also DECODE on the
fast wave tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

LANES = 128
#: log2 buckets per lane (x2 candidates packed). Default 10: measured
#: 455 MB/s at 1.2308x the uncapped size — UNDER the host C capped
#: encoder's 1.2401x, and ~1.22x vs the reference encoder. hash_bits=9
#: trades to 676 MB/s at 1.2627x; full curve in docs/tpu_perf_notes.md.
HASH_BITS = 10
MAX_DIST = 2048            # offset cap: matches stay in the near window
CHUNK_ROWS = 256           # decision rows staged per DMA
MAX_MLEN = 16384           # force-end bound (14-bit mlen field)
KNUTH = np.int32(np.uint32(2654435761).astype(np.int32))


def _fetch_rows(win, idx, n, use_onehot):
    """out[i, j] = win[idx[i, j], j] — one-hot compare+select+sum on
    TPU (tpu.dynamic_gather dims=[0] wedges the chip; see
    docs/tpu_perf_notes.md), take_along_axis in interpret mode."""
    W = win.shape[0]
    if not use_onehot:
        return jnp.take_along_axis(win, jnp.clip(idx, 0, W - 1), axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    outs = []
    for i in range(n):
        oh = rows == idx[i: i + 1, :]
        outs.append(jnp.sum(jnp.where(oh, win, 0), axis=0, keepdims=True))
    return jnp.concatenate(outs, 0)


def _encode_wave_kernel(inp_ref, lens_ref, *refs, n_rows: int,
                        use_onehot: bool, max_dist: int,
                        hash_bits: int, linked: bool = False):
    """inp_ref: VMEM (n_rows + 8, 128) int32 interleaved input words;
    lens_ref: VMEM (1, 128) int32 per-lane block lengths;
    dec_ref: ANY/HBM (n_rows, 128) int32 decisions out;
    table: VMEM (hash_rows, 128) scratch; stage: VMEM
    (2 * CHUNK_ROWS, 128) decision staging, DMA'd out per chunk.

    linked=True adds hist_ref (win_rows, 128) — the tail of each
    lane's 64 KB history — and hlen_ref (1, 128): matches may start up
    to max_dist bytes BEFORE the block (LZ4 prefix-dict semantics).
    The table works in mod-2^16 byte coordinates, history positions
    included; a warmup pass seeds it from the history tail, so nothing
    persists across segment calls. Stale aliased entries are harmless
    by construction: every candidate is VERIFIED byte-by-byte against
    the actual window, so aliasing can only cost ratio, never
    correctness."""
    if linked:
        hist_ref, hlen_ref, dec_ref, table, stage, out_sem = refs
    else:
        dec_ref, table, stage, out_sem = refs
    zero = jnp.zeros((1, LANES), jnp.int32)
    lens = lens_ref[...]
    hash_rows = 1 << hash_bits
    # window must cover src in [q - max_dist, q] for every sub-phase:
    # (4i+sub-max_dist)>>2 >= i - (max_dist>>2) - 1, hence the +2 —
    # clamped to the input itself for caps wider than the block tier
    # (s0 then pins to 0 and the window is the whole array)
    win_rows = min(max_dist // 4 + 2, n_rows + 1)

    def chunk_dma(c, slot):
        return pltpu.make_async_copy(
            stage.at[pl.ds(slot * CHUNK_ROWS, CHUNK_ROWS), :],
            dec_ref.at[pl.ds(c * CHUNK_ROWS, CHUNK_ROWS), :],
            out_sem.at[slot])

    # table init: -1 = two 0xFFFF candidates; position 65535 fails the
    # distance-validity test at every in-range q
    table[...] = jnp.full((hash_rows, LANES), -1, jnp.int32)

    if linked:
        hl = hlen_ref[...]
        hist_win = hist_ref[...]              # (win_rows, 128) tail

        # ---- warmup: seed the table from the history tail so matches
        # may start up to max_dist bytes before the block. Positions
        # are stored mod 2^16 (negative bytes included); the last
        # history row is skipped (its 4-gram spans into the block —
        # a <=7-byte coverage loss).
        def warm_body(hr, _):
            hw0 = hist_ref[pl.ds(hr, 1), :]
            hw1 = hist_ref[pl.ds(hr + 1, 1), :]
            for sub in range(4):
                p = -4 * win_rows + 4 * hr + sub
                if sub == 0:
                    hcur = hw0
                else:
                    hsh = 8 * sub
                    hcur = jax.lax.shift_right_logical(hw0, hsh) | \
                        jax.lax.shift_left(
                            jax.lax.shift_left(hw1, 31 - hsh), 1)
                hh = jax.lax.shift_right_logical(
                    hcur * KNUTH, 32 - hash_bits)
                hok = jnp.broadcast_to(p >= -hl, (1, LANES))
                hrows = jax.lax.broadcasted_iota(
                    jnp.int32, (hash_rows, LANES), 0)
                hoh = (hrows == hh) & hok
                table[...] = jnp.where(
                    hoh,
                    jax.lax.shift_left(table[...], 16) | (p & 0xFFFF),
                    table[...])
            return 0

        jax.lax.fori_loop(0, win_rows - 1, warm_body, 0)
    else:
        hl = zero

    def make_body(hist_near):
        return functools.partial(iter_body, hist_near=hist_near)

    def iter_body(i, st, hist_near=False):
        # st: mode (0 scan / 1 match), cand (abs src start, negative =
        # history), a (match start), all (1, 128) int32
        mode, cand, a = st

        # uniform input rows: words covering x[4i .. 4i+7]
        w0 = inp_ref[pl.ds(i, 1), :]
        w1 = inp_ref[pl.ds(i + 1, 1), :]

        # near window of the input (uniform start: one shared slice)
        s0 = jnp.maximum(i - (win_rows - 1), 0)
        win = inp_ref[pl.ds(s0, win_rows), :]

        dec = zero
        for sub in range(4):
            q = 4 * i + sub
            # x[q:q+4] little-endian from the two covering words
            if sub == 0:
                cur4 = w0
            else:
                sh = 8 * sub
                cur4 = jax.lax.shift_right_logical(w0, sh) | \
                    jax.lax.shift_left(
                        jax.lax.shift_left(w1, 31 - sh), 1)
            curb = cur4 & 255

            # ---- probe (scanning lanes): packed 2-candidate bucket
            h = jax.lax.shift_right_logical(
                cur4 * KNUTH, 32 - hash_bits)
            ent = _fetch_rows(table[...], h, 1, use_onehot)
            c1 = ent & 0xFFFF
            c2 = jax.lax.shift_right_logical(ent, 16) & 0xFFFF
            if linked:
                # mod-2^16 distances; candidates may sit inside the
                # available history (d <= q + hlen). 0xFFFF is the
                # table-init sentinel AND can never be a real entry
                # (position -1's 4-gram spans the history/block seam,
                # which the warmup skips), so exclude it explicitly.
                d1 = (q - c1) & 0xFFFF
                d2 = (q - c2) & 0xFFFF
                ok1 = ((d1 >= 1) & (d1 <= max_dist) & (d1 <= q + hl)
                       & (c1 != 0xFFFF))
                ok2 = ((d2 >= 1) & (d2 <= max_dist) & (d2 <= q + hl)
                       & (c2 != 0xFFFF))
                cnd = q - jnp.where(ok1, d1, d2)
            else:
                ok1 = (q - c1 >= 1) & (q - c1 <= max_dist)
                ok2 = (q - c2 >= 1) & (q - c2 <= max_dist)
                cnd = jnp.where(ok1, c1, c2)
            cok = ok1 | ok2

            # ---- insert q (all lanes, in-range positions only): new
            # entry keeps the evicted candidate in the high half
            ins = jnp.broadcast_to(q + 4 <= lens, (1, LANES))
            rows_i = jax.lax.broadcasted_iota(
                jnp.int32, (hash_rows, LANES), 0)
            oh_i = (rows_i == h) & ins
            table[...] = jnp.where(
                oh_i, jax.lax.shift_left(table[...], 16) | q, table[...])

            # ---- start decision (scanning lanes): MFLIMIT start bound
            start = (mode == 0) & cok & (q <= lens - 12)
            cand = jnp.where(start, cnd, cand)
            a = jnp.where(start, q, a)
            mode = jnp.where(start, 1, mode)

            # ---- verify/extend byte: x[cand + (q - a)] vs x[q]
            src = cand + (q - a)
            srow = jax.lax.shift_right_arithmetic(src, 2)
            if hist_near:
                # early rows: src may be negative (history); fetch
                # both windows and select by sign
                lo = _fetch_rows(win, srow - s0, 1, use_onehot)
                hi = _fetch_rows(hist_win, srow + win_rows, 1,
                                 use_onehot)
                mb_w = jnp.where(srow >= 0, lo, hi)
            else:
                mb_w = _fetch_rows(win, srow - s0, 1, use_onehot)
            mb = jax.lax.shift_right_logical(mb_w, 8 * (src & 3)) & 255
            # LASTLITERALS: matches may not extend into the final 5;
            # 14-bit mlen field: force-end at 16 KB (a mega-run chains)
            mlen = q - a
            can_ext = (q < lens - 5) & (mlen < MAX_MLEN + 3)
            good = (mode == 1) & (mb == curb) & can_ext
            ended = (mode == 1) & ~good
            commit = ended & (mlen >= 4)
            off = a - cand
            dec = jnp.where(
                commit,
                off | (sub << 16) | jax.lax.shift_left(mlen - 4, 18),
                dec)
            mode = jnp.where(ended, 0, mode)

        c = i // CHUNK_ROWS

        @pl.when((i % CHUNK_ROWS) == 0)
        def _():
            @pl.when(c >= 2)
            def _():
                chunk_dma(c - 2, c % 2).wait()

        stage[pl.ds((c % 2) * CHUNK_ROWS + (i % CHUNK_ROWS), 1), :] = dec

        @pl.when((i % CHUNK_ROWS) == (CHUNK_ROWS - 1))
        def _():
            chunk_dma(c, c % 2).start()

        return mode, cand, a

    init = (zero, zero, zero)
    if linked:
        # rows whose window can reach history run the dual-fetch body
        cut = min(win_rows - 1, n_rows)
        st = jax.lax.fori_loop(0, cut, make_body(True), init)
        jax.lax.fori_loop(cut, n_rows, make_body(False), st)
    else:
        jax.lax.fori_loop(0, n_rows, make_body(False), init)
    # drain the last two in-flight chunk DMAs
    nch = n_rows // CHUNK_ROWS

    @pl.when(nch >= 2)
    def _():
        chunk_dma(nch - 2, nch % 2).wait()

    chunk_dma(nch - 1, (nch - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret",
                                             "use_onehot", "max_dist",
                                             "hash_bits"))
def _encode_wave_raw(inp, lens, *, n_rows: int, interpret: bool,
                     use_onehot: bool, max_dist: int = MAX_DIST,
                     hash_bits: int = HASH_BITS):
    """inp int32 (n_rows + 8, 128) interleaved input words, lens
    int32 (1, 128) -> decisions int32 (n_rows, 128)."""
    kern = functools.partial(_encode_wave_kernel, n_rows=n_rows,
                             use_onehot=use_onehot, max_dist=max_dist,
                             hash_bits=hash_bits)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1 << hash_bits, LANES), jnp.int32),
                        pltpu.VMEM((2 * CHUNK_ROWS, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(inp, lens)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret",
                                             "use_onehot", "max_dist",
                                             "hash_bits"))
def _encode_wave_linked_raw(inp, lens, hist, hlen, *, n_rows: int,
                            interpret: bool, use_onehot: bool,
                            max_dist: int = MAX_DIST,
                            hash_bits: int = HASH_BITS):
    """Linked variant: hist int32 (win_rows, 128) = each lane's
    history tail (right-aligned), hlen int32 (1, 128) its byte
    length. Matches may start up to max_dist bytes before the block
    (LZ4 prefix-dict semantics)."""
    kern = functools.partial(_encode_wave_kernel, n_rows=n_rows,
                             use_onehot=use_onehot, max_dist=max_dist,
                             hash_bits=hash_bits, linked=True)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1 << hash_bits, LANES), jnp.int32),
                        pltpu.VMEM((2 * CHUNK_ROWS, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(inp, lens, hist, hlen)


def pack_history(streams: list[list[bytes]], t: int,
                 wr: int) -> tuple[np.ndarray, np.ndarray]:
    """History tails for round t: right-aligned interleaved (wr, 128)
    int32 LE words + (1, 128) byte lengths. Joins only the trailing
    blocks needed to cover wr*4 bytes — O(1) per round, not O(t)."""
    hbuf = np.zeros((LANES, wr * 4), np.uint8)
    hlen = np.zeros((1, LANES), np.int32)
    if t > 0:
        for j, s in enumerate(streams):
            parts: list[bytes] = []
            got = 0
            for b in reversed(s[:t]):
                parts.append(b)
                got += len(b)
                if got >= wr * 4:
                    break
            hs = b"".join(reversed(parts))[-(wr * 4):]
            if hs:
                hbuf[j, wr * 4 - len(hs):] = np.frombuffer(hs, np.uint8)
                hlen[0, j] = len(hs)
    hw = hbuf.reshape(LANES, wr, 4).astype(np.int32)
    hwords = np.ascontiguousarray(
        (hw[..., 0] | (hw[..., 1] << 8) | (hw[..., 2] << 16)
         | (hw[..., 3] << 24)).T)
    return hwords, hlen


def encode_wave_linked(streams: list[list[bytes]], *,
                       interpret: bool | None = None,
                       use_onehot: bool | None = None,
                       max_dist: int = MAX_DIST,
                       hash_bits: int = HASH_BITS,
                       emitter=None) -> list[list[bytes]]:
    """Encode up to 128 LINKED streams in lockstep: lane j's block t
    sees the tail of its stream's earlier bytes as history, so matches
    reach across block boundaries (LZ4_compress_fast_continue prefix
    semantics, lz4.c:1707) — the encode side of the -BD wave story.
    Returns per-stream lists of standard LZ4 block streams, each
    decodable against its predecessor's tail as dict."""
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if use_onehot is None:
        use_onehot = not interpret
    if emitter is None:
        try:
            from lz4_tpu import native
            emitter = native.blockcodec.wave_emit_decisions
        except ImportError:
            pass
    B = len(streams)
    assert B <= LANES
    rounds = max(len(s) for s in streams)
    outs: list[list[bytes]] = [[] for _ in streams]
    for t in range(rounds):
        blocks = [s[t] if t < len(s) else b"" for s in streams]
        mx = max(len(b) for b in blocks)
        n_rows = 1024
        while n_rows * 4 < mx:
            n_rows *= 4
        wr = min(max_dist // 4 + 2, n_rows + 1)
        inp, lens = pack_input(blocks, n_rows)
        hwords, hlen = pack_history(streams, t, wr)
        dec = np.asarray(_encode_wave_linked_raw(
            jnp.asarray(inp), jnp.asarray(lens), jnp.asarray(hwords),
            jnp.asarray(hlen), n_rows=n_rows, interpret=bool(interpret),
            use_onehot=bool(use_onehot), max_dist=int(max_dist),
            hash_bits=int(hash_bits)))
        decT = np.ascontiguousarray(dec.T)
        if emitter is not None:
            enc = emitter(blocks, decT[: len(blocks)])
        else:
            enc = [emit_from_decisions(b, decT[j])
                   for j, b in enumerate(blocks)]
        for j, s in enumerate(streams):
            if t < len(s):
                outs[j].append(enc[j])
    return outs


def pack_input(blocks: list[bytes], n_rows: int) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """<=128 blocks -> ((n_rows + 8, 128) int32 interleaved LE words,
    (1, 128) int32 lengths)."""
    B = len(blocks)
    assert B <= LANES
    arr = np.zeros((LANES, n_rows * 4), np.uint8)
    lens = np.zeros((1, LANES), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[0, i] = len(b)
    words = arr.reshape(LANES, n_rows, 4).astype(np.int32)
    words = (words[..., 0] | (words[..., 1] << 8)
             | (words[..., 2] << 16) | (words[..., 3] << 24))
    out = np.zeros((n_rows + 8, LANES), np.int32)
    out[:n_rows] = words.T
    return out, lens


def find_matches_batch(blocks: list[bytes], *,
                       interpret: bool | None = None,
                       use_onehot: bool | None = None,
                       max_dist: int = MAX_DIST,
                       hash_bits: int = HASH_BITS) -> np.ndarray:
    """Run the lockstep match finder over <= 128 blocks; returns the
    dense per-row decision array (n_rows, 128) int32 —
    dec[r, j] = off | (sub << 16) | ((mlen - 4) << 18) for a match of
    length mlen ending at position 4 * r + sub of block j."""
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if use_onehot is None:
        use_onehot = not interpret
    mx = max(len(b) for b in blocks)
    n_rows = 1024
    while n_rows * 4 < mx:
        n_rows *= 4
    inp, lens = pack_input(blocks, n_rows)
    dec = _encode_wave_raw(jnp.asarray(inp), jnp.asarray(lens),
                           n_rows=n_rows, interpret=bool(interpret),
                           use_onehot=bool(use_onehot),
                           max_dist=int(max_dist),
                           hash_bits=int(hash_bits))
    return np.asarray(dec)


def emit_from_decisions(block: bytes, decisions: np.ndarray) -> bytes:
    """Pure-python reference emitter (the C lz4t_wave_emit_decisions
    oracle): decisions (n_rows,) int32 for ONE block -> standard LZ4
    sequence bytes."""
    n = len(block)
    out = bytearray()
    anchor = 0
    seqs = []          # (lit_start, lit_len, off, mlen)
    for r in range(decisions.shape[0]):
        d = int(decisions[r]) & 0xFFFFFFFF   # mlen field reaches bit 31
        if not d:
            continue
        off = d & 0xFFFF
        sub = (d >> 16) & 3
        mlen = (d >> 18) + 4
        q = 4 * r + sub
        a = q - mlen
        if a >= anchor and a <= n - 12 and q <= n - 5 and off >= 1:
            # back-extension (catch-up): grow the match over preceding
            # literals at host speed (lz4.c:1104-1109 analog) — the
            # kernel only scans forward
            while a > anchor and a > off and block[a - 1] == \
                    block[a - 1 - off]:
                a -= 1
                mlen += 1
            seqs.append((anchor, a - anchor, off, mlen))
            anchor = q

    def ext(le):
        le -= 15
        while le >= 255:
            out.append(255)
            le -= 255
        out.append(le)

    for (ls, ll, off, mlen) in seqs:
        ml = mlen - 4
        out.append((min(ll, 15) << 4) | min(ml, 15))
        if ll >= 15:
            ext(ll)
        out += block[ls: ls + ll]
        out.append(off & 255)
        out.append(off >> 8)
        if ml >= 15:
            ext(ml)
    ll = n - anchor
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        ext(ll)
    out += block[anchor:]
    return bytes(out)


def encode_wave_batch(blocks: list[bytes], *,
                      interpret: bool | None = None,
                      use_onehot: bool | None = None,
                      max_dist: int = MAX_DIST,
                      hash_bits: int = HASH_BITS,
                      emitter=None) -> list[bytes]:
    """Full wave encode: device match finding + host emission (C
    emitter when available, python oracle otherwise). Returns standard
    LZ4 block streams (offsets capped at max_dist)."""
    if emitter is None:
        try:
            from lz4_tpu import native
            emitter = native.blockcodec.wave_emit_decisions
        except ImportError:
            pass
    res = []
    for g in range(0, len(blocks), LANES):
        grp = blocks[g: g + LANES]
        dec = find_matches_batch(grp, interpret=interpret,
                                 use_onehot=use_onehot,
                                 max_dist=max_dist, hash_bits=hash_bits)
        decT = np.ascontiguousarray(dec.T)
        if emitter is not None:
            res.extend(emitter(grp, decT))
        else:
            res.extend(emit_from_decisions(b, decT[i])
                       for i, b in enumerate(grp))
    return res
