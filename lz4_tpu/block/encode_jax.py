"""Vectorized LZ4 block encoder for TPU — sort/scan-structured (v2).

TPU-native redesign of LZ4_compress_generic (lz4.c:930-1338), built on
the primitives a TPU is actually fast at (docs/tpu_perf_notes.md:
sorts ~1.5 ms vs random gathers ~23 ms at 32x66K — the v1
gather/scatter formulation measured ~1 MB/s/chip, this one avoids both
almost everywhere):

  1. **Candidate discovery = ONE multi-payload sort.** Rows
     (gram, position, next-8-bytes, prev-4-bytes) are sorted by gram;
     the nearest previous occurrence of every position's 4-gram is then
     simply the *adjacent sorted row* (stable sort keeps positions
     ascending inside equal-gram groups). Forward match extension
     (+0..8 bytes) and backward extension (0..4 bytes, the catch-up of
     lz4.c:1104-1109) are elementwise XOR/byte-count compares against
     the neighbour row's carried context words. A second sort by
     position restores positional order. No gathers, exact matches.
  2. **Chain-run long matches.** If candidates advance in lockstep
     (c(p+1) == c(p)+1) for r consecutive positions, bytes
     [p, p+r+3) match exactly — a reverse cummin gives r in O(n) and
     captures RLE/periodic regions at full length.
  3. **Greedy parse = token-hop scan.** Literal runs are skipped via a
     next-match-position reverse cummin, so the cursor only stops at
     matches: a lax.scan of cap_n/4 steps, each a per-block 1-element
     gather (~0.7 us/step, independent of batch width), collects the
     token list [T] directly.
  4. **Emission = merge-by-sort.** Sequence rows (keyed by their output
     offset, carrying all fields) are merged with output-byte rows
     (keyed by byte position) in one stable sort; a last-valid
     associative scan propagates each sequence's fields to the bytes
     it covers; a second sort extracts the bytes in order. The final
     literal-only sequence is just one more merged row. The only
     remaining random gather is the literal-byte fetch.

Output bytes need not equal the reference's byte-for-byte (many valid
encodings exist); they decode bit-exactly with any LZ4 decoder, and the
exact sorted matcher typically beats the reference's lossy hash table
on compressed size.

Dictionary/linked-block support mirrors LZ4_compress_fast_continue's
prefix mode (lz4.c:1707-1783): an optional right-aligned 64 KB history
buffer precedes the source; matches may start inside it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lz4_tpu.constants import (
    LASTLITERALS,
    LZ4_DISTANCE_MAX,
    MFLIMIT,
    MINMATCH,
    compress_bound,
)

DICT_CAP = 65536     # static history window capacity (64 KB)

#: carried forward-context words in the match sort (ext cap = 4*NW).
#: Each word is a payload lane on the dominant sort (~1-2 ms/pass at
#: 32x66K). With the token-merge pass (stage 4) recombining
#: context-capped matches, graded sizes vs reference level 1:
#: NW=5 -> real48 0.991, text 0.927, mixed 0.907 (NW=4 is 1.0016 on
#: the 8 MB real slice — just over the bar), so the default drops to 5
#: (two fewer payload lanes than r2's 7); env knob for A/B.
import os as _os
ENC_NW = int(_os.environ.get("LZ4_TPU_ENC_NW", "5"))

#: carry the 2 back-extension context words (the catch-up analog of
#: lz4.c:1104-1109) on the GREEDY graphs too. Measured redundant there:
#: whenever bytes extend backward from a match at q, position q-1 has a
#: 4-gram match of its own, so the greedy parse (next-match table)
#: already stops at the backmost extendable position — compressed bytes
#: are IDENTICAL with the lanes off across real/text/mixed corpora.
#: Only lazy demotion (the HC tier) can land the parse mid-run, so only
#: that graph carries the lanes by default (0.8-1.2% size there).
ENC_BK = _os.environ.get("LZ4_TPU_ENC_BK", "0") != "0"


def _shift_left(a, k, fill):
    """a shifted toward lower indices: out[i] = a[i+k]."""
    if k == 0:
        return a
    return jnp.concatenate([a[k:], jnp.full((k,), fill, a.dtype)])


def _shift_right(a, k, fill):
    """a shifted toward higher indices: out[i] = a[i-k]."""
    if k == 0:
        return a
    return jnp.concatenate([jnp.full((k,), fill, a.dtype), a[:-k]])


def _low_zero_bytes(x):
    """#matching low bytes (0..3) of a uint32 XOR value; only used when
    x != 0 (x == 0 is handled by the caller)."""
    b0 = (x & jnp.uint32(0xFF)) == 0
    b1 = (x & jnp.uint32(0xFFFF)) == 0
    b2 = (x & jnp.uint32(0xFFFFFF)) == 0
    return b0.astype(jnp.int32) + b1.astype(jnp.int32) + b2.astype(jnp.int32)


def _high_zero_bytes(x):
    """#matching high bytes (0..4) of a uint32 XOR value."""
    h0 = (x & jnp.uint32(0xFF000000)) == 0
    h1 = (x & jnp.uint32(0xFFFF0000)) == 0
    h2 = (x & jnp.uint32(0xFFFFFF00)) == 0
    z = x == 0
    return (h0.astype(jnp.int32) + h1.astype(jnp.int32)
            + h2.astype(jnp.int32) + z.astype(jnp.int32))


# ---------------------------------------------------------------------------
# single-block encode (vmapped over a batch by encode_blocks)
# ---------------------------------------------------------------------------

def _match_tables(src, n, dict_buf, dict_len, *, cap_n: int,
                  has_dict: bool, n_cand: int = 2, lazy: bool = False,
                  lite: bool = False):
    """Stages 1-2 for one block: sorted-space match discovery, candidate
    scoring, chain-run extension, lazy arbitration, and the parse-scan
    lookup tables. src: uint8[cap_n] zero-padded; n: int32 actual length.
    dict_buf: uint8[DICT_CAP] right-aligned history; dict_len: int32.
    n_cand > 1 scores that many sorted-space candidates per position and
    lazy enables one-step-chained lazy arbitration — together these form
    the device HC tier (the batched-candidate analog of the reference's
    nbSearches ladder + lazy parse, lz4hc.c:92-106, 1157-1310).
    Returns (nm_ext, packed_ext, off_ext) int32[N+1]."""
    d0 = DICT_CAP if has_dict else 0
    buf = jnp.concatenate([dict_buf, src]) if has_dict else src
    N = buf.shape[0]
    cap_out = compress_bound(cap_n)
    n = n.astype(jnp.int32)
    dlen = dict_len.astype(jnp.int32) if has_dict else jnp.int32(0)
    lo = jnp.int32(d0) - dlen            # first valid history byte
    end = jnp.int32(d0) + n              # one past last source byte

    idx = jnp.arange(N, dtype=jnp.int32)
    b32 = buf.astype(jnp.uint32)

    # ---- stage 1: sorted-space candidates + bounded extensions ----------
    # carried forward-context depth: real-file corpora measure at or
    # under reference size down to ext cap 20 (5 words) with 2 scored
    # candidates — the old 3-word/1-candidate config lost 6% (the length
    # tail of non-lockstep matches was truncated); each word is a sort
    # payload lane (~1-2 ms/pass at 32x66K), so NW is the speed knob
    NW = 2 if lite else ENC_NW
    w = (b32
         | (_shift_left(b32, 1, 0) << 8)
         | (_shift_left(b32, 2, 0) << 16)
         | (_shift_left(b32, 3, 0) << 24))
    fwd = [_shift_left(w, 4 * (j + 1), 0) for j in range(NW)]
    if lite or not (lazy or ENC_BK):
        # acceleration graph (--fast on device): the fixed-cost analog
        # of the reference's skip heuristic (lz4.c:711, 1023-1053) is
        # shedding sort payload lanes — shallow extension words, no
        # back-extension words. Ratio drops a little; the dominant
        # multi-payload sort gets much lighter.
        srt = jax.lax.sort((w, idx, *fwd), num_keys=1, is_stable=True)
        sk, spos = srt[0], srt[1]
        sfwd = srt[2:]
        swb = swb2 = None
    else:
        wb = _shift_right(w, 4, 0)       # gram at p-4 (byte p-1 in MSB)
        wb2 = _shift_right(w, 8, 0)      # gram at p-8
        srt = jax.lax.sort((w, idx, *fwd, wb, wb2), num_keys=1,
                           is_stable=True)
        sk, spos = srt[0], srt[1]
        sfwd = srt[2: 2 + NW]
        swb, swb2 = srt[2 + NW], srt[3 + NW]

    def neighbour_fields(i):
        """Match fields vs the candidate i rows back in sorted space:
        (candidate position or -1, ext bytes 0..4*NW beyond the 4-gram,
        back-extension bytes 0..8)."""
        same_i = jnp.concatenate([jnp.zeros(i, bool), sk[i:] == sk[:-i]])
        cand_i = _shift_right(spos, i, 0)
        ext_i = jnp.zeros_like(cand_i)
        ok = same_i
        for sw in sfwd:
            x = sw ^ _shift_right(sw, i, 0)
            ext_i = jnp.where(ok, ext_i + jnp.where(x == 0, 4,
                                                    _low_zero_bytes(x)),
                              ext_i)
            ok = ok & (x == 0)
        if swb is None:
            bk_i = jnp.zeros_like(cand_i)
        else:
            xb = swb ^ _shift_right(swb, i, 0)
            xb2 = swb2 ^ _shift_right(swb2, i, 0)
            bk_i = _high_zero_bytes(xb)
            bk_i = jnp.where(xb == 0, 4 + _high_zero_bytes(xb2), bk_i)
            # wb/wb2 are zero-FILL (not real bytes) for source positions
            # < 4 / < 8, and fill-vs-fill XOR reads as "bytes match": a
            # candidate near the buffer start would get a spurious
            # back-extension (corrupt matches on real data — r2
            # regression test test_block_start_back_extension). Cap by
            # how many real back-bytes the candidate's words actually
            # carry; cand < pos, so the candidate is the binding side.
            bk_i = jnp.minimum(bk_i, jnp.where(cand_i >= 8, 8,
                               jnp.where(cand_i >= 4, 4, 0)))
        # window validity is positional (lo is traced): candidates in
        # sorted space know both positions, so check distance here
        dist = spos - cand_i
        ok = same_i & (cand_i >= lo) & (dist >= 1) \
            & (dist <= LZ4_DISTANCE_MAX)
        cand_i = jnp.where(ok, cand_i, jnp.int32(-1))
        return cand_i, ext_i, bk_i

    cand_s, ext_s, bk_s = neighbour_fields(1)
    # HC tier: score deeper sorted-space candidates; longest forward
    # extension wins, nearest wins ties (it chains into long runs)
    for i in range(2, n_cand + 1):
        cand_j, ext_j, bk_j = neighbour_fields(i)
        better = (cand_j >= 0) & ((cand_s < 0) | (ext_j > ext_s))
        cand_s = jnp.where(better, cand_j, cand_s)
        ext_s = jnp.where(better, ext_j, ext_s)
        bk_s = jnp.where(better, bk_j, bk_s)
    # single payload lane for the back-sort: (cand+1):18 | ext:5 | bk:4
    # (N <= 128K+pad on the 64 KB tier graphs, ext <= 4*NW = 28, bk <= 8)
    pack_s = (cand_s + 1) | (ext_s << 18) | (bk_s << 23)

    # ---- stage 2: restore position order (sort by position) -------------
    _, pk = jax.lax.sort((spos, pack_s), num_keys=1, is_stable=True)
    cand = (pk & ((1 << 18) - 1)) - 1
    ext = (pk >> 18) & 31
    bk4 = pk >> 23

    valid = cand >= 0            # window/distance checked in sorted space

    # chain-run lengths (lockstep candidates => exact long matches)
    cand_next = _shift_left(cand, 1, jnp.int32(-1))
    ch = valid & (idx + 1 <= end - 4) & (cand_next == cand + 1)
    nc = jax.lax.cummin(jnp.where(~ch, idx, jnp.int32(N)), axis=0,
                        reverse=True)
    ml = jnp.where(valid,
                   jnp.maximum(nc - idx + MINMATCH, MINMATCH + ext), 0)
    ml = jnp.minimum(ml, end - LASTLITERALS - idx)
    is_match = (valid & (idx >= d0) & (idx <= end - MFLIMIT)
                & (ml >= MINMATCH))
    if lazy:
        # chained one-step lazy arbitration (HC tier): a match is demoted
        # when the very next position holds a strictly longer one — the
        # parse then stops at locally-best matches only (the batched
        # analog of the reference's Search2/Search3 overlap arbitration,
        # lz4hc.c:1157-1310)
        ml_next = _shift_left(ml, 1, 0)
        match_next = _shift_left(is_match, 1, False)
        demote = is_match & match_next & (ml_next > ml)
        is_match = is_match & ~demote

    # ---- parse-scan lookup tables ---------------------------------------
    # next match position at/after p (literal runs are skipped in O(1))
    nm = jax.lax.cummin(jnp.where(is_match, idx, jnp.int32(N)), axis=0,
                        reverse=True)
    nm_ext = jnp.concatenate([nm, jnp.array([N], jnp.int32)])
    # ml of that next match (reverse last-valid fill): pairing it with nm
    # lets the parse hop read BOTH its successor and the successor's step
    # in ONE dependent take — the take chain is the entire scan cost
    # (docs/tpu_perf_notes.md: ~0.7 us per take, unrolling doesn't help)

    def last_valid_rt(a, b):
        keep = b[1]
        return (jnp.where(keep, b[0], a[0]), a[1] | b[1])

    nm_ml, _ = jax.lax.associative_scan(
        last_valid_rt, (ml, is_match), reverse=True)
    nm_ml = jnp.where(nm < N, nm_ml, 0)
    nm_ml_ext = jnp.concatenate([nm_ml, jnp.array([0], jnp.int32)])
    off = jnp.where(valid, idx - cand, 0)
    # clamp back-extension by window start (anchor clamp happens later)
    bk4 = jnp.minimum(bk4, jnp.maximum(cand - lo, 0))
    packed = (ml | (jnp.minimum(bk4, 8) << 18)
              | jnp.int32(0))            # ml:18 bits, bk:4 bits
    packed_ext = jnp.concatenate([packed, jnp.array([0], jnp.int32)])
    off_ext = jnp.concatenate([off, jnp.array([0], jnp.int32)])
    return nm_ext, nm_ml_ext, packed_ext, off_ext


# ---------------------------------------------------------------------------
# stage 3: batched token-hop parse (explicitly batched — NOT vmapped —
# so the chunked early-exit loop keeps scalar chunk indices; see
# decode_jax._parse_tokens for the pattern rationale)
# ---------------------------------------------------------------------------

#: parse-scan chunk size (see decode_jax.PARSE_CHUNK)
PARSE_CHUNK = 1024


def _parse_hops(nm_ext, nm_ml_ext, *, d0: int, cap_n: int):
    """The greedy token-hop walk for all B blocks: literal runs are
    skipped via the next-match table, so the cursor only stops at
    matches. Each step is ONE dependent per-block take (~0.7us,
    independent of batch width): the lookup table pairs (nm[i],
    ml[nm[i]]) along a minor axis, so one take yields both the next
    match position and the step length needed for the hop after it.
    Chunked under an early-exit while_loop: real-data match counts are
    well below the worst-case bound T = cap_n/4, and the batch lives
    inside the loop carry so the per-chunk record write is an in-place
    dynamic_update_slice (the per-step batched-DUS variant measured 16x
    slower — docs/tpu_perf_notes.md).
    nm_ext/nm_ml_ext: int32[B, N+1]. Returns tokpos int32[B, T]."""
    B, N1 = nm_ext.shape
    N = N1 - 1
    T = cap_n // MINMATCH + 2            # max #matches per block
    CH = PARSE_CHUNK
    n_chunks = -(-T // CH)
    Tpad = n_chunks * CH

    # pair-interleaved table (B, 2(N+1)): tab[:, 2i] = nm[i],
    # tab[:, 2i+1] = ml[nm[i]] — the pair is fetched with ONE per-row
    # dynamic slice of 2 adjacent elements. Interleaving keeps the big
    # axis minor (lane-dim 2 arrays tile catastrophically on TPU).
    tab = jnp.stack([nm_ext, nm_ml_ext], axis=-1).reshape(B, 2 * N1)

    def rd_pair(j):
        g = jax.vmap(lambda t, s: jax.lax.dynamic_slice(t, (s,), (2,)))(
            tab, 2 * j)
        return g[:, 0], g[:, 1]

    def hop(carry, _):
        cur, step = carry
        nxt, step2 = rd_pair(jnp.minimum(cur + step, N))
        return (nxt, step2), cur

    def cond(state):
        (cur, _), _, k = state
        return jnp.any(cur < N) & (k < n_chunks)

    def body(state):
        carry, buf, k = state
        carry, recs = jax.lax.scan(hop, carry, None, length=CH)
        buf = jax.lax.dynamic_update_slice(buf, recs, (k * CH, 0))
        return carry, buf, k + 1

    cur0 = nm_ext[:, d0]
    step0 = nm_ml_ext[:, d0]
    # unwritten rows must read as "no token": initialize to N. The
    # 0*cur0 term ties the initial carry to the (possibly sharded)
    # inputs so its varying-axes type matches the loop output under
    # shard_map (XLA folds it away otherwise).
    buf0 = jnp.full((Tpad, B), N, jnp.int32) + 0 * cur0[None, :]
    (_, _), buf, _ = jax.lax.while_loop(cond, body,
                                        ((cur0, step0), buf0, jnp.int32(0)))
    return buf[:T].T


# ---------------------------------------------------------------------------
# stages 4-5 (vmapped): per-token fields + emission
# ---------------------------------------------------------------------------

def _emit_one(src, n, dict_buf, dict_len, tokpos, packed_ext, off_ext, *,
              cap_n: int, has_dict: bool):
    """Emission for one block given its parsed token positions.
    Returns (out uint8[cap_out], csize int32, trailing int32)."""
    d0 = DICT_CAP if has_dict else 0
    buf = jnp.concatenate([dict_buf, src]) if has_dict else src
    N = buf.shape[0]
    cap_out = compress_bound(cap_n)
    n = n.astype(jnp.int32)
    end = jnp.int32(d0) + n              # one past last source byte
    idx = jnp.arange(N, dtype=jnp.int32)
    b32 = buf.astype(jnp.uint32)
    tmask = tokpos < N

    # ---- stage 4: per-token fields (2 batched gathers + elementwise) ----
    g1 = jnp.take(packed_ext, tokpos)
    ml_t = g1 & ((1 << 18) - 1)
    bk_t = g1 >> 18
    off_t = jnp.take(off_ext, tokpos)

    # ---- token merge: collapse continuation chains ----------------------
    # When the carried forward-context caps a match's measured length,
    # the greedy cursor lands exactly at the truncation point and (for
    # run-structured data) finds the SAME-offset continuation there; the
    # parse then emits k sequences where one suffices, costing ~3 bytes
    # each. Collapse maximal chains (contiguous, equal offset, zero
    # intervening literals) into their head token with the summed match
    # length — two segmented scans, no gathers. This also lets the
    # stage-1 sort carry fewer context words for the same output.
    prev_end = _shift_right(jnp.where(tmask, tokpos + ml_t, -1), 1, -1)
    prev_off = _shift_right(off_t, 1, 0)
    cont = tmask & (prev_end == tokpos) & (prev_off == off_t)
    head = tmask & ~cont

    def seg_sum(a, b):
        # segmented running sum of ml: reset at heads
        return (jnp.where(b[1], b[0], a[0] + b[0]), a[1] | b[1])

    run, _ = jax.lax.associative_scan(seg_sum, (ml_t, head))
    # a token is its segment's last if the NEXT row starts a new
    # segment or is padding
    is_last = tmask & _shift_left(head | ~tmask, 1, True)

    def last_from_right(a, b):
        keep = b[1]
        return (jnp.where(keep, b[0], a[0]), a[1] | b[1])

    total, _ = jax.lax.associative_scan(
        last_from_right, (jnp.where(is_last, run, 0), is_last),
        reverse=True)
    ml_t = jnp.where(head, total, 0)
    tmask = head

    tok_end = jnp.where(tmask, tokpos + ml_t, jnp.int32(d0))
    anchor = jnp.concatenate([jnp.array([d0], jnp.int32), tok_end[:-1]])
    anchor = jax.lax.cummax(anchor, axis=0)    # masked rows carry forward
    bk_eff = jnp.clip(jnp.minimum(bk_t, tokpos - anchor), 0, None)
    L = jnp.where(tmask, tokpos - bk_eff - anchor, 0)
    M4 = jnp.where(tmask, ml_t + bk_eff - MINMATCH, 0)
    base = jnp.where(tmask, anchor, 0)

    def ext_count(v):
        return jnp.where(v < 15, 0, 1 + (v - 15) // 255)

    el = ext_count(L)
    em = ext_count(M4)
    seq_bytes = jnp.where(tmask, 1 + el + L + 2 + em, 0)
    csum = jnp.cumsum(seq_bytes)
    out_start = csum - seq_bytes
    total_seq = csum[-1]

    # final literal-only sequence as one more row
    fanchor = jnp.maximum(jnp.int32(d0), jnp.max(tok_end))
    FL = end - fanchor
    fel = ext_count(FL)
    csize = total_seq + 1 + fel + FL

    # ---- stage 5: emission (merge-by-sort + last-valid scan) ------------
    # per-sequence fields packed into two words to slim the sort
    # payloads: L|el<<18 (L<2^18, el<2^10 on 64KB tiers) and
    # off|M4<<16 (both 16-bit; M4 <= 65535 since ml <= cap-5, bk <= 8)
    o = jnp.arange(cap_out, dtype=jnp.int32)
    BIG = jnp.int32(2 * cap_out + 4)

    srow_key = jnp.where(tmask, out_start, BIG)
    srow_key = jnp.concatenate([srow_key, total_seq[None]])   # final row
    sLel = jnp.concatenate([L | (el << 18), (FL | (fel << 18))[None]])
    soffM4 = jnp.concatenate([(off_t * tmask) | (M4 << 16),
                              jnp.array([0], jnp.int32)])
    sbase = jnp.concatenate([base, fanchor[None]])

    # merged rows: sequences (tag 0) then bytes (tag 1); equal output
    # offset sorts the sequence row first. The sequence's output start
    # does NOT ride the sort: after the stable sort the byte-count
    # cumsum AT a sequence row equals its output start (every byte row
    # with a smaller coordinate sorts before it), so it is reconstructed
    # post-sort and propagated by the same last-valid scan.
    mkey = jnp.concatenate([
        jnp.minimum(srow_key, BIG) * 2,
        o * 2 + 1,
    ])
    zpad = jnp.zeros(cap_out, jnp.int32)
    f_Lel = jnp.concatenate([sLel, zpad])
    f_offM4 = jnp.concatenate([soffM4, zpad])
    f_base = jnp.concatenate([sbase, zpad])
    (smk, g_Lel, g_offM4, g_base) = jax.lax.sort(
        (mkey, f_Lel, f_offM4, f_base),
        num_keys=1, is_stable=True)

    is_byte = (smk & 1) == 1
    cs = jnp.cumsum(is_byte.astype(jnp.int32))
    prov = jnp.where(is_byte, jnp.int32(-1), cs)

    def last_valid(a, b):
        keep = b[0] >= 0
        return tuple(jnp.where(keep, y, x) for x, y in zip(a, b))

    (p_start, p_Lel, p_offM4, p_base) = jax.lax.associative_scan(
        last_valid, (prov, g_Lel, g_offM4, g_base))

    # ---- per-byte value computation, in MERGED order ---------------------
    # byte rows appear in output order among themselves, so rank IS the
    # output coordinate; every byte value except the literal fetch is
    # elementwise here, and ONE packed lane (q:17 | val:8 | is_lit:1)
    # rides the back-sort.
    om = cs - 1                       # o at byte rows
    t = om - p_start
    L_o = p_Lel & ((1 << 18) - 1)
    el_o = p_Lel >> 18
    off_o = p_offM4 & 0xFFFF
    M4_o = (p_offM4 >> 16) & 0xFFFF
    nfull = jnp.maximum(L_o - 15, 0) // 255
    mfull = jnp.maximum(M4_o - 15, 0) // 255

    token_byte = (jnp.minimum(L_o, 15) << 4) | jnp.minimum(M4_o, 15)
    litext_byte = jnp.where(t - 1 < nfull, 255, L_o - 15 - 255 * nfull)
    off_lo_byte = off_o & 0xFF
    off_hi_byte = off_o >> 8
    matext_byte = jnp.where(t - (3 + el_o + L_o) < mfull, 255,
                            M4_o - 15 - 255 * mfull)
    lit_end = 1 + el_o + L_o
    val_nonlit = jnp.where(
        t == 0, token_byte,
        jnp.where(t < 1 + el_o, litext_byte,
                  jnp.where(t == lit_end, off_lo_byte,
                            jnp.where(t == lit_end + 1, off_hi_byte,
                                      matext_byte)))) & 0xFF
    # literal fetch: the source indices are monotone across o (strictly
    # increasing over literal bytes), so a merge-by-sort replaces the
    # (slow) random gather
    is_lit_byte = is_byte & (t >= 1 + el_o) & (t < lit_end)
    q_m = jax.lax.cummax(jnp.where(
        is_lit_byte, jnp.clip(p_base + (t - 1 - el_o), 0, N - 1), 0))
    packed_m = q_m | (val_nonlit << 17) \
        | (is_lit_byte.astype(jnp.int32) << 25)

    # extract byte rows in output order (sequence rows park at the end)
    bkey = jnp.where(is_byte, cs - 1, BIG)
    (_, pk_o) = jax.lax.sort((bkey, packed_m), num_keys=1, is_stable=True)
    pk_o = pk_o[:cap_out]
    q = pk_o & ((1 << 17) - 1)
    val8 = (pk_o >> 17) & 0xFF
    is_lit_o = ((pk_o >> 25) & 1).astype(bool)

    key3 = jnp.concatenate([idx * 2, jnp.clip(q, 0, N - 1) * 2 + 1])
    vals3 = jnp.concatenate([b32.astype(jnp.int32) + 1, zpad])  # +1: valid
    smk3, v_s = jax.lax.sort((key3, vals3), num_keys=1, is_stable=True)
    filled, = jax.lax.associative_scan(
        lambda a, b: (jnp.where(b[0] > 0, b[0], a[0]),), (v_s,))
    is_byte3 = (smk3 & 1) == 1
    rank3 = jnp.cumsum(is_byte3.astype(jnp.int32)) - 1
    bkey3 = jnp.where(is_byte3, rank3, BIG)
    _, lit_sorted = jax.lax.sort((bkey3, filled), num_keys=1,
                                 is_stable=True)
    lit_byte = lit_sorted[:cap_out] - 1
    val = jnp.where(is_lit_o, lit_byte, val8)
    out = jnp.where(o < csize, val, 0).astype(jnp.uint8)
    # trailing literal-run length: the engine's segmented big-block path
    # folds it across segment seams (parallel/engine.py)
    return out, csize, FL


@functools.partial(jax.jit, static_argnames=("cap_n", "has_dict",
                                             "n_cand", "lazy", "lite"))
def encode_blocks(src, lens, dict_bufs, dict_lens, *, cap_n: int,
                  has_dict: bool, n_cand: int = 2, lazy: bool = False,
                  lite: bool = False):
    """Batched block encode.

    src:       uint8[B, cap_n]    zero-padded source blocks
    lens:      int32[B]
    dict_bufs: uint8[B, 65536]    right-aligned history (ignored unless
                                  has_dict)
    dict_lens: int32[B]
    n_cand/lazy: device HC tier (see _encode_one)
    returns (out uint8[B, compress_bound(cap_n)], csizes int32[B],
             trailing int32[B] — final literal-run length per block)
    """
    if cap_n > 65536:
        # emission packs M4 into 16 bits and L/el into 18/14 — exactly
        # the 64 KB tier's ranges. Larger tiers must use the segmented
        # big-block path (engine-level), never this graph: a long match
        # would silently wrap the packed fields into well-formed-looking
        # corrupt output (ADVICE r1, medium).
        raise NotImplementedError(
            "device encode graph is 64KB-tier only; larger tiers are "
            "segmented at the engine level")
    mt = functools.partial(_match_tables, cap_n=cap_n, has_dict=has_dict,
                           n_cand=n_cand, lazy=lazy, lite=lite)
    nm_ext, nm_ml_ext, packed_ext, off_ext = jax.vmap(mt)(
        src, lens, dict_bufs, dict_lens)
    d0 = DICT_CAP if has_dict else 0
    tokpos = _parse_hops(nm_ext, nm_ml_ext, d0=d0, cap_n=cap_n)
    em = functools.partial(_emit_one, cap_n=cap_n, has_dict=has_dict)
    return jax.vmap(em)(src, lens, dict_bufs, dict_lens, tokpos,
                        packed_ext, off_ext)


# ---------------------------------------------------------------------------
# convenience host API (bytes in/out) used by tests and the engine
# ---------------------------------------------------------------------------

def _pad_cap(n: int) -> int:
    """Bucketize capacities to limit recompilation."""
    cap = 256
    while cap < n:
        cap *= 2
    return cap


def encode_blocks_host(blocks, dict_prefixes=None, *, n_cand=2,
                       lazy=False, lite=False):
    """Compress a list of raw blocks via the vectorized TPU path.
    Returns list[bytes] (raw LZ4 block streams, possibly longer than the
    input — caller applies the stored-block fallback)."""
    if not blocks:
        return []
    cap_n = _pad_cap(max(len(b) for b in blocks))
    B = len(blocks)
    src = np.zeros((B, cap_n), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, b in enumerate(blocks):
        src[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    has_dict = dict_prefixes is not None and any(d for d in dict_prefixes)
    dict_bufs = np.zeros((B, DICT_CAP), np.uint8)
    dict_lens = np.zeros(B, np.int32)
    if has_dict:
        for i, d in enumerate(dict_prefixes):
            if d:
                d = bytes(d)[-DICT_CAP:]
                dict_bufs[i, DICT_CAP - len(d):] = np.frombuffer(d, np.uint8)
                dict_lens[i] = len(d)
    out, csizes, _ = encode_blocks(
        jnp.asarray(src), jnp.asarray(lens), jnp.asarray(dict_bufs),
        jnp.asarray(dict_lens), cap_n=int(cap_n), has_dict=bool(has_dict),
        n_cand=n_cand, lazy=lazy, lite=lite)
    out = np.asarray(out)
    csizes = np.asarray(csizes)
    return [out[i, : csizes[i]].tobytes() for i in range(B)]
