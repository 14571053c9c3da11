"""Vectorized LZ4 block decoder for TPU — sort/scan-structured (v2).

TPU-native redesign of LZ4_decompress_generic (lz4.c:2022-2445), built
on the primitives a TPU is fast at (docs/tpu_perf_notes.md): the v1
design speculatively parsed EVERY byte position and recovered the token
set with scatter/gather pointer doubling, which XLA serializes on TPU
(~1 MB/s). v2:

  1. **Token parse = lax.scan.** The sequence cursor walk is the only
     irreducibly serial part; each step costs a handful of per-block
     1-element gathers (~ a few us, independent of batch width), aided
     by one structural precompute (next-non-255-byte reverse cummin for
     the 255-chained length extensions). The scan emits the per-token
     records (literal start/len, offset, match len) directly.
  2. **Placement = cumsum** over tokens; bounds/window/offset checks
     become elementwise error reductions (the analog of the reference's
     negative return codes; never reads/writes out of bounds).
  3. **Byte routing = merge-by-sort.** Token rows keyed by their output
     start merge with output-byte rows in one stable sort; a last-valid
     associative scan gives every output byte its covering token's
     fields; a second sort restores byte order.
  4. **Match resolution = convergence-bounded pointer doubling.**
     Output bytes form source chains (match-of-match, incl. RLE
     overlap); ptr <- ptr[ptr] doubles the resolved depth per round, so
     a while_loop exits after log2(max chain depth) rounds (typically
     3-5 on real data; 17 worst-case for 64 KB RLE).

Dictionary/linked-block support: an optional 64 KB history buffer
(right-aligned) occupies negative output coordinates, giving
LZ4_decompress_safe_usingDict semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lz4_tpu.constants import LZ4_DISTANCE_MAX, MINMATCH

DICT_CAP = 65536  # static history window capacity (64 KB)

#: unrolled token-level offset-composition rounds before the byte chase
#: (each is ~2 token-width sorts; each saved chase round is a full-width
#: gather). Round-3 on-device A/B (tools/session_comprounds.py, real
#: corpus, B=32 x 64KB): 0 rounds 6.2 MB/s vs 3 rounds 5.5 MB/s — with
#: literals entering the chase pre-resolved and the analytic intra-token
#: escape, the chase is cheaper than the token sorts composition costs,
#: so the default is OFF; env-overridable for process-level A/B.
import os as _os
COMP_ROUNDS = int(_os.environ.get("LZ4_TPU_DECODE_COMP_ROUNDS", "0"))

#: leading full-width chase rounds executed as merge-by-sort doubling
#: (two 1-payload-lane sorts + a fill scan per round, straight-line
#: graph code) instead of the serialized full-width take. The plain
#: sort_gather A/B measured ~equal to the take (3-lane sorts), but the
#: chase round only needs ONE shared payload lane (provider value /
#: consumer slot), cutting the sort cost below the take. Default OFF
#: until the on-device A/B validates lowering + speed (the r1
#: composition bug was sorts under fori_loop; these rounds are
#: unrolled straight-line, the safe pattern).
CHASE_SORT_ROUNDS = int(_os.environ.get("LZ4_TPU_DECODE_SORT_CHASE", "0"))

#: straggler-chase formulation: rank-space compacted doubling renames
#: the unresolved rows into dense rank coordinates once and doubles
#: inside the compacted array — no per-round scatter, and the
#: full-width phase-1 threshold rises to cap_out/2 because compacted
#: rounds are cheap. Default OFF until the on-device A/B
#: (tools/session_chase.py) lands; "1" enables it.
CHASE_RANK = _os.environ.get("LZ4_TPU_DECODE_RANK_CHASE", "0") != "0"

#: measurement-only override of the chase round bound (tools/fullbench
#: decode stage split): 0 skips both chase loops entirely so the
#: (parse + routing + literal-merge + materialize) floor is timeable in
#: isolation. None = normal operation. Output is garbage when set.
CHASE_RMAX_OVERRIDE = None


def sort_gather(values, idx):
    """out[i] = values[idx[i]] as a merge-by-sort: providers
    (j, values[j]) and consumers (idx[i], i) merge on one sorted key
    with a provider-first tag bit; a last-provider-value fill hands
    every consumer its element; a second sort restores consumer order.
    idx must be pre-clipped to [0, N).

    Measured on TPU (tools/fullbench.py): ~21 ms per 32x64K pass — the
    same cost as XLA's serialized gather, so the decode hot path uses
    plain takes; this stays as the measured alternative and for
    platforms where sorts beat gathers harder."""
    N = values.shape[0]
    K = idx.shape[0]
    jar = jnp.arange(N, dtype=jnp.int32)
    iar = jnp.arange(K, dtype=jnp.int32)
    key = jnp.concatenate([jar * 2, idx * 2 + 1])
    val = jnp.concatenate([values, jnp.zeros(K, values.dtype)])
    slot = jnp.concatenate([jnp.full(N, -1, jnp.int32), iar])
    _, sv, ss = jax.lax.sort((key, val, slot), num_keys=1, is_stable=True)

    def last_provider(a, b):
        # (value, has_provider): segment value = last provider value;
        # the flag lane keeps the combine associative
        keep = b[1]
        return (jnp.where(keep, b[0], a[0]), a[1] | b[1])

    filled, _ = jax.lax.associative_scan(last_provider, (sv, ss < 0))
    ckey = jnp.where(ss >= 0, ss, jnp.int32(N + K))
    _, out = jax.lax.sort((ckey, filled), num_keys=1, is_stable=True)
    return out[:K]


# ---------------------------------------------------------------------------
# batched sequence parse (explicitly batched — NOT vmapped — so the
# chunked early-exit loop below keeps scalar chunk indices)
# ---------------------------------------------------------------------------

#: parse-scan chunk: the serial cursor walk runs in chunks of this many
#: sequences under an early-exit while_loop. Real-data token counts are
#: 2-4x below the worst-case bound T = cap_in/3, so most chunks never
#: execute. The batch dimension lives INSIDE the loop carry: the chunk
#: index stays a scalar, the per-chunk dynamic_update_slice is an
#: in-place update of a loop-carried buffer — unlike the per-step
#: batched-DUS variant that measured 16x slower (docs/tpu_perf_notes.md).
PARSE_CHUNK = 1024


def _parse_tokens(comp, comp_lens, *, cap_out: int, partial: bool):
    """Walk every block's sequence stream (the only irreducibly serial
    part of decode; reference byte-serial analog: the main decode loop of
    lz4.c:2022-2445). comp: uint8[B, cap_in]; returns per-token records
    (lit_starts, litlens, offs, mlens) int32[B, T] plus err/seen_last
    bool[B].

    Structural precomputes (all elementwise/scan — no gathers):
      nn[i]  = next non-255 byte position at/after i (255-chain ends)
      vnn[i] = the byte AT nn[i] (reverse last-valid fill)
      A[i]   = nn[i] | vnn[i] << SH   — one take serves a whole
               length-extension chain read (position + final byte);
               SH sized to the tier (position bits + 8 value bits <= 31,
               so every frame tier up to 4 MB fits in int32)
      W[i]   = c[i] | c[i+1] << 8     — one take serves the 2-byte
               offset read
      G[i]   = (c[i], A[i+1])         — 2-lane minor axis: ONE take at p
               yields the token byte AND the literal-extension info
      H[i]   = (W[i], A[i+2])         — ONE take at lit_end yields the
               offset word AND the match-extension info
    This packs the parse step's 7 dependent 1-element gathers into 2
    (the serial take chain IS the parse cost, ~0.7 us each).
    """
    B, cap_in = comp.shape
    SH = max(17, int(cap_in).bit_length())
    idx = jnp.arange(cap_in, dtype=jnp.int32)
    c32 = comp.astype(jnp.int32)
    M = comp_lens.astype(jnp.int32)

    nn = jax.lax.cummin(
        jnp.where(c32 != 255, idx[None, :], jnp.int32(cap_in)),
        axis=1, reverse=True)

    def last_valid_rt(a, b):
        keep = b[1]
        return (jnp.where(keep, b[0], a[0]), a[1] | b[1])

    vnn, _ = jax.lax.associative_scan(
        last_valid_rt, (c32, c32 != 255), reverse=True, axis=1)
    vnn = jnp.where(nn < cap_in, vnn, 0)
    A = nn | (vnn << SH)

    # sentinel rows (q=cap_in, byte 0) for reads past the buffer end —
    # such reads only feed rows that are then masked done/bad/is_last
    pad = jnp.full((B, 1), cap_in, jnp.int32)
    A_ext = jnp.concatenate([A, pad, pad], axis=1)       # (B, cap_in+2)
    W = c32 | (jnp.concatenate(
        [c32[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1) << 8)
    # pair-interleaved parse tables (B, 2*cap_in): one per-row dynamic
    # slice of 2 adjacent elements fetches both values at one address
    # (interleaving keeps the big axis minor — a trailing lane dim of 2
    # tiles catastrophically on TPU)
    G = jnp.stack([c32, A_ext[:, 1: cap_in + 1]], axis=-1) \
        .reshape(B, 2 * cap_in)
    H = jnp.stack([W, A_ext[:, 2: cap_in + 2]], axis=-1) \
        .reshape(B, 2 * cap_in)

    def rd2(arr, i):
        j = 2 * jnp.clip(i, 0, cap_in - 1)
        g = jax.vmap(lambda t, s: jax.lax.dynamic_slice(t, (s,), (2,)))(
            arr, j)
        return g[:, 0], g[:, 1]

    T = cap_in // 3 + 2          # every sequence but the last is >=3 bytes

    def parse_one(carry):
        """One sequence parse step for all B blocks; returns
        (carry', record 4-tuple of int32[B])."""
        p, err, seen_last = carry
        done = p >= M
        tok, a1 = rd2(G, p)
        litnib = tok >> 4
        q = a1 & ((1 << SH) - 1)
        extlit = 255 * (q - (p + 1)) + (a1 >> SH)
        litlen = jnp.where(litnib == 15, litnib + extlit, litnib)
        lit_start = jnp.where(litnib == 15, q + 1, p + 1)
        if partial:
            # LZ4_decompress_safe_partial semantics (lz4.c:2450-2560):
            # a final literal run cut short by the input end is served
            # as far as the input goes
            litlen = jnp.minimum(litlen, jnp.maximum(M - lit_start, 0))
        lit_end = lit_start + litlen
        is_last = lit_end >= M
        w, a2 = rd2(H, lit_end)
        offset = w & 0xFFFF
        matnib = tok & 15
        mo = lit_end + 2
        q2 = a2 & ((1 << SH) - 1)
        extmat = 255 * (q2 - mo) + (a2 >> SH)
        mlen = MINMATCH + jnp.where(matnib == 15, matnib + extmat, matnib)
        next_p = jnp.where(matnib == 15, q2 + 1, mo)
        if partial:
            # truncated sequences end the stream instead of erroring
            bad = (~is_last) & ((next_p > M) | (offset == 0))
            good = ~done & ~bad
        else:
            # parsing restrictions mirror the reference decoder
            # (lz4.c:2279-2318): a match sequence's literals must end at
            # least 2+1+LASTLITERALS bytes before the input end
            bad = jnp.where(is_last, lit_end != M,
                            (next_p > M) | (offset == 0)
                            | (lit_end > M - 8))
            good = ~done & ~bad
            err = err | (~done & bad)
        seen_last = seen_last | (good & is_last)
        rec = (
            jnp.where(good, lit_start, 0),
            jnp.where(good, jnp.minimum(litlen, cap_out + 1), 0),
            jnp.where(good & ~is_last, offset, 0),
            jnp.where(good & ~is_last,
                      jnp.minimum(mlen, cap_out + 1), 0),
        )
        p_next = jnp.where(done | bad | is_last, jnp.int32(cap_in), next_p)
        return (p_next, err, seen_last), rec

    # chunked early-exit walk: inner lax.scan records PARSE_CHUNK steps
    # via its ys outputs (the only efficient recorder); the outer
    # while_loop stops as soon as every block's cursor is exhausted.
    CH = PARSE_CHUNK
    n_chunks = -(-T // CH)
    Tpad = n_chunks * CH

    def step(carry, _):
        carry, rec = parse_one(carry)
        return carry, rec

    def cond(state):
        (p, _, _), _, k = state
        return jnp.any(p < M) & (k < n_chunks)

    def body(state):
        carry, bufs, k = state
        carry, recs = jax.lax.scan(step, carry, None, length=CH)
        bufs = tuple(
            jax.lax.dynamic_update_slice(b, r, (k * CH, 0))
            for b, r in zip(bufs, recs))
        return carry, bufs, k + 1

    # the 0*M / (M<0) terms tie the initial carries to the (possibly
    # sharded) inputs so their varying-axes types match the loop outputs
    # under shard_map (XLA folds them away otherwise)
    carry0 = (0 * M, M < jnp.int32(-1), M < jnp.int32(-1))
    bufs0 = tuple(jnp.zeros((Tpad, B), jnp.int32) + 0 * M[None, :]
                  for _ in range(4))
    (pf, err, seen_last), bufs, _ = jax.lax.while_loop(
        cond, body, (carry0, bufs0, jnp.int32(0)))
    lit_starts, litlens, offs, mlens = (b[:T].T for b in bufs)
    return (lit_starts, litlens, offs, mlens), err, seen_last


# ---------------------------------------------------------------------------
# single-block decode (vmapped over a batch by decode_blocks); consumes
# the batched parse's per-token records
# ---------------------------------------------------------------------------

def _decode_one(comp, comp_len, dict_buf, dict_len, out_cap,
                lit_starts, litlens, offs, mlens, err, seen_last, *,
                cap_out: int, has_dict: bool, partial: bool = False):
    cap_in = comp.shape[0]
    dlen = dict_len.astype(jnp.int32) if has_dict else jnp.int32(0)
    if not partial:
        err = err | ~seen_last      # truncated / endless stream

    # ---- placement + checks (elementwise over tokens) -------------------
    contrib = litlens + mlens
    csum = jnp.cumsum(contrib)
    dst_start = csum - contrib
    total_out = csum[-1]
    oc = out_cap.astype(jnp.int32)      # caller capacity (<= cap_out)
    match_dst = dst_start + litlens
    has_m = mlens > 0
    if partial:
        # only sequences contributing to the requested prefix matter
        rel = has_m & (dst_start < oc)
        err = err | jnp.any(rel & (match_dst - offs < -dlen))
        err = err | jnp.any(rel & (offs > LZ4_DISTANCE_MAX))
        total_out = jnp.minimum(total_out, oc)
    else:
        err = err | jnp.any(csum > oc)
        err = err | jnp.any(has_m & (match_dst - offs < -dlen))
        err = err | jnp.any(has_m & (offs > LZ4_DISTANCE_MAX))
        # output-side parsing restriction (lz4.c:2279): no match may
        # begin within MFLIMIT of the caller's output capacity
        err = err | jnp.any(has_m & (match_dst > oc - 12))

    # ---- token-level offset composition (3 unrolled rounds) -------------
    # The LINEAR part of the match dependency graph: when token t's whole
    # source interval [match_dst - OFF, .. + mlen) sits inside token u's
    # match region, t's map is a pure shift and composes: OFF_t += OFF_u.
    # Composed offsets double reach per round (u's OFF is the previous
    # round's), collapsing cross-token generations before the byte-level
    # chase; overlapping matches (mlen > off) never satisfy containment,
    # so the per-byte intra-token escape stays exact for them. This is
    # the round-1 composition experiment re-done as straight-line graph
    # code (the fori_loop-around-sorts lowering hazard is avoided) at
    # token granularity (T rows, ~30x smaller than byte rows).
    # Cited scheme: segment-level dependency resolution, arXiv:1606.00519.
    Tn = litlens.shape[0]
    BIGT = jnp.int32(4 * cap_out + 8)
    tactive = contrib > 0
    OFF = offs
    m0_t = match_dst
    for _comp_round in range(COMP_ROUNDS):
        src_lo = m0_t - OFF
        src_hi = src_lo + mlens
        qkey = jnp.where(has_m & (src_lo >= 0), src_lo, BIGT)
        pkey = jnp.where(tactive, dst_start, BIGT)
        mk = jnp.concatenate([jnp.minimum(pkey, BIGT) * 2, qkey * 2 + 1])
        neg = jnp.full(Tn, -1, jnp.int32)
        g_m0 = jnp.concatenate([jnp.where(tactive, m0_t, -1), neg])
        g_ml = jnp.concatenate([mlens, jnp.zeros(Tn, jnp.int32)])
        g_of = jnp.concatenate([OFF, jnp.zeros(Tn, jnp.int32)])
        smk_c, s_m0, s_ml, s_of = jax.lax.sort(
            (mk, g_m0, g_ml, g_of), num_keys=1, is_stable=True)

        def last_tok(a, b):
            keep = b[0] >= 0
            return tuple(jnp.where(keep, y, x) for x, y in zip(a, b))

        p_m0, p_ml, p_of = jax.lax.associative_scan(
            last_tok, (s_m0, s_ml, s_of))
        is_q = (smk_c & 1) == 1
        qrank = jnp.cumsum(is_q.astype(jnp.int32)) - 1
        qk2 = jnp.where(is_q, qrank, BIGT)
        _, u_m0, u_ml, u_of = jax.lax.sort(
            (qk2, p_m0, p_ml, p_of), num_keys=1, is_stable=True)
        u_m0 = u_m0[:Tn]
        u_ml = u_ml[:Tn]
        u_of = u_of[:Tn]
        contained = (has_m & (src_lo >= 0) & (u_m0 >= 0)
                     & (src_lo >= u_m0) & (src_hi <= u_m0 + u_ml)
                     & (u_of > 0))
        OFF = jnp.where(contained, OFF + u_of, OFF)
    offs = OFF

    # ---- merge-by-sort: route token fields to output bytes --------------
    # Payload-lane economy (each lane on a 2*cap_out-row sort costs
    # ~1-2 ms per 32x66K pass, docs/tpu_perf_notes.md):
    #   * the token's output start does NOT ride the sort — after a
    #     stable sort keyed by output coordinate, the byte-count cumsum
    #     AT a token row equals its output start (every byte row with a
    #     smaller coordinate sorts before it), so the start is
    #     reconstructed post-sort and propagated by the same scan;
    #   * litlen and offset share one packed lane: offsets are 1..65535
    #     (off-1 fits 16 bits) and a match token's litlen is < 2^16 at
    #     every tier <= 64 KB... litlen is clamped to 16 bits and
    #     match-free tokens (whose offset field is dead) carry the
    #     sentinel offcode 0xFFFF meaning "every covered byte literal",
    #     which also covers the one clamped case (a pure-literal token
    #     spanning the full 64 KB output). Larger tiers pack litlen into
    #     the wider lane directly (off stays 16 bits by format).
    o = jnp.arange(cap_out, dtype=jnp.int32)
    BIG = jnp.int32(2 * cap_out + 4)
    active = contrib > 0
    skey = jnp.where(active, dst_start, BIG)
    mkey = jnp.concatenate([jnp.minimum(skey, BIG) * 2, o * 2 + 1])
    zpad = jnp.zeros(cap_out, jnp.int32)
    small_tier = cap_out <= 65536
    has_m_t = mlens > 0
    offcode_t = jnp.where(has_m_t, jnp.maximum(offs, 1) - 1,
                          jnp.int32(0xFFFF))
    f_ls = jnp.concatenate([lit_starts, zpad])
    if small_tier:
        llv_t = jnp.clip(litlens, 0, 0xFFFF)
        f_pack = jnp.concatenate([(llv_t << 16) | offcode_t, zpad])
        smk, g_ls, g_pack = jax.lax.sort(
            (mkey, f_ls, f_pack), num_keys=1, is_stable=True)
        g_ll = None
    else:
        # 256 KB..4 MB tiers: litlen exceeds 16 bits, own lane
        f_pack = jnp.concatenate([offcode_t, zpad])
        f_ll = jnp.concatenate([litlens, zpad])
        smk, g_ls, g_pack, g_ll = jax.lax.sort(
            (mkey, f_ls, f_pack, f_ll), num_keys=1, is_stable=True)

    is_byte = (smk & 1) == 1
    cs = jnp.cumsum(is_byte.astype(jnp.int32))
    prov = jnp.where(is_byte, jnp.int32(-1), cs)

    def last_valid(a, b):
        keep = b[0] >= 0
        return tuple(jnp.where(keep, y, x) for x, y in zip(a, b))

    if small_tier:
        p_start, p_ls, p_pack = jax.lax.associative_scan(
            last_valid, (prov, g_ls, g_pack))
        p_ll = None
    else:
        p_start, p_ls, p_pack, p_ll = jax.lax.associative_scan(
            last_valid, (prov, g_ls, g_pack, g_ll))

    # ---- per-byte fields, computed in MERGED order -----------------------
    # byte rows appear in output order among themselves (stable sort),
    # so rank IS the output coordinate; everything downstream except the
    # literal value is elementwise here, and only (q, code) ride the
    # back-sort.
    om = cs - 1                                    # o at byte rows
    t = om - p_start
    if small_tier:
        ll_m = (p_pack >> 16) & 0xFFFF
    else:
        ll_m = p_ll
    offcode = p_pack & 0xFFFF
    covered_m = is_byte & (om < total_out) & (p_start >= 0)
    is_lit_m = covered_m & ((t < ll_m) | (offcode == 0xFFFF))
    is_mat_m = covered_m & ~is_lit_m
    # analytic intra-token escape (segment-level match resolution): a
    # match byte's source chain within its OWN token (offset < match
    # length: RLE / periodic copies) is an arithmetic progression, so
    # instead of single-stepping to o - off we jump straight to the
    # first source position BEFORE the token's match region:
    #   esc = o - ceil((o - m0 + 1)/off)*off  in  [m0 - off, m0)
    # Every chase hop is then a full token hop, collapsing the
    # pointer-doubling depth from log2(byte chain length) to
    # log2(token generation depth) — RLE blocks resolve in one round
    # (was 17). Cited scheme: segment-level LZ77 dependency resolution
    # (arXiv:1606.00519); reference byte-serial analog: the overlap
    # wildcopy of lz4.c:2406-2418.
    m0 = p_start + ll_m
    d_off = jnp.maximum(offcode, 0) + 1
    k_in = jnp.maximum(t - ll_m, 0) // d_off + 1
    src_out = om - k_in * d_off
    if has_dict:
        dict_ptr = cap_out + jnp.clip(DICT_CAP + src_out, 0, DICT_CAP - 1)
        mat_ptr_m = jnp.where(src_out >= 0, src_out, dict_ptr)
        dom = cap_out + DICT_CAP
    else:
        err = err | jnp.any(is_mat_m & (src_out < 0))
        mat_ptr_m = jnp.clip(src_out, 0, cap_out - 1)
        dom = cap_out
    code_m = (jnp.clip(mat_ptr_m, 0, dom - 1)
              | (is_lit_m.astype(jnp.int32) << 24)
              | (is_mat_m.astype(jnp.int32) << 25))
    # literal source cursor: non-decreasing in output order (tokens in
    # stream order; within a token t increases) — cummax through token
    # rows keeps it monotone in merged order too
    q_m = jax.lax.cummax(
        jnp.where(is_lit_m, jnp.clip(p_ls + t, 0, cap_in - 1), 0))

    rank = cs - 1
    bkey = jnp.where(is_byte, rank, BIG)
    _, q, code_o = jax.lax.sort(
        (bkey, q_m, code_m), num_keys=1, is_stable=True)
    q = q[:cap_out]
    code_o = code_o[:cap_out]
    is_lit = (code_o >> 24) & 1
    is_lit = is_lit.astype(bool)
    covered = is_lit | ((code_o >> 25) & 1).astype(bool)
    mat_ptr = code_o & ((1 << 24) - 1)

    # ---- literal bytes: monotone merge fetch (no gather) ----------------
    # Literal source indices are NON-DECREASING in output order, so the
    # fetch is a merge of comp rows with consumer rows — two cheap
    # 1-payload sorts, not a ~6x-costlier random gather
    # (docs/tpu_perf_notes.md). Literal values enter the chase
    # pre-resolved, which also shortens every match chain by one hop (a
    # match byte sourcing a literal resolves in its first round).
    lkey = jnp.concatenate([jnp.arange(cap_in, dtype=jnp.int32) * 2,
                            q * 2 + 1])
    lval = jnp.concatenate([comp.astype(jnp.int32) + 1,
                            jnp.zeros(cap_out, jnp.int32)])
    slk, slv = jax.lax.sort((lkey, lval), num_keys=1, is_stable=True)
    lfill, = jax.lax.associative_scan(
        lambda a, b: (jnp.where(b[0] > 0, b[0], a[0]),), (slv,))
    is_cons = (slk & 1) == 1
    crank = jnp.cumsum(is_cons.astype(jnp.int32)) - 1
    ckey2 = jnp.where(is_cons, crank, jnp.int32(cap_in + cap_out))
    _, lit_sorted = jax.lax.sort((ckey2, lfill), num_keys=1,
                                 is_stable=True)
    lit_byte = lit_sorted[:cap_out] - 1           # uint8 value, >= 0
    terms = (-(dict_buf.astype(jnp.int32)) - 1) if has_dict else None
    # literal bytes enter pre-resolved (negative encoding -(byte+1));
    # match bytes carry output-coordinate pointers (or dict terminals)
    ptr = jnp.where(is_lit, -lit_byte - 1,
                    jnp.where(covered, mat_ptr, jnp.int32(-1)))

    # ---- resolve match chains (convergence-bounded doubling) ------------
    # ptr <- X[ptr] over X = [current ptrs | dict terminals] composes the
    # map with itself (reach doubles); with the analytic intra-token
    # escape every application is a full token hop and with literals
    # pre-resolved a generation-1 match lands on a value immediately, so
    # real data converges in 1-3 rounds (all-literal blocks skip the
    # loop entirely). A merge-by-sort gather variant was measured at
    # ~21 ms/round on TPU — no better than the serialized take
    # (docs/tpu_perf_notes.md), so the adaptive take-based loop stays.
    # phase 1: full-width rounds while the unresolved set is large
    # (gather cost is per element fetched, so width is the cost)
    W2 = cap_out // (2 if CHASE_RANK else 4)
    # doubling halves the remaining generation depth per round; the
    # token-hop escape bounds depth by cap_out, so log2(cap_out)+2
    # rounds always suffice (19 at the 64 KB tier, 24 at 4 MB)
    RMAX = max(19, int(cap_out).bit_length() + 2)
    if CHASE_RMAX_OVERRIDE is not None:       # timing-only stage split
        RMAX = int(CHASE_RMAX_OVERRIDE)

    for _sr in range(CHASE_SORT_ROUNDS):
        # one full-width doubling round, sort-structured: providers
        # (j, X[j]) merge with consumers (ptr[o], o) on one key; a
        # last-provider fill hands every consumer X[ptr[o]]; the
        # back-sort restores output order. ONE shared payload lane
        # (provider value / consumer slot) — cheaper than the
        # serialized full-width take when the unresolved set is wide.
        x = ptr if terms is None else jnp.concatenate([ptr, terms])
        key = jnp.concatenate([jnp.arange(dom, dtype=jnp.int32) * 2,
                               jnp.clip(ptr, 0, dom - 1) * 2 + 1])
        pay = jnp.concatenate([x, o])
        sk, sp = jax.lax.sort((key, pay), num_keys=1, is_stable=True)
        isp = (sk & 1) == 0

        def fill2(a, b):
            keep = b[1]
            return (jnp.where(keep, b[0], a[0]), a[1] | b[1])

        fv, _ = jax.lax.associative_scan(fill2, (sp, isp))
        bkey2 = jnp.where(isp, jnp.int32(dom + cap_out), sp)
        _, nxt = jax.lax.sort((bkey2, fv), num_keys=1, is_stable=True)
        ptr = jnp.where(ptr >= 0, nxt[:cap_out], ptr)

    def chase_cond(state):
        ptr, rounds = state
        return (jnp.sum((ptr >= 0).astype(jnp.int32)) > W2) \
            & (rounds < RMAX)

    def chase_body(state):
        ptr, rounds = state
        x = ptr if terms is None else jnp.concatenate([ptr, terms])
        nxt = jnp.take(x, jnp.clip(ptr, 0, dom - 1))
        return jnp.where(ptr >= 0, nxt, ptr), rounds + 1

    ptr, rounds = jax.lax.while_loop(
        chase_cond, chase_body, (ptr, jnp.int32(CHASE_SORT_ROUNDS)))

    if CHASE_RANK:
        # phase 2 (rank space): the (<= W2) unresolved rows are renamed
        # into compacted RANK coordinates once — X1[v] = rank(v) for
        # unresolved v, terminal otherwise — and the doubling then runs
        # entirely inside the W2-wide array (c <- c[c]): every straggler
        # round is a W2-wide take with NO per-round scatter back into
        # the full array (take cost is per element fetched; the
        # scatter-based variant paid a W2-wide scatter per round).
        unres = ptr >= 0
        rank1 = jnp.cumsum(unres.astype(jnp.int32)) - 1
        X1 = jnp.where(unres, rank1, ptr)
        okey = jnp.where(unres, o, jnp.int32(2 * cap_out))
        _, sel, sptr = jax.lax.sort((okey, o, ptr), num_keys=1,
                                    is_stable=True)
        sel = sel[:W2]
        sptr = sptr[:W2]
        # entry hop: position-space pointers into the rank/terminal map
        x1 = X1 if terms is None else jnp.concatenate([X1, terms])
        c = jnp.where(sptr >= 0,
                      jnp.take(x1, jnp.clip(sptr, 0, dom - 1)), sptr)

        def r_cond(state):
            c, rounds = state
            return jnp.any(c >= 0) & (rounds < RMAX)

        def r_body(state):
            c, rounds = state
            nxt = jnp.take(c, jnp.clip(c, 0, W2 - 1))
            return jnp.where(c >= 0, nxt, c), rounds + 1

        c, _ = jax.lax.while_loop(r_cond, r_body, (c, rounds))
        # one scatter total (sorted unique positions); padding rows
        # (okey == BIG) carry their own resolved ptr value back unchanged
        ptr = ptr.at[sel].set(c, unique_indices=True)
    else:
        # phase 2 (scatter): straggler rows selected once, each round a
        # W2-wide gather + unique scatter into the full array
        okey = jnp.where(ptr >= 0, o, jnp.int32(2 * cap_out))
        _, sel = jax.lax.sort((okey, o), num_keys=1, is_stable=True)
        sel = sel[:W2]
        sptr = jnp.take(ptr, sel)

        def c_cond(state):
            _, sp, rounds = state
            return jnp.any(sp >= 0) & (rounds < RMAX)

        def c_body(state):
            ptr_full, sp, rounds = state
            x = ptr_full if terms is None else jnp.concatenate(
                [ptr_full, terms])
            nxt = jnp.take(x, jnp.clip(sp, 0, dom - 1))
            sp = jnp.where(sp >= 0, nxt, sp)
            ptr_full = ptr_full.at[sel].set(sp, unique_indices=True)
            return ptr_full, sp, rounds + 1

        ptr, _, _ = jax.lax.while_loop(c_cond, c_body, (ptr, sptr, rounds))
    # defensive: a pointer that survived both loops means the round
    # bound was beaten (cannot happen for well-formed streams) — flag,
    # never emit silent garbage
    err = err | jnp.any(ptr >= 0)

    # ---- materialize (terminal decode only — the byte rode the chase) ---
    out = jnp.where(o < total_out, (-ptr - 1).astype(jnp.uint8),
                    jnp.uint8(0))
    return out, total_out, err.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_out", "has_dict",
                                             "partial"))
def decode_blocks(comp, comp_lens, dict_bufs, dict_lens, out_caps=None, *,
                  cap_out: int, has_dict: bool, partial: bool = False):
    """Batched block decode.

    comp:      uint8[B, cap_in]   zero-padded compressed blocks
    comp_lens: int32[B]
    dict_bufs: uint8[B, 65536]    right-aligned history (ignored unless
                                  has_dict)
    dict_lens: int32[B]
    out_caps:  int32[B] caller capacities (parsing-restriction bound,
               lz4.c:2279); defaults to cap_out everywhere
    returns (out uint8[B, cap_out], out_lens int32[B], errs int32[B])
    """
    if comp.shape[1] >= (1 << 23):
        # the packed parse helper A carries position | byte << SH in one
        # int32: SH <= 23 keeps 255 << SH inside int32. Every frame tier
        # (64 KB .. 4 MB compress_bound) fits; anything larger decodes
        # on the host.
        raise NotImplementedError("decode graph supports cap_in < 8 MB")
    if out_caps is None:
        out_caps = jnp.full(comp.shape[0], cap_out, jnp.int32)
    recs, err, seen_last = _parse_tokens(comp, comp_lens, cap_out=cap_out,
                                         partial=partial)
    fn = functools.partial(_decode_one, cap_out=cap_out, has_dict=has_dict,
                           partial=partial)
    return jax.vmap(fn)(comp, comp_lens, dict_bufs, dict_lens, out_caps,
                        *recs, err, seen_last)


# ---------------------------------------------------------------------------
# convenience host API (bytes in/out) used by tests and the engine
# ---------------------------------------------------------------------------

def decode_blocks_host(blocks, max_outs, dict_prefixes=None, *,
                       partial=False):
    """Decode a list of compressed blocks via the vectorized TPU path.
    Groups by capacity; returns list[bytes]. Raises on any error flag."""
    if not blocks:
        return []

    def _pad_cap(n: int) -> int:
        # bucketize to limit the compiled-shape set (compiles are the
        # scarce resource; also keeps the test suite's XLA state small)
        cap = 256
        while cap < n:
            cap *= 2
        return cap

    cap_in = _pad_cap(max(16, max(len(b) for b in blocks)))
    cap_out = _pad_cap(max(16, max(max_outs)))
    B = len(blocks)
    comp = np.zeros((B, cap_in), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, b in enumerate(blocks):
        comp[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    has_dict = dict_prefixes is not None and any(
        d for d in dict_prefixes)
    dict_bufs = np.zeros((B, DICT_CAP), np.uint8)
    dict_lens = np.zeros(B, np.int32)
    if has_dict:
        for i, d in enumerate(dict_prefixes):
            if d:
                d = bytes(d)[-DICT_CAP:]
                dict_bufs[i, DICT_CAP - len(d):] = np.frombuffer(d, np.uint8)
                dict_lens[i] = len(d)
    out, out_lens, errs = decode_blocks(
        jnp.asarray(comp), jnp.asarray(lens), jnp.asarray(dict_bufs),
        jnp.asarray(dict_lens),
        jnp.asarray(np.asarray(max_outs, np.int32)),
        cap_out=int(cap_out), has_dict=bool(has_dict), partial=partial)
    out = np.asarray(out)
    out_lens = np.asarray(out_lens)
    errs = np.asarray(errs)
    results = []
    for i in range(B):
        if errs[i]:
            from lz4_tpu.block.ref_codec import BlockDecodeError
            raise BlockDecodeError(f"malformed block {i}")
        if out_lens[i] > max_outs[i]:
            from lz4_tpu.block.ref_codec import BlockDecodeError
            raise BlockDecodeError(
                f"block {i} decodes to {out_lens[i]} > cap {max_outs[i]}")
        results.append(out[i, : out_lens[i]].tobytes())
    return results
