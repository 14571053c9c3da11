"""Vectorized LZ4 block encoder for TPU — zero serial loops.

TPU-native redesign of LZ4_compress_generic (lz4.c:930-1338). The
reference walks a byte cursor with a serially-updated hash table; a TPU
wants wide static-shape vector passes. This encoder re-expresses greedy
LZ4 parsing as a constant number of vector ops per block:

  1. **Exact candidate discovery** — one stable sort of the 4-byte words
     gives, for every position p, the *nearest previous occurrence* c(p)
     of the 4-gram at p (the collision-free ideal of the reference's
     2^hashlog hash probe, lz4.c:777-806/1023-1100). Positions in the
     same sort group have bit-equal grams, so candidate matches are
     exact by construction — no verification pass needed.
  2. **Chain-run match lengths** — if candidates advance in lockstep
     (c(p+1) == c(p)+1) for r consecutive positions, bytes [p, p+r+3)
     match [c, c+r+3) exactly. A reverse cummin over the "chain breaks
     here" indicator yields r for every p in O(n). RLE / periodic
     regions (where the reference needs its overlap special cases)
     chain perfectly, giving full-length matches. A short bounded
     forward-extension pass recovers lengths across chain breaks.
  3. **Greedy parse as an orbit** — successor f(p) = p + ml(p) on a
     match, else p + 1. Tokens = orbit of the block start under f,
     computed with pointer doubling in log2(n) gather rounds (no skip
     heuristic needed: orbit cost is independent of literal-run length,
     so incompressible data costs the same as compressible).
  4. **Back-extension at emission** — the reference's catch-up loop
     (lz4.c:1104-1109) becomes a bounded per-candidate backward compare,
     clamped by the (orbit-derived) anchor when sequences are emitted.
  5. **Sequence emission** — per-sequence byte sizes -> exclusive prefix
     sum -> output offsets; token/extension/literal/offset bytes are
     materialized by a span-fill (scatter-max + cummax) + gather over
     the output coordinate, the same machinery as the decoder.

Output bytes need not equal the reference's byte-for-byte (many valid
encodings exist); they decode bit-exactly to the input with any LZ4
decoder and ratio is comparable (the exact matcher typically finds more
matches than the reference's lossy hash table; chain breaks cost a few
tokens back).

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
BACK_EXT = 16        # bounded back-extension depth (catch-up analog)
FWD_EXT = 12         # bounded forward extension across chain breaks


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(2, n)))))


# ---------------------------------------------------------------------------
# single-block encode (vmapped over a batch by encode_blocks)
# ---------------------------------------------------------------------------

def _encode_one(src, n, dict_buf, dict_len, *, cap_n: int, has_dict: bool):
    """src: uint8[cap_n] zero-padded; n: int32 actual length.
    dict_buf: uint8[DICT_CAP] right-aligned history; dict_len: int32.
    Returns (out uint8[cap_out], csize int32)."""
    d0 = DICT_CAP if has_dict else 0
    if has_dict:
        buf = jnp.concatenate([dict_buf, src])
    else:
        buf = src
    N = buf.shape[0]
    cap_out = compress_bound(cap_n)
    n = n.astype(jnp.int32)
    dlen = dict_len.astype(jnp.int32) if has_dict else jnp.int32(0)
    lo = jnp.int32(d0) - dlen            # first valid history byte
    end = jnp.int32(d0) + n              # one past last source byte

    idx = jnp.arange(N, dtype=jnp.int32)
    b32 = buf.astype(jnp.uint32)

    def gat(arr, i, hi=None):
        hi = (arr.shape[0] - 1) if hi is None else hi
        return jnp.take(arr, jnp.clip(i, 0, hi), axis=0)

    # ---- step 1: exact nearest-previous-occurrence candidates ----------
    w = (b32
         | (jnp.roll(b32, -1) << 8)
         | (jnp.roll(b32, -2) << 16)
         | (jnp.roll(b32, -3) << 24))
    order = jnp.argsort(w, stable=True)        # groups equal grams,
    sw = jnp.take(w, order)                    # positions ascending inside
    same = jnp.concatenate([jnp.array([False]), sw[1:] == sw[:-1]])
    prev_in_group = jnp.where(
        same, jnp.concatenate([jnp.array([0], jnp.int32), order[:-1]]),
        jnp.int32(-1))
    # permutation scatter: unique indices take XLA's fast lowering (the
    # general colliding-scatter path serializes on TPU)
    cand = jnp.zeros(N, jnp.int32).at[order].set(
        prev_in_group, unique_indices=True)

    valid_cand = (cand >= lo) & (cand >= 0) & (idx - cand <= LZ4_DISTANCE_MAX)

    # ---- step 2: chain-run match lengths --------------------------------
    cand_next = gat(cand, idx + 1)
    ch = (valid_cand
          & (idx + 1 <= end - 4)
          & (cand_next == cand + 1))
    nc = jnp.where(~ch, idx, jnp.int32(N))
    nc = jax.lax.cummin(nc, axis=0, reverse=True)    # first chain break >= p
    ml = jnp.where(valid_cand, nc - idx + MINMATCH, 0)

    # bounded forward extension past the chain break (direct byte compare)
    ext_alive = valid_cand
    ml_ext = ml
    for j in range(FWD_EXT):
        pj = idx + ml + j
        cj = cand + ml + j
        ok = (pj < end) & (gat(buf, pj) == gat(buf, cj))
        ext_alive = ext_alive & ok
        ml_ext = ml_ext + ext_alive.astype(jnp.int32)
    ml = ml_ext

    # clamp to the end-of-block literal rules (lz4.c:242-249 behaviour)
    ml = jnp.minimum(ml, end - LASTLITERALS - idx)
    is_match = (valid_cand
                & (idx >= d0)
                & (idx <= end - MFLIMIT)
                & (ml >= MINMATCH))

    # ---- step 3: greedy parse orbit (gather-only binary lifting) --------
    # TPU scatters serialize, so the reach-set pointer-doubling formulation
    # is slow; instead build jump tables F_k = f^(2^k) (pure gathers) and,
    # for every position p, greedily descend from the block start: the
    # walk lands exactly on p iff p is a parse cursor position.
    f = jnp.where(is_match, idx + ml, idx + 1)
    f = jnp.where((idx >= end) | (idx < d0), jnp.int32(N), jnp.minimum(f, N))
    f_ext = jnp.concatenate([f, jnp.array([N], jnp.int32)])
    n_levels = _ceil_log2(N) + 1
    levels = [f_ext]
    for _ in range(n_levels - 1):
        levels.append(jnp.take(levels[-1], levels[-1]))
    cur = jnp.full(N, d0, jnp.int32)
    for k in range(n_levels - 1, -1, -1):
        nxt = jnp.take(levels[k], cur)
        cur = jnp.where(nxt <= idx, nxt, cur)
    on_orbit = cur == idx
    tok = on_orbit & is_match                       # match-token positions

    # ---- step 4: anchors + back-extension --------------------------------
    # anchor(p) = end of the previous emitted match before p (or block start)
    prev_end = jnp.where(tok, idx + ml, 0)
    prev_end = jax.lax.cummax(prev_end, axis=0)
    anchor = jnp.maximum(jnp.int32(d0),
                         jnp.concatenate([jnp.array([0], jnp.int32),
                                          prev_end[:-1]]))

    bk_alive = tok
    bk = jnp.zeros(N, jnp.int32)
    for j in range(BACK_EXT):
        pj = idx - 1 - j
        cj = cand - 1 - j
        ok = (pj >= anchor) & (cj >= lo) & (gat(buf, pj) == gat(buf, cj))
        bk_alive = bk_alive & ok
        bk = bk + bk_alive.astype(jnp.int32)
    bk = jnp.minimum(bk, idx - anchor)

    # ---- per-sequence fields --------------------------------------------
    lit_base = anchor
    L = jnp.where(tok, idx - bk - anchor, 0)        # literal run length
    off = idx - cand
    M4 = jnp.where(tok, ml + bk - MINMATCH, 0)      # matchlen - 4 code

    def ext_count(v):
        return jnp.where(v < 15, 0, 1 + (v - 15) // 255)

    el = ext_count(L)
    em = ext_count(M4)
    seq_bytes = jnp.where(tok, 1 + el + L + 2 + em, 0)

    csum = jnp.cumsum(seq_bytes)
    out_start = csum - seq_bytes
    total_seq = csum[-1] if N else jnp.int32(0)

    # final literal-only sequence (format: last sequence is literals)
    fanchor = jnp.maximum(jnp.int32(d0), jnp.max(prev_end))
    FL = end - fanchor
    fel = ext_count(FL)
    csize = total_seq + 1 + fel + FL

    # ---- step 5: emission (searchsorted over the monotone cumsum) -------
    # csum is non-decreasing over positions and strictly increases exactly
    # at match tokens, so the token covering output byte o is the first
    # position whose inclusive cumsum exceeds o — a pure searchsorted +
    # field gathers (no scatters: TPU scatters serialize).
    o = jnp.arange(cap_out, dtype=jnp.int32)
    p_star = jnp.searchsorted(csum, o, side="right").astype(jnp.int32)

    def at_tok(v):
        return jnp.take(v, jnp.clip(p_star, 0, N - 1))

    key_o = at_tok(out_start)
    L_o, base_o, el_o, off_o, M4_o = map(
        at_tok, [L, lit_base, el, off, M4])

    in_final = o >= total_seq
    key_o = jnp.where(in_final, total_seq, key_o)
    L_o = jnp.where(in_final, FL, L_o)
    base_o = jnp.where(in_final, fanchor, base_o)
    el_o = jnp.where(in_final, fel, el_o)
    M4_o = jnp.where(in_final, 0, M4_o)

    t = o - key_o
    nfull = jnp.maximum(L_o - 15, 0) // 255
    mfull = jnp.maximum(M4_o - 15, 0) // 255

    token_byte = (jnp.minimum(L_o, 15) << 4) | jnp.where(
        in_final, 0, jnp.minimum(M4_o, 15))
    litext_byte = jnp.where(t - 1 < nfull, 255, L_o - 15 - 255 * nfull)
    lit_byte = gat(b32, base_o + (t - 1 - el_o)).astype(jnp.int32)
    off_lo_byte = off_o & 0xFF
    off_hi_byte = off_o >> 8
    matext_byte = jnp.where(t - (3 + el_o + L_o) < mfull, 255,
                            M4_o - 15 - 255 * mfull)

    lit_end = 1 + el_o + L_o
    val = jnp.where(
        t == 0, token_byte,
        jnp.where(t < 1 + el_o, litext_byte,
                  jnp.where(t < lit_end, lit_byte,
                            jnp.where(t == lit_end, off_lo_byte,
                                      jnp.where(t == lit_end + 1,
                                                off_hi_byte, matext_byte)))))
    out = jnp.where(o < csize, val, 0).astype(jnp.uint8)
    return out, csize


@functools.partial(jax.jit, static_argnames=("cap_n", "has_dict"))
def encode_blocks(src, lens, dict_bufs, dict_lens, *, cap_n: int,
                  has_dict: bool):
    """Batched block encode.

    src:       uint8[B, cap_n]    zero-padded source blocks
    lens:      int32[B]
    dict_bufs: uint8[B, 65536]    right-aligned history (ignored unless
                                  has_dict)
    dict_lens: int32[B]
    returns (out uint8[B, compress_bound(cap_n)], csizes int32[B])
    """
    fn = functools.partial(_encode_one, cap_n=cap_n, has_dict=has_dict)
    return jax.vmap(fn)(src, lens, dict_bufs, dict_lens)


# ---------------------------------------------------------------------------
# convenience host API (bytes in/out) used by tests and the engine
# ---------------------------------------------------------------------------

def _pad_cap(n: int) -> int:
    """Bucketize capacities to limit recompilation."""
    cap = 256
    while cap < n:
        cap *= 2
    return cap


def encode_blocks_host(blocks, dict_prefixes=None):
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
    out, csizes = encode_blocks(
        jnp.asarray(src), jnp.asarray(lens), jnp.asarray(dict_bufs),
        jnp.asarray(dict_lens), cap_n=int(cap_n), has_dict=bool(has_dict))
    out = np.asarray(out)
    csizes = np.asarray(csizes)
    return [out[i, : csizes[i]].tobytes() for i in range(B)]
