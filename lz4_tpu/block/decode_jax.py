"""Vectorized LZ4 block decoder for TPU — zero serial loops.

TPU-native redesign of LZ4_decompress_generic (lz4.c:2022-2445). The
reference walks a byte cursor sequence-by-sequence; a TPU wants wide
data-parallel vector ops with static shapes. This decoder re-expresses
the *entire* decode as a constant number of vector passes:

  1. **Speculative token parse** — for EVERY byte position p, compute
     "if a token started at p": literal length (incl. 255-chains, found
     via a reverse cumulative-min "next non-255 byte" map), literal span,
     offset, match length, and the position of the next token f(p).
  2. **Token reachability** — the real tokens are the orbit of position 0
     under f. Since f is strictly increasing, the orbit is computed with
     pointer doubling: R ← R ∪ f^(2^j)(R), f^(2^(j+1)) = f^(2^j)∘f^(2^j),
     log2(N) gather+scatter rounds.
  3. **Output placement** — per-token output offsets via masked prefix
     sums (replaces the serial output cursor).
  4. **Source map** — every output byte's provenance: literal bytes point
     at input (resolved), match bytes point at an earlier *output*
     position (o - offset), built with segmented scatter + cumulative-max
     span fills.
  5. **Match resolution** — pointer doubling again: ptr ← ptr[ptr] for
     log2(N) rounds resolves arbitrarily deep match-of-match chains
     (incl. overlap/RLE patterns, which the reference special-cases via
     inc32table/dec64table, lz4.c:2406-2418) to literal origins.
  6. One final gather materializes the bytes.

Safety contract parity: never reads/writes outside its fixed-size
buffers; malformed input sets a per-block error flag (the analog of the
reference's negative return codes, lz4.c:2442-2443).

Dictionary/linked-block support: an optional 64 KB history buffer
(right-aligned) occupies negative output coordinates, giving
LZ4_decompress_safe_usingDict semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lz4_tpu.constants import LZ4_DISTANCE_MAX

DICT_CAP = 65536  # static history window capacity (64 KB)


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(2, n)))))


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x, c[-1] if c.shape[0] else jnp.int32(0)


# -----------------------------------------------------------------------
# single-block decode (vmapped over a batch by decode_blocks)
# -----------------------------------------------------------------------

def _decode_one(comp, comp_len, dict_buf, dict_len, *, cap_out: int,
                has_dict: bool):
    cap_in = comp.shape[0]
    idx_in = jnp.arange(cap_in, dtype=jnp.int32)
    cu8 = comp
    c32 = comp.astype(jnp.int32)
    comp_len = comp_len.astype(jnp.int32)

    # ---- step 1: next non-255 byte at/after p (reverse cummin) ----------
    nn = jnp.where(c32 != 255, idx_in, jnp.int32(cap_in))
    nn = jax.lax.cummin(nn, axis=0, reverse=True)

    def gather_in(arr, i):
        return jnp.take(arr, jnp.clip(i, 0, cap_in - 1), axis=0)

    # ---- speculative token parse at every position ----------------------
    tok = c32
    lit_nib = tok >> 4
    mat_nib = tok & 15
    has_litext = lit_nib == 15
    q = gather_in(nn, idx_in + 1)                       # end of 255-chain
    ext_lit = 255 * (q - (idx_in + 1)) + gather_in(c32, q)
    # clip lengths to cap_out+1: keeps valid streams intact while making
    # the int32 prefix sums overflow-safe for malicious 255-chains
    litlen = jnp.minimum(lit_nib + jnp.where(has_litext, ext_lit, 0),
                         cap_out + 1)
    lit_start = jnp.where(has_litext, q + 1, idx_in + 1)
    lit_end = lit_start + litlen                        # offset field pos
    is_last = lit_end >= comp_len
    offset = gather_in(c32, lit_end) | (gather_in(c32, lit_end + 1) << 8)
    mo = lit_end + 2
    has_matext = mat_nib == 15
    q2 = gather_in(nn, mo)
    ext_mat = 255 * (q2 - mo) + gather_in(c32, q2)
    matchlen = jnp.minimum(4 + mat_nib + jnp.where(has_matext, ext_mat, 0),
                           cap_out + 1)
    next_p = jnp.where(has_matext, q2 + 1, mo)
    # token-level malformation (evaluated lazily: only reached tokens count)
    tok_bad = jnp.where(
        is_last,
        lit_end != comp_len,                      # literal run overruns
        (next_p > comp_len) | (offset == 0))
    f = jnp.where(is_last | tok_bad, jnp.int32(cap_in),
                  jnp.minimum(next_p, cap_in))

    # ---- step 2: orbit of 0 under f (gather-only binary lifting) --------
    # TPU scatters serialize, so instead of a reach-set scatter we build
    # jump tables F_k = f^(2^k) and greedily descend from 0 toward every
    # position p: the walk lands exactly on p iff p starts a real token.
    f_ext = jnp.concatenate([f, jnp.array([cap_in], jnp.int32)])
    n_levels = _ceil_log2(cap_in) + 1
    levels = [f_ext]
    for _ in range(n_levels - 1):
        levels.append(jnp.take(levels[-1], levels[-1]))
    cur = jnp.zeros(cap_in, jnp.int32)
    for k in range(n_levels - 1, -1, -1):
        nxt = jnp.take(levels[k], cur)
        cur = jnp.where(nxt <= idx_in, nxt, cur)
    tok_mask = (cur == idx_in) & (idx_in < comp_len)
    last_mask = tok_mask & is_last
    match_mask = tok_mask & ~is_last & ~tok_bad
    err = jnp.any(tok_mask & tok_bad)

    # ---- step 3: output placement ---------------------------------------
    contrib = jnp.where(
        tok_mask, litlen + jnp.where(is_last, 0, matchlen), 0)
    out_start, total_out = _exclusive_cumsum(contrib)
    match_out_start = out_start + litlen
    # first-crossing overflow check: contribs are clipped to <= cap_out+1,
    # so the first token exceeding cap_out is detected before any int32 wrap
    err |= jnp.any(tok_mask & (out_start + contrib > cap_out))
    err |= total_out > cap_out
    err |= jnp.sum(jnp.where(last_mask, 1, 0)) != 1
    # literal source must stay inside the input
    err |= jnp.any(tok_mask & (lit_end > comp_len))
    # match window check: o_start - offset >= -dict_len
    dlen = dict_len.astype(jnp.int32) if has_dict else jnp.int32(0)
    err |= jnp.any(match_mask & (match_out_start - offset < -dlen))
    err |= jnp.any(match_mask & (offset > LZ4_DISTANCE_MAX))

    # ---- step 4: per-output-byte source map ------------------------------
    # The token covering output byte o is the first position whose
    # inclusive output cumsum exceeds o (contrib is monotone), found with
    # a pure searchsorted — no scatters (TPU scatters serialize).
    o = jnp.arange(cap_out, dtype=jnp.int32)
    out_cum = out_start + contrib            # inclusive cumsum
    p_star = jnp.searchsorted(out_cum, o, side="right").astype(jnp.int32)
    p_star_c = jnp.clip(p_star, 0, cap_in - 1)

    def at_tok(v):
        return jnp.take(v, p_star_c)

    covered = (o < total_out) & (p_star < cap_in)
    t_off = o - at_tok(out_start)            # offset within the token
    l_len = jnp.where(covered, at_tok(litlen), 0)
    is_lit = covered & (t_off < l_len)
    lit_ptr = -(jnp.clip(at_tok(lit_start - out_start) + o,
                         0, cap_in - 1)) - 1

    is_mat = covered & ~is_lit & (t_off < at_tok(contrib))
    src_out = o - at_tok(offset)             # output coordinate (may be <0)
    # <0 ⇒ resolves into the dict window: encode as input/dict-resolved
    dict_code = -(cap_in + DICT_CAP + src_out) - 1   # src_out in [-DICT_CAP,0)
    mat_ptr = jnp.where(src_out >= 0, src_out, dict_code)

    ptr = jnp.where(is_lit, lit_ptr, jnp.where(is_mat, mat_ptr, -1))

    # ---- step 5: resolve match chains (pointer doubling) ----------------
    def chase(_, p):
        nxt = jnp.take(p, jnp.clip(p, 0, cap_out - 1))
        return jnp.where(p >= 0, nxt, p)

    ptr = jax.lax.fori_loop(0, _ceil_log2(cap_out), chase, ptr)

    # ---- step 6: materialize --------------------------------------------
    code = -ptr - 1
    from_input = code < cap_in
    in_bytes = jnp.take(cu8, jnp.clip(code, 0, cap_in - 1))
    if has_dict:
        dict_idx = jnp.clip(code - cap_in, 0, DICT_CAP - 1)
        d_bytes = jnp.take(dict_buf, dict_idx)
        out = jnp.where(from_input, in_bytes, d_bytes)
    else:
        err |= jnp.any((o < total_out) & ~from_input)
        out = in_bytes
    out = jnp.where(o < total_out, out, jnp.uint8(0))
    return out, total_out, err.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_out", "has_dict"))
def decode_blocks(comp, comp_lens, dict_bufs, dict_lens, *, cap_out: int,
                  has_dict: bool):
    """Batched block decode.

    comp:      uint8[B, cap_in]   zero-padded compressed blocks
    comp_lens: int32[B]
    dict_bufs: uint8[B, 65536]    right-aligned history (ignored unless
                                  has_dict)
    dict_lens: int32[B]
    returns (out uint8[B, cap_out], out_lens int32[B], errs int32[B])
    """
    fn = functools.partial(_decode_one, cap_out=cap_out, has_dict=has_dict)
    return jax.vmap(fn)(comp, comp_lens, dict_bufs, dict_lens)


# -----------------------------------------------------------------------
# convenience host API (bytes in/out) used by tests and the engine
# -----------------------------------------------------------------------

def decode_blocks_host(blocks, max_outs, dict_prefixes=None):
    """Decode a list of compressed blocks via the vectorized TPU path.
    Groups by capacity; returns list[bytes]. Raises on any error flag."""
    if not blocks:
        return []
    cap_in = max(len(b) for b in blocks)
    cap_in = max(cap_in, 16)
    cap_out = max(max_outs)
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
        jnp.asarray(dict_lens), cap_out=int(cap_out), has_dict=bool(has_dict))
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
