"""Pallas serial-block LZ4 decoder — the wildcopy design on TPU.

The sort/scan decoder (decode_jax.py) is bound by XLA's batched
full-width passes (~22 ms per 32x64K gather, ~1-2 ms per sort lane,
docs/tpu_perf_notes.md); its per-byte cost is architectural. This
kernel takes the opposite corner: ONE block per grid step, decoded
sequentially in VMEM exactly like the reference's hot loop
(LZ4_decompress_generic, lz4.c:2022-2445), with the TPU twist that
every copy is a 128-lane vector op:

  * parsing runs on the SCALAR unit: the compressed block is passed a
    second time as 4-bytes-per-int32 words in SMEM, and token/length/
    offset reads are plain scalar loads + shifts — measured ~12 cycles
    per byte extract (tools/session_pallas_probe3.py), an order of
    magnitude under any vector-extract scheme. This mirrors the
    reference's scalar hot loop (lz4.c:2022-2445) directly;
  * the output block lives in VMEM as a one-byte-per-lane int32 array
    (R, 128) — 8-bit tiling constraints never apply — and the VPU only
    ever runs COPIES:
  * a "window read" fetches 128 consecutive bytes at ANY byte offset:
    one (2, 128) two-row load + two lane rolls + a select;
  * short copies (<= 128 bytes, the overwhelming majority) are ONE
    masked read-modify-write of a (2, 128) slab — the analog of the
    reference's wildCopy8/32 (lz4.c:463-572); long copies fall back to
    a per-row loop;
  * overlap matches (offset < 128) replicate a period pattern with a
    lane-local dynamic_gather — the vector generalization of the
    reference's inc32table/dec64table trick (lz4.c:2406-2418); far
    matches use the same gather with a straight index, so the match
    path is uniform: one window + one gather + one RMW.

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


def _decode_kernel(len_ref, dlen_ref, words_ref, comp_ref, dict_ref,
                   out_ref, olen_ref, err_ref, *, cap_out: int,
                   r_in: int, r_out: int, d0: int = 0,
                   mode: str = "full"):
    """One block per grid step. words_ref: (1, 1, W) int32 SMEM — the
    compressed bytes packed 4/word little-endian (scalar parse side);
    comp_ref: (1, r_in, 128) int32 bytes VMEM (literal copy side);
    out_ref: (1, r_out, 128) int32 bytes; len/olen/err: SMEM scalars.
    d0 > 0 is dict/linked mode: dict_ref (1, d0//128, 128) holds the
    right-aligned history, copied into the first output rows so match
    sources reach it transparently (lz4.c:2461-2508 usingDict analog);
    decoded bytes start at byte d0."""
    b = pl.program_id(0)
    M = len_ref[b]
    n_words = r_in * LANES // 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # flat byte index over a (2, 128) slab
    fi2 = (jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
           + LANES * jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 0))
    ow = jnp.int32(d0 + cap_out)
    if d0:
        low = d0 - jnp.minimum(dlen_ref[b], d0)  # first valid history byte
        out_ref[0, 0: d0 // LANES, :] = dict_ref[0]
    else:
        low = jnp.int32(0)

    def rbyte(q):
        """Scalar byte read from the packed SMEM copy (clamped)."""
        q = jnp.clip(q, 0, 4 * n_words - 1)
        return (words_ref[0, 0, q >> 2] >> (8 * (q & 3))) & 255

    def window(ref, pos, rmax):
        """128 consecutive bytes of ref starting at byte pos (clamped);
        w[0, j] = ref_bytes[pos + j]. The clamp keeps the 2-row slab
        load inside the ref for ANY pos (legit positions never clamp:
        both buffers carry >= 1 spare row past their data)."""
        pos = jnp.clip(pos, 0, (rmax - 2) * LANES)
        row = pos // LANES
        l = pos % LANES
        slab = ref[0, pl.ds(row, 2), :]                  # (2, 128)
        r0 = pltpu.roll(slab[0:1, :], -l, 1)
        r1 = pltpu.roll(slab[1:2, :], -l, 1)
        return jnp.where(lane < LANES - l, r0, r1)       # (1, 128)

    def ext_len(pos, enable):
        """Resolve a 255-chain: scalar loads until a byte != 255.
        Returns (total extra, end position past the chain). enable=False
        runs zero iterations (nibble < 15 costs nothing)."""
        def body(st):
            q, acc, _go = st
            v = rbyte(q)
            return q + 1, acc + v, v == 255

        q, acc, _ = jax.lax.while_loop(
            lambda st: st[2], body, (pos, jnp.int32(0), enable))
        return acc, q

    def rmw_short(v2, dst, n):
        """Write bytes dst..dst+n-1 (n <= 128) from the (2, 128) value
        slab v2 (indexed by flat offset from dst's row base) through a
        masked read-modify-write."""
        row = jnp.clip(dst // LANES, 0, r_out - 2)
        start = dst % LANES
        m = (fi2 >= start) & (fi2 < start + n)
        old = out_ref[0, pl.ds(row, 2), :]
        out_ref[0, pl.ds(row, 2), :] = jnp.where(m, v2, old)

    def gather8(w, idx2):
        """val[r, j] = w[0, idx2[r, j]] for the first 2 rows (Mosaic's
        dynamic_gather wants equal operand/index shapes; (8, 128) is
        the native tile)."""
        idx8 = jnp.clip(jnp.concatenate(
            [idx2, jnp.zeros((6, LANES), jnp.int32)]), 0, LANES - 1)
        return jnp.take_along_axis(
            jnp.broadcast_to(w, (8, LANES)), idx8, axis=1)[0:2, :]

    def copy_long(src_ref, src_rmax, src0, dst0, length, off):
        """Row-walking fallback for copies > 128 bytes. off==0 → plain
        forward copy; 0<off<128 → periodic pattern from a seed window
        (chunks of 128 are safe for off >= 128: every chunk's source
        precedes its dest)."""
        pat_w = window(src_ref, src0, src_rmax)
        small = (off > 0) & (off < LANES)

        def body(st):
            cur, rem = st
            row = cur // LANES
            start = cur % LANES
            n = jnp.minimum(LANES - start, rem)
            w = pltpu.roll(
                window(src_ref, src0 + (cur - dst0), src_rmax), start, 1)
            offs = jnp.maximum(off, 1)
            c0 = jnp.where(small, (cur - start - src0) % offs, 0)
            idx = (c0 + lane) % offs
            pv = jnp.take_along_axis(
                jnp.broadcast_to(pat_w, (8, LANES)),
                jnp.broadcast_to(jnp.clip(idx, 0, LANES - 1), (8, LANES)),
                axis=1)[0:1, :]
            v = jnp.where(small, pv, w)
            m = (lane >= start) & (lane < start + n)
            rowc = jnp.clip(row, 0, r_out - 1)
            old = out_ref[0, pl.ds(rowc, 1), :]
            out_ref[0, pl.ds(rowc, 1), :] = jnp.where(m, v, old)
            return cur + n, rem - n

        jax.lax.while_loop(lambda st: st[1] > 0, body,
                           (dst0, jnp.maximum(length, 0)))

    def seq_body(st):
        p, o, err, done = st
        # ---- scalar parse (SMEM loads only; lz4.c:2279-2335) -------------
        tok = rbyte(p)
        litnib = tok >> 4
        matnib = tok & 15
        extra, q = ext_len(p + 1, litnib == 15)
        litlen = jnp.where(litnib == 15, 15 + extra, litnib)
        lit_start = q
        lit_end = lit_start + litlen
        offset = rbyte(lit_end) | (rbyte(lit_end + 1) << 8)
        extra2, q2 = ext_len(lit_end + 2,
                             (lit_end < M) & (matnib == 15))
        mlen = MINMATCH + jnp.where(matnib == 15, 15 + extra2, matnib)
        next_p = jnp.where(matnib == 15, q2, lit_end + 2)

        is_last = lit_end >= M
        # parsing restrictions — mirror decode_jax._parse_tokens
        # (reference analog lz4.c:2279-2318); o is d0-based in dict mode
        err = err | (is_last & (lit_end != M)) | ((o + litlen) > ow)

        # ---- literal copy ------------------------------------------------
        if mode != "nocopy":
            do_lit = ~err & (litlen > 0)
            # short path: one comp window at lit_start, rolled into dest
            # phase (the mod-128 wrap makes the (2,128) broadcast exact)
            lit_short = litlen <= LANES

            @pl.when(do_lit & lit_short)
            def _():
                start = o % LANES
                wl = window(comp_ref, lit_start, r_in)
                rolled = pltpu.roll(wl, start, 1)
                rmw_short(jnp.broadcast_to(rolled, (2, LANES)), o, litlen)

            @pl.when(do_lit & ~lit_short)
            def _():
                copy_long(comp_ref, r_in, lit_start, o, litlen,
                          jnp.int32(0))
        o_mid = o + litlen

        # ---- match half (absent on the last sequence) ---------------------
        bad_mid = (next_p > M) | (offset == 0) | (lit_end > M - 8)
        err = err | (~is_last & ~done & bad_mid)
        do_match = ~is_last & ~err & ~done
        err = err | (do_match & ((o_mid - offset) < low))
        err = err | (do_match & ((o_mid + mlen) > ow))
        err = err | (do_match & (o_mid > ow - 12))
        do_match = do_match & ~err

        if mode not in ("nocopy", "litonly"):
            small = offset < LANES
            src0 = o_mid - offset

            @pl.when(do_match & (mlen <= LANES) & ~small)
            def _():
                # far match (no overlap inside the slab): exactly the
                # literal path — window at src0 rolled into dest phase
                start = o_mid % LANES
                w_m = window(out_ref, src0, r_out)
                rolled = pltpu.roll(w_m, start, 1)
                rmw_short(jnp.broadcast_to(rolled, (2, LANES)),
                          o_mid, mlen)

            @pl.when(do_match & (mlen <= LANES) & small)
            def _():
                # overlap match: periodic pattern via lane-local gather
                w_m = window(out_ref, src0, r_out)
                start = o_mid % LANES
                rowbase = o_mid - start
                offs = jnp.maximum(offset, 1)
                idx_p = (rowbase + fi2 - src0) % offs
                v2 = gather8(w_m, idx_p)
                rmw_short(v2, o_mid, mlen)

            @pl.when(do_match & (mlen > LANES))
            def _():
                copy_long(out_ref, r_out, src0, o_mid, mlen, offset)

        o_next = jnp.where(do_match, o_mid + mlen,
                           jnp.where(err, o, o_mid))
        done = done | is_last | err
        return next_p, o_next, err, done

    def seq_cond(st):
        p, _, err, done = st
        return (p < M) & ~err & ~done

    p, o, err, done = jax.lax.while_loop(
        seq_cond, seq_body,
        (jnp.int32(0), jnp.int32(d0), M < 0, M < 0))
    err = err | ~done                    # truncated / endless stream
    olen_ref[b] = jnp.where(err, 0, o - d0)
    err_ref[b] = err.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_out", "interpret",
                                             "mode", "d0"))
def _decode_pallas_raw(comp32, comp_lens, dict32, dlens, *, cap_out: int,
                       interpret: bool, mode: str = "full", d0: int = 0):
    B, r_in, _ = comp32.shape
    r_out = -(-(d0 + cap_out) // LANES) + 2
    r_out += (-r_out) % 8
    # scalar-parse copy: the same bytes packed 4/word little-endian,
    # one (1, 1, W) SMEM block per grid step
    W = r_in * LANES // 4
    b4 = comp32.reshape(B, 1, W, 4)
    words = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
             | (b4[..., 3] << 24))
    kern = functools.partial(_decode_kernel, cap_out=cap_out,
                             r_in=r_in, r_out=r_out, d0=d0, mode=mode)
    out, olen, errs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r_in, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, max(d0 // LANES, 1), LANES),
                         lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, r_out, LANES), lambda i: (i, 0, 0)),
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
    flat = out.reshape(B, r_out * LANES)[:, d0: d0 + cap_out] \
        .astype(jnp.uint8)
    return flat, olen, errs


def decode_blocks_pallas(comp, comp_lens, dict_bufs=None, dict_lens=None,
                         *, cap_out: int, interpret: bool | None = None,
                         mode: str = "full"):
    """Batched block decode on the serial-kernel path.

    Same contract as decode_jax.decode_blocks:
    comp uint8[B, cap_in], comp_lens int32[B],
    dict_bufs uint8[B, 65536] right-aligned history (or None),
    dict_lens int32[B] →
    (out uint8[B, cap_out], out_lens int32[B], errs int32[B]).
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, cap_in = comp.shape
    r_in = -(-(cap_in + LANES) // LANES)
    r_in += (-r_in) % 8
    pad = r_in * LANES - cap_in
    comp32 = jnp.pad(comp.astype(jnp.int32),
                     ((0, 0), (0, pad))).reshape(B, r_in, LANES)
    has_dict = dict_bufs is not None
    d0 = 65536 if has_dict else 0
    if has_dict:
        dict32 = dict_bufs.astype(jnp.int32).reshape(
            B, d0 // LANES, LANES)
        dlens = dict_lens
    else:
        dict32 = jnp.zeros((B, 1, LANES), jnp.int32)
        dlens = jnp.zeros((B,), jnp.int32)
    return _decode_pallas_raw(comp32, comp_lens, dict32, dlens,
                              cap_out=cap_out, interpret=bool(interpret),
                              mode=mode, d0=d0)
