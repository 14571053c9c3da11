"""Batched XXH32 on device — jnp scan formulation + Pallas TPU kernel.

XXH32 (the checksum used throughout the LZ4 frame format) consumes
16-byte stripes with four rotating accumulators — sequential along a
stream but embarrassingly parallel across blocks. Both implementations
below process a batch [B, cap] in lockstep: the stripe loop is a scan
(jnp) / fori_loop (Pallas) with a [B, 4] carry; tails and avalanche are
masked elementwise math. Used for per-block checksums (frame BX flag)
and device-side integrity verification without transferring decoded
data back to the host.

Spec: xxHash32 as vendored by the reference (lib/xxhash.c:263-300);
values cross-checked against liblz4's namespaced XXH32 in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

P1 = np.uint32(2654435761)
P2 = np.uint32(2246822519)
P3 = np.uint32(3266489917)
P4 = np.uint32(668265263)
P5 = np.uint32(374761393)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def _round(acc, w):
    acc = acc + w * P2
    return _rotl(acc, 13) * P1


def xxh32_blocks(data, lens, seed=0, *, cap: int):
    """XXH32 of each row of data[:, :cap] (uint8), lengths lens[B].

    Returns uint32[B]. cap must be a multiple of 16 (pad with zeros —
    bytes past lens are ignored).
    """
    if isinstance(seed, int):           # avoid int32 overflow at trace
        seed = np.uint32(seed)
    return _xxh32_blocks_jit(data, lens, seed, cap=cap)


@functools.partial(jax.jit, static_argnames=("cap",))
def _xxh32_blocks_jit(data, lens, seed, *, cap: int):
    assert cap % 16 == 0
    B = data.shape[0]
    d32 = data.astype(jnp.uint32)
    # little-endian u32 words [B, cap//4]
    w = (d32[:, 0::4] | (d32[:, 1::4] << 8) | (d32[:, 2::4] << 16)
         | (d32[:, 3::4] << 24))
    lens = lens.astype(jnp.uint32)
    if isinstance(seed, int):           # avoid int32 overflow at trace
        seed = np.uint32(seed)
    seed = jnp.asarray(seed, jnp.uint32)
    n_stripes = cap // 16
    stripes = w.reshape(B, n_stripes, 4).transpose(1, 0, 2)  # [S, B, 4]

    init = jnp.stack([
        jnp.full(B, seed + P1 + P2, jnp.uint32),
        jnp.full(B, seed + P2, jnp.uint32),
        jnp.full(B, seed, jnp.uint32),
        jnp.full(B, seed - P1, jnp.uint32),
    ], axis=1)                                               # [B, 4]
    sidx = jnp.arange(n_stripes, dtype=jnp.uint32)

    def step(acc, xs):
        s, ws = xs
        # only stripes fully inside the length participate
        active = ((s + 1) * 16 <= lens)[:, None]
        upd = _round(acc, ws)
        return jnp.where(active, upd, acc), None

    acc, _ = jax.lax.scan(
        step, init, (jnp.broadcast_to(sidx[:, None], (n_stripes, B)),
                     stripes))
    return _finalize(acc, w, d32, lens, seed, cap)


# ---------------------------------------------------------------------------
# Pallas TPU kernel variant (stripe loop in VMEM)
# ---------------------------------------------------------------------------

def _xxh32_kernel(w_ref, lens_ref, seed_ref, out_ref, *, n_stripes: int):
    """w_ref: uint32[n_stripes*4, 128] — word k of stripe s for lane
    (block) b lives at row s*4+k; lens_ref: uint32[1, 128];
    out_ref: uint32[4, 128] accumulators.

    The stripe loop advances 8 rows (2 stripes) per step so dynamic
    slices stay tile-aligned (int32 sublane tile = 8). Tail + avalanche
    are cheap XLA elementwise ops done by the wrapper."""
    seed = seed_ref[0]
    lens = lens_ref[0, :]
    lanes = lens.shape[0]
    acc0 = jnp.full((lanes,), seed + P1 + P2, jnp.uint32)
    acc1 = jnp.full((lanes,), seed + P2, jnp.uint32)
    acc2 = jnp.full((lanes,), seed, jnp.uint32)
    acc3 = jnp.full((lanes,), seed - P1, jnp.uint32)

    def body(s, accs):
        a0, a1, a2, a3 = accs
        rows = w_ref[pl.ds(pl.multiple_of(s * 8, 8), 8), :]  # 2 stripes
        for half in range(2):
            stripe = 2 * s + half
            act = (stripe + 1) * jnp.uint32(16) <= lens
            n0 = _round(a0, rows[4 * half + 0, :])
            n1 = _round(a1, rows[4 * half + 1, :])
            n2 = _round(a2, rows[4 * half + 2, :])
            n3 = _round(a3, rows[4 * half + 3, :])
            a0 = jnp.where(act, n0, a0)
            a1 = jnp.where(act, n1, a1)
            a2 = jnp.where(act, n2, a2)
            a3 = jnp.where(act, n3, a3)
        return a0, a1, a2, a3

    a0, a1, a2, a3 = jax.lax.fori_loop(
        0, n_stripes // 2, body, (acc0, acc1, acc2, acc3))
    out_ref[0, :] = a0
    out_ref[1, :] = a1
    out_ref[2, :] = a2
    out_ref[3, :] = a3


try:  # Pallas import is optional (CPU interpret mode used in tests)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def xxh32_blocks_pallas(data, lens, seed=0, *, cap: int,
                        interpret: bool = False):
    """Pallas-kernel XXH32 accumulators + XLA finalization.
    cap must be a multiple of 32; the batch is padded to 128 lanes."""
    assert HAVE_PALLAS and cap % 32 == 0
    B = data.shape[0]
    Bp = -(-B // 128) * 128
    d32 = data.astype(jnp.uint32)
    w = (d32[:, 0::4] | (d32[:, 1::4] << 8) | (d32[:, 2::4] << 16)
         | (d32[:, 3::4] << 24))
    lens32 = lens.astype(jnp.uint32)
    if isinstance(seed, int):
        seed = np.uint32(seed)
    n_stripes = cap // 16
    # lane layout: word k of stripe s at row s*4+k, one block per lane
    wl = jnp.pad(w, ((0, Bp - B), (0, 0))).reshape(
        Bp, n_stripes, 4).transpose(1, 2, 0).reshape(n_stripes * 4, Bp)
    lens_l = jnp.pad(lens32, (0, Bp - B)).reshape(1, Bp)
    grid = (Bp // 128,)
    accs = pl.pallas_call(
        functools.partial(_xxh32_kernel, n_stripes=n_stripes),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((4, Bp), jnp.uint32),
        in_specs=[pl.BlockSpec((n_stripes * 4, 128),
                               lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((4, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wl, lens_l, jnp.full((1,), seed, jnp.uint32))
    accs = accs[:, :B].T                     # [B, 4]
    return _finalize(accs, w, d32, lens32, jnp.uint32(seed), cap)


def _finalize(acc, w, d32, lens, seed, cap):
    big = lens >= 16
    h_big = (_rotl(acc[:, 0], 1) + _rotl(acc[:, 1], 7)
             + _rotl(acc[:, 2], 12) + _rotl(acc[:, 3], 18))
    h = jnp.where(big, h_big, seed + P5) + lens
    tail_start = (lens // 16) * 16
    nw = (lens - tail_start) // 4
    widx = tail_start // 4
    for k in range(3):
        wk = jnp.take_along_axis(
            w, jnp.minimum(widx + k, w.shape[1] - 1)[:, None].astype(
                jnp.int32), axis=1)[:, 0]
        h = jnp.where(nw > k, _rotl(h + wk * P3, 17) * P4, h)
    bstart = tail_start + nw * 4
    nb = lens - bstart
    for k in range(3):
        bk = jnp.take_along_axis(
            d32, jnp.minimum(bstart + k, cap - 1)[:, None].astype(
                jnp.int32), axis=1)[:, 0]
        h = jnp.where(nb > k, _rotl(h + bk * P5, 11) * P1, h)
    h = (h ^ (h >> 15)) * P2
    h = (h ^ (h >> 13)) * P3
    return h ^ (h >> 16)
