"""Round-4 probe: sublane-parallel (S-blocks-per-step) decode primitives.

The round-3 verdict: the serial kernels are scalar-issue-bound at
~180 ns/sequence with the VPU idle, and K-interleave of SCALAR state
machines measured flat (still scalar-bound). The one unexplored axis is
moving the parse ALU onto the VPU: S blocks per grid step, state and
parse vectorized across sublanes, with only the dynamic-slice
load/store addresses staying scalar.

This probe measures the primitives that design depends on (amortized
over ASYNC_N dispatches with one dependent sync, minus one ~24.5 ms
relay RTT — see CLAUDE.md measurement discipline):

  a) scalar<->vector crossing: build a (1,8) vector from 8 scalar carry
     values, one vector op, extract 8 scalars back — per loop step.
  b) per-row dynamic rotation of (8,384) int32 via 9 static-roll+select
     stages (the log-shift gather used for vector parse/window align).
  c) 8 per-block dynamic-slice loads (3,128) + stores (2,128) at
     scalar-dependent rows.
  d) full mock sequence step: 8 word-slab loads -> stack (8,384) ->
     per-row rotate -> extract 2 lanes -> ~40-op vector parse ALU ->
     extract 5 scalars x 8 -> 8x (lit window load+rot+store) ->
     8x (match window load+rot+store). Projected ns/seq = step/8.
  e) same as (d) but with vector state carried in the loop ((1,8)
     arrays) and only addresses extracted.

Run: python tools/session_r4probe.py  (add --cpu for interpret-ish CPU
check). Logs JSON lines to /tmp/sessR4P.log.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR4P.log"), "a",
           buffering=1)

RTT = 0.0245          # measured fixed relay round-trip (CLAUDE.md)
ASYNC_N = 8


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    on_cpu = "--cpu" in sys.argv
    if on_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 8
    ROWS = 520                      # ~66 KB of bytes per block
    NIT = int(os.environ.get("LZ4_TPU_P4_NIT", "65536"))
    rng = np.random.default_rng(0)
    data_np = rng.integers(0, 255, (S, ROWS, 128), dtype=np.int32)
    data = jnp.asarray(data_np)
    nvec = jnp.full((S,), NIT, jnp.int32)

    def run(kern, name, n_steps, reps=4, extra_in=None, interpret=on_cpu):
        ins = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec(memory_space=pltpu.VMEM)]
        args = [nvec, data]
        if extra_in is not None:
            ins.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(extra_in)
        try:
            f = pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=ins,
                out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                           pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((S,), jnp.int32),
                           jax.ShapeDtypeStruct((S, 8, 128), jnp.int32)],
                interpret=interpret,
                compiler_params=None if interpret else
                pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            )
            fj = jax.jit(lambda *a: f(*a))
            t0 = time.time()
            r = fj(*args)
            np.asarray(r[0])
            tc = time.time() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                outs = [fj(*args) for _ in range(ASYNC_N)]
                np.asarray(outs[-1][0][-1])      # dependent sync
                dt = (time.perf_counter() - t0 - RTT) / ASYNC_N
                best = min(best, dt)
            log(event=name, compile_s=round(tc, 1), best_s=round(best, 5),
                ns_per_step=round(best / n_steps * 1e9, 2),
                ns_per_seq=round(best / n_steps / S * 1e9, 2))
            return best
        except Exception as e:  # noqa: BLE001
            log(event=name + "_failed", error=str(e)[:1500])
            return None

    lane384 = jax.lax.broadcasted_iota(jnp.int32, (S, 384), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def rot_rows(slab, amt):
        """Per-row left-rotation of (S, W) by amt (S,1) via log-shift."""
        W = slab.shape[1]
        sh = 1
        while sh < W:
            bit = (amt & sh) != 0
            slab = jnp.where(bit, pltpu.roll(slab, W - sh, 1), slab)
            sh <<= 1
        return slab

    # ---- a) scalar<->vector crossing --------------------------------
    def k_a(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, *ps = st
            vec = jnp.concatenate(
                [p.reshape(1, 1) for p in ps], axis=1)          # (1, 8)
            vec = (vec * 3 + 1) & 0xFFFF
            outs = [vec[0, i] for i in range(S)]
            return (it + 1, *outs)

        st = jax.lax.while_loop(lambda st: st[0] < n, body,
                                (jnp.int32(0),) + tuple(
                                    jnp.int32(i) for i in range(S)))
        for i in range(S):
            o_ref[i] = st[1 + i]
        ov_ref[...] = jnp.zeros((S, 8, 128), jnp.int32)

    run(k_a, "a_scalar_vector_cross", NIT)

    # ---- a2) baseline: same loop all-scalar --------------------------
    def k_a2(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, *ps = st
            outs = [(p * 3 + 1) & 0xFFFF for p in ps]
            return (it + 1, *outs)

        st = jax.lax.while_loop(lambda st: st[0] < n, body,
                                (jnp.int32(0),) + tuple(
                                    jnp.int32(i) for i in range(S)))
        for i in range(S):
            o_ref[i] = st[1 + i]
        ov_ref[...] = jnp.zeros((S, 8, 128), jnp.int32)

    run(k_a2, "a2_scalar_baseline", NIT)

    # ---- b) per-row rotation of (8,384) ------------------------------
    def k_b(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, acc = st
            slab = d_ref[:, 0, :].reshape(S, 128)
            slab = jnp.concatenate([slab, slab, slab], axis=1)   # (8,384)
            amt = (acc[:, 0:1] + it) & 255
            r = rot_rows(slab, amt)
            return it + 1, acc + r[:, 0:128]

        _, acc = jax.lax.while_loop(
            lambda st: st[0] < n, body,
            (jnp.int32(0), jnp.zeros((S, 128), jnp.int32)))
        for i in range(S):
            o_ref[i] = acc[i, 0]
        ov_ref[...] = jnp.zeros((S, 8, 128), jnp.int32)

    run(k_b, "b_row_rotation_384", NIT)

    # ---- c) 8 per-block dynamic loads + stores -----------------------
    def k_c(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, acc, *ps = st
            slabs = [d_ref[s, pl.ds(jnp.minimum(ps[s] % 500, 500), 3), :]
                     for s in range(S)]
            tot = acc
            for s in range(S):
                ov_ref[s, 0:2, :] = slabs[s][0:2, :]
                tot = tot + slabs[s][0, 0]
            outs = [(ps[s] + 7 + (tot & 3)) & 0xFFFF for s in range(S)]
            return (it + 1, tot, *outs)

        st = jax.lax.while_loop(lambda st: st[0] < n, body,
                                (jnp.int32(0), jnp.int32(0)) + tuple(
                                    jnp.int32(i * 13) for i in range(S)))
        for i in range(S):
            o_ref[i] = st[1]

    run(k_c, "c_block_loads_stores", NIT)

    # ---- d) full mock sequence step ----------------------------------
    def mock_step_scalar_state(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, acc, *ps = st
            # 1) words slab load per block (1,3,128) at scalar rows
            rows = [jnp.minimum(ps[s] // 512, ROWS - 4) for s in range(S)]
            slabs = [d_ref[s, pl.ds(rows[s], 3), :].reshape(1, 384)
                     for s in range(S)]
            slab = jnp.concatenate(slabs, axis=0)               # (8,384)
            # 2) per-row rotate by byte offset within the slab
            amt = jnp.concatenate(
                [((ps[s] // 4) % 128).reshape(1, 1) for s in range(S)],
                axis=0)                                          # (8,1)
            r = rot_rows(slab, amt)
            w0 = r[:, 0:1]
            w1 = r[:, 1:2]
            # 3) vector parse ALU (~40 ops worth)
            litnib = (w0 >> 4) & 15
            matnib = w0 & 15
            e0 = (w0 >> 8) & 255
            e1 = (w0 >> 16) & 255
            lit15 = litnib == 15
            lx2 = lit15 & (e0 == 255)
            litlen = jnp.where(lit15, 15 + e0 + jnp.where(lx2, e1, 0),
                               litnib)
            offset = (w1 & 0xFFFF) | 1
            m0 = (w1 >> 16) & 255
            m15 = matnib == 15
            mext = jnp.where(m15, m0, 0)
            mlen = 4 + matnib + mext
            adv = 3 + litlen + lit15.astype(jnp.int32) \
                + lx2.astype(jnp.int32) + m15.astype(jnp.int32)
            overlap = mlen > offset
            serr = (litlen + mlen) > 65536
            nxt = jnp.where(serr, adv, adv + (overlap.astype(jnp.int32)))
            # 4) extract scalars back (5 per block)
            nxts = [nxt[s, 0] for s in range(S)]
            lits = [litlen[s, 0] for s in range(S)]
            offs = [offset[s, 0] for s in range(S)]
            mls = [mlen[s, 0] for s in range(S)]
            # 5) lit window: load (3,128) per block, batch-rotate, store
            lrows = [jnp.minimum((ps[s] + lits[s]) // 128, ROWS - 4)
                     for s in range(S)]
            lsl = jnp.concatenate(
                [d_ref[s, pl.ds(lrows[s], 3), :].reshape(1, 384)
                 for s in range(S)], axis=0)
            lam = jnp.concatenate(
                [(lits[s] % 128).reshape(1, 1) for s in range(S)], axis=0)
            lrot = rot_rows(lsl, lam)
            for s in range(S):
                ov_ref[s, 0:2, :] = lrot[s, 0:256].reshape(2, 128)
            # 6) match window: load, batch-rotate, store
            mrows = [jnp.minimum((ps[s] + offs[s]) % 500, 500)
                     for s in range(S)]
            msl = jnp.concatenate(
                [d_ref[s, pl.ds(mrows[s], 3), :].reshape(1, 384)
                 for s in range(S)], axis=0)
            mam = jnp.concatenate(
                [(mls[s] % 128).reshape(1, 1) for s in range(S)], axis=0)
            mrot = rot_rows(msl, mam)
            for s in range(S):
                ov_ref[s, 2:4, :] = mrot[s, 0:256].reshape(2, 128)
            outs = [(ps[s] + jnp.maximum(nxts[s] & 63, 1)) & 0xFFFF
                    for s in range(S)]
            return (it + 1, acc + nxt[0, 0], *outs)

        st = jax.lax.while_loop(lambda st: st[0] < n, body,
                                (jnp.int32(0), jnp.int32(0)) + tuple(
                                    jnp.int32(i * 29) for i in range(S)))
        for i in range(S):
            o_ref[i] = st[1]

    run(mock_step_scalar_state, "d_mock_step_scalar_state", NIT)

    # ---- e) mock step, vector state (only addresses extracted) -------
    def mock_step_vec_state(n_ref, d_ref, o_ref, ov_ref):
        n = n_ref[0]

        def body(st):
            it, pvec = st                                       # (8,1)
            ps = [pvec[s, 0] for s in range(S)]
            rows = [jnp.minimum(ps[s] // 512, ROWS - 4) for s in range(S)]
            slab = jnp.concatenate(
                [d_ref[s, pl.ds(rows[s], 3), :].reshape(1, 384)
                 for s in range(S)], axis=0)
            amt = (pvec // 4) % 128
            r = rot_rows(slab, amt)
            w0 = r[:, 0:1]
            w1 = r[:, 1:2]
            litnib = (w0 >> 4) & 15
            lit15 = litnib == 15
            e0 = (w0 >> 8) & 255
            litlen = jnp.where(lit15, 15 + e0, litnib)
            offset = (w1 & 0xFFFF) | 1
            mlen = 4 + (w0 & 15)
            adv = 3 + litlen + lit15.astype(jnp.int32)
            # literal + match windows with addresses extracted only
            lrow_v = (pvec + litlen) // 128
            mrow_v = (pvec + offset) % 500
            lsl = jnp.concatenate(
                [d_ref[s, pl.ds(jnp.minimum(lrow_v[s, 0], ROWS - 4), 3),
                       :].reshape(1, 384) for s in range(S)], axis=0)
            lrot = rot_rows(lsl, litlen % 128)
            msl = jnp.concatenate(
                [d_ref[s, pl.ds(jnp.minimum(mrow_v[s, 0], 500), 3),
                       :].reshape(1, 384) for s in range(S)], axis=0)
            mrot = rot_rows(msl, mlen % 128)
            for s in range(S):
                ov_ref[s, 0:2, :] = lrot[s, 0:256].reshape(2, 128)
                ov_ref[s, 2:4, :] = mrot[s, 0:256].reshape(2, 128)
            nxt = (pvec + jnp.maximum(adv & 63, 1)) & 0xFFFF
            return it + 1, nxt

        _, pvec = jax.lax.while_loop(
            lambda st: st[0] < n, body,
            (jnp.int32(0),
             jnp.arange(S, dtype=jnp.int32).reshape(S, 1) * 29))
        for i in range(S):
            o_ref[i] = pvec[i, 0]

    run(mock_step_vec_state, "e_mock_step_vec_state", NIT)

    log(event="done")


if __name__ == "__main__":
    main()
