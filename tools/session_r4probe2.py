"""Round-4 probe #2: 128-LANE wavefront decode primitives (dynamic_gather).

Discovery driving this probe: this jax's Mosaic lowering maps
jnp.take_along_axis on a 2D array to tpu.dynamic_gather along EITHER
axis (jax/_src/pallas/mosaic/lowering.py:2464-2523), and the op's
semantics are full-reach "indices mod M" over the gathered dimension.
Axis-0 (cross-sublane, per-lane row index) is exactly the per-lane
memory access a block-per-lane decoder needs — the prior S=8 sublane
probe (session_r4probe.py) was built on per-block dynamic slices +
log-shift rotation and measured flat (~180 ns/seq); this one tests the
per-LANE primitives:

  c0  correctness: axis0 (8,128), axis1 (8,128), 2-step arbitrary
      4KB-window gather, axis0 (64,128)/(512,128) — vs numpy (mod reach)
  t*  throughput, amortized 8 async dispatches + 1 dependent sync - RTT:
      t_base     empty loop + index derivation (subtract from others)
      t_a0_8     axis0 gather on (8,128)       [8 words/lane/call]
      t_a1_8     axis1 gather on (8,128)
      t_2step    axis1+axis0 pair = arbitrary gather from 4KB window
      t_a0_64    axis0 on (64,128)  — window-size cost scaling
      t_a0_512   axis0 on (512,128) — the 2KB/lane match near-window
      t_a0_4096  axis0 on (4096,128) — the far-window tier
      t_onehot   one-hot multiply+reduce over (512,128) (fallback)
      t_wave     mock wavefront row step: comp fetch (2-step pair) +
                 ~40-op parse ALU + near-window match gather +
                 boundary selects + dense row store
                 -> ns/row; MB/s = 512 bytes / ns/row

Run: python tools/session_r4probe2.py [--cpu]   (CPU = correctness only)
Logs JSON lines to /tmp/sessR4P2.log.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR4P2.log"), "a",
           buffering=1)
RTT = 0.0245
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

    log(event="start", platform=jax.devices()[0].platform,
        cpu_flag=on_cpu)

    NIT = int(os.environ.get("LZ4_TPU_P42_NIT", "65536"))
    rng = np.random.default_rng(7)

    def ta(x, idx, axis):
        return jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape), axis)

    # ---------------- correctness kernels (single shot) ----------------
    def check(name, rows, fn, expect_fn, idx_np):
        src_np = rng.integers(0, 2**30, (rows, 128), dtype=np.int32)

        def kern(s_ref, i_ref, o_ref):
            o_ref[:] = fn(s_ref[:], i_ref[:])

        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                interpret=on_cpu,
            )
            got = np.asarray(f(jnp.asarray(src_np), jnp.asarray(idx_np)))
            want = expect_fn(src_np, idx_np)
            ok = bool((got == want).all())
            log(event=f"c_{name}", ok=ok,
                mismatch=int((got != want).sum()))
            return ok
        except Exception as e:  # lowering rejection is a result too
            log(event=f"c_{name}_failed", error=str(e)[:600])
            return False

    # axis0, in-range indices
    idx8 = rng.integers(0, 8, (8, 128)).astype(np.int32)
    ok_a0 = check("a0_8", 8, lambda s, i: ta(s, i, 0),
                  lambda s, i: np.take_along_axis(s, i % 8, 0), idx8)
    # axis0, OUT of range (mod semantics on TPU; skip on CPU: XLA clamps)
    if not on_cpu:
        idx8o = (idx8 + 16).astype(np.int32)
        check("a0_8_mod", 8, lambda s, i: ta(s, i, 0),
              lambda s, i: np.take_along_axis(s, i % 8, 0), idx8o)
    # axis1
    idx1 = rng.integers(0, 128, (8, 128)).astype(np.int32)
    ok_a1 = check("a1_8", 8, lambda s, i: ta(s, i, 1),
                  lambda s, i: np.take_along_axis(s, i % 128, 1), idx1)
    # 2-step arbitrary gather from a 4KB window: flat w = 128*s + c
    wflat = rng.integers(0, 1024, (8, 128)).astype(np.int32)

    def two_step(s, w):
        # one word per lane: broadcast lane-indices from row 0 (the 8
        # output rows all gather the same word; a column-major window
        # layout turns the intermediate full-column into 8 consecutive
        # words per lane instead — same op cost)
        c = jnp.broadcast_to(w[0:1, :] % 128, s.shape)
        r = jnp.broadcast_to((w[0:1, :] // 128) % 8, s.shape)
        b = ta(s, c, 1)                # B[i,j] = s[i, c[j]]
        return ta(b, r, 0)             # out[i,j] = s[r[j], c[j]]

    def two_step_np(s, w):
        return s[(w[0:1, :] // 128) % 8, w[0:1, :] % 128] * \
            np.ones((8, 1), np.int32)

    ok_2s = check("2step", 8, two_step, two_step_np, wflat)
    # axis0 on bigger windows
    ok_a0_64 = check("a0_64", 64, lambda s, i: ta(s, i, 0),
                     lambda s, i: np.take_along_axis(s, i % 64, 0),
                     rng.integers(0, 64, (64, 128)).astype(np.int32))
    ok_a0_512 = check("a0_512", 512, lambda s, i: ta(s, i, 0),
                      lambda s, i: np.take_along_axis(s, i % 512, 0),
                      rng.integers(0, 512, (512, 128)).astype(np.int32))

    if on_cpu:
        log(event="done_cpu_correctness")
        return

    # ---------------- throughput harness ----------------
    def bench(name, kern, rows, n_iter, extra_scratch=None, reps=3):
        src_np = rng.integers(0, 2**30, (rows, 128), dtype=np.int32)
        scratch = extra_scratch or []
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                scratch_shapes=scratch,
            )
            x = jnp.asarray(src_np)
            t0 = time.time()
            r = f(x)
            _ = np.asarray(r[0, 0])
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                rs = [f(x) for _ in range(ASYNC_N)]
                _ = np.asarray(rs[-1][0, 0])    # dependent sync
                dt = (time.perf_counter() - t0 - RTT) / ASYNC_N
                best = min(best, dt)
            log(event=name, compile_s=round(compile_s, 1),
                per_call_ms=round(best * 1e3, 3),
                ns_per_iter=round(best / n_iter * 1e9, 2))
            return best / n_iter
        except Exception as e:
            log(event=name + "_failed", error=str(e)[:600])
            return None

    def mk_loop(body_fn, n_iter):
        """Loop kernel: carry acc (8,128); body_fn(src, acc, i) -> acc."""
        def kern(s_ref, o_ref):
            src = s_ref[:8, :]

            def body(i, acc):
                return body_fn(s_ref, acc, i)

            acc0 = src
            o_ref[:] = jax.lax.fori_loop(0, n_iter, body, acc0)
        return kern

    # baseline: index derivation + acc update, no gather
    def b_base(s_ref, acc, i):
        idx = (acc + i) & 7
        return acc ^ idx

    t_base = bench("t_base", mk_loop(b_base, NIT), 8, NIT)

    def b_a0_8(s_ref, acc, i):
        idx = (acc + i) & 7
        g = ta(s_ref[:8, :], idx, 0)
        return acc ^ g

    t_a0_8 = bench("t_a0_8", mk_loop(b_a0_8, NIT), 8, NIT)

    def b_a1_8(s_ref, acc, i):
        idx = (acc + i) & 127
        g = ta(s_ref[:8, :], idx, 1)
        return acc ^ g

    bench("t_a1_8", mk_loop(b_a1_8, NIT), 8, NIT)

    def b_2step(s_ref, acc, i):
        w = (acc + i) & 1023
        g = two_step(s_ref[:8, :], w)
        return acc ^ g

    t_2step = bench("t_2step", mk_loop(b_2step, NIT), 8, NIT)

    def mk_a0_big(rows):
        def b(s_ref, acc, i):
            idx = (acc + i) % rows
            g = ta(s_ref[:], jnp.broadcast_to(idx[0:1, :], (rows, 128)), 0)
            return acc ^ g[:8, :]
        return b

    n64 = NIT
    bench("t_a0_64", mk_loop(mk_a0_big(64), n64), 64, n64)
    n512 = NIT // 4
    t_a0_512 = bench("t_a0_512", mk_loop(mk_a0_big(512), n512), 512, n512)
    n4k = NIT // 32
    bench("t_a0_4096", mk_loop(mk_a0_big(4096), n4k), 4096, n4k)

    # one-hot multiply + sublane reduce over (512,128)
    def b_onehot(s_ref, acc, i):
        idx = (acc[0:1, :] + i) % 512
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        oh = (rows == idx).astype(jnp.int32)
        g = jnp.sum(oh * s_ref[:], axis=0, keepdims=True)
        return acc ^ g

    bench("t_onehot", mk_loop(b_onehot, n512), 512, n512)

    # ---------------- mock wavefront row step ----------------
    # per iteration: 1 comp-window fetch (2-step pair x2 for unaligned),
    # ~40-op parse ALU, near-window match gather (axis0 on 512 rows),
    # ~20 bookkeeping ops, one dense row store.
    NW = NIT // 8

    def wave_kern(s_ref, o_ref, out_scr):
        def body(i, acc):
            # comp fetch: two adjacent words per lane from a 4KB window
            w = (acc + i) & 1023
            g0 = two_step(s_ref[:8, :], w)
            g1 = two_step(s_ref[:8, :], (w + 1) & 1023)
            # parse ALU ~40 vector ops
            t = g0
            for sh in (4, 8, 12, 16, 20):
                t = t ^ ((g1 >> sh) & 255)
                t = t + ((g0 >> sh) & 15)
                t = jnp.where((t & 1) > 0, t + g1, t - g0)
            # near-window match gather from out history (512 rows)
            midx = jnp.broadcast_to((t[0:1, :] + i) % 512, (512, 128))
            mg = ta(out_scr[:], midx, 0)[:8, :]
            # phase combine + boundary selects (~15 ops)
            v = jnp.where((t & 2) > 0, mg, g0)
            v = (v << 8) | (mg & 255)
            v = v ^ (g1 & t)
            # dense row store at advancing q
            q = i & 511
            out_scr[pl.ds(q, 1), :] = v[0:1, :]
            return acc ^ v

        acc0 = s_ref[:8, :]
        o_ref[:] = jax.lax.fori_loop(0, NW, body, acc0)

    def wave_call():
        src_np = rng.integers(0, 2**30, (8, 128), dtype=np.int32)
        try:
            f = pl.pallas_call(
                wave_kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                scratch_shapes=[pltpu.VMEM((512, 128), jnp.int32)],
            )
            x = jnp.asarray(src_np)
            t0 = time.time()
            _ = np.asarray(f(x)[0, 0])
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [f(x) for _ in range(ASYNC_N)]
                _ = np.asarray(rs[-1][0, 0])
                dt = (time.perf_counter() - t0 - RTT) / ASYNC_N
                best = min(best, dt)
            ns_row = best / NW * 1e9
            log(event="t_wave", compile_s=round(compile_s, 1),
                ns_per_row=round(ns_row, 1),
                mbs_projected=round(512.0 / ns_row * 1000.0, 1))
        except Exception as e:
            log(event="t_wave_failed", error=str(e)[:600])

    wave_call()
    log(event="done")


if __name__ == "__main__":
    main()
