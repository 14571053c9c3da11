"""Pallas capability + cost probe for the codec's hot patterns (v2 —
TPU tiling-aware: all operands are (rows, 128) 2-D, since Mosaic
requires the last two dims (8,128)-aligned).

Probes, each its own small program (failures reported, not fatal):
  1. take_along_axis along lanes (col-gather within each row)
  2. flat 64K gather via in-kernel reshape + jnp.take
  3. row-gather (dynamic sublane gather)
  4. fused 8-round chase via whatever gather pattern works
  5. serial scalar hop loop (the parse pattern) via (1,1) dynamic slices
Reference: the XLA HBM gather of the same volume (~20-26 ms at 32x64K).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R, C = 512, 128          # 64K int32 per block as (512, 128)
N = R * C
B = 32


def main() -> None:
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(3)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[-1:])

    def bench(name, fn, *xs, reps=5):
        try:
            r = fn(*xs)
            sync(r)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            return False
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*xs)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:.2f} ms", flush=True)
        return True

    def call(kernel, n_in, out_shape):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    x2d = jnp.asarray(rng.integers(0, 2**31, (B, R, C), dtype=np.int32))
    col_idx = jnp.asarray(rng.integers(0, C, (B, R, C), dtype=np.int32))
    flat_idx = jnp.asarray(rng.integers(0, N, (B, R, C), dtype=np.int32))
    row_idx = jnp.asarray(rng.integers(0, R, (B, R, C), dtype=np.int32))

    # ---- 1: lane gather (take_along_axis, axis=-1) ----------------------
    def k_lane(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def lane_gather(x, i):
        f = call(k_lane, 2, jax.ShapeDtypeStruct((R, C), jnp.int32))
        return jax.vmap(f)(x, i)

    bench("p1_lane_gather(take_along_axis)", lane_gather, x2d, col_idx)

    # ---- 2: flat gather via reshape + take ------------------------------
    def k_flat(x_ref, i_ref, o_ref):
        flat = x_ref[:].reshape(-1)
        o_ref[:] = jnp.take(flat, i_ref[:].reshape(-1),
                            axis=0).reshape(R, C)

    @jax.jit
    def flat_gather(x, i):
        f = call(k_flat, 2, jax.ShapeDtypeStruct((R, C), jnp.int32))
        return jax.vmap(f)(x, i)

    ok_flat = bench("p2_flat_gather(reshape+take)", flat_gather, x2d,
                    flat_idx)

    # ---- 3: row gather (dynamic sublane gather, axis=0) -----------------
    def k_row(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    @jax.jit
    def row_gather(x, i):
        f = call(k_row, 2, jax.ShapeDtypeStruct((R, C), jnp.int32))
        return jax.vmap(f)(x, i)

    bench("p3_row_gather(take_along_axis0)", row_gather, x2d, row_idx)

    # ---- 4: fused 8-round chase (only if flat gather works) -------------
    if ok_flat:
        def k_chase(p_ref, o_ref):
            ptr = p_ref[:].reshape(-1)
            for _ in range(8):
                nxt = jnp.take(ptr, jnp.clip(ptr, 0, N - 1), axis=0)
                ptr = jnp.where(ptr >= 0, nxt, ptr)
            o_ref[:] = ptr.reshape(R, C)

        @jax.jit
        def chase(p):
            f = call(k_chase, 1, jax.ShapeDtypeStruct((R, C), jnp.int32))
            return jax.vmap(f)(p)

        chain = jnp.asarray(
            rng.integers(-N, N, (B, R, C)).astype(np.int32))
        bench("p4_chase8_fused", chase, chain)

    # ---- 5: serial scalar hops (parse pattern) --------------------------
    STEPS = 8192

    def k_hops(nm_ref, ml_ref, o_ref):
        def body(k, cur):
            r = cur // C
            c = cur % C
            step = ml_ref[r, c]
            nxt_lin = jnp.minimum(cur + step, N - 1)
            nxt = nm_ref[nxt_lin // C, nxt_lin % C]
            o_ref[k // C, k % C] = cur
            return nxt

        jax.lax.fori_loop(0, STEPS, body, jnp.int32(0))

    @jax.jit
    def hops(nm, ml):
        f = call(k_hops, 2,
                 jax.ShapeDtypeStruct((STEPS // C, C), jnp.int32))
        return jax.vmap(f)(nm, ml)

    nm = jnp.asarray(rng.integers(0, N - 1, (B, R, C), dtype=np.int32))
    ml = jnp.asarray(rng.integers(4, 12, (B, R, C), dtype=np.int32))
    bench(f"p5_serial_hops_{STEPS}x{B}", hops, nm, ml)

    # ---- XLA reference --------------------------------------------------
    @jax.jit
    def xla_gather(x, i):
        return jax.vmap(lambda a, b: jnp.take(a.reshape(-1),
                                              b.reshape(-1)))(x, i)

    bench("xla_flat_gather", xla_gather, x2d, flat_idx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
