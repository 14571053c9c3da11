"""Pallas capability + cost probe for the codec's hot patterns.

Answers, on the real device:
  1. does a VECTOR dynamic gather (x[idx] for a full index vector) lower
     inside a TPU Pallas kernel, and how fast is it vs XLA's serialized
     HBM gather (~80 M elem/s)?
  2. how fast is a serial scalar hop loop over VMEM (the parse pattern:
     dependent 1-element loads), vs ~0.7 us/step through XLA?
  3. a fused multi-round chase (ptr <- ptr[ptr] doubling in VMEM).

Each probe is its own small program; failures are caught and reported so
one unsupported lowering doesn't kill the run.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    N = 65536            # one 64KB-block worth of int32 pointers
    B = 32
    rng = np.random.default_rng(3)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[-1:])

    def bench(name, fn, *xs, reps=5):
        try:
            r = fn(*xs)
            sync(r)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*xs)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:.2f} ms", flush=True)

    # ---- probe 1: vector dynamic gather in VMEM -------------------------
    def gather_kernel(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(p_ref[:], i_ref[:], axis=0)

    @jax.jit
    def pallas_gather(p, i):
        f = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        return jax.vmap(f)(p, i)

    p = jnp.asarray(rng.integers(0, N, (B, N), dtype=np.int32))
    gidx = jnp.asarray(rng.integers(0, N, (B, N), dtype=np.int32))
    bench("pallas_vmem_gather_32x64K", pallas_gather, p, gidx)

    # ---- probe 2: 8-round fused chase (doubling) in VMEM ----------------
    def chase_kernel(p_ref, o_ref):
        ptr = p_ref[:]
        for _ in range(8):
            nxt = jnp.take(ptr, jnp.clip(ptr, 0, N - 1).astype(jnp.int32),
                           axis=0)
            ptr = jnp.where(ptr >= 0, nxt, ptr)
        o_ref[:] = ptr

    @jax.jit
    def pallas_chase(p):
        f = pl.pallas_call(
            chase_kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        return jax.vmap(f)(p)

    # realistic chain structure: mostly terminals, some chains
    chain = rng.integers(-N, N, (B, N)).astype(np.int32)
    bench("pallas_chase8_32x64K", pallas_chase, jnp.asarray(chain))

    # ---- probe 3: serial scalar hop loop over VMEM (parse pattern) ------
    STEPS = 8192

    def hop_kernel(nm_ref, ml_ref, o_ref):
        def body(k, cur):
            step = ml_ref[cur]
            nxt = nm_ref[jnp.minimum(cur + step, N - 1)]
            o_ref[k] = cur
            return nxt

        jax.lax.fori_loop(0, STEPS, body, jnp.int32(0))

    @jax.jit
    def pallas_hops(nm, ml):
        f = pl.pallas_call(
            hop_kernel,
            out_shape=jax.ShapeDtypeStruct((STEPS,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        return jax.vmap(f)(nm, ml)

    nm = jnp.asarray(rng.integers(0, N - 1, (B, N), dtype=np.int32))
    ml = jnp.asarray(rng.integers(4, 12, (B, N), dtype=np.int32))
    bench(f"pallas_serial_hops_{STEPS}x{B}", pallas_hops, nm, ml)

    # XLA reference points for the same ops
    @jax.jit
    def xla_gather(p, i):
        return jax.vmap(jnp.take)(p, i)

    bench("xla_gather_32x64K", xla_gather, p, gidx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
