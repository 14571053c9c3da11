"""Round-3 decode kernel probes: cost split + dimension semantics.

HISTORICAL: the `par` stage wraps dp._decode_kernel with the PRE-v7
buffer conventions (no PAD row, words unstripped) and no longer
matches the shipped kernel ABI — its numbers are for the r2-era
kernel only. Use /tmp-style amortized probes (session_r3e.py) for
current measurements.

Stages (all on the real corpus, 32 x 64KB blocks, host-C-encoded
streams so the token mix is realistic):
  base    : decode_blocks_pallas full (the shipped r2 kernel)
  litonly : literal copies only (match copies disabled)
  nocopy  : parse only (the 153.8 MB/s floor check)
  par     : full kernel compiled with dimension_semantics=("parallel",)

Logs JSON lines to /tmp/sessR3D.log. Run: python tools/session_r3d.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = open(os.environ.get("LZ4_TPU_SESSION_LOG", "/tmp/sessR3D.log"), "a",
           buffering=1)


def log(**kw):
    kw["t"] = round(time.time(), 1)
    LOG.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from lz4_tpu.block import decode_pallas as dp
    from lz4_tpu.utils.realcorpus import real_corpus
    from lz4_tpu.block.backend import HostBackend

    BS = 65536
    B = 32
    data = real_corpus(B * BS)[: B * BS]
    blocks = [data[i: i + BS] for i in range(0, len(data), BS)]
    hb = HostBackend(nb_workers=0)
    comp = hb.compress_batch(blocks, level=1)
    cap_in = max(len(c) for c in comp)
    from lz4_tpu.constants import compress_bound
    cap_in = compress_bound(BS)
    carr = np.zeros((B, cap_in), np.uint8)
    clens = np.zeros(B, np.int32)
    for i, c in enumerate(comp):
        carr[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    cj = jnp.asarray(carr)
    lj = jnp.asarray(clens)
    n = B * BS
    log(event="setup", blocks=B, comp_total=int(clens.sum()))

    def bench(name, fn, check=False):
        try:
            t0 = time.time()
            r = fn()
            out = np.asarray(r[0])
            tc = time.time() - t0
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                r = fn()
                np.asarray(r[1][-1])   # dependent sync on olen
                np.asarray(r[0][-1, -1])
                best = min(best, time.perf_counter() - t0)
            mbs = n / 1e6 / best
            ok = None
            if check:
                out = np.asarray(r[0])
                ol = np.asarray(r[1])
                er = np.asarray(r[2])
                ok = (not er.any()) and all(
                    out[i, : ol[i]].tobytes() == blocks[i]
                    for i in range(B))
            log(event=name, compile_s=round(tc, 1), best_ms=round(best * 1e3, 1),
                MBs=round(mbs, 1), roundtrip=ok)
        except Exception as e:
            log(event=name + "_failed", error=str(e)[:1000])

    bench("base", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False), check=True)
    bench("litonly", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False, mode="litonly"))
    bench("nocopy", lambda: dp.decode_blocks_pallas(
        cj, lj, cap_out=BS, interpret=False, mode="nocopy"))

    # parallel dimension semantics (v5e has one TensorCore; expect ~flat,
    # but measure rather than assume)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @functools.partial(jax.jit, static_argnames=("cap_out",))
    def dec_par(comp32, comp_lens, dict32, dlens, *, cap_out):
        Bx, r_in, _ = comp32.shape
        LANES = dp.LANES
        r_out = -(-(cap_out) // LANES) + 2
        r_out += (-r_out) % 8
        W = r_in * LANES // 4
        b4 = comp32.reshape(Bx, 1, W, 4)
        words = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
                 | (b4[..., 3] << 24))
        kern = functools.partial(dp._decode_kernel, cap_out=cap_out,
                                 r_in=r_in, r_out=r_out, d0=0, mode="full")
        out, olen, errs = pl.pallas_call(
            kern,
            grid=(Bx,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r_in, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, r_out, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bx, r_out, LANES), jnp.int32),
                jax.ShapeDtypeStruct((Bx,), jnp.int32),
                jax.ShapeDtypeStruct((Bx,), jnp.int32),
            ],
            interpret=False,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(comp_lens.astype(jnp.int32), dlens.astype(jnp.int32), words,
          comp32, dict32)
        flat = out.reshape(Bx, r_out * LANES)[:, :cap_out].astype(jnp.uint8)
        return flat, olen, errs

    LANES = dp.LANES
    r_in = -(-(cap_in + LANES) // LANES)
    r_in += (-r_in) % 8
    pad = r_in * LANES - cap_in
    comp32 = jnp.pad(cj.astype(jnp.int32),
                     ((0, 0), (0, pad))).reshape(B, r_in, LANES)
    d32 = jnp.zeros((B, 1, LANES), jnp.int32)
    dl = jnp.zeros((B,), jnp.int32)
    bench("par", lambda: dec_par(comp32, lj, d32, dl, cap_out=BS),
          check=True)

    log(event="done")


if __name__ == "__main__":
    main()
