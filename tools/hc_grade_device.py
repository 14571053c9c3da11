"""Device-HC size parity grader: the Pallas chain kernel vs the
reference encoder on 64 KB blocks of the graded corpora. Also times
the kernel (RTT-amortized).

Usage: python tools/hc_grade_device.py [--levels 3,5,7,9] [--mb 2]
       [--depths 12,24,...]  (override K_DEPTH for the sweep)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="3,5,7,9")
    ap.add_argument("--mb", type=int, default=2)
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--depths", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="grade in interpret mode on CPU (sizes are "
                    "platform-independent)")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    import ref_oracle
    assert ref_oracle.ensure_built()
    from lz4_tpu.block import encode_hc_pallas as hc
    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.utils.datagen import gen_text, mixed_corpus
    from lz4_tpu.utils.realcorpus import real_corpus

    if args.depths:
        d = [int(x) for x in args.depths.split(",")]
        assert len(d) == len(levels)
        kd = list(hc.K_DEPTH)
        for lv, dd in zip(levels, d):
            kd[lv] = dd
        hc.K_DEPTH = tuple(kd)

    nb = args.mb * 1024 * 1024
    bs = args.block
    corpora = {
        "real": real_corpus(nb)[:nb],
        "text": gen_text(nb, seed=11),
        "mixed": mixed_corpus(nb, seed=11),
    }

    def blocks_of(data):
        return [data[i: i + bs] for i in range(0, len(data) - len(data) % bs, bs)]

    ref_sizes = {}
    for cname, data in corpora.items():
        for lv in levels:
            key = (cname, lv)
            ref_sizes[key] = sum(
                len(ref_oracle.ref_compress_block(b, lv))
                for b in blocks_of(data))

    print(f"{'level':>5} {'depth':>5} " +
          " ".join(f"{c:>10}" for c in corpora) + f" {'worst':>10} "
          f"{'MBs':>7}")
    for lv in levels:
        row = []
        mbs = None
        for cname, data in corpora.items():
            blks = blocks_of(data)
            B = len(blks)
            arr = np.zeros((B, bs), np.uint8)
            lens = np.zeros(B, np.int32)
            for i, bb in enumerate(blks):
                arr[i, : len(bb)] = np.frombuffer(bb, np.uint8)
                lens[i] = len(bb)
            aj, lj = jnp.asarray(arr), jnp.asarray(lens)
            out, csz, _ = hc.encode_blocks_hc_pallas(
                aj, lj, cap_n=bs, level=lv, interpret=args.cpu)
            csz_np = np.asarray(csz)
            out_np = np.asarray(out)
            # verify round trip on the first block
            dec = decompress_block(
                out_np[0, : csz_np[0]].tobytes(), bs)
            assert dec == blks[0], f"roundtrip {cname} lvl{lv}"
            row.append(int(csz_np.sum()) / ref_sizes[(cname, lv)])
            if cname == "real":
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    rs = [hc.encode_blocks_hc_pallas(
                        aj, lj, cap_n=bs, level=lv, interpret=args.cpu)
                        for _ in range(4)]
                    np.asarray(rs[-1][1][-1])
                    best = min(best, time.perf_counter() - t0)
                mbs = B * bs / 1e6 / ((best - 0.0245) / 4)
        print(f"{lv:>5} {hc.K_DEPTH[lv]:>5} " +
              " ".join(f"{r:>10.5f}" for r in row) +
              f" {max(row):>10.5f} {mbs:>7.1f}")


if __name__ == "__main__":
    main()
