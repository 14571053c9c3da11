"""Per-level HC size parity grader: ours vs the reference CLI/lib on
64 KB blocks of the graded corpora (real files, text, mixed). Prints a
table of ours/reference total compressed size per level.

Usage: python tools/hc_grade.py [--levels 2,3,...,12] [--mb 4]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,3,5,7,9,10,11,12")
    ap.add_argument("--mb", type=int, default=4)
    ap.add_argument("--block", type=int, default=65536)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import ref_oracle
    assert ref_oracle.ensure_built()
    from lz4_tpu import native
    from lz4_tpu.utils.datagen import gen_text, mixed_corpus
    from lz4_tpu.utils.realcorpus import real_corpus

    codec = native.blockcodec
    nb = args.mb * 1024 * 1024
    corpora = {
        "real": real_corpus(nb),
        "text": gen_text(nb, seed=11),
        "mixed": mixed_corpus(nb, seed=11),
    }
    bs = args.block
    print(f"{'level':>5} " + " ".join(f"{k:>10}" for k in corpora)
          + f" {'worst':>10}")
    for lv in levels:
        row = []
        for name, data in corpora.items():
            data = data[: len(data) - len(data) % bs]
            ours = theirs = 0
            for i in range(0, len(data), bs):
                blk = data[i: i + bs]
                ours += len(codec.compress_hc(blk, level=lv))
                theirs += len(ref_oracle.ref_compress_block(blk, lv))
            row.append(ours / theirs)
        print(f"{lv:>5} " + " ".join(f"{r:>10.5f}" for r in row)
              + f" {max(row):>10.5f}", flush=True)


if __name__ == "__main__":
    main()
