"""Full frame-option interop matrix vs the reference CLI, both
directions — the analog of the reference's cross-version suite
(tests/test-lz4-versions.py) at the option-matrix level."""
import itertools
import os

import pytest

from conftest import needs_oracle
import ref_oracle
from lz4_tpu.cli import main as cli_main
from lz4_tpu.utils.datagen import mixed_corpus


def run_cli(*args):
    return cli_main(["lz4-tpu", "--backend", "host", *map(str, args)])


MATRIX = list(itertools.product(
    ["-1", "-9"],                  # level
    ["", "-BD"],                   # linked blocks
    ["", "-BX"],                   # block checksums
    ["", "--content-size"],
    ["", "--no-frame-crc"],
))


@needs_oracle
@pytest.mark.parametrize("flags", MATRIX,
                         ids=["_".join(f for f in m if f) or "default"
                              for m in MATRIX])
def test_ours_to_reference(flags, tmp_path):
    data = mixed_corpus(150000, seed=hash(flags) % 1000)
    src = tmp_path / "d.bin"
    src.write_bytes(data)
    dst = tmp_path / "d.lz4"
    args = [f for f in flags if f]
    assert run_cli("-f", *args, src, dst) == 0
    out = tmp_path / "d.out"
    r = ref_oracle.ref_cli(["-d", "-f", str(dst), str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data
    # and the reference must accept it in test mode (checksum checks)
    r = ref_oracle.ref_cli(["-t", str(dst)])
    assert r.returncode == 0, r.stderr


REF_MATRIX = list(itertools.product(
    ["-1", "-12"],
    ["", "-BD"],
    ["", "-BX"],
    ["-B4", "-B7"],
))


@needs_oracle
@pytest.mark.parametrize("flags", REF_MATRIX,
                         ids=["_".join(f for f in m if f) for m in REF_MATRIX])
def test_reference_to_ours(flags, tmp_path):
    data = mixed_corpus(150000, seed=hash(flags) % 1000 + 7)
    src = tmp_path / "r.bin"
    src.write_bytes(data)
    dst = tmp_path / "r.lz4"
    args = [f for f in flags if f]
    r = ref_oracle.ref_cli(["-f", *args, str(src), str(dst)])
    assert r.returncode == 0, r.stderr
    out = tmp_path / "r.out"
    assert run_cli("-d", "-f", dst, out) == 0
    assert out.read_bytes() == data
