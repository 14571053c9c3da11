"""Standalone frame validator (tools/checkframe.py, checkFrame.c
analog): valid frames of every kind pass, corrupted structures fail."""
import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import checkframe  # noqa: E402

from lz4_tpu.frame.writer import compress_frame  # noqa: E402
from lz4_tpu.utils.datagen import gen_text  # noqa: E402


def _write(tmp_path, name, data):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_valid_frames(tmp_path):
    data = gen_text(200_000, seed=1)
    fr = compress_frame(data)
    skip = b"\x50\x2a\x4d\x18" + struct.pack("<I", 6) + b"meta!!"
    p = _write(tmp_path, "multi.lz4", skip + fr + fr)
    frames = checkframe.check_file(p)
    assert [f["type"] for f in frames] == ["skippable", "lz4f", "lz4f"]
    assert frames[1]["blocks"] >= 1


def test_legacy_frame(tmp_path):
    from lz4_tpu.frame.writer import compress_legacy_frame
    p = _write(tmp_path, "l.lz4",
               compress_legacy_frame(gen_text(50_000, seed=2), 1))
    frames = checkframe.check_file(p)
    assert frames[0]["type"] == "legacy"
    assert frames[0]["blocks"] >= 1


@pytest.mark.parametrize("mutate", ["magic", "hc", "reserved", "trunc"])
def test_invalid_frames(tmp_path, mutate):
    fr = bytearray(compress_frame(gen_text(50_000, seed=3)))
    if mutate == "magic":
        fr[0] ^= 0xFF
    elif mutate == "hc":
        # header checksum byte (after FLG+BD, no csize/dictid here)
        fr[6] ^= 0xFF
    elif mutate == "reserved":
        fr[4] |= 0x02            # reserved FLG bit
    else:
        fr = fr[: len(fr) // 2]
    p = _write(tmp_path, "bad.lz4", bytes(fr))
    with pytest.raises(checkframe.FrameError):
        checkframe.check_file(p)
