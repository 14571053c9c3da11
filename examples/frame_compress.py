"""Streaming frame compression — the frameCompress.c analog.

Drives the incremental LZ4F-style API (begin/update/end + push
decompressor) over arbitrary chunk sizes, with block checksums on.
"""
import io

from lz4_tpu.frame.format import FrameInfo, Preferences
from lz4_tpu.frame.reader import FrameDecompressor
from lz4_tpu.frame.writer import FrameCompressor
from lz4_tpu.utils.datagen import mixed_corpus

CHUNK = 16 * 1024


def main():
    src = mixed_corpus(1024 * 1024, seed=5)
    prefs = Preferences(frame_info=FrameInfo(
        block_size_id=5, block_checksum=True, content_checksum=True))

    comp = FrameCompressor(prefs, level=1)
    out = io.BytesIO()
    out.write(comp.begin())
    for i in range(0, len(src), CHUNK):
        out.write(comp.update(src[i: i + CHUNK]))
    out.write(comp.end())
    blob = out.getvalue()

    dec = FrameDecompressor()
    back = io.BytesIO()
    for i in range(0, len(blob), 777):         # any push granularity
        out_bytes, _consumed = dec.feed(blob[i: i + 777])
        back.write(out_bytes)
    assert dec.frame_done and back.getvalue() == src
    print(f"frame: {len(src)} -> {len(blob)} bytes "
          f"({100.0 * len(blob) / len(src):.1f}%), "
          "block checksums verified: OK")


if __name__ == "__main__":
    main()
