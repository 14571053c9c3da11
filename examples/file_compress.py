"""File compression via the lz4file-style wrappers — the
examples/fileCompress.c analog."""
import os
import sys

from lz4_tpu.frame.file import open_frame


def main(path):
    with open(path, "rb") as fin, open_frame(path + ".lz4", "wb") as fout:
        while True:
            chunk = fin.read(1 << 20)
            if not chunk:
                break
            fout.write(chunk)
    with open_frame(path + ".lz4", "rb") as fin:
        data = fin.read()
    assert data == open(path, "rb").read()
    print(f"{path}: {os.path.getsize(path)} -> "
          f"{os.path.getsize(path + '.lz4')} bytes, verified")


if __name__ == "__main__":
    main(sys.argv[1])
