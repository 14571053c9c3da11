"""In-memory frame round trip — the examples/simple_buffer.c analog."""
from lz4_tpu.frame.reader import decompress_frame
from lz4_tpu.frame.writer import compress_frame


def main():
    src = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 50)
    comp = compress_frame(src, store_content_size=True)
    print(f"compressed {len(src)} -> {len(comp)} bytes "
          f"({100.0 * len(comp) / len(src):.1f}%)")
    back = decompress_frame(comp)
    assert back == src
    print("round trip OK")


if __name__ == "__main__":
    main()
