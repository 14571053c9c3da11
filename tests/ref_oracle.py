"""Test-only bridge to the reference liblz4 / lz4 CLI (built out-of-tree in
/tmp/refbuild). Used exclusively as an interop oracle — the analog of the
reference's test-lz4-versions.py cross-version checks. Skipped when absent.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

REF_BUILD = os.environ.get("LZ4_REF_BUILD", "/tmp/refbuild")
REF_CLI = os.path.join(REF_BUILD, "lz4")
REF_LIB = os.path.join(REF_BUILD, "liblz4.so")
REF_SRC = os.environ.get("LZ4_REF_SRC", "/root/reference")

_lib = None


def ensure_built() -> bool:
    """Build the reference out-of-tree if sources exist; return True when
    the oracle is usable."""
    global _lib
    if os.path.exists(REF_CLI) and os.path.exists(REF_LIB):
        return True
    if not os.path.isdir(os.path.join(REF_SRC, "build", "cmake")):
        return False
    if shutil.which("cmake") is None:
        return False
    try:
        subprocess.run(["cmake", "-S", os.path.join(REF_SRC, "build", "cmake"),
                        "-B", REF_BUILD, "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True, timeout=300)
        subprocess.run(["cmake", "--build", REF_BUILD, "-j8"],
                       check=True, capture_output=True, timeout=600)
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(REF_CLI)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(REF_LIB)
        _lib.LZ4_compress_default.restype = ctypes.c_int
        _lib.LZ4_compress_default.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                              ctypes.c_int, ctypes.c_int]
        _lib.LZ4_compress_HC.restype = ctypes.c_int
        _lib.LZ4_compress_HC.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib.LZ4_decompress_safe.restype = ctypes.c_int
        _lib.LZ4_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                             ctypes.c_int, ctypes.c_int]
        _lib.LZ4_decompress_safe_usingDict.restype = ctypes.c_int
        _lib.LZ4_decompress_safe_usingDict.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        # the reference may namespace xxhash symbols (XXH_NAMESPACE=LZ4_)
        for sym in ("XXH32", "LZ4_XXH32"):
            try:
                fn = getattr(_lib, sym)
            except AttributeError:
                continue
            fn.restype = ctypes.c_uint32
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
            _lib._xxh32 = fn
            break
        else:
            _lib._xxh32 = None
    return _lib


def ref_compress_block(data: bytes, level: int = 1) -> bytes:
    bound = len(data) + len(data) // 255 + 16
    dst = ctypes.create_string_buffer(bound)
    if level >= 2:
        n = lib().LZ4_compress_HC(data, dst, len(data), bound, level)
    else:
        n = lib().LZ4_compress_default(data, dst, len(data), bound)
    assert n > 0, "reference compression failed"
    return dst.raw[:n]


def ref_decompress_block(comp: bytes, max_out: int,
                         dict_prefix: bytes | None = None) -> bytes:
    dst = ctypes.create_string_buffer(max(max_out, 1))
    if dict_prefix:
        n = lib().LZ4_decompress_safe_usingDict(
            comp, dst, len(comp), max_out, dict_prefix, len(dict_prefix))
    else:
        n = lib().LZ4_decompress_safe(comp, dst, len(comp), max_out)
    if n < 0:
        raise ValueError(f"reference decoder rejected stream ({n})")
    return dst.raw[:n]


def ref_xxh32(data: bytes, seed: int = 0) -> int:
    fn = lib()._xxh32
    if fn is None:
        import pytest
        pytest.skip("reference liblz4 does not export XXH32")
    return fn(data, len(data), seed)


def ref_cli(args: list[str], stdin: bytes | None = None) -> subprocess.CompletedProcess:
    return subprocess.run([REF_CLI] + args, input=stdin, capture_output=True)
