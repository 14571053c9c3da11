"""Pallas HC chain kernel: correctness + size bar at the engine-routed
levels (interpret mode on the forced-CPU suite; tools/hc_grade_device.py
is the on-chip grading run)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4_tpu.block.encode_hc_pallas import encode_blocks_hc_pallas  # noqa: E402
from lz4_tpu.block.ref_codec import decompress_block  # noqa: E402
from lz4_tpu.utils.datagen import gen_buffer, gen_text, mixed_corpus  # noqa: E402


def _batch(srcs):
    cap = max(len(s) for s in srcs)
    B = len(srcs)
    arr = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(srcs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    return jnp.asarray(arr), jnp.asarray(lens), cap


@pytest.mark.parametrize("level", [3, 4, 9])
def test_roundtrip_and_size(level):
    rng = np.random.default_rng(31)
    srcs = [gen_text(8192, seed=1), gen_buffer(8192, match_prob=0.7,
                                               seed=2),
            b"\x00" * 4096, bytes(range(256)) * 32,
            gen_text(300, seed=3), rng.bytes(2048),
            b"ab" * 3000]
    aj, lj, cap = _batch(srcs)
    out, csz, _ = encode_blocks_hc_pallas(aj, lj, cap_n=cap,
                                          level=level, interpret=True)
    out, csz = np.asarray(out), np.asarray(csz)
    from lz4_tpu import native
    for i, s in enumerate(srcs):
        comp = out[i, : csz[i]].tobytes()
        assert decompress_block(comp, len(s)) == s
        # at the routed levels the kernel must be at/under the host HC
        # tier on compressible inputs (the host tier is <= reference)
        host = len(native.blockcodec.compress_hc(s, level=level))
        assert csz[i] <= host * 1.03, (i, csz[i], host)


def test_engine_routes_device_hc(monkeypatch):
    monkeypatch.setenv("LZ4_TPU_PALLAS_CPU", "1")
    from lz4_tpu.parallel.engine import TpuBackend
    be = TpuBackend()
    blocks = [gen_text(8192, seed=7), gen_buffer(8192, match_prob=0.6,
                                                 seed=8)]
    comp = be.compress_batch(blocks, level=3)
    for c, s in zip(comp, blocks):
        assert decompress_block(c, len(s)) == s
    # levels outside the device tier still work (host fallback)
    comp9 = be.compress_batch(blocks, level=9)
    for c, s in zip(comp9, blocks):
        assert decompress_block(c, len(s)) == s
        assert len(c) <= len(s)


def test_hc_pallas_byte_parity_with_host_lazy():
    """The kernel's state-machine parse (Search2/Search3 + pattern
    analysis) must produce BYTE-IDENTICAL streams to the host lazy
    chain tier (compress_lazy, native/hccodec.c) at the same search
    depth — and that tier grades byte-identical to the reference's
    hashChain levels. Transitively this pins device HC 3-9 to the
    reference (round-3 verdict #4)."""
    from lz4_tpu import native
    from lz4_tpu.block.encode_hc_pallas import K_DEPTH
    bc = native.blockcodec
    corp = [
        ("text", gen_text(30000, seed=31)),
        ("mixed", mixed_corpus(30000, seed=32)),
        ("rle", gen_buffer(30000, match_prob=0.97, seed=33)),
        ("zeros", b"\x00" * 20000),                # pattern analysis
        ("periodic", b"abab" * 5000 + b"Q" + b"abab" * 2000),
        ("random", bytes(np.random.default_rng(34).integers(
            0, 256, 8000, dtype=np.uint8))),
        ("short", gen_text(200, seed=35)),
    ]
    for level in (3, 5, 9):
        srcs = [c for _, c in corp]
        cap = max(len(s) for s in srcs)
        src = np.zeros((len(srcs), cap), np.uint8)
        lens = np.zeros(len(srcs), np.int32)
        for i, s in enumerate(srcs):
            src[i, : len(s)] = np.frombuffer(s, np.uint8)
            lens[i] = len(s)
        out, csizes, _ = encode_blocks_hc_pallas(
            jnp.asarray(src), jnp.asarray(lens), cap_n=cap,
            level=level, interpret=True)
        out = np.asarray(out)
        csizes = np.asarray(csizes)
        for i, (name, s) in enumerate(corp):
            want = bc.compress_lazy(s, K_DEPTH[level])
            got = out[i, : csizes[i]].tobytes()
            assert got == want, (
                f"level {level} corpus {name}: device {len(got)}B != "
                f"host lazy {len(want)}B (first diff at "
                f"{next((j for j in range(min(len(got), len(want))) if got[j] != want[j]), -1)})")
