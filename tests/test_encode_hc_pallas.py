"""Pallas HC chain kernel: correctness + size bar at the engine-routed
levels (interpret mode on the forced-CPU suite; tools/hc_grade_device.py
is the on-chip grading run)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4_tpu.block.encode_hc_pallas import encode_blocks_hc_pallas  # noqa: E402
from lz4_tpu.block.ref_codec import decompress_block  # noqa: E402
from lz4_tpu.utils.datagen import gen_buffer, gen_text  # noqa: E402


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
