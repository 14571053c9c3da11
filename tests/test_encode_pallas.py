"""Pallas serial-block encoder: correctness + format validity
(interpret mode on the forced-CPU suite; the same kernel lowers via
Mosaic on TPU — tools/session_pallas_encode.py is the on-device run)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4_tpu import native  # noqa: E402
from lz4_tpu.block.encode_pallas import encode_blocks_pallas  # noqa: E402
from lz4_tpu.block.ref_codec import decompress_block  # noqa: E402
from lz4_tpu.constants import compress_bound  # noqa: E402
from lz4_tpu.utils.datagen import gen_buffer, gen_text  # noqa: E402


def _encode(srcs, cap_n, acceleration=1):
    B = len(srcs)
    arr = np.zeros((B, cap_n), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(srcs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    out, cs, tr = encode_blocks_pallas(
        jnp.asarray(arr), jnp.asarray(lens), cap_n=cap_n,
        acceleration=acceleration)
    out, cs, tr = np.asarray(out), np.asarray(cs), np.asarray(tr)
    return [out[i, : cs[i]].tobytes() for i in range(B)], cs, tr


def test_roundtrip_corpora():
    rng = np.random.default_rng(6)
    srcs = []
    for n in (1, 12, 13, 64, 300, 1024, 4096, 8000):
        srcs += [gen_text(n, seed=n), gen_buffer(n, match_prob=0.6, seed=n),
                 b"\x00" * n, rng.bytes(n)]
    srcs += [b"ab" * 4000, bytes(range(256)) * 30, b""]
    comp, cs, tr = _encode(srcs, cap_n=8192)
    for i, s in enumerate(srcs):
        # independent oracles: host C decoder + numpy reference decoder
        assert native.blockcodec.decompress_batch(
            [comp[i]], [len(s)])[0] == s, i
        got = decompress_block(comp[i], len(s))
        assert got == s, i
        assert len(comp[i]) <= compress_bound(len(s))


def test_trailing_literal_run():
    # trailing = length of the final literal run (engine seam folding
    # relies on it)
    srcs = [b"\x11" * 4000 + b"unique-tail-bytes!",
            np.random.default_rng(0).bytes(500)]
    comp, cs, tr = _encode(srcs, cap_n=8192)
    for i, s in enumerate(srcs):
        got = decompress_block(comp[i], len(s))
        assert got == s
        # the stream must end with exactly tr[i] literal bytes
        assert tr[i] >= 5 or len(s) < 13
        assert s[len(s) - tr[i]:] == got[len(s) - tr[i]:]


def test_acceleration_trades_size():
    src = gen_text(60000, seed=42)
    c1, _, _ = _encode([src], cap_n=65536, acceleration=1)
    c8, _, _ = _encode([src], cap_n=65536, acceleration=8)
    got = decompress_block(c8[0], len(src))
    assert got == src
    # higher acceleration skips harder: never smaller output
    assert len(c8[0]) >= len(c1[0])


def test_size_parity_vs_host_greedy():
    # the kernel mirrors native/blockcodec.c's greedy design; sizes on
    # mixed real-ish corpora must stay within a whisker (the on-device
    # grade vs the reference CLI lives in tools/session_pallas_encode)
    srcs = [gen_text(49152, seed=1), gen_buffer(49152, 0.7, seed=2)]
    comp, _, _ = _encode(srcs, cap_n=65536)
    host = native.blockcodec.compress_batch(srcs)
    for c, h in zip(comp, host):
        assert len(c) <= int(len(h) * 1.01)


def test_reference_cli_decodes_our_blocks():
    import ref_oracle
    if not ref_oracle.ensure_built():
        pytest.skip("reference oracle unavailable")
    srcs = [gen_text(30000, seed=9), b"\x00" * 20000,
            np.random.default_rng(1).bytes(10000)]
    comp, _, _ = _encode(srcs, cap_n=32768)
    for c, s in zip(comp, srcs):
        assert ref_oracle.ref_decompress_block(c, len(s)) == s


def test_dict_linked_roundtrip():
    # linked mode: block 2 sees block 1 as history; validated against
    # the numpy oracle decoder with the same dict
    from lz4_tpu.block.ref_codec import compress_block
    DC = 65536
    for seed in (0, 1, 2):
        whole = np.frombuffer(gen_text(12000, seed=seed), np.uint8)
        n1 = 5000
        b2 = whole[n1:]
        n2 = len(b2)
        d = min(n1, DC)
        dict_np = np.zeros((1, DC), np.uint8)
        dict_np[0, DC - d:] = whole[n1 - d: n1]
        cap = 16384
        s = np.zeros((1, cap), np.uint8)
        s[0, :n2] = b2
        out, cs, _ = encode_blocks_pallas(
            jnp.asarray(s), jnp.asarray([n2], np.int32),
            jnp.asarray(dict_np), jnp.asarray([d], np.int32), cap_n=cap)
        comp = np.asarray(out)[0, : int(np.asarray(cs)[0])].tobytes()
        got = decompress_block(comp, n2,
                               dict_prefix=whole[n1 - d: n1].tobytes())
        assert got == b2.tobytes()
        # cross-boundary matches must actually fire: linked stream is
        # smaller than the no-dict one on text
        out0, cs0, _ = encode_blocks_pallas(
            jnp.asarray(s), jnp.asarray([n2], np.int32), cap_n=cap)
        assert int(np.asarray(cs)[0]) < int(np.asarray(cs0)[0])


def test_encode_pallas_max_dist():
    """max_dist caps every emitted offset (the wave-friendly device
    encode mode); streams stay standard and round-trip."""
    import numpy as np

    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.utils.datagen import gen_text
    srcs = [gen_text(30000, seed=71), b"z" * 20000 + gen_text(10000, seed=72)]
    cap = max(len(s) for s in srcs)
    arr = np.zeros((len(srcs), cap), np.uint8)
    lens = np.zeros(len(srcs), np.int32)
    for i, s in enumerate(srcs):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    out, csz, _ = encode_blocks_pallas(
        jnp.asarray(arr), jnp.asarray(lens), cap_n=cap,
        interpret=True, max_dist=2000)
    out, csz = np.asarray(out), np.asarray(csz)
    for i, s in enumerate(srcs):
        blk = out[i, : csz[i]].tobytes()
        assert decompress_block(blk, len(s)) == s
        # walk the stream: every offset <= 2000
        p = 0
        opos = 0
        while p < len(blk):
            tok = blk[p]; p += 1
            ll = tok >> 4
            if ll == 15:
                while blk[p] == 255:
                    ll += 255; p += 1
                ll += blk[p]; p += 1
            p += ll; opos += ll
            if p >= len(blk):
                break
            off = blk[p] | (blk[p + 1] << 8); p += 2
            assert 1 <= off <= 2000, off
            ml = tok & 15
            if ml == 15:
                while blk[p] == 255:
                    p += 1
                p += 1


def test_engine_max_dist_route(monkeypatch):
    """TpuBackend.compress_batch(max_dist=...) routes the fast tier
    through the Pallas max_dist kernel; offsets verified."""
    monkeypatch.setenv("LZ4_TPU_PALLAS_CPU", "1")
    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.parallel.engine import TpuBackend
    from lz4_tpu.utils.datagen import gen_text
    be = TpuBackend()
    srcs = [gen_text(30000, seed=81), gen_text(20000, seed=82)]
    comps = be.compress_batch(srcs, level=1, max_dist=2000)
    for s, blk in zip(srcs, comps):
        assert decompress_block(blk, len(s)) == s
        p = 0
        while p < len(blk):
            tok = blk[p]; p += 1
            ll = tok >> 4
            if ll == 15:
                while blk[p] == 255:
                    ll += 255; p += 1
                ll += blk[p]; p += 1
            p += ll
            if p >= len(blk):
                break
            off = blk[p] | (blk[p + 1] << 8); p += 2
            assert 1 <= off <= 2000
            if (tok & 15) == 15:
                while blk[p] == 255:
                    p += 1
                p += 1
