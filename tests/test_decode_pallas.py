"""Pallas serial-block decoder: correctness + error parity (interpret
mode on the forced-CPU suite; the same kernel lowers via Mosaic on
TPU — tools/session_pallas_decode.py is the on-device run)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4_tpu import native  # noqa: E402
from lz4_tpu.block.decode_jax import DICT_CAP, decode_blocks  # noqa: E402
from lz4_tpu.block.decode_pallas import decode_blocks_pallas  # noqa: E402
from lz4_tpu.utils.datagen import gen_buffer, gen_text  # noqa: E402


def _batch(cases, cap_in=None):
    cap_in = cap_in or max(16, max(len(c) for c in cases))
    B = len(cases)
    arr = np.zeros((B, cap_in), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(cases):
        arr[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    return jnp.asarray(arr), jnp.asarray(lens)


def test_roundtrip_corpora():
    rng = np.random.default_rng(5)
    srcs = []
    for n in (13, 64, 300, 1024, 4096):
        srcs += [gen_text(n, seed=n), gen_buffer(n, match_prob=0.6, seed=n),
                 b"\x00" * n, rng.bytes(n)]
    srcs += [b"A", b"ab" * 3000, bytes(range(256)) * 20]
    comp = native.blockcodec.compress_batch(srcs)
    cj, lj = _batch(comp)
    out, olen, errs = decode_blocks_pallas(cj, lj, cap_out=8192)
    out, olen, errs = np.asarray(out), np.asarray(olen), np.asarray(errs)
    for i, s in enumerate(srcs):
        assert not errs[i]
        assert olen[i] == len(s)
        assert out[i, : len(s)].tobytes() == s


def test_roundtrip_hc_long_matches():
    # long matches exercise the >127-byte 255-chain loop
    srcs = [b"\xaa" * 60000, (b"0123456789abcdef" * 4096)[:60000]]
    comp = [native.blockcodec.compress_hc(s, 9) for s in srcs]
    cj, lj = _batch(comp)
    out, olen, errs = decode_blocks_pallas(cj, lj, cap_out=65536)
    out = np.asarray(out)
    for i, s in enumerate(srcs):
        assert not np.asarray(errs)[i]
        assert out[i, : len(s)].tobytes() == s


def test_error_parity_vs_sortscan():
    rng = np.random.default_rng(11)
    srcs = [gen_text(2048, seed=3), gen_buffer(2048, match_prob=0.6, seed=4)]
    comp = native.blockcodec.compress_batch(srcs)
    cases = []
    for c in comp:
        cases.append(bytes(c))
        for _ in range(20):
            cc = bytearray(c)
            mode = rng.integers(0, 3)
            if mode == 0:
                cc[rng.integers(0, len(cc))] = rng.integers(0, 256)
            elif mode == 1:
                cc = cc[: rng.integers(1, len(cc))]
            else:
                for _ in range(6):
                    cc[rng.integers(0, len(cc))] = rng.integers(0, 256)
            cases.append(bytes(cc))
    cj, lj = _batch(cases)
    B = len(cases)
    cap_out = 4096
    p_out, p_len, p_err = (np.asarray(x) for x in decode_blocks_pallas(
        cj, lj, cap_out=cap_out))
    db = jnp.zeros((B, DICT_CAP), jnp.uint8)
    dl = jnp.zeros(B, jnp.int32)
    j_out, j_len, j_err = (np.asarray(x) for x in decode_blocks(
        cj, lj, db, dl, cap_out=cap_out, has_dict=False))
    for i in range(B):
        assert bool(p_err[i]) == bool(j_err[i]), i
        if not p_err[i]:
            assert p_len[i] == j_len[i]
            assert (p_out[i, : p_len[i]].tobytes()
                    == j_out[i, : j_len[i]].tobytes())


def test_dict_linked_decode():
    # streams produced by the numpy dict encoder decode with history
    from lz4_tpu.block.ref_codec import compress_block
    from lz4_tpu.utils.datagen import gen_text as _gt
    DC = 65536
    whole = np.frombuffer(_gt(16000, seed=77), np.uint8)
    n1 = 7000
    b2 = whole[n1:]
    n2 = len(b2)
    d = min(n1, DC)
    hist = whole[n1 - d: n1].tobytes()
    comp = compress_block(b2.tobytes(), dict_prefix=hist)
    dict_np = np.zeros((1, DC), np.uint8)
    dict_np[0, DC - d:] = np.frombuffer(hist, np.uint8)
    cj = np.zeros((1, len(comp) + 256), np.uint8)
    cj[0, : len(comp)] = np.frombuffer(comp, np.uint8)
    out, olen, errs = decode_blocks_pallas(
        jnp.asarray(cj), jnp.asarray([len(comp)], np.int32),
        jnp.asarray(dict_np), jnp.asarray([d], np.int32), cap_out=16384)
    assert not np.asarray(errs)[0]
    assert int(np.asarray(olen)[0]) == n2
    assert np.asarray(out)[0, :n2].tobytes() == b2.tobytes()
    # without the dict the same stream must flag an error (offsets
    # reach before the block start)
    o2, l2, e2 = decode_blocks_pallas(
        jnp.asarray(cj), jnp.asarray([len(comp)], np.int32),
        cap_out=16384)
    assert np.asarray(e2)[0] == 1
