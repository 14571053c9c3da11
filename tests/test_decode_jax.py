"""Vectorized JAX decoder vs the host oracle + reference encoder output."""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.decode_jax import decode_blocks_host
from lz4_tpu.block.ref_codec import BlockDecodeError, compress_block
from lz4_tpu.hc.codec import compress_block_hc
from lz4_tpu.utils.datagen import gen_buffer


def corpora():
    yield b""
    yield b"a"
    yield b"abcabcabcabcabcabcabcabcabc"
    yield b"x" * 13
    yield b"x" * 100000            # deep RLE chains (offset 1)
    yield bytes(range(256)) * 64
    yield gen_buffer(65536, match_prob=0.7, seed=3)
    yield gen_buffer(65536, match_prob=0.0, seed=4)
    yield gen_buffer(65535, match_prob=0.9, seed=5)
    yield gen_buffer(300, match_prob=0.95, seed=6)
    yield np.random.default_rng(7).integers(0, 3, 70000, dtype=np.uint8).tobytes()


def test_roundtrip_batch():
    data = list(corpora())
    comp = [compress_block(d) for d in data]
    out = decode_blocks_host(comp, [max(len(d), 1) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_roundtrip_hc_streams():
    data = [gen_buffer(65536, match_prob=0.7, seed=s) for s in range(3)]
    comp = [compress_block_hc(d, level=l) for d, l in zip(data, (3, 9, 12))]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want


@needs_oracle
def test_decodes_reference_streams():
    from ref_oracle import ref_compress_block
    data = [d for d in corpora() if d]
    comp = [ref_compress_block(d) for d in data]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want
    comp_hc = [ref_compress_block(d, level=9) for d in data]
    out = decode_blocks_host(comp_hc, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_dict_decode():
    hist = gen_buffer(70000, match_prob=0.8, seed=8)
    data = hist[100:2100] + b"new" + hist[60000:62000]
    comp = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([comp], [len(data)],
                             dict_prefixes=[hist[-65535:]])
    assert out[0] == data


def test_short_dict_decode():
    hist = b"hello world, this is history"
    data = b"hello world, this is history repeated"
    comp = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([comp], [len(data)], dict_prefixes=[hist])
    assert out[0] == data


def test_malformed_flagged():
    data = gen_buffer(30000, match_prob=0.7, seed=9)
    comp = compress_block(data)
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([comp[:-4]], [len(data)])
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([bytes([0x10, ord("a"), 0, 0, 0])], [100])
    with pytest.raises(BlockDecodeError):
        decode_blocks_host([comp], [len(data) - 1])   # output overflow


def test_mixed_batch_capacities():
    blocks = [compress_block(gen_buffer(n, match_prob=0.6, seed=n))
              for n in (100, 5000, 65536)]
    outs = decode_blocks_host(blocks, [100, 5000, 65536])
    assert [len(o) for o in outs] == [100, 5000, 65536]


def test_fuzz_roundtrip():
    rng = np.random.default_rng(11)
    data, comp = [], []
    for _ in range(40):
        n = int(rng.integers(0, 3000))
        p = float(rng.random())
        d = gen_buffer(n, match_prob=p, seed=int(rng.integers(1 << 30))) if n else b""
        data.append(d)
        comp.append(compress_block(d))
    out = decode_blocks_host(comp, [max(1, len(d)) for d in data])
    for got, want in zip(out, data):
        assert got == want


def test_decode_64k_text_blocks():
    """64 KB text blocks produce dense, deeply-chained matches — a
    regression gate for future chase redesigns (a round-1 experiment
    silently mis-decoded exactly this shape)."""
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.block.decode_jax import decode_blocks_host
    from lz4_tpu.utils.datagen import gen_text
    bs = 65536
    blocks = [gen_text(bs, seed=i) for i in range(3)]
    comp = HostBackend().compress_batch(blocks)
    out = decode_blocks_host(comp, [bs] * 3)
    assert out == blocks


def test_device_partial_decode():
    """LZ4_decompress_safe_partial analog on device (lz4.c:2450-2560):
    target sweep, truncated input, dict mode."""
    from lz4_tpu.block.ref_codec import compress_block
    from lz4_tpu.utils.datagen import gen_text
    raw = gen_text(30000, seed=3)
    comp = compress_block(raw)
    for target in (0, 1, 100, 7777, 29999, 30000):
        out = decode_blocks_host([comp], [target], partial=True)[0]
        assert out == raw[:target]
    half = decode_blocks_host([comp[: len(comp) // 2]], [30000],
                              partial=True)[0]
    assert raw.startswith(half) and half
    hist = gen_text(65536, seed=9)
    data = hist[100:8000]
    c2 = compress_block(data, dict_prefix=hist)
    out = decode_blocks_host([c2], [4000], dict_prefixes=[hist],
                             partial=True)[0]
    assert out == data[:4000]


def test_big_tier_device_decode():
    """Blocks above the 64 KB tier decode on device: the parse helper
    packs position | byte << SH with SH sized to cap_in (so length
    extensions parsed at stream offsets beyond 2^17 still decode)."""
    from lz4_tpu.hc.codec import compress_block_hc

    data = [
        gen_buffer(262144, match_prob=0.6, seed=21),
        gen_buffer(200000, match_prob=0.05, seed=22),  # mostly literals:
        # the compressed stream is ~200 KB, so late tokens sit past 2^17
        (gen_buffer(1000, match_prob=0.9, seed=23) * 300)[:262144],
    ]
    comp = [compress_block(d) for d in data]
    out = decode_blocks_host(comp, [len(d) for d in data])
    for got, want in zip(out, data):
        assert got == want
    # and an HC stream with long matches (255-chained match lengths)
    d = (b"A" * 70000 + gen_buffer(150000, match_prob=0.3, seed=24))
    c = compress_block_hc(d, level=9)
    (got,) = decode_blocks_host([c], [len(d)])
    assert got == d


def test_rank_chase_variant():
    """The rank-space compacted straggler chase (CHASE_RANK) decodes
    identically to the scatter formulation — covered here because the
    committed default is measured-on-device; this pins the A/B
    alternative (tools/session_chase.py) correct on every corpus class,
    including deep RLE chains, dict history, and malformed streams."""
    import functools

    import jax
    import jax.numpy as jnp

    from lz4_tpu.block import decode_jax

    old = decode_jax.CHASE_RANK
    decode_jax.CHASE_RANK = not old
    try:
        @functools.partial(jax.jit, static_argnames=("cap_out", "has_dict"))
        def dec(comp, lens, db, dl, *, cap_out, has_dict):
            caps = jnp.full(comp.shape[0], cap_out, jnp.int32)
            recs, err, seen = decode_jax._parse_tokens(
                comp, lens, cap_out=cap_out, partial=False)
            fn = functools.partial(decode_jax._decode_one, cap_out=cap_out,
                                   has_dict=has_dict, partial=False)
            return jax.vmap(fn)(comp, lens, db, dl, caps, *recs, err, seen)

        data = list(corpora())
        comp = [compress_block(d) for d in data]
        cap_out = 131072
        cap_in = max(max(len(c) for c in comp), 16)
        B = len(comp)
        cb = np.zeros((B, cap_in), np.uint8)
        cl = np.zeros(B, np.int32)
        for i, c in enumerate(comp):
            cb[i, : len(c)] = np.frombuffer(c, np.uint8)
            cl[i] = len(c)
        db = jnp.zeros((B, decode_jax.DICT_CAP), jnp.uint8)
        dl = jnp.zeros(B, jnp.int32)
        out, olen, errs = dec(jnp.asarray(cb), jnp.asarray(cl), db, dl,
                              cap_out=cap_out, has_dict=False)
        out = np.asarray(out)
        for i, want in enumerate(data):
            assert not np.asarray(errs)[i]
            assert out[i, : len(want)].tobytes() == want
        # dict-backed decode through the flipped formulation
        hist = gen_buffer(70000, match_prob=0.5, seed=40)
        body = hist[-1500:] + gen_buffer(3000, match_prob=0.6, seed=41)
        c = compress_block(body, dict_prefix=hist)
        cb2 = np.zeros((1, max(len(c), 16)), np.uint8)
        cb2[0, : len(c)] = np.frombuffer(c, np.uint8)
        db2 = np.zeros((1, decode_jax.DICT_CAP), np.uint8)
        h = hist[-decode_jax.DICT_CAP:]
        db2[0, decode_jax.DICT_CAP - len(h):] = np.frombuffer(h, np.uint8)
        out, olen, errs = dec(
            jnp.asarray(cb2), jnp.asarray(np.array([len(c)], np.int32)),
            jnp.asarray(db2), jnp.asarray(np.array([len(h)], np.int32)),
            cap_out=8192, has_dict=True)
        assert not int(np.asarray(errs)[0])
        assert np.asarray(out)[0, : len(body)].tobytes() == body
        # malformed stream still flags
        bad = bytearray(compress_block(gen_buffer(5000, 0.5, seed=42)))
        bad[0] ^= 0xF0
        cb3 = np.zeros((1, max(len(bad), 16)), np.uint8)
        cb3[0, : len(bad)] = np.frombuffer(bytes(bad), np.uint8)
        out, olen, errs = dec(
            jnp.asarray(cb3), jnp.asarray(np.array([len(bad)], np.int32)),
            jnp.zeros((1, decode_jax.DICT_CAP), jnp.uint8),
            jnp.zeros(1, jnp.int32), cap_out=8192, has_dict=False)
        decoded = np.asarray(out)[0, : 5000].tobytes()
        assert int(np.asarray(errs)[0]) or decoded != gen_buffer(
            5000, 0.5, seed=42)
    finally:
        decode_jax.CHASE_RANK = old
