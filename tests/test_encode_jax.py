"""Vectorized JAX encoder: round-trip, interop, ratio and dict tests.

Mirrors the reference test strategy (SURVEY.md §4): XXH32/byte-exact
round-trip oracles over seeded corpora of controlled compressibility,
plus cross-decoder interop vs liblz4.
"""
import numpy as np
import pytest

from conftest import needs_oracle
from lz4_tpu.block.encode_jax import encode_blocks_host
from lz4_tpu.block.ref_codec import compress_block, decompress_block
from lz4_tpu.utils.datagen import gen_buffer


CASES = [
    b"",
    b"a",
    b"abcd" * 3,
    b"hello world hello world hello world hello",
    b"\x00" * 1000,
    b"ab" * 4000,                      # period-2 RLE
    bytes(range(256)) * 16,            # period-256
]


def _rt(raw: bytes) -> bytes:
    comp = encode_blocks_host([raw])[0]
    return decompress_block(comp, max(len(raw), 1)) if raw else \
        decompress_block(comp, 1)


@pytest.mark.parametrize("raw", CASES, ids=range(len(CASES)))
def test_roundtrip_small(raw):
    assert _rt(raw) == raw


@pytest.mark.parametrize("prob", [0.0, 0.3, 0.7, 0.95])
def test_roundtrip_seeded(prob):
    raw = gen_buffer(32768, match_prob=prob, seed=int(prob * 100))
    assert _rt(raw) == raw


def test_roundtrip_incompressible():
    rng = np.random.default_rng(5)
    raw = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    comp = encode_blocks_host([raw])[0]
    assert decompress_block(comp, len(raw)) == raw
    # worst case stays within compress_bound
    from lz4_tpu.constants import compress_bound
    assert len(comp) <= compress_bound(len(raw))


def test_batch_mixed_sizes():
    blocks = [gen_buffer(1000 + 997 * i, match_prob=0.5, seed=i)
              for i in range(5)]
    comp = encode_blocks_host(blocks)
    for raw, c in zip(blocks, comp):
        assert decompress_block(c, len(raw)) == raw


def test_linked_blocks_dict():
    data = gen_buffer(3 * 16384, match_prob=0.8, seed=9)
    bs = 16384
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)]
    prefixes = [None] + [data[max(0, i - 65536): i]
                         for i in range(bs, len(data), bs)]
    comp = encode_blocks_host(blocks, dict_prefixes=prefixes)
    # linked blocks must decode with their history, and exploiting the
    # dict must help vs independent compression
    indep = encode_blocks_host(blocks)
    for i, (raw, c) in enumerate(zip(blocks, comp)):
        assert decompress_block(c, bs, dict_prefix=prefixes[i]) == raw
    assert sum(map(len, comp)) <= sum(map(len, indep))


def test_ratio_competitive_with_host_oracle():
    """The vectorized parse must stay within 15% of the exact host
    matcher's compressed size on typical data."""
    raw = gen_buffer(65536, match_prob=0.7, seed=7)
    jax_size = len(encode_blocks_host([raw])[0])
    host_size = len(compress_block(raw))
    assert jax_size <= host_size * 1.15


@needs_oracle
def test_ref_decodes_our_blocks():
    import ref_oracle
    for prob, seed in [(0.3, 1), (0.7, 2), (0.95, 3)]:
        raw = gen_buffer(49152, match_prob=prob, seed=seed)
        comp = encode_blocks_host([raw])[0]
        assert ref_oracle.ref_decompress_block(comp, len(raw)) == raw


@needs_oracle
def test_size_parity_vs_reference():
    """Compressed size must be <= reference's on standard corpora
    (BASELINE.json north star), modulo a small tolerance on the
    pathological highly-repetitive case."""
    import ref_oracle
    worst = 0.0
    for prob, seed in [(0.3, 11), (0.5, 12), (0.7, 13)]:
        raw = gen_buffer(65536, match_prob=prob, seed=seed)
        ours = len(encode_blocks_host([raw])[0])
        ref = len(ref_oracle.ref_compress_block(raw, 1))
        worst = max(worst, ours / ref)
    assert worst <= 1.0, f"worst size ratio vs reference: {worst:.3f}"


# ---------------------------------------------------------------------------
# device HC tier (n_cand candidate scoring + lazy arbitration)
# ---------------------------------------------------------------------------

def test_device_hc_roundtrip_and_beats_reference_l2():
    """The device HC tier (level 2 analog of lz4hc.c:476-773) must
    round-trip and compress at least as well as the REFERENCE's level 2
    (lz4mid); the host's own level 2 is a DP parser that outdoes both,
    so it only serves as a loose upper bound here."""
    from conftest import ORACLE
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.utils.datagen import gen_text
    hb = HostBackend()
    for blob in (gen_text(2 * 65536, seed=51),
                 gen_buffer(2 * 65536, match_prob=0.55, seed=52)):
        blocks = [blob[i:i + 65536] for i in range(0, len(blob), 65536)]
        hc = encode_blocks_host(blocks, n_cand=8, lazy=True)
        for b, c in zip(blocks, hc):
            assert decompress_block(c, len(b)) == b
        if ORACLE:
            import ref_oracle
            ref2 = sum(len(ref_oracle.ref_compress_block(b, 2))
                       for b in blocks)
            assert sum(map(len, hc)) <= ref2
        host2 = hb.compress_batch(blocks, level=2)
        # soft cushion vs our own host level-2 DP (which keeps getting
        # stronger — carried-match floor etc.); the hard bar is the
        # <= reference-level-2 assertion above
        assert sum(map(len, hc)) <= sum(map(len, host2)) * 1.10


def test_device_hc_with_dict_roundtrip():
    from lz4_tpu.utils.datagen import gen_text
    hist = gen_text(65536, seed=53)
    data = hist[1000:5000] + b"@" + hist[40000:44000]
    comp = encode_blocks_host([data], dict_prefixes=[hist],
                              n_cand=8, lazy=True)[0]
    assert decompress_block(comp, len(data), dict_prefix=hist) == data


@needs_oracle
def test_device_hc_ref_decodes():
    import ref_oracle
    from lz4_tpu.utils.datagen import gen_text
    raw = gen_text(65536, seed=54)
    comp = encode_blocks_host([raw], n_cand=8, lazy=True)[0]
    assert ref_oracle.ref_decompress_block(comp, len(raw)) == raw


def test_tpu_backend_routes_level2_to_device(monkeypatch):
    """-2 on the TPU backend must run the device HC graph, not the host
    fallback (VERDICT r1 next-round #4)."""
    import lz4_tpu.parallel.engine as eng
    from lz4_tpu.utils.datagen import gen_text
    be = eng.TpuBackend(codec=None)
    called = {}
    real = eng.encode_blocks

    def spy(*a, **kw):
        called.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(eng, "encode_blocks", spy)
    blob = gen_text(65536, seed=55)
    out = be.compress_batch([blob], level=2)
    assert called.get("n_cand") == eng.TpuBackend.HC_N_CAND
    assert called.get("lazy") is True
    assert decompress_block(out[0], len(blob)) == blob


def test_acceleration_lite_graph():
    """--fast on device = the lite graph (fewer sort payloads): output
    stays valid, ratio penalty is bounded."""
    from lz4_tpu.parallel.engine import TpuBackend
    from lz4_tpu.utils.realcorpus import real_corpus
    be = TpuBackend(codec=None)
    data = real_corpus(256 * 1024)
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    full = be.compress_batch(blocks, level=1, acceleration=1)
    fast = be.compress_batch(blocks, level=1, acceleration=8)
    for b, c in zip(blocks, fast):
        assert decompress_block(c, len(b)) == b
    assert sum(map(len, fast)) <= sum(map(len, full)) * 1.10
