"""Parallel engine tests on the virtual 8-device CPU mesh: shard_map
linked-mode step (ppermute history carry + ordered-assembly all-gather)
and the sharded batch codec. The multi-chip analog of the reference's
MT pipeline tests (lz4io.c 'Multithreading commands' in
test-lz4-basic.sh)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lz4_tpu.block.encode_jax import DICT_CAP
from lz4_tpu.block.ref_codec import compress_block, decompress_block
from lz4_tpu.parallel.engine import (
    ShardedCodec,
    TpuBackend,
    linked_encode_step,
)
from lz4_tpu.utils.datagen import gen_buffer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh")


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def test_linked_encode_step(mesh):
    ndev = 8
    cap_n = 1024
    B = 2 * ndev
    data = gen_buffer(B * cap_n, match_prob=0.7, seed=3)
    src = np.frombuffer(data, np.uint8).reshape(B, cap_n).copy()
    lens = np.full(B, cap_n, np.int32)
    head_dict = np.zeros((1, DICT_CAP), np.uint8)
    head_len = np.zeros(1, np.int32)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    comp, csizes, offsets, total = linked_encode_step(
        jax.device_put(src, shard), jax.device_put(lens, shard),
        jax.device_put(head_dict, repl), jax.device_put(head_len, repl),
        cap_n=cap_n, mesh=mesh)
    comp = np.asarray(comp)
    csizes = np.asarray(csizes)
    offsets = np.asarray(offsets)
    total = int(np.asarray(total)[0])
    # ordered-assembly invariants (the WriteRegister analog)
    assert total == csizes.sum()
    assert offsets[0] == 0
    assert (np.diff(offsets) == csizes[:-1]).all()
    # every block decodes against the previous block's raw tail,
    # including across the shard boundary (the ppermute carry)
    for i in range(B):
        prefix = src[i - 1].tobytes() if i > 0 else None
        dec = decompress_block(comp[i, : csizes[i]].tobytes(), cap_n,
                               dict_prefix=prefix)
        assert dec == src[i].tobytes(), f"linked block {i}"


def test_sharded_codec_roundtrip(mesh):
    codec = ShardedCodec(mesh)
    B = 16
    cap = 2048
    blocks = [gen_buffer(cap, match_prob=0.6, seed=i) for i in range(B)]
    comp_ref = [compress_block(b) for b in blocks]
    cap_in = max(len(c) for c in comp_ref)
    comp = np.zeros((B, cap_in), np.uint8)
    clens = np.zeros(B, np.int32)
    for i, c in enumerate(comp_ref):
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    from lz4_tpu.block.decode_jax import DICT_CAP as DC
    out, out_lens, errs = codec.decode(
        comp, clens, np.zeros((B, DC), np.uint8), np.zeros(B, np.int32),
        cap_out=cap, has_dict=False)
    assert not np.asarray(errs).any()
    for i, b in enumerate(blocks):
        assert np.asarray(out)[i, : cap].tobytes() == b


def test_tpu_backend_on_mesh(mesh):
    be = TpuBackend(ShardedCodec(mesh))
    blocks = [gen_buffer(8192, match_prob=0.5, seed=i) for i in range(5)]
    comp = be.compress_batch(blocks)
    rt = be.decompress_batch(comp, [len(b) for b in blocks])
    assert rt == blocks


def test_corpus_scan_wrappers():
    """encode_corpus/decode_corpus (one-dispatch lax.map over chunk
    groups) must agree with the per-chunk graphs."""
    import jax.numpy as jnp
    import numpy as np

    from lz4_tpu.block.corpus import decode_corpus, encode_corpus
    from lz4_tpu.block.decode_jax import DICT_CAP as DDC
    from lz4_tpu.block.encode_jax import DICT_CAP
    from lz4_tpu.utils.datagen import gen_buffer

    NC, B, bs = 2, 2, 4096
    data = [gen_buffer(bs, match_prob=p, seed=i)
            for i, p in enumerate((0.0, 0.5, 0.9, 0.7))]
    src = jnp.asarray(np.stack(
        [np.frombuffer(d, np.uint8) for d in data]).reshape(NC, B, bs))
    lens = jnp.full((NC, B), bs, jnp.int32)
    db = jnp.zeros((B, DICT_CAP), jnp.uint8)
    dl = jnp.zeros(B, jnp.int32)
    out, csizes, _ = encode_corpus(src, lens, db, dl, cap_n=bs,
                                   has_dict=False)
    comp = np.asarray(out).reshape(NC * B, -1)
    cs = np.asarray(csizes).reshape(NC * B)
    ddb = jnp.zeros((B, DDC), jnp.uint8)
    o3, l3, e3 = decode_corpus(
        jnp.asarray(comp.reshape(NC, B, -1)),
        jnp.asarray(cs.reshape(NC, B).astype(np.int32)), ddb, dl,
        cap_out=bs, has_dict=False)
    assert not np.asarray(e3).any()
    got = np.asarray(o3).reshape(NC * B, -1)
    for i, d in enumerate(data):
        assert got[i, :bs].tobytes() == d


def test_wave_encode_sharded_mesh():
    """One lockstep wave-encode kernel instance per mesh device (zero
    collectives); decisions emit + round-trip per shard."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lz4_tpu.block.encode_wave import emit_from_decisions, pack_input
    from lz4_tpu.block.ref_codec import decompress_block
    from lz4_tpu.parallel.engine import wave_encode_sharded
    from lz4_tpu.utils.datagen import mixed_corpus

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    D = len(devs)
    n_rows = 1024
    blocks = [mixed_corpus(4096, seed=300 + i) for i in range(D)]
    inp = np.zeros((D, n_rows + 8, 128), np.int32)
    lens = np.zeros((D, 1, 128), np.int32)
    for i, b in enumerate(blocks):
        inp[i], lens[i] = pack_input([b], n_rows)
    shard = NamedSharding(mesh, P("data"))
    dec = np.asarray(wave_encode_sharded(
        jax.device_put(inp, shard), jax.device_put(lens, shard),
        n_rows=n_rows, interpret=True, use_onehot=False,
        max_dist=2048, hash_bits=9, mesh=mesh))
    for i, b in enumerate(blocks):
        s = emit_from_decisions(b, dec[i, :, 0])
        assert decompress_block(s, len(b)) == b
