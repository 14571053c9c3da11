"""On-chip measurement session (round 5) — provenance for the numbers in docs/tpu_perf_notes.md. Run with the real chip idle."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
from lz4_tpu import native
from lz4_tpu.block.encode_wave import _encode_wave_raw, pack_input
from lz4_tpu.block.ref_codec import decompress_block
from lz4_tpu.utils.realcorpus import real_corpus
bc = native.blockcodec
RTT=0.0245; AN=8
data = real_corpus(16*1024*1024)
blocks = [data[i*65536:(i+1)*65536] for i in range(128)]
n_rows=16384
inp, lens = pack_input(blocks, n_rows)
inp_j, lens_j = jnp.asarray(inp), jnp.asarray(lens)
tot_u = sum(len(bc.compress(b)) for b in blocks)
for hb, md in [(10,16000),(11,16000),(12,16000),(11,32000),(12,65535)]:
    dec = _encode_wave_raw(inp_j, lens_j, n_rows=n_rows, interpret=False,
                           use_onehot=True, max_dist=md, hash_bits=hb)
    np.asarray(dec[-1,-1])
    decT = np.ascontiguousarray(np.asarray(dec).T)
    streams = bc.wave_emit_decisions(blocks, decT[:128])
    ok = all(decompress_block(s, len(b)) == b for b,s in zip(blocks[::17], streams[::17]))
    tot = sum(map(len, streams))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter()
        rs=[_encode_wave_raw(inp_j, lens_j, n_rows=n_rows, interpret=False,
                             use_onehot=True, max_dist=md, hash_bits=hb) for _ in range(AN)]
        np.asarray(rs[-1][-1,-1])
        best=min(best,(time.perf_counter()-t0-RTT)/AN)
    print(json.dumps({"hb":hb,"md":md,"mbs":round(128*65536/1e6/best,1),
                      "vs_uncapped":round(tot/tot_u,4),"ok":ok}), flush=True)
