"""On-chip measurement session (round 5) — provenance for the numbers in docs/tpu_perf_notes.md. Run with the real chip idle."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
from lz4_tpu.block.encode_wave import (encode_wave_linked, pack_input,
                                       _encode_wave_linked_raw)
from lz4_tpu.block.decode_wave import wave_decode_linked
from lz4_tpu.block.ref_codec import decompress_block
from lz4_tpu.utils.realcorpus import real_corpus
RTT=0.0245; AN=8
data = real_corpus(48*1024*1024)
streams_raw = []
for j in range(128):
    raw = data[j*376832:(j*376832)+3*65536]
    streams_raw.append([raw[0:65536], raw[65536:131072], raw[131072:196608]])
t0=time.time()
streams = encode_wave_linked(streams_raw, interpret=False, use_onehot=True, max_dist=2000)
enc_wall = time.time()-t0
# verify chained host decode
ok = 0
for raws, comps in zip(streams_raw[::17], streams[::17]):
    hist = b""
    good = True
    for raw, comp in zip(raws, comps):
        if decompress_block(comp, len(raw), dict_prefix=hist or None) != raw:
            good = False
        hist = (hist + raw)[-65536:]
    ok += good
# full symmetric loop: wave ring decode of the wave-linked-encoded streams
outs = wave_decode_linked(streams, interpret=False, use_onehot=True, byte_phase=True)
sym = sum(out == b"".join(raws) for out, raws in zip(outs, streams_raw))
# kernel-only timing (3 rounds pre-packed)
total = sum(len(b) for s in streams_raw for b in s)
n_rows=16384; wr = 2000//4+2
packs = []
for t in range(3):
    blocks = [s[t] for s in streams_raw]
    inp, lens = pack_input(blocks, n_rows)
    hbuf = np.zeros((128, wr*4), np.uint8); hlen = np.zeros((1,128), np.int32)
    if t:
        for j, s in enumerate(streams_raw):
            hs = b"".join(s[:t])[-(wr*4):]
            hbuf[j, wr*4-len(hs):] = np.frombuffer(hs, np.uint8); hlen[0,j] = len(hs)
    hw = hbuf.reshape(128, wr, 4).astype(np.int32)
    hwords = np.ascontiguousarray((hw[...,0]|(hw[...,1]<<8)|(hw[...,2]<<16)|(hw[...,3]<<24)).T)
    packs.append((jnp.asarray(inp), jnp.asarray(lens), jnp.asarray(hwords), jnp.asarray(hlen)))
def enc_all():
    rs = [_encode_wave_linked_raw(i_, l_, h_, hl_, n_rows=n_rows, interpret=False,
                                  use_onehot=True, max_dist=2000) for (i_,l_,h_,hl_) in packs]
    return rs
r0 = enc_all(); np.asarray(r0[-1][-1,-1])
best=1e9
for _ in range(3):
    t0=time.perf_counter()
    for _ in range(AN//2):
        rs = enc_all()
    np.asarray(rs[-1][-1,-1])
    best=min(best,(time.perf_counter()-t0-RTT)/(AN//2))
print(json.dumps({"verify_ok": ok, "symmetric_ok": sym, "n": 128,
                  "linked_enc_kernel_mbs": round(total/1e6/best,1),
                  "e2e_enc_mbs": round(total/1e6/enc_wall,1)}), flush=True)
