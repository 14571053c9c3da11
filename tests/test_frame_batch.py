"""Batch wave frame decode (frame/batch.py): -BD linked frames and
independent frames through the 128-lane ring tier, with fallback."""
import numpy as np
import pytest

from lz4_tpu.block.backend import HostBackend
from lz4_tpu.frame.batch import decompress_frames_wave
from lz4_tpu.frame.format import FrameInfo, Preferences
from lz4_tpu.frame.writer import FrameCompressor
from lz4_tpu.utils.datagen import mixed_corpus

pytest.importorskip("lz4_tpu.native")


def _frame(data: bytes, *, indep: bool, bsid: int = 4,
           bsum: bool = False, csum: bool = True) -> bytes:
    info = FrameInfo(block_size_id=bsid, block_independent=indep,
                     block_checksum=bsum, content_checksum=csum)
    comp = FrameCompressor(Preferences(frame_info=info), level=1,
                           backend=HostBackend())
    return comp.begin() + comp.update(data) + comp.end()


def test_linked_and_independent_batch():
    rng = np.random.default_rng(1)
    datas = [mixed_corpus(200000 + 7777 * i, seed=30 + i)
             for i in range(3)]
    datas.append(rng.integers(0, 256, 150000, np.uint8).tobytes())
    frames = [_frame(d, indep=False) for d in datas]          # -BD4
    frames += [_frame(d, indep=True) for d in datas]          # -B4
    frames += [_frame(datas[0], indep=False, bsum=True)]
    frames += [_frame(datas[1], indep=True, bsid=7)]          # fallback
    want = datas + datas + [datas[0], datas[1]]
    got = decompress_frames_wave(frames, interpret=True)
    assert got == want


def test_reference_bd4_frames():
    """Reference-CLI-produced -B4D frames decode byte-exact through
    the wave batch surface (the r4 verdict #3 acceptance shape)."""
    import sys
    sys.path.insert(0, "tests")
    import ref_oracle
    if not ref_oracle.ensure_built():
        pytest.skip("reference CLI unavailable")
    datas = [mixed_corpus(300000 + 11111 * i, seed=60 + i)
             for i in range(2)]
    frames = []
    for d in datas:
        r = ref_oracle.ref_cli(["-z", "-B4", "-BD", "-c"], stdin=d)
        frames.append(r.stdout)
    got = decompress_frames_wave(frames, interpret=True)
    assert got == datas


def test_corrupt_content_checksum_raises():
    from lz4_tpu.frame.format import FrameError
    d = mixed_corpus(100000, seed=5)
    f = bytearray(_frame(d, indep=False))
    f[-2] ^= 0xFF                      # content checksum byte
    with pytest.raises(FrameError):
        decompress_frames_wave([bytes(f)], interpret=True)


def test_compress_frames_wave_roundtrip():
    """Batch wave COMPRESSION surface: linked and independent turbo
    frames round-trip through both the sequential decoder and the
    wave batch decoder, and carry valid checksums."""
    import numpy as np

    from lz4_tpu.frame.batch import compress_frames_wave
    from lz4_tpu.frame.reader import decompress_frame
    rng = np.random.default_rng(9)
    datas = [mixed_corpus(140000 + 9999 * i, seed=500 + i)
             for i in range(3)]
    datas += [b"", rng.integers(0, 256, 70000, np.uint8).tobytes()]
    for indep in (False, True):
        frames = compress_frames_wave(datas, block_independent=indep,
                                      interpret=True)
        assert [decompress_frame(f) for f in frames] == datas
        assert decompress_frames_wave(frames, interpret=True) == datas


def test_linked_wave_encode_offsets_capped():
    from lz4_tpu.block.encode_wave import encode_wave_linked
    d = mixed_corpus(200000, seed=77)
    streams = encode_wave_linked(
        [[d[i: i + 65536] for i in range(0, len(d), 65536)]],
        interpret=True, max_dist=1024)
    for comp in streams[0]:
        p, mx = 0, 0
        while p < len(comp):
            tok = comp[p]
            p += 1
            ll = tok >> 4
            if ll == 15:
                while True:
                    v = comp[p]
                    p += 1
                    ll += v
                    if v != 255:
                        break
            p += ll
            if p >= len(comp):
                break
            mx = max(mx, comp[p] | (comp[p + 1] << 8))
            p += 2
            if (tok & 15) == 15:
                while True:
                    v = comp[p]
                    p += 1
                    if v != 255:
                        break
        assert mx <= 1024


def test_compress_frames_wave_reference_interop():
    """The turbo batch COMPRESSION surface's frames must decode with
    the reference lz4 CLI (the property the docstring advertises)."""
    import sys
    sys.path.insert(0, "tests")
    import ref_oracle
    from lz4_tpu.frame.batch import compress_frames_wave
    if not ref_oracle.ensure_built():
        pytest.skip("reference CLI unavailable")
    datas = [mixed_corpus(150000, seed=600), b"",
             mixed_corpus(65536 * 2, seed=601)]
    for indep in (False, True):
        frames = compress_frames_wave(datas, block_independent=indep,
                                      interpret=True)
        for d, f in zip(datas, frames):
            r = ref_oracle.ref_cli(["-d", "-c"], stdin=f)
            assert r.stdout == d
