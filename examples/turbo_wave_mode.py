"""The TPU "turbo" fast mode: distance-capped streams that both ENCODE
and DECODE on the 128-lane lockstep wave tiers (~600-700 MB/s each way
on a v5e chip at ~1.25x the uncapped size — the favor-decSpeed trade
taken to its TPU-native conclusion), plus the batch frame surface that
decodes many frames abreast.

Runs in interpret mode on CPU for the demo; on a real chip the same
calls hit the Mosaic kernels.
"""
import jax

from lz4_tpu.block.backend import HostBackend
from lz4_tpu.block.encode_wave import encode_wave_batch
from lz4_tpu.frame.batch import decompress_frames_wave
from lz4_tpu.frame.format import FrameInfo, Preferences
from lz4_tpu.frame.writer import FrameCompressor
from lz4_tpu.utils.datagen import mixed_corpus


def main():
    interp = jax.devices()[0].platform == "cpu"

    # --- raw block batch through the wave encoder (offsets <= 2 KB) ---
    blocks = [mixed_corpus(30000 + 1000 * i, seed=40 + i)
              for i in range(4)]
    streams = encode_wave_batch(blocks, interpret=interp, max_dist=2048)
    from lz4_tpu.block.ref_codec import decompress_block
    assert all(decompress_block(s, len(b)) == b
               for b, s in zip(blocks, streams))
    ratio = sum(map(len, streams)) / sum(map(len, blocks))
    print(f"wave-encoded {len(blocks)} blocks, "
          f"{sum(map(len, blocks))} -> {sum(map(len, streams))} bytes "
          f"({100 * ratio:.1f}%)")

    # --- many .lz4 frames decoded abreast (linked -BD included) ---
    frames = []
    for i, d in enumerate(blocks):
        info = FrameInfo(block_size_id=4, block_independent=i % 2 == 0)
        c = FrameCompressor(Preferences(frame_info=info), level=1,
                            backend=HostBackend())
        frames.append(c.begin() + c.update(d) + c.end())
    outs = decompress_frames_wave(frames, interpret=interp)
    assert outs == blocks
    print(f"batch-decoded {len(frames)} frames "
          f"(alternating independent/-BD linked) byte-exact")


if __name__ == "__main__":
    main()
