"""Block-codec backend protocol.

The frame layer drives block compression through this interface (the
analog of lz4frame's compressFunc_t dispatch table, lz4frame.c:952-962)
so the same frame code runs over:
  * HostBackend  — numpy/C oracle codec (small inputs, tests, CLI fallback)
  * TPU backends — batched vectorized JAX/Pallas engines
                   (lz4_tpu.parallel.engine), which consume whole lists of
                   blocks at once: frame-level batching IS the TPU
                   data-parallel decomposition.
"""
from __future__ import annotations

import os
from typing import Protocol, Sequence


class BlockBackend(Protocol):
    def compress_batch(
        self,
        blocks: Sequence[bytes],
        *,
        level: int = 0,
        acceleration: int = 1,
        dict_prefixes: Sequence[bytes | None] | None = None,
        favor_dec_speed: bool = False,
    ) -> list[bytes]:
        ...

    def decompress_batch(
        self,
        blocks: Sequence[bytes],
        max_outs: Sequence[int],
        *,
        dict_prefixes: Sequence[bytes | None] | None = None,
    ) -> list[bytes]:
        ...


def default_nb_workers() -> int:
    """Worker-count default mirroring the reference CLI's heuristic
    (cores - 1 - cores/8, programs/lz4io.c:177-187), overridable via
    LZ4_NBWORKERS."""
    env = os.environ.get("LZ4_NBWORKERS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    cores = os.cpu_count() or 1
    return max(1, cores - 1 - cores // 8)


class HostBackend:
    """Host block codec: native C fast path (lz4_tpu.native.blockcodec)
    with the numpy oracle as fallback; HC levels use the C HC tier.

    nb_workers > 1 fans independent blocks out over a thread pool (the
    analog of the reference's TPool engine, programs/threadpool.c:222-428;
    ctypes releases the GIL during C codec calls, so the C path scales
    across cores). Dictionary chains (linked blocks) stay serial only in
    the sense that each block's call is independent — the prefixes are
    precomputed by the frame layer, so even linked batches parallelize.
    """

    def __init__(self, nb_workers: int = 0):
        try:
            from lz4_tpu import native
            self._native = native.blockcodec
        except Exception:
            self._native = None
        self.nb_workers = nb_workers
        self._pool = None

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=self.nb_workers)
        return self._pool

    def _map(self, fn, items):
        """Run fn over items, fanning out when a pool is configured and
        the batch is worth it."""
        if self.nb_workers > 1 and len(items) > 1 and self._native is not None:
            return list(self._executor().map(fn, items))
        return [fn(it) for it in items]

    def _chunked(self, batch_fn, blocks, *extra):
        """Run a whole-batch native call, fanning contiguous ranges out
        over the worker pool when configured (the C call releases the
        GIL, so ranges scale across cores)."""
        n = len(blocks)
        if self.nb_workers > 1 and n > 1:
            w = min(self.nb_workers, n)
            bounds = [(i * n) // w for i in range(w + 1)]
            parts = self._executor().map(
                lambda k: batch_fn(blocks[bounds[k]: bounds[k + 1]],
                                   *[e[bounds[k]: bounds[k + 1]]
                                     if isinstance(e, (list, tuple)) else e
                                     for e in extra]),
                range(w))
            out = []
            for p in parts:
                out.extend(p)
            return out
        return batch_fn(blocks, *extra)

    def compress_batch(self, blocks, *, level=0, acceleration=1,
                       dict_prefixes=None, favor_dec_speed=False,
                       max_dist=65535):
        from lz4_tpu.block.ref_codec import compress_block
        from lz4_tpu.hc.codec import compress_block_hc

        no_dicts = not dict_prefixes or not any(dict_prefixes)
        if max_dist < 65535:
            # distance-capped fast mode (wave-friendly streams;
            # lz4t_compress_block_maxd) — fast tier only. HC levels do
            # not honour the cap (the CLI rejects the combination,
            # cli.py); never fall through silently to an uncapped path.
            if level >= 2:
                raise ValueError(
                    "--max-dist applies to the fast tier only "
                    "(level < 2)")
            if self._native is not None:
                return self._map(
                    lambda ib: self._native.compress_maxd(
                        ib[1], max_dist, acceleration=max(1, acceleration),
                        dict_prefix=(dict_prefixes[ib[0]]
                                     if dict_prefixes else None)),
                    list(enumerate(blocks)))
            # pure-python fallback honours the cap too
            return self._map(
                lambda ib: compress_block(
                    ib[1], acceleration=max(1, acceleration),
                    dict_prefix=(dict_prefixes[ib[0]]
                                 if dict_prefixes else None),
                    max_dist=max_dist),
                list(enumerate(blocks)))
        if (level < 2 and no_dicts and self._native is not None
                and len(blocks) > 1):
            # one C call per worker range: pointer-array batch path
            return self._chunked(
                lambda bs, acc: self._native.compress_batch(
                    bs, acceleration=acc),
                list(blocks), max(1, acceleration))

        def one(ib):
            i, b = ib
            d = dict_prefixes[i] if dict_prefixes else None
            if level >= 2 and self._native is not None:
                return self._native.compress_hc(
                    b, level=level, dict_prefix=d,
                    favor_dec_speed=favor_dec_speed)
            if level >= 2:
                return compress_block_hc(b, level=level, dict_prefix=d,
                                         favor_dec_speed=favor_dec_speed)
            if self._native is not None:
                return self._native.compress(
                    b, dict_prefix=d, acceleration=max(1, acceleration))
            return compress_block(b, acceleration=max(1, acceleration),
                                  dict_prefix=d)

        return self._map(one, list(enumerate(blocks)))

    def decompress_batch(self, blocks, max_outs, *, dict_prefixes=None):
        from lz4_tpu.block.ref_codec import decompress_block

        no_dicts = not dict_prefixes or not any(dict_prefixes)
        if no_dicts and self._native is not None and len(blocks) > 1:
            return self._chunked(
                lambda bs, mo: self._native.decompress_batch(bs, mo),
                list(blocks), list(max_outs))

        def one(ib):
            i, b = ib
            d = dict_prefixes[i] if dict_prefixes else None
            if self._native is not None:
                return self._native.decompress(b, max_outs[i], dict_prefix=d)
            return decompress_block(b, max_outs[i], dict_prefix=d)

        return self._map(one, list(enumerate(blocks)))


_DEFAULT: BlockBackend | None = None


def default_backend() -> BlockBackend:
    """Process-wide default backend. Starts as HostBackend; the parallel
    engine installs a TPU backend via set_default_backend()."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = HostBackend()
    return _DEFAULT


def set_default_backend(b: BlockBackend | None) -> None:
    global _DEFAULT
    _DEFAULT = b
