"""Corpus-level batched codec: one device dispatch for many chunks.

The remote-relay dispatch+sync overhead is ~27 ms per call
(docs/tpu_perf_notes.md) — a 48 MB corpus processed as 23 separate
32-block chunk dispatches pays ~0.6 s of pure overhead. These wrappers
`lax.map` the chunk codec over a leading chunk axis inside ONE jitted
program, so a whole corpus is a single dispatch while the compiled body
(and its shape family: B=32 x 64 KB) stays identical to the per-chunk
graphs the engine uses.

Reference analog: the bench harness's block loop (programs/bench.c:
388-441) — there the loop is free; through the relay it is not.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lz4_tpu.block.decode_jax import decode_blocks
from lz4_tpu.block.encode_jax import encode_blocks


@functools.partial(jax.jit, static_argnames=("cap_n", "has_dict",
                                             "n_cand", "lazy", "lite"))
def encode_corpus(src, lens, dict_bufs, dict_lens, *, cap_n: int,
                  has_dict: bool, n_cand: int = 2, lazy: bool = False,
                  lite: bool = False):
    """Batched encode over a [NC, B, cap_n] chunked corpus in one
    dispatch. dict_bufs/dict_lens are per-chunk ([NC, B, 65536]/[NC, B])
    when has_dict else broadcast dummies ([B, 65536]/[B]).
    Returns (out uint8[NC, B, bound], csizes int32[NC, B],
    trailing int32[NC, B])."""
    def body(args):
        if has_dict:
            s, l, db, dl = args
        else:
            s, l = args
            db, dl = dict_bufs, dict_lens
        return encode_blocks(s, l, db, dl, cap_n=cap_n, has_dict=has_dict,
                             n_cand=n_cand, lazy=lazy, lite=lite)

    xs = (src, lens, dict_bufs, dict_lens) if has_dict else (src, lens)
    return jax.lax.map(body, xs)


@functools.partial(jax.jit, static_argnames=("cap_out", "has_dict",
                                             "partial"))
def decode_corpus(comp, comp_lens, dict_bufs, dict_lens, *, cap_out: int,
                  has_dict: bool, partial: bool = False):
    """Batched decode over a [NC, B, cap_in] chunked corpus in one
    dispatch (see encode_corpus). Returns (out uint8[NC, B, cap_out],
    out_lens int32[NC, B], errs int32[NC, B])."""
    def body(args):
        if has_dict:
            c, l, db, dl = args
        else:
            c, l = args
            db, dl = dict_bufs, dict_lens
        return decode_blocks(c, l, db, dl, cap_out=cap_out,
                             has_dict=has_dict, partial=partial)

    xs = (comp, comp_lens, dict_bufs, dict_lens) if has_dict else (
        comp, comp_lens)
    return jax.lax.map(body, xs)
