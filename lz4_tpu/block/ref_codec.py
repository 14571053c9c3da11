"""Host (numpy) LZ4 block codec — the in-repo correctness oracle.

Original implementation written against the normative block format
(/root/reference/doc/lz4_Block_format.md). It is NOT a translation of
lib/lz4.c: the match finder is an exact nearest-previous-occurrence search
(stable argsort over 4-byte words) instead of the reference's lossy
2^12-bucket hash table, so the greedy parse typically finds *more* matches
than the reference while emitting the same bit-exact format.

Roles: test oracle for the TPU kernels, host fallback for tiny inputs,
and the model for the vectorized JAX encoder (lz4_tpu/block/encode_jax.py)
— the JAX encoder is this algorithm re-expressed as pointer-doubling +
prefix sums.
"""
from __future__ import annotations

import numpy as np

from lz4_tpu.constants import (
    LASTLITERALS,
    LZ4_DISTANCE_MAX,
    MFLIMIT,
    MINMATCH,
    compress_bound,
)


class BlockDecodeError(ValueError):
    pass


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _words4(buf: np.ndarray) -> np.ndarray:
    """Little-endian uint32 read of buf[p:p+4] for every p <= n-4."""
    n = buf.size
    if n < 4:
        return np.zeros(0, dtype=np.uint32)
    b = buf.astype(np.uint32)
    return b[: n - 3] | (b[1: n - 2] << 8) | (b[2: n - 1] << 16) | (b[3:] << 24)


def prev_occurrence(buf: np.ndarray, min_pos: int = 0) -> np.ndarray:
    """For each position p, the nearest q < p with the same 4-byte word, or
    -1. Exact (collision-free) — the vector-friendly replacement for the
    reference's hash-table probe (lz4.c:1023-1100)."""
    words = _words4(buf)
    m = words.size
    prev = np.full(m, -1, dtype=np.int64)
    if m == 0:
        return prev
    order = np.argsort(words, kind="stable")
    sw = words[order]
    same = sw[1:] == sw[:-1]
    prev[order[1:][same]] = order[:-1][same]
    return prev


def _match_forward(buf: np.ndarray, a: int, b: int, limit: int) -> int:
    """Length of common prefix of buf[a:limit] and buf[b:limit-? ] — compares
    buf[a+i] == buf[b+i] while a+i < limit (a > b)."""
    n = limit - a
    if n <= 0:
        return 0
    step = 4096
    total = 0
    while total < n:
        k = min(step, n - total)
        x = buf[a + total: a + total + k]
        y = buf[b + total: b + total + k]
        neq = x != y
        if neq.any():
            return total + int(np.argmax(neq))
        total += k
    return n


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def compress_block(src: bytes | np.ndarray, *, acceleration: int = 1,
                   dict_prefix: bytes | np.ndarray | None = None,
                   max_dist: int = LZ4_DISTANCE_MAX) -> bytes:
    """Greedy LZ4 block compression. Returns the raw block bytes.

    `dict_prefix` prepends history (streaming linked blocks / external
    dictionary): matches may reference it, output covers only `src`.
    Behavioural analog of LZ4_compress_fast_continue's prefix mode
    (lz4.c:1707) — the implementation is the sort-based exact matcher.
    """
    src_a = np.frombuffer(memoryview(bytes(src) if not isinstance(src, np.ndarray) else src.tobytes()), dtype=np.uint8)
    if dict_prefix is not None and len(dict_prefix):
        dict_a = np.frombuffer(memoryview(bytes(dict_prefix) if not isinstance(dict_prefix, np.ndarray) else dict_prefix.tobytes()), dtype=np.uint8)
        dict_a = dict_a[-LZ4_DISTANCE_MAX:]
    else:
        dict_a = np.zeros(0, dtype=np.uint8)
    d = dict_a.size
    buf = np.concatenate([dict_a, src_a]) if d else src_a
    n = src_a.size
    end = d + n                       # absolute end in buf coordinates
    out = bytearray()

    if n == 0:
        return b"\x00"                 # single empty-literal token

    match_start_limit = end - MFLIMIT   # match may start at p <= this
    match_end_limit = end - LASTLITERALS

    prev = prev_occurrence(buf)
    anchor = d
    p = d
    # Acceleration: like the reference's skip heuristic (lz4.c:1044-1053),
    # the search stride grows with consecutive misses, scaled by
    # `acceleration`; unlike the reference it resets per anchor only.
    skip_trigger = 6
    search_nb = acceleration << skip_trigger

    while p <= match_start_limit:
        c = prev[p] if p < prev.size else -1
        ml = 0
        if c >= 0 and p - c <= min(LZ4_DISTANCE_MAX, max_dist):
            ml = _match_forward(buf, p, int(c), match_end_limit)
        if ml >= MINMATCH:
            # back-extension (catch-up), lz4.c:1104-1109 behaviour
            c = int(c)
            while p > anchor and c > 0 and buf[p - 1] == buf[c - 1]:
                p -= 1
                c -= 1
                ml += 1
            _emit_sequence(out, buf, anchor, p, p - c, ml)
            p += ml
            anchor = p
            search_nb = acceleration << skip_trigger
        else:
            p += max(1, search_nb >> skip_trigger)
            search_nb += 1

    _emit_last_literals(out, buf, anchor, end)
    return bytes(out)


def _length_ext(out: bytearray, length: int) -> None:
    length -= 15
    while length >= 255:
        out.append(255)
        length -= 255
    out.append(length)


def _emit_sequence(out: bytearray, buf: np.ndarray, anchor: int, p: int,
                   offset: int, matchlen: int) -> None:
    litlen = p - anchor
    ml_code = matchlen - MINMATCH
    token = (min(litlen, 15) << 4) | min(ml_code, 15)
    out.append(token)
    if litlen >= 15:
        _length_ext(out, litlen)
    out += buf[anchor:p].tobytes()
    out.append(offset & 0xFF)
    out.append((offset >> 8) & 0xFF)
    if ml_code >= 15:
        _length_ext(out, ml_code)


def _emit_last_literals(out: bytearray, buf: np.ndarray, anchor: int,
                        end: int) -> None:
    litlen = end - anchor
    out.append(min(litlen, 15) << 4)
    if litlen >= 15:
        _length_ext(out, litlen)
    out += buf[anchor:end].tobytes()


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decompress_block(comp: bytes, max_out: int,
                     dict_prefix: bytes | None = None,
                     partial: bool = False) -> bytes:
    """Safe LZ4 block decoder (never reads/writes out of bounds; raises
    BlockDecodeError on malformed input). Behavioural spec:
    LZ4_decompress_safe(_usingDict/_partial) (lz4.c:2022-2445) — the
    implementation is a direct sequence interpreter over the format doc.

    With partial=True, decoding stops once max_out bytes are produced
    (LZ4_decompress_safe_partial semantics) and truncated final sequences
    are accepted.
    """
    comp = bytes(comp)
    dict_b = bytes(dict_prefix) if dict_prefix else b""
    m = len(comp)
    out = bytearray()
    ip = 0
    while True:
        if ip >= m:
            raise BlockDecodeError("truncated input: missing token")
        token = comp[ip]
        ip += 1
        litlen = token >> 4
        if litlen == 15:
            litlen, ip = _read_varlen(comp, ip, litlen)
        if litlen:
            if ip + litlen > m:
                raise BlockDecodeError("literal run overruns input")
            if len(out) + litlen > max_out:
                if partial:
                    need = max_out - len(out)
                    out += comp[ip: ip + need]
                    return bytes(out)
                raise BlockDecodeError("output overflow on literals")
            out += comp[ip: ip + litlen]
            ip += litlen
        if ip == m:
            break                      # last sequence: literals only
        if partial and len(out) >= max_out:
            return bytes(out[:max_out])
        if not partial:
            # parsing restrictions, enforced like the reference decoder
            # (lz4.c:2279-2318): a match sequence's literals must end
            # >= 2+1+LASTLITERALS bytes before the input end and
            # >= MFLIMIT before the output end, else the stream should
            # have ended here
            if m - ip < 2 + 1 + LASTLITERALS:
                raise BlockDecodeError("sequence too close to input end")
            if max_out - len(out) < MFLIMIT:
                raise BlockDecodeError("match too close to output end")
        if ip + 2 > m:
            raise BlockDecodeError("truncated offset")
        offset = comp[ip] | (comp[ip + 1] << 8)
        ip += 2
        if offset == 0:
            raise BlockDecodeError("invalid zero offset")
        mlen = token & 15
        if mlen == 15:
            mlen, ip = _read_varlen(comp, ip, mlen)
        mlen += MINMATCH
        pos = len(out)
        if offset > pos + len(dict_b):
            raise BlockDecodeError("offset beyond window start")
        if pos + mlen > max_out:
            if not partial:
                raise BlockDecodeError("output overflow on match")
            mlen = max_out - pos
        # dict part of the match
        if offset > pos:
            take = min(offset - pos, mlen)
            start = len(dict_b) - (offset - pos)
            out += dict_b[start: start + take]
            mlen -= take
        # in-output part (handles overlap byte-serially)
        if mlen > 0:
            start = len(out) - offset if offset <= len(out) else 0
            for i in range(mlen):
                out.append(out[start + i])
        if partial and len(out) >= max_out:
            return bytes(out[:max_out])
    return bytes(out)


def _read_varlen(comp: bytes, ip: int, base: int) -> tuple[int, int]:
    length = base
    m = len(comp)
    while True:
        if ip >= m:
            raise BlockDecodeError("truncated length extension")
        b = comp[ip]
        ip += 1
        length += b
        if length > (1 << 31):
            raise BlockDecodeError("length overflow")
        if b != 255:
            return length, ip
