"""High-compression (HC) tier — levels 2..12.

Capability parity with lib/lz4hc.c's three strategies (SURVEY.md §2 #5-#8)
re-designed around this repo's exact match-finder instead of hash chains:

  * level 2      ("mid")      — greedy over exact nearest-occurrence
                                candidates with back-extension
                                (lz4hc.c:476-773 behavioural analog)
  * levels 3-9   ("chain")    — depth-limited multi-candidate search
                                (longest-match-wins) + 1-step lazy
                                arbitration; search depth follows the
                                reference's k_clTable nbSearches ladder
                                (lz4hc.c:92-106)
  * levels 10-12 ("optimal")  — forward dynamic program over sequence
                                prices (price model equivalent to
                                LZ4HC_literalsPrice/sequencePrice,
                                lz4hc.c:1778-1800)

Emitted bytes are standard LZ4 blocks decodable by any decoder — there is
exactly one decoder, mirroring the reference contract (lz4hc.h:69-71).
"""
from __future__ import annotations

import numpy as np

from lz4_tpu.block.ref_codec import (
    _emit_last_literals,
    _emit_sequence,
    _match_forward,
    prev_occurrence,
)
from lz4_tpu.constants import (
    LASTLITERALS,
    LZ4_DISTANCE_MAX,
    MFLIMIT,
    MINMATCH,
)

# nbSearches per level, following the reference ladder (lz4hc.c:92-106)
SEARCH_DEPTH = {2: 2, 3: 4, 4: 8, 5: 16, 6: 32, 7: 64, 8: 128, 9: 256,
                10: 512, 11: 1024, 12: 4096}

# favorDecSpeed trims matches in 19..36 to 18 bytes (lz4hc.c:926-928)
_FAVOR_TRIM_MIN, _FAVOR_TRIM_MAX = 19, 36


def _to_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return data.astype(np.uint8, copy=False)
    return np.frombuffer(memoryview(bytes(data)), dtype=np.uint8)


def _best_match(buf, prev, p, depth, end_limit, lowest, sufficient=1 << 30):
    """Longest match among up to `depth` previous occurrences of buf[p:p+4];
    ties broken toward the nearest (smallest offset). Stops early once
    `sufficient` length is reached (the reference's targetLength early-exit,
    lz4hc.c:1872-1882)."""
    best_len, best_pos = 0, -1
    c = prev[p] if p < prev.size else -1
    tries = depth
    while c >= 0 and tries > 0:
        if p - c > LZ4_DISTANCE_MAX or c < lowest:
            break
        ml = _match_forward(buf, p, int(c), end_limit)
        if ml > best_len:
            best_len, best_pos = ml, int(c)
            if ml >= sufficient:
                break
        tries -= 1
        c = prev[c]
    return best_len, best_pos


def compress_block_hc(src, *, level: int = 9,
                      dict_prefix=None, favor_dec_speed: bool = False) -> bytes:
    level = max(2, min(12, level))
    src_a = _to_u8(src)
    dict_a = _to_u8(dict_prefix)[-LZ4_DISTANCE_MAX:] if dict_prefix is not None and len(dict_prefix) else np.zeros(0, np.uint8)
    d = dict_a.size
    buf = np.concatenate([dict_a, src_a]) if d else src_a
    n = src_a.size
    end = d + n
    if n == 0:
        return b"\x00"

    prev = prev_occurrence(buf)
    depth = SEARCH_DEPTH[level]
    if level >= 10:
        return _compress_optimal(buf, prev, d, end, depth, favor_dec_speed)
    return _compress_chain(buf, prev, d, end, depth, level, favor_dec_speed)


def _trim_favor(ml: int, favor: bool) -> int:
    if favor and _FAVOR_TRIM_MIN <= ml <= _FAVOR_TRIM_MAX:
        return 18
    return ml


def _compress_chain(buf, prev, d, end, depth, level, favor) -> bytes:
    out = bytearray()
    match_start_limit = end - MFLIMIT
    end_limit = end - LASTLITERALS
    lazy = level >= 3
    anchor = p = d
    while p <= match_start_limit:
        ml, c = _best_match(buf, prev, p, depth, end_limit, 0)
        if ml < MINMATCH:
            p += 1
            continue
        if lazy:
            # lazy arbitration (Search2/Search3 analog, lz4hc.c:1157-1310):
            # keep deferring while a strictly longer match starts at p+1
            while p + 1 <= match_start_limit:
                ml2, c2 = _best_match(buf, prev, p + 1, depth, end_limit, 0)
                if ml2 <= ml:
                    break
                p += 1
                ml, c = ml2, c2
        # back-extension
        while p > anchor and c > 0 and buf[p - 1] == buf[c - 1]:
            p -= 1
            c -= 1
            ml += 1
        ml = _trim_favor(ml, favor)
        _emit_sequence(out, buf, anchor, p, p - c, ml)
        p += ml
        anchor = p
    _emit_last_literals(out, buf, anchor, end)
    return bytes(out)


def _seq_ext_bytes(code: int) -> int:
    """Extension bytes for a length nibble value >= 15."""
    if code < 15:
        return 0
    return 1 + (code - 15) // 255


def _compress_optimal(buf, prev, d, end, depth, favor) -> bytes:
    """Forward DP over positions. price[i] = min bytes to encode buf[d:i].
    Match candidates: maximal match per position; candidate lengths at the
    matchlen-price breakpoints {18, 273, ..., maximal} since offset price
    is constant (2 bytes) and matchlen price is piecewise constant."""
    n = end - d
    match_start_limit = end - MFLIMIT
    end_limit = end - LASTLITERALS
    INF = 1 << 60
    price = np.full(n + 1, INF, dtype=np.int64)
    price[0] = 0
    # parent[i] = (src_i, kind, off, mlen) for reconstruction
    parent: list[tuple | None] = [None] * (n + 1)
    lit_run = np.zeros(n + 1, dtype=np.int64)   # literal run ending at i

    for i in range(n):
        if price[i] >= INF:
            continue
        p = d + i
        # literal step
        r = int(lit_run[i]) + 1
        extra = 1
        if r == 15 or (r > 15 and (r - 15) % 255 == 0):
            extra += 1   # a new literal-length extension byte becomes due
        cand = price[i] + extra
        if cand < price[i + 1]:
            price[i + 1] = cand
            parent[i + 1] = (i, "lit", 0, 0)
            lit_run[i + 1] = r
        # match step
        if p <= match_start_limit:
            ml, c = _best_match(buf, prev, p, depth, end_limit, 0,
                                sufficient=4096)
            if ml >= MINMATCH:
                ml = _trim_favor(ml, favor)
                off = p - c
                lengths = {ml}
                for brk in (18, 273, 528):
                    if ml > brk:
                        lengths.add(brk)
                lengths.add(MINMATCH)
                for m in lengths:
                    if m < MINMATCH or m > ml:
                        continue
                    cost = price[i] + 1 + 2 + _seq_ext_bytes(m - MINMATCH)
                    j = i + m
                    if cost < price[j]:
                        price[j] = cost
                        parent[j] = (i, "match", off, m)
                        lit_run[j] = 0

    # reconstruct
    seqs = []
    j = n
    while j > 0:
        src_i, kind, off, m = parent[j]
        if kind == "match":
            seqs.append((src_i, off, m))
        j = src_i
    seqs.reverse()

    out = bytearray()
    anchor = d
    for (i, off, m) in seqs:
        p = d + i
        _emit_sequence(out, buf, anchor, p, off, m)
        anchor = p + m
    _emit_last_literals(out, buf, anchor, end)
    return bytes(out)
