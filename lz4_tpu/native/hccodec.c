/* Host-side high-compression LZ4 block encoder (C) — hash-chain match
 * search with a level-dependent search depth and one-step lazy
 * arbitration, in the spirit of the reference's HC tier design
 * (lib/lz4hc.c strategy ladder, SURVEY.md §2 #5-#7) but an original
 * implementation written against the normative block format.
 *
 * Levels 2..9 map to chain-walk depths 4..256; levels 10..12 deepen the
 * walk (512..4096) — a depth-first stand-in for the reference's optimal
 * parser tier until the TPU-side DP parser lands.
 */
#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define MINMATCH 4
#define MFLIMIT 12
#define LASTLITERALS 5
#define WINDOW 65535
#define HC_HASH_LOG 15
#define HC_HASH_SIZE (1u << HC_HASH_LOG)
#define NOPOS 0xFFFFFFFFu

static inline uint32_t read32(const uint8_t *p) {
    uint32_t v; memcpy(&v, p, 4); return v;
}
static inline uint32_t hash4hc(uint32_t v) {
    return (v * 2654435761u) >> (32 - HC_HASH_LOG);
}
static inline size_t mlen_fwd(const uint8_t *a, const uint8_t *b,
                              const uint8_t *limit) {
    const uint8_t *s = a;
    while (a + 8 <= limit) {
        uint64_t xa, xb; memcpy(&xa, a, 8); memcpy(&xb, b, 8);
        if (xa != xb) {
            uint64_t x = xa ^ xb;
#if defined(__GNUC__)
            return (size_t)(a - s) + (__builtin_ctzll(x) >> 3);
#else
            { size_t k = 0; while (((x >> (8*k)) & 0xFF) == 0) k++;
              return (size_t)(a - s) + k; }
#endif
        }
        a += 8; b += 8;
    }
    while (a < limit && *a == *b) { a++; b++; }
    return (size_t)(a - s);
}

static int depth_for_level(int level) {
    static const int d[13] = {0, 0, 2, 4, 8, 16, 32, 64, 128, 256,
                              512, 1024, 4096};
    if (level < 2) level = 2;
    if (level > 12) level = 12;
    return d[level];
}

typedef struct {
    uint32_t head[HC_HASH_SIZE];
    uint32_t chain[1 << 17];         /* prev-occurrence links (128K) */
} hc_tables;

static void hc_insert(hc_tables *t, const uint8_t *base, long p) {
    uint32_t h = hash4hc(read32(base + p));
    t->chain[p & ((1 << 17) - 1)] = t->head[h];
    t->head[h] = (uint32_t)p;
}

/* longest match for position p among up to `depth` chain candidates;
 * returns length, sets *mpos */
static size_t hc_search(hc_tables *t, const uint8_t *base, long p,
                        long lowest, const uint8_t *limit, int depth,
                        long *mpos) {
    uint32_t h = hash4hc(read32(base + p));
    uint32_t c = t->head[h];
    size_t best = 0;
    int tries = depth;
    if (c == (uint32_t)p)             /* p itself was just inserted */
        c = t->chain[p & ((1 << 17) - 1)];
    while (c != NOPOS && (long)c >= lowest && tries-- > 0) {
        if ((long)(p - (long)c) <= WINDOW) {
            if (read32(base + c) == read32(base + p)) {
                size_t ml = MINMATCH + mlen_fwd(base + p + MINMATCH,
                                                base + c + MINMATCH, limit);
                if (ml > best) { best = ml; *mpos = (long)c; }
            }
        } else break;
        c = t->chain[c & ((1 << 17) - 1)];
        if (c != NOPOS && (long)c >= p) break;   /* stale ring entry */
    }
    return best;
}

static uint8_t *emit_len(uint8_t *op, size_t len) {
    len -= 15;
    while (len >= 255) { *op++ = 255; len -= 255; }
    *op++ = (uint8_t)len;
    return op;
}

static uint8_t *emit_seq(uint8_t *op, uint8_t *oend, const uint8_t *anchor,
                         size_t lit, size_t off, size_t ml) {
    size_t mlc = ml - MINMATCH;
    if (op + 1 + lit + lit / 255 + 2 + 1 + mlc / 255 + 16 > oend)
        return NULL;
    {
        uint8_t *tok = op++;
        if (lit >= 15) { *tok = 15 << 4; op = emit_len(op, lit); }
        else *tok = (uint8_t)(lit << 4);
        memcpy(op, anchor, lit); op += lit;
        *op++ = (uint8_t)(off & 0xFF);
        *op++ = (uint8_t)(off >> 8);
        if (mlc >= 15) { *tok |= 15; op = emit_len(op, mlc); }
        else *tok |= (uint8_t)mlc;
    }
    return op;
}

/* Compress src[0..n) with `dict_len` bytes of contiguous history before
 * it. Returns compressed size or 0 on overflow. Not thread-safe wrt a
 * shared tables struct; the wrapper allocates per call. */
long lz4t_compress_hc(const uint8_t *src, long n, uint8_t *dst,
                      long dst_cap, long dict_len, int level) {
    static hc_tables tables;          /* 640 KB: static per-process */
    hc_tables *t = &tables;
    const uint8_t *base = src - dict_len;
    const uint8_t *ip = src, *anchor = src;
    const uint8_t *iend = src + n;
    const uint8_t *mflimit = iend - MFLIMIT;
    const uint8_t *matchlimit = iend - LASTLITERALS;
    uint8_t *op = dst, *oend = dst + dst_cap;
    int depth = depth_for_level(level);
    long total = dict_len + n;
    long p;

    if (n == 0) { if (dst_cap < 1) return 0; *op = 0; return 1; }
    memset(t->head, 0xFF, sizeof(t->head));
    for (p = 0; p + MINMATCH <= dict_len; p++)
        hc_insert(t, base, p);

    if (n >= MFLIMIT + 1) {
        while (ip <= mflimit) {
            long cur = (long)(ip - base);
            long mpos = -1;
            size_t ml;
            hc_insert(t, base, cur);
            ml = hc_search(t, base, cur, cur - WINDOW < 0 ? 0 : cur - WINDOW,
                           matchlimit, depth, &mpos);
            if (ml < MINMATCH) { ip++; continue; }
            /* one-step lazy arbitration: prefer a strictly longer match
             * starting at ip+1 */
            while (ip + 1 <= mflimit) {
                long nxt = cur + 1;
                long mpos2 = -1;
                size_t ml2;
                hc_insert(t, base, nxt);
                ml2 = hc_search(t, base, nxt,
                                nxt - WINDOW < 0 ? 0 : nxt - WINDOW,
                                matchlimit, depth, &mpos2);
                if (ml2 <= ml) break;
                ip++; cur = nxt; ml = ml2; mpos = mpos2;
            }
            /* back-extension */
            while (ip > anchor && mpos > 0 &&
                   base + mpos > base && ip[-1] == base[mpos - 1]) {
                ip--; mpos--; ml++;
                cur--;
            }
            op = emit_seq(op, oend, anchor, (size_t)(ip - anchor),
                          (size_t)(cur - mpos), ml);
            if (!op) return 0;
            /* index the skipped positions (keeps chains dense) */
            { long q; for (q = cur + 1; q < cur + (long)ml &&
                           q + MINMATCH <= total; q++)
                    hc_insert(t, base, q); }
            ip += ml; anchor = ip;
        }
    }
    {
        size_t lit = (size_t)(iend - anchor);
        if (op + 1 + lit + lit / 255 + 1 > oend) return 0;
        if (lit >= 15) { *op++ = 15 << 4; op = emit_len(op, lit); }
        else *op++ = (uint8_t)(lit << 4);
        memcpy(op, anchor, lit); op += lit;
    }
    return (long)(op - dst);
}
