// Native Theora token/DC hot paths for io/theora.py.
//
// The python decoder's coefficient token loop (per-ci buckets over
// coded-order blocks, spec 7.5) is the decode bottleneck (~60% of
// frame time at QVGA); this is the SAME algorithm in C++ — byte-
// identical outputs, verified by the existing oracle batteries run
// with/without the native path.  The DC predictor (spec 7.9.2) rides
// along for the same reason.
//
// Huffman tables arrive as raw (code, len, token) leaves exactly as
// parsed from the setup header (arbitrary prefix codes, depth up to
// 31 on hostile streams): an 8-bit primary LUT covers real tables,
// longer codes fall back to a prefix walk over the leaf list.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>

namespace {

struct ThTab {
    uint8_t prim_tok[256];
    uint8_t prim_len[256];     // 0 = not covered by the primary LUT
    uint32_t codes[32];
    uint8_t lens[32];
    uint8_t toks[32];
    int n = 0;
    int maxlen = 0;
    int zero_tok = -1;         // degenerate single-leaf zero-length
};

struct ThHuff {
    ThTab tabs[80];
};

struct BitRd {
    const uint8_t* d;
    int64_t nbits;
    int64_t pos;

    inline uint32_t read(int n) {
        int64_t p = pos;
        pos = p + n;
        uint32_t v = 0;
        for (int k = 0; k < n; k++) {
            int64_t b = p + k;
            uint32_t bit = 0;
            if (b < nbits)
                bit = (d[b >> 3] >> (7 - (b & 7))) & 1;
            v = (v << 1) | bit;
        }
        return v;
    }
    inline uint32_t peek8() {
        int64_t p = pos;
        uint32_t v = 0;
        for (int k = 0; k < 8; k++) {
            int64_t b = p + k;
            uint32_t bit = 0;
            if (b < nbits)
                bit = (d[b >> 3] >> (7 - (b & 7))) & 1;
            v = (v << 1) | bit;
        }
        return v;
    }
};

inline int decode_tok(BitRd& b, const ThTab& t) {
    if (t.zero_tok >= 0) return t.zero_tok;
    uint32_t v = b.peek8();
    if (t.prim_len[v]) {
        b.pos += t.prim_len[v];
        return t.prim_tok[v];
    }
    // long code: bit-walk against the leaf list
    uint32_t code = 0;
    int ln = 0;
    while (ln <= t.maxlen) {
        code = (code << 1) | b.read(1);
        ln++;
        for (int i = 0; i < t.n; i++)
            if (t.lens[i] == ln && t.codes[i] == code)
                return t.toks[i];
    }
    return -1;                 // corrupt stream
}

const int COEF_GROUP[64] = {
    0, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4};

}  // namespace

extern "C" {

void* tc_th_huff_new(const uint32_t* codes, const uint8_t* lens,
                     const uint8_t* toks, const int32_t* counts) {
    ThHuff* h = new ThHuff();
    int pos = 0;
    for (int t = 0; t < 80; t++) {
        ThTab& tab = h->tabs[t];
        tab.n = counts[t];
        std::memset(tab.prim_len, 0, sizeof tab.prim_len);
        if (tab.n == 1 && lens[pos] == 0) {
            tab.zero_tok = toks[pos];
            pos += 1;
            continue;
        }
        for (int i = 0; i < tab.n; i++) {
            uint32_t c = codes[pos + i];
            int ln = lens[pos + i];
            int tk = toks[pos + i];
            tab.codes[i] = c;
            tab.lens[i] = (uint8_t)ln;
            tab.toks[i] = (uint8_t)tk;
            if (ln > tab.maxlen) tab.maxlen = ln;
            if (ln <= 8) {
                uint32_t lo = c << (8 - ln);
                for (uint32_t k = lo; k < lo + (1u << (8 - ln)); k++) {
                    tab.prim_tok[k] = (uint8_t)tk;
                    tab.prim_len[k] = (uint8_t)ln;
                }
            }
        }
        pos += tab.n;
    }
    return h;
}

void tc_th_huff_free(void* h) { delete static_cast<ThHuff*>(h); }

// Decode the coefficient tokens for one frame.  base: per coded
// block, block_id*64 into cflat.  isl: 0 = luma, 1 = chroma table
// set.  Returns the final bit position, or -1 on a corrupt stream.
int64_t tc_th_tokens(void* huffh, const uint8_t* data, int64_t nbits,
                     int64_t startbit, const int64_t* base,
                     const uint8_t* isl, int32_t nb,
                     int32_t* cflat) {
    ThHuff* H = static_cast<ThHuff*>(huffh);
    BitRd b{data, nbits, startbit};

    std::vector<std::vector<int32_t>> buckets(64);
    buckets[0].resize(nb);
    for (int i = 0; i < nb; i++) buckets[0][i] = i;

    int hti_dc0 = b.read(4), hti_dc1 = b.read(4);
    const ThTab* lut0 = &H->tabs[hti_dc0];
    const ThTab* lut1 = &H->tabs[hti_dc1];
    int hti_ac0 = 0, hti_ac1 = 0;
    int64_t eob_run = 0;

    for (int ci = 0; ci < 64; ci++) {
        if (ci == 1) {
            hti_ac0 = b.read(4);
            hti_ac1 = b.read(4);
        }
        if (ci == 1 || ci == 6 || ci == 15 || ci == 28) {
            int group = COEF_GROUP[ci];
            lut0 = &H->tabs[16 * group + hti_ac0];
            lut1 = &H->tabs[16 * group + hti_ac1];
        }
        std::vector<int32_t>& cand = buckets[ci];
        if (cand.empty()) continue;
        std::sort(cand.begin(), cand.end());
        size_t k = 0;
        if (eob_run > 0) {
            k = (size_t)std::min<int64_t>(eob_run,
                                          (int64_t)cand.size());
            eob_run -= (int64_t)k;
        }
        for (size_t n_i = k; n_i < cand.size(); n_i++) {
            int32_t idx = cand[n_i];
            if (eob_run > 0) { eob_run--; continue; }
            const ThTab& tab = isl[idx] ? *lut1 : *lut0;
            int tok = decode_tok(b, tab);
            if (tok < 0) return -1;
            if (tok >= 9) {
                if (tok <= 22) {                // single value
                    int32_t val;
                    if (tok <= 12) {
                        static const int32_t V[4] = {1, -1, 2, -2};
                        val = V[tok - 9];
                    } else if (tok <= 16) {
                        int32_t mag = tok - 10;
                        val = b.read(1) ? -mag : mag;
                    } else {
                        static const int EX[6] = {1, 2, 3, 4, 5, 9};
                        static const int BS[6] = {7, 9, 13, 21, 37,
                                                  69};
                        uint32_t sign = b.read(1);
                        int32_t mag = BS[tok - 17]
                            + (int32_t)b.read(EX[tok - 17]);
                        val = sign ? -mag : mag;
                    }
                    cflat[base[idx] + ci] = val;
                    if (ci < 63) buckets[ci + 1].push_back(idx);
                    continue;
                }
                // combined zero run + value (23..31)
                int run;
                int32_t val;
                if (tok <= 27) {
                    run = tok - 22;
                    val = b.read(1) ? -1 : 1;
                } else if (tok == 28) {
                    uint32_t sign = b.read(1);
                    run = 6 + (int)b.read(2);
                    val = sign ? -1 : 1;
                } else if (tok == 29) {
                    uint32_t sign = b.read(1);
                    run = 10 + (int)b.read(3);
                    val = sign ? -1 : 1;
                } else if (tok == 30) {
                    uint32_t sign = b.read(1);
                    int32_t mag = 2 + (int32_t)b.read(1);
                    run = 1;
                    val = sign ? -mag : mag;
                } else {                        // 31
                    uint32_t sign = b.read(1);
                    int32_t mag = 2 + (int32_t)b.read(1);
                    run = 2 + (int)b.read(1);
                    val = sign ? -mag : mag;
                }
                int npos = ci + run;
                if (npos <= 63) cflat[base[idx] + npos] = val;
                if (npos < 63) buckets[npos + 1].push_back(idx);
                continue;
            }
            if (tok <= 6) {                     // EOB run token
                if (tok <= 2) eob_run = tok;
                else if (tok == 3) eob_run = 3 + b.read(2);
                else if (tok == 4) eob_run = 7 + b.read(3);
                else if (tok == 5) eob_run = 15 + b.read(4);
                else {
                    uint32_t vv = b.read(12);
                    eob_run = vv ? (int64_t)vv - 1
                                 : ((int64_t)1 << 30);
                }
                continue;
            }
            // zero runs (7, 8)
            int run = (int)(tok == 7 ? b.read(3) : b.read(6)) + 1;
            int npos = ci + run;
            if (npos < 64) buckets[npos].push_back(idx);
        }
    }
    return b.pos;
}

// DC prediction (spec 7.9.2) over the (total, 64) coefficient array.
// plane_off: 4 entries (3 plane starts + total); bw/bh per plane;
// coded/bclass per block.
void tc_th_predict_dc(int32_t* coefs, const uint8_t* coded,
                      const uint8_t* bclass, const int32_t* plane_off,
                      const int32_t* bwv, const int32_t* bhv) {
    static const int16_t PRED_W[16][4] = {
        {0, 0, 0, 0},    {0, 0, 0, 128},  {0, 0, 128, 0},
        {0, 0, 53, 75},  {0, 128, 0, 0},  {0, 64, 0, 64},
        {0, 128, 0, 0},  {0, 0, 53, 75},  {128, 0, 0, 0},
        {0, 0, 0, 128},  {64, 0, 64, 0},  {0, 0, 53, 75},
        {0, 128, 0, 0},  {-104, 116, 0, 116},  {24, 80, 24, 0},
        {-104, 116, 0, 116}};
    for (int p = 0; p < 3; p++) {
        int off = plane_off[p];
        int bw = bwv[p], bh = bhv[p];
        int32_t last_dc[3] = {0, 0, 0};
        for (int by = 0; by < bh; by++) {
            for (int bx = 0; bx < bw; bx++) {
                int bid = off + by * bw + bx;
                if (!coded[bid]) continue;
                int fc = bclass[bid];
                int idx = 0;
                int32_t vals[4] = {0, 0, 0, 0};   // UL, U, UR, L
                if (bx > 0) {
                    int nb = bid - 1;
                    if (coded[nb] && bclass[nb] == fc) {
                        idx |= 1;
                        vals[3] = coefs[(int64_t)nb * 64];
                    }
                }
                if (by > 0) {
                    int nb = bid - bw;
                    if (coded[nb] && bclass[nb] == fc) {
                        idx |= 4;
                        vals[1] = coefs[(int64_t)nb * 64];
                    }
                    if (bx > 0) {
                        nb = bid - bw - 1;
                        if (coded[nb] && bclass[nb] == fc) {
                            idx |= 8;
                            vals[0] = coefs[(int64_t)nb * 64];
                        }
                    }
                    if (bx < bw - 1) {
                        nb = bid - bw + 1;
                        if (coded[nb] && bclass[nb] == fc) {
                            idx |= 2;
                            vals[2] = coefs[(int64_t)nb * 64];
                        }
                    }
                }
                int32_t pred;
                if (idx == 0) {
                    pred = last_dc[fc];
                } else {
                    const int16_t* w = PRED_W[idx];
                    int64_t s = (int64_t)w[0] * vals[0]
                        + (int64_t)w[1] * vals[1]
                        + (int64_t)w[2] * vals[2]
                        + (int64_t)w[3] * vals[3];
                    pred = (int32_t)(s >= 0 ? s / 128 : -((-s) / 128));
                    if ((idx & 4) && (idx & 8) && (idx & 1)) {
                        if (std::abs(pred - vals[1]) > 128)
                            pred = vals[1];
                        else if (std::abs(pred - vals[3]) > 128)
                            pred = vals[3];
                        else if (std::abs(pred - vals[0]) > 128)
                            pred = vals[0];
                    }
                }
                coefs[(int64_t)bid * 64] += pred;
                last_dc[fc] = coefs[(int64_t)bid * 64];
            }
        }
    }
}

// Loop filter (spec 7.10).  Raster block order with the exact
// left-edge / top-edge / conditional right-bottom sequence — the
// filters READ pixels earlier filters wrote, so order is semantics
// (the python loop this ports is oracle-validated).
void tc_th_loop_filter(uint8_t* pl, int32_t stride, int32_t bw,
                       int32_t bh, const uint8_t* coded,
                       int32_t off, int32_t L) {
    auto boundv = [L](int32_t f) -> int32_t {
        int32_t a = f < 0 ? -f : f;
        int32_t m = a < L ? a : (a < 2 * L ? 2 * L - a : 0);
        return f < 0 ? -m : m;
    };
    auto filt_h = [&](int y0, int x) {
        for (int r = 0; r < 8; r++) {
            uint8_t* row = pl + (int64_t)(y0 + r) * stride;
            int32_t a = row[x - 2], b = row[x - 1];
            int32_t c = row[x], d = row[x + 1];
            int32_t f = (a - d) + 3 * (c - b);
            int32_t R = boundv((f + 4) >> 3);
            int32_t nb = b + R, nc = c - R;
            row[x - 1] = (uint8_t)(nb < 0 ? 0 : nb > 255 ? 255 : nb);
            row[x] = (uint8_t)(nc < 0 ? 0 : nc > 255 ? 255 : nc);
        }
    };
    auto filt_v = [&](int y, int x0) {
        uint8_t* r0 = pl + (int64_t)(y - 2) * stride;
        uint8_t* r1 = pl + (int64_t)(y - 1) * stride;
        uint8_t* r2 = pl + (int64_t)y * stride;
        uint8_t* r3 = pl + (int64_t)(y + 1) * stride;
        for (int c_i = 0; c_i < 8; c_i++) {
            int x = x0 + c_i;
            int32_t a = r0[x], b = r1[x], c = r2[x], d = r3[x];
            int32_t f = (a - d) + 3 * (c - b);
            int32_t R = boundv((f + 4) >> 3);
            int32_t nb = b + R, nc = c - R;
            r1[x] = (uint8_t)(nb < 0 ? 0 : nb > 255 ? 255 : nb);
            r2[x] = (uint8_t)(nc < 0 ? 0 : nc > 255 ? 255 : nc);
        }
    };
    for (int by = 0; by < bh; by++) {
        for (int bx = 0; bx < bw; bx++) {
            int bid = off + by * bw + bx;
            if (!coded[bid]) continue;
            int y0 = 8 * by, x0 = 8 * bx;
            if (bx > 0) filt_h(y0, x0);
            if (by > 0) filt_v(y0, x0);
            if (bx < bw - 1 && !coded[bid + 1]) filt_h(y0, x0 + 8);
            if (by < bh - 1 && !coded[bid + bw]) filt_v(y0 + 8, x0);
        }
    }
}

}  // extern "C"
