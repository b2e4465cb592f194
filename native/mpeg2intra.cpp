// MPEG-2 intra-picture elementary-stream decoder (host bitstream stage).
//
// This is the serial half of the tcforge_tpu MPEG-2 decode path: it
// parses sequence/picture headers and slices, VLC-decodes intra
// macroblocks with the complete ISO/IEC 13818-2 Tables B-1/B-12/B-13/
// B-14/B-15, dequantizes (linear + nonlinear quantiser scales, custom
// intra matrices, saturation, mismatch control) and emits natural-order
// 8x8 coefficient blocks.  The inverse DCT then runs *batched on the
// accelerator* (einsum over every block of a frame at once) — the
// bitstream walk is the only part that is inherently sequential, so it
// is the only part that lives here.
//
// Replaces the reference's external libmpeg2 usage (import/decode_mpeg2.c,
// import/tcrequant.c bitstream stage).  The VLC tables are ISO 13818-2
// constants (run/level windows as in tcrequant.c:838-916 / getvlc.h,
// stored run = spec run + 1, 65 = escape, 129 = end-of-block).
//
// Intra-only scope for this round: P/B pictures, field pictures, field
// DCT and concealment vectors return TC_M2D_EUNSUP.

#include <cstdint>
#include <cstring>
#include <string>

#include "mpeg2tables.h"

namespace {

using namespace m2tab;

// --------------------------------------------------------------------------

struct Bits {
    const uint8_t* d;
    int64_t nbits;
    int64_t pos = 0;
    bool overrun = false;

    Bits(const uint8_t* data, int64_t size)
        : d(data), nbits(size * 8) {}

    // 32 bits at the cursor, zero-padded past the end (the standard
    // lookahead window for the VLC dispatch)
    inline uint32_t show32() const {
        int64_t byte = pos >> 3;
        int off = int(pos & 7);
        int64_t nb = nbits >> 3;
        uint64_t v = 0;
        for (int i = 0; i < 5; i++)
            v = (v << 8) | (byte + i < nb ? d[byte + i] : 0);
        return uint32_t(v >> (8 - off));
    }
    inline uint32_t show(int k) const { return show32() >> (32 - k); }
    inline void skip(int k) {
        pos += k;
        if (pos > nbits) { overrun = true; pos = nbits; }
    }
    inline uint32_t get(int k) {
        uint32_t v = show(k);
        skip(k);
        return v;
    }
    inline void align() { pos = (pos + 7) & ~int64_t(7); }
    inline bool eof() const { return pos >= nbits; }

    // advance past the next 00 00 01 xx start code; -1 at end
    int next_start_code() {
        align();
        int64_t i = pos >> 3;
        int64_t n = nbits >> 3;
        while (i + 3 < n) {
            if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 1) {
                pos = (i + 4) * 8;
                return d[i + 3];
            }
            i++;
        }
        pos = nbits;
        return -1;
    }
};

struct M2Dec {
    const uint8_t* data;
    int64_t size;
    Bits bits;
    std::string err;

    int width = 0, height = 0;
    double fps = 25.0;
    bool have_seq = false;
    int intra_matrix[64];   // natural order

    // picture coding extension state (MPEG-1 defaults when absent)
    int intra_dc_precision = 0;
    int q_scale_type = 0;
    int intra_vlc_format = 0;
    int alternate_scan = 0;
    int frame_pred_frame_dct = 1;
    int concealment_mv = 0;
    int picture_structure = 3;

    M2Dec(const uint8_t* d, int64_t n) : data(d), size(n), bits(d, n) {
        memcpy(intra_matrix, kDefaultIntraMatrix, sizeof(intra_matrix));
    }

    int quantiser_scale(int code) const {
        return q_scale_type ? kQScaleNonlinear[code & 31] : (code & 31) * 2;
    }
};

#define TC_M2D_OK 1
#define TC_M2D_EOS 0
#define TC_M2D_ETRUNC (-1)
#define TC_M2D_EUNSUP (-2)
#define TC_M2D_EPARSE (-3)

bool parse_sequence_header(M2Dec* dec) {
    Bits& b = dec->bits;
    dec->width = int(b.get(12));
    dec->height = int(b.get(12));
    b.skip(4);                          // aspect ratio information
    int frc = int(b.get(4));
    if (kFrameRates[frc] > 0) dec->fps = kFrameRates[frc];
    b.skip(18 + 1 + 10 + 1);            // bitrate, marker, vbv, constrained
    if (b.get(1)) {                     // load_intra_quantiser_matrix
        for (int i = 0; i < 64; i++)
            dec->intra_matrix[kScanZigzag[i]] = int(b.get(8));
    }
    if (b.get(1)) b.skip(64 * 8);       // non-intra matrix (unused here)
    if (b.overrun) { dec->err = "truncated sequence header"; return false; }
    dec->have_seq = true;
    return true;
}

void parse_picture_coding_extension(M2Dec* dec) {
    Bits& b = dec->bits;
    b.skip(16);                         // f_codes
    dec->intra_dc_precision = int(b.get(2));
    dec->picture_structure = int(b.get(2));
    b.skip(1);                          // top_field_first
    dec->frame_pred_frame_dct = int(b.get(1));
    dec->concealment_mv = int(b.get(1));
    dec->q_scale_type = int(b.get(1));
    dec->intra_vlc_format = int(b.get(1));
    dec->alternate_scan = int(b.get(1));
    // repeat_first_field, chroma_420_type, progressive_frame, composite
    b.skip(4);
}

// DC size VLC (Tables B-12/B-13) + differential bits -> dc_dct_differential
inline int read_dc_diff(Bits& b, bool chroma, bool* ok) {
    int size, len;
    uint32_t bb = b.show32();
    if (!chroma) {
        if (bb < 0xf8000000u) {
            const DcVlc& t = kDcLuma5[bb >> 27];
            size = t.size; len = t.len;
        } else {
            const DcVlc& t = kDcLong[(bb >> 23) - 0x1e0];
            size = t.size; len = t.len;
        }
    } else {
        if (bb < 0xf8000000u) {
            const DcVlc& t = kDcChroma5[bb >> 27];
            size = t.size; len = t.len;
        } else {
            // kDcLong stores luma code lengths; the chroma codes of the
            // same size are one bit longer (Table B-13 vs B-12)
            const DcVlc& t = kDcLong[(bb >> 22) - 0x3e0];
            size = t.size; len = t.len + 1;
        }
    }
    b.skip(len);
    if (size == 0) return 0;
    int v = int(b.get(size));
    if (b.overrun) { *ok = false; return 0; }
    if (!(v >> (size - 1))) v = v + 1 - (1 << size);
    return v;
}

// One intra block: VLC decode + dequant + mismatch control into out[64]
// (natural order).  Returns false on parse error/overrun.
bool read_intra_block(M2Dec* dec, bool chroma, int* dc_pred, int qscale,
                      int32_t* out) {
    Bits& b = dec->bits;
    const int* scan = dec->alternate_scan ? kScanAlt : kScanZigzag;
    memset(out, 0, 64 * sizeof(int32_t));

    bool ok = true;
    int diff = read_dc_diff(b, chroma, &ok);
    if (!ok) { dec->err = "truncated block"; return false; }
    *dc_pred += diff;
    int sum = 0;
    {
        int f = *dc_pred * (8 >> dec->intra_dc_precision);
        if (f > 2047) f = 2047;
        if (f < -2048) f = -2048;
        out[0] = f;
        sum = f;
    }

    int idx = 0;
    const bool b15 = dec->intra_vlc_format != 0;
    for (;;) {
        uint32_t bb = b.show32();
        const Vlc* t;
        int pre_skip = 0;
        if (b15) {
            if (bb >= 0x04000000u) t = &kB15Top8[(bb >> 24) - 4];
            else if (bb >= 0x02000000u) t = &kB15Top10[(bb >> 22) - 8];
            else if (bb >= 0x00800000u) t = &kTop13[(bb >> 19) - 16];
            else if (bb >= 0x00200000u) t = &kTop15[(bb >> 17) - 16];
            else { t = &kTop16[bb >> 16]; pre_skip = 16; }
        } else {
            if (bb >= 0x28000000u) t = &kB14Top5[(bb >> 27) - 5];
            else if (bb >= 0x04000000u) t = &kB14Top8[(bb >> 24) - 4];
            else if (bb >= 0x02000000u) t = &kB14Top10[(bb >> 22) - 8];
            else if (bb >= 0x00800000u) t = &kTop13[(bb >> 19) - 16];
            else if (bb >= 0x00200000u) t = &kTop15[(bb >> 17) - 16];
            else { t = &kTop16[bb >> 16]; pre_skip = 16; }
        }
        int level;
        if (t->run == RUN_EOB) {
            b.skip(pre_skip + t->len);
            break;
        }
        if (t->run == RUN_ESC) {
            b.skip(6);
            idx += int(b.get(6)) + 1;
            int lv = int(b.get(12));
            if (lv >= 2048) lv -= 4096;
            level = lv;
        } else {
            b.skip(pre_skip + t->len);
            idx += t->run;              // stored run = spec run + 1
            level = b.get(1) ? -int(t->lvl) : int(t->lvl);
        }
        if (idx > 63 || b.overrun) {
            dec->err = "AC coefficient run overflow";
            return false;
        }
        int natural = scan[idx];
        // intra dequant: F = (2*QF*W*qs)/32, truncation toward zero
        long long f = 2LL * level * dec->intra_matrix[natural] * qscale;
        f /= 32;                        // C division truncates toward zero
        if (f > 2047) f = 2047;
        if (f < -2048) f = -2048;
        out[natural] = int32_t(f);
        sum += int(f);
    }
    // mismatch control (ISO 13818-2 7.4.4): toggle LSB of F[7][7] if the
    // coefficient sum is even
    if ((sum & 1) == 0) out[63] ^= 1;
    return !b.overrun;
}

// Decode one intra picture (cursor just past the 0x00 picture start
// code) into per-plane coefficient block grids.
int decode_picture(M2Dec* dec, int32_t* ycoef, int32_t* ucoef,
                   int32_t* vcoef) {
    Bits& b = dec->bits;
    b.skip(10);                         // temporal reference
    int ptype = int(b.get(3));
    if (ptype != 1) {
        dec->err = "picture type " + std::to_string(ptype) +
                   " (P/B decode is intra-only scope)";
        return TC_M2D_EUNSUP;
    }
    b.skip(16);                         // vbv_delay
    while (b.get(1)) b.skip(8);         // extra_information_picture
    if (b.overrun) { dec->err = "truncated picture header"; return TC_M2D_ETRUNC; }

    const int mb_w = dec->width / 16, mb_h = dec->height / 16;
    const int bw = mb_w * 2;            // luma block-grid width

    for (;;) {
        int code = b.next_start_code();
        if (code < 0) break;
        if (code == 0xB5) {
            if (b.show(4) == 8) { b.skip(4); parse_picture_coding_extension(dec); }
            continue;
        }
        if (code < 0x01 || code > 0xAF) {
            b.pos -= 32;                // next picture/sequence/end
            break;
        }
        if (dec->picture_structure != 3) {
            dec->err = "field pictures not supported (intra frame scope)";
            return TC_M2D_EUNSUP;
        }
        if (dec->concealment_mv) {
            dec->err = "concealment motion vectors not supported";
            return TC_M2D_EUNSUP;
        }
        int row = code - 1;
        if (row >= mb_h) { dec->err = "slice row out of range"; return TC_M2D_EPARSE; }
        int qscale = dec->quantiser_scale(int(b.get(5)));
        while (b.get(1)) b.skip(8);     // extra_information_slice

        int pred_y = 128 << dec->intra_dc_precision;
        int pred_u = pred_y, pred_v = pred_y;
        int col = 0;
        while (col < mb_w && !b.overrun) {
            // macroblock_address_increment (Table B-1)
            int inc = 0;
            for (;;) {
                uint32_t bb = b.show32();
                if (bb >= 0x10000000u) {
                    const MbaVlc& t = kMba5[(bb >> 27) - 2];
                    b.skip(t.len); inc += t.inc; break;
                } else if (bb >= 0x03000000u) {
                    const MbaVlc& t = kMba11[(bb >> 21) - 24];
                    b.skip(t.len); inc += t.inc; break;
                } else if (b.show(11) == 8) {
                    b.skip(11); inc += 33;       // macroblock_escape
                } else {
                    dec->err = "bad macroblock address increment";
                    return TC_M2D_EPARSE;
                }
            }
            if (inc != 0) {
                dec->err = "skipped macroblocks in intra picture";
                return TC_M2D_EPARSE;
            }
            // macroblock modes for I pictures: 1 = intra,
            // 01 = intra + new quantiser code
            if (b.get(1) == 0) {
                if (b.get(1) != 1) {
                    dec->err = "bad intra macroblock type";
                    return TC_M2D_EPARSE;
                }
                qscale = dec->quantiser_scale(int(b.get(5)));
            }
            if (dec->frame_pred_frame_dct == 0) {
                if (b.get(1)) {          // dct_type: field DCT
                    dec->err = "field DCT not supported";
                    return TC_M2D_EUNSUP;
                }
            }
            static const int kOff[4][2] = {{0, 0}, {0, 1}, {1, 0}, {1, 1}};
            for (int blk = 0; blk < 4; blk++) {
                int gy = row * 2 + kOff[blk][0];
                int gx = col * 2 + kOff[blk][1];
                if (!read_intra_block(dec, false, &pred_y, qscale,
                                      ycoef + (int64_t(gy) * bw + gx) * 64))
                    return b.overrun ? TC_M2D_ETRUNC : TC_M2D_EPARSE;
            }
            if (!read_intra_block(dec, true, &pred_u, qscale,
                                  ucoef + (int64_t(row) * mb_w + col) * 64))
                return b.overrun ? TC_M2D_ETRUNC : TC_M2D_EPARSE;
            if (!read_intra_block(dec, true, &pred_v, qscale,
                                  vcoef + (int64_t(row) * mb_w + col) * 64))
                return b.overrun ? TC_M2D_ETRUNC : TC_M2D_EPARSE;
            col++;
        }
        if (b.overrun) { dec->err = "truncated slice"; return TC_M2D_ETRUNC; }
    }
    return TC_M2D_OK;
}

}  // namespace

extern "C" {

void* tc_m2d_open(const uint8_t* data, int64_t size) {
    M2Dec* dec = new M2Dec(data, size);
    // pre-scan the first sequence header so callers can size buffers
    Bits probe(data, size);
    for (;;) {
        int code = probe.next_start_code();
        if (code < 0) break;
        if (code == 0xB3) {
            Bits saved = dec->bits;
            dec->bits = probe;
            parse_sequence_header(dec);
            dec->bits = saved;
            break;
        }
    }
    return dec;
}

int tc_m2d_width(void* h) { return static_cast<M2Dec*>(h)->width; }
int tc_m2d_height(void* h) { return static_cast<M2Dec*>(h)->height; }
double tc_m2d_fps(void* h) { return static_cast<M2Dec*>(h)->fps; }

const char* tc_m2d_errmsg(void* h) {
    return static_cast<M2Dec*>(h)->err.c_str();
}

// Decode the next intra picture.  ycoef: (mb_h*2, mb_w*2, 64) int32;
// ucoef/vcoef: (mb_h, mb_w, 64).  Returns 1 picture, 0 EOS, <0 error.
int tc_m2d_next(void* h, int32_t* ycoef, int32_t* ucoef, int32_t* vcoef) {
    M2Dec* dec = static_cast<M2Dec*>(h);
    for (;;) {
        int code = dec->bits.next_start_code();
        if (code < 0) return TC_M2D_EOS;
        if (code == 0xB3) {
            int w = dec->width, hgt = dec->height;
            if (!parse_sequence_header(dec)) return TC_M2D_ETRUNC;
            if (dec->have_seq && w && (w != dec->width || hgt != dec->height)) {
                dec->err = "mid-stream geometry change";
                return TC_M2D_EUNSUP;
            }
        } else if (code == 0x00) {
            if (!dec->have_seq) {
                dec->err = "picture before sequence header";
                return TC_M2D_EPARSE;
            }
            return decode_picture(dec, ycoef, ucoef, vcoef);
        } else if (code == 0xB7) {
            return TC_M2D_EOS;
        }
        // 0xB2 user data, 0xB5 extensions, 0xB8 GOP: skip
    }
}

void tc_m2d_close(void* h) { delete static_cast<M2Dec*>(h); }

}  // extern "C"
