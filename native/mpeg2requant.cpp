// MPEG-2 bitstream-domain requantizer (tcrequant analogue).
//
// Shrinks an MPEG-2 video elementary stream without re-encoding:
// headers, motion vectors and DC coefficients are copied bit-exactly;
// only the AC coefficients are re-quantized (level' = level*q/nq) and
// re-emitted with new quantiser scales.  A closed feedback loop
// (quant_corr) steers the output size toward in_size/factor, exactly
// like the reference import/tcrequant.c:
//   - B slices carry the shrink (scale_quant toward quant*factor),
//   - I slices and intra macroblocks get increment_quant bumps,
//   - P non-intra blocks keep their quantizer (level drop only via the
//     last-coefficient trim when very far behind target),
//   - a transcoded slice that grows is replaced by the original bytes.
//
// The bit-level walk covers I/P/B frame and field pictures: macroblock
// type/motion/CBP VLCs parse-and-copy through, intra blocks re-emit
// through Tables B-14/B-15 encode tables, non-intra blocks re-emit via
// the run/level encode tables with the first-coefficient short form.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "mpeg2tables.h"

namespace {

using namespace m2tab;

constexpr double kReactDelay = 256.0;
constexpr int kMaxErrors = 2;

constexpr int MB_INTRA = 1;
constexpr int MB_PATTERN = 2;
constexpr int MB_BACKWARD = 4;
constexpr int MB_FORWARD = 8;
constexpr int MB_QUANT = 16;
constexpr int DCT_INTERLACED = 32;
constexpr int MOTION_BASE = 64;
constexpr int MC_FIELD = 1 * MOTION_BASE;
constexpr int MC_FRAME = 2 * MOTION_BASE;   // also MC_16X8 in field pics
constexpr int MC_DMV = 3 * MOTION_BASE;

struct RunLevel { int run, level; };

struct Requant {
    const uint8_t* in;
    int64_t in_size;
    int64_t rpos = 0;                 // byte cursor
    std::vector<uint8_t>& out;
    double factor;

    // input bit engine (24..32 bits in window, like the reference)
    uint32_t ibuf = 0;
    int ibits = 0;
    // output bit engine
    uint32_t obuf = 0;
    int ocnt = 8;

    // stream state
    int pic_type = 0;
    int f_code[2][2] = {{0, 0}, {0, 0}};
    int intra_dc_precision = 0, picture_structure = 3;
    int frame_pred_frame_dct = 1, concealment_mv = 0;
    int q_scale_type = 0, intra_vlc_format = 0, alternate_scan = 0;
    int width = 0, height = 0;
    bool valid_pic = false, valid_seq = false, valid_ext = false;

    int quantizer_scale = 0, new_quantizer_scale = 0;
    int last_coded_scale = 0;
    int h_offset = 0, v_offset = 0;
    double quant_corr = 0.0;
    int slice_error = 0;
    bool unsupported = false;      // e.g. 4:2:2 input

    int64_t inbytecnt = 0, outbytecnt = 0;

    Requant(const uint8_t* data, int64_t size, std::vector<uint8_t>& o,
            double f) : in(data), in_size(size), out(o), factor(f) {}

    // ---- byte level -------------------------------------------------

    inline int64_t avail() const { return in_size - rpos; }
    inline void copy_bytes(int64_t n) {
        out.insert(out.end(), in + rpos, in + rpos + n);
        rpos += n;
    }

    // ---- output bit level (putbits) ----------------------------------

    inline void putbits(uint32_t val, int n) {
        while (n >= ocnt) {
            out.push_back(uint8_t((obuf << ocnt)
                                  | (val >> (n - ocnt))));
            n -= ocnt;
            obuf = 0;
            if (n < 32) val &= ~(0xFFFFFFFFu << n);
            ocnt = 8;
        }
        if (n) {
            obuf = (obuf << n) | val;
            ocnt -= n;
        }
    }
    inline void flush_write() {
        if (ocnt != 8) putbits(0, ocnt);
    }

    // ---- input bit level ---------------------------------------------

    inline void refill() {
        ibuf |= uint32_t(rpos < in_size ? in[rpos] : 0)
            << (24 - ibits);
        ibits += 8;
        rpos++;
    }
    inline void init_bits() {
        ibuf = 0;
        ibits = 0;
        refill(); refill(); refill(); refill();
    }
    inline uint32_t show(int n) const { return ibuf >> (32 - n); }
    inline void dump(int n) {
        ibuf <<= n;
        ibits -= n;
        while (ibits < 24) refill();
    }
    inline uint32_t get(int n) {
        uint32_t v = show(n);
        dump(n);
        return v;
    }
    inline uint32_t copy(int n) {
        uint32_t v = get(n);
        putbits(v, n);
        return v;
    }
    inline int sbits1() const { return int32_t(ibuf) >> 31; }
    inline void rewind_bits() {
        // return whole unread bytes to the byte cursor
        int i = ibits & 7;
        if (i) { ibuf <<= i; ibits -= i; }
        rpos -= ibits >> 3;
        ibits = 0;
    }

    // ---- quantiser handling (tcrequant.c:353-460) ---------------------

    int scale_quant(double q) const {
        int iq = int(q + 0.5);
        if (q_scale_type) {
            if (iq < 1) iq = 1;
            if (iq > 112) iq = 112;
            return kQScaleNonlinear[kQScaleToCode[iq]];
        }
        if (iq < 2) iq = 2;
        if (iq > 62) iq = 62;
        return (iq / 2) * 2;
    }

    int increment_quant(int q) {
        if (q_scale_type) {
            if (q < 1) { q = 1; slice_error++; }
            if (q > 112) { q = 112; slice_error++; }
            int code = kQScaleToCode[q] + 1;
            if (quant_corr < -60.0) code++;
            if (code > 31) code = 31;
            return kQScaleNonlinear[code];
        }
        if ((q & 1) || q < 2 || q > 62) {
            if (q & 1) q--;
            if (q > 62) q = 62;
            if (q < 2) q = 2;
            slice_error++;
        }
        q += 2;
        if (quant_corr < -60.0) q += 2;
        if (q > 62) q = 62;
        return q;
    }

    void update_corr() {
        quant_corr = ((inbytecnt + rpos) / factor
                      - (outbytecnt + int64_t(out.size())))
            / kReactDelay;
    }

    int new_quant(int cur) {
        update_corr();
        double want = cur * factor - quant_corr;
        int mq;
        if (pic_type == 3)            // B
            mq = std::max(scale_quant(want), increment_quant(cur));
        else                          // I / P
            mq = increment_quant(cur);
        return mq < cur ? cur : mq;
    }

    int get_quantizer_scale() {
        int code = int(get(5));
        if (!code) { code = 1; slice_error++; }
        return q_scale_type ? kQScaleNonlinear[code] : code << 1;
    }

    void put_quantiser(int q) {
        putbits(q_scale_type ? kQScaleToCode[q] : q >> 1, 5);
        last_coded_scale = q;
    }

    // ---- VLC encode side (putvlc.h semantics) --------------------------

    // returns nonzero on illegal run/level
    int putAC(int run, int slevel, bool b15) {
        int level = slevel < 0 ? -slevel : slevel;
        if (run < 0 || run > 63) { slice_error++; return 1; }
        if (level == 0 || level > 2047) { slice_error++; return 1; }
        const PutVlc* t = nullptr;
        if (run < 2 && level < 41)
            t = b15 ? &kPutB15R01[run * 40 + level - 1]
                    : &kPutB14R01[run * 40 + level - 1];
        else if (run < 32 && level < 6)
            t = b15 ? &kPutB15R2[(run - 2) * 5 + level - 1]
                    : &kPutB14R2[(run - 2) * 5 + level - 1];
        if (t && t->len) {
            putbits(t->code, t->len);
            putbits(slevel < 0 ? 1 : 0, 1);
        } else {
            putbits(1, 6);            // escape
            putbits(run, 6);
            putbits(uint32_t(slevel) & 0xFFF, 12);
        }
        return 0;
    }

    void put_non_intra_block(const std::vector<RunLevel>& blk) {
        // first coefficient: B-14 table zero 'first' form
        const RunLevel& f = blk[0];
        if (f.run == 0 && (f.level == 1 || f.level == -1))
            putbits(2 | (f.level < 0 ? 1 : 0), 2);
        else if (putAC(f.run, f.level, false))
            return;
        for (size_t k = 1; k < blk.size(); k++)
            if (putAC(blk[k].run, blk[k].level, false))
                return;
        putbits(2, 2);                // EOB
    }

    // ---- macroblock layer ----------------------------------------------

    int get_macroblock_modes() {
        int modes;
        if (pic_type == 1) {          // I
            const MbVlc& t = kMbI[show(1)];
            dump(t.len);
            modes = t.modes;
            if (!frame_pred_frame_dct && picture_structure == 3)
                modes |= int(get(1)) * DCT_INTERLACED;
            return modes;
        }
        if (pic_type == 2) {          // P
            const MbVlc& t = kMbP[show(5)];
            dump(t.len);
            modes = t.modes;
            if (picture_structure != 3) {
                if (modes & MB_FORWARD)
                    modes |= int(get(2)) * MOTION_BASE;
                return modes;
            }
            if (frame_pred_frame_dct) {
                if (modes & MB_FORWARD) modes |= MC_FRAME;
                return modes;
            }
            if (modes & MB_FORWARD)
                modes |= int(get(2)) * MOTION_BASE;
            if (modes & (MB_INTRA | MB_PATTERN))
                modes |= int(get(1)) * DCT_INTERLACED;
            return modes;
        }
        // B
        const MbVlc& t = kMbB[show(6)];
        dump(t.len);
        modes = t.modes;
        if (t.len == 0) { slice_error += kMaxErrors + 1; return 0; }
        if (picture_structure != 3) {
            if (!(modes & MB_INTRA))
                modes |= int(get(2)) * MOTION_BASE;
            return modes;
        }
        if (frame_pred_frame_dct) {
            modes |= MC_FRAME;
            return modes;
        }
        if (!(modes & MB_INTRA))
            modes |= int(get(2)) * MOTION_BASE;
        if (modes & (MB_INTRA | MB_PATTERN))
            modes |= int(get(1)) * DCT_INTERLACED;
        return modes;
    }

    void put_mb_data(int modes) {
        const PutVlc& t = kPutMbType[(pic_type - 1) * 32 + (modes & 0x1F)];
        putbits(t.code, t.len);
        if (pic_type == 1) {
            if (!frame_pred_frame_dct && picture_structure == 3)
                putbits((modes & DCT_INTERLACED) ? 1 : 0, 1);
            return;
        }
        if (pic_type == 2) {
            if (picture_structure != 3) {
                if (modes & MB_FORWARD)
                    putbits((modes & (3 * MOTION_BASE)) / MOTION_BASE,
                            2);
                return;
            }
            if (frame_pred_frame_dct) return;
            if (modes & MB_FORWARD)
                putbits((modes & (3 * MOTION_BASE)) / MOTION_BASE, 2);
            if (modes & (MB_INTRA | MB_PATTERN))
                putbits((modes & DCT_INTERLACED) ? 1 : 0, 1);
            return;
        }
        // B
        if (picture_structure != 3) {
            if (!(modes & MB_INTRA))
                putbits((modes & (3 * MOTION_BASE)) / MOTION_BASE, 2);
            return;
        }
        if (frame_pred_frame_dct) return;
        if (modes & MB_INTRA) {
            putbits((modes & DCT_INTERLACED) ? 1 : 0, 1);
            return;
        }
        putbits((modes & (3 * MOTION_BASE)) / MOTION_BASE, 2);
        if (modes & MB_PATTERN)
            putbits((modes & DCT_INTERLACED) ? 1 : 0, 1);
    }

    // ---- motion vectors (parse + copy) ----------------------------------

    void motion_delta(int fc) {
        if (ibuf & 0x80000000u) {
            copy(1);
            return;
        }
        if (ibuf >= 0x0c000000u) {
            const MvVlc& t = kMv4[show(4)];
            copy(t.len);
            copy(1);                  // sign
            if (fc) copy(fc);
            return;
        }
        const MvVlc& t = kMv10[show(10)];
        copy(t.len);
        copy(1);
        if (fc) copy(fc);
    }
    void dmv() {
        const DmvVlc& t = kDmv2[show(2)];
        copy(t.len);
    }

    void motion_fr_frame(const int fc[2]) {
        motion_delta(fc[0]);
        motion_delta(fc[1]);
    }
    void motion_fr_field(const int fc[2]) {
        copy(1);
        motion_delta(fc[0]);
        motion_delta(fc[1]);
        copy(1);
        motion_delta(fc[0]);
        motion_delta(fc[1]);
    }
    void motion_fr_dmv(const int fc[2]) {
        motion_delta(fc[0]); dmv();
        motion_delta(fc[1]); dmv();
    }
    void motion_fi_field(const int fc[2]) {
        copy(1);
        motion_delta(fc[0]);
        motion_delta(fc[1]);
    }
    void motion_fi_16x8(const int fc[2]) {
        copy(1);
        motion_delta(fc[0]);
        motion_delta(fc[1]);
        copy(1);
        motion_delta(fc[0]);
        motion_delta(fc[1]);
    }
    void motion_fi_dmv(const int fc[2]) {
        motion_delta(fc[0]); dmv();
        motion_delta(fc[1]); dmv();
    }
    void motion_conceal() {
        if (picture_structure != 3) copy(1);   // field_select
        motion_delta(f_code[0][0]);
        motion_delta(f_code[0][1]);
        copy(1);                               // marker
    }

    void motion_call_frame(int modes) {
        switch (modes & (3 * MOTION_BASE)) {
        case MC_FRAME:
            if (modes & MB_FORWARD) motion_fr_frame(f_code[0]);
            if (modes & MB_BACKWARD) motion_fr_frame(f_code[1]);
            break;
        case MC_FIELD:
            if (modes & MB_FORWARD) motion_fr_field(f_code[0]);
            if (modes & MB_BACKWARD) motion_fr_field(f_code[1]);
            break;
        case MC_DMV:
            motion_fr_dmv(f_code[0]);
            break;
        }
    }
    void motion_call_field(int modes) {
        switch (modes & (3 * MOTION_BASE)) {
        case MC_FIELD:
            if (modes & MB_FORWARD) motion_fi_field(f_code[0]);
            if (modes & MB_BACKWARD) motion_fi_field(f_code[1]);
            break;
        case MC_FRAME:                // MC_16X8 in field pictures
            if (modes & MB_FORWARD) motion_fi_16x8(f_code[0]);
            if (modes & MB_BACKWARD) motion_fi_16x8(f_code[1]);
            break;
        case MC_DMV:
            motion_fi_dmv(f_code[0]);
            break;
        }
    }

    int get_cbp() {
        if (ibuf >= 0x20000000u) {
            const CbpVlc& t = kCbp7[show(7) - 16];
            dump(t.len);
            return t.cbp;
        }
        const CbpVlc& t = kCbp9[show(9)];
        if (t.len == 0) { slice_error += kMaxErrors + 1; return 0; }
        dump(t.len);
        return t.cbp;
    }

    // ---- block layer ----------------------------------------------------

    void copy_dc(bool chroma) {
        uint32_t bb = ibuf;
        int size, len;
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
                const DcVlc& t = kDcLong[(bb >> 22) - 0x3e0];
                size = t.size; len = t.len + 1;
            }
        }
        copy(len);
        if (size) copy(size);
    }

    // intra AC: decode one code; re-emit requantized inline
    // (get_intra_block_B14/B15, tcrequant.c:832-1001)
    void requant_intra_block() {
        const int q = quantizer_scale, nq = new_quantizer_scale;
        const int tst = (nq / q) + ((nq % q) ? 1 : 0);
        const bool b15 = intra_vlc_format != 0;
        int i = 0, li = 0;
        for (;;) {
            uint32_t bb = ibuf;
            const Vlc* t;
            int pre = 0;
            if (b15) {
                if (bb >= 0x04000000u) t = &kB15Top8[(bb >> 24) - 4];
                else if (bb >= 0x02000000u)
                    t = &kB15Top10[(bb >> 22) - 8];
                else if (bb >= 0x00800000u) t = &kTop13[(bb >> 19) - 16];
                else if (bb >= 0x00200000u) t = &kTop15[(bb >> 17) - 16];
                else { t = &kTop16[bb >> 16]; pre = 16; }
            } else {
                if (bb >= 0x28000000u) t = &kB14Top5[(bb >> 27) - 5];
                else if (bb >= 0x04000000u)
                    t = &kB14Top8[(bb >> 24) - 4];
                else if (bb >= 0x02000000u)
                    t = &kB14Top10[(bb >> 22) - 8];
                else if (bb >= 0x00800000u) t = &kTop13[(bb >> 19) - 16];
                else if (bb >= 0x00200000u) t = &kTop15[(bb >> 17) - 16];
                else { t = &kTop16[bb >> 16]; pre = 16; }
            }
            if (t->run == RUN_EOB) {
                copy(pre + t->len);   // end of block passes through
                return;
            }
            if (t->run == RUN_ESC) {
                dump(6);
                i += int(get(6)) + 1;
                if (i > 63) { slice_error++; return; }
                int lv = int(get(12));
                if (lv >= 2048) lv -= 4096;
                if (abs(lv) >= tst) {
                    putAC(i - li - 1, (lv * q) / nq, b15);
                    li = i;
                }
                continue;
            }
            dump(pre + t->len);
            i += t->run;
            if (i > 63) { slice_error++; return; }
            int val = t->lvl;
            if (val >= tst) {
                int s = sbits1();
                int sv = (val ^ s) - s;
                putAC(i - li - 1, (sv * q) / nq, b15);
                li = i;
            }
            dump(1);                  // sign bit
        }
    }

    // non-intra block -> run/level list, requantized; P-type additionally
    // trims trailing coefficients when far behind target
    // (get_non_intra_block_rq/_drop, tcrequant.c:1004-1240)
    bool read_non_intra_block(std::vector<RunLevel>& blk, bool drop) {
        const int q = quantizer_scale, nq = new_quantizer_scale;
        const int tst = drop ? 1 : (nq / q) + ((nq % q) ? 1 : 0);
        blk.clear();
        int i = -1, li = -1;
        bool first = true;
        for (;;) {
            uint32_t bb = ibuf;
            const Vlc* t;
            int pre = 0;
            if (bb >= 0x28000000u) {
                // the first coefficient uses the DC variant where '1x'
                // means run 0 / level 1 (no EOB possible yet)
                t = first ? &kB14Top5DC[(bb >> 27) - 5]
                          : &kB14Top5[(bb >> 27) - 5];
            } else if (bb >= 0x04000000u) {
                t = &kB14Top8[(bb >> 24) - 4];
            } else if (bb >= 0x02000000u) {
                t = &kB14Top10[(bb >> 22) - 8];
            } else if (bb >= 0x00800000u) {
                t = &kTop13[(bb >> 19) - 16];
            } else if (bb >= 0x00200000u) {
                t = &kTop15[(bb >> 17) - 16];
            } else {
                t = &kTop16[bb >> 16];
                pre = 16;
            }
            first = false;
            if (t->run == RUN_EOB) {
                dump(pre + t->len);
                break;
            }
            if (t->run == RUN_ESC) {
                dump(6);
                i += int(get(6)) + 1;
                if (i > 63) { slice_error++; return false; }
                int lv = int(get(12));
                if (lv >= 2048) lv -= 4096;
                if (abs(lv) >= tst) {
                    blk.push_back({i - li - 1, drop ? lv
                                                    : (lv * q) / nq});
                    li = i;
                }
                continue;
            }
            dump(pre + t->len);
            i += t->run;
            if (i > 63) { slice_error++; return false; }
            int val = t->lvl;
            if (val >= tst) {
                int s = sbits1();
                int sv = (val ^ s) - s;
                blk.push_back({i - li - 1, drop ? sv : (sv * q) / nq});
                li = i;
            }
            dump(1);
        }
        if (drop && blk.size() > 1) {
            // trim the trailing coefficient(s) when badly behind the
            // target; always keep at least one (tcrequant.c:1104-1123)
            blk.pop_back();
            const double steps[4] = {-60.0, -80.0, -100.0, -120.0};
            for (double s : steps) {
                if (quant_corr < s && blk.size() > 1)
                    blk.pop_back();
                else
                    break;
            }
        }
        return true;
    }

    // ---- slice layer ------------------------------------------------

    bool slice_init(int code) {
        v_offset = (code - 1) * 16;
        quantizer_scale = get_quantizer_scale();
        new_quantizer_scale = (pic_type == 2)
            ? quantizer_scale : new_quant(quantizer_scale);
        put_quantiser(new_quantizer_scale);
        while (ibuf & 0x80000000u)
            copy(9);                  // intra_slice / extra data
        // initial MBA: the extra-bit 0 flag rides in front, hence the
        // one-bit-shifted windows (tcrequant.c:1434-1459)
        int offset = 0;
        for (;;) {
            if (ibuf >= 0x08000000u) {
                const MbaVlc& t = kMba5[show(6) - 2];
                copy(t.len + 1);
                offset += t.inc;
                break;
            }
            if (ibuf >= 0x01800000u) {
                const MbaVlc& t = kMba11[show(12) - 24];
                copy(t.len + 1);
                offset += t.inc;
                break;
            }
            if (show(12) == 8) {      // escape (with the leading 0)
                offset += 33;
                copy(12);
                continue;
            }
            return false;
        }
        h_offset = offset << 4;
        while (h_offset >= width) {
            h_offset -= width;
            v_offset += 16;
        }
        return v_offset <= height - 16;
    }

    inline bool next_mb() {
        h_offset += 16;
        if (h_offset == width) {
            v_offset += 16;
            if (v_offset > height - 16) return false;
            h_offset = 0;
        }
        return true;
    }

    void transcode_slice(int code) {
        if (!slice_init(code)) return;
        std::vector<RunLevel> blocks[6];
        for (;;) {
            int modes = get_macroblock_modes();
            if (slice_error > kMaxErrors) return;
            if (modes & MB_QUANT)
                quantizer_scale = get_quantizer_scale();

            if (modes & MB_INTRA) {
                new_quantizer_scale = increment_quant(quantizer_scale);
                if (last_coded_scale == new_quantizer_scale)
                    modes &= ~MB_QUANT;
                else
                    modes |= MB_QUANT;
                put_mb_data(modes);
                if (modes & MB_QUANT)
                    put_quantiser(new_quantizer_scale);
                if (concealment_mv) motion_conceal();
                for (int b = 0; b < 6; b++) {
                    copy_dc(b >= 4);
                    requant_intra_block();
                    if (slice_error > kMaxErrors) return;
                }
            } else {
                // stash the motion-vector bits to re-emit after the
                // (possibly rewritten) mb type + quantiser
                std::vector<uint8_t> mv_bytes;
                uint32_t mv_buf;
                int mv_cnt;
                {
                    std::vector<uint8_t> main_out;
                    std::swap(main_out, out);   // redirect putbits
                    uint32_t o_obuf = obuf;
                    int o_ocnt = ocnt;
                    obuf = 0; ocnt = 8;
                    if (picture_structure == 3)
                        motion_call_frame(modes);
                    else
                        motion_call_field(modes);
                    mv_bytes = out;
                    mv_buf = obuf;
                    mv_cnt = ocnt;
                    std::swap(main_out, out);
                    obuf = o_obuf;
                    ocnt = o_ocnt;
                }

                new_quantizer_scale = (pic_type == 2)
                    ? quantizer_scale : new_quant(quantizer_scale);

                int cbp = 0, new_cbp = 0;
                if (modes & MB_PATTERN) {
                    cbp = get_cbp();
                    if (slice_error > kMaxErrors) return;
                    for (int b = 0; b < 6; b++) {
                        if (cbp & (0x20 >> b)) {
                            if (!read_non_intra_block(
                                    blocks[b], pic_type == 2))
                                return;
                        }
                    }
                    if (pic_type == 3) {
                        for (int b = 0; b < 6; b++)
                            if ((cbp & (0x20 >> b))
                                && !blocks[b].empty())
                                new_cbp |= 0x20 >> b;
                        if (!new_cbp)
                            modes &= ~(MB_PATTERN | MB_QUANT);
                    } else {
                        new_cbp = cbp;
                    }
                }

                if (last_coded_scale == new_quantizer_scale)
                    modes &= ~MB_QUANT;
                else if (modes & MB_PATTERN)
                    modes |= MB_QUANT;

                put_mb_data(modes);
                if (modes & MB_QUANT)
                    put_quantiser(new_quantizer_scale);
                for (uint8_t b : mv_bytes) putbits(b, 8);
                if (mv_cnt != 8) putbits(mv_buf, 8 - mv_cnt);

                if (modes & MB_PATTERN) {
                    putbits(kPutCbp[new_cbp].code, kPutCbp[new_cbp].len);
                    for (int b = 0; b < 6; b++)
                        if (new_cbp & (0x20 >> b))
                            put_non_intra_block(blocks[b]);
                }
            }

            if (!next_mb()) return;

            // MBA between macroblocks; non-MBA pattern = end of slice
            int inc = 0;
            for (;;) {
                if (ibuf >= 0x10000000u) {
                    const MbaVlc& t = kMba5[show(5) - 2];
                    copy(t.len);
                    inc += t.inc;
                    break;
                }
                if (ibuf >= 0x03000000u) {
                    const MbaVlc& t = kMba11[show(11) - 24];
                    copy(t.len);
                    inc += t.inc;
                    break;
                }
                if (show(11) == 8) {
                    copy(11);
                    inc += 33;
                    continue;
                }
                return;               // end of slice
            }
            while (inc--)
                if (!next_mb()) return;
        }
    }

    // ---- stream walk ----------------------------------------------------

    int64_t run() {
        while (avail() >= 4 && !unsupported) {
            // scan to the next start code, copying bytes through
            if (!(in[rpos] == 0 && in[rpos + 1] == 0
                  && in[rpos + 2] == 1)) {
                copy_bytes(1);
                continue;
            }
            copy_bytes(3);
            uint8_t id = in[rpos];
            copy_bytes(1);

            if (id == 0x00 && avail() >= 4) {        // picture header
                pic_type = (in[rpos + 1] >> 3) & 0x7;
                valid_pic = pic_type >= 1 && pic_type <= 3;
                if (valid_pic) {
                    // force vbv_delay to 0xFFFF (variable rate now)
                    uint8_t b[4] = {in[rpos], in[rpos + 1],
                                    in[rpos + 2], in[rpos + 3]};
                    b[1] |= 0x7; b[2] = 0xFF; b[3] |= 0xF8;
                    out.insert(out.end(), b, b + 4);
                    rpos += 4;
                } else {
                    copy_bytes(4);
                }
            } else if (id == 0xB3 && avail() >= 8) { // sequence header
                width = (in[rpos] << 4) | (in[rpos + 1] >> 4);
                height = ((in[rpos + 1] & 0xF) << 8) | in[rpos + 2];
                valid_seq = width >= 16 && height >= 16
                    && !(width & 0xF) && !(height & 0xF);
                copy_bytes(8);
            } else if (id == 0xB5 && avail() >= 5) { // extension
                if ((in[rpos] >> 4) == 0x8) {
                    f_code[0][0] = (in[rpos] & 0xF) - 1;
                    f_code[0][1] = (in[rpos + 1] >> 4) - 1;
                    f_code[1][0] = (in[rpos + 1] & 0xF) - 1;
                    f_code[1][1] = (in[rpos + 2] >> 4) - 1;
                    intra_dc_precision = (in[rpos + 2] >> 2) & 0x3;
                    picture_structure = in[rpos + 2] & 0x3;
                    frame_pred_frame_dct = (in[rpos + 3] >> 6) & 0x1;
                    concealment_mv = (in[rpos + 3] >> 5) & 0x1;
                    q_scale_type = (in[rpos + 3] >> 4) & 0x1;
                    intra_vlc_format = (in[rpos + 3] >> 3) & 0x1;
                    alternate_scan = (in[rpos + 3] >> 2) & 0x1;
                    valid_ext = picture_structure != 0;
                    copy_bytes(5);
                } else {
                    if ((in[rpos] >> 4) == 0x1) {
                        // sequence extension: refuse 4:2:2/4:4:4
                        // streams loudly — the slice walk below
                        // assumes 6-block 4:2:0 macroblocks and
                        // would silently corrupt other formats
                        int cf = (in[rpos + 1] >> 1) & 3;
                        if (cf != 1)
                            unsupported = true;
                    }
                    copy_bytes(1);
                }
            } else if (id >= 0x01 && id <= 0xAF && valid_pic
                       && valid_seq && valid_ext) {  // slice
                update_corr();
                bool recompress =
                    (pic_type == 3 && quant_corr < 2.5)
                    || (pic_type == 2 && quant_corr < -2.5)
                    || (pic_type == 1 && quant_corr < -5.0);
                if (!recompress)
                    continue;         // slice bytes copy via the scan

                int64_t in_start = rpos;
                size_t out_start = out.size();
                slice_error = 0;
                obuf = 0;
                ocnt = 8;
                init_bits();
                transcode_slice(id);
                rewind_bits();
                flush_write();
                int64_t in_len = rpos - in_start;
                int64_t out_len = int64_t(out.size()) - out_start;
                if (out_len > in_len || slice_error > kMaxErrors) {
                    // keep the original slice bytes
                    out.resize(out_start);
                    out.insert(out.end(), in + in_start,
                               in + in_start + in_len);
                }
            }
        }
        if (avail() > 0) copy_bytes(avail());
        return int64_t(out.size());
    }
};

}  // namespace

extern "C" {

// Requantize an MPEG-2 video ES toward in_size/factor.  Writes into a
// malloc'd buffer returned via *out_data (caller frees with
// tc_requant_free); returns the output size, or -1 on failure.
int64_t tc_requant(const uint8_t* data, int64_t size, double factor,
                   uint8_t** out_data) {
    if (!data || size < 4 || !out_data) return -1;
    if (factor < 1.0) factor = 1.0;
    if (factor > 900.0) factor = 900.0;
    std::vector<uint8_t> out;
    out.reserve(size_t(size));
    Requant rq(data, size, out, factor);
    int64_t n = rq.run();
    if (rq.unsupported) return -1;     // refuse, don't corrupt
    uint8_t* buf = static_cast<uint8_t*>(malloc(size_t(n)));
    if (!buf) return -1;
    memcpy(buf, out.data(), size_t(n));
    *out_data = buf;
    return n;
}

void tc_requant_free(uint8_t* p) { free(p); }

}  // extern "C"
