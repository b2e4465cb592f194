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

namespace {

constexpr int RUN_ESC = 65;
constexpr int RUN_EOB = 129;

struct Vlc { uint8_t run, lvl, len; };
struct DcVlc { uint8_t size, len; };
struct MbaVlc { uint8_t inc, len; };

// ---- Table B-14 (dct_coefficients, intra_vlc_format = 0) ----------------
// window: top 5 bits in [5, 31]
const Vlc kB14Top5[27] = {
    {1, 3, 5}, {5, 1, 5}, {4, 1, 5}, {1, 2, 4},
    {1, 2, 4}, {3, 1, 4}, {3, 1, 4}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {RUN_EOB, 0, 2},
    {RUN_EOB, 0, 2}, {RUN_EOB, 0, 2}, {RUN_EOB, 0, 2}, {RUN_EOB, 0, 2},
    {RUN_EOB, 0, 2}, {RUN_EOB, 0, 2}, {RUN_EOB, 0, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}};
// window: top 8 bits in [4, 39] (includes the 6-bit escape prefix)
const Vlc kB14Top8[36] = {
    {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6},
    {3, 2, 7}, {3, 2, 7}, {10, 1, 7}, {10, 1, 7},
    {1, 4, 7}, {1, 4, 7}, {9, 1, 7}, {9, 1, 7},
    {8, 1, 6}, {8, 1, 6}, {8, 1, 6}, {8, 1, 6},
    {7, 1, 6}, {7, 1, 6}, {7, 1, 6}, {7, 1, 6},
    {2, 2, 6}, {2, 2, 6}, {2, 2, 6}, {2, 2, 6},
    {6, 1, 6}, {6, 1, 6}, {6, 1, 6}, {6, 1, 6},
    {14, 1, 8}, {1, 6, 8}, {13, 1, 8}, {12, 1, 8},
    {4, 2, 8}, {2, 3, 8}, {1, 5, 8}, {11, 1, 8}};
// window: top 10 bits in [8, 15]
const Vlc kB14Top10[8] = {
    {17, 1, 10}, {6, 2, 10}, {1, 7, 10}, {3, 3, 10},
    {2, 4, 10}, {16, 1, 10}, {15, 1, 10}, {5, 2, 10}};

// ---- Table B-15 (intra_vlc_format = 1) -----------------------------------
// window: top 8 bits in [4, 195]
const Vlc kB15Top8[252] = {
    {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6}, {RUN_ESC, 0, 6},
    {8, 1, 7}, {8, 1, 7}, {9, 1, 7}, {9, 1, 7},
    {7, 1, 7}, {7, 1, 7}, {3, 2, 7}, {3, 2, 7},
    {1, 7, 6}, {1, 7, 6}, {1, 7, 6}, {1, 7, 6},
    {1, 6, 6}, {1, 6, 6}, {1, 6, 6}, {1, 6, 6},
    {5, 1, 6}, {5, 1, 6}, {5, 1, 6}, {5, 1, 6},
    {6, 1, 6}, {6, 1, 6}, {6, 1, 6}, {6, 1, 6},
    {2, 5, 8}, {12, 1, 8}, {1, 11, 8}, {1, 10, 8},
    {14, 1, 8}, {13, 1, 8}, {4, 2, 8}, {2, 4, 8},
    {3, 1, 5}, {3, 1, 5}, {3, 1, 5}, {3, 1, 5},
    {3, 1, 5}, {3, 1, 5}, {3, 1, 5}, {3, 1, 5},
    {2, 2, 5}, {2, 2, 5}, {2, 2, 5}, {2, 2, 5},
    {2, 2, 5}, {2, 2, 5}, {2, 2, 5}, {2, 2, 5},
    {4, 1, 5}, {4, 1, 5}, {4, 1, 5}, {4, 1, 5},
    {4, 1, 5}, {4, 1, 5}, {4, 1, 5}, {4, 1, 5},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {2, 1, 3}, {2, 1, 3}, {2, 1, 3}, {2, 1, 3},
    {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4},
    {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4},
    {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4},
    {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4}, {RUN_EOB, 0, 4},
    {1, 3, 4}, {1, 3, 4}, {1, 3, 4}, {1, 3, 4},
    {1, 3, 4}, {1, 3, 4}, {1, 3, 4}, {1, 3, 4},
    {1, 3, 4}, {1, 3, 4}, {1, 3, 4}, {1, 3, 4},
    {1, 3, 4}, {1, 3, 4}, {1, 3, 4}, {1, 3, 4},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 1, 2}, {1, 1, 2}, {1, 1, 2}, {1, 1, 2},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 2, 3}, {1, 2, 3}, {1, 2, 3}, {1, 2, 3},
    {1, 4, 5}, {1, 4, 5}, {1, 4, 5}, {1, 4, 5},
    {1, 4, 5}, {1, 4, 5}, {1, 4, 5}, {1, 4, 5},
    {1, 5, 5}, {1, 5, 5}, {1, 5, 5}, {1, 5, 5},
    {1, 5, 5}, {1, 5, 5}, {1, 5, 5}, {1, 5, 5},
    {10, 1, 7}, {10, 1, 7}, {2, 3, 7}, {2, 3, 7},
    {11, 1, 7}, {11, 1, 7}, {1, 8, 7}, {1, 8, 7},
    {1, 9, 7}, {1, 9, 7}, {1, 12, 8}, {1, 13, 8},
    {3, 3, 8}, {5, 2, 8}, {1, 14, 8}, {1, 15, 8}};
// window: top 10 bits in [8, 15]
const Vlc kB15Top10[8] = {
    {6, 2, 9}, {6, 2, 9}, {15, 1, 9}, {15, 1, 9},
    {3, 4, 10}, {17, 1, 10}, {16, 1, 9}, {16, 1, 9}};

// ---- long codes shared by B-14 and B-15 ----------------------------------
// window: top 13 bits in [16, 63]
const Vlc kTop13[48] = {
    {11, 2, 13}, {10, 2, 13}, {6, 3, 13}, {4, 4, 13},
    {3, 5, 13}, {2, 7, 13}, {2, 6, 13}, {1, 15, 13},
    {1, 14, 13}, {1, 13, 13}, {1, 12, 13}, {27, 1, 13},
    {26, 1, 13}, {25, 1, 13}, {24, 1, 13}, {23, 1, 13},
    {1, 11, 12}, {1, 11, 12}, {9, 2, 12}, {9, 2, 12},
    {5, 3, 12}, {5, 3, 12}, {1, 10, 12}, {1, 10, 12},
    {3, 4, 12}, {3, 4, 12}, {8, 2, 12}, {8, 2, 12},
    {22, 1, 12}, {22, 1, 12}, {21, 1, 12}, {21, 1, 12},
    {1, 9, 12}, {1, 9, 12}, {20, 1, 12}, {20, 1, 12},
    {19, 1, 12}, {19, 1, 12}, {2, 5, 12}, {2, 5, 12},
    {4, 3, 12}, {4, 3, 12}, {1, 8, 12}, {1, 8, 12},
    {7, 2, 12}, {7, 2, 12}, {18, 1, 12}, {18, 1, 12}};
// window: top 15 bits in [16, 63]
const Vlc kTop15[48] = {
    {1, 40, 15}, {1, 39, 15}, {1, 38, 15}, {1, 37, 15},
    {1, 36, 15}, {1, 35, 15}, {1, 34, 15}, {1, 33, 15},
    {1, 32, 15}, {2, 14, 15}, {2, 13, 15}, {2, 12, 15},
    {2, 11, 15}, {2, 10, 15}, {2, 9, 15}, {2, 8, 15},
    {1, 31, 14}, {1, 31, 14}, {1, 30, 14}, {1, 30, 14},
    {1, 29, 14}, {1, 29, 14}, {1, 28, 14}, {1, 28, 14},
    {1, 27, 14}, {1, 27, 14}, {1, 26, 14}, {1, 26, 14},
    {1, 25, 14}, {1, 25, 14}, {1, 24, 14}, {1, 24, 14},
    {1, 23, 14}, {1, 23, 14}, {1, 22, 14}, {1, 22, 14},
    {1, 21, 14}, {1, 21, 14}, {1, 20, 14}, {1, 20, 14},
    {1, 19, 14}, {1, 19, 14}, {1, 18, 14}, {1, 18, 14},
    {1, 17, 14}, {1, 17, 14}, {1, 16, 14}, {1, 16, 14}};
// window: top 16 bits (16 consumed before the lookup, len = extra bits)
const Vlc kTop16[32] = {
    {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0},
    {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0},
    {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0},
    {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0}, {RUN_EOB, 0, 0},
    {2, 18, 0}, {2, 17, 0}, {2, 16, 0}, {2, 15, 0},
    {7, 3, 0}, {17, 2, 0}, {16, 2, 0}, {15, 2, 0},
    {14, 2, 0}, {13, 2, 0}, {12, 2, 0}, {32, 1, 0},
    {31, 1, 0}, {30, 1, 0}, {29, 1, 0}, {28, 1, 0}};

// ---- DC size codes, Tables B-12 / B-13 -----------------------------------
const DcVlc kDcLuma5[31] = {
    {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2},
    {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2},
    {0, 3}, {0, 3}, {0, 3}, {0, 3}, {3, 3}, {3, 3}, {3, 3}, {3, 3},
    {4, 3}, {4, 3}, {4, 3}, {4, 3}, {5, 4}, {5, 4}, {6, 5}};
const DcVlc kDcChroma5[31] = {
    {0, 2}, {0, 2}, {0, 2}, {0, 2}, {0, 2}, {0, 2}, {0, 2}, {0, 2},
    {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2}, {1, 2},
    {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2}, {2, 2},
    {3, 3}, {3, 3}, {3, 3}, {3, 3}, {4, 4}, {4, 4}, {5, 5}};
const DcVlc kDcLong[32] = {
    {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5},
    {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5}, {6, 5},
    {7, 6}, {7, 6}, {7, 6}, {7, 6}, {7, 6}, {7, 6}, {7, 6}, {7, 6},
    {8, 7}, {8, 7}, {8, 7}, {8, 7}, {9, 8}, {9, 8}, {10, 9}, {11, 9}};

// ---- macroblock_address_increment, Table B-1 ------------------------------
const MbaVlc kMba5[30] = {
    {6, 5}, {5, 5}, {4, 4}, {4, 4}, {3, 4}, {3, 4}, {2, 3}, {2, 3},
    {2, 3}, {2, 3}, {1, 3}, {1, 3}, {1, 3}, {1, 3}, {0, 1}, {0, 1},
    {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1},
    {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1}, {0, 1}};
const MbaVlc kMba11[104] = {
    {32, 11}, {31, 11}, {30, 11}, {29, 11}, {28, 11}, {27, 11}, {26, 11}, {25, 11},
    {24, 11}, {23, 11}, {22, 11}, {21, 11}, {20, 10}, {20, 10}, {19, 10}, {19, 10},
    {18, 10}, {18, 10}, {17, 10}, {17, 10}, {16, 10}, {16, 10}, {15, 10}, {15, 10},
    {14, 8}, {14, 8}, {14, 8}, {14, 8}, {14, 8}, {14, 8}, {14, 8}, {14, 8},
    {13, 8}, {13, 8}, {13, 8}, {13, 8}, {13, 8}, {13, 8}, {13, 8}, {13, 8},
    {12, 8}, {12, 8}, {12, 8}, {12, 8}, {12, 8}, {12, 8}, {12, 8}, {12, 8},
    {11, 8}, {11, 8}, {11, 8}, {11, 8}, {11, 8}, {11, 8}, {11, 8}, {11, 8},
    {10, 8}, {10, 8}, {10, 8}, {10, 8}, {10, 8}, {10, 8}, {10, 8}, {10, 8},
    {9, 8}, {9, 8}, {9, 8}, {9, 8}, {9, 8}, {9, 8}, {9, 8}, {9, 8},
    {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7},
    {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7}, {8, 7},
    {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7},
    {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}, {7, 7}};

// zigzag scan (ISO 13818-2 figure 7-2) and alternate scan (figure 7-3),
// mapping coefficient index in decode order -> natural position
const int kScanZigzag[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};
const int kScanAlt[64] = {
    0, 8, 16, 24, 1, 9, 2, 10, 17, 25, 32, 40, 48, 56, 57, 49,
    41, 33, 26, 18, 3, 11, 4, 12, 19, 27, 34, 42, 50, 58, 35, 43,
    51, 59, 20, 28, 5, 13, 6, 14, 21, 29, 36, 44, 52, 60, 37, 45,
    53, 61, 22, 30, 7, 15, 23, 31, 38, 46, 54, 62, 39, 47, 55, 63};

const int kDefaultIntraMatrix[64] = {
    8, 16, 19, 22, 26, 27, 29, 34, 16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38, 22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48, 26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69, 27, 29, 35, 38, 46, 56, 69, 83};

// nonlinear quantiser_scale (ISO 13818-2 table 7-6, q_scale_type = 1)
const int kQScaleNonlinear[32] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112};

const double kFrameRates[16] = {
    0, 24000.0 / 1001, 24, 25, 30000.0 / 1001, 30, 50, 60000.0 / 1001,
    60, 0, 0, 0, 0, 0, 0, 0};

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
