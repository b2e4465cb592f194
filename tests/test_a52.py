"""Native AC-3 decoder (io/a52dec.py) validated against the bundled
libavcodec decoder.

Two validation modes:
- REAL encoder streams: SNR bounds.  Dithered (bap 0) bins are
  decoder-private noise BY DESIGN (A/52 7.3.4 leaves the generator
  to the implementation), so dense high-rate content — where dither
  is negligible — carries the tight bounds (measured 91-108 dB, the
  float64-vs-decoder rounding floor).
- CRAFTED frames (hand-written bitstreams with dither off and
  known-zero mantissa codes): if the oracle's bit allocation,
  exponent decode or mantissa grammar differed ANYWHERE from ours,
  its mantissa reads would desync and the output would be loud
  garbage; silence == exact agreement.  This exercises the paths the
  bundled encoder never emits (D25/D45 strategies, all bit-allocation
  parameter codes, rematrixing flags, narrow bandwidths).
"""

import numpy as np
import pytest

from tcforge_tpu.io import a52dec as A

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _signal(rate, kind, seed=0):
    rng = np.random.RandomState(seed)
    n = rate // 2
    t = np.arange(n) / rate
    if kind == "sine":
        return 0.35 * np.sin(2 * np.pi * 440 * t)
    return 0.4 * rng.standard_normal(n)


def _bridge_decode(stream):
    dec = _av.AvAudioDecoder("ac3")
    dec.feed(stream)
    dec.flush()
    chunks = []
    while True:
        r = dec.read()
        if r is None:
            break
        chunks.append(r)
    dec.close()
    return np.concatenate(chunks)


def _encode(sig, rate, ch, kbps):
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    pcm = pcm[:, None] if ch == 1 else \
        np.stack([pcm, np.roll(pcm, 100)], 1)
    enc = _av.AvAudioEncoder("ac3", rate, ch, bitrate=kbps * 1000)
    enc.feed(pcm)
    return enc.read()


@needs_bridge
class TestRealStreams:
    @pytest.mark.parametrize("kind,rate,ch,kbps,min_snr", [
        ("sine", 48000, 2, 448, 85.0),     # coupling + rematrixing
        ("noise", 48000, 2, 448, 88.0),
        ("noise", 48000, 1, 448, 100.0),
        ("noise", 44100, 2, 448, 45.0),    # dither-limited band tail
        ("noise", 32000, 2, 384, 45.0),
    ])
    def test_snr(self, kind, rate, ch, kbps, min_snr):
        stream = _encode(_signal(rate, kind), rate, ch, kbps)
        ref = _bridge_decode(stream).astype(np.float64)
        got, grate, gch = A.decode_stream(stream, dither=False)
        assert (grate, gch) == (rate, ch)
        m = min(len(ref), len(got))
        assert m > 10000
        d = ref[:m] - got[:m].astype(np.float64)
        snr = 10 * np.log10((ref[:m] ** 2).mean()
                            / max((d * d).mean(), 1e-12))
        assert snr >= min_snr, f"snr {snr:.1f}"

    def test_stream_decoder_chunked(self):
        stream = _encode(_signal(48000, "noise"), 48000, 2, 448)
        whole, _, _ = A.decode_stream(stream, dither=False)
        sd = A.StreamDecoder(dither=False)
        outs = []
        for i in range(0, len(stream), 379):
            sd.feed(stream[i:i + 379])
            r = sd.read()
            if r is not None:
                outs.append(r)
        sd.flush()
        r = sd.read()
        if r is not None:
            outs.append(r)
        np.testing.assert_array_equal(np.concatenate(outs), whole)


# ------------------------------------------------------------------ #
# Crafted-frame writer (test fixture)
# ------------------------------------------------------------------ #

_CRCTBL = []
for _b in range(256):
    _crc = _b << 8
    for _ in range(8):
        _crc = ((_crc << 1) ^ 0x8005) & 0xFFFF if _crc & 0x8000 \
            else (_crc << 1) & 0xFFFF
    _CRCTBL.append(_crc)


def _crc16(data):
    crc = 0
    for byt in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRCTBL[((crc >> 8) ^ byt) & 0xFF]
    return crc


_BASIS_CACHE = {}


def _solve_crc1(rest):
    """crc1 value making CRC16(frame[2:5/8 point]) == 0 (linearity
    over GF(2))."""
    L = len(rest)
    if L not in _BASIS_CACHE:
        eff = [_crc16((1 << (15 - i)).to_bytes(2, "big") + b"\x00" * L)
               for i in range(16)]
        basis = []
        for i, vec in enumerate(eff):
            v, t = vec, 1 << i
            for bv, bt in basis:
                if v ^ bv < v:
                    v ^= bv
                    t ^= bt
            if v:
                basis.append((v, t))
        _BASIS_CACHE[L] = sorted(basis, reverse=True)
    v, t = _crc16(b"\x00\x00" + rest), 0
    for bv, bt in _BASIS_CACHE[L]:
        if v ^ bv < v:
            v ^= bv
            t ^= bt
    if v:
        return None
    crc1 = 0
    for i in range(16):
        if t & (1 << i):
            crc1 |= 1 << (15 - i)
    return crc1


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nb):
        self.acc = (self.acc << nb) | (v & ((1 << nb) - 1))
        self.n += nb
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)


def _exp_groups(exps, gs):
    out = []
    pre = exps[0]
    i = 1
    nm = len(exps)
    ngrps = (nm + 3 * gs - 4) // (3 * gs)
    for _ in range(ngrps):
        ds = []
        for _j in range(3):
            e = exps[i] if i < nm else pre
            d = e - pre
            assert -2 <= d <= 2
            ds.append(d + 2)
            pre = e
            i += gs
        out.append(ds[0] * 25 + ds[1] * 5 + ds[2])
    return out


def craft_frame(chans_exps, csnr=17, fsnr=None, fg=None, expstr=1,
                chbw=None, remat=None, bacods=(2, 1, 1, 3, 7),
                dith=0, frmsizecod=36, fscod=0):
    """Valid AC-3 frame (mono or 2/0) with zero-valued mantissa
    codes; both decoders must reconstruct SILENCE unless their bit
    allocation/grammar disagree."""
    nch = len(chans_exps)
    acmod = 1 if nch == 1 else 2
    fsnr = fsnr or (0,) * nch
    fg = fg or (4,) * nch
    chbw = chbw or (48,) * nch
    gs = (0, 1, 2, 4)[expstr]
    nbytes = 2 * A.FRAME_SIZES[frmsizecod * 3 + fscod]
    fr = A._Frame(nch, 0, acmod, fscod)
    fr.sdcy = A.SLOW_DECAY[bacods[0]]
    fr.fdcy = A.FAST_DECAY[bacods[1]]
    fr.sgain = A.SLOW_GAIN[bacods[2]]
    fr.dbknee = A.DB_PER_BIT[bacods[3]]
    fr.floor = A.FLOOR_TAB[bacods[4]]
    snro = [(((csnr - 15) << 4) + fsnr[c]) << 2 for c in range(nch)]
    exps = []
    baps = []
    for c in range(nch):
        nm = (chbw[c] + 12) * 3 + 37
        grps = _exp_groups(list(chans_exps[c])[:nm], gs)
        dec_e = [chans_exps[c][0]]
        pre = dec_e[0]
        for g in grps:
            for d in (g // 25, (g % 25) // 5, g % 5):
                pre += d - 2
                dec_e.extend([pre] * gs)
        e = dec_e[:nm]
        exps.append((e, grps))
        baps.append(A._bit_alloc(e, 0, nm, fscod, snro[c],
                                 A.FAST_GAIN[fg[c]], fr))
    w = _BW()
    w.put(8, 5)
    w.put(0, 3)
    w.put(acmod, 3)
    if acmod == 2:
        w.put(0, 2)                    # dsurmod
    w.put(0, 1)                        # lfeon
    w.put(31, 5)                       # dialnorm
    for _ in range(3):
        w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    for _ in range(3):
        w.put(0, 1)
    for blk in range(6):
        for _c in range(nch):
            w.put(0, 1)                # blksw
        for _c in range(nch):
            w.put(dith, 1)             # dithflag
        w.put(0, 1)                    # dynrnge
        if blk == 0:
            w.put(1, 1)
            w.put(0, 1)                # cplstre, cplinu 0
            if acmod == 2:
                w.put(1, 1)            # rematstr
                for f_ in (remat or (0, 0, 0, 0)):
                    w.put(f_, 1)
            for c in range(nch):
                w.put(expstr, 2)
            for c in range(nch):
                w.put(chbw[c], 6)
            for c in range(nch):
                e, grps = exps[c]
                w.put(e[0], 4)
                for g in grps:
                    w.put(g, 7)
                w.put(0, 2)            # gainrng
            w.put(1, 1)                # baie
            w.put(bacods[0], 2)
            w.put(bacods[1], 2)
            w.put(bacods[2], 2)
            w.put(bacods[3], 2)
            w.put(bacods[4], 3)
            w.put(1, 1)                # snroffste
            w.put(csnr, 6)
            for c in range(nch):
                w.put(fsnr[c], 4)
                w.put(fg[c], 3)
        else:
            w.put(0, 1)                # cplstre
            if acmod == 2:
                w.put(0, 1)            # rematstr
            for _c in range(nch):
                w.put(0, 2)            # chexpstr reuse
            w.put(0, 1)                # baie
            w.put(0, 1)                # snroffste
        w.put(0, 1)                    # deltbaie
        w.put(0, 1)                    # skiple
        g1 = g2 = g4 = 0               # group state shared per block
        for c in range(nch):
            for bp in baps[c]:
                if bp == 0:
                    continue
                if bp == 1:
                    if g1 == 0:
                        w.put(13, 5)   # (1,1,1) -> three zeros
                        g1 = 3
                    g1 -= 1
                elif bp == 2:
                    if g2 == 0:
                        w.put(62, 7)   # (2,2,2)
                        g2 = 3
                    g2 -= 1
                elif bp == 3:
                    w.put(3, 3)
                elif bp == 4:
                    if g4 == 0:
                        w.put(60, 7)   # (5,5)
                        g4 = 2
                    g4 -= 1
                elif bp == 5:
                    w.put(7, 4)
                else:
                    w.put(0, A.QNTZ_BITS[bp])
    if w.n:
        w.put(0, 8 - w.n)
    if len(w.buf) > nbytes - 5:
        return None
    while len(w.buf) < nbytes - 5:
        w.buf.append(0)
    body = bytes([(fscod << 6) | frmsizecod]) + bytes(w.buf)
    frame = (b"\x0b\x77\x00\x00" + body)[:nbytes]
    words58 = (nbytes >> 1) * 5 // 8
    crc1 = _solve_crc1(frame[4:2 * words58])
    if crc1 is None:
        return None
    return frame[:2] + crc1.to_bytes(2, "big") + frame[4:]


def _rwalk(nm, seed, gs=1):
    """±2-step exponent walk at GROUP granularity (D25/D45 deltas
    apply to gs mantissas at a time)."""
    r = np.random.RandomState(seed)
    cur = 4
    e = [cur]
    while len(e) < nm:
        cur = max(0, min(14, cur + int(r.randint(-2, 3))))
        e.extend([cur] * gs)
    return e[:nm]


@needs_bridge
class TestCraftedFrames:
    def _agree(self, frame):
        """Both decoders reconstruct silence <=> full agreement."""
        ref = _bridge_decode(frame * 3).astype(np.float64)
        got, _, _ = A.decode_stream(frame * 3, dither=False)
        assert (np.abs(ref) <= 1).all(), \
            "oracle desynced on the crafted frame (its bit " \
            "allocation disagrees with ours)"
        assert (np.abs(got.astype(np.float64)) <= 1).all()

    @pytest.mark.parametrize("expstr", [1, 2, 3])
    def test_strategies(self, expstr):
        e = _rwalk(253, 7, gs=(0, 1, 2, 4)[expstr])
        frame = craft_frame([e], expstr=expstr, chbw=(60,))
        assert frame is not None
        self._agree(frame)

    @pytest.mark.parametrize("bacods", [
        (0, 0, 0, 0, 0), (3, 3, 3, 3, 6), (2, 1, 1, 3, 7),
        (1, 2, 2, 2, 4)])
    def test_bitalloc_params(self, bacods):
        frame = craft_frame([_rwalk(217, 3)], bacods=bacods)
        assert frame is not None
        self._agree(frame)

    def test_stereo_rematrixing(self):
        frame = craft_frame([_rwalk(217, 1), _rwalk(217, 2)],
                            remat=(1, 0, 1, 1), fsnr=(3, 9),
                            fg=(2, 6))
        assert frame is not None
        self._agree(frame)

    def test_near_equal_psd_band_boundary(self):
        """The regression shape: a wide band of near-equal exponents
        landing on a mask quantization boundary (caught a corrupted
        log-add table entry)."""
        pat = [6, 5, 5, 5, 5, 6, 6, 6, 5, 5, 5, 5, 5, 6, 5, 5, 6, 6,
               6, 6, 5, 6, 5]
        e0 = ([6] * 157 + pat + [5] * 40)[:217]
        frame = craft_frame([e0, [6] * 217], fsnr=(8, 8))
        assert frame is not None
        self._agree(frame)

    def test_all_bap0_dither_off_is_silence(self):
        frame = craft_frame([[12] * 217], csnr=0)
        assert frame is not None
        self._agree(frame)


class TestRobustness:
    def test_syncinfo(self):
        assert A.parse_syncinfo(b"\x0b\x77\x00\x00\x14" + b"\x00") \
            is not None
        assert A.parse_syncinfo(b"\x0b\x78\x00\x00\x14") is None
        assert A.parse_syncinfo(b"\x0b\x77\x00\x00\xff") is None

    def test_garbage_streams(self):
        rng = np.random.RandomState(5)
        for _ in range(10):
            blob = rng.randint(0, 256, rng.randint(0, 4096),
                               np.uint8).tobytes()
            try:
                A.decode_stream(blob)
            except (ValueError, NotImplementedError):
                pass

    def test_own_dither_is_bounded_noise(self):
        d = A.A52Decoder()
        v = d._dither_vals(4096)
        assert np.abs(v).max() <= 0.7072
        assert 0.3 < v.std() < 0.5


def craft_cpl(cpl_expstr=1, bndstrc=None, cplbegf=8, cplendf=12,
              inject=None, coords=((2, 8), (2, 8)), mstr=(0, 0),
              dith=0):
    """Stereo frame with CHANNEL COUPLING: silent channels, a loud
    coupling channel with configurable exponent strategy, band
    structure and coordinates.  Same exactness logic as craft_frame:
    any grammar/allocation/coordinate disagreement desyncs the
    oracle's mantissa reads into loud garbage."""
    strt = 37 + 12 * cplbegf
    endm = 37 + 12 * (cplendf + 3)
    ncplsubnd = 3 + cplendf - cplbegf
    if bndstrc is None:
        bndstrc = [0] * ncplsubnd
    ncplbnd = len(bndstrc) - sum(bndstrc[1:])
    frmsizecod, fscod = 37, 0
    nbytes = 2 * A.FRAME_SIZES[frmsizecod * 3 + fscod]
    fr = A._Frame(2, 0, 2, fscod)
    fr.sdcy = A.SLOW_DECAY[2]
    fr.fdcy = A.FAST_DECAY[1]
    fr.sgain = A.SLOW_GAIN[1]
    fr.dbknee = A.DB_PER_BIT[3]
    fr.floor = A.FLOOR_TAB[7]
    csnr, cplsnr_f, cplfg = 25, 15, 0
    gs = (0, 1, 2, 4)[cpl_expstr]
    ch_e = [[14] * strt, [14] * strt]
    cpl_e = [2] * (endm - strt)
    absexp = 1                          # cplabsexp<<1 == 2
    ch_grps = [_exp_groups(e, 1) for e in ch_e]
    ch_baps = [A._bit_alloc(e, 0, strt, fscod,
                            (((csnr - 15) << 4) + 0) << 2,
                            A.FAST_GAIN[7], fr) for e in ch_e]
    cpl_grps = []
    pre = absexp << 1
    for gi in range((endm - strt) // (3 * gs)):
        cpl_grps.append(2 * 25 + 2 * 5 + 2)   # zero deltas
    fr.cplfleak = (3 << 8) + 768
    fr.cplsleak = (3 << 8) + 768
    cpl_bap = A._bit_alloc(cpl_e, strt, endm, fscod,
                           (((csnr - 15) << 4) + cplsnr_f) << 2,
                           A.FAST_GAIN[cplfg], fr,
                           cpl_leak=(fr.cplfleak, fr.cplsleak))
    w = _BW()
    w.put(8, 5)
    w.put(0, 3)
    w.put(2, 3)
    w.put(0, 2)
    w.put(0, 1)
    w.put(31, 5)
    for _ in range(8):
        w.put(0, 1)
    for blk in range(6):
        for _c in range(2):
            w.put(0, 1)                # blksw
        for _c in range(2):
            w.put(dith, 1)
        w.put(0, 1)                    # dynrnge
        if blk == 0:
            w.put(1, 1)                # cplstre
            w.put(1, 1)                # cplinu
            w.put(1, 1)
            w.put(1, 1)                # chincpl
            w.put(0, 1)                # phsflginu
            w.put(cplbegf, 4)
            w.put(cplendf, 4)
            for bit in bndstrc[1:]:
                w.put(bit, 1)
            for c in range(2):
                w.put(1, 1)            # cplcoe
                w.put(mstr[c], 2)
                for _bnd in range(ncplbnd):
                    w.put(coords[c][0], 4)
                    w.put(coords[c][1], 4)
            w.put(1, 1)                # rematstr
            nremat = 4 if strt > 61 else (2 if strt == 37 else 3)
            for _ in range(nremat):
                w.put(0, 1)
            w.put(cpl_expstr, 2)
            for _c in range(2):
                w.put(1, 2)            # chexpstr D15
            w.put(absexp, 4)
            for g in cpl_grps:
                w.put(g, 7)
            for c in range(2):
                w.put(ch_e[c][0], 4)
                for g in ch_grps[c]:
                    w.put(g, 7)
                w.put(0, 2)
            w.put(1, 1)                # baie
            w.put(2, 2)
            w.put(1, 2)
            w.put(1, 2)
            w.put(3, 2)
            w.put(7, 3)
            w.put(1, 1)                # snroffste
            w.put(csnr, 6)
            w.put(cplsnr_f, 4)
            w.put(cplfg, 3)
            for _c in range(2):
                w.put(0, 4)
                w.put(7, 3)
            w.put(1, 1)                # cplleake
            w.put(3, 3)
            w.put(3, 3)
        else:
            w.put(0, 1)                # cplstre
            for _c in range(2):
                w.put(0, 1)            # cplcoe reuse
            w.put(0, 1)                # rematstr
            w.put(0, 2)                # cplexpstr reuse
            for _c in range(2):
                w.put(0, 2)
            w.put(0, 1)
            w.put(0, 1)
            w.put(0, 1)                # baie/snroffste/cplleake
        w.put(0, 1)
        w.put(0, 1)                    # deltbaie/skiple
        g1 = g2 = g4 = 0

        def put_mants(baps, override=None):
            nonlocal g1, g2, g4
            for bi, bp in enumerate(baps):
                v = 0 if override is None else override.get(bi, 0)
                if bp == 0:
                    continue
                if bp == 1:
                    if g1 == 0:
                        w.put(13, 5)
                        g1 = 3
                    g1 -= 1
                elif bp == 2:
                    if g2 == 0:
                        w.put(62, 7)
                        g2 = 3
                    g2 -= 1
                elif bp == 3:
                    w.put(3 if v == 0 else v, 3)
                elif bp == 4:
                    if g4 == 0:
                        w.put(60, 7)
                        g4 = 2
                    g4 -= 1
                elif bp == 5:
                    w.put(7 if v == 0 else v, 4)
                else:
                    w.put(v, A.QNTZ_BITS[bp])
        put_mants(ch_baps[0])
        put_mants(cpl_bap, inject.get(blk) if inject else None)
        put_mants(ch_baps[1])
    if w.n:
        w.put(0, 8 - w.n)
    assert len(w.buf) <= nbytes - 5
    while len(w.buf) < nbytes - 5:
        w.buf.append(0)
    body = bytes([(fscod << 6) | frmsizecod]) + bytes(w.buf)
    frame = (b"\x0b\x77\x00\x00" + body)[:nbytes]
    words58 = (nbytes >> 1) * 5 // 8
    crc1 = _solve_crc1(frame[4:2 * words58])
    if crc1 is None:
        return None
    return frame[:2] + crc1.to_bytes(2, "big") + frame[4:]


@needs_bridge
class TestCoupling:
    """Channel coupling exactness.  The x8 coordinate scale, the
    exp/mstr coordinate space, D25/D45 coupling exponents and band-
    structure merges were all pinned by these frames (the initial
    implementation was off by exactly 8x)."""

    def _exact(self, frame):
        ref = _bridge_decode(frame * 3).astype(np.float64)
        got, _, _ = A.decode_stream(frame * 3, dither=False)
        m = min(len(ref), len(got))
        assert m > 4000
        assert np.abs(ref[:m] - got[:m].astype(np.float64)).max() <= 1

    def test_zero_coupling_frame_is_silence(self):
        frame = craft_cpl()
        assert frame is not None
        self._exact(frame)

    @pytest.mark.parametrize("cexp,cmant,mstr", [
        (0, 0, 0), (2, 8, 0), (5, 15, 0), (15, 8, 0),
        (2, 8, 1), (2, 8, 3), (0, 0, 2)])
    def test_coordinate_space(self, cexp, cmant, mstr):
        frame = craft_cpl(coords=((cexp, cmant), (cexp, cmant)),
                          mstr=(mstr, mstr),
                          inject={2: {0: 16}, 4: {5: 40}})
        assert frame is not None
        self._exact(frame)

    @pytest.mark.parametrize("expstr", [2, 3])
    def test_cpl_exp_strategies(self, expstr):
        frame = craft_cpl(cpl_expstr=expstr,
                          inject={1: {0: 16}, 3: {30: 40}})
        assert frame is not None
        self._exact(frame)

    def test_band_structure_merge(self):
        frame = craft_cpl(cpl_expstr=3,
                          bndstrc=[0, 0, 1, 1, 0, 1, 1],
                          inject={2: {0: 16, 30: 40}})
        assert frame is not None
        self._exact(frame)

    def test_real_low_bitrate_dither_energy_parity(self):
        """Coupled bap-0 bins are per-channel dither BY SPEC: the
        dither-free residual vs the oracle must equal our own dither
        energy (it was 4.8x off before coupled dither existed)."""
        stream = _encode(_signal(48000, "noise"), 48000, 2, 192)
        ref = _bridge_decode(stream).astype(np.float64)
        off_, _, _ = A.decode_stream(stream, dither=False)
        on_, _, _ = A.decode_stream(stream, dither=True)
        m = min(len(ref), len(off_))
        r_orc = np.sqrt(((ref[:m] - off_[:m]) ** 2).mean())
        r_own = np.sqrt(((on_[:m].astype(np.float64)
                          - off_[:m]) ** 2).mean())
        assert 0.8 <= r_own / r_orc <= 1.25, (r_own, r_orc)


@needs_bridge
class TestImporterFallback:
    def test_ac3_importer_native_path(self, tmp_path, monkeypatch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.native import av

        stream = _encode(_signal(48000, "noise"), 48000, 2, 448)
        path = tmp_path / "a.ac3"
        path.write_bytes(stream)
        ref, _, _ = A.decode_stream(stream)   # own dither: exact match
        monkeypatch.setattr(av, "available", lambda: False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ac3", Job())
        imp.open(str(path))
        assert imp.audio_rate == 48000
        chunks = []
        while True:
            b = imp.read_audio_batch(8192)
            if b is None:
                break
            chunks.append(b)
        imp.close()
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(got, ref[:len(got)])
        assert len(got) >= len(ref) - 1536
