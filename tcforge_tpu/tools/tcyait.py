"""tcyait — YAIT log analyzer: row-delta log -> frame operations file.

Faithful rebuild of ``tools/tcyait.c``: reads the per-frame even/odd row
deltas produced by ``-J yait=log``, detects 2:3 pulldown interleave
patterns, balances one drop per 5-frame group (banking/borrowing extra
drops up to 4 groups ahead, tcyait.c:799-903), inherits patterns into
ambiguous groups, and emits per-frame operations (save/copy rows, drop,
deinterlace) for ``-J yait=ops``.

This is host-side analysis over a few thousand scalar records — plain
Python/numpy, no device work.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

Y_THRESH = 1.1
Y_MTHRESH = 1.02
Y_WEIGHT = 0.001
Y_FTHRESH = 1.4
Y_FWEIGHT = 0.01

OP_SAVE = 0x1
OP_COPY = 0x2
OP_DROP = 0x4
OP_DEINT = 0x8
OP_ODD = 0x10
OP_EVEN = 0x20
OP_PAT = 0x30

(HAS_DROP, BANK_DROP, WITHDRAW_DROP, BORROW_DROP, RETURN_DROP,
 FORCE_DEINT, FORCE_DROP, FORCE_KEEP) = range(1, 9)


class Fi:
    """Per-frame record (tcyait.c fi_t)."""

    __slots__ = ("r", "ro", "w", "fn", "ed", "od", "gi", "ip", "op",
                 "drop", "gf")

    def __init__(self, fn: int, ed: int, od: int):
        self.fn = fn
        self.ed = ed
        self.od = od
        self.r = calc_ratio(ed, od)
        self.ro = self.r
        self.w = 0.0
        self.gi = 0
        self.ip = -1
        self.op = 0
        self.drop = False
        self.gf = 0


def calc_ratio(ed: int, od: int) -> float:
    """Signed even/odd delta ratio: <-1 even-, >1 odd-correlated
    (yait_calc_ratio, tcyait.c:392-421)."""
    if not ed and not od:
        return 0.0
    if ed and not od:
        return 100.0
    if not ed and od:
        return -100.0
    r = ed / od
    if r < 1:
        r = -1.0 / r
    return max(-100.0, min(100.0, r))


def m5(n: int) -> int:
    while n < 0:
        n += 5
    return n % 5


class Yait:
    def __init__(self, records, deint_mode: int = 3):
        self.fa: List[Fi] = [Fi(fn, ed, od) for fn, ed, od in records]
        self.nf = len(self.fa)
        self.ga: List[Fi] = []
        self.ng = 0
        self.md = 0
        self.deint_mode = deint_mode

    # ---- pattern detection (yait_find_ip, tcyait.c:435-513) ---------

    def find_ip(self) -> None:
        fa = self.fa
        for i in range(1, self.nf - 1):
            f = fa[i]
            if f.r:
                continue
            if not fa[i - 1].r and not fa[i + 1].r:
                continue
            f.drop = True

        self.ga = []
        for f in fa:
            if f.drop:
                continue
            f.gi = len(self.ga)
            self.ga.append(f)
        self.ng = len(self.ga)

        self.md = max([max(f.ed, f.od) for f in fa], default=0)
        if not self.md:
            raise ValueError("all empty frames?")

        for f in self.ga:
            if (f.ed + f.od) / self.md < Y_WEIGHT:
                f.r = 0.0

        for i in range(max(0, self.ng - 6)):
            self._chk_pairs(i)
            self._chk_tuplets(i)

        i = 0
        while i < self.ng:
            f = self.ga[i]
            if f.op & OP_COPY:
                i += 2          # finish this group first
                continue
            p, w = self._find_odd(Y_THRESH, i)
            if p != -1:
                self._mark_grp(p, i, w)
                i += 1
                continue
            p, w = self._find_even(Y_THRESH, i)
            if p != -1:
                self._mark_grp(p + 10, i, w)
            i += 1

    def _chk_pairs(self, n: int) -> None:
        fa = self.ga[n:n + 6]
        if len(fa) < 6:
            return
        ra = [abs(f.r) for f in fa]
        if ra[2] < Y_THRESH or ra[3] < Y_THRESH:
            return
        if ra[1] > Y_THRESH or ra[4] > Y_THRESH:
            return
        if ra[0] > Y_THRESH and ra[5] > Y_THRESH:
            return
        if fa[2].r > 0 and fa[3].r > 0:
            return
        if fa[2].r < 0 and fa[3].r < 0:
            return
        fa[2].r = 0.0
        fa[3].r = 0.0
        fa[2].drop = True

    def _chk_tuplets(self, n: int) -> None:
        fa = self.ga[n:n + 7]
        if len(fa) < 7:
            return
        ra = [abs(f.r) for f in fa]
        if any(ra[i] < Y_THRESH for i in (2, 3, 4)):
            return
        if ra[1] > Y_THRESH or ra[5] > Y_THRESH:
            return
        if ra[0] > Y_THRESH and ra[6] > Y_THRESH:
            return
        if fa[2].r > 0 and fa[4].r > 0:
            return
        if fa[2].r < 0 and fa[4].r < 0:
            return
        if ra[3] > ra[2] or ra[3] > ra[4]:
            fa[3].r = 0.0

    def _ffmin(self, n: int) -> int:
        r, m = 0.0, 0
        for i in range(n, min(n + 4, self.ng)):
            if self.ga[i].r < r:
                r, m = self.ga[i].r, i
        return m

    def _ffmax(self, n: int) -> int:
        r, m = 0.0, 0
        for i in range(n, min(n + 4, self.ng)):
            if self.ga[i].r > r:
                r, m = self.ga[i].r, i
        return m

    def _find_odd(self, thresh, n):
        me, mo = self._ffmin(n), self._ffmax(n)
        if m5(mo - 2) == m5(me):
            re, ro = abs(self.ga[me].r), abs(self.ga[mo].r)
            if re > thresh and ro > thresh:
                return m5(mo - 4), re + ro
        return -1, 0.0

    def _find_even(self, thresh, n):
        me, mo = self._ffmin(n), self._ffmax(n)
        if m5(me - 2) == m5(mo):
            re, ro = abs(self.ga[me].r), abs(self.ga[mo].r)
            if re > thresh and ro > thresh:
                return m5(me - 4), re + ro
        return -1, 0.0

    def _mark_grp(self, p: int, n: int, w: float) -> None:
        if n % 5 != (p + 2) % 5:
            return
        f = self.ga[n]
        if w <= f.w:
            return
        t = OP_ODD if p < 10 else OP_EVEN
        f.op = t | OP_SAVE | OP_DROP
        if n + 1 < self.ng:
            self.ga[n + 1].op = t | OP_COPY
        for i in range(n - 1, n + 4):
            if 0 <= i < self.ng:
                self.ga[i].ip = p
                self.ga[i].w = w

    # ---- drop balancing (yait_find_drops, tcyait.c:827-1085) --------

    def _cnt_drops(self, n: int) -> int:
        return sum(1 for f in self.fa[n:n + 5]
                   if f.drop or f.op & OP_DROP)

    def _extra_drop(self, n: int) -> bool:
        da = [self._cnt_drops(n + (g + 1) * 5) for g in range(4)]
        if sum(da) < 5:
            return False
        e = next((k for k, d in enumerate(da) if d > 1), 4)
        d = sum(self._cnt_drops(n + (e + 1 + g + 1) * 5)
                for g in range(3))
        return d >= 3

    def _missing_drop(self, n: int) -> bool:
        return sum(self._cnt_drops(n + (g + 1) * 5)
                   for g in range(4)) <= 3

    def _get_hdrop(self, n: int) -> List[int]:
        return [i for i in range(n, min(n + 5, self.nf))
                if self.fa[i].drop]

    def _ivtc_keep(self, d: int) -> None:
        fd = self.fa[d]
        fp = self.fa[d - 1]
        if fp.op & OP_COPY:
            fd.op = fp.op
            fd.drop = False
            return
        if d < 2:
            fd.drop = False
            return
        fd.op = fp.op
        fd.drop = False
        t = fp.op & OP_PAT
        fp.op = t | OP_COPY
        self.fa[d - 2].op = t | OP_SAVE

    def _keep_frame(self, n: int) -> None:
        da = self._get_hdrop(n)
        if not da:
            for f in self.fa[n:n + 5]:
                if f.op & OP_DROP:
                    f.op &= ~OP_DROP
                    f.op |= OP_DEINT
                    return
            raise ValueError(f"no drop frame found near {self.fa[n].fn}")
        bd = -1
        for d in da:
            if d == 0:
                continue
            f = self.fa[d - 1]
            if f.drop and d >= 2:
                f = self.fa[d - 2]
            if not f.op:
                self.fa[d].drop = False
                return
            if f.op & OP_COPY:
                bd = d
        if bd < 0:
            bd = da[0]
        self._ivtc_keep(bd)

    def find_drops(self) -> None:
        ed = 0
        for n in range(0, self.nf, 5):
            f = self.fa[n]
            d = self._cnt_drops(n)
            while d > 2:
                self._keep_frame(n)
                d = self._cnt_drops(n)
            if not d:
                if ed > 0:
                    f.gf = WITHDRAW_DROP
                    ed -= 1
                elif self._extra_drop(n):
                    f.gf = BORROW_DROP
                    ed -= 1
                else:
                    f.gf = FORCE_DEINT
            elif d > 1:
                if ed < 0:
                    f.gf = RETURN_DROP
                    ed += 1
                elif self._missing_drop(n):
                    f.gf = BANK_DROP
                    ed += 1
                else:
                    f.gf = FORCE_KEEP
                    self._keep_frame(n)
            else:
                f.gf = HAS_DROP

    # ---- pattern inheritance (yait_ivtc_grps, tcyait.c:1192-1427) ---

    def _scan_bk(self, n: int) -> int:
        for i in range(n - 1, -1, -1):
            f = self.fa[i]
            if f.drop:
                return -1
            if f.ip != -1:
                return f.ip
        return -1

    def _scan_fw(self, n: int) -> int:
        for i in range(n + 5, self.nf):
            f = self.fa[i]
            if f.drop:
                return -1
            if f.ip != -1:
                return f.ip
        return -1

    def _tst_ip(self, n: int, p: int) -> float:
        s = 1 if p < 10 else -1
        rs = 0.0
        gi = self.fa[n].gi
        for i in range(gi, min(gi + 5, self.ng - 2)):
            if i % 5 != (p + 2) % 5:
                continue
            r = s * self.ga[i].ro
            if r < 0:
                rs += abs(r)
            r = s * self.ga[i + 2].ro
            if r > 0:
                rs += r
            break
        return rs

    def _drop_frame(self, n: int) -> None:
        mr, md = 0.0, 0
        fr = fd = n
        for i in range(n, min(n + 5, self.nf - 1)):
            if i == 0:
                continue
            if self.fa[i - 1].drop or self.fa[i + 1].drop:
                continue
            if self.fa[i - 1].op & OP_PAT:
                continue
            f = self.fa[i]
            r = abs(f.ro)
            if r > mr:
                mr, fr = r, i
            d = f.ed + f.od
            if not md or d < md:
                md, fd = d, i
        self.fa[fr if mr > Y_THRESH else fd].drop = True

    def _ivtc_grp(self, n: int, p1: int, p2: int) -> int:
        m1 = -1.0 if p1 < 0 else self._tst_ip(n, p1)
        m2 = -1.0 if p2 < 0 else self._tst_ip(n, p2)
        if m1 < Y_MTHRESH * 2 and m2 < Y_MTHRESH * 2:
            return -1
        p = p1 if m1 > m2 else p2
        for f in self.fa[n:n + 5]:
            if f.drop:
                raise ValueError(f"confused at frame {f.fn}")
            f.ip = p
        gi = self.fa[n].gi
        t = OP_ODD if p < 10 else OP_EVEN
        for i in range(gi, min(gi + 5, self.ng - 1)):
            if i % 5 == (p + 2) % 5:
                self.ga[i].op = t | OP_SAVE | OP_DROP
                if not (self.ga[i + 1].op & OP_DROP):
                    self.ga[i + 1].op = t | OP_COPY
                break
        return p

    def ivtc_grps(self) -> None:
        fg = True
        pb = pf = -1
        for n in range(0, self.nf, 5):
            f = self.fa[n]
            if f.gf != FORCE_DEINT:
                fg = True
                continue
            if fg:
                fg = False
                pb = self._scan_bk(n)
                pf = self._scan_fw(n)
            if pb < 0 and pf < 0:
                f.gf = FORCE_DROP
                self._drop_frame(n)
                continue
            p = self._ivtc_grp(n, pb, pf)
            if p < 0:
                f.gf = FORCE_DROP
                self._drop_frame(n)
                continue
            if p == pf:
                pb = -1

    # ---- leftover interlace (yait_deint, tcyait.c:1498-1555) --------

    def deint(self) -> None:
        i = 1
        while i < self.ng - 2:
            f = self.ga[i]
            if f.op & OP_PAT or f.drop:
                i += 1
                continue
            if abs(f.r) < Y_FTHRESH:
                i += 1
                continue
            if (f.ed + f.od) / self.md < Y_FWEIGHT:
                i += 1
                continue
            f1, f2 = self.ga[i + 1], self.ga[i + 2]
            if self.ga[i - 1].op & OP_PAT:
                if abs(f1.r) < Y_THRESH and abs(f2.r) < Y_THRESH:
                    i += 1
                    continue
                if f1.op & OP_PAT or f2.op & OP_PAT:
                    i += 1
                    continue
            os = f.r * f1.r < 0
            if not os and abs(f1.r) > Y_THRESH:
                i += 1
                continue
            f.op = OP_DEINT
            if abs(f1.r) < Y_FTHRESH and not (f1.op & OP_PAT) \
                    and not f1.drop:
                f1.op = OP_DEINT
            i += 2

    # ---- output -------------------------------------------------------

    def op_string(self, f: Fi) -> str:
        if f.drop:
            return "d"
        s = ""
        if f.op & OP_ODD:
            s += "o"
        if f.op & OP_EVEN:
            s += "e"
        if f.op & OP_SAVE:
            s += "s"
        if f.op & OP_COPY:
            s += "c"
        if f.op & OP_DROP:
            s += "d"
        if f.op & OP_DEINT:
            s += str(self.deint_mode)
        return s

    def run(self) -> List[str]:
        self.find_ip()
        self.find_drops()
        self.ivtc_grps()
        self.deint()
        return [f"{f.fn}: {self.op_string(f)}" for f in self.fa]


def read_log(path: str):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            # "fn: e: E, o: O"
            parts = line.replace(":", " ").replace(",", " ").split()
            fn, ed, od = int(parts[0]), int(parts[2]), int(parts[4])
            records.append((fn, ed, od))
    if not records:
        raise ValueError("invalid log file")
    start = records[0][0]
    for k, (fn, _, _) in enumerate(records):
        if fn - start != k:
            raise ValueError(f"broken log file, line {k}")
    return records


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="tcyait", description="YAIT telecine analyzer")
    p.add_argument("-l", dest="log", default="yait.log")
    p.add_argument("-o", dest="ops", default="yait.ops")
    p.add_argument("-m", dest="mode", type=int, default=3)
    p.add_argument("-d", dest="debug", action="store_true")
    args = p.parse_args(argv)

    y = Yait(read_log(args.log), deint_mode=args.mode)
    lines = y.run()
    with open(args.ops, "w") as f:
        f.write("\n".join(lines) + "\n")
    if args.debug:
        for f_ in y.fa:
            print(f"Frame {f_.fn:6d}: e: {f_.ed:8d}, o: {f_.od:8d}, "
                  f"r: {f_.r:7.3f}, ip: {f_.ip:2d}, "
                  f"op: {y.op_string(f_):4s}")
    drops = sum(1 for f_ in y.fa if "d" in y.op_string(f_))
    print(f"tcyait: {len(lines)} frames, {drops} drops -> {args.ops}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
