"""avidump — recursive RIFF/AVI structure inspector
(avilib/avidump.c analogue).

Walks the RIFF chunk tree printing each chunk's offset, fourcc and
size, and decodes the AVI metadata structures field by field: avih
(MainAVIHeader), strh (AVIStreamHeader), strf (BITMAPINFOHEADER /
WAVEFORMATEX), dmlh (OpenDML extended frame count), idx1 entries,
OpenDML indx super-indexes and ix## standard indexes, and LIST INFO
text chunks.  Unknown small chunks get a bounded hex dump.
"""

from __future__ import annotations

import argparse
import string
import struct
import sys
from typing import BinaryIO, List, Optional

_PRINTABLE = set(string.ascii_letters + string.digits + " _")


def _fcc(raw: bytes) -> str:
    return "".join(c if c in _PRINTABLE else "?"
                   for c in raw.decode("latin-1"))


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


AVIF_FLAGS = {0x00000010: "HASINDEX", 0x00000020: "MUSTUSEINDEX",
              0x00000100: "ISINTERLEAVED", 0x00010000: "WASCAPTUREFILE",
              0x00020000: "COPYRIGHTED", 0x00000800: "TRUSTCKTYPE"}

# (name, kind) field tables in struct order, avidump.c names[] style
AVIH_FIELDS = [("us_frame", "d"), ("max_bps", "d"), ("pad_gran", "d"),
               ("flags", "x"), ("tot_frames", "d"), ("init_frames", "d"),
               ("streams", "d"), ("sug_bsize", "d"), ("width", "d"),
               ("height", "d"), ("scale", "d"), ("rate", "d"),
               ("start", "d"), ("length", "d")]
STRH_FIELDS = [("fcc_type", "4"), ("fcc_handler", "4"), ("flags", "x"),
               ("priority", "d"), ("init_frames", "d"), ("scale", "d"),
               ("rate", "d"), ("start", "d"), ("length", "d"),
               ("sug_bsize", "d"), ("quality", "d"), ("samp_size", "d")]
BIH_FIELDS = [("bi_size", "d"), ("bi_width", "d"), ("bi_height", "d"),
              ("bi_planes", "w"), ("bi_bit_count", "w"),
              ("bi_compression", "4"), ("bi_size_image", "d"),
              ("bi_x_pels", "d"), ("bi_y_pels", "d"),
              ("bi_clr_used", "d"), ("bi_clr_important", "d")]
WFX_FIELDS = [("w_format_tag", "wx"), ("n_channels", "w"),
              ("n_samples_per_sec", "d"), ("n_avg_bytes_per_sec", "d"),
              ("n_block_align", "w"), ("w_bits_per_sample", "w")]


class AviDumper:
    def __init__(self, out=None, hexdump: bool = False,
                 max_index: int = 16):
        self.out = out or sys.stdout
        self.hexdump = hexdump
        self.max_index = max_index

    def p(self, text: str) -> None:
        self.out.write(text + "\n")

    # -- field decoding ------------------------------------------------ #

    def _fields(self, data: bytes, table, indent: str) -> None:
        off = 0
        for name, kind in table:
            if kind == "w" or kind == "wx":
                if off + 2 > len(data):
                    return
                v = _u16(data, off)
                off += 2
                self.p(f"{indent}{name:<12} = "
                       + (f"0x{v:x}" if kind == "wx" else f"{v}"))
                continue
            if off + 4 > len(data):
                return
            v = _u32(data, off)
            off += 4
            if kind == "4":
                s = _fcc(data[off - 4:off]) if v else "unset (0)"
                self.p(f"{indent}{name:<12} = {s}")
            elif kind == "x":
                self.p(f"{indent}{name:<12} = 0x{v:x}")
                for bit, label in AVIF_FLAGS.items():
                    if name == "flags" and v & bit:
                        self.p(f"{indent}\t0x{bit:x}: {label}")
            else:
                self.p(f"{indent}{name:<12} = {v}")

    def _hex(self, data: bytes, indent: str, limit: int = 64) -> None:
        for base in range(0, min(len(data), limit), 16):
            row = data[base:base + 16]
            hx = " ".join(f"{b:02x}" for b in row).ljust(47)
            asc = "".join(chr(b) if 32 <= b < 127 else "."
                          for b in row)
            self.p(f"{indent}  {hx} {asc}")

    def _idx1(self, data: bytes, indent: str) -> None:
        n = len(data) // 16
        self.p(f"{indent}{n} idx1 entries")
        for i in range(min(n, self.max_index)):
            tag = _fcc(data[i * 16:i * 16 + 4])
            flags = _u32(data, i * 16 + 4)
            off = _u32(data, i * 16 + 8)
            size = _u32(data, i * 16 + 12)
            key = "yes" if flags & 0x10 else "no"
            self.p(f"{indent}  [{i:6d}] tag={tag} 0x{off:08x} "
                   f"{size:8d} key={key}")
        if n > self.max_index:
            self.p(f"{indent}  ... {n - self.max_index} more")

    def _indx(self, data: bytes, indent: str) -> None:
        if len(data) < 24:
            return
        lw, isub, itype = data[0] | data[1] << 8, data[2], data[3]
        n = _u32(data, 4)
        chunk_id = _fcc(data[8:12])
        self.p(f"{indent}longs_per_entry = {lw}")
        self.p(f"{indent}index_sub_type = {isub}")
        self.p(f"{indent}index_type  = {itype} "
               f"({'super' if itype == 0 else 'std'})")
        self.p(f"{indent}entries_in_use = {n}")
        self.p(f"{indent}chunk_id    = {chunk_id}")
        if itype == 0:              # super index: qw offset, size, dur
            for i in range(min(n, self.max_index)):
                base = 24 + i * 16
                if base + 16 > len(data):
                    break
                qw = struct.unpack_from("<Q", data, base)[0]
                sz = _u32(data, base + 8)
                dur = _u32(data, base + 12)
                self.p(f"{indent}  [{i:6d}] 0x{qw:016x} 0x{sz:08x} "
                       f"{dur:8d}")
        else:                       # standard index: 8-byte entries
            base_off = struct.unpack_from("<Q", data, 12)[0]
            self.p(f"{indent}base_offset = 0x{base_off:016x}")
            for i in range(min(n, self.max_index)):
                base = 24 + i * 8
                if base + 8 > len(data):
                    break
                off = _u32(data, base)
                sz = _u32(data, base + 4)
                key = "no" if sz & 0x80000000 else "yes"
                self.p(f"{indent}  [{i:6d}] 0x{off:08x} "
                       f"{sz & 0x7FFFFFFF:8d} key={key}")

    # -- chunk tree ------------------------------------------------------ #

    def _chunk_body(self, f: BinaryIO, ckid: str, size: int,
                    depth: int, strh_type: List[Optional[str]]) -> None:
        indent = "\t" + "  " * depth
        data = f.read(min(size, 1 << 20))
        if ckid == "avih":
            self._fields(data, AVIH_FIELDS, indent)
        elif ckid == "strh":
            strh_type[0] = _fcc(data[:4]) if len(data) >= 4 else None
            self._fields(data, STRH_FIELDS, indent)
        elif ckid == "strf":
            if strh_type[0] == "vids":
                self._fields(data, BIH_FIELDS, indent)
            elif strh_type[0] == "auds":
                self._fields(data, WFX_FIELDS, indent)
            elif self.hexdump:
                self._hex(data, indent)
        elif ckid == "dmlh":
            if len(data) >= 4:
                self.p(f"{indent}{'tot_frames':<12} = "
                       f"{_u32(data, 0)}")
        elif ckid == "idx1":
            self._idx1(data, indent)
        elif ckid == "indx" or (len(ckid) == 4 and ckid[:2] == "ix"):
            self._indx(data, indent)
        elif ckid in ("ISFT", "INAM", "IART", "ICMT", "ICOP",
                      "ISBJ", "IGNR"):
            text = data.split(b"\0")[0].decode("latin-1",
                                               errors="replace")
            self.p(f"{indent}{ckid} = {text!r}")
        elif self.hexdump:
            self._hex(data, indent)
        if size > len(data):
            f.seek(size - len(data), 1)

    def _walk(self, f: BinaryIO, end: int, depth: int,
              strh_type: List[Optional[str]]) -> None:
        while True:
            pos = f.tell()
            if pos + 8 > end:
                return
            head = f.read(8)
            if len(head) < 8:
                return
            ckid = _fcc(head[:4])
            size = _u32(head, 4)
            pad = "  " * depth
            if ckid in ("RIFF", "LIST"):
                form = _fcc(f.read(4))
                kind = "Form" if ckid == "RIFF" else "List"
                self.p(f"(0x{pos:08x}) {pad}ID:<{ckid}>   "
                       f"Size: {size:10d}")
                self.p(f"{' ' * 12} {pad}  {kind} Type = <{form}>")
                inner_end = min(end, pos + 8 + size)
                self._walk(f, inner_end, depth + 1, strh_type)
                f.seek(pos + 8 + size + (size & 1))
                continue
            self.p(f"(0x{pos:08x}) {pad}ID:<{ckid}>   "
                   f"Size: {size:10d}")
            if pos + 8 + size > end:
                self.p(f"{pad}  *****  Error: chunk exceeds file")
                return
            self._chunk_body(f, ckid, size, depth, strh_type)
            f.seek(pos + 8 + size + (size & 1))

    def dump(self, path: str) -> None:
        import os
        fsize = os.path.getsize(path)
        with open(path, "rb") as f:
            self._walk(f, fsize, 0, [None])


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="avidump", description="dump RIFF/AVI file structure")
    ap.add_argument("-i", dest="infile", required=False)
    ap.add_argument("file", nargs="?", help="AVI file")
    ap.add_argument("-x", dest="hexdump", action="store_true",
                    help="hex-dump unknown chunk payloads")
    ap.add_argument("-n", dest="max_index", type=int, default=16,
                    help="index entries to print per table")
    args = ap.parse_args(argv)
    path = args.infile or args.file
    if not path:
        ap.error("need an input file")
    try:
        AviDumper(hexdump=args.hexdump,
                  max_index=args.max_index).dump(path)
    except BrokenPipeError:
        return 0                   # | head etc.
    except (IOError, OSError) as e:
        print(f"avidump: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
