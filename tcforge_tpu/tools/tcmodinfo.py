"""tcmodinfo / tcmodchain — module inspection and chain validation
(tools/tcmodinfo.c + tools/tcmodchain.c analogues)."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def _socket_client(path: str,
                   infile=None, outfile=None) -> int:
    """Interactive control-socket client (tcmodinfo.c:180-260 -s
    mode): relay stdin lines to the running engine, print replies
    until EOF or a 'quit'."""
    import socket as socketlib
    infile = infile or sys.stdin
    outfile = outfile or sys.stdout
    c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    try:
        c.connect(path)
    except OSError as e:
        print(f"tcmodinfo: cannot connect to {path}: {e}",
              file=sys.stderr)
        return 1
    f = c.makefile("rwb")
    try:
        for line in infile:
            line = line.strip()
            if not line:
                continue
            f.write(line.encode() + b"\n")
            f.flush()
            while True:
                reply = f.readline()
                if not reply:
                    return 0           # server closed
                text = reply.decode().rstrip()
                print(text, file=outfile)
                if text.endswith("OK") or text.endswith("FAILED"):
                    break
            if line.split()[0].lower() in ("quit", "exit"):
                break
    finally:
        c.close()
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcmodinfo",
                                description="inspect registered modules")
    p.add_argument("-i", dest="name", help="module to inspect")
    p.add_argument("-t", dest="kind", default="filter",
                   help="module kind (filter|encoder|multiplexor|"
                        "demultiplexor)")
    p.add_argument("--list", action="store_true", help="list all modules")
    p.add_argument("--chain", nargs=2, metavar=("ENCODER", "MUXER"),
                   help="validate encoder->muxer pairing (tcmodchain)")
    p.add_argument("-s", dest="socket", metavar="PATH",
                   help="connect to a running transcode's control "
                        "socket and relay commands (tcmodinfo.c -s)")
    p.add_argument("-p", dest="modpath", action="store_true",
                   help="print the module path (tcmodinfo.c -p)")
    p.add_argument("-F", dest="format",
                   help="print which module serves this format/"
                        "extension (registry lookup)")
    p.add_argument("-C", dest="configure",
                   help="configure the module with this optstring "
                        "before inspecting")
    p.add_argument("-M", dest="element",
                   help="request module information about <element> "
                        "(inspect one parameter)")
    p.add_argument("-d", dest="verbose", type=int, default=1,
                   help="verbosity (parity)")
    args = p.parse_args(argv)

    if args.modpath:
        import tcforge_tpu.modules as _m
        import os as _os
        print(_os.path.dirname(_os.path.abspath(_m.__file__)))
        return 0

    if args.socket:
        return _socket_client(args.socket)

    import tcforge_tpu.modules  # register
    from tcforge_tpu.modules.registry import (ModuleKind, list_modules,
                                              lookup, modules_can_chain)
    from tcforge_tpu.core.job import Job

    if args.list:
        for name in list_modules():
            print(name)
        return 0
    if args.chain:
        enc = lookup(ModuleKind.ENCODER, args.chain[0])
        mux = lookup(ModuleKind.MULTIPLEXOR, args.chain[1])
        ok = modules_can_chain(enc.info, mux.info)
        print(f"{args.chain[0]} -> {args.chain[1]}: "
              f"{'OK' if ok else 'INCOMPATIBLE'}")
        return 0 if ok else 1
    if args.format:
        from tcforge_tpu.modules.registry import module_names_for_format
        role = {"filter": "filter", "encoder": "encoder",
                "encode": "encoder", "multiplex": "multiplexor",
                "multiplexor": "multiplexor",
                "demultiplexor": "demultiplexor"}.get(args.kind,
                                                      "encoder")
        names = module_names_for_format(role, args.format)
        if not names:
            print(f"no {role} module for format {args.format!r}")
            return 1
        print(" ".join(names))
        return 0
    if args.name:
        kind = ModuleKind(args.kind)
        cls = lookup(kind, args.name)
        mod = cls(Job(), args.configure or "")
        if args.element:
            spec = next((sp for sp in mod.desc.params
                         if sp.name == args.element), None)
            if spec is None:
                print(f"{args.name}: no parameter {args.element!r}")
                return 1
            print(f"{spec.name} ({spec.fmt}) default={spec.default}"
                  f" — {spec.help}")
            return 0
        print(mod.inspect())
        return 0
    p.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
