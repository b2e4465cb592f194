"""tcmodchain — validate encoder<->multiplexor pairings
(tools/tcmodchain.c analogue).

check mode (-C): every consecutive ``kind:name`` pair must be
codec-compatible (tc_module_info_match semantics: the producer's output
codecs intersect the consumer's input codecs, TC_CODEC_ANY matching
everything).  list mode (-L): one fixed module + one ``kind:*``
template; prints the registered modules that pair with the fixed one.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

_KINDS = {"encode": "encoder", "encoder": "encoder",
          "mplex": "multiplexor", "mux": "multiplexor",
          "multiplex": "multiplexor", "multiplexor": "multiplexor"}


def _lookup(kind: str, name: str):
    from tcforge_tpu.modules.registry import ModuleKind, lookup
    return lookup(ModuleKind(kind), name)


def _codecs_out(info):
    return set(info.codecs_out or ())


def _codecs_in(info):
    return set(info.codecs_in or ())


def modules_match(head_info, tail_info, media: Optional[str]) -> bool:
    """tc_module_info_match: producer output intersects consumer input."""
    from tcforge_tpu.core.codecs import Codec
    if media and media != "both":
        for info in (head_info, tail_info):
            if info.media not in (media, "both"):
                return False
    outs = _codecs_out(head_info)
    ins = _codecs_in(tail_info)
    if Codec.ANY in outs or Codec.ANY in ins:
        return True
    return bool(outs & ins)


def _parse_modstr(s: str):
    if ":" not in s:
        raise ValueError(f"bad module string '{s}' (want kind:name)")
    kind, name = s.split(":", 1)
    kind = _KINDS.get(kind.lower())
    if kind is None:
        raise ValueError(f"unknown module kind in '{s}'")
    return kind, name


def main(argv: Optional[List[str]] = None) -> int:
    import tcforge_tpu.modules  # noqa: F401  (register everything)
    from tcforge_tpu.modules.registry import ModuleKind, list_modules
    p = argparse.ArgumentParser(
        prog="tcmodchain",
        description="check/list encoder-multiplexor chains")
    p.add_argument("-C", dest="check", action="store_true",
                   help="check mode: validate the given chain")
    p.add_argument("-L", dest="list", action="store_true",
                   help="list mode: modules pairing with the fixed one")
    p.add_argument("-A", dest="media", action="store_const",
                   const="audio", help="check audio capabilities")
    p.add_argument("-V", dest="media", action="store_const",
                   const="video", help="check video capabilities")
    p.add_argument("-d", dest="verbose", type=int, default=1)
    p.add_argument("modules", nargs="+", metavar="kind:name")
    args = p.parse_args(argv)

    try:
        parsed = [_parse_modstr(m) for m in args.modules]
    except ValueError as e:
        print(f"tcmodchain: {e}", file=sys.stderr)
        return 1

    if args.list:
        if len(parsed) != 2:
            print("tcmodchain: list mode needs exactly 2 arguments",
                  file=sys.stderr)
            return 1
        tmpl = [i for i, (_, n) in enumerate(parsed) if n == "*"]
        if len(tmpl) != 1:
            print("tcmodchain: list mode needs exactly one kind:*",
                  file=sys.stderr)
            return 1
        ti = tmpl[0]
        fi = 1 - ti
        fkind, fname = parsed[fi]
        tkind, _ = parsed[ti]
        try:
            fixed = _lookup(fkind, fname).info
        except KeyError:
            print(f"tcmodchain: unknown module {fkind}:{fname}",
                  file=sys.stderr)
            return 1
        names = []
        for name in list_modules(ModuleKind(tkind)):
            cand = _lookup(tkind, name).info
            head, tail = ((fixed, cand) if fkind == "encoder"
                          else (cand, fixed))
            if modules_match(head, tail, args.media):
                names.append(name)
        for n in names:
            print(n)
        return 0

    # check mode (default like -C)
    status = 0
    for (k1, n1), (k2, n2) in zip(parsed, parsed[1:]):
        try:
            i1, i2 = _lookup(k1, n1).info, _lookup(k2, n2).info
        except KeyError as e:
            print(f"tcmodchain: unknown module {e}", file=sys.stderr)
            return 1
        ok = modules_match(i1, i2, args.media)
        if args.verbose > 1:
            print(f"{k1}:{n1} | {k2}:{n2} "
                  f"[{'OK' if ok else 'MISMATCH'}]")
        if not ok:
            status = 1
    if status == 0 and args.verbose:
        print("chain OK")
    return status


if __name__ == "__main__":
    sys.exit(main())
