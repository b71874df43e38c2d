"""Dataclass-driven CLI argument parsing (HfArgumentParser-equivalent).

Matches the reference's three-tier config surface (SURVEY §5): dataclass
fields become --flags, and passing a single .json path as argv parses all
dataclasses from that file (run_mim.py:228-231 behaviour)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import typing
from pathlib import Path
from typing import List, Optional, Sequence, Type, Union, get_args, get_origin


def _add_field(parser: argparse.ArgumentParser, f: dataclasses.Field,
               ftype: type):
    name = "--" + f.name
    origin = get_origin(ftype)
    if origin is Union:  # Optional[T]
        args = [a for a in get_args(ftype) if a is not type(None)]
        ftype = args[0] if args else str
        origin = get_origin(ftype)

    default = (f.default if f.default is not dataclasses.MISSING
               else (f.default_factory()
                     if f.default_factory is not dataclasses.MISSING
                     else None))
    helptext = f.metadata.get("help", "")

    if ftype is bool:
        parser.add_argument(name, type=_str2bool, nargs="?", const=True,
                            default=default, help=helptext)
    elif origin in (list, List):
        elem = get_args(ftype)[0] if get_args(ftype) else str
        parser.add_argument(name, type=elem, nargs="*", default=default,
                            help=helptext)
    else:
        parser.add_argument(name, type=ftype, default=default, help=helptext)


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in ("1", "true", "yes", "y"):
        return True
    if s in ("0", "false", "no", "n", ""):
        return False
    # argparse type-callable contract: raise on bad values — silently
    # mapping a typo ('ture') to False would e.g. skip training entirely
    import argparse

    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def parse_args_into_dataclasses(classes: Sequence[Type],
                                argv: Optional[Sequence[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)

    # single-JSON-file mode
    if len(argv) == 1 and argv[0].endswith(".json"):
        blob = json.loads(Path(argv[0]).read_text())
        out = []
        for cls in classes:
            names = {f.name for f in dataclasses.fields(cls)}
            out.append(cls(**{k: v for k, v in blob.items() if k in names}))
        return tuple(out)

    parser = argparse.ArgumentParser()
    seen = set()
    for cls in classes:
        hints = typing.get_type_hints(cls)
        for f in dataclasses.fields(cls):
            if f.name in seen:
                continue
            seen.add(f.name)
            _add_field(parser, f, hints.get(f.name, str))
    ns = vars(parser.parse_args(argv))
    out = []
    for cls in classes:
        names = {f.name for f in dataclasses.fields(cls)}
        out.append(cls(**{k: v for k, v in ns.items() if k in names}))
    return tuple(out)
