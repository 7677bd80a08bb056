"""Auto-generated CLI from config dataclasses.

Mirrors the reference's pydantic→argparse generator
(mtgvision/encoder_train.py:786-843): every field becomes ``--flag``, bools
accept y/n/true/false/1/0, "none"/empty string disables string-valued losses,
and a loss scale ≤ 0 clears the corresponding loss (:822-827).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, get_args, get_origin


def _parse_bool(v: str) -> bool:
    s = str(v).strip().lower()
    if s in ("y", "yes", "true", "t", "1"):
        return True
    if s in ("n", "no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError(f"invalid bool: {v!r}")


def add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        name = "--" + f.name.replace("_", "-")
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
        )
        typ = f.type
        origin = get_origin(typ)
        if origin is Optional or (origin is type(None)):
            typ = get_args(typ)[0] if get_args(typ) else str
        if typ in (bool, "bool"):
            parser.add_argument(name, type=_parse_bool, default=default, metavar="y/n")
        elif typ in (int, "int"):
            parser.add_argument(name, type=int, default=default)
        elif typ in (float, "float"):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def parse_config(cls, argv: list[str] | None = None):
    """argv → config dataclass instance, with the loss-disabling conventions."""
    parser = argparse.ArgumentParser(description=cls.__name__)
    add_dataclass_args(parser, cls)
    ns = vars(parser.parse_args(argv))
    kwargs = {}
    for f in dataclasses.fields(cls):
        v = ns.get(f.name)
        if isinstance(v, str) and v.strip().lower() in ("none", ""):
            v = ""
        kwargs[f.name] = v
    cfg = cls(**{k: v for k, v in kwargs.items() if k in {f.name for f in dataclasses.fields(cls)}})
    # scale ≤ 0 disables the matching loss (encoder_train.py:822-827)
    for loss_field, scale_field in (
        ("loss_recon", "scale_loss_recon"),
        ("loss_contrastive", "scale_loss_contrastive"),
        ("loss_set_contrastive", "scale_loss_set_contrastive"),
    ):
        if hasattr(cfg, loss_field) and hasattr(cfg, scale_field):
            if getattr(cfg, scale_field) is not None and getattr(cfg, scale_field) <= 0:
                object.__setattr__(cfg, loss_field, "")
    return cfg
