"""--config yml overlay for the training drivers.

Parity with the reference's config mechanism
(confidence/confidence_train.py:99-108): entries in the yml OVERRIDE the
parsed argparse values.  The reference appends list-valued entries to the
existing list — safe there because its list flags default to empty.  Here
several list flags have fixed arity and non-empty defaults (the nargs=3
temperature triples in eval/evaluate.py), so appending would silently grow
them to 6 elements and disable the tuned low-temperature sampling; we
therefore only append when the existing value is an *empty* list and
replace otherwise.  Presets for the shipped model families live under
``configs/``.
"""
from __future__ import annotations

import argparse

import yaml


def add_config_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", default=None,
                        help="yml whose entries override the parsed flags "
                             "(list values append); see configs/*.yml")


def apply_config_overlay(args: argparse.Namespace) -> argparse.Namespace:
    if not getattr(args, "config", None):
        return args
    with open(args.config) as f:
        config_dict = yaml.safe_load(f) or {}
    arg_dict = args.__dict__
    for key, value in config_dict.items():
        if key not in arg_dict:
            raise SystemExit(f"--config: unknown option {key!r} for this driver")
        if (isinstance(value, list) and isinstance(arg_dict[key], list)
                and not arg_dict[key]):
            arg_dict[key].extend(value)
        else:
            arg_dict[key] = value
    return args
