"""CLI argument handling: auto-generated flags for every option leaf.

Analog of the reference cli module (cli/cli_options.cpp:59-130 +
cli/bal_cli_utils.cpp:52-135): every leaf of the options dataclasses
becomes a kebab-case flag (bools get a --no- variant), nested structs
prefix their field name; dataset and solver options are both registered
at the top level like the reference's BalAppOptions. Supports
-C/--directory, --config (TOML, [dataset]/[solver] tables) and
--dump-config.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import List, Optional, Tuple

from rootba_tpu.config.options import (
    BalAppOptions,
    StrEnum,
    dump_toml,
    iter_leaves,
    load_toml,
    update_from_dict,
)


def _cli_name(path: str) -> str:
    return "--" + path.replace(".", "-").replace("_", "-")


def add_options_to_parser(parser: argparse.ArgumentParser, obj, prefix=""):
    for path, f, owner in iter_leaves(obj, prefix):
        flag = _cli_name(path)
        cur = getattr(owner, f.name)
        help_text = (f.metadata or {}).get("help", "")
        dest = path.replace(".", "__")
        if isinstance(cur, bool):
            group = parser.add_mutually_exclusive_group()
            group.add_argument(flag, dest=dest, action="store_true",
                               default=None, help=help_text)
            group.add_argument(
                "--no-" + flag[2:], dest=dest, action="store_false",
                default=None, help=argparse.SUPPRESS)
        elif isinstance(cur, StrEnum):
            choices = [m.value for m in type(cur)]
            parser.add_argument(flag, dest=dest, type=str, default=None,
                                help=f"{help_text} (possible values: "
                                     f"{', '.join(choices)})")
        elif isinstance(cur, int):
            parser.add_argument(flag, dest=dest, type=int, default=None,
                                help=help_text)
        elif isinstance(cur, float):
            parser.add_argument(flag, dest=dest, type=float, default=None,
                                help=help_text)
        elif isinstance(cur, list):
            parser.add_argument(flag, dest=dest, nargs="+", default=None,
                                help=help_text)
        else:
            parser.add_argument(flag, dest=dest, type=str, default=None,
                                help=help_text)


def apply_parsed(obj, args: argparse.Namespace, prefix=""):
    for path, f, owner in iter_leaves(obj, prefix):
        dest = path.replace(".", "__")
        val = getattr(args, dest, None)
        if val is None:
            continue
        cur = getattr(owner, f.name)
        if isinstance(cur, StrEnum):
            val = type(cur).parse(val)
        setattr(owner, f.name, val)


def parse_bal_app_arguments(
    summary: str,
    argv: Optional[List[str]] = None,
    forced_solver_type: Optional[str] = None,
) -> Optional[BalAppOptions]:
    """Returns populated BalAppOptions, or None if the app should exit
    (e.g. after --dump-config). Mirrors parse_bal_app_arguments
    (bal_cli_utils.cpp:52-135): CLI > config file > defaults."""
    parser = argparse.ArgumentParser(description=summary)
    parser.add_argument("-C", "--directory", default="",
                        help="change to given directory first")
    parser.add_argument("--config", default="rootba_config.toml",
                        help="path to config file")
    parser.add_argument("--dump-config", action="store_true",
                        help="print effective config and exit")
    parser.add_argument("--platform", default="",
                        help="force a jax platform (e.g. 'cpu', 'tpu'); "
                             "set via jax.config so it wins over "
                             "environment-registered plugins")

    options = BalAppOptions()
    # like the reference, dataset and solver leaves are top-level flags
    add_options_to_parser(parser, options.dataset)
    add_options_to_parser(parser, options.solver)

    args = parser.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.directory:
        os.chdir(args.directory)
        print(f"Changed working directory to: {os.getcwd()}")
    else:
        print(f"Working directory is: {os.getcwd()}")

    if os.path.exists(args.config):
        unknown: List[str] = []
        cfg = load_toml(args.config)
        # ignore reference batch-runner sections like the reference does
        cfg.pop("batch_run", None)
        cfg.pop("slurm", None)
        update_from_dict(options, cfg, unknown=unknown)
        if unknown:
            raise SystemExit(
                f"unused config keys in {args.config}: {unknown}")

    apply_parsed(options.dataset, args)
    apply_parsed(options.solver, args)

    if forced_solver_type is not None:
        from rootba_tpu.config.options import SolverType

        options.solver.solver_type = SolverType.parse(forced_solver_type)

    if args.dump_config:
        print("Printing effective config.")
        print(dump_toml(options))
        return None

    return options
