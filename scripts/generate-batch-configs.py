#!/usr/bin/env python3
"""Batch-config generator (re-implementation of the reference's
scripts/generate-batch-configs.py:61-160 grammar).

Reads <path>/rootba_batch_config.toml containing a `_batch` section:

  [_batch]
  revision = "01_example"
  [_batch.config.<NAME>]   # named partial configs (deep-merged)
  [_batch.alternatives]    # NAME -> list of config names (OR)
  [_batch.combinations]    # NAME -> list of config/alternative names (AND)

plus the base config (all non-_batch keys). For each combination a
sub-folder is created and one rootba_config_*.toml written per element
of the cross product of its alternatives, by deep-merging base + named
configs left to right.
"""

from __future__ import annotations

import argparse
import copy
import datetime
import itertools
import os
import shutil
import sys
import tomllib


def merge_config(base: dict, override: dict):
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            merge_config(base[k], v)
        else:
            base[k] = copy.deepcopy(v)


def dump_toml_dict(d: dict, prefix="", lines=None) -> str:
    if lines is None:
        lines = []

    def fmt(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        if isinstance(v, list):
            return "[" + ", ".join(fmt(x) for x in v) + "]"
        raise TypeError(f"cannot dump {type(v)}")

    scalars = {k: v for k, v in d.items() if not isinstance(v, dict)}
    tables = {k: v for k, v in d.items() if isinstance(v, dict)}
    if prefix and (scalars or not tables):
        lines.append(f"[{prefix}]")
    for k, v in scalars.items():
        lines.append(f"{k} = {fmt(v)}")
    if scalars:
        lines.append("")
    for k, v in tables.items():
        dump_toml_dict(v, f"{prefix}.{k}" if prefix else k, lines)
    return "\n".join(lines)


def save_config(template: dict, configs: dict, combination, path_prefix):
    config = copy.deepcopy(template)
    name_parts = []
    for override in combination:
        if override not in configs:
            raise KeyError(f"unknown named config '{override}'")
        merge_config(config, configs[override])
        name_parts.append(override)
    # one directory per run, containing exactly one rootba_config.toml
    # (the run directory also receives output.log / status.log / ba_log)
    rundir = os.path.join(path_prefix, "_".join(name_parts))
    os.makedirs(rundir, exist_ok=True)
    filename = os.path.join(rundir, "rootba_config.toml")
    with open(filename, "w") as f:
        f.write(dump_toml_dict(config) + "\n")
    print(filename)


def generate_configs(root_path, cmdline="", overwrite_existing=False,
                     revision_override=None):
    batch_config_path = os.path.join(root_path, "rootba_batch_config.toml")
    with open(batch_config_path, "rb") as fp:
        template = tomllib.load(fp)
    cfg = template.pop("_batch")

    revision = (str(cfg.get("revision", 0)) if revision_override is None
                else revision_override)
    configs = cfg["config"]
    alternatives = cfg.get("alternatives", {})
    combinations = cfg["combinations"]

    date_str = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    outdir = (root_path if revision is None
              else os.path.join(root_path, revision))
    if overwrite_existing and os.path.exists(outdir):
        print(f"WARNING: output directory exists, overwriting: {outdir}")
    else:
        os.makedirs(outdir)
    shutil.copy(batch_config_path, outdir)
    with open(os.path.join(outdir, "timestamp"), "w") as f:
        f.write(date_str)
    with open(os.path.join(outdir, "commandline"), "w") as f:
        f.write(cmdline)

    def expand_one(x):
        if isinstance(x, list):
            return x
        if x in alternatives:
            return alternatives[x]
        return [x]

    def flatten(lst):
        for el in lst:
            if isinstance(el, list):
                yield from flatten(el)
            else:
                yield el

    for name, description in combinations.items():
        path_prefix = os.path.join(outdir, name)
        if not (overwrite_existing and os.path.exists(path_prefix)):
            os.makedirs(path_prefix, exist_ok=True)
        expanded = [expand_one(x) for x in description]
        for comb in itertools.product(*expanded):
            save_config(template, configs, list(flatten(list(comb))),
                        path_prefix)


def main():
    parser = argparse.ArgumentParser(
        description="Generate rootba_tpu configs from a batch config file.")
    parser.add_argument("path", help="dir containing rootba_batch_config.toml")
    parser.add_argument("--revision", help="override revision")
    parser.add_argument("--force", "-f", action="store_true",
                        help="overwrite existing files")
    args = parser.parse_args()
    generate_configs(args.path, str(sys.argv), args.force, args.revision)


if __name__ == "__main__":
    main()
