"""Experiment loading (port of python/rootba/experiments.py concepts):
an Experiment = named set of Runs discovered from a directory pattern,
loaded from a TOML spec with optional caching."""

from __future__ import annotations

import glob
import hashlib
import os
import pickle
import tomllib
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from rootba_tpu.eval.run import Run


@dataclass
class Experiment:
    name: str
    display_name: str
    pattern: str
    runs: Dict[str, Run] = field(default_factory=dict)

    @staticmethod
    def load(name: str, display_name: str, pattern: str,
             base_path: str = ".") -> "Experiment":
        exp = Experiment(name=name, display_name=display_name,
                         pattern=pattern)
        for d in sorted(glob.glob(os.path.join(base_path, pattern))):
            if os.path.isdir(d):
                run = Run.load(d)
                exp.runs[run.name] = run
        return exp

    def sequences(self) -> List[str]:
        return sorted(self.runs.keys())


def load_experiments_config(path: str) -> dict:
    with open(path, "rb") as fp:
        return tomllib.load(fp)


def load_all(spec_path: str, base_path: Optional[str] = None,
             use_cache: bool = True) -> Dict[str, Experiment]:
    """Load all experiments named in a TOML spec:

        [options]
        base_path = "..."
        cache_dir = "cache"

        [[experiments]]
        name = "qr32"
        display_name = "sqrt-BA f32"
        pattern = "runs/2026*qr32/*"
    """
    cfg = load_experiments_config(spec_path)
    opts = cfg.get("options", {})
    base = base_path or opts.get("base_path",
                                 os.path.dirname(spec_path) or ".")
    cache_dir = opts.get("cache_dir")

    out: Dict[str, Experiment] = {}
    for spec in cfg.get("experiments", []):
        name = spec["name"]
        pattern = spec["pattern"]
        display = spec.get("display_name", name)
        cache_file = None
        if cache_dir and use_cache:
            h = hashlib.sha1(
                f"{base}|{pattern}".encode()).hexdigest()[:16]
            cache_file = os.path.join(base, cache_dir, f"{name}-{h}.pickle")
            if os.path.exists(cache_file):
                try:
                    with open(cache_file, "rb") as fp:
                        out[name] = pickle.load(fp)
                    continue
                except Exception:
                    pass
        exp = Experiment.load(name, display, pattern, base)
        out[name] = exp
        if cache_file:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            with open(cache_file, "wb") as fp:
                pickle.dump(exp, fp)
    return out
