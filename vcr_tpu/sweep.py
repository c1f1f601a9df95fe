"""Hyperparameter grid-sweep launcher.

Reference: scripts/schedule_jobs.py templated shell scripts with sed and
submitted one Condor GPU job per grid point (scripts/schedule_jobs.py:54-76).
Here each grid point becomes a vcr_tpu run: either executed sequentially
in-process, or emitted as one shell command per point for any external
scheduler (the modern equivalent of the Condor template).

Grid spec: a dict whose list-valued entries are grid axes, exactly like the
reference's placeholder dict (scripts/schedule_jobs.py:8-43).
"""

from __future__ import annotations

import itertools
import json
import os
import shlex
import sys
from typing import Dict, Iterator, List

from vcr_tpu.config import Config

DEFAULT_GRID: Dict = {
    # the reference's example grid (scripts/schedule_jobs.py:16-42)
    "mode": "train",
    "corpus": "msvd",
    "arch": "s2vt",
    "num_frames": 30,
    "bsize": 32,
    "lr": [1e-4, 3e-4],
    "wd": 5e-4,
    "dropout_p": 0.3,
    "hidden_size": 512,
    "epochs": 1000,
    "max_norm": 1.0,
    "seed": 123,
}


def expand_grid(grid: Dict) -> Iterator[Dict]:
    axes = {k: v for k, v in grid.items() if isinstance(v, list)}
    fixed = {k: v for k, v in grid.items() if not isinstance(v, list)}
    if not axes:
        yield dict(fixed)
        return
    keys = list(axes)
    for combo in itertools.product(*(axes[k] for k in keys)):
        point = dict(fixed)
        point.update(dict(zip(keys, combo)))
        yield point


def job_name(point: Dict, axis_keys=None) -> str:
    """Directory name for one grid point: the VARYING axes (always fully
    present, never truncated away) plus a short stable hash of the full point."""
    import hashlib

    digest = hashlib.sha1(
        json.dumps(point, sort_keys=True, default=str).encode()).hexdigest()[:8]
    if axis_keys:
        head = "_".join(f"{k}-{point[k]}" for k in sorted(axis_keys))
    else:
        head = "_".join(f"{k}-{point[k]}" for k in sorted(point)
                        if k not in ("mode", "data_dir", "save_path", "log_dir"))
    return (head[:100] + "_" + digest) if head else digest


def emit_commands(grid: Dict, base_save: str = "./sweeps") -> List[str]:
    """One shell command per grid point (feed to any scheduler)."""
    cmds = []
    axes = [k for k, v in grid.items() if isinstance(v, list)]
    for point in expand_grid(grid):
        name = job_name(point, axes)
        point = dict(point)
        point.setdefault("save_path", os.path.join(base_save, name, "models"))
        point.setdefault("log_dir", os.path.join(base_save, name, "logs"))
        args = " ".join(f"--{k} {shlex.quote(str(v))}" for k, v in point.items())
        cmds.append(f"python -m vcr_tpu.cli {args}")
    return cmds


def run_sweep(grid: Dict, base_save: str = "./sweeps") -> None:
    """Run every grid point sequentially in-process (single host/slice)."""
    from vcr_tpu.train.loop import train

    import dataclasses

    known = {f.name for f in dataclasses.fields(Config)}
    unknown = sorted(set(grid) - known)
    if unknown:
        # Config.from_dict silently drops unknown keys — in a sweep that
        # turns a typo'd axis ('weight_decay' vs 'wd') into N identical runs
        # whose job names CLAIM the axis varied. Fail like emit_commands'
        # argparse would.
        raise ValueError(f"unknown Config field(s) in sweep grid: {unknown}")
    axes = [k for k, v in grid.items() if isinstance(v, list)]
    for point in expand_grid(grid):
        name = job_name(point, axes)
        point = dict(point)
        point.setdefault("save_path", os.path.join(base_save, name, "models"))
        point.setdefault("log_dir", os.path.join(base_save, name, "logs"))
        cfg = Config.from_dict(point).validate()
        print(f"=== sweep point: {name} ===")
        metrics = train(cfg)
        os.makedirs(os.path.join(base_save, name), exist_ok=True)
        with open(os.path.join(base_save, name, "result.json"), "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    grid = DEFAULT_GRID
    paths = [a for a in sys.argv[1:] if not a.startswith("-")]
    if paths:
        with open(paths[0]) as f:
            grid = json.load(f)
    if "--emit" in sys.argv:
        print("\n".join(emit_commands(grid)))
    else:
        run_sweep(grid)
