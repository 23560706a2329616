"""Config system: YAML task configs + JSON vision sub-configs + CLI overrides.

Keeps the reference's config surface (YAML schema of
reference configs/xfm-pt/*.yaml and configs/xfm-ft/*.yaml, JSON vision
sub-configs of reference configs/model/*.json, loaded at
reference models/xfm.py:134,175,208) while using plain dict + pyyaml.
"""
from __future__ import annotations

import copy
import json
import os
from typing import Any, Mapping

import yaml


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def load_json(path: str) -> dict:
    with open(path, "r") as f:
        return json.load(f)


def load_config(path: str, overrides: Mapping[str, Any] | None = None) -> dict:
    """Load a task YAML config and apply CLI overrides (e.g. --bs, --epoch).

    Mirrors the reference flow where `config = yaml.load(open(args.config))`
    then fields are mutated from argparse (reference Pretrain.py:491,313-331).
    """
    cfg = load_yaml(path)
    if overrides:
        for k, v in overrides.items():
            if v is not None:
                cfg[k] = v
    return cfg


def resolve_vision_config(cfg: dict, config_root: str | None = None) -> dict:
    """Resolve the `vision_config` JSON sub-config into the task config.

    Reference reads `config['vision_config']` JSON at model-build time
    (models/xfm.py:134,175,208). We resolve relative paths against the
    repo `configs/` dir so shipped configs work from any cwd.
    """
    cfg = copy.deepcopy(cfg)
    vpath = cfg.get("vision_config")
    if not vpath:
        return cfg
    if not os.path.exists(vpath) and config_root:
        cand = os.path.join(config_root, os.path.basename(vpath))
        if os.path.exists(cand):
            vpath = cand
    if os.path.exists(vpath):
        cfg["_vision"] = load_json(vpath)
    else:
        cfg.setdefault("_vision", {})
    return cfg


def dump_config(cfg: dict, path: str) -> None:
    """Dump the final config to the output dir (reference Retrieval.py:423)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    clean = {k: v for k, v in cfg.items() if not k.startswith("_")}
    with open(path, "w") as f:
        yaml.safe_dump(clean, f, sort_keys=False)
