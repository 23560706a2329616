"""Checkpoint converter CLI: torch `.th` ↔ xfm_tpu params.

The reference ships torch state_dicts (`xfm_1b3.th`; loaded with prefix
surgery + pos-embed interpolation at reference models/xfm.py:408-468,
models/beit2.py:572-849). This tool makes the translation a first-class
user-facing operation:

  # torch -> orbax (ready for any xfm_tpu task via --checkpoint)
  python scripts/convert_checkpoint.py to-jax xfm_1b3.th out_ckpt/ \
      --config configs/pretrain_base_4m.yaml

  # trained xfm_tpu params -> torch .th (for the reference's loaders)
  python scripts/convert_checkpoint.py to-torch out_ckpt/ xfm_tpu.th \
      --config configs/pretrain_base_4m.yaml
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("direction", choices=["to-jax", "to-torch"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", required=True, help="task/pretrain YAML")
    args = p.parse_args()

    import jax

    try:  # CPU is fine (and faster to init) for a pure re-serialization
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import yaml

    from xfm_tpu.models import config_from_yaml
    from xfm_tpu.train import checkpoint as ck

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    mcfg = config_from_yaml(cfg)

    if args.direction == "to-jax":
        sd = ck.load_torch_state_dict(args.src)
        params = ck.to_jax(ck.import_xfm_checkpoint(sd, mcfg))
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.dst), params, force=True)
        ckptr.wait_until_finished()
        n = len(jax.tree_util.tree_leaves(params))
        print(f"wrote {n} param tensors -> {args.dst}")
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.abspath(args.src))
        sd = ck.export_xfm_checkpoint(params, mcfg)
        ck.save_torch_checkpoint(args.dst, sd)
        print(f"wrote {len(sd)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
