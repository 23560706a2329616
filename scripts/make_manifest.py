#!/usr/bin/env python3
"""Build jsonl manifests for the classification tasks from a
torchvision-style class-folder tree (train/val dirs of class subfolders).

Replaces the reference's torchvision DATASETS registry of 20+ linear-probe
datasets (reference Imagenet.py:43-177): every dataset that torchvision can
materialize on disk becomes an image-folder tree, which this script turns
into the {"image": path, "label": int} manifest xfm_tpu.tasks.imagenet
consumes.

Usage: python scripts/make_manifest.py <image_root> <out.jsonl>
"""
import json
import os
import sys


def main(root: str, out: str):
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    n = 0
    with open(out, "w") as f:
        for ci, c in enumerate(classes):
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                f.write(json.dumps({"image": os.path.join(root, c, fn),
                                    "label": ci}) + "\n")
                n += 1
    with open(out + ".classes", "w") as f:
        json.dump(classes, f)
    print(f"wrote {n} rows, {len(classes)} classes -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
