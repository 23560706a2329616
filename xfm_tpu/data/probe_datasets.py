"""Linear-probe / classification dataset registry.

The reference keeps a torchvision-backed DATASETS registry of ~20 named
classification sets plus a custom FER2013 h5 loader (reference
Imagenet.py:43-177, 328-434; the xfm-5.png linear-eval table). Torchvision
downloads are not a thing on a TPU pod's hosts, so the TPU-native analog
resolves each *name* to data already on disk (or GCS via data.io) in one of
the standard layouts:

- class-folder tree:  <root>/<split>/<class_name>/*.jpg
- jsonl manifest:     <root>/<split>.jsonl with {"image": path, "label": int}
- npz arrays:         <root>/<split>.npz with images [N,H,W(,C)] uint8 +
                      labels [N] (CIFAR/MNIST/STL-style exports)
- FER2013 h5:         <root>/fer2013.h5 with <split>/images + <split>/labels
                      (the reference's custom h5 format, Imagenet.py:118-140)

Rows are (path_or_uint8_array, label); `decode_image` handles both.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ProbeSpec:
    num_classes: int
    train_split: str = "train"
    val_split: str = "val"
    # h5 datasets use the fer2013 layout regardless of name
    kind: str = "auto"              # auto | h5


# The reference's linear-eval suite (xfm-5.png Table 7 + Imagenet.py:43-177).
PROBE_DATASETS: dict[str, ProbeSpec] = {
    "imagenet": ProbeSpec(1000),
    "food101": ProbeSpec(101, val_split="test"),
    "cifar10": ProbeSpec(10, val_split="test"),
    "cifar100": ProbeSpec(100, val_split="test"),
    "cars": ProbeSpec(196, val_split="test"),
    "aircraft": ProbeSpec(100, val_split="test"),
    "dtd": ProbeSpec(47, val_split="test"),
    "pets": ProbeSpec(37, val_split="test"),
    "caltech101": ProbeSpec(101, val_split="test"),
    "flowers": ProbeSpec(102, val_split="test"),
    "mnist": ProbeSpec(10, val_split="test"),
    "fer2013": ProbeSpec(7, val_split="test", kind="h5"),
    "stl10": ProbeSpec(10, val_split="test"),
    "eurosat": ProbeSpec(10, val_split="test"),
    "resisc45": ProbeSpec(45, val_split="test"),
    "gtsrb": ProbeSpec(43, val_split="test"),
    "kitti": ProbeSpec(4, val_split="test"),
    "country211": ProbeSpec(211, val_split="test"),
    "pcam": ProbeSpec(2, val_split="test"),
    "sun397": ProbeSpec(397, val_split="test"),
    "svhn": ProbeSpec(10, val_split="test"),
    "renderedsst2": ProbeSpec(2, val_split="test"),
}


def load_probe_split(name: str, root: str, split: str):
    """→ (rows [(path_or_array, label)], num_classes)."""
    spec = PROBE_DATASETS.get(name.lower())
    if spec is None:
        raise KeyError(
            f"unknown probe dataset {name!r}; known: "
            f"{sorted(PROBE_DATASETS)}")

    if spec.kind == "h5" or os.path.isfile(os.path.join(root, f"{name}.h5")):
        return _load_h5(os.path.join(root, f"{name}.h5"), split), \
            spec.num_classes

    manifest = os.path.join(root, f"{split}.jsonl")
    if os.path.isfile(manifest):
        rows = []
        with open(manifest) as f:
            for line in f:
                d = json.loads(line)
                p = d["image"]
                if not os.path.isabs(p):
                    p = os.path.join(root, p)
                rows.append((p, int(d["label"])))
        return rows, spec.num_classes

    npz = os.path.join(root, f"{split}.npz")
    if os.path.isfile(npz):
        import numpy as np

        with np.load(npz) as z:
            images, labels = z["images"], z["labels"]
        return [(images[i], int(labels[i])) for i in range(len(labels))], \
            spec.num_classes

    tree = os.path.join(root, split)
    if os.path.isdir(tree):
        classes = sorted(d for d in os.listdir(tree)
                         if os.path.isdir(os.path.join(tree, d)))
        rows = []
        for ci, c in enumerate(classes):
            cdir = os.path.join(tree, c)
            rows.extend((os.path.join(cdir, fn), ci)
                        for fn in sorted(os.listdir(cdir)))
        return rows, spec.num_classes

    raise FileNotFoundError(
        f"no {split}.jsonl / {split}.npz / {split}/ tree under {root} "
        f"for dataset {name!r}")


def _load_h5(path: str, split: str):
    """FER2013-style h5: <split>/images uint8 [N,H,W] or [N,H,W,C],
    <split>/labels [N] (reference Imagenet.py:118-140 custom h5 dataset)."""
    import h5py
    import numpy as np

    rows = []
    with h5py.File(path, "r") as f:
        grp = f[split] if split in f else f
        images = np.asarray(grp["images"])
        labels = np.asarray(grp["labels"])
    for i in range(len(labels)):
        rows.append((images[i], int(labels[i])))
    return rows
