"""Pretraining input streams (reference dataset/pretrain_dataset.py).

Python iterators over sharded JSONL producing *fixed-shape numpy batches*
(dict of arrays), ready for `core.mesh.shard_batch`. Streams:

- ImageTextStream  — image-text pairs (reference ImageTextJsonDataset:154-313)
- TextStream       — text-only MLM (reference TextJsonDataset:645-738)
- ImageStream      — image-only / ImageNet MIM source (reference
                     ImageJsonDataset:315-394)

Broken samples are skipped with an optional log
(reference dataset/pretrain_dataset.py:258-262). The MIM block mask is
attached per-batch here on the host (reference generates it inside the model,
models/beit2.py:431-441).
"""
from __future__ import annotations

import base64
import copy
import re
from typing import Iterator, Optional

import numpy as np

from .block_masking import BlockMaskingGenerator
from .jsonl import ShardedLineReader
from .text_masking import TextMaskingGenerator
from .transforms import decode_image, normalize

PAD_MASK_LABEL = -100


def pre_caption(caption: str, max_words: int) -> str:
    """Caption cleanup (reference dataset/utils.py:39-66)."""
    caption = re.sub(r"([,.'!?\"()*#:;~])", " ", caption.lower())
    caption = caption.replace("-", " ").replace("/", " ")
    caption = caption.replace("<person>", "person")
    caption = re.sub(r"\s{2,}", " ", caption).rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return caption


class TextPreprocessor:
    """tokenize → truncate+eos → mask → pad to (max_tokens, max_masks)
    (reference dataset/pretrain_dataset.py:264-298)."""

    def __init__(self, tokenizer, max_words=30, max_tokens=30, max_masks=15,
                 mask_prob=0.5, skipgram_prb=0.2, skipgram_size=3,
                 mask_whole_word=False, rng=None):
        self.tok = tokenizer
        self.max_words, self.max_tokens = max_words, max_tokens
        self.max_masks = max_masks
        self.cls = tokenizer.cls_token
        self.eos = tokenizer.sep_token
        self.pad_id = tokenizer.pad_token_id
        self.masker = TextMaskingGenerator(
            tokenizer, mask_prob, max_masks, skipgram_prb, skipgram_size,
            mask_whole_word, rng=rng)

    def encode(self, text: str):
        """→ (text_ids, text_atts) without masking."""
        text = pre_caption(text, self.max_words)
        tokens = [self.cls] + self.tok.tokenize(text)[: self.max_tokens - 2]
        tokens = tokens + [self.eos]
        ids = self.tok.convert_tokens_to_ids(tokens)
        n = len(ids)
        pad = self.max_tokens - n
        return (np.asarray(ids + [self.pad_id] * pad, np.int32),
                np.asarray([1] * n + [0] * pad, np.int32))

    def encode_masked(self, text: str):
        """→ (ids, atts, ids_masked, masked_pos, masked_ids)."""
        text = pre_caption(text, self.max_words)
        tokens = [self.cls] + self.tok.tokenize(text)[: self.max_tokens - 2]
        tokens = tokens + [self.eos]
        if len(tokens) < 2:
            raise ValueError("too-short text")
        ids = self.tok.convert_tokens_to_ids(tokens)
        masked_tokens, masked_pos = self.masker(copy.deepcopy(tokens))
        ids_masked = self.tok.convert_tokens_to_ids(masked_tokens)
        masked_ids = [ids[p] for p in masked_pos]

        n = len(ids)
        pad = self.max_tokens - n
        mpad = self.max_masks - len(masked_ids)
        return (np.asarray(ids + [self.pad_id] * pad, np.int32),
                np.asarray([1] * n + [0] * pad, np.int32),
                np.asarray(ids_masked + [self.pad_id] * pad, np.int32),
                np.asarray(list(masked_pos) + [0] * mpad, np.int32),
                np.asarray(masked_ids + [PAD_MASK_LABEL] * mpad, np.int32))


def _get_caption(caption, rng, language=None):
    """list / str / multilingual-dict captions
    (reference dataset/pretrain_dataset.py:206-223)."""
    if isinstance(caption, list):
        caption = caption[rng.integers(0, len(caption))]
    if isinstance(caption, dict):
        if language is not None:
            caption = caption[language]
        else:
            vals = list(caption.values())
            caption = vals[rng.integers(0, len(vals))]
    if not isinstance(caption, str):
        raise ValueError(f"bad caption {type(caption)}")
    return caption


class ImageTextStream:
    """→ batches {images, text_ids, text_atts, text_ids_masked, masked_pos,
    masked_ids, image_mask}."""

    def __init__(self, files, config: dict, tokenizer, transform,
                 rank=0, world_size=1, config_key="images",
                 batch_size: Optional[int] = None, seed=0,
                 with_image_mask=True, is_aux=False):
        sub = config.get(config_key, {}) or {}
        self.reader = ShardedLineReader(files, rank, world_size, seed=seed)
        self.image_key = sub.get("image_key", "binary")
        self.is_image_rpath = sub.get("is_image_rpath", False)
        self.caption_key = (sub.get("aux_caption_key") if is_aux
                            else sub.get("caption_key", "desc"))
        self.language = sub.get("language_chosen")
        self.batch_size = batch_size or sub.get("batch_size", 32)
        self.transform = transform
        self.rng = np.random.default_rng(seed + rank)
        self.print_broken = config.get("print_broken_data", False)
        self.prep = TextPreprocessor(
            tokenizer,
            max_words=config.get("max_words", 30),
            max_tokens=config.get("max_tokens", 30),
            max_masks=config.get("max_masks", 15),
            mask_prob=config.get("mask_prob", 0.5),
            skipgram_prb=config.get("skipgram_prb", 0.2),
            skipgram_size=config.get("skipgram_size", 3),
            mask_whole_word=config.get("mask_whole_word", False),
            rng=self.rng)
        self.with_image_mask = with_image_mask
        grid = config.get("image_res", 224) // config.get("patch_size", 16)
        self.block_masker = BlockMaskingGenerator(
            grid, config.get("num_masking_patches", 75),
            config.get("min_num_patches", 16), rng=self.rng)
        # C++ loader path (reference gets input parallelism from DataLoader
        # worker processes, dataset/__init__.py:221-246): threaded native
        # decode + planned RandAugment when `num_workers` > 0 and the
        # transform is a TrainTransform-shaped object.
        self.native_batch = None
        workers = sub.get("num_workers", 0)
        if workers and hasattr(transform, "randaug"):
            from .transforms import NativeBatchTransform

            self.native_batch = NativeBatchTransform.maybe_build(
                transform, workers,
                device_randaug=sub.get("device_randaug", False))

    @property
    def device_randaug_active(self) -> bool:
        """True when batches are un-augmented uint8 and the train step must
        apply device_aug.randaugment_batch."""
        return bool(self.native_batch is not None
                    and self.native_batch.device_randaug)

    def _blob(self, ann) -> bytes:
        """Raw encoded image bytes for the native decode path."""
        v = ann[self.image_key]
        if self.is_image_rpath:
            with open(v, "rb") as f:
                return f.read()
        v = _maybe_b64(v, self.rng)
        if isinstance(v, str):
            return base64.b64decode(v)
        return bytes(v)

    def _iter_native(self) -> Iterator[dict]:
        nbt = self.native_batch
        blobs: list = []
        dims: list = []
        caps: list = []
        for ann in self.reader.iter_json():
            try:
                caption = _get_caption(ann[self.caption_key], self.rng,
                                       self.language)
                blob = self._blob(ann)
                d = nbt.probe(blob)
                if d is None:
                    raise ValueError("undecodable image")
            except Exception as e:  # broken sample: skip
                if self.print_broken:
                    print(f"broken sample skipped: {e}", flush=True)
                continue
            blobs.append(blob)
            dims.append(d)
            caps.append(caption)
            if len(blobs) == self.batch_size:
                images, sub = nbt(blobs, dims, return_submap=True)
                if images is not None:
                    # a slot whose full decode failed holds another slot's
                    # pixels — carry that slot's caption too so the batch
                    # contains a duplicated PAIR, never a mismatched one
                    caps = [caps[int(s)] for s in sub]
                    enc = [self.prep.encode_masked(c) for c in caps]
                    ids, atts, idsm, mpos, mids = (np.stack(z)
                                                   for z in zip(*enc))
                    batch = dict(images=images, text_ids=ids, text_atts=atts,
                                 text_ids_masked=idsm, masked_pos=mpos,
                                 masked_ids=mids)
                    if self.with_image_mask:
                        batch["image_mask"] = self.block_masker.batch(
                            self.batch_size)
                    yield batch
                blobs, dims, caps = [], [], []

    def examples(self) -> Iterator[dict]:
        for ann in self.reader.iter_json():
            try:
                caption = _get_caption(ann[self.caption_key], self.rng,
                                       self.language)
                img = decode_image(ann[self.image_key]
                                   if self.is_image_rpath
                                   else _maybe_b64(ann[self.image_key],
                                                   self.rng))
                image = self.transform(img)
                ids, atts, idsm, mpos, mids = self.prep.encode_masked(caption)
                yield dict(images=image, text_ids=ids, text_atts=atts,
                           text_ids_masked=idsm, masked_pos=mpos,
                           masked_ids=mids)
            except Exception as e:  # broken sample: skip
                if self.print_broken:
                    print(f"broken sample skipped: {e}", flush=True)

    def __iter__(self) -> Iterator[dict]:
        if self.native_batch is not None:
            yield from self._iter_native()
            return
        buf: list[dict] = []
        for ex in self.examples():
            buf.append(ex)
            if len(buf) == self.batch_size:
                batch = {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                if self.with_image_mask:
                    batch["image_mask"] = self.block_masker.batch(
                        self.batch_size)
                yield batch
                buf = []


def _maybe_b64(v, rng):
    if isinstance(v, list):
        if not v:
            raise ValueError("empty image list")
        v = v[rng.integers(0, len(v))]
    return v


class RegionTextStream:
    """Region-text stream (reference RegionTextJsonDataset:409-642).

    Per json record {image, elems: [{bb, caption[, attributes]}]}:
    random crop containing one sampled bbox (reference :460-468), careful
    hflip when any caption mentions left/right (reference :425-443,471-477),
    per-region patch attention masks (reference get_image_attns:577-592),
    normalized cxcywh targets (reference :555-560). Regions flatten across
    `max_images` images into a fixed-size batch with idx_to_group_img;
    under-full batches pad by resampling (reference collate_fn:594-642 —
    fixed shapes are what keeps the SPMD step from recompiling).
    """

    def __init__(self, files, config: dict, tokenizer, rank=0, world_size=1,
                 config_key="regions", seed=0):
        sub = config.get(config_key, {}) or {}
        self.reader = ShardedLineReader(files, rank, world_size, seed=seed)
        self.image_key = sub.get("image_key", "binary")
        self.is_image_rpath = sub.get("is_image_rpath", False)
        self.batch_size = sub.get("batch_size", 32)
        self.max_images = sub.get("max_images", 16)
        self.max_regions = sub.get("max_regions", 5)
        self.min_perc = sub.get("min_perc_in_image", 0.5)
        self.careful_hflip = sub.get("careful_hflip", True)
        self.image_res = config.get("image_res", 224)
        self.patch_size = config.get("patch_size", 16)
        self.num_patch = self.image_res // self.patch_size
        self.rng = np.random.default_rng(seed + rank + 3)
        self.print_broken = config.get("print_broken_data", False)
        self.prep = TextPreprocessor(
            tokenizer,
            max_words=config.get("max_words", 30),
            max_tokens=config.get("max_tokens", 30),
            max_masks=config.get("max_masks", 15),
            mask_prob=config.get("mask_prob", 0.5),
            skipgram_prb=config.get("skipgram_prb", 0.2),
            skipgram_size=config.get("skipgram_size", 3),
            mask_whole_word=config.get("mask_whole_word", False),
            rng=self.rng)

    # --- helpers ---------------------------------------------------------

    def _image_attns(self, x, y, w, h):
        """Region → patch-level attention mask incl. cls
        (reference :577-592)."""
        import math

        P, G = self.patch_size, self.num_patch
        x_min = min(math.floor(x / P), G - 1)
        x_max = max(x_min + 1, min(math.ceil((x + w) / P), G))
        y_min = min(math.floor(y / P), G - 1)
        y_max = max(y_min + 1, min(math.ceil((y + h) / P), G))
        atts = np.zeros(1 + G * G, np.int32)
        atts[0] = 1
        for j in range(x_min, x_max):
            for i in range(y_min, y_max):
                atts[G * i + j + 1] = 1
        return atts

    def _mentions_side(self, ann):
        def in_it(elem):
            caps = elem.get("caption", [])
            caps = caps if isinstance(caps, list) else [caps]
            return any(("left" in c) or ("right" in c) for c in caps
                       if isinstance(c, str))

        if "caption" in ann and in_it(ann):
            return True
        return any(in_it(e) for e in ann.get("elems", []))

    def _one_image(self, ann):
        """→ (image array, list of region dicts) or raises."""
        from PIL import Image

        img = decode_image(ann[self.image_key] if self.is_image_rpath
                           else ann[self.image_key])
        W, H = img.size
        elems = ann["elems"]
        x, y, w, h = [int(v) for v in
                      elems[self.rng.integers(0, len(elems))]["bb"]]
        assert 0 <= x and 0 <= y and x + w <= W and y + h <= H \
            and w > 0 and h > 0, "elem invalid"
        x0 = int(self.rng.integers(0, x, endpoint=True))
        y0 = int(self.rng.integers(0, y, endpoint=True))
        x1 = int(self.rng.integers(min(x + w, W), W, endpoint=True))
        y1 = int(self.rng.integers(min(y + h, H), H, endpoint=True))
        img = img.crop((x0, y0, x1, y1))
        W, H = img.size

        do_hflip = False
        if self.rng.random() < 0.5 and not (
                self.careful_hflip and self._mentions_side(ann)):
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            do_hflip = True
        img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
        image = normalize(np.asarray(img, np.uint8))

        regions = []
        budget = self.max_regions
        for elem in elems:
            if budget <= 0:
                break
            ex, ey, ew, eh = [int(v) for v in elem["bb"]]
            # clip to the crop; keep only regions ≥ min_perc inside
            nx, ny = max(ex - x0, 0), max(ey - y0, 0)
            nx2 = min(ex + ew - x0, W)
            ny2 = min(ey + eh - y0, H)
            if nx2 <= nx or ny2 <= ny:
                continue
            if (nx2 - nx) * (ny2 - ny) < self.min_perc * ew * eh:
                continue
            rx, rw = float(nx), float(nx2 - nx)
            ry, rh = float(ny), float(ny2 - ny)
            if do_hflip:
                rx = (W - rx) - rw
            s = self.image_res
            rx, rw = s / W * rx, s / W * rw
            ry, rh = s / H * ry, s / H * rh

            caption = _get_caption(elem["caption"], self.rng)
            if "attributes" in elem:
                caption = _get_caption(elem["attributes"], self.rng) \
                    + " " + caption
            try:
                enc = self.prep.encode_masked(caption)
            except Exception:
                continue
            regions.append(dict(
                enc=enc,
                image_atts=self._image_attns(rx, ry, rw, rh),
                target_bbox=np.asarray(
                    [(rx + rw / 2) / s, (ry + rh / 2) / s, rw / s, rh / s],
                    np.float32),
            ))
            budget -= 1
        if not regions:
            raise ValueError("no usable regions")
        return image, regions

    def __iter__(self) -> Iterator[dict]:
        images, flat, group = [], [], []
        for ann in self.reader.iter_json():
            try:
                image, regions = self._one_image(ann)
            except Exception as e:
                if self.print_broken:
                    print(f"broken region sample: {e}", flush=True)
                continue
            gi = len(images)
            images.append(image)
            for r in regions:
                flat.append(r)
                group.append(gi)
            if len(images) < self.max_images and len(flat) < self.batch_size:
                continue

            n = len(flat)
            if n >= self.batch_size:
                keep = self.rng.choice(n, self.batch_size, replace=False)
            else:  # pad by resampling (reference :609-625)
                keep = np.concatenate([
                    np.arange(n),
                    self.rng.choice(n, self.batch_size - n, replace=True)])
            ids, atts, idsm, mpos, mids = (np.stack(x) for x in zip(
                *[flat[i]["enc"] for i in keep]))
            # pad the image stack to max_images for static shapes
            while len(images) < self.max_images:
                images.append(np.zeros_like(images[0]))
            yield dict(
                images=np.stack(images),
                idx_to_group_img=np.asarray([group[i] for i in keep],
                                            np.int32),
                text_ids=ids, text_atts=atts, text_ids_masked=idsm,
                masked_pos=mpos, masked_ids=mids,
                image_atts=np.stack([flat[i]["image_atts"] for i in keep]),
                target_bbox=np.stack([flat[i]["target_bbox"]
                                      for i in keep]),
                is_image=np.zeros(self.batch_size, np.float32),
            )
            images, flat, group = [], [], []


class TextStream:
    """Text-only MLM batches (reference TextJsonDataset:645-738):
    {text_ids, text_atts, text_ids_masked, masked_pos, masked_ids}."""

    def __init__(self, files, config: dict, tokenizer, rank=0, world_size=1,
                 seed=0):
        sub = config.get("texts", {}) or {}
        self.reader = ShardedLineReader(files, rank, world_size, seed=seed)
        self.text_key = sub.get("text_key", "desc")
        self.batch_size = sub.get("batch_size", 64)
        self.rng = np.random.default_rng(seed + rank + 1)
        self.prep = TextPreprocessor(
            tokenizer,
            max_words=sub.get("max_words", 128),
            max_tokens=sub.get("max_tokens", 128),
            max_masks=sub.get("max_masks", 20),
            mask_prob=sub.get("mask_prob", 0.15),
            skipgram_prb=config.get("skipgram_prb", 0.2),
            skipgram_size=config.get("skipgram_size", 3),
            mask_whole_word=sub.get("mask_whole_word", True),
            rng=self.rng)

    def __iter__(self) -> Iterator[dict]:
        buf = []
        for ann in self.reader.iter_json():
            try:
                text = ann[self.text_key]
                buf.append(self.prep.encode_masked(text))
            except Exception:
                continue
            if len(buf) == self.batch_size:
                ids, atts, idsm, mpos, mids = (np.stack(x) for x in
                                               zip(*buf))
                yield dict(text_ids=ids, text_atts=atts,
                           text_ids_masked=idsm, masked_pos=mpos,
                           masked_ids=mids)
                buf = []


class ImageStream:
    """Image-only stream (ImageNet MIM source,
    reference ImageJsonDataset:315-394): {images, image_mask}."""

    def __init__(self, files, config: dict, transform, rank=0, world_size=1,
                 config_key="images_imagenet", seed=0):
        sub = config.get(config_key, {}) or {}
        self.reader = ShardedLineReader(files, rank, world_size, seed=seed)
        self.image_key = sub.get("image_key", "binary")
        self.is_image_rpath = sub.get("is_image_rpath", False)
        self.batch_size = sub.get("batch_size", 32)
        self.transform = transform
        self.rng = np.random.default_rng(seed + rank + 2)
        grid = config.get("image_res", 224) // config.get("patch_size", 16)
        self.block_masker = BlockMaskingGenerator(
            grid, config.get("num_masking_patches", 75),
            config.get("min_num_patches", 16), rng=self.rng)
        self.native_batch = None
        workers = sub.get("num_workers", 0)
        if workers and hasattr(transform, "randaug"):
            from .transforms import NativeBatchTransform

            self.native_batch = NativeBatchTransform.maybe_build(
                transform, workers,
                device_randaug=sub.get("device_randaug", False))

    @property
    def device_randaug_active(self) -> bool:
        return bool(self.native_batch is not None
                    and self.native_batch.device_randaug)

    def _blob(self, ann) -> bytes:
        v = ann[self.image_key]
        if self.is_image_rpath:
            with open(v, "rb") as f:
                return f.read()
        if isinstance(v, str):
            return base64.b64decode(v)
        return bytes(v)

    def __iter__(self) -> Iterator[dict]:
        if self.native_batch is not None:
            nbt = self.native_batch
            blobs, dims = [], []
            for ann in self.reader.iter_json():
                try:
                    blob = self._blob(ann)
                    d = nbt.probe(blob)
                    if d is None:
                        raise ValueError("undecodable image")
                except Exception:
                    continue
                blobs.append(blob)
                dims.append(d)
                if len(blobs) == self.batch_size:
                    images = nbt(blobs, dims)
                    if images is not None:
                        yield dict(images=images,
                                   image_mask=self.block_masker.batch(
                                       self.batch_size))
                    blobs, dims = [], []
            return
        buf = []
        for ann in self.reader.iter_json():
            try:
                img = decode_image(ann[self.image_key])
                buf.append(self.transform(img))
            except Exception:
                continue
            if len(buf) == self.batch_size:
                yield dict(images=np.stack(buf),
                           image_mask=self.block_masker.batch(
                               self.batch_size))
                buf = []
