"""Fine-tune datasets (reference dataset/retrieval_dataset.py,
nlvr_dataset.py, vqa_dataset.py, captioning_dataset.py, grounding_dataset.py).

Map-style json annotation lists → fixed-shape numpy batches. Annotation
formats are the reference's (COCO-Karpathy json etc.).
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np

from .pretrain_data import pre_caption
from .transforms import decode_image


def _load_ann(files):
    if isinstance(files, str):
        files = [files]
    ann = []
    for f in files:
        with open(f) as fh:
            ann += json.load(fh)
    return ann


def _encode_texts(tokenizer, texts, max_tokens):
    """cls + tokens + eos, padded (same recipe as TextPreprocessor.encode)."""
    ids, atts = [], []
    for t in texts:
        toks = ([tokenizer.cls_token]
                + tokenizer.tokenize(t)[: max_tokens - 2]
                + [tokenizer.sep_token])
        i = tokenizer.convert_tokens_to_ids(toks)
        pad = max_tokens - len(i)
        ids.append(i + [tokenizer.pad_token_id] * pad)
        atts.append([1] * len(i) + [0] * pad)
    return np.asarray(ids, np.int32), np.asarray(atts, np.int32)


class RetrievalTrainData:
    """(reference re_train_dataset:21-51): image-caption pairs with dense
    image ids for the idx-aware ITC/ITM losses."""

    def __init__(self, ann_file, transform, image_root, tokenizer,
                 max_words=30, max_tokens=30, batch_size=32, seed=0):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.tok = tokenizer
        self.max_words, self.max_tokens = max_words, max_tokens
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        ids = {}
        for a in self.ann:
            ids.setdefault(a["image_id"], len(ids))
        self.img_ids = ids

    def __len__(self):
        return len(self.ann)

    def epoch(self, epoch_seed=0) -> Iterator[dict]:
        order = np.arange(len(self.ann))
        np.random.default_rng(epoch_seed).shuffle(order)
        buf_img, buf_cap, buf_idx = [], [], []
        for i in order:
            a = self.ann[int(i)]
            img = decode_image(os.path.join(self.image_root, a["image"]))
            buf_img.append(self.transform(img))
            buf_cap.append(pre_caption(a["caption"], self.max_words))
            buf_idx.append(self.img_ids[a["image_id"]])
            if len(buf_img) == self.batch_size:
                ids, atts = _encode_texts(self.tok, buf_cap, self.max_tokens)
                yield dict(images=np.stack(buf_img), text_ids=ids,
                           text_atts=atts,
                           idx=np.asarray(buf_idx, np.int32))
                buf_img, buf_cap, buf_idx = [], [], []


class RetrievalEvalData:
    """(reference re_eval_dataset:54-85): all images + all captions with
    img2txt/txt2img ground truth for R@K."""

    def __init__(self, ann_file, transform, image_root, tokenizer,
                 max_words=30, max_tokens=30):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.tok = tokenizer
        self.max_words, self.max_tokens = max_words, max_tokens
        self.text, self.img2txt, self.txt2img = [], {}, {}
        t = 0
        for img_id, a in enumerate(self.ann):
            self.img2txt[img_id] = []
            caps = a["caption"] if isinstance(a["caption"], list) \
                else [a["caption"]]
            for c in caps:
                self.text.append(pre_caption(c, max_words))
                self.img2txt[img_id].append(t)
                self.txt2img[t] = img_id
                t += 1

    @property
    def num_images(self):
        return len(self.ann)

    def image_batches(self, batch_size) -> Iterator[np.ndarray]:
        buf = []
        for a in self.ann:
            img = decode_image(os.path.join(self.image_root, a["image"]))
            buf.append(self.transform(img))
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)

    def text_batches(self, batch_size) -> Iterator[tuple]:
        for s in range(0, len(self.text), batch_size):
            chunk = self.text[s:s + batch_size]
            yield _encode_texts(self.tok, chunk, self.max_tokens)


class NLVRData:
    """(reference nlvr_dataset:26-49): two images + sentence + bool label."""

    def __init__(self, ann_file, transform, image_root, tokenizer,
                 max_tokens=40, batch_size=16, train=True, seed=0):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.tok = tokenizer
        self.max_tokens = max_tokens
        self.batch_size = batch_size
        self.train = train
        self.seed = seed

    def __len__(self):
        return len(self.ann)

    def epoch(self, epoch_seed=0) -> Iterator[dict]:
        order = np.arange(len(self.ann))
        if self.train:
            np.random.default_rng(epoch_seed).shuffle(order)
        buf0, buf1, caps, labels = [], [], [], []
        for i in order:
            a = self.ann[int(i)]
            img0 = decode_image(os.path.join(self.image_root, a["images"][0]))
            img1 = decode_image(os.path.join(self.image_root, a["images"][1]))
            buf0.append(self.transform(img0))
            buf1.append(self.transform(img1))
            caps.append(pre_caption(a["sentence"], 50))
            labels.append(1 if str(a["label"]).lower() == "true" else 0)
            if len(buf0) == self.batch_size:
                yield self._pack(buf0, buf1, caps, labels)
                buf0, buf1, caps, labels = [], [], [], []
        if buf0 and not self.train:
            yield self._pack(buf0, buf1, caps, labels)

    def _pack(self, buf0, buf1, caps, labels):
        ids, atts = _encode_texts(self.tok, caps, self.max_tokens)
        # concat-batched 2B images (reference models/model_nlvr.py:30)
        images = np.concatenate([np.stack(buf0), np.stack(buf1)], axis=0)
        return dict(images=images, text_ids=ids, text_atts=atts,
                    targets=np.asarray(labels, np.int32))


class VQAData:
    """(reference vqa_dataset): train yields flat weighted answers
    (reference dataset/__init__.py:202-210 vqa_collate_fn semantics made
    fixed-shape via max_answers), test yields question + question_id."""

    def __init__(self, ann_file, transform, image_roots, tokenizer,
                 max_tokens=40, answer_max_tokens=10, batch_size=16,
                 split="train", answer_list=None, max_answers=4, seed=0):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_roots = image_roots  # {"vqa": ..., "vg": ...}
        self.tok = tokenizer
        self.max_tokens = max_tokens
        self.answer_max_tokens = answer_max_tokens
        self.batch_size = batch_size
        self.split = split
        self.max_answers = max_answers
        self.seed = seed
        self.answer_list = None
        if answer_list:
            with open(answer_list) as f:
                self.answer_list = json.load(f)

    def __len__(self):
        return len(self.ann)

    def _image_path(self, a):
        root = self.image_roots.get(a.get("dataset", "vqa"),
                                    list(self.image_roots.values())[0])
        return os.path.join(root, a["image"])

    def encode_answer_list(self):
        texts = [a + " " + self.tok.sep_token for a in self.answer_list]
        ids, atts = _encode_texts(self.tok, self.answer_list,
                                  self.answer_max_tokens)
        return ids, atts

    @staticmethod
    def _swap_left_right(text: str) -> str:
        out = []
        for w in text.split():
            out.append("right" if w == "left"
                       else "left" if w == "right" else w)
        return " ".join(out)

    def epoch(self, epoch_seed=0) -> Iterator[dict]:
        order = np.arange(len(self.ann))
        rng = np.random.default_rng(epoch_seed)
        if self.split == "train":
            rng.shuffle(order)
        imgs, qs, ans_rows, qid_rows = [], [], [], []
        for i in order:
            a = self.ann[int(i)]
            img = self.transform(decode_image(self._image_path(a)))
            question = pre_caption(a["question"], 30)
            # careful hflip: flip image + swap left/right words
            # (reference dataset/vqa_dataset.py:48-66)
            if self.split == "train" and rng.random() < 0.5:
                img = img[:, ::-1, :].copy()
                question = self._swap_left_right(question)
                if "answer" in a and isinstance(a["answer"], list):
                    a = dict(a, answer=[self._swap_left_right(x)
                                        for x in a["answer"]])
            imgs.append(img)
            qs.append(question)
            if self.split == "train":
                if a.get("dataset") == "vg":
                    answers, weights = [a["answer"]], [0.5]
                else:
                    uniq = {}
                    for ans in a["answer"]:
                        uniq[ans] = uniq.get(ans, 0) + 1
                    answers = list(uniq.keys())
                    weights = [c / len(a["answer"]) for c in uniq.values()]
                ans_rows.append(list(zip(answers, weights)))
            else:
                qid_rows.append(a["question_id"])
            if len(imgs) == self.batch_size:
                yield self._pack(imgs, qs, ans_rows, qid_rows)
                imgs, qs, ans_rows, qid_rows = [], [], [], []
        if imgs and self.split != "train":
            yield self._pack(imgs, qs, ans_rows, qid_rows)

    def _pack(self, imgs, qs, ans_rows, qid_rows):
        q_ids, q_atts = _encode_texts(self.tok, qs, self.max_tokens)
        out = dict(images=np.stack(imgs), q_ids=q_ids, q_atts=q_atts)
        if self.split == "train":
            # fixed shape: batch * max_answers flat answers, weight 0 pads
            B, K = len(imgs), self.max_answers
            texts, weights, ques_idx = [], [], []
            for b, rows in enumerate(ans_rows):
                rows = rows[:K]
                for t, w in rows:
                    texts.append(t)
                    weights.append(w)
                    ques_idx.append(b)
                for _ in range(K - len(rows)):
                    texts.append("")
                    weights.append(0.0)
                    ques_idx.append(b)
            ids, atts = _encode_texts(self.tok, texts,
                                      self.answer_max_tokens)
            out.update(answer_ids=ids, answer_atts=atts,
                       weights=np.asarray(weights, np.float32),
                       ques_idx=np.asarray(ques_idx, np.int32))
        else:
            out["question_id"] = np.asarray(qid_rows)
        return out


class CaptioningData:
    """(reference captioning_dataset.py): COCO-Karpathy captions.
    Train: image + prompt-prefixed caption; eval: image + image_id."""

    def __init__(self, ann_file, transform, image_root, tokenizer,
                 max_tokens=30, batch_size=16, train=True, prompt="",
                 seed=0):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.tok = tokenizer
        self.max_tokens = max_tokens
        self.batch_size = batch_size
        self.train = train
        self.prompt = prompt

    def __len__(self):
        return len(self.ann)

    def epoch(self, epoch_seed=0) -> Iterator[dict]:
        order = np.arange(len(self.ann))
        if self.train:
            np.random.default_rng(epoch_seed).shuffle(order)
        imgs, caps, img_ids = [], [], []
        for i in order:
            a = self.ann[int(i)]
            imgs.append(self.transform(decode_image(
                os.path.join(self.image_root, a["image"]))))
            iid = a.get("image_id")
            if iid is None:
                iid = int(a["image"].split("_")[-1].split(".")[0])
            img_ids.append(int(str(iid).split("_")[-1]) if
                           isinstance(iid, str) else iid)
            if self.train:
                caps.append(self.prompt + pre_caption(a["caption"], 30))
            if len(imgs) == self.batch_size:
                yield self._pack(imgs, caps, img_ids)
                imgs, caps, img_ids = [], [], []
        if imgs and not self.train:
            yield self._pack(imgs, caps, img_ids)

    def _pack(self, imgs, caps, img_ids):
        out = dict(images=np.stack(imgs), image_id=np.asarray(img_ids))
        if self.train:
            ids, atts = _encode_texts(self.tok, caps, self.max_tokens)
            out.update(text_ids=ids, text_atts=atts)
        return out


class GroundingData:
    """(reference grounding_dataset.py bbox mode): region phrase + target
    cxcywh box normalized to [0,1]."""

    def __init__(self, ann_file, transform, image_root, tokenizer,
                 max_tokens=30, batch_size=16, train=True, seed=0):
        self.ann = _load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.tok = tokenizer
        self.max_tokens = max_tokens
        self.batch_size = batch_size
        self.train = train

    def __len__(self):
        return len(self.ann)

    def epoch(self, epoch_seed=0) -> Iterator[dict]:
        order = np.arange(len(self.ann))
        if self.train:
            np.random.default_rng(epoch_seed).shuffle(order)
        imgs, texts, boxes, ref_ids = [], [], [], []
        for i in order:
            a = self.ann[int(i)]
            img = decode_image(os.path.join(self.image_root, a["image"]))
            W, H = img.size
            imgs.append(self.transform(img))
            texts.append(pre_caption(a["text"], 30))
            # weakly-supervised annotations carry candidate `boxes` instead
            # of a single gt `bbox` — keep a dummy target then
            x, y, w, h = a.get("bbox", (0, 0, 1, 1))
            boxes.append([(x + w / 2) / W, (y + h / 2) / H, w / W, h / H])
            ref_ids.append(a.get("ref_id", 0))
            if len(imgs) == self.batch_size:
                yield self._pack(imgs, texts, boxes, ref_ids)
                imgs, texts, boxes, ref_ids = [], [], [], []
        if imgs and not self.train:
            yield self._pack(imgs, texts, boxes, ref_ids)

    def _pack(self, imgs, texts, boxes, ref_ids):
        ids, atts = _encode_texts(self.tok, texts, self.max_tokens)
        return dict(images=np.stack(imgs), text_ids=ids, text_atts=atts,
                    target_bbox=np.asarray(boxes, np.float32),
                    ref_id=np.asarray(ref_ids))
