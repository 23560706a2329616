"""Tokenizer construction (reference dataset/pretrain_dataset.py:35-57
build_tokenizer): select Bert/Roberta/XLMRoberta tokenizer by the
`text_encoder` path substring and expose bos/eos.

Offline-friendly: loads from a local directory (the reference also points at
local dirs like '../data/roberta-base'). For tests and air-gapped machines a
`SimpleTokenizer` provides the same interface over a word-level vocab.
"""
from __future__ import annotations

import os
import re
from typing import Sequence


def build_tokenizer(text_encoder: str):
    from transformers import (BertTokenizer, RobertaTokenizer,
                              XLMRobertaTokenizer)

    name = text_encoder.rstrip("/")
    if "xlm-roberta" in name:
        tok = XLMRobertaTokenizer.from_pretrained(name)
    elif "roberta" in name:
        tok = RobertaTokenizer.from_pretrained(name)
    elif "bert" in name:
        tok = BertTokenizer.from_pretrained(name)
    else:
        raise ValueError(f"cannot infer tokenizer family from {text_encoder}")
    # inject bos/eos aliases the reference relies on
    # (reference dataset/pretrain_dataset.py:44-57)
    if tok.bos_token is None:
        tok.bos_token = tok.cls_token
    if tok.eos_token is None:
        tok.eos_token = tok.sep_token
    return tok


class SimpleTokenizer:
    """Minimal word-level tokenizer with the HF surface the data layer uses
    (tokenize / convert_tokens_to_ids / get_vocab / special tokens). Used in
    tests and as an offline fallback."""

    SPECIALS = ["<pad>", "<s>", "</s>", "<mask>", "<unk>"]

    def __init__(self, vocab: Sequence[str] | None = None, use_roberta=True):
        words = list(vocab or [])
        self.itos = list(self.SPECIALS) + [w for w in words
                                           if w not in self.SPECIALS]
        self.stoi = {w: i for i, w in enumerate(self.itos)}
        self.pad_token, self.cls_token = "<pad>", "<s>"
        self.sep_token, self.mask_token = "</s>", "<mask>"
        self.unk_token = "<unk>"
        self.bos_token, self.eos_token = "<s>", "</s>"
        self.pad_token_id = 0
        self.cls_token_id = self.bos_token_id = 1
        self.sep_token_id = self.eos_token_id = 2
        self.mask_token_id = 3
        self.unk_token_id = 4
        self.use_roberta = use_roberta

    @classmethod
    def from_texts(cls, texts: Sequence[str], max_vocab: int = 30000):
        from collections import Counter

        counter = Counter()
        for t in texts:
            counter.update(cls._words(t))
        vocab = [w for w, _ in counter.most_common(max_vocab)]
        return cls(vocab)

    @staticmethod
    def _words(text: str):
        return re.findall(r"\w+|[^\w\s]", text.lower())

    @property
    def vocab_size(self):
        return len(self.itos)

    def get_vocab(self):
        return dict(self.stoi)

    def tokenize(self, text: str):
        return [w if w in self.stoi else self.unk_token
                for w in self._words(text)]

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self.stoi.get(tokens, self.unk_token_id)
        return [self.stoi.get(t, self.unk_token_id) for t in tokens]

    def convert_ids_to_tokens(self, ids):
        if isinstance(ids, int):
            return self.itos[ids]
        return [self.itos[i] for i in ids]

    def decode(self, ids, skip_special_tokens=True):
        toks = [self.itos[int(i)] for i in ids]
        if skip_special_tokens:
            toks = [t for t in toks if t not in self.SPECIALS]
        return " ".join(toks)

    def __call__(self, texts, max_length=30, padding="max_length",
                 truncation=True, return_tensors=None):
        import numpy as np

        single = isinstance(texts, str)
        if single:
            texts = [texts]
        ids, atts = [], []
        for t in texts:
            tok = [self.cls_token] + self.tokenize(t)
            tok = tok[: max_length - 1] + [self.sep_token]
            i = self.convert_tokens_to_ids(tok)
            a = [1] * len(i)
            while len(i) < max_length:
                i.append(self.pad_token_id)
                a.append(0)
            ids.append(i)
            atts.append(a)
        out = {"input_ids": np.asarray(ids, np.int32),
               "attention_mask": np.asarray(atts, np.int32)}
        return out
