"""Frozen text encoder for text-conditioned generation.

Reimplements `mld/models/architectures/mld_clip.py:13-90` (MldTextEncoder):
a frozen CLIP text tower whose pooled `get_text_features` embedding
conditions the denoiser as a single (B, 1, 768) token. Weights are never
checkpointed (parity with the save/load stripping at
`mld/models/modeltype/base.py:124-155`).

Two backends:
  * transformers FlaxCLIPTextModelWithProjection when the pretrained weights
    are available on disk (zero-egress environments can't download them),
  * a deterministic hash-bucket embedder otherwise, so text-conditioned
    pipelines stay runnable end-to-end; clearly flagged via `.is_fallback`.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np


class ClipTextEncoder:
    def __init__(self, modelpath: Optional[str] = None, latent_dim: int = 768):
        self.latent_dim = latent_dim
        self.is_fallback = True
        self._model = None
        self._tokenizer = None
        if modelpath and os.path.isdir(modelpath):
            try:
                from transformers import (
                    AutoTokenizer,
                    FlaxCLIPTextModelWithProjection,
                )

                self._tokenizer = AutoTokenizer.from_pretrained(modelpath)
                self._model = FlaxCLIPTextModelWithProjection.from_pretrained(
                    modelpath
                )
                self.is_fallback = False
            except Exception:
                self._model = None

    def __call__(self, texts: List[str]) -> np.ndarray:
        """texts -> (B, 1, latent_dim) pooled embeddings."""
        if self._model is not None:
            tokens = self._tokenizer(
                texts, padding="max_length", truncation=True, max_length=77,
                return_tensors="np",
            )
            out = self._model(input_ids=tokens["input_ids"]).text_embeds
            return np.asarray(out)[:, None, :]
        return self._fallback(texts)

    def _fallback(self, texts: List[str]) -> np.ndarray:
        """Deterministic bag-of-hashed-words embedding: same caption -> same
        vector, shared words -> correlated vectors."""
        out = np.zeros((len(texts), 1, self.latent_dim), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                rng = np.random.RandomState(h % (2**32))
                out[i, 0] += rng.randn(self.latent_dim).astype(np.float32)
            n = max(len(t.split()), 1)
            out[i] /= np.sqrt(n)
        return out
