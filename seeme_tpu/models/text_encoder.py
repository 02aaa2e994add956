"""Frozen text encoder for text-conditioned generation.

Reimplements `mld/models/architectures/mld_clip.py:13-90` (MldTextEncoder)
with all three reference modes, selected exactly like the reference — by the
model path plus the `last_hidden_state` flag (`mld_clip.py:38-48`):

  * "clip"        — pooled `get_text_features` embedding, one (B, 1, D) token;
  * "clip_hidden" — the CLIP text tower's last hidden state, (B, 77, D)
                    token sequence (`mld_clip.py:79-82`);
  * "bert"        — a BERT-family encoder's last hidden state
                    (`mld_clip.py:83-86`; the shipped asset is
                    distilbert-base-uncased, `configs/assets.yaml:32`).
                    The reference pads dynamically per batch; here sequences
                    pad to a fixed `max_length` so downstream jits keep
                    static shapes.

Weights are never checkpointed (parity with the save/load stripping at
`mld/models/modeltype/base.py:124-155`).

Each mode has two backends: the transformers Flax model when the pretrained
weights are available on disk (zero-egress environments can't download them),
and a deterministic hash-bucket embedder otherwise, so text-conditioned
pipelines stay runnable end-to-end; clearly flagged via `.is_fallback`.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np


def _hashed_word_vector(word: str, dim: int) -> np.ndarray:
    h = int(hashlib.md5(word.encode()).hexdigest(), 16)
    rng = np.random.RandomState(h % (2**32))
    return rng.randn(dim).astype(np.float32)


class ClipTextEncoder:
    def __init__(self, modelpath: Optional[str] = None, latent_dim: int = 768,
                 last_hidden_state: bool = False, max_length: int = 77):
        self.latent_dim = latent_dim
        self.max_length = max_length
        self.is_fallback = True
        self._model = None
        self._tokenizer = None
        # mode resolution mirrors `mld_clip.py:38-48`: 'clip' checked first,
        # then 'bert', anything else rejected (a typo'd path must not fall
        # through to the hash fallback in silently-assumed clip mode). The
        # substring test runs on the FULL path like the reference — real
        # asset layouts are e.g. deps/clip/ViT-L-14, whose basename alone
        # contains neither token.
        path = (modelpath or "").lower()
        if not path or "clip" in path:
            self.name = "clip_hidden" if last_hidden_state else "clip"
        elif "bert" in path:
            self.name = "bert"
        else:
            raise ValueError(
                f"text encoder model {modelpath!r} not supported "
                "(expected a clip or bert asset, `mld_clip.py:38-48`)")
        if modelpath and os.path.isdir(modelpath):
            try:
                from transformers import AutoTokenizer

                self._tokenizer = AutoTokenizer.from_pretrained(modelpath)
                if self.name == "bert":
                    from transformers import FlaxAutoModel

                    self._model = FlaxAutoModel.from_pretrained(modelpath)
                    self.max_length = min(
                        max_length, self._tokenizer.model_max_length)
                else:
                    from transformers import FlaxCLIPTextModelWithProjection

                    self._model = FlaxCLIPTextModelWithProjection.from_pretrained(
                        modelpath
                    )
                self.is_fallback = False
            except Exception:
                # drop BOTH halves: a live tokenizer with a dead model would
                # produce token_mask positions misaligned with the hashed
                # fallback embeddings
                self._model = None
                self._tokenizer = None

    def __call__(self, texts: List[str]) -> np.ndarray:
        """texts -> (B, 1, D) pooled ("clip") or (B, max_length, D) token
        embeddings ("clip_hidden"/"bert")."""
        if self._model is not None:
            tokens = self._tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            if self.name == "bert":
                out = self._model(**tokens).last_hidden_state
                # zero padded positions so fixed-shape padding is inert
                out = out * tokens["attention_mask"][..., None]
                return np.asarray(out, np.float32)
            out = self._model(input_ids=tokens["input_ids"])
            if self.name == "clip_hidden":
                return np.asarray(out.last_hidden_state, np.float32)
            return np.asarray(out.text_embeds)[:, None, :]
        return self._fallback(texts)

    def token_mask(self, texts: List[str]) -> Optional[np.ndarray]:
        """(B, max_length) bool validity mask for the hidden-state modes —
        downstream attention excludes fixed-length padding instead of merely
        receiving zeroed tokens (the reference pads only to the longest
        caption in the batch). None for the pooled 'clip' mode."""
        if self.name == "clip":
            return None
        if self._tokenizer is not None:
            tokens = self._tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            return tokens["attention_mask"].astype(bool)
        mask = np.zeros((len(texts), self.max_length), bool)
        for i, t in enumerate(texts):
            mask[i, : max(min(len(t.split()), self.max_length), 1)] = True
        return mask

    def _fallback(self, texts: List[str]) -> np.ndarray:
        """Deterministic hashed-word embeddings: same caption -> same output,
        shared words -> correlated outputs. Pooled modes sum words into one
        token; hidden-state modes place each word at its position."""
        if self.name == "clip":
            out = np.zeros((len(texts), 1, self.latent_dim), np.float32)
            for i, t in enumerate(texts):
                for w in t.lower().split():
                    out[i, 0] += _hashed_word_vector(w, self.latent_dim)
                out[i] /= np.sqrt(max(len(t.split()), 1))
            return out
        out = np.zeros((len(texts), self.max_length, self.latent_dim),
                       np.float32)
        for i, t in enumerate(texts):
            for p, w in enumerate(t.lower().split()[: self.max_length]):
                out[i, p] = _hashed_word_vector(w, self.latent_dim)
        return out
