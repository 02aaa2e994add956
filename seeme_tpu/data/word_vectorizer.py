"""GloVe word vectorizer for the T2M evaluator pipeline.

Reimplements `mld/data/humanml/utils/word_vectorizer.py:46`: loads the
GloVe word matrix + vocab pickles (`{path}/{prefix}_data.npy`,
`{prefix}_words.pkl`, `{prefix}_idx.pkl`) and maps `word/POS` tokens to
(word_vec (300,), pos_onehot (15,)) pairs, with the same POS-tag one-hot
enumeration. A deterministic hash embedding stands in when the GloVe
assets are absent (zero-egress environments), flagged via `.is_fallback`.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import List, Tuple

import numpy as np

POS_ENUMERATOR = {
    "VERB": 0, "NOUN": 1, "DET": 2, "ADP": 3, "NUM": 4, "AUX": 5,
    "PRON": 6, "ADJ": 7, "ADV": 8, "Loc_VIP": 9, "Body_VIP": 10,
    "Obj_VIP": 11, "Act_VIP": 12, "Desc_VIP": 13, "OTHER": 14,
}
WORD_DIM = 300
POS_DIM = len(POS_ENUMERATOR)


class WordVectorizer:
    def __init__(self, meta_root: str | None = None, prefix: str = "our_vab"):
        self.is_fallback = True
        if meta_root and os.path.exists(os.path.join(meta_root, f"{prefix}_data.npy")):
            self.word2vec = np.load(os.path.join(meta_root, f"{prefix}_data.npy"))
            with open(os.path.join(meta_root, f"{prefix}_words.pkl"), "rb") as f:
                words = pickle.load(f)
            with open(os.path.join(meta_root, f"{prefix}_idx.pkl"), "rb") as f:
                self.word2idx = pickle.load(f)
            del words
            self.is_fallback = False

    def _hash_vec(self, word: str) -> np.ndarray:
        h = int(hashlib.md5(word.encode()).hexdigest(), 16)
        rng = np.random.RandomState(h % (2**32))
        return rng.randn(WORD_DIM).astype(np.float32) / np.sqrt(WORD_DIM)

    def __getitem__(self, item: str) -> Tuple[np.ndarray, np.ndarray]:
        """'word/POS' -> (word vector (300,), pos one-hot (15,))."""
        word, pos = item.split("/") if "/" in item else (item, "OTHER")
        pos_vec = np.zeros(POS_DIM, np.float32)
        pos_vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1.0
        if not self.is_fallback and word in self.word2idx:
            return self.word2vec[self.word2idx[word]].astype(np.float32), pos_vec
        if not self.is_fallback:
            return self.word2vec[self.word2idx.get("unk", 0)].astype(np.float32), pos_vec
        return self._hash_vec(word), pos_vec

    def tokens_to_arrays(self, tokens: List[str], max_text_len: int = 20):
        """Caption tokens -> padded (word_embs, pos_onehots, length) with the
        reference's sos/eos convention (`dataset.py:300-320`)."""
        tokens = tokens[:max_text_len]
        tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
        n = len(tokens)
        words = np.zeros((max_text_len + 2, WORD_DIM), np.float32)
        pos = np.zeros((max_text_len + 2, POS_DIM), np.float32)
        for i, t in enumerate(tokens):
            words[i], pos[i] = self[t]
        return words, pos, np.int32(n)
