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

# VIP word classes (`word_vectorizer.py:22-44`): an in-vocab word appearing in
# one of these lists gets its POS one-hot remapped to the VIP class instead of
# the token's own POS tag, checked in dict order (Loc, Body, Obj, Act, Desc —
# first hit wins). The t2m evaluator was trained on this protocol, so skipping
# the remap shifts R-precision/Matching/FID on real assets.
VIP_DICT = {
    "Loc_VIP": (
        "left", "right", "clockwise", "counterclockwise", "anticlockwise",
        "forward", "back", "backward", "up", "down", "straight", "curve",
    ),
    "Body_VIP": (
        "arm", "chin", "foot", "feet", "face", "hand", "mouth", "leg",
        "waist", "eye", "knee", "shoulder", "thigh",
    ),
    "Obj_VIP": (
        "stair", "dumbbell", "chair", "window", "floor", "car", "ball",
        "handrail", "baseball", "basketball",
    ),
    "Act_VIP": (
        "walk", "run", "swing", "pick", "bring", "kick", "put", "squat",
        "throw", "hop", "dance", "jump", "turn", "stumble", "dance", "stop",
        "sit", "lift", "lower", "raise", "wash", "stand", "kneel", "stroll",
        "rub", "bend", "balance", "flap", "jog", "shuffle", "lean", "rotate",
        "spin", "spread", "climb",
    ),
    "Desc_VIP": (
        "slowly", "carefully", "fast", "careful", "slow", "quickly", "happy",
        "angry", "sad", "happily", "angrily", "sadly",
    ),
}
_WORD_TO_VIP = {}
for _cls, _words in VIP_DICT.items():
    for _w in _words:
        _WORD_TO_VIP.setdefault(_w, _cls)  # first class wins, like dict-order scan
del _cls, _words, _w


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
        """'word/POS' -> (word vector (300,), pos one-hot (15,)).

        Matches `word_vectorizer.py:66-80`: an in-vocab VIP word's POS
        one-hot is remapped to its VIP class; an out-of-vocab word maps to
        the 'unk' vector with pos forced to OTHER (regardless of its tag).
        """
        word, pos = item.split("/") if "/" in item else (item, "OTHER")
        in_vocab = self.is_fallback or word in self.word2idx
        if in_vocab:
            pos = _WORD_TO_VIP.get(word, pos)
        else:
            pos = "OTHER"
        pos_vec = np.zeros(POS_DIM, np.float32)
        pos_vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1.0
        if self.is_fallback:
            return self._hash_vec(word), pos_vec
        if word in self.word2idx:
            return self.word2vec[self.word2idx[word]].astype(np.float32), pos_vec
        return self.word2vec[self.word2idx.get("unk", 0)].astype(np.float32), pos_vec

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
