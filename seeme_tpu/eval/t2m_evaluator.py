"""The pretrained text/motion co-embedding evaluator for TM2T metrics.

Wraps the three t2m evaluator networks (`t2m_textenc.py:6-48`,
`t2m_motionenc.py:6-62`) behind the embedding protocol of the reference's
`t2m_eval` (`mld.py:1955-1995`): captions -> TextEncoderBiGRUCo over GloVe
word vectors + POS one-hots; motions -> MovementConvEncoder over
feats[..., :-4] -> MotionEncoderBiGRUCo with lengths // unit_len. The
embeddings feed TM2TMetrics (R-precision / Matching / FID / Diversity).

Unlike the torch pipeline there is no sort-by-length / pack_padded step —
the masked BiGRU handles ragged lengths directly, so caption/motion rows
stay aligned.

Weights come from `tools/convert_checkpoint.py --kind t2m_text /
t2m_motion / t2m_move` applied to the released `t2m/text_mot_match`
checkpoints; without them the modules run randomly initialized (exercises
the protocol on synthetic data, numbers are not comparable)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.word_vectorizer import WordVectorizer
from ..nn.gru import MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo

__all__ = ["T2MEvaluator"]


class T2MEvaluator:
    def __init__(
        self,
        nfeats: int = 263,
        unit_len: int = 4,
        max_text_len: int = 20,
        ckpt_dir: Optional[str] = None,
        glove_root: Optional[str] = None,
        # network widths (released text_mot_match defaults; overridable so
        # non-standard checkpoints — e.g. the preflight end-to-end harness's
        # fabricated tiny trio — load into matching modules)
        word_size: int = 300,
        pos_size: int = 15,
        text_hidden: int = 512,
        move_hidden: int = 512,
        move_out: int = 512,
        motion_hidden: int = 1024,
        output_size: int = 512,
    ):
        self.unit_len = unit_len
        self.max_text_len = max_text_len
        self.vectorizer = WordVectorizer(glove_root)
        self.text_enc = TextEncoderBiGRUCo(
            word_size=word_size, pos_size=pos_size, hidden_size=text_hidden,
            output_size=output_size)
        self.move_enc = MovementConvEncoder(
            hidden_size=move_hidden, output_size=move_out)
        self.motion_enc = MotionEncoderBiGRUCo(
            input_size=move_out, hidden_size=motion_hidden,
            output_size=output_size)

        r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
        self.text_params = self.text_enc.init(
            r1,
            jnp.zeros((1, max_text_len + 2, word_size)),
            jnp.zeros((1, max_text_len + 2, pos_size)),
            jnp.ones((1,), jnp.int32),
        )
        self.move_params = self.move_enc.init(r2, jnp.zeros((1, 8, nfeats - 4)))
        self.motion_params = self.motion_enc.init(
            r3, jnp.zeros((1, 4, move_out)), jnp.ones((1,), jnp.int32)
        )
        self.is_pretrained = False
        if ckpt_dir:
            from ..train.checkpoint import restore_params

            loaded = 0
            for attr, sub in (("text_params", "text"), ("move_params", "move"),
                              ("motion_params", "motion")):
                p = os.path.join(ckpt_dir, sub)
                if os.path.exists(p):
                    setattr(self, attr, restore_params(p, getattr(self, attr)))
                    loaded += 1
            self.is_pretrained = loaded == 3

        self._embed_motion = jax.jit(self._embed_motion_impl)
        self._embed_text = jax.jit(self._embed_text_impl)

    # ------------------------------------------------------------- motions
    def _embed_motion_impl(self, feats: jnp.ndarray, lengths: jnp.ndarray):
        mov = self.move_enc.apply(self.move_params, feats[..., :-4])
        return self.motion_enc.apply(
            self.motion_params, mov, lengths // self.unit_len
        )

    def embed_motion(self, feats, lengths) -> np.ndarray:
        """(B, T, nfeats) renormed-for-t2m features -> (B, 512)."""
        return np.asarray(
            self._embed_motion(jnp.asarray(feats), jnp.asarray(lengths))
        )

    # --------------------------------------------------------------- texts
    def _embed_text_impl(self, words: jnp.ndarray, pos: jnp.ndarray,
                         cap_lens: jnp.ndarray):
        return self.text_enc.apply(self.text_params, words, pos, cap_lens)

    def embed_text(self, texts: List[str]) -> np.ndarray:
        """Captions (whitespace-tokenized, 'word/POS' tokens honored)
        -> (B, 512)."""
        words, pos, lens = [], [], []
        for t in texts:
            w, p, n = self.vectorizer.tokens_to_arrays(
                t.split(), self.max_text_len
            )
            words.append(w)
            pos.append(p)
            lens.append(n)
        return np.asarray(self._embed_text(
            jnp.asarray(np.stack(words)), jnp.asarray(np.stack(pos)),
            jnp.asarray(np.asarray(lens)),
        ))
