"""WordVectorizer contract tests (fallback path + VIP remap)."""

import numpy as np

from seeme_tpu.data.word_vectorizer import (
    POS_DIM,
    POS_ENUMERATOR,
    VIP_DICT,
    WORD_DIM,
    WordVectorizer,
)


def test_fallback_deterministic_and_pos_onehot():
    wv = WordVectorizer()
    assert wv.is_fallback
    v1, p1 = wv["walks/VERB"]
    v2, p2 = wv["walks/VERB"]
    np.testing.assert_array_equal(v1, v2)
    assert v1.shape == (WORD_DIM,) and p1.shape == (POS_DIM,)
    assert p1.sum() == 1.0 and p1[0] == 1.0  # VERB (non-VIP surface form) -> slot 0
    _, p_other = wv["zxqj/UNKNOWNTAG"]
    assert p_other[POS_DIM - 1] == 1.0  # OTHER


def test_vip_remap():
    """VIP words override their POS tag (`word_vectorizer.py:66-80`)."""
    wv = WordVectorizer()
    for cls, words in VIP_DICT.items():
        _, p = wv[f"{words[0]}/VERB"]
        assert p[POS_ENUMERATOR[cls]] == 1.0, (cls, words[0])
    # 'walk' is both an Act word and a plausible NOUN — VIP wins either way
    _, p = wv["walk/NOUN"]
    assert p[POS_ENUMERATOR["Act_VIP"]] == 1.0
    # non-VIP word keeps its own tag
    _, p = wv["person/NOUN"]
    assert p[POS_ENUMERATOR["NOUN"]] == 1.0


def test_tokens_to_arrays_sos_eos():
    wv = WordVectorizer()
    words, pos, n = wv.tokens_to_arrays(["a/DET", "person/NOUN", "walks/VERB"], max_text_len=5)
    assert words.shape == (7, WORD_DIM) and pos.shape == (7, POS_DIM)
    assert n == 5  # sos + 3 tokens + eos
    assert np.abs(words[5:]).sum() == 0.0  # padded rows zero
