"""End-to-end recognition parity against the reference's golden report
(/root/reference/test/test/result/hmm-result.txt).

The golden run paired words.txt entries with mean_list.txt entries BY ORDER
(the lists disagree at positions 7/8 — vc_220_f_03 vs vc_220_f_047 are
swapped), scored with the full-covariance total-probability recognizer, and
ranked with the NaN-frozen bubble sort.  Expected: every utterance "won" by
vocabulary word 0 (vc_186...), total 1/13 correct, 1 second-candidate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srhmm_tpu.decode.scorer import (
    rank,
    rank_c_parity,
    score_vocab_log,
    score_vocab_parity,
)
from srhmm_tpu.io import read_list, read_perfil, read_vocabulary
from srhmm_tpu.models import stack_models

# trainer-reported mean probability per word (train/test/result/*.txt) —
# equals the model's own-utterance score.
TRAIN_TXT_SCORES = {
    "vc_186_f_03_ap_0225": -7928.721460,
    "vc_200_f_02_ap_015": -6963.850315,
    "vc_200_f_02_ap_030": -9151.048679,
    "vc_200_f_04_ap_015": -6317.041150,
    "vc_200_f_04_ap_030": -6523.986228,
    "vc_220_f_013_ap_0225": -8420.334517,
    "vc_220_f_03_ap_010": -5870.952684,
    "vc_220_f_047_ap_0225": -5216.276072,
    "vc_240_f_02_ap_015": -6921.013202,
    "vc_240_f_02_ap_030": -8122.970527,
    "vc_240_f_04_ap_015": -4790.643566,
    "vc_240_f_04_ap_030": -5047.768681,
    "vc_254_f_03_ap_0225": -4805.090203,
}


@pytest.fixture(scope="module")
def setup(reference_root):
    base = reference_root / "test" / "test"
    vocab = stack_models(
        read_vocabulary(base / "models" / "models.txt", relative_to=base.parent)
    )
    spoken = read_list(base / "words.txt")
    perfils = [
        read_perfil(base.parent / p.lstrip("./"))
        for p in read_list(base / "perfil_data" / "mean_list.txt")
    ]
    return vocab, spoken, perfils


def test_golden_report_parity(setup):
    """Reproduce hmm-result.txt decisions exactly."""
    vocab, spoken, perfils = setup
    words = list(vocab.word)
    correct = second = 0
    for sw, frames in zip(spoken, perfils):
        s = np.asarray(score_vocab_parity(vocab, (frames,), mode="total"))
        idx = rank_c_parity(s)
        win = words[idx[0]]
        assert win == "vc_186_f_03_ap_0225"  # the NaN-frozen identity winner
        if win == sw:
            correct += 1
        else:
            if words[idx[1]] == sw:
                second += 1
    assert correct == 1
    assert second == 1


def test_own_model_scores_match_trainer_txt(setup):
    """Each utterance scored against its own model reproduces the mean
    probability recorded in train/test/result/*.txt to reporting precision."""
    vocab, spoken, perfils = setup
    words = list(vocab.word)
    for sw, frames in zip(spoken, perfils):
        s = np.asarray(score_vocab_parity(vocab, (frames,), mode="total"))
        # the perfil list order pairs utterance k with word list order, except
        # the 03/047 swap — score against the *utterance's* own model:
        # identify it as the unique finite score.
        finite = np.isfinite(s)
        assert finite.sum() == 1, (sw, s)
        k = int(np.argmax(finite))
        np.testing.assert_allclose(s[k], TRAIN_TXT_SCORES[words[k]], atol=5e-6)


def test_sane_ranking_beats_reference(setup):
    """Fresh decisions (NaN-last ranking) score 11/13 — the two 'misses' are
    the list-order swap, where the utterance really does match the swapped
    word's model.  This is the sanity check from SURVEY §6."""
    vocab, spoken, perfils = setup
    words = list(vocab.word)
    wins = []
    for sw, frames in zip(spoken, perfils):
        s = np.asarray(score_vocab_parity(vocab, (frames,), mode="total"))
        wins.append(words[rank(s)[0]] == sw)
    assert sum(wins) == 11


def test_log_path_agrees_where_finite(setup):
    """The log-space fast path must agree with the parity path wherever the
    probability domain did not underflow."""
    vocab, spoken, perfils = setup
    for frames in perfils[:4]:
        sp = np.asarray(score_vocab_parity(vocab, (frames,), mode="total"))
        sl = np.asarray(
            score_vocab_log(vocab, (jnp.asarray(frames),), mode="total")
        )
        m = np.isfinite(sp)
        np.testing.assert_allclose(sl[m], sp[m], rtol=1e-9)
        # log path is NaN-free: underflowed words get finite very-negative
        # or -inf scores, never NaN
        assert not np.isnan(sl).any()


def test_final_state_mode(setup):
    """R2's final-state scoring runs and yields scores <= total-prob scores."""
    vocab, spoken, perfils = setup
    frames = perfils[0]
    st = np.asarray(score_vocab_log(vocab, (jnp.asarray(frames),), mode="total"))
    sf = np.asarray(score_vocab_log(vocab, (jnp.asarray(frames),), mode="final"))
    assert (sf <= st + 1e-9).all()
