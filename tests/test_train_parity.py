"""Training parity: cold-start LBG init + Baum-Welch EM must reproduce the
committed reference models (train/test/result/*.hmm and *.txt).

Each fixture model was trained from a single exemplar (its own .perfil), so
the whole chain — segmentation init, covariance init with LDL^T inversion,
scaled forward/backward EM, floors/repairs, convergence test — is exercised
deterministically.  Expected: identical iteration counts, mean probability to
reporting precision, parameters to ~1e-8 relative (summation-order ULPs).
"""

import re

import numpy as np
import pytest

from srhmm_tpu.init.lbg import create_initial_model
from srhmm_tpu.io import read_hmm, read_perfil, write_hmm
from srhmm_tpu.train.em_parity import train_word_parity

# all 13 fixture words with the golden iteration counts from
# /root/reference/train/test/result/*.txt
WORDS = [
    ("vc_186_f_03_ap_0225", 3),
    ("vc_200_f_02_ap_015", 5),
    ("vc_200_f_02_ap_030", 4),
    ("vc_200_f_04_ap_015", 3),
    ("vc_200_f_04_ap_030", 4),
    ("vc_220_f_013_ap_0225", 5),
    ("vc_220_f_03_ap_010", 3),
    ("vc_220_f_047_ap_0225", 3),
    ("vc_240_f_02_ap_015", 6),
    ("vc_240_f_02_ap_030", 3),
    ("vc_240_f_04_ap_015", 3),
    ("vc_240_f_04_ap_030", 3),
    ("vc_254_f_03_ap_0225", 5),
]


@pytest.mark.parametrize("word,want_iters", WORDS)
def test_train_matches_reference(reference_root, word, want_iters, tmp_path):
    base = reference_root / "train" / "test"
    txt = (base / "result" / f"mean_{word}.txt").read_text()
    want_prob = float(re.search(r"mean probability: (\S+)", txt).group(1))
    assert want_iters == int(re.search(r"number of iterations: (\d+)", txt).group(1))

    frames = read_perfil(base / "perfil_data" / f"mean_{word}.perfil")
    init = create_initial_model([[frames]], 6, [1], word=word, cov_type="full")
    res = train_word_parity([[frames]], init)

    assert res.iterations == want_iters
    assert res.exemplar_count == 1
    np.testing.assert_allclose(res.mean_log_prob, want_prob, atol=5e-6)

    gold = read_hmm(base / "result" / f"mean_{word}.hmm")
    for got, want in [
        (res.model.trans, gold.trans),
        (res.model.streams[0].weights, gold.streams[0].weights),
        (res.model.streams[0].means, gold.streams[0].means),
        (res.model.streams[0].inv_cov, gold.streams[0].inv_cov),
        (res.model.streams[0].det, gold.streams[0].det),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-12
        )

    # round-trip the trained model through the binary codec
    out = tmp_path / f"{word}.hmm"
    write_hmm(out, res.model)
    back = read_hmm(out)
    np.testing.assert_array_equal(
        np.asarray(back.streams[0].inv_cov), np.asarray(res.model.streams[0].inv_cov)
    )


def test_monotone_em_improvement(reference_root):
    """Log-likelihood is non-decreasing across EM iterations (Baum-Welch
    guarantee; also implicitly checked by the reference's convergence)."""
    base = reference_root / "train" / "test"
    frames = read_perfil(base / "perfil_data" / "mean_vc_186_f_03_ap_0225.perfil")
    init = create_initial_model([[frames]], 6, [1], cov_type="full")
    res = train_word_parity([[frames]], init)
    h = res.log_prob_history
    assert all(h[i + 1] >= h[i] - 1e-9 for i in range(len(h) - 1))


def test_warm_start(reference_root):
    """Warm-starting from a converged model converges immediately (the
    reference's initial_model path, minus its argv[argc] bug, T1:202-208)."""
    base = reference_root / "train" / "test"
    frames = read_perfil(base / "perfil_data" / "mean_vc_186_f_03_ap_0225.perfil")
    gold = read_hmm(base / "result" / "mean_vc_186_f_03_ap_0225.hmm")
    res = train_word_parity([[frames]], gold)
    assert res.iterations == 2  # one scoring pass + the convergence pass
    np.testing.assert_allclose(res.mean_log_prob, -7928.721460, atol=5e-6)


def test_diag_covariance_training(reference_root):
    """The diagonal-covariance trainer variant (hmm-fs/hmm_continuous_fs.c)
    trains to convergence and its model scores its own exemplar sensibly."""
    base = reference_root / "train" / "test"
    frames = read_perfil(base / "perfil_data" / "mean_vc_186_f_03_ap_0225.perfil")
    init = create_initial_model([[frames]], 6, [1], cov_type="diag")
    res = train_word_parity([[frames]], init)
    assert 2 <= res.iterations <= 50
    assert np.isfinite(res.mean_log_prob)
    assert res.model.streams[0].inv_cov.shape == (6, 1, 9)
    h = res.log_prob_history
    assert all(h[i + 1] >= h[i] - 1e-9 for i in range(len(h) - 1))
