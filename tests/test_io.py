"""IO codec tests against the reference fixtures.

Fixture facts verified independently in SURVEY.md §2.6: 13 .perfil files of
9-dim float64 frames (103-213 frames each); 13 .hmm models with 6 states,
1 stream, 1 mixture, 9 coefs, full covariance, 4-byte size_t.
"""

import numpy as np
import pytest

from srhmm_tpu.io import read_hmm, read_list, read_perfil, write_hmm, write_perfil
from srhmm_tpu.models import FULL, stack_models, validate_model

EXPECTED_FRAMES = {
    "mean_vc_186_f_03_ap_0225.perfil": 151,
    "mean_vc_254_f_03_ap_0225.perfil": 109,
}


def test_read_perfil_fixtures(perfil_dir):
    for p in sorted(perfil_dir.glob("*.perfil")):
        frames = read_perfil(p)
        assert frames.shape[1] == 9
        assert 100 <= frames.shape[0] <= 250
        assert frames.dtype == np.float64
        if p.name in EXPECTED_FRAMES:
            assert frames.shape[0] == EXPECTED_FRAMES[p.name]
        # fixtures are monotone-increasing band energies per frame
        assert np.all(np.diff(frames[0]) > 0)


def test_perfil_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(37, 13))
    write_perfil(tmp_path / "x.perfil", frames)
    back = read_perfil(tmp_path / "x.perfil")
    np.testing.assert_array_equal(frames, back)


def test_perfil_drops_partial_trailing_frame(tmp_path):
    frames = np.arange(12.0).reshape(3, 4)
    write_perfil(tmp_path / "x.perfil", frames)
    with open(tmp_path / "x.perfil", "ab") as f:
        f.write(np.float64(1.25).tobytes())  # half a frame
    back = read_perfil(tmp_path / "x.perfil")
    np.testing.assert_array_equal(frames, back)


def test_read_hmm_fixture(models_dir):
    m = read_hmm(models_dir / "mean_vc_186_f_03_ap_0225.hmm")
    assert m.word == "vc_186_f_03_ap_0225"
    assert m.num_states == 6
    assert m.num_streams == 1
    assert m.mixture_numbers == (1,)
    assert m.coef_numbers == (9,)
    assert m.streams[0].cov_type == FULL
    # left-right banded transitions, rows stochastic
    trans = np.asarray(m.trans)
    np.testing.assert_allclose(trans.sum(1), 1.0, atol=1e-12)
    assert trans[0, 0] == pytest.approx(0.9615384615384616)
    assert np.all(trans[np.tril_indices(6, k=-1)] == 0.0)
    assert validate_model(m) == []


def test_hmm_roundtrip_bit_exact(models_dir, tmp_path):
    """write_hmm(read_hmm(fixture)) must reproduce the fixture byte-for-byte."""
    for name in ["mean_vc_186_f_03_ap_0225.hmm", "mean_vc_254_f_03_ap_0225.hmm"]:
        src = models_dir / name
        m = read_hmm(src)
        out = tmp_path / name
        write_hmm(out, m, size_t_width=4)
        assert out.read_bytes() == src.read_bytes()


def test_hmm_roundtrip_size_t_8(models_dir, tmp_path):
    m = read_hmm(models_dir / "mean_vc_186_f_03_ap_0225.hmm")
    out = tmp_path / "w8.hmm"
    write_hmm(out, m, size_t_width=8)
    back = read_hmm(out)  # auto-detect width
    assert back.word == m.word
    np.testing.assert_array_equal(np.asarray(back.trans), np.asarray(m.trans))
    np.testing.assert_array_equal(
        np.asarray(back.streams[0].inv_cov), np.asarray(m.streams[0].inv_cov)
    )


def test_stack_vocabulary(models_dir):
    models = [read_hmm(p) for p in sorted(models_dir.glob("*.hmm"))]
    assert len(models) == 13
    vocab = stack_models(models)
    assert vocab.trans.shape == (13, 6, 6)
    assert vocab.streams[0].means.shape == (13, 6, 1, 9)
    assert vocab.streams[0].inv_cov.shape == (13, 6, 1, 9, 9)
    assert len(vocab.word) == 13


def test_read_list_tokenization(tmp_path):
    (tmp_path / "l.txt").write_text("a.perfil\n  b.perfil c.perfil\n\n")
    assert read_list(tmp_path / "l.txt") == ["a.perfil", "b.perfil", "c.perfil"]
