"""Checkpoint/resume: interrupted training resumes with an identical
trajectory; manager GC and atomicity."""

import jax.numpy as jnp
import numpy as np

from srhmm_tpu.init.lbg import create_initial_model
from srhmm_tpu.io import read_perfil
from srhmm_tpu.io.dataset import pack_utterances
from srhmm_tpu.train.checkpoint import (
    CheckpointManager,
    EmDriverState,
    train_fast_resumable,
)
from srhmm_tpu.train.em import train_fast


def test_resume_identical_trajectory(reference_root, tmp_path):
    frames = read_perfil(
        reference_root / "train/test/perfil_data/mean_vc_186_f_03_ap_0225.perfil"
    )
    init = create_initial_model([[frames]], 6, [1], cov_type="full")
    batch = pack_utterances([frames], pad_multiple=64, dtype=jnp.float64)

    ref = train_fast(init, batch)

    # run 1: interrupt after one iteration
    d = tmp_path / "ck"
    r1 = train_fast_resumable(init, batch, d, max_iterations=1)
    assert len(list(d.glob("ckpt_*.json"))) >= 1

    # run 2: resume to convergence from disk
    r2 = train_fast_resumable(init, batch, d)
    assert r2.iterations == ref.iterations
    np.testing.assert_allclose(r2.mean_log_prob, ref.mean_log_prob, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r2.model.trans), np.asarray(ref.model.trans), rtol=1e-12
    )
    # resumed history must extend run 1's, matching the uninterrupted run
    np.testing.assert_allclose(r2.log_prob_history, ref.log_prob_history, rtol=1e-12)


def test_manager_gc_and_latest(tmp_path):
    from srhmm_tpu.models import DIAG, GmmHmm, GmmStream, init_left_right_trans

    model = GmmHmm(
        trans=init_left_right_trans(3),
        streams=(
            GmmStream(
                weights=jnp.ones((3, 1)),
                means=jnp.zeros((3, 1, 2)),
                inv_cov=jnp.ones((3, 1, 2)),
                det=jnp.ones((3, 1)),
                cov_type=DIAG,
            ),
        ),
    )
    mgr = CheckpointManager(tmp_path, keep=2)
    for i in range(1, 5):
        scaled = model.replace(trans=model.trans * 1.0 + i * 0.0)
        mgr.save(scaled, EmDriverState(iteration=i, old_log_prob=-float(i), history=[-float(i)]))
    assert len(list(tmp_path.glob("ckpt_*.json"))) == 2
    got, state = mgr.latest(model)
    assert state.iteration == 4
    assert state.old_log_prob == -4.0
