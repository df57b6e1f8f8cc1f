"""Pallas TPU kernels vs the jnp reference implementations (interpret mode
on CPU; the same kernels compile for TPU on the bench path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srhmm_tpu.models import DIAG, FULL, GmmHmm, GmmStream, init_left_right_trans
from srhmm_tpu.ops import log_forward, log_state_emission, score_final_state, score_total, viterbi
from srhmm_tpu.ops.pallas import (
    backtrace,
    log_forward_batch_pallas,
    log_state_emission_fused,
    viterbi_batch_pallas,
)


def _stream(rng, S=8, M=3, D=9):
    means = rng.normal(size=(S, M, D)) * 2.0
    var = rng.uniform(0.5, 1.5, size=(S, M, D))
    w = rng.uniform(0.3, 0.7, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    return GmmStream(
        weights=jnp.asarray(w),
        means=jnp.asarray(means),
        inv_cov=jnp.asarray(1.0 / var),
        det=jnp.asarray(np.prod(var, -1)),
        cov_type=DIAG,
    )


def test_fused_emission_matches_reference():
    rng = np.random.default_rng(0)
    stream = _stream(rng)
    frames = jnp.asarray(rng.normal(size=(256, 9)), jnp.float32)
    got = np.asarray(log_state_emission_fused(frames, stream, interpret=True))
    want = np.asarray(log_state_emission(frames, (stream.astype(jnp.float32),)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_forward_kernel_matches_scan():
    rng = np.random.default_rng(1)
    B, T, S = 4, 64, 8
    log_b = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    trans = init_left_right_trans(S).astype(jnp.float32)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.maximum(trans, 1e-30)), -jnp.inf)
    lengths = jnp.asarray([64, 50, 33, 1], jnp.int32)

    out = np.asarray(
        log_forward_batch_pallas(log_b, log_trans, lengths, interpret=True)
    )
    for i in range(B):
        ref = np.asarray(
            log_forward(log_b[i].astype(jnp.float64), log_trans.astype(jnp.float64), lengths[i])
        )
        finite = np.isfinite(ref)
        np.testing.assert_allclose(out[i][finite], ref[finite], rtol=1e-4, atol=1e-4)
        assert (out[i][~finite] < -1e29).all()


def test_viterbi_kernel_matches_reference():
    rng = np.random.default_rng(2)
    B, T, S = 3, 48, 6
    log_b = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    trans = init_left_right_trans(S, delta=2).astype(jnp.float32)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.maximum(trans, 1e-30)), -jnp.inf)
    lengths = jnp.asarray([48, 40, 25], jnp.int32)

    scores, bptr = viterbi_batch_pallas(log_b, log_trans, lengths, interpret=True)
    paths = np.asarray(backtrace(bptr, lengths, S - 1))
    scores = np.asarray(scores)
    for i in range(B):
        ref_score, ref_path = viterbi(
            log_b[i].astype(jnp.float64),
            log_trans.astype(jnp.float64),
            lengths[i],
        )
        np.testing.assert_allclose(scores[i, S - 1], float(ref_score), rtol=1e-4)
        L = int(lengths[i])
        np.testing.assert_array_equal(paths[i][:L], np.asarray(ref_path)[:L])


def test_fused_mfcc_matches_frontend():
    from srhmm_tpu.features import FrontendConfig, mfcc
    from srhmm_tpu.features.pallas_mfcc import mfcc_pallas

    cfg = FrontendConfig()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=16_000), jnp.float32)
    got = np.asarray(mfcc_pallas(x, cfg, interpret=True))
    want = np.asarray(mfcc(x, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_lattice_kernels_match_scan():
    from srhmm_tpu.ops import log_backward_full, log_forward_full
    from srhmm_tpu.ops.pallas.lattice_pallas import (
        backward_lattice_pallas,
        forward_lattice_pallas,
    )

    rng = np.random.default_rng(9)
    B, T, S = 4, 32, 6
    log_b = rng.normal(size=(B, T, S))
    trans = init_left_right_trans(S).astype(jnp.float32)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.maximum(trans, 1e-30)), -jnp.inf)
    lengths = jnp.asarray([32, 20, 7, 2], jnp.int32)

    lb_tsb = jnp.asarray(np.transpose(log_b, (1, 2, 0)), jnp.float32)
    la = np.asarray(forward_lattice_pallas(lb_tsb, log_trans, lengths, interpret=True))
    lbw = np.asarray(backward_lattice_pallas(lb_tsb, log_trans, lengths, interpret=True))
    for i in range(B):
        L = int(lengths[i])
        ref_la = np.asarray(
            log_forward_full(
                jnp.asarray(log_b[i], jnp.float64), log_trans.astype(jnp.float64), lengths[i]
            )
        )
        ref_lb = np.asarray(
            log_backward_full(
                jnp.asarray(log_b[i], jnp.float64), log_trans.astype(jnp.float64), lengths[i]
            )
        )
        finite = np.isfinite(ref_la[:L])
        np.testing.assert_allclose(
            la[:L, :, i][finite], ref_la[:L][finite], rtol=1e-4, atol=1e-4
        )
        finite_b = np.isfinite(ref_lb[:L])
        np.testing.assert_allclose(
            lbw[:L, :, i][finite_b], ref_lb[:L][finite_b], rtol=1e-4, atol=1e-4
        )


def test_blocked_lattice_kernels_match_scan():
    """Time-blocked (k_block frames per grid step) lane-major lattices must
    match the scan references, including padding semantics past length."""
    from srhmm_tpu.ops import log_backward_full, log_forward_full
    from srhmm_tpu.ops.pallas.lattice_pallas import (
        backward_lattice_pallas_blocked,
        forward_lattice_pallas_blocked,
    )

    rng = np.random.default_rng(11)
    B, T, S, K = 4, 32, 6, 8
    log_b = rng.normal(size=(B, T, S))
    trans = init_left_right_trans(S).astype(jnp.float32)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.maximum(trans, 1e-30)), -jnp.inf)
    lengths = jnp.asarray([32, 21, 7, 2], jnp.int32)

    lb_tsb = jnp.asarray(np.transpose(log_b, (1, 2, 0)), jnp.float32)
    la = np.asarray(
        forward_lattice_pallas_blocked(
            lb_tsb, log_trans, lengths, k_block=K, interpret=True
        )
    )
    lbw = np.asarray(
        backward_lattice_pallas_blocked(
            lb_tsb, log_trans, lengths, k_block=K, interpret=True
        )
    )
    for i in range(B):
        ref_la = np.asarray(
            log_forward_full(
                jnp.asarray(log_b[i], jnp.float64),
                log_trans.astype(jnp.float64),
                lengths[i],
            )
        )
        ref_lb = np.asarray(
            log_backward_full(
                jnp.asarray(log_b[i], jnp.float64),
                log_trans.astype(jnp.float64),
                lengths[i],
            )
        )
        # full lattices including the padded tail (carry-through / init rows)
        fin = np.isfinite(ref_la)
        np.testing.assert_allclose(
            la[:, :, i][fin], ref_la[fin], rtol=1e-4, atol=1e-4
        )
        assert (la[:, :, i][~fin] < -1e28).all()
        fin_b = np.isfinite(ref_lb)
        np.testing.assert_allclose(
            lbw[:, :, i][fin_b], ref_lb[fin_b], rtol=1e-4, atol=1e-4
        )
        assert (lbw[:, :, i][~fin_b] < -1e28).all()


def test_fused_e_step_matches_xla_e_step():
    """e_step_fused (Pallas emission + in-register stat accumulation) must
    reproduce e_step's sufficient statistics in f32, padding included."""
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import GmmHmm
    from srhmm_tpu.train.em import e_step, e_step_fused

    rng = np.random.default_rng(7)
    S, M, D, B, T = 5, 3, 4, 6, 40
    model = GmmHmm(
        trans=init_left_right_trans(S),
        streams=(_stream(rng, S=S, M=M, D=D),),
    ).astype(jnp.float32)
    utts = [rng.normal(size=(T - 2 * (i % 3), D)) for i in range(B)]
    batch = pack_utterances(utts, pad_multiple=8, dtype=jnp.float32)

    ref = e_step(model, batch)
    got = e_step_fused(model, batch, interpret=True)
    np.testing.assert_allclose(got.num_trans, ref.num_trans, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got.den_trans, ref.den_trans, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got.den_mix, ref.den_mix, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(got.log_prob), float(ref.log_prob), rtol=1e-5)
    assert float(got.num_valid) == float(ref.num_valid)
    for g, r in zip(got.streams, ref.streams):
        np.testing.assert_allclose(g.w, r.w, rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(g.x, r.x, rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(g.xx, r.xx, rtol=5e-4, atol=2e-4)


def test_emission_stats_kernel_zero_likelihood_state():
    """States with zero total likelihood (log_b == -inf) must contribute
    nothing (no NaN from exp(q - (-inf)))."""
    from srhmm_tpu.ops.pallas.emission_pallas import (
        _pack_constants,
        emission_stats_pallas,
    )

    rng = np.random.default_rng(3)
    S, M, D, T = 4, 2, 3, 16
    stream = _stream(rng, S=S, M=M, D=D).astype(jnp.float32)
    frames = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0, 1, size=(T, S)), jnp.float32)
    a, b = _pack_constants(stream, jnp.float32)
    log_b = jnp.full((T, S), -jnp.inf, jnp.float32)
    out = emission_stats_pallas(
        frames, gamma, log_b, a, b, t_block=8, interpret=True
    )
    assert np.all(np.asarray(out) == 0.0)


@pytest.mark.parametrize("band", [None, 1])
@pytest.mark.parametrize("cov_type", [DIAG, FULL])
def test_fused_lane_e_step_matches_xla(band, cov_type):
    """The lane-major fused E-step (ops/pallas/fused_em_pallas.py) must
    reproduce every statistic of train.em.e_step to f32 roundoff, for both
    covariance types and both the dense and the banded (rolled-diagonal)
    recursions, including padded and zero-length utterances.  Full cov
    exercises the lifted [x; vec(x x^T)] emission GEMM and the (D, D)
    moment accumulation."""
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.train.em import e_step, e_step_fused_lane

    S, M, D = 5, 3, 7
    rng = np.random.default_rng(0)
    means = rng.normal(size=(S, M, D)) * 2.0
    w = rng.uniform(0.3, 0.7, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    if cov_type == FULL:
        a_rnd = rng.normal(size=(S, M, D, D)) * 0.2
        cov = a_rnd @ np.swapaxes(a_rnd, -1, -2) + np.eye(D)[None, None]
        inv_cov = np.linalg.inv(cov)
        det = np.linalg.det(cov)
    else:
        var = rng.uniform(0.5, 1.5, size=(S, M, D))
        inv_cov = 1.0 / var
        det = np.prod(var, -1)
    model = GmmHmm(
        trans=init_left_right_trans(S),
        streams=(
            GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(means),
                inv_cov=jnp.asarray(inv_cov),
                det=jnp.asarray(det),
                cov_type=cov_type,
            ),
        ),
    ).astype(jnp.float32)
    utts = [rng.normal(size=(20 + 3 * i, D)) for i in range(12)]
    batch = pack_utterances(utts, pad_multiple=16, pad_batch_to=14, dtype=jnp.float32)

    ref = e_step(model, batch)
    got = e_step_fused_lane(model, batch, k_block=8, band=band, interpret=True)
    for name in ["num_trans", "den_trans", "den_mix", "log_prob", "num_valid"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4 * max(np.abs(a).max(), 1.0))
    for name in ["w", "x", "xx"]:
        a = np.asarray(getattr(ref.streams[0], name))
        b = np.asarray(getattr(got.streams[0], name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4 * np.abs(a).max())


def test_trans_band():
    from srhmm_tpu.ops.pallas.fused_em_pallas import trans_band

    assert trans_band(init_left_right_trans(6, delta=1)) == 1
    assert trans_band(init_left_right_trans(6, delta=2)) == 2
    full = np.ones((4, 4)) / 4.0
    assert trans_band(full) is None or trans_band(full) == 3
    lower = np.eye(4) * 0.5
    lower[2, 0] = 0.5
    assert trans_band(lower) is None


def test_fused_lane_em_step_improves_likelihood():
    """A few fused-lane EM iterations must behave like EM: monotone
    non-decreasing total log-likelihood (same m_step as the XLA path)."""
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.train.em import e_step_fused_lane, m_step

    S, M, D = 4, 2, 5
    rng = np.random.default_rng(3)
    means = rng.normal(size=(S, M, D)) * 2.0
    var = rng.uniform(0.5, 1.5, size=(S, M, D))
    w = rng.uniform(0.3, 0.7, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    model = GmmHmm(
        trans=init_left_right_trans(S),
        streams=(
            GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(means),
                inv_cov=jnp.asarray(1.0 / var),
                det=jnp.asarray(np.prod(var, -1)),
                cov_type=DIAG,
            ),
        ),
    ).astype(jnp.float32)
    utts = [rng.normal(size=(24 + i, D)) + 2.0 for i in range(6)]
    batch = pack_utterances(utts, pad_multiple=8, dtype=jnp.float32)
    lps = []
    for _ in range(4):
        st = e_step_fused_lane(model, batch, k_block=8, band=1, interpret=True)
        lps.append(float(st.log_prob))
        model = m_step(model, st)
    assert all(lps[i + 1] >= lps[i] - 1e-2 for i in range(len(lps) - 1)), lps


@pytest.mark.parametrize("mode", ["total", "final"])
def test_fused_vocab_scoring_lane_matches_xla(mode):
    """The lane-major fused scoring kernel (ops/pallas/scoring_pallas.py)
    must reproduce score_batch_log for every (utterance, word) pair,
    including padded rows, across word blockings; the max semiring must
    upper-bound... equal the Viterbi best-path score (checked against
    ops.viterbi)."""
    from srhmm_tpu.decode.scorer import score_batch_log
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import stack_models
    from srhmm_tpu.ops.pallas.scoring_pallas import score_batch_fused_lane

    rng = np.random.default_rng(0)
    S, M, D = 5, 2, 6

    def mk(seed):
        r = np.random.default_rng(seed)
        means = r.normal(size=(S, M, D)) * 3.0
        var = r.uniform(0.5, 1.5, size=(S, M, D))
        w = r.uniform(0.3, 0.7, size=(S, M))
        w /= w.sum(-1, keepdims=True)
        from srhmm_tpu.models import GmmHmm

        return GmmHmm(
            trans=init_left_right_trans(S),
            streams=(
                GmmStream(
                    weights=jnp.asarray(w),
                    means=jnp.asarray(means),
                    inv_cov=jnp.asarray(1.0 / var),
                    det=jnp.asarray(np.prod(var, -1)),
                    cov_type=DIAG,
                ),
            ),
            word=f"w{seed}",
        )

    vocab = stack_models([mk(i) for i in range(6)]).astype(jnp.float32)
    utts = [rng.normal(size=(20 + 3 * i, D)) for i in range(8)]
    batch = pack_utterances(utts, pad_multiple=16, dtype=jnp.float32)

    ref = np.asarray(score_batch_log(vocab, batch, mode=mode))
    for wb in (None, 2):
        got = np.asarray(
            score_batch_fused_lane(
                vocab, batch, mode=mode, w_block=wb, k_block=8, interpret=True
            )
        )
        finite = np.isfinite(ref)
        assert (np.isfinite(got) == finite).all()
        np.testing.assert_allclose(
            got[finite], ref[finite], rtol=1e-5,
            atol=1e-5 * np.abs(ref[finite]).max(),
        )

    # max semiring == Viterbi best-path score
    from srhmm_tpu.ops import viterbi

    got_v = np.asarray(
        score_batch_fused_lane(
            vocab, batch, mode="final", semiring="max", k_block=8, interpret=True
        )
    )
    for b in (0, 3):
        frames = jnp.asarray(utts[b], jnp.float32)
        for wi in (0, 4):
            one = jax.tree.map(lambda x: x[wi], vocab)
            lb = log_state_emission(frames, one.streams)
            score, path = viterbi(lb, one.log_trans())
            np.testing.assert_allclose(got_v[b, wi], float(score), rtol=1e-5)


def test_score_batch_dispatcher_cpu_falls_back():
    """score_batch auto-dispatch: off-TPU it must route to score_batch_log
    (fused impl unavailable/ineligible) and forcing impl='fused' in
    interpret mode still matches."""
    from srhmm_tpu.decode.scorer import score_batch, score_batch_log
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import GmmHmm, stack_models

    rng = np.random.default_rng(1)
    S, M, D = 4, 2, 5

    def mk(seed):
        r = np.random.default_rng(seed)
        means = r.normal(size=(S, M, D)) * 3.0
        var = r.uniform(0.5, 1.5, size=(S, M, D))
        w = r.uniform(0.3, 0.7, size=(S, M))
        w /= w.sum(-1, keepdims=True)
        return GmmHmm(
            trans=init_left_right_trans(S),
            streams=(
                GmmStream(
                    weights=jnp.asarray(w),
                    means=jnp.asarray(means),
                    inv_cov=jnp.asarray(1.0 / var),
                    det=jnp.asarray(np.prod(var, -1)),
                    cov_type=DIAG,
                ),
            ),
            word=f"w{seed}",
        )

    vocab = stack_models([mk(i) for i in range(4)]).astype(jnp.float32)
    batch = pack_utterances(
        [rng.normal(size=(18 + i, D)) for i in range(5)],
        pad_multiple=8,
        dtype=jnp.float32,
    )
    auto = np.asarray(score_batch(vocab, batch))
    ref = np.asarray(score_batch_log(vocab, batch))
    np.testing.assert_array_equal(auto, ref)  # CPU: identical objects/path


def test_fused_lane_autopad_odd_shapes():
    """e_step_fused_lane accepts ANY (B, T): the batch axis zero-pads to
    the 128-lane tile and time to the k_block tile inside the wrapper
    (round-3 fix — the eligibility gate no longer rejects B % 128 != 0),
    and the statistics are bitwise independent of the padding."""
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.train.em import e_step, e_step_fused_lane

    S, M, D = 4, 2, 5
    rng = np.random.default_rng(7)
    model = GmmHmm(
        trans=init_left_right_trans(S),
        streams=(_stream(rng, S=S, M=M, D=D),),
    ).astype(jnp.float32)
    # odd T (53: not a multiple of any k_block) and odd B (5)
    utts = [rng.normal(size=(31 + 11 * i, D)) for i in range(5)]
    batch = pack_utterances(utts, pad_multiple=1, dtype=jnp.float32)
    assert batch.features.shape[0] % 128 != 0
    assert batch.features.shape[1] % 8 != 0

    ref = e_step(model, batch)
    got = e_step_fused_lane(model, batch, k_block=8, band=1, interpret=True)
    for name in ["num_trans", "den_trans", "den_mix", "log_prob", "num_valid"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4 * max(np.abs(a).max(), 1.0))
    for name in ["w", "x", "xx"]:
        a = np.asarray(getattr(ref.streams[0], name))
        b = np.asarray(getattr(got.streams[0], name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4 * np.abs(a).max())


@pytest.mark.parametrize("mode", ["total", "final"])
def test_fused_vocab_scoring_full_cov_matches_xla(mode):
    """Full-covariance vocabularies ride the fused scoring kernel via the
    Cholesky z-GEMM (round-3; same formulation as the fused E-step's
    pack_lane_constants) — must match score_batch_log for every
    (utterance, word) pair across word blockings."""
    from srhmm_tpu.decode.scorer import score_batch_log
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import GmmHmm, stack_models
    from srhmm_tpu.ops.pallas.scoring_pallas import score_batch_fused_lane

    rng = np.random.default_rng(0)
    S, M, D = 5, 2, 6

    def mk(seed):
        r = np.random.default_rng(seed)
        means = r.normal(size=(S, M, D)) * 3.0
        a_rnd = r.normal(size=(S, M, D, D)) * 0.3
        cov = a_rnd @ np.swapaxes(a_rnd, -1, -2) + np.eye(D)[None, None]
        w = r.uniform(0.3, 0.7, size=(S, M))
        w /= w.sum(-1, keepdims=True)
        return GmmHmm(
            trans=init_left_right_trans(S),
            streams=(
                GmmStream(
                    weights=jnp.asarray(w),
                    means=jnp.asarray(means),
                    inv_cov=jnp.asarray(np.linalg.inv(cov)),
                    det=jnp.asarray(np.linalg.det(cov)),
                    cov_type=FULL,
                ),
            ),
            word=f"w{seed}",
        )

    vocab = stack_models([mk(i) for i in range(6)]).astype(jnp.float32)
    utts = [rng.normal(size=(20 + 3 * i, D)) for i in range(8)]
    batch = pack_utterances(utts, pad_multiple=16, dtype=jnp.float32)

    ref = np.asarray(score_batch_log(vocab, batch, mode=mode))
    for wb in (None, 2):
        got = np.asarray(
            score_batch_fused_lane(
                vocab, batch, mode=mode, w_block=wb, k_block=8, interpret=True
            )
        )
        finite = np.isfinite(ref)
        assert (np.isfinite(got) == finite).all()
        np.testing.assert_allclose(
            got[finite], ref[finite], rtol=1e-4,
            atol=1e-5 * np.abs(ref[finite]).max(),
        )


def test_fused_vocab_scoring_reference_fixture_models(reference_root):
    """The reference's committed recognition workload — the 13 FULL-COV
    fixture models (test/test/models/*.hmm) scored by R1
    (recognition-full-fs/recognition_continuous_full_fs.c:822-836) against
    the 13 .perfil utterances — must ride the fused scorer and reproduce
    the XLA scorer's scores (which are locked to the golden report) and
    its per-utterance ranking decisions."""
    from srhmm_tpu.decode.scorer import score_batch_log
    from srhmm_tpu.io import read_list, read_perfil, read_vocabulary
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import stack_models
    from srhmm_tpu.ops.pallas.scoring_pallas import score_batch_fused_lane

    base = reference_root / "test" / "test"
    vocab = stack_models(
        read_vocabulary(base / "models" / "models.txt", relative_to=base.parent)
    ).astype(jnp.float32)
    assert vocab.streams[0].cov_type == FULL
    perfils = [
        np.asarray(read_perfil(base.parent / p.lstrip("./")))
        for p in read_list(base / "perfil_data" / "mean_list.txt")
    ]
    batch = pack_utterances(perfils, pad_multiple=16, dtype=jnp.float32)

    ref = np.asarray(score_batch_log(vocab, batch, mode="total"))
    got = np.asarray(
        score_batch_fused_lane(vocab, batch, mode="total", interpret=True)
    )
    # real speech scale: |scores| ~ 5-9e3 nats; f32 recursion keeps ~1e-4 rel
    np.testing.assert_allclose(got, ref, rtol=3e-4)
    assert (got.argmax(1) == ref.argmax(1)).all()


@pytest.mark.parametrize("cov", ["diag", "full"])
def test_fused_vocab_scoring_multi_stream_matches_xla(cov):
    """MULTI-STREAM fused scoring (late round 4): per-stream mixture
    logsumexps sum in-kernel (the reference's product-of-streams scoring,
    R2:352-358 — one .perfil per stream, R2:331-339).  Both covariance
    types, both scoring modes, vs score_batch_log on a per-stream batch
    tuple; plus the score_batch dispatcher routes tuples."""
    from srhmm_tpu.decode.scorer import score_batch, score_batch_log
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import FULL, GmmHmm, stack_models
    from srhmm_tpu.ops.pallas.scoring_pallas import score_batch_fused_lane

    rng = np.random.default_rng(3)
    W, S = 5, 6

    def mk_stream(r, M, D):
        means = r.normal(size=(S, M, D)) * 2.0
        w = r.uniform(0.3, 0.7, size=(S, M))
        w /= w.sum(-1, keepdims=True)
        if cov == "full":
            a_rnd = r.normal(size=(S, M, D, D)) * 0.3
            covm = a_rnd @ np.swapaxes(a_rnd, -1, -2) + np.eye(D)[None, None]
            return GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(means),
                inv_cov=jnp.asarray(np.linalg.inv(covm)),
                det=jnp.asarray(np.linalg.det(covm)),
                cov_type=FULL,
            )
        var = r.uniform(0.5, 1.5, size=(S, M, D))
        return GmmStream(
            weights=jnp.asarray(w),
            means=jnp.asarray(means),
            inv_cov=jnp.asarray(1.0 / var),
            det=jnp.asarray(np.prod(var, -1)),
            cov_type=DIAG,
        )

    models = []
    for i in range(W):
        r = np.random.default_rng(100 + i)
        models.append(
            GmmHmm(
                trans=init_left_right_trans(S),
                streams=(mk_stream(r, 3, 9), mk_stream(r, 2, 3)),
                word=f"w{i}",
            )
        )
    vocab = stack_models(models).astype(jnp.float32)
    b1 = pack_utterances(
        [rng.normal(size=(50 + 7 * i, 9)) for i in range(4)],
        pad_multiple=8, dtype=jnp.float32,
    )
    b2 = pack_utterances(
        [rng.normal(size=(50 + 7 * i, 3)) for i in range(4)],
        pad_multiple=8, dtype=jnp.float32,
    )
    for mode in ("total", "final"):
        ref = np.asarray(score_batch_log(vocab, (b1, b2), mode=mode))
        got = np.asarray(
            score_batch_fused_lane(vocab, (b1, b2), mode=mode, interpret=True)
        )
        finite = np.isfinite(ref)
        assert (np.isfinite(got) == finite).all(), (cov, mode)
        np.testing.assert_allclose(
            got[finite], ref[finite], rtol=1e-4,
            atol=1e-5 * np.abs(ref[finite]).max(),
        )
    # the dispatcher accepts the tuple form (falls back to XLA off-TPU)
    via = np.asarray(score_batch(vocab, (b1, b2), mode="total"))
    ref = np.asarray(score_batch_log(vocab, (b1, b2), mode="total"))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(via[finite], ref[finite], rtol=1e-4)


def test_lattice_moments_kernel_matches_transposed():
    """Round 5: bank_moments_lattice_pallas (gamma consumed in K_B's
    (T, LSp, B) layout, per-grid-step VMEM transpose) must equal
    bank_moments_pallas on pre-transposed gamma — diag AND full cov —
    and fused_positional_stats must give identical statistics through
    both gamma paths."""
    from srhmm_tpu.ops.pallas.composed_pallas import (
        bank_moments_lattice_pallas,
        bank_moments_pallas,
    )
    from srhmm_tpu.train.embedded import (
        fused_positional_stats,
        pack_position_bank_diag,
        pack_position_bank_full,
    )

    r = np.random.default_rng(0)
    B, LS, LSp, T, D, M, NB = 128, 6, 8, 128, 5, 8, 12
    for full in (False, True):
        means = r.normal(size=(NB, M, D))
        if full:
            a_ = r.normal(size=(NB, M, D, D)) * 0.3
            cov = a_ @ np.swapaxes(a_, -1, -2) + np.eye(D)
            ic = np.linalg.inv(cov)
            lad = np.log(np.abs(np.linalg.det(cov)))
            bank, bias2 = pack_position_bank_full(
                jnp.asarray(means, jnp.float32), jnp.asarray(ic, jnp.float32),
                jnp.asarray(r.uniform(size=(NB, M)), jnp.float32),
                jnp.asarray(lad, jnp.float32), D,
            )
        else:
            var = r.uniform(0.5, 1.5, size=(NB, M, D))
            bank = pack_position_bank_diag(
                jnp.asarray(means, jnp.float32),
                jnp.asarray(1.0 / var, jnp.float32),
                jnp.asarray(r.uniform(size=(NB, M)), jnp.float32),
                jnp.asarray(np.log(var).sum(-1), jnp.float32), D,
            )
            bias2 = None
        ids = jnp.asarray(r.integers(0, NB, size=(B, LS)), jnp.int32)
        feats = jnp.asarray(r.normal(size=(B, D, T)), jnp.float32)
        gam_tsb = jnp.asarray(np.abs(r.normal(size=(T, LSp, B))), jnp.float32)
        gam_bst = jnp.transpose(gam_tsb[:, :LS, :], (2, 1, 0))
        old = bank_moments_pallas(
            ids, bank, bias2, feats, gam_bst, n_mix_p=M, full=full,
            group=8, interpret=True,
        )
        new = bank_moments_lattice_pallas(
            ids, bank, bias2, feats, gam_tsb, n_mix_p=M, full=full,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))

    # end-to-end: both gamma paths of the shared E-step core agree
    L, S = 3, 2
    pos_logt = jnp.asarray(
        np.log(np.maximum(np.broadcast_to(
            np.array([[0.6, 0.4], [0.0, 1.0]]), (B, L, S, S)), 1e-9)),
        jnp.float32,
    )
    feats_btd = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    var = r.uniform(0.5, 1.5, size=(NB, M, D))
    bank_d = pack_position_bank_diag(
        jnp.asarray(r.normal(size=(NB, M, D)), jnp.float32),
        jnp.asarray(1.0 / var, jnp.float32),
        jnp.asarray(r.uniform(size=(NB, M)), jnp.float32),
        jnp.asarray(np.log(var).sum(-1), jnp.float32), D,
    )
    ids_ls = jnp.asarray(r.integers(0, NB, size=(B, L * S)), jnp.int32)
    outs = [
        fused_positional_stats(
            ids_ls, bank_d, None, pos_logt, feats_btd, lens, n_mix=M,
            gamma_lattice=gl, interpret=True,
        )
        for gl in (True, False)
    ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
