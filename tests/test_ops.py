"""Kernel-level tests: emission, forward/backward, Viterbi vs NumPy float64
oracles (SURVEY.md §4 test strategy)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srhmm_tpu.models import DIAG, FULL, GmmHmm, GmmStream, init_left_right_trans
from srhmm_tpu.ops import (
    log_backward_full,
    log_forward,
    log_forward_full,
    log_gauss,
    log_state_emission,
    parity_score_final_state,
    parity_score_total,
    prob_gauss_parity,
    scaled_backward_parity,
    scaled_forward_parity,
    score_final_state,
    score_total,
    viterbi,
)


def random_stream(rng, S=4, M=3, D=5, cov_type=DIAG):
    means = rng.normal(size=(S, M, D))
    if cov_type == DIAG:
        var = rng.uniform(0.5, 2.0, size=(S, M, D))
        inv_cov = 1.0 / var
        det = np.prod(var, axis=-1)
    else:
        a = rng.normal(size=(S, M, D, D))
        cov = np.einsum("smij,smkj->smik", a, a) + 3.0 * np.eye(D)
        inv_cov = np.linalg.inv(cov)
        det = np.linalg.det(cov)
    w = rng.uniform(0.1, 1.0, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    return GmmStream(
        weights=jnp.asarray(w),
        means=jnp.asarray(means),
        inv_cov=jnp.asarray(inv_cov),
        det=jnp.asarray(det),
        cov_type=cov_type,
    )


def np_log_gauss(frames, stream):
    mu = np.asarray(stream.means)
    k = np.asarray(stream.inv_cov)
    det = np.asarray(stream.det)
    D = frames.shape[-1]
    dif = frames[:, None, None, :] - mu
    if stream.cov_type == DIAG:
        q = np.einsum("tsmd,smd->tsm", dif * dif, k)
    else:
        q = np.einsum("tsmd,smde,tsme->tsm", dif, k, dif)
    return -0.5 * q - 0.5 * (D * np.log(2 * np.pi) + np.log(np.abs(det)))


@pytest.mark.parametrize("cov_type", [DIAG, FULL])
def test_log_gauss_matches_oracle(cov_type):
    rng = np.random.default_rng(0)
    stream = random_stream(rng, cov_type=cov_type)
    frames = jnp.asarray(rng.normal(size=(11, 5)))
    got = np.asarray(log_gauss(frames, stream))
    want = np_log_gauss(np.asarray(frames), stream)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("cov_type", [DIAG, FULL])
def test_log_vs_prob_parity_emission(cov_type):
    rng = np.random.default_rng(1)
    stream = random_stream(rng, cov_type=cov_type)
    frames = jnp.asarray(rng.normal(size=(7, 5)))
    lg = np.asarray(log_gauss(frames, stream))
    pg = np.asarray(prob_gauss_parity(frames, stream))
    np.testing.assert_allclose(np.exp(lg), pg, rtol=1e-10)


def brute_force_scores(log_b, log_trans):
    """Enumerate all paths starting in state 0: (total logZ, final-state logZ,
    viterbi best)."""
    T, S = log_b.shape
    total, final, best = [], [], -np.inf
    for path in itertools.product(range(S), repeat=T):
        if path[0] != 0:
            continue
        lp = log_b[0, path[0]]
        for t in range(1, T):
            lp += log_trans[path[t - 1], path[t]] + log_b[t, path[t]]
        total.append(lp)
        if path[-1] == S - 1:
            final.append(lp)
            best = max(best, lp)
    lse = lambda xs: np.logaddexp.reduce(xs) if xs else -np.inf
    return lse(total), lse(final), best


def test_forward_matches_brute_force():
    rng = np.random.default_rng(2)
    T, S = 6, 3
    log_b = rng.normal(size=(T, S))
    trans = np.asarray(init_left_right_trans(S, delta=2))
    log_trans = np.where(trans > 0, np.log(np.where(trans > 0, trans, 1.0)), -np.inf)
    la = np.asarray(log_forward(jnp.asarray(log_b), jnp.asarray(log_trans)))
    want_total, want_final, want_best = brute_force_scores(log_b, log_trans)
    np.testing.assert_allclose(float(score_total(la)), want_total, rtol=1e-12)
    np.testing.assert_allclose(float(score_final_state(la)), want_final, rtol=1e-12)
    best, path = viterbi(jnp.asarray(log_b), jnp.asarray(log_trans))
    np.testing.assert_allclose(float(best), want_best, rtol=1e-12)
    # the returned path must achieve the best score
    lp = log_b[0, int(path[0])]
    for t in range(1, T):
        lp += log_trans[int(path[t - 1]), int(path[t])] + log_b[t, int(path[t])]
    assert int(path[0]) == 0 and int(path[-1]) == S - 1
    np.testing.assert_allclose(lp, want_best, rtol=1e-12)


def test_forward_masked_equals_unpadded():
    rng = np.random.default_rng(3)
    T, S, pad = 9, 4, 5
    log_b = rng.normal(size=(T, S))
    trans = np.asarray(init_left_right_trans(S))
    log_trans = np.where(trans > 0, np.log(np.where(trans > 0, trans, 1.0)), -np.inf)
    padded = np.concatenate([log_b, rng.normal(size=(pad, S))], axis=0)
    la_ref = log_forward(jnp.asarray(log_b), jnp.asarray(log_trans))
    la_pad = log_forward(jnp.asarray(padded), jnp.asarray(log_trans), length=T)
    np.testing.assert_allclose(np.asarray(la_pad), np.asarray(la_ref), rtol=1e-12)
    lbeta_ref = log_backward_full(jnp.asarray(log_b), jnp.asarray(log_trans))
    lbeta_pad = log_backward_full(jnp.asarray(padded), jnp.asarray(log_trans), length=T)
    np.testing.assert_allclose(
        np.asarray(lbeta_pad)[:T], np.asarray(lbeta_ref), rtol=1e-12
    )
    vb_ref, path_ref = viterbi(jnp.asarray(log_b), jnp.asarray(log_trans))
    vb_pad, path_pad = viterbi(jnp.asarray(padded), jnp.asarray(log_trans), length=T)
    np.testing.assert_allclose(float(vb_pad), float(vb_ref), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(path_pad)[:T], np.asarray(path_ref))


def test_alpha_beta_consistency():
    """logsumexp_i(log_alpha_t(i) + log_beta_t(i)) is t-independent and equals
    the final-state score."""
    rng = np.random.default_rng(4)
    T, S = 12, 5
    log_b = jnp.asarray(rng.normal(size=(T, S)))
    trans = init_left_right_trans(S)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.where(trans > 0, trans, 1.0)), -jnp.inf)
    la = log_forward_full(log_b, log_trans)
    lb = log_backward_full(log_b, log_trans)
    z = jax.nn.logsumexp(la + lb, axis=1)
    np.testing.assert_allclose(
        np.asarray(z), float(la[-1, -1]) * np.ones(T), rtol=1e-12
    )


def test_scaled_parity_matches_log_path():
    """On a well-conditioned problem the scaled prob-domain recursion and the
    log-space recursion produce identical scores."""
    rng = np.random.default_rng(5)
    T, S = 30, 6
    # moderate emission probabilities to avoid underflow
    b = np.exp(rng.normal(size=(T, S)) * 0.5)
    trans = np.asarray(init_left_right_trans(S))
    alpha, scaling = scaled_forward_parity(jnp.asarray(b), jnp.asarray(trans))
    log_trans = np.where(trans > 0, np.log(np.where(trans > 0, trans, 1.0)), -np.inf)
    la = log_forward(jnp.log(jnp.asarray(b)), jnp.asarray(log_trans))
    np.testing.assert_allclose(
        float(parity_score_total(scaling)), float(score_total(la)), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(parity_score_final_state(scaling, alpha)),
        float(score_final_state(la)),
        rtol=1e-10,
    )
    # backward consistency in prob domain: sum_i alpha_t beta_t / c_t == P_final
    beta = scaled_backward_parity(jnp.asarray(b), jnp.asarray(trans), scaling)
    gamma_norm = np.asarray(alpha) * np.asarray(beta) / np.asarray(scaling)[:, None]
    np.testing.assert_allclose(
        gamma_norm.sum(1), gamma_norm[0].sum() * np.ones(T), rtol=1e-9
    )


def test_associative_scan_forward_matches_sequential():
    from srhmm_tpu.ops.forward_backward import log_forward_assoc

    rng = np.random.default_rng(6)
    T, S = 37, 5
    log_b = jnp.asarray(rng.normal(size=(T, S)))
    trans = init_left_right_trans(S)
    log_trans = jnp.where(trans > 0, jnp.log(jnp.where(trans > 0, trans, 1.0)), -jnp.inf)
    ref = np.asarray(log_forward(log_b, log_trans))
    got = np.asarray(log_forward_assoc(log_b, log_trans))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-10)
    assert (got[~finite] == -np.inf).all() or np.allclose(got[~finite], ref[~finite])
    # masked variant
    padded = jnp.concatenate([log_b, jnp.asarray(rng.normal(size=(11, S)))], 0)
    got_m = np.asarray(log_forward_assoc(padded, log_trans, length=T))
    np.testing.assert_allclose(got_m[finite], ref[finite], rtol=1e-10)
