"""Embedded re-estimation over transcript-composed chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srhmm_tpu.models import DIAG, GmmHmm, GmmStream, init_left_right_trans, stack_models
from srhmm_tpu.train.em import em_step
from srhmm_tpu.train.embedded import train_embedded, utterance_stats
from srhmm_tpu.io.dataset import pack_utterances


def _unit(seed, S=3, M=2, D=5, spread=5.0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(S, M, D)) * spread
    var = rng.uniform(0.8, 1.2, size=(S, M, D))
    w = rng.uniform(0.4, 0.6, size=(S, M))
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
        word=f"u{seed}",
    )


def _sample_units(unit_models, transcript, rng, frames_per_state=5):
    out = []
    for u in transcript:
        mu = np.asarray(unit_models[u].streams[0].means)
        w = np.asarray(unit_models[u].streams[0].weights)
        for s in range(mu.shape[0]):
            for _ in range(frames_per_state):
                m = rng.choice(mu.shape[1], p=w[s])
                out.append(mu[s, m] + 0.3 * rng.normal(size=mu.shape[2]))
    return np.asarray(out)


@pytest.fixture(scope="module")
def setup():
    units = [_unit(i) for i in range(4)]
    stacked = stack_models(units)
    rng = np.random.default_rng(0)
    transcripts = [
        [0, 1, 2],
        [2, 3, 0],
        [1, 0, 3],
        [3, 2, 1],
        [0, 2, 1, 3],
        [1, 3, 0, 2],
    ]
    utts = [_sample_units(units, tr, rng) for tr in transcripts]
    return stacked, utts, transcripts


def test_single_unit_transcript_equals_isolated_em(setup):
    """A 1-unit transcript reduces embedded stats to the isolated E-step."""
    stacked, _, _ = setup
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(40, 5)))
    length = jnp.asarray(40)
    st_emb = utterance_stats(
        stacked, jnp.asarray([1], dtype=jnp.int32), feats, length
    )
    # isolated E-step on unit 1
    from srhmm_tpu.train.em import _per_utterance_stats

    unit1 = jax.tree.map(lambda a: a[1], stacked.replace(word=""))
    st_iso = _per_utterance_stats(unit1, feats, length)
    np.testing.assert_allclose(
        float(st_emb.log_prob), float(st_iso.log_prob), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(st_emb.num_trans[1]), np.asarray(st_iso.num_trans), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_emb.streams[0].w[1]),
        np.asarray(st_iso.streams[0].w),
        rtol=1e-9,
    )
    # other units untouched
    assert np.asarray(st_emb.streams[0].w[0]).sum() == 0.0
    assert np.asarray(st_emb.streams[0].w[2:]).sum() == 0.0


def test_embedded_training_improves_and_converges(setup):
    stacked, utts, transcripts = setup
    rng = np.random.default_rng(2)
    st = stacked.streams[0]
    perturbed = stacked.replace(
        streams=(st.replace(means=st.means + 0.7 * rng.normal(size=st.means.shape)),)
    )
    res = train_embedded(
        perturbed, utts, transcripts, threshold=1e-5, max_iterations=30
    )
    h = res.log_prob_history
    assert res.exemplar_count == len(utts)
    assert all(h[i + 1] >= h[i] - 1e-6 * abs(h[i]) for i in range(len(h) - 1))
    # trained units should beat the perturbed start substantially
    assert h[-1] > h[0] + 10.0


def test_embedded_gamma_mass_conservation(setup):
    """Per-frame occupancy sums to 1 over the composed lattice."""
    stacked, utts, transcripts = setup
    from srhmm_tpu.train.embedded import utterance_stats

    tr = jnp.asarray(transcripts[0], dtype=jnp.int32)
    feats = jnp.asarray(utts[0])
    stats = utterance_stats(stacked, tr, feats, jnp.asarray(len(utts[0])))
    # total occupancy = num frames
    total = float(sum(np.asarray(s.w).sum() for s in stats.streams))
    np.testing.assert_allclose(total, len(utts[0]), rtol=1e-6)


def _stats_close(ref, got, rtol):
    for name in ["num_trans", "den_trans", "den_mix"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=rtol, atol=rtol * max(1.0, np.abs(a).max()))
    np.testing.assert_allclose(
        float(got.log_prob), float(ref.log_prob), rtol=1e-5
    )
    assert float(got.num_valid) == float(ref.num_valid)
    for f in ["w", "x", "xx"]:
        a = np.asarray(getattr(ref.streams[0], f))
        b = np.asarray(getattr(got.streams[0], f))
        np.testing.assert_allclose(b, a, rtol=rtol, atol=rtol * max(1.0, np.abs(a).max()))


@pytest.mark.parametrize("S,M,L,delta", [(3, 2, 3, 1), (4, 1, 2, 2), (2, 3, 5, 1)])
def test_batch_stats_fused_matches_xla(S, M, L, delta):
    """The fused composed-lattice Pallas E-step (interpret mode on CPU)
    reproduces batch_stats across state counts, mixture counts, transcript
    lengths, band widths, and ragged lengths (incl. padding lanes)."""
    from srhmm_tpu.train.embedded import batch_stats, batch_stats_fused

    P, D, B, T = 5, 4, 4, 32
    rng = np.random.default_rng(S * 100 + M * 10 + L)
    units = []
    for i in range(P):
        u = _unit(i, S=S, M=M, D=D)
        units.append(u.replace(trans=init_left_right_trans(S, delta=delta)))
    models = stack_models(units).astype(jnp.float32)
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)) * 2.0, jnp.float32)
    lengths = jnp.asarray([T, T - 13, max(L * S, 3), T - 1], jnp.int32)

    ref = batch_stats(models, transcripts, feats, lengths)
    got = batch_stats_fused(models, transcripts, feats, lengths, k_block=8)
    _stats_close(ref, got, rtol=5e-4)


def _full_unit(seed, S=3, M=2, D=4, spread=3.0):
    from srhmm_tpu.models import FULL

    rng = np.random.default_rng(seed)
    means = rng.normal(size=(S, M, D)) * spread
    a = rng.normal(size=(S, M, D, D + 2))
    cov = np.einsum("smdk,smek->smde", a, a) / (D + 2)  # symmetric PD
    cov += 0.5 * np.eye(D)
    w = rng.uniform(0.4, 0.6, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    return GmmHmm(
        trans=init_left_right_trans(S),
        streams=(
            GmmStream(
                weights=jnp.asarray(w, jnp.float32),
                means=jnp.asarray(means, jnp.float32),
                inv_cov=jnp.asarray(np.linalg.inv(cov), jnp.float32),
                det=jnp.asarray(np.linalg.det(cov), jnp.float32),
                cov_type="full",
            ),
        ),
        word=f"f{seed}",
    )


@pytest.mark.parametrize("S,M,L", [(3, 2, 3), (2, 3, 4)])
def test_batch_stats_fused_full_cov_matches_xla(S, M, L):
    """FULL covariance (the reference's canonical T1 regime) on the fused
    composed-lattice kernels: the VMEM-resident bank packs the Cholesky
    z-GEMM rows (pack_position_bank_full) and must reproduce the XLA
    batch_stats — including the (D, D) second-moment statistics."""
    from srhmm_tpu.train.embedded import batch_stats, batch_stats_fused

    P, D, B, T = 4, 4, 3, 24
    rng = np.random.default_rng(S * 10 + M)
    models = stack_models([_full_unit(i, S=S, M=M, D=D) for i in range(P)])
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)) * 2.0, jnp.float32)
    lengths = jnp.asarray([T, T - 7, max(L * S, 3)], jnp.int32)

    ref = batch_stats(models, transcripts, feats, lengths)
    got = batch_stats_fused(models, transcripts, feats, lengths, k_block=8)
    _stats_close(ref, got, rtol=5e-4)


def test_embedded_em_step_fused_trains_identically():
    """embedded_em_step(fused=True) and the XLA path produce matching
    models after two EM iterations."""
    from srhmm_tpu.train.embedded import embedded_em_step

    P, S, M, D, B, T, L = 4, 3, 2, 5, 3, 24, 3
    rng = np.random.default_rng(7)
    models = stack_models([_unit(i, S=S, M=M, D=D) for i in range(P)]).astype(
        jnp.float32
    )
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)) * 2.0, jnp.float32)
    lengths = jnp.asarray([T, T - 5, T - 2], jnp.int32)

    mf, mx = models, models
    for _ in range(2):
        mf, lpf, _ = embedded_em_step(mf, transcripts, feats, lengths, fused=True)
        mx, lpx, _ = embedded_em_step(mx, transcripts, feats, lengths, fused=False)
    np.testing.assert_allclose(float(lpf), float(lpx), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mf.trans), np.asarray(mx.trans), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mf.streams[0].means),
        np.asarray(mx.streams[0].means),
        rtol=1e-3, atol=1e-3,
    )


def test_train_embedded_driver_fused_matches_xla(setup):
    """The train_embedded DRIVER must produce the same trajectory on the
    fused composed-lattice kernels as on the XLA path (round-3 fix: the
    driver now auto-selects batch_stats_fused like embedded_em_step)."""
    stacked, utts, transcripts = setup
    rng = np.random.default_rng(5)
    st = stacked.streams[0]
    perturbed = stacked.replace(
        streams=(st.replace(means=st.means + 0.5 * rng.normal(size=st.means.shape)),)
    )
    r_xla = train_embedded(
        perturbed, utts, transcripts, threshold=1e-4, max_iterations=5, fused=False
    )
    r_fused = train_embedded(
        perturbed, utts, transcripts, threshold=1e-4, max_iterations=5, fused=True
    )
    assert r_fused.iterations == r_xla.iterations
    np.testing.assert_allclose(
        r_fused.log_prob_history, r_xla.log_prob_history, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_fused.model.streams[0].means),
        np.asarray(r_xla.model.streams[0].means),
        rtol=2e-3, atol=2e-3,
    )


def test_batch_stats_fused_multi_stream_matches_xla():
    """MULTI-STREAM embedded models (product-of-streams emission,
    T1:1437-1441) on the fused composed-lattice kernels: per-stream
    VMEM-resident banks, summed per-stream logsumexps in the emission
    kernel, per-stream in-kernel moment scatters — must reproduce the XLA
    batch_stats (round 4: closes the last silent composed fallback)."""
    from srhmm_tpu.train.embedded import batch_stats, batch_stats_fused

    P, S, D, B, T, L = 4, 3, 4, 3, 24, 3
    rng = np.random.default_rng(11)

    def unit2(seed):
        u1 = _unit(seed, S=S, M=2, D=D)
        u2 = _unit(seed + 50, S=S, M=3, D=D)
        return u1.replace(streams=(u1.streams[0], u2.streams[0]))

    models = stack_models([unit2(i) for i in range(P)]).astype(jnp.float32)
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)) * 2.0, jnp.float32)
    lengths = jnp.asarray([T, T - 7, max(L * S, 3)], jnp.int32)

    ref = batch_stats(models, transcripts, feats, lengths)
    got = batch_stats_fused(models, transcripts, feats, lengths, k_block=8)
    _stats_close(ref, got, rtol=5e-4)
    # second stream's stats too (helper only checks stream 0)
    for f in ["w", "x", "xx"]:
        a = np.asarray(getattr(ref.streams[1], f))
        b = np.asarray(getattr(got.streams[1], f))
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=5e-4 * max(1.0, np.abs(a).max())
        )


def test_batch_stats_fused_multi_stream_full_cov_matches_xla():
    """Multi-stream AND full covariance together on the fused composed
    kernels (per-stream Cholesky z-GEMM banks)."""
    from srhmm_tpu.train.embedded import batch_stats, batch_stats_fused

    P, S, D, B, T, L = 3, 2, 3, 2, 16, 2
    rng = np.random.default_rng(21)

    def unit2(seed):
        u1 = _full_unit(seed, S=S, M=2, D=D)
        u2 = _full_unit(seed + 70, S=S, M=1, D=D)
        return u1.replace(streams=(u1.streams[0], u2.streams[0]))

    models = stack_models([unit2(i) for i in range(P)])
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)) * 2.0, jnp.float32)
    lengths = jnp.asarray([T, T - 5], jnp.int32)

    ref = batch_stats(models, transcripts, feats, lengths)
    got = batch_stats_fused(models, transcripts, feats, lengths, k_block=8)
    _stats_close(ref, got, rtol=5e-4)
    for f in ["w", "x", "xx"]:
        a = np.asarray(getattr(ref.streams[1], f))
        b = np.asarray(getattr(got.streams[1], f))
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=5e-4 * max(1.0, np.abs(a).max())
        )
