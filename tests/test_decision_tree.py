"""Phonetic decision-tree state clustering (models/decision_tree.py)."""

import numpy as np
import pytest

from srhmm_tpu.models.decision_tree import (
    Question,
    cluster_states,
    default_questions,
    questions_from_classes,
    state_stats_from_suffstats,
)

PHONES = ["a", "b", "c"]


def _stats(units, S, D, mean_fn, n=200.0, var=1.0, seed=0):
    """Single-Gaussian moments with mean mean_fn(unit, state)."""
    P = len(units)
    occ = np.full((P, S), n)
    x = np.zeros((P, S, D))
    xx = np.zeros((P, S, D))
    for p, u in enumerate(units):
        for s in range(S):
            mu = np.asarray(mean_fn(u, s), float)
            x[p, s] = n * mu
            xx[p, s] = n * (mu * mu + var)
    return occ, x, xx


def _tri_units(centers=("k", "t")):
    return [
        (l, c, r) for c in centers for l in PHONES for r in PHONES
    ]


def test_recovers_true_context_grouping():
    """State 0 depends on the left context being 'a'; state 1 on the right
    context being 'c'; state 2 is context-independent.  The tree must find
    exactly those splits."""
    units = _tri_units(centers=("k",))
    D = 4

    def mean(u, s):
        if s == 0:
            return np.full(D, 5.0 if u[0] == "a" else -5.0)
        if s == 1:
            return np.full(D, 3.0 if u[2] == "c" else -3.0)
        return np.zeros(D)

    occ, x, xx = _stats(units, S=3, D=D, mean_fn=mean)
    res = cluster_states(units, occ, x, xx, min_occ=10.0, min_gain=10.0)

    sm = res.state_map
    for p, u in enumerate(units):
        for q, v in enumerate(units):
            same0 = (u[0] == "a") == (v[0] == "a")
            assert (sm[p, 0] == sm[q, 0]) == same0
            same1 = (u[2] == "c") == (v[2] == "c")
            assert (sm[p, 1] == sm[q, 1]) == same1
            assert sm[p, 2] == sm[q, 2]
    # 2 senones for state 0, 2 for state 1, 1 for state 2
    assert res.num_senones == 5


def test_monophone_limit_and_center_separation():
    """Huge min_gain -> no splits: one senone per (center, state); different
    centers never share."""
    units = _tri_units(centers=("k", "t"))
    occ, x, xx = _stats(units, S=2, D=3, mean_fn=lambda u, s: [0, 0, 0])
    res = cluster_states(units, occ, x, xx, min_gain=1e12)
    assert res.num_senones == 2 * 2  # centers x states
    sm = res.state_map
    k = [p for p, u in enumerate(units) if u[1] == "k"]
    t = [p for p, u in enumerate(units) if u[1] == "t"]
    assert len({sm[p, 0] for p in k}) == 1
    assert len({sm[p, 0] for p in t}) == 1
    assert sm[k[0], 0] != sm[t[0], 0]
    assert sm[k[0], 0] != sm[k[0], 1]


def test_max_senones_caps_and_best_first():
    """With a senone budget, the largest-gain split must win."""
    units = _tri_units(centers=("k",))
    D = 2

    def mean(u, s):
        if s == 0:  # big separation: gain should be taken first
            return np.full(D, 9.0 if u[0] == "a" else -9.0)
        return np.full(D, 0.5 if u[2] == "c" else -0.5)

    occ, x, xx = _stats(units, S=2, D=D, mean_fn=mean)
    res = cluster_states(
        units, occ, x, xx, min_occ=10.0, min_gain=1.0, max_senones=3
    )
    assert res.num_senones == 3
    sm = res.state_map
    # state 0 split (2 ids), state 1 not (1 id)
    assert len(set(sm[:, 0])) == 2
    assert len(set(sm[:, 1])) == 1


def test_unseen_triphone_synthesis():
    units = _tri_units(centers=("k",))
    D = 2
    mean = lambda u, s: np.full(D, 4.0 if u[0] == "a" else -4.0)
    occ, x, xx = _stats(units, S=1, D=D, mean_fn=mean)
    res = cluster_states(units, occ, x, xx, min_occ=10.0, min_gain=10.0)
    # unseen contexts route by the question answers
    sid_a = res.senone_for(("a", "k", "zz"), 0)
    sid_b = res.senone_for(("q", "k", "zz"), 0)
    p_a = units.index(("a", "k", "b"))
    p_b = units.index(("b", "k", "b"))
    assert sid_a == res.state_map[p_a, 0]
    assert sid_b == res.state_map[p_b, 0]
    # unseen center falls back to the biggest-occupancy tree of that state
    assert res.senone_for(("a", "zz", "b"), 0) in set(res.state_map[:, 0])


def test_min_occ_blocks_tiny_children():
    units = [("a", "k", "b"), ("b", "k", "b")]
    occ = np.asarray([[5.0], [500.0]])
    x = np.asarray([[[25.0]], [[2500.0]]])  # means 5.0 each
    xx = np.asarray([[[130.0]], [[13000.0]]])
    res = cluster_states(units, occ, x, xx, min_occ=50.0, min_gain=0.1)
    assert res.num_senones == 1  # the 5-frame child is unsplittable


def test_questions_from_classes_and_integration_with_tying():
    """Cluster with class questions, then drive tied embedded EM end-to-end
    on the resulting map."""
    import jax.numpy as jnp

    from srhmm_tpu.models import GmmHmm, GmmStream, init_left_right_trans
    from srhmm_tpu.models.tying import tie_from_models
    from srhmm_tpu.train.tied import tied_em_step

    rng = np.random.default_rng(5)
    units = _tri_units(centers=("k", "t"))
    P, S, M, D = len(units), 3, 2, 5

    def mean(u, s):
        return rng.normal(size=D) * (1 + s) + (3.0 if u[0] in ("a", "b") else -3.0)

    occ, x, xx = _stats(units, S=S, D=D, mean_fn=mean, seed=5)
    qs = questions_from_classes({"front": ["a", "b"], "back": ["c"]})
    res = cluster_states(units, occ, x, xx, qs, min_occ=10.0, min_gain=5.0)
    assert res.num_senones < P * S

    means = rng.normal(size=(P, S, M, D)) * 3.0
    var = rng.uniform(0.5, 1.5, size=(P, S, M, D))
    w = np.full((P, S, M), 1.0 / M)
    models = GmmHmm(
        trans=jnp.broadcast_to(init_left_right_trans(S), (P, S, S)),
        streams=(
            GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(means),
                inv_cov=jnp.asarray(1.0 / var),
                det=jnp.asarray(np.prod(var, -1)),
                cov_type="diag",
            ),
        ),
        word=tuple("-".join(u) for u in units),
    )
    tied = tie_from_models(models, res.state_map).astype(jnp.float64)
    B, T, L = 2, 60, 3
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float64)
    lengths = jnp.asarray([T, T - 7], jnp.int32)
    new_tied, lp, nv = tied_em_step(tied, transcripts, feats, lengths)
    assert float(nv) == B
    assert np.isfinite(float(lp))


def test_state_stats_from_suffstats_shapes():
    from srhmm_tpu.train.em import StreamStats, SuffStats

    P, S, M, D = 4, 3, 2, 5
    rng = np.random.default_rng(0)
    mk = lambda *sh: rng.uniform(0.1, 1.0, size=sh)
    for xx_shape in [(P, S, M, D), (P, S, M, D, D)]:
        stats = SuffStats(
            num_trans=mk(P, S, S),
            den_trans=mk(P, S),
            den_mix=mk(P, S),
            streams=(StreamStats(w=mk(P, S, M), x=mk(P, S, M, D), xx=mk(*xx_shape)),),
            log_prob=np.float64(0.0),
            num_valid=np.float64(1.0),
        )
        occ, x, xx = state_stats_from_suffstats(stats)
        assert occ.shape == (P, S) and x.shape == (P, S, D) and xx.shape == (P, S, D)
        np.testing.assert_allclose(x, np.asarray(stats.streams[0].x).sum(-2))
