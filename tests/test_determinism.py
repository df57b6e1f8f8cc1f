"""jit-level determinism tests (SURVEY §5 race-detection row).

The reference C is trivially deterministic — single-threaded, one `main`, no
threads (hmm-full-fs/hmm_continuous_full_fs.c:106).  The JAX build is not
obviously so: batched reductions, psum orders over sharded meshes, and scan
unrolling could all introduce run-to-run nondeterminism.  These tests lock
bitwise repeatability: the same program on the same inputs must produce
bit-identical results on every run, on both unsharded and mesh-sharded paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srhmm_tpu.decode.scorer import score_batch_log
from srhmm_tpu.io.dataset import pack_utterances
from srhmm_tpu.models import DIAG, GmmHmm, GmmStream, init_left_right_trans, stack_models
from srhmm_tpu.parallel import make_mesh, replicate, shard_batch, shard_model
from srhmm_tpu.train.em import em_step, train_fast


def _toy(S=4, M=4, D=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
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
    ).astype(dtype)
    utts = [rng.normal(size=(40 + 5 * i, D)) for i in range(16)]
    batch = pack_utterances(utts, pad_multiple=16, dtype=dtype)
    return model, batch


def _assert_bitwise_equal(a, b):
    """Bitwise equality across two pytrees (NaN-safe: compares bit patterns)."""
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        xa, xb = np.atleast_1d(np.asarray(la)), np.atleast_1d(np.asarray(lb))
        assert xa.dtype == xb.dtype
        np.testing.assert_array_equal(
            xa.view(np.uint8) if xa.dtype.kind == "f" else xa,
            xb.view(np.uint8) if xb.dtype.kind == "f" else xb,
        )


@pytest.mark.parametrize("bf16_stats", [False, True])
def test_em_step_bitwise_repeatable(bf16_stats):
    model, batch = _toy()
    runs = [em_step(model, batch, bf16_stats=bf16_stats) for _ in range(2)]
    _assert_bitwise_equal(runs[0], runs[1])


def test_em_step_sharded_bitwise_repeatable():
    """Mesh-sharded EM (psum reduction path) must also be run-to-run
    bit-identical for a FIXED mesh.  (Equality ACROSS different mesh shapes
    is only approximate — reduction orders differ — and is covered with
    tolerances in test_sharding.py.)"""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, batch = _toy()
    mesh = make_mesh(n_data=4, n_model=2)
    sh_model = shard_model(model, mesh)
    sh_batch = shard_batch(batch, mesh)
    runs = [em_step(sh_model, sh_batch) for _ in range(2)]
    _assert_bitwise_equal(runs[0], runs[1])


def test_train_fast_trajectory_bitwise_repeatable():
    model, batch = _toy()
    res = [train_fast(model, batch, max_iterations=5) for _ in range(2)]
    assert res[0].iterations == res[1].iterations
    assert res[0].log_prob_history == res[1].log_prob_history
    _assert_bitwise_equal(res[0].model, res[1].model)


def test_scoring_bitwise_repeatable():
    model, batch = _toy()
    vocab = stack_models([model.replace(word=f"w{i}") for i in range(6)])
    a = np.asarray(score_batch_log(vocab, batch))
    b = np.asarray(score_batch_log(vocab, batch))
    np.testing.assert_array_equal(a.view(np.uint8), b.view(np.uint8))


def test_sharded_scoring_bitwise_repeatable():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, batch = _toy()
    vocab = stack_models([model.replace(word=f"w{i}") for i in range(6)])
    mesh = make_mesh(n_data=8, n_model=1)
    sh_batch = shard_batch(batch, mesh)
    sh_vocab = replicate(vocab, mesh)
    a = np.asarray(score_batch_log(sh_vocab, sh_batch))
    b = np.asarray(score_batch_log(sh_vocab, sh_batch))
    np.testing.assert_array_equal(a.view(np.uint8), b.view(np.uint8))
