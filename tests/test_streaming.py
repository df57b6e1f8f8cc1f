"""Async input pipeline (io/pipeline.py) + streaming EM (train/streaming.py):
prefetch overlap, and shard-streamed training equivalence to train_fast."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from srhmm_tpu.io.dataset import pack_utterances
from srhmm_tpu.io.pipeline import PrefetchLoader
from srhmm_tpu.models import DIAG, GmmHmm, GmmStream, init_left_right_trans
from srhmm_tpu.train.em import train_fast
from srhmm_tpu.train.streaming import shard_batch, train_streaming


def _model(rng, S=4, M=2, D=5):
    means = rng.normal(size=(S, M, D)) * 3.0
    var = rng.uniform(0.5, 1.5, size=(S, M, D))
    w = rng.uniform(0.3, 0.7, size=(S, M))
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
    ).astype(jnp.float32)


def test_prefetch_overlaps_load_with_compute():
    """With depth=2, total wall time approaches max-sum instead of the
    serial sum of load and compute: n*(load+compute) -> load + n*compute
    (compute >= load here).  The producer thread must be loading shard k+1
    while the consumer 'computes' on shard k."""
    load_s, compute_s, n = 0.05, 0.08, 6

    def slow_load(i):
        time.sleep(load_s)
        return i

    t0 = time.perf_counter()
    out = []
    for item in PrefetchLoader(range(n), slow_load, depth=2):
        time.sleep(compute_s)  # "compute"
        out.append(item)
    wall = time.perf_counter() - t0
    assert out == list(range(n))
    serial = n * (load_s + compute_s)
    overlapped = load_s + n * compute_s
    # demand at least 60% of the theoretical overlap win
    assert wall < overlapped + 0.6 * (serial - overlapped), (wall, serial, overlapped)


def test_prefetch_propagates_producer_errors():
    def boom(i):
        if i == 2:
            raise RuntimeError("shard 2 failed")
        return i

    import pytest

    with pytest.raises(RuntimeError, match="shard 2"):
        list(PrefetchLoader(range(4), boom, depth=2))


def test_train_streaming_matches_train_fast():
    """Shard-streamed EM (stats summed over device_put-prefetched shards)
    must reproduce the resident-batch trainer's trajectory."""
    rng = np.random.default_rng(0)
    model = _model(rng)
    utts = [rng.normal(size=(24 + 2 * (i % 5), 5)) for i in range(13)]
    batch = pack_utterances(utts, pad_multiple=8, dtype=jnp.float32)

    res_fast = train_fast(model, batch, threshold=1e-4, max_iterations=6)
    host = batch.replace(
        features=np.asarray(batch.features), lengths=np.asarray(batch.lengths)
    )
    res_stream = train_streaming(
        model, shard_batch(host, 4), threshold=1e-4, max_iterations=6
    )
    assert res_stream.iterations == res_fast.iterations
    np.testing.assert_allclose(
        res_stream.log_prob_history, res_fast.log_prob_history, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_stream.model.streams[0].means),
        np.asarray(res_fast.model.streams[0].means),
        rtol=1e-4, atol=1e-4,
    )


def test_shard_batch_pads_tail():
    rng = np.random.default_rng(1)
    batch = pack_utterances(
        [rng.normal(size=(10, 3)) for _ in range(7)], pad_multiple=4
    )
    host = batch.replace(
        features=np.asarray(batch.features), lengths=np.asarray(batch.lengths)
    )
    shards = shard_batch(host, 3)
    assert len(shards) == 3
    assert all(s.features.shape == shards[0].features.shape for s in shards)
    assert sum(int((s.lengths > 0).sum()) for s in shards) == 7
