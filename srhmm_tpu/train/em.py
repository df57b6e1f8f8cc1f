"""TPU fast-path Baum-Welch EM: log-space, batched, jitted, mesh-shardable.

Redesign of the reference EM loop (T1:223-346) for TPU execution:

* whole utterance batch resident on device as a padded (B, T, D) array —
  no per-utterance disk re-reads (the reference re-reads every .perfil twice
  per iteration, T1:259/287);
* TWO E-step implementations behind the `em_step` dispatcher:
  - the fused lane-major Pallas kernels (`e_step_fused_lane`,
    ops/pallas/fused_em_pallas.py) — the production TPU path for
    single-stream diagonal models (4.2x the XLA path at the headline
    shape; PERF.md), scaled to meshes by `e_step_fused_lane_sharded`
    (explicit shard_map + psum);
  - the generic XLA path (`e_step`): emission + occupancy statistics as
    GEMM-shaped contractions on the MXU, forward/backward as log-space
    `lax.scan` recursions — full covariance, multi-stream, CPU, and
    GSPMD-sharded inputs (batch on a `data` mesh axis, mixtures on a
    `model` axis; XLA inserts the ICI all-reduces).
* `em_train_scan` runs N iterations as ONE jitted lax.scan (no
  per-iteration program launches/host syncs — the production fixed-budget
  trainer); `train_fast` keeps the reference's per-iteration convergence
  rule (T1:306-346).
* covariance statistics accumulate raw moments (sum gamma, sum gamma x,
  sum gamma x x^T) and the M-step recovers the reference's
  residual-about-PRE-update-means covariance (T1:1744-1750) through the
  moment identity  sum g (x-mu0)(x-mu0)^T = XX - mu0 a^T - a mu0^T + w mu0 mu0^T,
  keeping the E-step free of (T, S, M, D, D) intermediates.

Validated against train/em_parity.py (the reference-exact oracle) in
tests/test_em_fast.py; Pallas/XLA equivalence in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from flax import struct

from ..io.dataset import UtteranceBatch
from ..models.gmm_hmm import DIAG, FINITE_PROBAB, FULL, GmmHmm, GmmStream
from ..ops.emission import log_mixture_posteriors
from ..ops.forward_backward import log_backward_full, log_forward_full


@struct.dataclass
class StreamStats:
    w: jax.Array  # (S, M)        sum_t gamma_m
    x: jax.Array  # (S, M, D)     sum_t gamma_m * x_t
    xx: jax.Array  # (S, M, D, D) full | (S, M, D) diag: second moment


@struct.dataclass
class SuffStats:
    num_trans: jax.Array  # (S, S)
    den_trans: jax.Array  # (S,)
    den_mix: jax.Array  # (S,)
    streams: tuple[StreamStats, ...]
    log_prob: jax.Array  # scalar: sum over utterances of final-state log P
    num_valid: jax.Array  # scalar: utterances with finite log P


def gmm_moment_stats(gm, feats, cov_type, stat_in=None, origin=None):
    """Occupancy-weighted GMM moment statistics as single-pass GEMMs — the
    one implementation behind the isolated (e_step), lane-major, embedded,
    and tied E-steps.

    gm: (N, G, M) mixture occupancy (gamma * posterior) over N frames and
    G groups (states, transcript positions, or senones); feats: (N, D).
    Returns (w (G, M), x (G, M, D), xx (G, M, D, D) full | (G, M, D) diag)
    in feature space.

    The big (N, G, M) tensor is read from HBM ONCE for all statistics: the
    diag path contracts the fused [y, y^2, 1] lift in one GEMM; full
    covariance needs a second contraction for the (D, D) moment.

    stat_in: optional low-precision input dtype (bf16) for the GEMMs (f32
    accumulation on the MXU); origin: optional (D,) shift o — moments are
    computed about o and exactly unshifted via
    sum g x = sum g y + o sum g and the binomial identity for the second
    moment, so low-precision rounding is relative to CENTERED magnitudes
    (see _per_utterance_stats' rounding-error note)."""
    dtype = feats.dtype
    D = feats.shape[-1]
    si = stat_in or dtype
    ones = jnp.ones_like(feats[:, :1])
    o = jnp.zeros((D,), dtype) if origin is None else origin
    y = feats - o
    gmc = gm.astype(si)
    if cov_type == FULL:
        # one GEMM pass over gm for (y, w); the (D, D) moment needs its
        # own contraction
        smk = jnp.einsum(
            "ngm,nk->gmk",
            gmc,
            jnp.concatenate([y, ones], -1).astype(si),
            preferred_element_type=dtype,
        )
        ys, w = smk[..., :D], smk[..., D]
        yy = jnp.einsum(
            "ngm,nd,ne->gmde",
            gmc,
            y.astype(si),
            y.astype(si),
            preferred_element_type=dtype,
        )
        x = ys + o * w[..., None]
        xx = (
            yy
            + o[:, None] * ys[..., None, :]
            + ys[..., :, None] * o[None, :]
            + (o[:, None] * o[None, :]) * w[..., None, None]
        )
    else:
        smk = jnp.einsum(
            "ngm,nk->gmk",
            gmc,
            jnp.concatenate([y, y * y, ones], -1).astype(si),
            preferred_element_type=dtype,
        )
        ys, yy, w = smk[..., :D], smk[..., D : 2 * D], smk[..., 2 * D]
        x = ys + o * w[..., None]
        xx = yy + 2.0 * o * ys + (o * o) * w[..., None]
    return w.astype(dtype), x.astype(dtype), xx.astype(dtype)


def _per_utterance_stats(
    model: GmmHmm, feats, length: jax.Array, bf16_stats: bool = False
):
    """E-step statistics for one padded utterance.

    feats: (T, D) array for single-stream models, or a tuple of per-stream
    (T, D_p) arrays (the reference supports up to 6 parameter streams with
    distinct feature files per stream, T1:41/T1:256-270; all streams of an
    utterance must share the frame count — the reference silently assumes
    this too, T1:274).

    bf16_stats: feed the moment GEMMs bf16 inputs (f32 accumulation on the
    MXU).  bf16xbf16 products are exact in f32, so the only error is input
    rounding (<=2^-9 relative) — for a 1.5x faster stat contraction and half
    the gm/lift HBM traffic.

    Rounding-error note: the M-step recovers covariances through the moment
    identity (sum g x^2 - 2 mu0 sum g x + mu0^2 w), which amplifies raw-moment
    rounding by ~mean^2/variance — percent-level variance error for features
    with magnitudes in the thousands (the reference fixtures) despite tiny
    raw-moment error.  To kill the amplification, the bf16 path computes
    moments about a SHIFTED ORIGIN (the stream's mean of means per dim):
    features are centered BEFORE the bf16 cast, so the rounding is relative
    to the centered magnitude (~ state spread + sigma), and the exact f32
    unshift below restores original-space moments.  Residual stat error is
    then ~2^-9 relative to centered scales — hardware-measured ~2e-6 relative
    at the headline shape with unit-variance data.  Keep False for
    parity-sensitive runs.
    """
    feats_per_stream = feats if isinstance(feats, tuple) else (feats,) * len(model.streams)
    S = model.num_states
    dtype = feats_per_stream[0].dtype
    log_trans = model.log_trans().astype(dtype)

    log_b = None
    posts = []
    for stream, sf in zip(model.streams, feats_per_stream):
        lb_s, post_s = log_mixture_posteriors(sf, stream)
        posts.append(post_s)
        log_b = lb_s if log_b is None else log_b + lb_s

    la = log_forward_full(log_b, log_trans, length)
    lbw = log_backward_full(log_b, log_trans, length)
    log_z = la[-1, S - 1]  # rows at t >= length repeat the last valid row
    valid = jnp.isfinite(log_z) & (length > 0)
    safe_z = jnp.where(valid, log_z, 0.0)

    T = feats_per_stream[0].shape[0]
    t_idx = jnp.arange(T)
    frame_mask = (t_idx < length).astype(dtype)

    lgamma = la + lbw - safe_z
    gamma = jnp.exp(jnp.minimum(lgamma, 0.0)) * frame_mask[:, None]  # (T, S)

    # banded xi statistics (calc_transition_probab T1:1609-1647)
    xi_mask = (t_idx[:-1] < length - 1).astype(dtype)
    log_xi = (
        la[:-1, :, None]
        + log_trans[None, :, :]
        + (log_b[1:] + lbw[1:])[:, None, :]
        - safe_z
    )
    xi = jnp.exp(jnp.minimum(log_xi, 0.0)) * xi_mask[:, None, None]
    num_trans = xi.sum(0)
    den_trans = (gamma[:-1] * xi_mask[:, None]).sum(0)
    den_mix = gamma.sum(0)

    stat_in = jnp.bfloat16 if bf16_stats else dtype
    stream_stats = []
    for stream, post, sf in zip(model.streams, posts, feats_per_stream):
        gm = gamma[:, :, None] * post  # (T, S, M)
        # shifted origin for bf16: center features on the stream's mean of
        # means so the bf16 rounding is relative to centered magnitudes (see
        # docstring); o == None keeps the f32 path bit-identical to before
        o = (
            jnp.mean(stream.means.astype(dtype), axis=(0, 1))
            if bf16_stats
            else None
        )
        w, x, xx = gmm_moment_stats(
            gm, sf, stream.cov_type, stat_in=stat_in, origin=o
        )
        stream_stats.append(StreamStats(w=w, x=x, xx=xx))

    zero = lambda a: jnp.where(valid, a, jnp.zeros_like(a))
    return SuffStats(
        num_trans=zero(num_trans),
        den_trans=zero(den_trans),
        den_mix=zero(den_mix),
        streams=tuple(
            StreamStats(w=zero(s.w), x=zero(s.x), xx=zero(s.xx))
            for s in stream_stats
        ),
        log_prob=jnp.where(valid, log_z, 0.0),
        num_valid=valid.astype(dtype),
    )


def e_step(model: GmmHmm, batch, bf16_stats: bool = False) -> SuffStats:
    """Batched E-step: per-utterance stats vmapped over B, summed over the
    batch axis.  Under pjit with the batch sharded on `data`, the sum is an
    ICI all-reduce.

    batch: an UtteranceBatch, or a tuple of UtteranceBatch (one per stream,
    equal lengths) for multi-stream models.
    bf16_stats: bf16-input moment GEMMs (see _per_utterance_stats).
    """
    if isinstance(batch, tuple):
        feats = tuple(b.features for b in batch)
        lengths = batch[0].lengths
        per_utt = jax.vmap(
            lambda *args: _per_utterance_stats(
                model, tuple(args[:-1]), args[-1], bf16_stats
            )
        )(*feats, lengths)
    else:
        per_utt = jax.vmap(
            lambda f, l: _per_utterance_stats(model, f, l, bf16_stats)
        )(batch.features, batch.lengths)
    return jax.tree.map(lambda a: a.sum(0), per_utt)


def update_stream(
    stream: GmmStream,
    st: StreamStats,
    den_mix: jax.Array,
    var_floor: float = 0.0,
    abs_floor=None,
    zero_det_threshold=None,
) -> GmmStream:
    """Emission-parameter update for one stream from its sufficient stats
    (the GMM half of the M-step; shared by isolated, embedded, and
    tied-state training).  Leading axes of the arrays are arbitrary — (S,)
    states, (P, S), or (N,) senones.

    abs_floor: optional replacement for the reference's ABSOLUTE variance
    floor FINITE_PROBAB (T1:1975-1977), scalar or per-dim (D,).  Training
    in affine-normalized feature space (--cmvn global) passes
    FINITE_PROBAB / std^2 so the floor acts at exactly the raw-space
    magnitudes — the absolute 1e-5 floor is the one EM quantity that is
    NOT affine-equivariant (in normalized space it floors real variances
    and costs >1e3 nats on the fixtures; hardware-debugged round 3)."""
    dtype = stream.means.dtype
    base_floor = (
        max(FINITE_PROBAB, var_floor)
        if abs_floor is None
        else jnp.maximum(jnp.asarray(abs_floor, dtype), var_floor)
    )
    touched = (den_mix > 0)[..., None]
    w_safe = jnp.where(st.w > 0, st.w, 1.0)

    weights = jnp.where(
        touched, st.w / jnp.where(den_mix > 0, den_mix, 1.0)[..., None],
        stream.weights,
    )
    weights = jnp.maximum(weights, FINITE_PROBAB)
    weights = weights / weights.sum(-1, keepdims=True)

    mu0 = stream.means
    means = jnp.where(touched[..., None], st.x / w_safe[..., None], mu0)

    old_log_det = stream.log_abs_det()
    if stream.cov_type == FULL:
        a = st.x
        cov = (
            st.xx
            - mu0[..., :, None] * a[..., None, :]
            - a[..., :, None] * mu0[..., None, :]
            + st.w[..., None, None] * mu0[..., :, None] * mu0[..., None, :]
        ) / w_safe[..., None, None]
        D = cov.shape[-1]
        eye = jnp.eye(D, dtype=dtype)
        diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
        floored = jnp.maximum(diag, base_floor)
        cov = cov + (floored - diag)[..., None] * eye
        inv_new, log_det_new = _batched_inv_logdet(cov)
        inv = jnp.where(touched[..., None, None], inv_new, stream.inv_cov)
        log_det = jnp.where(touched, log_det_new, old_log_det)
    else:
        cov = (
            st.xx - 2.0 * mu0 * st.x + st.w[..., None] * mu0 * mu0
        ) / w_safe[..., None]
        cov = jnp.maximum(cov, base_floor)
        inv_new = 1.0 / cov
        log_det_new = jnp.sum(jnp.log(cov), axis=-1)
        inv = jnp.where(touched[..., None], inv_new, stream.inv_cov)
        log_det = jnp.where(touched, log_det_new, old_log_det)

    zd = _LOG_ZERO_DET if zero_det_threshold is None else zero_det_threshold
    weights, means, inv, log_det = _repair_degenerate(
        weights, means, inv, log_det, stream.cov_type, zd
    )
    if stream.cov_type == FULL:
        # Last-resort PSD fallback (beyond the reference): if a mixture's
        # covariance is still not invertible after donor repair (e.g. the
        # whole state collapsed), fall back to its diagonal covariance —
        # always PSD after flooring.  HTK-style robustness for
        # over-parameterized models; unreachable in the fixture regime.
        still_bad = ~jnp.isfinite(log_det) | (log_det < zd)
        diag_inv = 1.0 / floored
        eye_d = jnp.eye(floored.shape[-1], dtype=dtype)
        inv = jnp.where(
            still_bad[..., None, None], diag_inv[..., None] * eye_d, inv
        )
        log_det = jnp.where(
            still_bad, jnp.sum(jnp.log(floored), axis=-1), log_det
        )
    return GmmStream(
        weights=weights,
        means=means,
        inv_cov=inv,
        # linear det kept for the .hmm export contract; may overflow in f32
        # (log_det is the authoritative fast-path value)
        det=jnp.exp(log_det),
        cov_type=stream.cov_type,
        log_det=log_det,
    )


def m_step(
    model: GmmHmm,
    stats: SuffStats,
    var_floor: float = 0.0,
    abs_floors=None,
    zero_det_thresholds=None,
) -> GmmHmm:
    """Reference-semantics parameter update (T1:1907-2000 + re-inversion),
    vectorized over (S, M).

    var_floor: minimum variance (covariance diagonal), on top of the
    reference's absolute FINITE_PROBAB floor.  The reference floors at 1e-5
    regardless of feature scale (T1:1975-1977), which under-regularizes
    features with magnitudes in the thousands (the fixture profiles); a
    relative floor keeps over-parameterized mixtures PSD.  0.0 = reference
    semantics.

    Degenerate-covariance repair (treat_zero_det, T1:2226-2265) is
    vectorized: every mixture whose determinant collapses below 1e-20 is
    re-seeded from its state's largest-determinant mixture (+/-5% mean split,
    halved weight).  The C re-seeds from successive donors; with one donor
    per state the behaviors coincide, which covers the non-pathological case.
    """
    S = model.num_states
    dtype = model.trans.dtype

    # structural mask from the model's own support: EM preserves zeros (xi is
    # zero wherever trans is), so this works for any banding (delta >= 1),
    # unlike a hard-coded delta band
    band = (model.trans > 0).astype(dtype)
    den = stats.den_trans
    trans_new = jnp.where(
        (den > 0)[:, None],
        band * stats.num_trans / jnp.where(den > 0, den, 1.0)[:, None],
        model.trans,
    )

    new_streams = [
        update_stream(
            stream, st, stats.den_mix, var_floor,
            None if abs_floors is None else abs_floors[i],
            None if zero_det_thresholds is None else zero_det_thresholds[i],
        )
        for i, (stream, st) in enumerate(zip(model.streams, stats.streams))
    ]

    return model.replace(trans=trans_new, streams=tuple(new_streams))


def _batched_inv_logdet(cov: jax.Array):
    """(…, D, D) SPD inverse + log-determinant via Cholesky (the fast-path
    replacement for the reference's LDL^T, ops/linalg_parity.py).  log-space
    determinant avoids f32 overflow on real speech covariances."""
    L = jnp.linalg.cholesky(cov)
    diag_l = jnp.diagonal(L, axis1=-2, axis2=-1)
    log_det = 2.0 * jnp.sum(jnp.log(diag_l), axis=-1)
    D = cov.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(D, dtype=cov.dtype), cov.shape)
    l_inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    inv = jnp.einsum(
        "...ki,...kj->...ij", l_inv, l_inv, preferred_element_type=cov.dtype
    )
    bad = ~jnp.isfinite(log_det)
    log_det = jnp.where(bad, -jnp.inf, log_det)
    inv = jnp.where(bad[..., None, None], 0.0, inv)
    return inv, log_det


_LOG_ZERO_DET = -46.0517018598809136  # log(1e-20), treat_zero_det trigger


def _repair_degenerate(weights, means, inv, log_det, cov_type, zd=_LOG_ZERO_DET):
    """Vectorized treat_zero_det (T1:2226-2265): re-seed collapsed mixtures
    from the state's largest-determinant mixture."""
    bad = log_det < zd  # (S, M)
    any_bad = bad.any(-1)
    donor = jnp.argmax(log_det, axis=-1)  # (S,)
    take = lambda a: jnp.take_along_axis(
        a, donor[:, None].reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
    )
    d_means, d_inv, d_ld, d_w = (take(means), take(inv), take(log_det), take(weights))
    means = jnp.where(bad[..., None], d_means * 1.05, means)
    # donor mean shrinks when it actually donated
    donated = any_bad[:, None] & (jnp.arange(means.shape[1])[None] == donor[:, None])
    means = jnp.where(donated[..., None], means * 0.95, means)
    if cov_type == FULL:
        inv = jnp.where(bad[..., None, None], d_inv, inv)
    else:
        inv = jnp.where(bad[..., None], d_inv, inv)
    log_det = jnp.where(bad, d_ld, log_det)
    weights = jnp.where(donated, weights / 2.0, weights)
    weights = jnp.where(bad, d_w / 2.0, weights)
    weights = weights / weights.sum(-1, keepdims=True)
    return weights, means, inv, log_det


def e_step_fused(
    model: GmmHmm, batch: UtteranceBatch, interpret: bool | None = None
) -> SuffStats:
    """Batched E-step with the fused Pallas emission/stat kernels
    (diagonal covariance, single stream).

    Two HBM-traffic rewrites versus e_step, both eliminating every
    (B, T, S, M) intermediate:

    * emission: `emission_log_b_pallas` folds the per-mixture lifted-feature
      GEMMs with a running logaddexp, writing only the (B, T, S) log_b;
    * GMM statistics: `emission_stats_pallas` recomputes the per-mixture
      log-likelihood in VMEM and accumulates the [x, x^2, 1] moments
      in-register, reading frames/gamma/log_b once.

    SUPERSEDED by e_step_fused_lane (the lane-major kernels that DO win,
    PERF.md); kept as the documented first iteration.  Hardware verdict
    (v5e, headline shape): 13.8 ms/iter vs the XLA path's 6.5 ms — the
    (B, T, S, M) HBM savings were outweighed by per-grid-step overhead and
    8/128-lane utilization.  em_step no longer routes here.
    """
    stream = model.streams[0]
    if len(model.streams) != 1 or stream.cov_type != DIAG:
        raise ValueError("e_step_fused: single diagonal-covariance stream only")
    from ..ops.pallas.emission_pallas import (
        _pack_constants,
        emission_log_b_pallas,
        emission_stats_pallas,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    feats = batch.features
    lengths = batch.lengths
    B, T, D = feats.shape
    S = model.num_states
    dtype = feats.dtype
    log_trans = model.log_trans().astype(dtype)

    a, bias = _pack_constants(stream, jnp.float32)
    flat = feats.reshape(B * T, D)
    # (t_block, S<=128) blocks pad the lane axis to 128: t_block=2048 is the
    # largest tile that fits the 16 MB scoped-VMEM budget double-buffered
    t_block = next(
        k for k in (2048, 1024, 512, 256, 128, 64, 8, 1) if (B * T) % k == 0
    )
    log_b = emission_log_b_pallas(
        flat, a, bias, t_block=t_block, interpret=interpret
    ).reshape(B, T, S).astype(dtype)

    def lattice_stats(lb, length):
        la = log_forward_full(lb, log_trans, length)
        lbw = log_backward_full(lb, log_trans, length)
        log_z = la[-1, S - 1]
        valid = jnp.isfinite(log_z) & (length > 0)
        safe_z = jnp.where(valid, log_z, 0.0)
        t_idx = jnp.arange(T)
        frame_mask = (t_idx < length).astype(dtype)
        gamma = (
            jnp.exp(jnp.minimum(la + lbw - safe_z, 0.0))
            * frame_mask[:, None]
            * valid.astype(dtype)
        )
        xi_mask = (t_idx[:-1] < length - 1).astype(dtype) * valid.astype(dtype)
        log_xi = (
            la[:-1, :, None]
            + log_trans[None, :, :]
            + (lb[1:] + lbw[1:])[:, None, :]
            - safe_z
        )
        xi = jnp.exp(jnp.minimum(log_xi, 0.0)) * xi_mask[:, None, None]
        num_trans = xi.sum(0)
        den_trans = (gamma[:-1] * xi_mask[:, None]).sum(0)
        return num_trans, den_trans, gamma, log_z, valid

    num_trans, den_trans, gamma, log_z, valid = jax.vmap(lattice_stats)(
        log_b, lengths
    )

    smk = emission_stats_pallas(
        flat,
        gamma.reshape(B * T, S),
        log_b.reshape(B * T, S),
        a,
        bias,
        t_block=t_block,
        interpret=interpret,
    ).astype(dtype)  # (S, M, 2D+1)
    x, xx, w = smk[..., :D], smk[..., D : 2 * D], smk[..., 2 * D]

    return SuffStats(
        num_trans=num_trans.sum(0),
        den_trans=den_trans.sum(0),
        den_mix=gamma.sum((0, 1)),
        streams=(StreamStats(w=w, x=x, xx=xx),),
        log_prob=jnp.sum(jnp.where(valid, log_z, 0.0)),
        num_valid=valid.astype(dtype).sum(),
    )




def _num_trans_from_xi(xi_or_uv, trans, band):
    """num_trans from backward_stats_pallas' xi output: banded = exact
    per-diagonal xi (already weighted by the transition probabilities);
    dense = trans * uv (the U/V factorization)."""
    if band is None:
        return trans * xi_or_uv
    S = trans.shape[-1]
    xi_sum = xi_or_uv.sum(-1)  # (band+1, S) destination-indexed
    num = jnp.zeros((S, S), trans.dtype)
    for d in range(band + 1):
        j = jnp.arange(d, S)
        num = num.at[j - d, j].set(xi_sum[d, d:])
    return num


def e_step_fused_lane(
    model: GmmHmm,
    batch: UtteranceBatch,
    feats_tdb: jax.Array | None = None,
    k_block: int = 16,
    band: int | None = None,
    interpret: bool | None = None,
) -> SuffStats:
    """Batched E-step on the fused LANE-MAJOR Pallas kernels
    (ops/pallas/fused_em_pallas.py) — single-stream models, diagonal OR
    full covariance (the full-cov quadratic form and (D, D) moment
    statistics ride the same per-frame GEMMs through the lifted features
    [x; vec(x x^T)]; pack_lane_constants).

    Two kernels, batch on the 128-lane axis:
      K1 emission + scaled forward  -> log_b, log-alpha  (one feats read)
      K2 scaled backward + ALL statistics (xi, occupancies, GMM moments)
    Nothing of shape (B, T, S, M), (B, T, S, S), or log-beta ever touches
    HBM (~240 MB/iter vs ~900 MB for e_step at the headline shape).

    feats_tdb: optional precomputed (T, D, B) transpose of batch.features —
    pass it when calling in a loop (train_fast does) so the transpose isn't
    re-done every iteration.
    band: static transition band width (ops.pallas.fused_em_pallas.trans_band,
    computed on the host from the concrete initial model) — the banded
    left-right recursions run over band+1 rolled diagonals instead of the
    dense (S, S, B) update.  None = dense (any transition structure).

    Any (B, T) shape is accepted: the batch axis is zero-padded to the
    128-lane tile (zero-length rows are inert — masked out of every
    statistic and excluded from num_valid/log_prob) and the time axis to
    the k_block tile (frames at t >= length are masked; the log-alpha
    rows just repeat).  Statistics are bitwise independent of the padding.
    """
    stream = model.streams[0]
    if len(model.streams) != 1 or stream.cov_type not in (DIAG, FULL):
        raise ValueError("e_step_fused_lane: single-stream models only")
    from ..ops.pallas.fused_em_pallas import (
        NEG_INF,
        backward_stats_pallas,
        emit_forward_pallas,
        pack_lane_constants,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    feats = batch.features
    lengths = batch.lengths
    B, T, D = feats.shape
    S = model.num_states
    M = stream.num_mixtures
    dtype = jnp.float32
    if stream.cov_type == FULL:
        # the full-cov unrolled block carries (M*S*D, B) z and (D+D²+1, B)
        # lift temporaries; k=16 measures within 1% of k=8 and bounds
        # Mosaic compile time/VMEM (hardware-tuned, scratch/bench_fullcov.py)
        k_block = min(k_block, 16)
    # k_block = 128 statically unrolls past Mosaic's practical compile
    # budget (hardware-measured: minutes; 16-64 are within noise of each
    # other, scratch/sweep_kblock.py)
    k_block = min(k_block, 64)

    # pad lanes to the 128-lane tile and time to the k_block tile instead
    # of bailing to the XLA path / shrinking the unroll factor
    pad_b = (-B) % 128
    pad_t = (-T) % k_block
    if pad_b or pad_t:
        feats = jnp.pad(feats, ((0, pad_b), (0, pad_t), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad_b))
        if feats_tdb is not None:
            feats_tdb = jnp.pad(feats_tdb, ((0, pad_t), (0, 0), (0, pad_b)))
        B += pad_b
        T += pad_t

    if feats_tdb is None:
        feats_tdb = jnp.transpose(feats.astype(dtype), (1, 2, 0))  # (T, D, B)
    # shifted origin (mean of means): the lifted-feature GEMM and the moment
    # accumulation operate at residual scale instead of raw feature scale —
    # the same cancellation-avoidance as the bf16 shifted-origin moments
    # (_per_utterance_stats); the unshift below is exact in f32
    origin = jnp.mean(stream.means.astype(dtype), axis=(0, 1))  # (D,)
    a_ms, bias_g, bias_ms, logw_ms = pack_lane_constants(
        stream, dtype, origin=origin
    )
    trans = model.trans.astype(dtype)

    log_b, la = emit_forward_pallas(
        feats_tdb, a_ms, bias_g, bias_ms, logw_ms, trans, lengths, origin,
        k_block=k_block, band=band, interpret=interpret,
    )
    log_z = la[-1, S - 1, :]  # (B,) — rows repeat past each length
    valid = jnp.isfinite(log_z) & (log_z > NEG_INF / 2) & (lengths > 0)
    vmask = valid.astype(dtype)
    safe_z = jnp.where(valid, log_z, 0.0)

    uv, den_trans, den_mix, mom = backward_stats_pallas(
        feats_tdb, log_b, la, a_ms, bias_g, bias_ms, logw_ms, trans,
        lengths, safe_z, vmask, origin,
        k_block=k_block, band=band, interpret=interpret,
    )
    L = (D + D * D) if stream.cov_type == FULL else 2 * D  # moment width
    mom = mom.reshape(M, S, L + 1).transpose(1, 0, 2)  # (S, M, L+1)
    # unshift the about-origin moments back to feature space (exact):
    #   sum g x = sum g y + o sum g;  the second moment by the binomial
    #   identity in o (same algebra as _per_utterance_stats)
    o = origin
    w = mom[..., L]
    ys = mom[..., :D]
    x = ys + o * w[..., None]
    if stream.cov_type == FULL:
        yy = mom[..., D:L].reshape(S, M, D, D)
        xx = (
            yy
            + o[:, None] * ys[..., None, :]
            + ys[..., :, None] * o[None, :]
            + (o[:, None] * o[None, :]) * w[..., None, None]
        )
    else:
        yy = mom[..., D:L]
        xx = yy + 2.0 * o * ys + (o * o) * w[..., None]
    return SuffStats(
        num_trans=_num_trans_from_xi(uv, trans, band),
        den_trans=den_trans.sum(-1),
        den_mix=den_mix.sum(-1),
        streams=(StreamStats(w=w, x=x, xx=xx),),
        log_prob=jnp.sum(safe_z),
        num_valid=vmask.sum(),
    )


def e_step_fused_lane_multi(
    model: GmmHmm,
    batches,
    k_block: int = 32,
    band: int | None = None,
    interpret: bool | None = None,
) -> SuffStats:
    """Multi-stream batched E-step on the fused lane-major Pallas kernels
    (ops/pallas/fused_em_pallas.py multi-stream variants).

    The reference composes per-frame emissions as the PRODUCT of
    per-stream GMM likelihoods (T1:1437-1441); here each stream keeps its
    own (T, D_p, B) features and GEMM constants, K1 sums the per-stream
    log-likelihoods before the forward recursion, and K2 recomputes each
    stream's own mixture logsumexp in VMEM for its posterior/moment GEMMs.

    batches: tuple of UtteranceBatch, one per stream (equal lengths —
    the reference silently assumes this too, T1:274).  All streams must
    share the covariance type.  Any (B, T) accepted (zero-padding as in
    e_step_fused_lane)."""
    from ..ops.pallas.fused_em_pallas import (
        NEG_INF,
        backward_stats_pallas_multi,
        emit_forward_pallas_multi,
        pack_lane_constants,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    streams = model.streams
    P = len(streams)
    if P != len(batches):
        raise ValueError("e_step_fused_lane_multi: one batch per stream")
    cov = streams[0].cov_type
    if any(s.cov_type != cov for s in streams) or cov not in (DIAG, FULL):
        raise ValueError(
            "e_step_fused_lane_multi: homogeneous diag/full streams only"
        )
    S = model.num_states
    dtype = jnp.float32
    lengths = batches[0].lengths
    B, T, _ = batches[0].features.shape
    if cov == FULL:
        k_block = min(k_block, 16)
    k_block = min(k_block, 64)
    pad_b = (-B) % 128
    pad_t = (-T) % k_block
    feats_list = []
    for b in batches:
        f = b.features
        if pad_b or pad_t:
            f = jnp.pad(f, ((0, pad_b), (0, pad_t), (0, 0)))
        feats_list.append(jnp.transpose(f.astype(dtype), (1, 2, 0)))
    if pad_b:
        lengths = jnp.pad(lengths, (0, pad_b))

    origins = [
        jnp.mean(s.means.astype(dtype), axis=(0, 1)) for s in streams
    ]
    packed = [
        pack_lane_constants(s, dtype, origin=o)
        for s, o in zip(streams, origins)
    ]
    a_list = tuple(p[0] for p in packed)
    bias_g_list = tuple(p[1] for p in packed)
    bias_list = tuple(p[2] for p in packed)
    logw_list = tuple(p[3] for p in packed)
    trans = model.trans.astype(dtype)

    log_b, la = emit_forward_pallas_multi(
        tuple(feats_list), a_list, bias_g_list, bias_list, logw_list,
        trans, lengths, tuple(origins),
        k_block=k_block, band=band, interpret=interpret,
    )
    log_z = la[-1, S - 1, :]
    valid = jnp.isfinite(log_z) & (log_z > NEG_INF / 2) & (lengths > 0)
    vmask = valid.astype(dtype)
    safe_z = jnp.where(valid, log_z, 0.0)

    uv, den_trans, den_mix, moms = backward_stats_pallas_multi(
        tuple(feats_list), log_b, la, a_list, bias_g_list, bias_list,
        logw_list, trans, lengths, safe_z, vmask, tuple(origins),
        k_block=k_block, band=band, interpret=interpret,
    )
    stream_stats = []
    for p, (stream, mom) in enumerate(zip(streams, moms)):
        D = stream.dim
        M = stream.num_mixtures
        L = (D + D * D) if cov == FULL else 2 * D
        mom = mom.reshape(M, S, L + 1).transpose(1, 0, 2)  # (S, M, L+1)
        o = origins[p]
        w = mom[..., L]
        ys = mom[..., :D]
        x = ys + o * w[..., None]
        if cov == FULL:
            yy = mom[..., D:L].reshape(S, M, D, D)
            xx = (
                yy
                + o[:, None] * ys[..., None, :]
                + ys[..., :, None] * o[None, :]
                + (o[:, None] * o[None, :]) * w[..., None, None]
            )
        else:
            yy = mom[..., D:L]
            xx = yy + 2.0 * o * ys + (o * o) * w[..., None]
        stream_stats.append(StreamStats(w=w, x=x, xx=xx))
    return SuffStats(
        num_trans=_num_trans_from_xi(uv, trans, band),
        den_trans=den_trans.sum(-1),
        den_mix=den_mix.sum(-1),
        streams=tuple(stream_stats),
        log_prob=jnp.sum(safe_z),
        num_valid=vmask.sum(),
    )


def e_step_fused_lane_sharded(
    model: GmmHmm,
    batch: UtteranceBatch,
    mesh,
    axis: str = "data",
    k_block: int = 32,
    band: int | None = None,
    interpret: bool | None = None,
) -> SuffStats:
    """Data-parallel fused E-step: each device runs the lane-major Pallas
    kernels on its local batch shard, statistics psum over `axis` (the EM
    stats are linear in the data, SURVEY §2.4 DP row).  This is how the
    fused kernels scale to a pod: GSPMD cannot partition pallas_call, so
    the partitioning is explicit shard_map + ICI all-reduce.

    The batch axis must divide the mesh axis; model is replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if band is None:
        band = _trans_band_host(model.trans)
    feats = jax.device_put(
        batch.features, NamedSharding(mesh, P(axis, None, None))
    )
    lengths = jax.device_put(batch.lengths, NamedSharding(mesh, P(axis)))
    treedef = jax.tree.structure(model)
    fn = _jitted_fused_shard(mesh, axis, k_block, band, interpret, treedef)
    return fn(model, feats, lengths)


def _trans_band_host(trans):
    from ..ops.pallas.fused_em_pallas import trans_band

    return trans_band(trans)


@lru_cache(maxsize=32)
def _jitted_fused_shard(mesh, axis, k_block, band, interpret, model_treedef):
    """Cached jitted shard_map fused E-step (one trace per mesh/config —
    same policy as parallel/sequence.py)."""
    from jax.sharding import PartitionSpec as P

    model_spec = jax.tree.unflatten(
        model_treedef, [P()] * model_treedef.num_leaves
    )

    def shard_fn(model, feats, lengths):
        local = UtteranceBatch(features=feats, lengths=lengths)
        st = e_step_fused_lane(
            model, local, k_block=k_block, band=band, interpret=interpret
        )
        return jax.tree.map(lambda a: jax.lax.psum(a, axis), st)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(model_spec, P(axis, None, None), P(axis)),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # psum above establishes the replicated out_specs by construction
        check_vma=False,
    )
    return jax.jit(fn)


def _with_log_det(model: GmmHmm) -> GmmHmm:
    """Ensure every stream carries a materialized log_det array (scan
    carries need a stable pytree structure; m_step always emits one)."""
    if all(s.log_det is not None for s in model.streams):
        return model
    return model.replace(
        streams=tuple(
            s if s.log_det is not None else s.replace(log_det=s.log_abs_det())
            for s in model.streams
        )
    )


_m_step_jit = jax.jit(m_step, static_argnames=("var_floor",))


@partial(jax.jit, static_argnames=("var_floor", "bf16_stats"))
def _em_step_xla(
    model: GmmHmm,
    batch,
    var_floor: float = 0.0,
    bf16_stats: bool = False,
):
    stats = e_step(model, batch, bf16_stats=bf16_stats)
    new_model = m_step(model, stats, var_floor=var_floor)
    return new_model, stats.log_prob, stats.num_valid


@partial(jax.jit, static_argnames=("var_floor", "k_block", "band"))
def _em_step_fused_lane(
    model: GmmHmm,
    batch,
    feats_tdb,
    var_floor: float = 0.0,
    k_block: int = 32,
    band: int | None = None,
):
    if isinstance(batch, tuple):
        stats = e_step_fused_lane_multi(
            model, batch, k_block=k_block, band=band, interpret=False
        )
    else:
        stats = e_step_fused_lane(
            model, batch, feats_tdb, k_block=k_block, band=band,
            interpret=False,
        )
    new_model = m_step(model, stats, var_floor=var_floor)
    return new_model, stats.log_prob, stats.num_valid


def _fused_lane_eligible(model: GmmHmm, batch, bf16_stats: bool) -> bool:
    """The fused lane-major Pallas E-step handles: diagonal or full
    covariance (homogeneous across streams), single- OR multi-stream
    (e_step_fused_lane / e_step_fused_lane_multi), f32 batches (any B/T —
    the wrappers zero-pad to the lane/time tiles), unsharded placement,
    TPU backend."""
    if bf16_stats:
        return False
    cov = model.streams[0].cov_type
    if cov not in (DIAG, FULL) or any(
        s.cov_type != cov for s in model.streams
    ):
        return False
    parts = batch if isinstance(batch, tuple) else (batch,)
    if isinstance(batch, tuple) and len(parts) != len(model.streams):
        return False
    if not isinstance(batch, tuple) and len(model.streams) != 1:
        return False
    if jax.default_backend() != "tpu":
        return False
    for b in parts:
        if b.features.dtype != jnp.float32:
            return False
        try:
            if len(b.features.sharding.device_set) > 1:
                return False  # GSPMD can't partition pallas_call; XLA path
        except Exception:
            return False  # tracers / unknown placement: stay on XLA path
    return True


def em_step(
    model: GmmHmm,
    batch,
    var_floor: float = 0.0,
    fused: bool | None = None,
    bf16_stats: bool = False,
    feats_tdb=None,
    band: int | None = None,
):
    """One full EM iteration: (new_model, total_log_prob, num_valid).

    fused: None (default) auto-selects the fused lane-major Pallas E-step
    (ops/pallas/fused_em_pallas.py) when eligible — single diag-cov stream,
    f32, unsharded, TPU backend (hardware-measured ~2.9x over the XLA path
    at the headline shape); True forces it (errors if ineligible); False
    forces the XLA scan path.
    bf16_stats=True feeds the XLA path's moment GEMMs bf16 inputs with f32
    accumulation (shifted-origin moments keep the stat error ~2e-6; see
    _per_utterance_stats).
    feats_tdb / band: optional precomputed (T, D, B) feature transpose and
    static transition band width for the fused path (train_fast precomputes
    both so loops don't pay the transpose per iteration)."""
    if fused and bf16_stats:
        raise ValueError(
            "em_step: fused=True has no bf16 stats path; pass one or the other"
        )
    use_fused = (
        _fused_lane_eligible(model, batch, bf16_stats) if fused is None else fused
    )
    if use_fused:
        if band is None:
            from ..ops.pallas.fused_em_pallas import trans_band

            band = trans_band(model.trans)
        return _em_step_fused_lane(
            model, batch, feats_tdb, var_floor=var_floor, band=band
        )
    return _em_step_xla(model, batch, var_floor, bf16_stats)


def em_step_time_sharded(model, batch, mesh, var_floor: float = 0.0, axis="time"):
    """One EM iteration with the TIME axis sequence-parallel across chips
    (parallel/sequence.py): E-step statistics are psum-reduced over the
    `axis` mesh axis, M-step runs replicated.  Use when single utterances
    outgrow one chip's HBM; otherwise em_step (data-parallel) is faster."""
    from ..parallel.sequence import e_step_time_sharded

    stats = e_step_time_sharded(model, batch, mesh, axis=axis)
    new_model = _m_step_jit(model, stats, var_floor=var_floor)
    return new_model, stats.log_prob, stats.num_valid


@partial(
    jax.jit, static_argnames=("n_iters", "var_floor", "fused", "band", "k_block")
)
def em_train_scan(
    model: GmmHmm,
    batch: UtteranceBatch,
    n_iters: int,
    feats_tdb=None,
    var_floor: float = 0.0,
    fused: bool = True,
    band: int | None = None,
    k_block: int = 32,
    abs_floors=None,
    zero_det_thresholds=None,
):
    """N EM iterations as ONE jitted lax.scan — no per-iteration program
    launches or host syncs (the reference's convergence check forces a host
    round-trip per iteration; production training at a fixed iteration
    budget doesn't need it).  Returns (final model, (n_iters,) log-prob
    history, (n_iters,) num_valid history).

    fused=True runs the lane-major Pallas E-step (TPU; pass feats_tdb and
    band precomputed); False the XLA path (any backend/model)."""
    # m_step always emits log_det arrays; a None input would change the
    # scan carry's pytree structure mid-loop
    model = _with_log_det(model)

    def step(m, _):
        if fused and isinstance(batch, tuple):
            st = e_step_fused_lane_multi(
                m, batch, k_block=k_block, band=band, interpret=False
            )
        elif fused:
            st = e_step_fused_lane(
                m, batch, feats_tdb, k_block=k_block, band=band, interpret=False
            )
        else:
            st = e_step(m, batch)
        new = m_step(
            m, st, var_floor=var_floor, abs_floors=abs_floors,
            zero_det_thresholds=zero_det_thresholds,
        )
        return new, (st.log_prob, st.num_valid)

    final, (lps, nvs) = jax.lax.scan(step, model, None, length=n_iters)
    return final, lps, nvs


def em_train_scan_sharded(
    model: GmmHmm,
    batch: UtteranceBatch,
    n_iters: int,
    mesh,
    axis: str = "data",
    var_floor: float = 0.0,
    k_block: int = 32,
    band: int | None = None,
    interpret: bool | None = None,
):
    """N DATA-PARALLEL EM iterations as ONE jitted shard_map(lax.scan) —
    multi-chip training with the same dispatch amortization as the
    single-chip em_train_scan.

    The whole N-iteration scan lives INSIDE the shard_map: each device
    runs the fused lane-major Pallas E-step on its batch shard, the
    sufficient statistics psum over `axis` (ICI all-reduce — EM stats are
    linear in the data, SURVEY §2.4 DP row), and every device computes
    the identical M-step from the reduced stats, keeping the scan carry
    replicated by construction.  A per-iteration shard_map call
    (e_step_fused_lane_sharded) pays the host dispatch round-trip every
    iteration — ~25-50 ms on the tunneled backend against ~1 ms of
    compute, making 8-chip data-parallel training SLOWER than one chip;
    this form pays it once per N iterations.

    Returns (final model, (n_iters,) log-prob history, (n_iters,)
    num_valid history) — trajectory identical to the per-step loop
    (test-locked on the virtual CPU mesh and in dryrun_multichip).

    The batch axis must divide the mesh `axis`; the model is replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if band is None:
        band = _trans_band_host(model.trans)
    model = _with_log_det(model)
    feats = jax.device_put(
        batch.features, NamedSharding(mesh, P(axis, None, None))
    )
    lengths = jax.device_put(batch.lengths, NamedSharding(mesh, P(axis)))
    fn = _jitted_sharded_scan(
        mesh, axis, n_iters, var_floor, k_block, band, interpret,
        jax.tree.structure(model),
    )
    return fn(model, feats, lengths)


@lru_cache(maxsize=32)
def _jitted_sharded_scan(
    mesh, axis, n_iters, var_floor, k_block, band, interpret, model_treedef
):
    """Cached jitted shard_map N-iteration EM scan (one trace per
    mesh/config, same policy as _jitted_fused_shard)."""
    from jax.sharding import PartitionSpec as P

    model_spec = jax.tree.unflatten(
        model_treedef, [P()] * model_treedef.num_leaves
    )

    def shard_fn(model, feats, lengths):
        local = UtteranceBatch(features=feats, lengths=lengths)
        feats_tdb = jnp.transpose(
            feats.astype(jnp.float32), (1, 2, 0)
        )  # local shard transpose, once for all N iterations

        def step(m, _):
            st = e_step_fused_lane(
                m, local, feats_tdb, k_block=k_block, band=band,
                interpret=interpret,
            )
            st = jax.tree.map(lambda a: jax.lax.psum(a, axis), st)
            new = m_step(m, st, var_floor=var_floor)
            return new, (st.log_prob, st.num_valid)

        final, (lps, nvs) = jax.lax.scan(step, model, None, length=n_iters)
        return final, lps, nvs

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(model_spec, P(axis, None, None), P(axis)),
        out_specs=(model_spec, P(), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # psum inside the scan body establishes replication by construction
        check_vma=False,
    )
    return jax.jit(fn)


def em_train_scan_time_sharded(
    model: GmmHmm,
    batch,
    n_iters: int,
    mesh,
    axis: str = "time",
    var_floor: float = 0.0,
):
    """N SEQUENCE-PARALLEL EM iterations as ONE jitted shard_map(lax.scan)
    — the em_train_scan_sharded dispatch amortization for the TIME-sharded
    E-step (parallel/sequence.py): each device runs its time shard's
    block-operator lattices + boundary exchanges per iteration, statistics
    psum over `axis` inside the scan body, and the replicated M-step is the
    scan carry.  The per-iteration em_step_time_sharded pays a ~25-50 ms
    host round-trip per iteration on the tunneled backend; this form pays
    it once per N iterations (train_fast(time_mesh=...) drives it through
    the chunked convergence driver).

    batch: UtteranceBatch or tuple of per-stream batches;
    batch.max_frames must divide by the mesh's time axis.  Returns
    (final model, (n_iters,) log-prob history, (n_iters,) num_valid).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batches = batch if isinstance(batch, tuple) else (batch,)
    lengths = batches[0].lengths
    feats = tuple(b.features for b in batches)
    n_dev = mesh.shape[axis]
    T = feats[0].shape[1]
    if T % n_dev:
        raise ValueError(
            f"time axis {T} not divisible by mesh axis '{axis}' ({n_dev}); "
            "pack the batch padded to a multiple"
        )
    model = _with_log_det(model)
    feats = tuple(
        jax.device_put(f, NamedSharding(mesh, P(None, axis, None)))
        for f in feats
    )
    fn = _jitted_time_sharded_scan(
        mesh, axis, n_iters, var_floor, jax.tree.structure(model), len(feats)
    )
    return fn(model, feats, lengths)


@lru_cache(maxsize=32)
def _jitted_time_sharded_scan(
    mesh, axis, n_iters, var_floor, model_treedef, n_streams
):
    """Cached jitted shard_map N-iteration sequence-parallel EM scan (one
    trace per mesh/config, same policy as _jitted_sharded_scan)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sequence import _e_step_shard

    n_dev = mesh.shape[axis]
    model_spec = jax.tree.unflatten(
        model_treedef, [P()] * model_treedef.num_leaves
    )

    def shard_fn(model, feats_loc, lengths):
        def step(m, _):
            st = _e_step_shard(
                m, feats_loc, lengths, n_dev=n_dev, axis=axis
            )  # stats already psum-reduced over `axis`
            new = m_step(m, st, var_floor=var_floor)
            return new, (st.log_prob, st.num_valid)

        final, (lps, nvs) = jax.lax.scan(step, model, None, length=n_iters)
        return final, lps, nvs

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            model_spec,
            (P(None, axis, None),) * n_streams,
            P(),
        ),
        out_specs=(model_spec, P(), P()),
        # the psums inside _e_step_shard establish replication of the
        # stats (and hence the M-step carry) by construction
        check_vma=False,
    )
    return jax.jit(fn)


def train_fast(
    model: GmmHmm,
    batch: UtteranceBatch,
    threshold: float = 1.0e-3,
    max_iterations: int = 100,
    var_floor: float = 0.0,
    time_mesh=None,
    data_mesh=None,
    chunk: int = 8,
    log_prob_offset: float = 0.0,
    abs_floors=None,
    zero_det_thresholds=None,
):
    """EM driver with the reference's convergence rule
    (|old - new| / |old| <= threshold, old initialized to 1.0, final pass
    not applying an update — T1:306-346).

    Iterations execute in device-side em_train_scan chunks, speculatively
    pipelined by the chunked convergence driver (train/driver.py) — the
    trajectory is bit-identical to the per-iteration loop, but the host
    round trip is paid once per `chunk` iterations instead of per
    iteration (on the tunneled TPU that round trip is ~25-50 ms against
    sub-ms iteration compute).

    time_mesh: optional ("time",) Mesh — run sequence-parallel
    (em_train_scan_time_sharded: the N-iteration scan INSIDE one
    shard_map, same dispatch amortization as the other paths).
    data_mesh: optional Mesh with a "data" axis — run data-parallel via
    em_train_scan_sharded (the batch must divide the axis; fused-eligible
    models)."""
    from .driver import chunked_convergence_train
    from .em_parity import TrainResult

    if data_mesh is not None:
        from ..ops.pallas.fused_em_pallas import trans_band

        dp_band = trans_band(model.trans)
        run = lambda m, k: em_train_scan_sharded(
            m, batch, k, data_mesh, var_floor=var_floor, band=dp_band
        )
        model, iteration, history, n_valid = chunked_convergence_train(
            model, run, threshold=threshold, max_iterations=max_iterations,
            chunk=chunk, log_prob_offset=log_prob_offset,
        )
        return TrainResult(
            model=model,
            iterations=iteration,
            mean_log_prob=history[-1] / max(n_valid, 1),
            exemplar_count=n_valid,
            log_prob_history=history,
        )

    if time_mesh is not None:
        # sequence-parallel training rides the same chunked device-scan
        # driver as the single-device/data-parallel paths (round 4): the
        # whole chunk of iterations runs inside one shard_map(lax.scan),
        # so the host round-trip is paid per chunk, not per iteration
        run = lambda m, k: em_train_scan_time_sharded(
            m, batch, k, time_mesh, var_floor=var_floor
        )
        model, iteration, history, n_valid = chunked_convergence_train(
            model, run, threshold=threshold, max_iterations=max_iterations,
            chunk=chunk, log_prob_offset=log_prob_offset,
        )
        return TrainResult(
            model=model,
            iterations=iteration,
            mean_log_prob=history[-1] / max(n_valid, 1),
            exemplar_count=n_valid,
            log_prob_history=history,
        )

    # loop-invariant fused-path precomputation: the (T, D, B) feature
    # transpose and the static transition band (the band is structural and
    # preserved by EM, so the initial model decides it once)
    use_fused = _fused_lane_eligible(model, batch, False)
    feats_tdb = None
    band = None
    if use_fused:
        from ..ops.pallas.fused_em_pallas import trans_band

        band = trans_band(model.trans)
        if not isinstance(batch, tuple):
            feats_tdb = jnp.transpose(batch.features, (1, 2, 0))

    run = lambda m, k: em_train_scan(
        m, batch, k, feats_tdb, var_floor=var_floor, fused=use_fused,
        band=band, abs_floors=abs_floors,
        zero_det_thresholds=zero_det_thresholds,
    )
    model, iteration, history, n_valid = chunked_convergence_train(
        model, run, threshold=threshold, max_iterations=max_iterations,
        chunk=chunk, log_prob_offset=log_prob_offset,
    )
    return TrainResult(
        model=model,
        iterations=iteration,
        mean_log_prob=history[-1] / max(n_valid, 1),
        exemplar_count=n_valid,
        log_prob_history=history,
    )


# ---------------------------------------------------------------------------
# lane-major batched E-step
# ---------------------------------------------------------------------------


def _log_forward_lattice_tb(log_b_tsb, log_trans, lengths):
    """Forward lattice with (S, B) carries — batch on the 128-lane axis.

    The vmapped per-utterance scan carries (B, S) arrays whose minor axis is
    S (8..64): only S of 128 VPU lanes do work.  Carrying (S, B) puts the
    batch in the lanes (hardware-measured ~4x on the EM step at B=2048, S=8).

    log_b_tsb: (T, S, B); returns (T, S, B) log-alpha (rows at t >= length
    repeat the last valid row).
    """
    T, S, B = log_b_tsb.shape
    dtype = log_b_tsb.dtype
    start = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) == 0, 0.0, -jnp.inf
    ).astype(dtype)
    init = log_b_tsb[0] + start

    def step(carry, inputs):
        lb, t = inputs
        cand = carry[:, None, :] + log_trans[:, :, None]  # (from, to, B)
        new = jax.nn.logsumexp(cand, axis=0) + lb
        new = jnp.where(t < lengths[None, :], new, carry)
        return new, new

    ts = jnp.arange(1, T)
    _, rest = jax.lax.scan(step, init, (log_b_tsb[1:], ts), unroll=4)
    return jnp.concatenate([init[None], rest], axis=0)


def _log_backward_lattice_tb(log_b_tsb, log_trans, lengths):
    """Backward lattice with (S, B) carries, final-state initialization."""
    T, S, B = log_b_tsb.shape
    dtype = log_b_tsb.dtype
    beta_T = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) == S - 1, 0.0, -jnp.inf
    ).astype(dtype)
    beta_T = jnp.broadcast_to(beta_T, (S, B))
    last = lengths - 1

    def step(carry, inputs):
        lb_next, t = inputs
        cand = log_trans[:, :, None] + (lb_next + carry)[None, :, :]
        new = jax.nn.logsumexp(cand, axis=1)
        new = jnp.where(t < last[None, :], new, beta_T)
        return new, new

    ts = jnp.arange(T - 1)
    _, betas = jax.lax.scan(
        step, beta_T, (log_b_tsb[1:], ts), reverse=True, unroll=4
    )
    return jnp.concatenate([betas, beta_T[None]], axis=0)


def e_step_lane_major(
    model: GmmHmm, batch: UtteranceBatch, lattices: str = "scan"
) -> SuffStats:
    """Batched E-step with lane-major (S, B) lattice layout.

    Rationale: the vmapped path's scans carry (B, S) arrays whose minor axis
    is S (8..64) — only S of the VPU's 128 lanes do work.  This variant puts
    the batch on the lane axis.  Numerically equivalent to e_step
    (test-locked).

    SUPERSEDED by e_step_fused_lane; kept as the documented intermediate
    experiment (XLA lane-major is transpose-bound and its (T, S, B) scan
    hangs XLA compilation on this toolchain — PERF.md).
    lattices="scan": XLA (T, S, B) lattice scans; lattices="pallas": the
    time-blocked Pallas lattice kernels (ops/pallas/lattice_pallas.py)."""
    feats = batch.features  # (B, T, D)
    lengths = batch.lengths
    B, T, D = feats.shape
    S = model.num_states
    dtype = feats.dtype
    log_trans = model.log_trans().astype(dtype)

    flat = feats.reshape(B * T, D)
    log_b = None
    posts = []
    for stream in model.streams:
        lb_s, post_s = log_mixture_posteriors(flat, stream)  # (B*T,S),(B*T,S,M)
        posts.append(post_s.reshape(B, T, S, -1))
        lb_s = lb_s.reshape(B, T, S)
        log_b = lb_s if log_b is None else log_b + lb_s

    lb_tsb = jnp.transpose(log_b, (1, 2, 0))  # (T, S, B)
    if lattices == "pallas":
        from ..ops.pallas.lattice_pallas import (
            backward_lattice_pallas_blocked,
            forward_lattice_pallas_blocked,
        )

        k = next(k for k in (16, 8, 4, 2, 1) if T % k == 0)
        la = forward_lattice_pallas_blocked(
            lb_tsb, log_trans, lengths, k_block=k
        ).astype(dtype)
        lbw = backward_lattice_pallas_blocked(
            lb_tsb, log_trans, lengths, k_block=k
        ).astype(dtype)
    else:
        la = _log_forward_lattice_tb(lb_tsb, log_trans, lengths)
        lbw = _log_backward_lattice_tb(lb_tsb, log_trans, lengths)

    log_z = la[-1, S - 1]  # (B,)
    # the Pallas kernels clamp -inf to -1e30, so "unreachable final state"
    # is a large-negative finite value there, not inf
    valid = jnp.isfinite(log_z) & (log_z > -1e29) & (lengths > 0)
    safe_z = jnp.where(valid, log_z, 0.0)
    vmask = valid.astype(dtype)  # (B,)

    t_idx = jnp.arange(T)
    frame_mask = (t_idx[:, None] < lengths[None, :]).astype(dtype)  # (T, B)
    gamma_tsb = (
        jnp.exp(jnp.minimum(la + lbw - safe_z[None, None, :], 0.0))
        * frame_mask[:, None, :]
        * vmask[None, None, :]
    )  # (T, S, B)

    xi_mask = (t_idx[:-1, None] < (lengths - 1)[None, :]).astype(dtype)  # (T-1,B)
    fwd_in = lb_tsb[1:] + lbw[1:]  # (T-1, S, B)
    log_xi = (
        la[:-1, :, None, :]
        + log_trans[None, :, :, None]
        + fwd_in[:, None, :, :]
        - safe_z[None, None, None, :]
    )  # (T-1, from, to, B)
    xi = (
        jnp.exp(jnp.minimum(log_xi, 0.0))
        * (xi_mask * vmask[None, :])[:, None, None, :]
    )
    num_trans = xi.sum((0, 3))  # (S, S)
    den_trans = (gamma_tsb[:-1] * xi_mask[:, None, :]).sum((0, 2))  # (S,)
    den_mix = gamma_tsb.sum((0, 2))  # (S,)

    gamma_bts = jnp.transpose(gamma_tsb, (2, 0, 1))  # (B, T, S)
    stream_stats = []
    flat_feats = feats.reshape(B * T, D)
    for stream, post in zip(model.streams, posts):
        gm = gamma_bts[..., None] * post  # (B, T, S, M)
        w, x, xx = gmm_moment_stats(
            gm.reshape(B * T, S, -1), flat_feats, stream.cov_type
        )
        stream_stats.append(StreamStats(w=w, x=x, xx=xx))

    return SuffStats(
        num_trans=num_trans,
        den_trans=den_trans,
        den_mix=den_mix,
        streams=tuple(stream_stats),
        log_prob=jnp.sum(jnp.where(valid, log_z, 0.0)),
        num_valid=vmask.sum(),
    )
