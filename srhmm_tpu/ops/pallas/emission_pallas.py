"""Fused diag-GMM emission + sufficient-statistic kernels (Pallas, TPU).

Emission: per-state emission log-likelihoods log b_i(o_t) for a diagonal-
covariance GMM from the lifted-feature GEMM formulation (ops/emission.py),
WITHOUT materializing the (T, S*M) per-mixture array in HBM.  Each time
block runs statically-unrolled per-mixture (t_block, 2D) x (2D, S) GEMMs
folded with an in-register running logaddexp (one grid axis — Mosaic rejects
non-128-aligned lane slicing, so mixtures unroll instead of lane-packing),
and HBM traffic is exactly input frames + the (T, S) output:

    q_m = [x, x^2] @ A_m + b_m,  A_m = [mu_m k_m; -k_m/2],
    b_m = -1/2 sum mu^2 k + log w_m - 1/2 (D log 2pi + log|det_m|)
    log_b = logaddexp_m q_m

(mixture weight and Gaussian normalizer folded into the GEMM bias).

Statistics: the training E-step's GMM moments  [sum_t gm x, sum_t gm x^2,
sum_t gm]  with gm = gamma * exp(q_m - log_b) (the in-state mixture
posterior), recomputing q_m in VMEM from the same packed constants and
accumulating the (M*S, 2D+1) moment GEMM in-register across time blocks —
the (T, S, M) posterior/occupancy tensors never exist in HBM.  The XLA path
round-trips ~5 such tensors per EM iteration; at the headline bench shape
(B*T = 1M frames, S=8, M=3) that is ~500 MB of HBM traffic per iteration
that these kernels never issue.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.gmm_hmm import DIAG, GmmStream


def _emission_kernel(n_mix, x_ref, a_ref, b_ref, out_ref):
    x = x_ref[:]
    q = lambda m: (
        jnp.dot(x, a_ref[m], preferred_element_type=jnp.float32) + b_ref[m]
    )  # (t_block, S); statically-unrolled per-mixture GEMMs
    lb = q(0)
    for m in range(1, n_mix):
        lb = jnp.logaddexp(lb, q(m))
    out_ref[:] = lb


def _pack_constants(stream: GmmStream, dtype):
    """(M, 2D, S) GEMM matrices and (M, 1, S) biases.  Pure jnp so callers
    can jit over traced streams."""
    mu = stream.means.astype(jnp.float64)  # (S, M, D)
    k = stream.inv_cov.astype(jnp.float64)
    w = stream.weights.astype(jnp.float64)
    log_det = stream.log_abs_det().astype(jnp.float64)
    S, M, D = mu.shape
    a = jnp.concatenate([mu * k, -0.5 * k], axis=-1)  # (S, M, 2D)
    a = jnp.transpose(a, (1, 2, 0))  # (M, 2D, S)
    bias = (
        -0.5 * jnp.sum(mu * mu * k, axis=-1)
        + jnp.log(jnp.maximum(w, 1e-300))
        - 0.5 * (D * math.log(2.0 * math.pi) + log_det)
    )  # (S, M)
    bias = bias.T[:, None, :]  # (M, 1, S)
    return a.astype(dtype), bias.astype(dtype)


@partial(jax.jit, static_argnames=("t_block", "interpret"))
def emission_log_b_pallas(
    frames: jax.Array,
    a: jax.Array,
    b: jax.Array,
    t_block: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """frames (T, D) + packed constants (from _pack_constants) -> (T, S)
    emission log-likelihoods.

    T must be a multiple of t_block (io/dataset.py pads time to a bucket).
    """
    T, D = frames.shape
    M, twoD, S = a.shape
    assert twoD == 2 * D
    lifted = jnp.concatenate([frames, frames * frames], axis=-1)

    grid = (T // t_block,)
    return pl.pallas_call(
        partial(_emission_kernel, M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, 2 * D), lambda t: (t, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 2 * D, S), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, S), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_block, S), lambda t: (t, t * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, S), jnp.float32),
        interpret=interpret,
    )(lifted.astype(jnp.float32), a, b)


def _stats_kernel(n_mix, x_ref, g_ref, lb_ref, a_ref, b_ref, out_ref):
    """One time-block step of the fused GMM-stat accumulation.

    x_ref: (t_block, 2D+1) lifted features [x, x^2, 1]
    g_ref: (t_block, S) state occupancies gamma (zero on padded frames)
    lb_ref: (t_block, S) per-state emission log-likelihoods
    a_ref: (M, 2D+1, S) GEMM weights (zero row for the 1-column)
    b_ref: (M, 1, S) biases
    out_ref: (M, S, 2D+1) running [sum gm x, sum gm x^2, sum gm]
    """
    x = x_ref[:]
    lb = lb_ref[:]
    # posterior within the state: exp(q - log_b); a state with zero total
    # likelihood (lb <= -1e30 sentinel / -inf) contributes nothing
    g = jnp.where(lb > -1e30, g_ref[:], 0.0)  # (t_block, S)
    first = pl.program_id(0) == 0
    for m in range(n_mix):
        q = jnp.dot(x, a_ref[m], preferred_element_type=jnp.float32) + b_ref[m]
        # q - lb <= 0 mathematically (lb = logsumexp_m q_m); the clamp also
        # keeps lb == -inf from producing 0 * exp(inf) = NaN
        gm = g * jnp.exp(jnp.minimum(q - lb, 0.0))  # (t_block, S)
        st = jax.lax.dot_general(
            gm, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, 2D+1)

        @pl.when(first)
        def _():
            out_ref[m] = st

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[m] += st


@partial(jax.jit, static_argnames=("t_block", "interpret"))
def emission_stats_pallas(
    frames: jax.Array,
    gamma: jax.Array,
    log_b: jax.Array,
    a: jax.Array,
    b: jax.Array,
    t_block: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Fused diag-GMM sufficient statistics: (S, M, 2D+1) moments
    [sum_t gm x, sum_t gm x^2, sum_t gm] with gm = gamma * posterior,
    WITHOUT materializing any (T, S, M) tensor in HBM.

    The per-mixture log-likelihood q_m is recomputed in VMEM from the same
    packed constants the fused emission kernel used to produce log_b, so
    exp(q_m - log_b) is exactly the mixture posterior of
    ops.emission.log_mixture_posteriors (weights folded into the bias).
    HBM traffic: frames/gamma/log_b read once + a tiny (M*S, 2D+1) output.

    frames: (T, D) with T % t_block == 0; gamma, log_b: (T, S).
    """
    T, D = frames.shape
    M, twoD, S = a.shape
    assert twoD == 2 * D
    K = 2 * D + 1
    lifted = jnp.concatenate(
        [frames, frames * frames, jnp.ones_like(frames[:, :1])], axis=-1
    )  # (T, K)
    # zero row for the appended 1-column so q is unchanged
    a_k = jnp.concatenate([a, jnp.zeros((M, 1, S), a.dtype)], axis=1)

    grid = (T // t_block,)
    out = pl.pallas_call(
        partial(_stats_kernel, M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, K), lambda t: (t, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, S), lambda t: (t, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, S), lambda t: (t, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K, S), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, S), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (M, S, K), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, S, K), jnp.float32),
        interpret=interpret,
    )(
        lifted.astype(jnp.float32),
        gamma.astype(jnp.float32),
        log_b.astype(jnp.float32),
        a_k,
        b,
    )
    return jnp.transpose(out, (1, 0, 2))  # (S, M, K)


def log_state_emission_fused(
    frames: jax.Array,
    stream: GmmStream,
    t_block: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused replacement for ops.emission.log_state_emission on a
    single diagonal-covariance stream.  frames (T, D) with T % t_block == 0
    -> (T, S) float32."""
    if stream.cov_type != DIAG:
        raise ValueError("fused emission kernel is diagonal-covariance only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = frames.shape[0]
    while T % t_block != 0:
        t_block //= 2
    a, b = _pack_constants(stream, jnp.float32)
    return emission_log_b_pallas(frames, a, b, t_block=t_block, interpret=interpret)
