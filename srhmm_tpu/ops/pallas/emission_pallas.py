"""Fused diag-GMM emission kernel (Pallas, TPU).

Computes per-state emission log-likelihoods log b_i(o_t) for a diagonal-
covariance GMM directly from the lifted-feature GEMM formulation
(ops/emission.py), WITHOUT materializing the (T, S*M) per-mixture array in
HBM: the kernel runs the (T_blk, 2D) x (2D, S) GEMM per mixture on the MXU
and folds the mixtures with an in-register running logaddexp, so HBM traffic
is exactly input frames + the (T, S) output.

Grid: (T / T_blk, M) — the mixture axis is the minor (sequential) grid
dimension revisiting the same output block, which makes the running
logaddexp accumulation legal:

    m == 0:  out = q_0
    m  > 0:  out = logaddexp(out, q_m)

with q_m = [x, x^2] @ A_m + b_m, A_m = [mu_m k_m; -k_m/2], and
b_m = -1/2 sum mu^2 k + log w_m - 1/2 (D log 2pi + log|det_m|)
(mixture weight and Gaussian normalizer folded into the GEMM bias).
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


def _emission_kernel(x_ref, a_ref, b_ref, out_ref):
    m = pl.program_id(1)
    q = (
        jnp.dot(x_ref[:], a_ref[0], preferred_element_type=jnp.float32)
        + b_ref[0]
    )

    @pl.when(m == 0)
    def _():
        out_ref[:] = q

    @pl.when(m > 0)
    def _():
        out_ref[:] = jnp.logaddexp(out_ref[:], q)


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
    t_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """frames (T, D) + packed constants -> (T, S) emission log-likelihoods.

    T must be a multiple of t_block (io/dataset.py pads time to a bucket).
    """
    T, D = frames.shape
    M, twoD, S = a.shape
    assert twoD == 2 * D
    lifted = jnp.concatenate([frames, frames * frames], axis=-1)

    grid = (T // t_block, M)
    return pl.pallas_call(
        _emission_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, 2 * D), lambda t, m: (t, m * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * D, S), lambda t, m: (m, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda t, m: (m, t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_block, S), lambda t, m: (t, m * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, S), jnp.float32),
        interpret=interpret,
    )(lifted.astype(jnp.float32), a, b)


def log_state_emission_fused(
    frames: jax.Array,
    stream: GmmStream,
    t_block: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused replacement for ops.emission.log_state_emission on a
    single diagonal-covariance stream.  frames (T, D) with T % t_block == 0
    -> (T, S) float32."""
    if stream.cov_type != DIAG:
        raise ValueError("fused emission kernel is diagonal-covariance only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a, b = _pack_constants(stream, jnp.float32)
    return emission_log_b_pallas(frames, a, b, t_block=t_block, interpret=interpret)
