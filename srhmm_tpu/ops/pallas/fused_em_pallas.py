"""Fully-fused lane-major EM E-step kernels (Pallas, TPU).

Replaces the E-step's five big HBM tensors with two kernels over a
lane-major (T, *, B) layout — the batch axis rides the 128 VPU lanes and
the MXU's N dimension, so the per-frame work is dense instead of using
8/128 lanes (the round-1 kernels' mistake; see lattice_pallas.py STATUS).

  K1 `emit_forward_pallas`  (grid ascending time blocks):
      feats (T, D, B) -> log_b (T, S, B), log-alpha (T, S, B)
    Per frame: one (S*M, 2D) x (2D, B) MXU GEMM for all mixture
    log-likelihoods (lifted-feature formulation, ops/emission.py), a
    scaled-linear forward step — (S, S) x (S, B) MXU matvec + per-lane
    normalization, the reference's own scaled recursion (T1:1414-1473)
    with the scale tracked per lane — and a log conversion for the
    lattice rows.  No (T, S*M) intermediate ever exists.

  K2 `backward_stats_pallas` (grid descending time blocks):
      feats, log_b, log-alpha -> ALL E-step statistics
      (xi (S, S, B), den_trans/den_mix (S, B), GMM moments (M*S, 2D+1))
    Per frame: scaled-linear backward step (final-state init,
    T1:1511-1513), xi accumulated in the numerically-safe log form
    exp(min(la + log_trans + log_b' + log_beta' - z, 0)) exactly as the
    XLA path (train/em.py), posterior/moment GEMMs recomputed in VMEM.
    log-beta, gamma, posteriors, and the (T, S, M) occupancy tensor are
    never written to HBM.

HBM traffic per EM iteration (headline shape B=2048, T=512, S=8, M=3,
D=9): K1 reads 36 MB, writes 66 MB; K2 reads 134 MB, writes <1 MB —
~240 MB total vs ~900 MB for the XLA path (hardware-profiled in
scratch/profile3.py; the XLA path's emission alone moves ~400 MB through
lift/q intermediates).

Numerical notes: scaled-linear scan values are per-frame normalized to
[0, 1] (sum over states = 1), so f32 never overflows; underflow to 0
maps to lattice value NEG_INF (the -1e30 clamp convention of
lattice_pallas.py).  Statistics match train/em.e_step to f32 roundoff
(test-locked in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.gmm_hmm import GmmStream

NEG_INF = -1e30
_TINY = 1e-38  # smallest f32 normal-ish; log argument guard


def pack_lane_constants(stream: GmmStream, dtype=jnp.float32):
    """Packed per-mixture GEMM constants for the lane-major kernels.

    Returns (a_ms: (M*S, 2D) m-major rows, bias_ms: (M*S, 1)) such that
    q[m*S+s] = a_ms[m*S+s] @ [x; x^2] + bias gives the weighted per-mixture
    Gaussian log-likelihood (weights + normalizer folded into the bias, as
    in emission_pallas._pack_constants)."""
    mu = stream.means.astype(jnp.float64)  # (S, M, D)
    k = stream.inv_cov.astype(jnp.float64)
    w = stream.weights.astype(jnp.float64)
    log_det = stream.log_abs_det().astype(jnp.float64)
    S, M, D = mu.shape
    a = jnp.concatenate([mu * k, -0.5 * k], axis=-1)  # (S, M, 2D)
    a = jnp.transpose(a, (1, 0, 2)).reshape(M * S, 2 * D)  # m-major
    bias = (
        -0.5 * jnp.sum(mu * mu * k, axis=-1)
        + jnp.log(jnp.maximum(w, 1e-300))
        - 0.5 * (D * math.log(2.0 * math.pi) + log_det)
    )  # (S, M)
    bias = bias.T.reshape(M * S, 1)
    return a.astype(dtype), jnp.maximum(bias, NEG_INF).astype(dtype)


def _log_b_from_q(q, S, M):
    """(M*S, B) m-major per-mixture log-liks -> scaled (b_hat (S, B) with
    max_s b_hat == 1 per lane, log_b (S, B), m_t (1, B) log-scale)."""
    m_t = jnp.maximum(jnp.max(q, axis=0, keepdims=True), NEG_INF)  # (1, B)
    e = jnp.exp(q - m_t)  # (M*S, B), <= 1
    b_state = e[0:S]
    for m in range(1, M):
        b_state = b_state + e[m * S : (m + 1) * S]
    log_b = jnp.where(
        b_state > 0.0, jnp.log(jnp.maximum(b_state, _TINY)) + m_t, NEG_INF
    )
    return b_state, log_b, m_t


def _emit_fwd_kernel(
    n_mix, k_block,
    feats_ref, a_ref, bias_ref, trans_t_ref, len_ref,
    log_b_ref, la_ref,
    alpha_ref, c_ref,
):
    """One ascending time block: emission GEMM + scaled forward.

    feats_ref: (k_block, D, B); a_ref: (M*S, 2D); bias_ref: (M*S, 1);
    trans_t_ref: (S, S) TRANSPOSED linear transitions (new_j = sum_i a_i t_ij
    = (trans^T @ alpha)_j); len_ref: (1, B) float lengths.
    Outputs: log_b_ref, la_ref (k_block, S, B).
    Scratch: alpha_ref (S, B) scaled forward variable, c_ref (1, B) its
    accumulated log-scale."""
    tb = pl.program_id(0)
    MS = a_ref.shape[0]
    S = trans_t_ref.shape[0]
    B = alpha_ref.shape[1]
    lens = len_ref[:]  # (1, B)

    for k in range(k_block):  # static unroll
        x = feats_ref[k]  # (D, B)
        lift = jnp.concatenate([x, x * x], axis=0)  # (2D, B)
        q = (
            jnp.dot(a_ref[:], lift, preferred_element_type=jnp.float32)
            + bias_ref[:]
        )  # (M*S, B)
        b_hat, log_b, m_t = _log_b_from_q(q, S, n_mix)
        log_b_ref[k] = log_b

        def first():
            start = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == 0, 1.0, 0.0
            )
            return start * b_hat, jnp.zeros((1, B), jnp.float32)

        def rest():
            raw = (
                jnp.dot(
                    trans_t_ref[:], alpha_ref[:],
                    preferred_element_type=jnp.float32,
                )
                * b_hat
            )
            return raw, c_ref[:]

        if k == 0:
            raw, c_base = jax.lax.cond(tb == 0, first, rest)
        else:
            raw, c_base = rest()
        s = jnp.sum(raw, axis=0, keepdims=True)  # (1, B)
        s_safe = jnp.where(s > 0.0, s, 1.0)
        alpha_new = raw / s_safe
        c_new = c_base + jnp.log(s_safe) + m_t

        t = tb * k_block + k
        keep = lens > t  # (1, B)
        if k == 0:
            # frame 0 always initializes the carry, even for (invalid)
            # zero-length rows — garbage must never leak into the lattice
            keep = keep | (tb == 0)
        alpha_ref[:] = jnp.where(keep, alpha_new, alpha_ref[:])
        c_ref[:] = jnp.where(keep, c_new, c_ref[:])

        a_cur = alpha_ref[:]
        la_ref[k] = jnp.where(
            a_cur > 0.0,
            jnp.log(jnp.maximum(a_cur, _TINY)) + c_ref[:],
            NEG_INF,
        )


@partial(jax.jit, static_argnames=("k_block", "interpret"))
def emit_forward_pallas(
    feats_tdb: jax.Array,
    a_ms: jax.Array,
    bias_ms: jax.Array,
    trans: jax.Array,
    lengths: jax.Array,
    k_block: int = 16,
    interpret: bool | None = None,
):
    """feats (T, D, B) + packed constants -> (log_b, log_alpha), both
    (T, S, B) float32 with lattice rows at t >= length repeating the last
    valid row (the train/em.py convention).

    trans: (S, S) LINEAR transition probabilities.  T % k_block == 0.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, D, B = feats_tdb.shape
    MS, twoD = a_ms.shape
    S = trans.shape[0]
    assert twoD == 2 * D and T % k_block == 0, (a_ms.shape, T, k_block)
    M = MS // S
    lens = lengths.astype(jnp.float32).reshape(1, B)
    trans_t = trans.astype(jnp.float32).T

    grid = (T // k_block,)
    zero2 = lambda t: (0 * t, 0 * t)
    return pl.pallas_call(
        partial(_emit_fwd_kernel, M, k_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_block, D, B), lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, twoD), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_block, S, B), lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, S, B), lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, B), jnp.float32),
            jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(feats_tdb.astype(jnp.float32), a_ms, bias_ms, trans_t, lens)


def _bwd_stats_kernel(
    n_mix, k_block,
    feats_ref, lb_ref, la_ref, lt_lin_ref, lt_log_ref,
    a_ref, bias_ref, len_ref, z_ref, vmask_ref,
    xi_ref, den_trans_ref, den_mix_ref, mom_ref,
    beta_ref, cb_ref, lbb_ref,
):
    """One DESCENDING time block: scaled backward + every E-step statistic.

    Block tb covers lattice rows [t_lo, t_lo + k_block) with
    t_lo = (nb-1-tb) * k_block; frames iterate k = k_block-1 .. 0.

    Scratches: beta_ref (S, B) scaled backward variable, cb_ref (1, B) its
    log-scale, lbb_ref (S, B) the log_b row one past the block top (saved by
    the previous grid step = later time block), used as log_b[t+1] for the
    block's last row.
    Outputs (accumulated across the grid): xi (S, S, B), den_trans (S, B),
    den_mix (S, B), mom (M*S, 2D+1) = [sum gm x, sum gm x^2, sum gm].
    """
    tb = pl.program_id(0)
    nb = pl.num_programs(0)
    MS = a_ref.shape[0]
    S = lt_lin_ref.shape[0]
    B = beta_ref.shape[1]
    D = feats_ref.shape[1]
    lens = len_ref[:]  # (1, B)
    z = z_ref[:]  # (1, B) safe final log-prob
    vmask = vmask_ref[:]  # (1, B) 1.0 for valid utterances
    t_lo = (nb - 1 - tb) * k_block

    beta_init = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == S - 1, 1.0, 0.0
    )

    acc_xi = jnp.zeros((S, S, B), jnp.float32)
    acc_dt = jnp.zeros((S, B), jnp.float32)
    acc_dm = jnp.zeros((S, B), jnp.float32)
    acc_mom = jnp.zeros((MS, 2 * D + 1), jnp.float32)

    for k in range(k_block - 1, -1, -1):  # static unroll, reverse time
        t = t_lo + k
        la_t = la_ref[k]  # (S, B)
        if k == k_block - 1:
            # log_b[t+1] saved by the later block.  On the very first grid
            # step (t = T-1) lbb holds garbage, but every use is masked:
            # t < len-1 is impossible at t = T-1, and the backward update
            # discards `raw` in favor of the final-state init there.
            lbn = lbb_ref[:]
        else:
            lbn = lb_ref[k + 1]

        # ---- backward carry BEFORE update = state at t+1 ----
        lbw_next = jnp.where(
            beta_ref[:] > 0.0,
            jnp.log(jnp.maximum(beta_ref[:], _TINY)) + cb_ref[:],
            NEG_INF,
        )

        # xi(t, i, j) in safe log form (train/em.py banded xi, T1:1609-1647)
        m_xi = ((lens - 1.0) > t) & (vmask > 0.0)  # (1, B)
        fwd_in = jnp.maximum(lbn + lbw_next, NEG_INF)  # (S, B)
        cand = (
            la_t[:, None, :]
            + lt_log_ref[:][:, :, None]
            + fwd_in[None, :, :]
            - z[None, :, :]
        )
        xi = jnp.exp(jnp.minimum(cand, 0.0))
        xi = jnp.where(m_xi[None, :, :], xi, 0.0)
        acc_xi = acc_xi + xi

        # ---- backward update to state t ----
        mn = jnp.maximum(jnp.max(lbn, axis=0, keepdims=True), NEG_INF)
        b_hat_n = jnp.exp(lbn - mn)  # (S, B) <= 1
        raw = jnp.dot(
            lt_lin_ref[:], b_hat_n * beta_ref[:],
            preferred_element_type=jnp.float32,
        )
        s = jnp.sum(raw, axis=0, keepdims=True)
        s_safe = jnp.where(s > 0.0, s, 1.0)
        active = (lens - 1.0) > t  # t < len-1: recursion; else init row
        beta_ref[:] = jnp.where(active, raw / s_safe, beta_init)
        cb_ref[:] = jnp.where(
            active, cb_ref[:] + mn + jnp.log(s_safe), jnp.zeros((1, B), jnp.float32)
        )

        # ---- gamma(t) and GMM moment statistics ----
        lbw_t = jnp.where(
            beta_ref[:] > 0.0,
            jnp.log(jnp.maximum(beta_ref[:], _TINY)) + cb_ref[:],
            NEG_INF,
        )
        m_g = (lens > t) & (vmask > 0.0)  # (1, B)
        gamma = jnp.exp(jnp.minimum(la_t + lbw_t - z, 0.0))
        gamma = jnp.where(m_g, gamma, 0.0)
        acc_dm = acc_dm + gamma
        acc_dt = acc_dt + jnp.where(m_xi, gamma, 0.0)

        x = feats_ref[k]  # (D, B)
        lift = jnp.concatenate([x, x * x], axis=0)  # (2D, B)
        q = (
            jnp.dot(a_ref[:], lift, preferred_element_type=jnp.float32)
            + bias_ref[:]
        )  # (M*S, B)
        lb_t = lb_ref[k]
        gm_rows = []
        for m in range(n_mix):
            qm = q[m * S : (m + 1) * S]
            post = jnp.exp(jnp.minimum(qm - lb_t, 0.0))
            post = jnp.where(lb_t > NEG_INF / 2, post, 0.0)
            gm_rows.append(gamma * post)
        gm = jnp.concatenate(gm_rows, axis=0)  # (M*S, B)
        lift19 = jnp.concatenate([lift, jnp.ones((1, B), jnp.float32)], axis=0)
        acc_mom = acc_mom + jax.lax.dot_general(
            gm, lift19, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M*S, 2D+1)

    # save the block's FIRST row of log_b for the next (earlier) block
    lbb_ref[:] = lb_ref[0]

    first = tb == 0

    @pl.when(first)
    def _():
        xi_ref[:] = acc_xi
        den_trans_ref[:] = acc_dt
        den_mix_ref[:] = acc_dm
        mom_ref[:] = acc_mom

    @pl.when(jnp.logical_not(first))
    def _():
        xi_ref[:] += acc_xi
        den_trans_ref[:] += acc_dt
        den_mix_ref[:] += acc_dm
        mom_ref[:] += acc_mom


@partial(jax.jit, static_argnames=("k_block", "interpret"))
def backward_stats_pallas(
    feats_tdb: jax.Array,
    log_b: jax.Array,
    log_alpha: jax.Array,
    a_ms: jax.Array,
    bias_ms: jax.Array,
    trans: jax.Array,
    lengths: jax.Array,
    safe_z: jax.Array,
    vmask: jax.Array,
    k_block: int = 16,
    interpret: bool | None = None,
):
    """Fused scaled-backward + statistics pass.

    feats_tdb (T, D, B); log_b / log_alpha (T, S, B) from
    emit_forward_pallas; trans (S, S) linear; safe_z (B,) per-utterance
    final log-prob (0 where invalid); vmask (B,) 1.0/0.0 validity.

    Returns (xi (S, S, B), den_trans (S, B), den_mix (S, B),
    mom (M*S, 2D+1)); reduce over B (and reorder moments) in XLA.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, D, B = feats_tdb.shape
    MS, twoD = a_ms.shape
    S = trans.shape[0]
    assert twoD == 2 * D and T % k_block == 0
    M = MS // S
    lens = lengths.astype(jnp.float32).reshape(1, B)
    zr = safe_z.astype(jnp.float32).reshape(1, B)
    vm = vmask.astype(jnp.float32).reshape(1, B)
    lt_lin = trans.astype(jnp.float32)
    lt_log = jnp.where(
        lt_lin > 0.0, jnp.log(jnp.maximum(lt_lin, _TINY)), NEG_INF
    )

    nb = T // k_block
    rev = lambda t: (nb - 1 - t, 0 * t, 0 * t)
    zero2 = lambda t: (0 * t, 0 * t)
    zero3 = lambda t: (0 * t, 0 * t, 0 * t)
    return pl.pallas_call(
        partial(_bwd_stats_kernel, M, k_block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k_block, D, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, S, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, S, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, twoD), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, S, B), zero3, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 2 * D + 1), zero2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, S, B), jnp.float32),
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((MS, 2 * D + 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((S, B), jnp.float32),
        ],
        interpret=interpret,
    )(
        feats_tdb.astype(jnp.float32),
        log_b, log_alpha, lt_lin, lt_log, a_ms, bias_ms, lens, zr, vm,
    )
