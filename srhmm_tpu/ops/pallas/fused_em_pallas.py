"""Fully-fused lane-major EM E-step kernels (Pallas, TPU).

Replaces the E-step's five big HBM tensors with two kernels over a
lane-major (T, *, B) layout — the batch axis rides the 128 VPU lanes and
the MXU's N dimension, so the per-frame work is dense instead of using
8/128 lanes (the round-1 kernels' mistake; see lattice_pallas.py STATUS).

  K1 `emit_forward_pallas`  (grid ascending time blocks):
      feats (T, D, B) -> log_b (T, S, B), log-alpha (T, S, B)
    Per frame: one (S*M, L) x (L, B) MXU GEMM for all mixture
    log-likelihoods (lifted-feature formulation, ops/emission.py; L = 2D
    with lift [x; x^2] for diagonal covariance, L = D + D^2 with lift
    [x; vec(x x^T)] for full covariance — the reference's canonical T1
    regime rides the exact same kernels, T1:1834-1887) and a
    LOG-DOMAIN forward step.  For banded left-right transitions (the
    reference's structure, T1:772-791) the logsumexp runs over the
    band+1 diagonals via sublane rolls — O(band * S * B) VPU work per
    frame instead of O(S^2 B); `band=None` falls back to the dense
    (S, S, B) update for arbitrary transition matrices.

  K2 `backward_stats_pallas` (grid descending time blocks):
      feats, log_b, log-alpha -> ALL E-step statistics
      (uv for num_trans, den_trans/den_mix (S, B), GMM moments)
    Per frame: log-domain (banded) backward step with final-state init
    (T1:1511-1513); xi via the U/V factorization contracted over B on
    the MXU (num_trans = trans * sum_t u v^T); posterior/moment GEMMs
    recomputed in VMEM.  log-beta, gamma, posteriors, and the (T, S, M)
    occupancy tensor are never written to HBM.

Why log domain and not the reference's scaled-linear recursion: in f32
the per-frame normalized alpha flushes states more than ~88 nats below
the frame maximum to zero, and on real-scale data (per-frame emission
log-lik gaps in the hundreds) that truncation loses probability mass
that later turns out to lie on the winning path — hardware-measured 47
nats of log Z error at T=500 (scratch/debug_correctness.py).  Log-domain
carries have no such cliff; values are clamped at NEG_INF = -1e30 (the
lattice_pallas.py convention).

HBM traffic per EM iteration (headline shape B=2048, T=512, S=8, M=3,
D=9): K1 reads 36 MB, writes 66 MB; K2 reads 134 MB, writes <1 MB —
~240 MB total vs ~900 MB for the XLA path (hardware-profiled in
scratch/profile3.py; the XLA path's emission alone moves ~400 MB through
lift/q intermediates).  Statistics match train/em.e_step to f32 roundoff
(test-locked in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.gmm_hmm import FULL, GAUS_INF_CLAMP, GmmStream

NEG_INF = -1e30
_TINY = 1e-38  # smallest f32 normal-ish; log argument guard
LOG_GAUS_CLAMP = math.log(GAUS_INF_CLAMP)  # calc_gaus 1e20 clamp, T1:1880-1883


def pack_lane_constants(stream: GmmStream, dtype=jnp.float32, origin=None):
    """Packed per-mixture GEMM constants for the lane-major kernels.

    Returns (a_ms, bias_g, bias_ms, logw_ms).  logw is separate from bias
    so the full-cov 1e20 density clamp (calc_gaus, T1:1880-1883) lands
    between density and weight, as in the reference.

    Diagonal covariance: a_ms (M*S, 2D) m-major rows such that
    q[m*S+s] = a_ms @ [y; y^2] + bias + logw is the weighted per-mixture
    Gaussian log-likelihood (normalizer folded into the bias, as in
    emission_pallas._pack_constants); bias_g is a (1, 1) dummy.

    Full covariance (the reference's canonical T1 regime, T1:1834-1887):
    the kernels compute the quadratic form through the CHOLESKY factor of
    the stored inverse covariance, K = L L^T:

        z = G y + bias_g,   quad = sum_d z_d^2 = (y - mu')^T K (y - mu')

    with G (M*S*D, D) stacking row d of L^T for every (s, m) at row
    d*M*S + m*S + s (d-major, so the per-d partial sums are contiguous
    (M*S, B) sublane slices) and bias_g = -L^T mu'.  A LIFTED formulation
    (q linear in [y; vec(y y^T)]) has identical GEMM cost but cancels
    O(|mu|^2 ||K||)-sized terms to an O(D) result — hardware-measured
    ~0.03 nats/frame of f32 error on LBG-initialized full-cov models
    (inverse covariances with large entries), 20x worse statistics than
    the XLA path.  The sum-of-squares form has NO cancellation: every
    term is positive and at residual scale.  Degenerate mixtures get
    zeroed G rows and a constant bias: NEG_INF when log|det| is
    non-finite (matching the XLA path's -inf likelihood,
    ops/emission.py log_gauss), or LOG_GAUS_CLAMP when the det is
    finite but the inverse is not PD (Cholesky NaN) — the indefinite
    quadratic form explodes the density, which the reference clamps at
    1e20 (calc_gaus T1:1880-1883).  Both cases are unreachable after
    m_step's PSD flooring/repair; they exist for imported pathological
    models.

    origin: optional (D,) shift o with y = x - o (kernels subtract it from
    the features).  Moments accumulated by K2 are then ABOUT o: unshift
    via sum g x = sum g y + o sum g, etc. (exact in f32)."""
    mu = stream.means.astype(jnp.float64)  # (S, M, D)
    if origin is not None:
        mu = mu - jnp.asarray(origin, jnp.float64)
    k = stream.inv_cov.astype(jnp.float64)
    w = stream.weights.astype(jnp.float64)
    log_det = stream.log_abs_det().astype(jnp.float64)
    S, M, D = mu.shape
    norm = -0.5 * (D * math.log(2.0 * math.pi) + log_det)  # (S, M)
    logw = jnp.log(jnp.maximum(w, 1e-300)).T.reshape(M * S, 1)
    if stream.cov_type == FULL:
        chol = jnp.linalg.cholesky(k)  # (S, M, D, D) lower, k = L L^T
        zmu = jnp.einsum("smed,sme->smd", chol, mu)  # L^T mu' per (s, m)
        det_ok = jnp.isfinite(norm)
        ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1)) & det_ok
        chol = jnp.where(ok[..., None, None], chol, 0.0)
        zmu = jnp.where(ok[..., None], zmu, 0.0)
        # degenerate split (module docstring): non-finite det -> -inf
        # likelihood; finite det but non-PD inverse -> the 1e20 clamp
        bias = jnp.where(
            ok, norm, jnp.where(det_ok, LOG_GAUS_CLAMP, NEG_INF)
        )
        # G[d*M*S + m*S + s, e] = chol[s, m, e, d]  (row d of L^T)
        g = jnp.transpose(chol, (3, 1, 0, 2)).reshape(M * S * D, D)
        bias_g = -jnp.transpose(zmu, (2, 1, 0)).reshape(M * S * D, 1)
        a = g
    else:
        a = jnp.concatenate([mu * k, -0.5 * k], axis=-1)  # (S, M, 2D)
        a = jnp.transpose(a, (1, 0, 2)).reshape(M * S, 2 * D)  # m-major
        bias = -0.5 * jnp.sum(mu * mu * k, axis=-1) + norm
        bias_g = jnp.zeros((1, 1), jnp.float64)
    bias = bias.T.reshape(M * S, 1)
    return (
        a.astype(dtype),
        bias_g.astype(dtype),
        jnp.maximum(bias, NEG_INF).astype(dtype),
        jnp.maximum(logw, NEG_INF).astype(dtype),
    )


def _lift(x, full: bool):
    """Lifted features for the moment GEMMs: [x; x^2] (diag) or
    [x; vec(x x^T)] (full cov).  x: (D, B); result (2D, B) or (D+D^2, B).
    The outer product is built as D static row-broadcast multiplies —
    cheaper for Mosaic than a (D, D, B) reshape across the sublane axis."""
    if not full:
        return jnp.concatenate([x, x * x], axis=0)
    D = x.shape[0]
    return jnp.concatenate([x] + [x * x[d : d + 1] for d in range(D)], axis=0)


def _emission_q(x, a_ref, bias_g_ref, bias_ref, logw_ref, full):
    """Per-mixture weighted log-likelihoods q (M*S, B) from centered
    features x (D, B).

    diag: one (M*S, 2D) x (2D, B) GEMM over the lift [x; x^2].
    full: the Cholesky z-GEMM (pack_lane_constants) — z = G x + bias_g
    ((M*S*D, D) x (D, B)), quad = sum over the D d-major (M*S, B) slices
    of z^2 (all-positive, no cancellation), then the reference's 1e20
    density clamp BEFORE the mixture weight (calc_gaus T1:1880-1883 ->
    calc_symbol_probab T1:1791)."""
    if full:
        D = x.shape[0]
        z = (
            jnp.dot(a_ref[:], x, preferred_element_type=jnp.float32)
            + bias_g_ref[:]
        )  # (M*S*D, B)
        z2 = z * z
        ms = a_ref.shape[0] // D
        quad = z2[0:ms]
        for d in range(1, D):
            quad = quad + z2[d * ms : (d + 1) * ms]
        q = jnp.float32(-0.5) * quad + bias_ref[:]
        q = jnp.minimum(q, jnp.float32(LOG_GAUS_CLAMP))
    else:
        lift = jnp.concatenate([x, x * x], axis=0)  # (2D, B)
        q = (
            jnp.dot(a_ref[:], lift, preferred_element_type=jnp.float32)
            + bias_ref[:]
        )
    return q + logw_ref[:]


def trans_band(trans) -> int | None:
    """Host-side band width of a transition matrix: smallest `band` with
    trans[i, j] == 0 outside 0 <= j - i <= band, or None if lower-triangular
    entries exist (not left-right).  Call OUTSIDE jit (concrete values)."""
    import numpy as np

    t = np.asarray(trans)
    S = t.shape[-1]
    nz = np.argwhere(t.reshape(-1, S, S).sum(0) != 0)
    d = nz[:, 1] - nz[:, 0]
    if (d < 0).any():
        return None
    return int(d.max())


def _log_b_from_q(q, S, M):
    """(M*S, B) m-major per-mixture weighted log-liks -> per-state mixture
    logsumexp log_b (S, B).  The max is taken PER STATE (over its own M
    mixtures): a per-frame global max would flush states more than ~88 nats
    below the frame's best state to -inf in f32.

    NOTE: every constant in kernel code must be explicitly f32 — weak
    Python literals become f64 constants under jax_enable_x64 and Mosaic
    cannot legalize the resulting f64->f32 tpu.truncf."""
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    m_s = q[0:S]
    for m in range(1, M):
        m_s = jnp.maximum(m_s, q[m * S : (m + 1) * S])
    m_s = jnp.maximum(m_s, neg)  # (S, B)
    e = jnp.exp(q[0:S] - m_s)
    for m in range(1, M):
        e = e + jnp.exp(q[m * S : (m + 1) * S] - m_s)
    return jnp.log(jnp.maximum(e, tiny)) + m_s


def _shift_down(x, d, neg):
    """y[j] = x[j - d] along the sublane axis, NEG_INF-filled at the top."""
    if d == 0:
        return x
    rolled = pltpu.roll(x, shift=jnp.int32(d), axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= d, rolled, neg)


def _shift_up(x, d, neg):
    """y[j] = x[j + d] along the sublane axis, NEG_INF-filled at the bottom."""
    if d == 0:
        return x
    S = x.shape[0]
    rolled = pltpu.roll(x, shift=jnp.int32(S - d), axis=0)  # circular: y[j] = x[j+d mod S]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < S - d, rolled, neg)


def _logsumexp_terms(terms, neg, tiny):
    """Elementwise logsumexp over a static list of same-shape arrays."""
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    m = jnp.maximum(m, neg)
    e = jnp.exp(terms[0] - m)
    for t in terms[1:]:
        e = e + jnp.exp(t - m)
    return jnp.maximum(jnp.log(jnp.maximum(e, tiny)) + m, neg)


def _fwd_update(carry, lt_log, diag_cols, band, neg, tiny):
    """Log-domain forward: new[j] = logsumexp_i(carry[i] + lt[i, j]).

    band is static: banded left-right uses sublane rolls over the band+1
    diagonals (diag_cols[d][j] = lt_log[j-d, j]); band None is the dense
    (S, S, B) fallback."""
    if band is not None:
        terms = [
            _shift_down(carry, d, neg) + diag_cols[d]
            for d in range(band + 1)
        ]
        return _logsumexp_terms(terms, neg, tiny)
    cand = carry[:, None, :] + lt_log[:, :, None]  # (from, to, B)
    m = jnp.maximum(jnp.max(cand, axis=0), neg)
    e = jnp.sum(jnp.exp(cand - m[None]), axis=0)
    return jnp.maximum(jnp.log(jnp.maximum(e, tiny)) + m, neg)


def _bwd_update(inner, lt_log, diag_rows, band, neg, tiny):
    """Log-domain backward: new[i] = logsumexp_j(lt[i, j] + inner[j]) where
    inner = log_b[t+1] + log_beta[t+1].  diag_rows[d][i] = lt_log[i, i+d]."""
    if band is not None:
        terms = [
            _shift_up(inner, d, neg) + diag_rows[d]
            for d in range(band + 1)
        ]
        return _logsumexp_terms(terms, neg, tiny)
    cand = lt_log[:, :, None] + inner[None, :, :]  # (i, j, B)
    m = jnp.maximum(jnp.max(cand, axis=1), neg)
    e = jnp.sum(jnp.exp(cand - m[:, None, :]), axis=1)
    return jnp.maximum(jnp.log(jnp.maximum(e, tiny)) + m, neg)


def _emit_fwd_kernel(
    n_mix, k_block, band, full,
    feats_ref, a_ref, bias_g_ref, bias_ref, logw_ref, o_ref,
    lt_log_ref, diag_ref, len_ref,
    log_b_ref, la_ref,
    la_carry_ref,
):
    """One ascending time block: emission GEMM + log-domain forward.

    feats_ref: (k_block, D, B); a_ref: (M*S, 2D) diag lift rows or
    (M*S*D, D) full-cov Cholesky rows; bias_g_ref: (M*S*D, 1) full-cov
    z-offset ((1, 1) dummy for diag); bias_ref / logw_ref: (M*S, 1)
    (weights separate so the full-cov 1e20 clamp lands between density
    and weight, matching calc_gaus -> calc_symbol_probab order);
    o_ref: (D, 1) shifted origin; lt_log_ref: (S, S) log transitions;
    diag_ref: (band+1, S, 1) banded diagonal columns (unused rows when
    band is None); len_ref: (1, B).
    Outputs: log_b_ref, la_ref (k_block, S, B).
    Scratch: la_carry_ref (S, B) log-alpha carry."""
    tb = pl.program_id(0)
    S = lt_log_ref.shape[0]
    B = la_carry_ref.shape[1]
    lens = len_ref[:]  # (1, B)
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    diag_cols = (
        [diag_ref[d] for d in range(band + 1)] if band is not None else None
    )

    for k in range(k_block):  # static unroll
        x = feats_ref[k] - o_ref[:]  # (D, B), about the shifted origin
        q = _emission_q(x, a_ref, bias_g_ref, bias_ref, logw_ref, full)
        log_b = _log_b_from_q(q, S, n_mix)
        log_b_ref[k] = log_b

        def first():
            start = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == 0,
                jnp.float32(0.0),
                neg,
            )
            return jnp.maximum(start + log_b, neg)

        def rest():
            upd = _fwd_update(
                la_carry_ref[:], lt_log_ref[:], diag_cols, band, neg, tiny
            )
            return jnp.maximum(upd + log_b, neg)

        if k == 0:
            new = jax.lax.cond(tb == 0, first, rest)
        else:
            new = rest()

        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t  # (1, B)
        if k == 0:
            # frame 0 always initializes the carry, even for (invalid)
            # zero-length rows — garbage must never leak into the lattice
            keep = keep | (tb == 0)
        la_carry_ref[:] = jnp.where(keep, new, la_carry_ref[:])
        la_ref[k] = la_carry_ref[:]


@partial(jax.jit, static_argnames=("k_block", "band", "interpret"))
def emit_forward_pallas(
    feats_tdb: jax.Array,
    a_ms: jax.Array,
    bias_g: jax.Array,
    bias_ms: jax.Array,
    logw_ms: jax.Array,
    trans: jax.Array,
    lengths: jax.Array,
    origin: jax.Array | None = None,
    k_block: int = 16,
    band: int | None = None,
    interpret: bool | None = None,
):
    """feats (T, D, B) + packed constants (pack_lane_constants) ->
    (log_b, log_alpha), both (T, S, B) float32 with lattice rows at
    t >= length repeating the last valid row (the train/em.py convention).

    trans: (S, S) LINEAR transition probabilities.  band: static band width
    (trans_band(trans)) for the rolled banded update; None = dense.
    origin: (D,) feature shift the constants were packed about
    (pack_lane_constants), or None.  T % k_block == 0.  The covariance
    type is inferred from a_ms's width (2D diag, D full-cov Cholesky).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, D, B = feats_tdb.shape
    n_a, a_w = a_ms.shape
    S = trans.shape[0]
    assert a_w in (2 * D, D) and T % k_block == 0, (a_ms.shape, T, k_block)
    full = a_w == D and a_w != 2 * D
    MS = n_a // D if full else n_a
    M = MS // S
    lens = lengths.astype(jnp.float32).reshape(1, B)
    o_col = (
        jnp.zeros((D, 1), jnp.float32)
        if origin is None
        else origin.astype(jnp.float32).reshape(D, 1)
    )
    lt_lin = trans.astype(jnp.float32)
    lt_log = jnp.where(
        lt_lin > 0.0, jnp.log(jnp.maximum(lt_lin, _TINY)), NEG_INF
    ).astype(jnp.float32)
    nbands = (band + 1) if band is not None else 1
    # diag_cols[d][j] = lt_log[j-d, j]
    j = jnp.arange(S)
    diag = jnp.stack(
        [
            jnp.where(
                (j - d >= 0)[:, None],
                lt_log[jnp.maximum(j - d, 0), j][:, None],
                NEG_INF,
            ).astype(jnp.float32)
            for d in range(nbands)
        ],
        axis=0,
    )  # (nbands, S, 1)

    grid = (T // k_block,)
    zero2 = lambda t: (0 * t, 0 * t)
    zero3 = lambda t: (0 * t, 0 * t, 0 * t)
    return pl.pallas_call(
        partial(_emit_fwd_kernel, M, k_block, band, full),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_block, D, B), lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM),
            pl.BlockSpec(a_ms.shape, zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_g.shape, zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbands, S, 1), zero3, memory_space=pltpu.VMEM),
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
        ],
        interpret=interpret,
    )(
        feats_tdb.astype(jnp.float32), a_ms, bias_g, bias_ms, logw_ms,
        o_col, lt_log, diag, lens,
    )


def _bwd_stats_kernel(
    n_mix, k_block, band, full,
    feats_ref, lb_ref, la_ref, lt_log_ref, diag_ref,
    a_ref, bias_g_ref, bias_ref, logw_ref, o_ref, len_ref, z_ref, vmask_ref,
    uv_ref, den_trans_ref, den_mix_ref, mom_ref,
    lbw_ref, lbb_ref,
):
    """One DESCENDING time block: log-domain backward + every statistic.

    Block tb covers lattice rows [t_lo, t_lo + k_block) with
    t_lo = (nb-1-tb) * k_block; frames iterate k = k_block-1 .. 0.

    Scratches: lbw_ref (S, B) log-beta carry; lbb_ref (S, B) the log_b row
    one past the block top (saved by the previous grid step = later time
    block), used as log_b[t+1] for the block's last row.
    Outputs (accumulated across the grid): uv (S, S) = sum_{t,b} u v^T with
    u_i = exp(la[t,i] - c_t), v_j = exp(log_b[t+1,j] + log_beta[t+1,j] -
    (z - c_t)) and c_t the per-lane forward max — so that
    num_trans = trans * uv (the U/V factorization of the banded xi,
    T1:1609-1647; contracting B on the MXU per frame keeps every
    intermediate 2-D — an (S, S, B) xi tensor blows both Mosaic compile
    time and register pressure); den_trans / den_mix (S, B);
    mom (M*S, L+1) = [sum gm x, sum gm x^2 | sum gm vec(x x^T), sum gm]
    (L = the lift width: 2D diag, D + D^2 full covariance).

    xi accumulation (round-3 fix): for BANDED models the band+1 diagonals
    are accumulated EXACTLY in log domain per (d, j, lane) —
    xi_d[j] = exp(la[t, j-d] + lt[j-d, j] + log_b[t+1, j] + beta[t+1, j]
    - z), clamped at 0 from above only (xi <= 1) — same VPU cost as the
    banded recursion itself.  The dense fallback keeps the U/V MXU
    factorization with v capped at exp(30); that cap LOSES xi mass when a
    frame's forward range exceeds ~30 nats while low-alpha states still
    carry O(1) xi (hardware-found via a 2-stream model whose summed
    emissions double the per-frame spread: 13% of the self-loop mass
    vanished and xi row sums broke mass conservation) — banded left-right
    models (every reference topology) never hit it because they no longer
    use the factorization.
    """
    tb = pl.program_id(0)
    nb = pl.num_programs(0)
    MS = bias_ref.shape[0]
    S = lt_log_ref.shape[0]
    B = lbw_ref.shape[1]
    D = feats_ref.shape[1]
    lift_dim = (D + D * D) if full else 2 * D  # moment-lift width
    lens = len_ref[:]  # (1, B)
    z = z_ref[:]  # (1, B) safe final log-prob
    vmask = vmask_ref[:]  # (1, B) 1.0 for valid utterances
    t_lo = (nb - 1 - tb) * k_block
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    zero = jnp.float32(0.0)
    v_cap = jnp.float32(30.0)
    diag_rows = (
        [diag_ref[d] for d in range(band + 1)] if band is not None else None
    )

    lbw_init = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == S - 1, zero, neg
    )

    if band is None:
        acc_uv = jnp.zeros((S, S), jnp.float32)
    else:
        acc_xi = [jnp.zeros((S, B), jnp.float32) for _ in range(band + 1)]
        # destination-indexed band diagonals: dcol_d[j] = lt[j-d, j]
        dcols = [
            _shift_down(diag_rows[d], d, neg) for d in range(band + 1)
        ]
    acc_dt = jnp.zeros((S, B), jnp.float32)
    acc_dm = jnp.zeros((S, B), jnp.float32)
    acc_mom = jnp.zeros((MS, lift_dim + 1), jnp.float32)

    for k in range(k_block - 1, -1, -1):  # static unroll, reverse time
        t = t_lo + k
        tf = jnp.float32(1.0) * t
        la_t = la_ref[k]  # (S, B)
        if k == k_block - 1:
            # log_b[t+1] saved by the later block.  On the very first grid
            # step (t = T-1) lbb holds garbage, but every use is masked:
            # t < len-1 is impossible at t = T-1, and the backward update
            # discards the recursion in favor of the final-state init there.
            lbn = lbb_ref[:]
        else:
            lbn = lb_ref[k + 1]

        lbw_next = lbw_ref[:]  # log-beta at t+1 (carry before update)

        m_xi = ((lens - jnp.float32(1.0)) > tf) & (vmask > zero)  # (1, B)
        if band is not None:
            # exact per-diagonal xi (docstring): no factorization, no caps
            lnz = jnp.maximum(lbn + lbw_next, neg) - z  # (S, B)
            for d in range(band + 1):
                term = _shift_down(la_t, d, neg) + dcols[d] + lnz
                acc_xi[d] = acc_xi[d] + jnp.where(
                    m_xi, jnp.exp(jnp.minimum(term, zero)), zero
                )
        else:
            # dense fallback: U/V MXU factorization (docstring caveat)
            c_t = jnp.maximum(jnp.max(la_t, axis=0, keepdims=True), neg)
            u = jnp.exp(la_t - c_t)  # (S, B) <= 1
            u = jnp.where(m_xi, u, zero)
            lv = jnp.maximum(lbn + lbw_next, neg) - (z - c_t)
            # v must be masked too: masked lanes can hold NaN (garbage lbn
            # on the first grid step) and 0 * NaN = NaN in the contraction
            v = jnp.where(m_xi, jnp.exp(jnp.minimum(lv, v_cap)), zero)
            acc_uv = acc_uv + jax.lax.dot_general(
                u, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (S, S)

        # ---- backward update to state t (log domain) ----
        inner = jnp.maximum(lbn + lbw_next, neg)
        upd = _bwd_update(inner, lt_log_ref[:], diag_rows, band, neg, tiny)
        active = (lens - jnp.float32(1.0)) > tf  # t < len-1; else init row
        lbw_ref[:] = jnp.where(active, upd, lbw_init)

        # ---- gamma(t) and GMM moment statistics ----
        m_g = (lens > tf) & (vmask > zero)  # (1, B)
        gamma = jnp.exp(jnp.minimum(la_t + lbw_ref[:] - z, zero))
        gamma = jnp.where(m_g, gamma, zero)
        acc_dm = acc_dm + gamma
        acc_dt = acc_dt + jnp.where(m_xi, gamma, zero)

        x = feats_ref[k] - o_ref[:]  # (D, B), about the shifted origin
        lift = _lift(x, full)  # moment lift (2D | D+D^2, B)
        q = _emission_q(x, a_ref, bias_g_ref, bias_ref, logw_ref, full)
        lb_t = lb_ref[k]
        gm_rows = []
        for m in range(n_mix):
            qm = q[m * S : (m + 1) * S]
            post = jnp.exp(jnp.minimum(qm - lb_t, zero))
            post = jnp.where(lb_t > jnp.float32(NEG_INF / 2), post, zero)
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
        if band is None:
            uv_ref[:] = acc_uv
        else:
            for d in range(band + 1):
                uv_ref[d] = acc_xi[d]
        den_trans_ref[:] = acc_dt
        den_mix_ref[:] = acc_dm
        mom_ref[:] = acc_mom

    @pl.when(jnp.logical_not(first))
    def _():
        if band is None:
            uv_ref[:] += acc_uv
        else:
            for d in range(band + 1):
                uv_ref[d] += acc_xi[d]
        den_trans_ref[:] += acc_dt
        den_mix_ref[:] += acc_dm
        mom_ref[:] += acc_mom


@partial(jax.jit, static_argnames=("k_block", "band", "interpret"))
def backward_stats_pallas(
    feats_tdb: jax.Array,
    log_b: jax.Array,
    log_alpha: jax.Array,
    a_ms: jax.Array,
    bias_g: jax.Array,
    bias_ms: jax.Array,
    logw_ms: jax.Array,
    trans: jax.Array,
    lengths: jax.Array,
    safe_z: jax.Array,
    vmask: jax.Array,
    origin: jax.Array | None = None,
    k_block: int = 16,
    band: int | None = None,
    interpret: bool | None = None,
):
    """Fused log-domain backward + statistics pass.

    feats_tdb (T, D, B); log_b / log_alpha (T, S, B) from
    emit_forward_pallas; trans (S, S) linear; safe_z (B,) per-utterance
    final log-prob (0 where invalid); vmask (B,) 1.0/0.0 validity;
    origin: (D,) feature shift the constants were packed about (moments
    come back ABOUT this origin — unshift them, see pack_lane_constants);
    band: static band width (trans_band) or None for dense.

    Returns (xi_or_uv, den_trans (S, B), den_mix (S, B), mom (M*S, L+1)
    with L the lift width).  Banded (band is not None): xi_or_uv is the
    EXACT per-diagonal xi (band+1, S, B) — num_trans[j-d, j] =
    xi[d, j].sum(B) (already includes the transition weight).  Dense:
    xi_or_uv is the (S, S) U/V contraction — num_trans = trans * uv.
    Reduce over B (and reorder moments) in XLA.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, D, B = feats_tdb.shape
    n_a, a_w = a_ms.shape
    S = trans.shape[0]
    assert a_w in (2 * D, D) and T % k_block == 0
    full = a_w == D and a_w != 2 * D
    MS = n_a // D if full else n_a
    lift_dim = (D + D * D) if full else 2 * D  # moment-lift width
    M = MS // S
    lens = lengths.astype(jnp.float32).reshape(1, B)
    zr = safe_z.astype(jnp.float32).reshape(1, B)
    vm = vmask.astype(jnp.float32).reshape(1, B)
    o_col = (
        jnp.zeros((D, 1), jnp.float32)
        if origin is None
        else origin.astype(jnp.float32).reshape(D, 1)
    )
    lt_lin = trans.astype(jnp.float32)
    lt_log = jnp.where(
        lt_lin > 0.0, jnp.log(jnp.maximum(lt_lin, _TINY)), NEG_INF
    ).astype(jnp.float32)
    nbands = (band + 1) if band is not None else 1
    # diag_rows[d][i] = lt_log[i, i+d]
    i = jnp.arange(S)
    diag = jnp.stack(
        [
            jnp.where(
                (i + d < S)[:, None],
                lt_log[i, jnp.minimum(i + d, S - 1)][:, None],
                NEG_INF,
            ).astype(jnp.float32)
            for d in range(nbands)
        ],
        axis=0,
    )  # (nbands, S, 1)

    nb = T // k_block
    rev = lambda t: (nb - 1 - t, 0 * t, 0 * t)
    zero2 = lambda t: (0 * t, 0 * t)
    zero3 = lambda t: (0 * t, 0 * t, 0 * t)
    if band is None:
        xi_spec = pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM)
        xi_shape = jax.ShapeDtypeStruct((S, S), jnp.float32)
    else:
        xi_spec = pl.BlockSpec((band + 1, S, B), zero3, memory_space=pltpu.VMEM)
        xi_shape = jax.ShapeDtypeStruct((band + 1, S, B), jnp.float32)
    return pl.pallas_call(
        partial(_bwd_stats_kernel, M, k_block, band, full),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k_block, D, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, S, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, S, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbands, S, 1), zero3, memory_space=pltpu.VMEM),
            pl.BlockSpec(a_ms.shape, zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_g.shape, zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), zero2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            xi_spec,
            pl.BlockSpec((S, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((MS, lift_dim + 1), zero2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            xi_shape,
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((MS, lift_dim + 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, B), jnp.float32),
            pltpu.VMEM((S, B), jnp.float32),
        ],
        interpret=interpret,
    )(
        feats_tdb.astype(jnp.float32),
        log_b, log_alpha, lt_log, diag, a_ms, bias_g, bias_ms, logw_ms,
        o_col, lens, zr, vm,
    )


# ---------------------------------------------------------------------------
# multi-stream variants (the reference supports up to 6 parameter streams,
# T1:41, with per-frame emission = product of per-stream GMM likelihoods,
# T1:1437-1441).  Each stream keeps its own refs — separate (T, D_p, B)
# features, GEMM constants, and moment outputs — so nothing needs
# cross-stream padding or misaligned sublane slicing; the forward/backward
# recursions run on the summed per-stream log_b.  K2 recomputes each
# stream's own mixture logsumexp in VMEM for its posteriors (the total
# log_b from HBM only drives the lattice recursion).
# ---------------------------------------------------------------------------


def _emit_fwd_kernel_multi(mixes, k_block, band, full, *refs):
    """Multi-stream K1.  refs: per-stream [feats_p], [a_p], [bias_g_p],
    [bias_p], [logw_p], [o_p], then lt_log, diag, len; outs log_b, la;
    scratch la_carry."""
    P = len(mixes)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    o_refs = refs[5 * P : 6 * P]
    lt_log_ref, diag_ref, len_ref, log_b_ref, la_ref, la_carry_ref = refs[6 * P :]
    tb = pl.program_id(0)
    S = lt_log_ref.shape[0]
    B = la_carry_ref.shape[1]
    lens = len_ref[:]
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    diag_cols = (
        [diag_ref[d] for d in range(band + 1)] if band is not None else None
    )

    for k in range(k_block):
        log_b = None
        for p in range(P):
            x = feats_refs[p][k] - o_refs[p][:]
            q = _emission_q(
                x, a_refs[p], bias_g_refs[p], bias_refs[p], logw_refs[p], full
            )
            lb_p = _log_b_from_q(q, S, mixes[p])
            log_b = lb_p if log_b is None else log_b + lb_p
        log_b = jnp.maximum(log_b, neg)
        log_b_ref[k] = log_b

        def first():
            start = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == 0,
                jnp.float32(0.0),
                neg,
            )
            return jnp.maximum(start + log_b, neg)

        def rest():
            upd = _fwd_update(
                la_carry_ref[:], lt_log_ref[:], diag_cols, band, neg, tiny
            )
            return jnp.maximum(upd + log_b, neg)

        if k == 0:
            new = jax.lax.cond(tb == 0, first, rest)
        else:
            new = rest()
        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t
        if k == 0:
            keep = keep | (tb == 0)
        la_carry_ref[:] = jnp.where(keep, new, la_carry_ref[:])
        la_ref[k] = la_carry_ref[:]


def _bwd_stats_kernel_multi(mixes, k_block, band, full, *refs):
    """Multi-stream K2.  refs: per-stream [feats_p], [a_p], [bias_g_p],
    [bias_p], [logw_p], [o_p], then lb, la, lt_log, diag, len, z, vmask;
    outs uv, den_trans, den_mix, [mom_p]; scratches lbw, lbb."""
    P = len(mixes)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    o_refs = refs[5 * P : 6 * P]
    rest = refs[6 * P :]
    lb_ref, la_ref, lt_log_ref, diag_ref, len_ref, z_ref, vmask_ref = rest[:7]
    uv_ref, den_trans_ref, den_mix_ref = rest[7:10]
    mom_refs = rest[10 : 10 + P]
    lbw_ref, lbb_ref = rest[10 + P :]

    tb = pl.program_id(0)
    nb = pl.num_programs(0)
    S = lt_log_ref.shape[0]
    B = lbw_ref.shape[1]
    lens = len_ref[:]
    z = z_ref[:]
    vmask = vmask_ref[:]
    t_lo = (nb - 1 - tb) * k_block
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    zero = jnp.float32(0.0)
    v_cap = jnp.float32(30.0)
    diag_rows = (
        [diag_ref[d] for d in range(band + 1)] if band is not None else None
    )
    lbw_init = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == S - 1, zero, neg
    )

    if band is None:
        acc_uv = jnp.zeros((S, S), jnp.float32)
    else:
        acc_xi = [jnp.zeros((S, B), jnp.float32) for _ in range(band + 1)]
        dcols = [_shift_down(diag_rows[d], d, neg) for d in range(band + 1)]
    acc_dt = jnp.zeros((S, B), jnp.float32)
    acc_dm = jnp.zeros((S, B), jnp.float32)
    acc_moms = [
        jnp.zeros(mom_refs[p].shape, jnp.float32) for p in range(P)
    ]

    for k in range(k_block - 1, -1, -1):
        t = t_lo + k
        tf = jnp.float32(1.0) * t
        la_t = la_ref[k]
        lbn = lbb_ref[:] if k == k_block - 1 else lb_ref[k + 1]
        lbw_next = lbw_ref[:]

        m_xi = ((lens - jnp.float32(1.0)) > tf) & (vmask > zero)
        if band is not None:
            # exact per-diagonal xi (see _bwd_stats_kernel docstring) —
            # essential here: summed multi-stream emissions double the
            # per-frame alpha spread and the capped U/V factorization
            # loses real xi mass
            lnz = jnp.maximum(lbn + lbw_next, neg) - z
            for d in range(band + 1):
                term = _shift_down(la_t, d, neg) + dcols[d] + lnz
                acc_xi[d] = acc_xi[d] + jnp.where(
                    m_xi, jnp.exp(jnp.minimum(term, zero)), zero
                )
        else:
            c_t = jnp.maximum(jnp.max(la_t, axis=0, keepdims=True), neg)
            u = jnp.where(m_xi, jnp.exp(la_t - c_t), zero)
            lv = jnp.maximum(lbn + lbw_next, neg) - (z - c_t)
            v = jnp.where(m_xi, jnp.exp(jnp.minimum(lv, v_cap)), zero)
            acc_uv = acc_uv + jax.lax.dot_general(
                u, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        inner = jnp.maximum(lbn + lbw_next, neg)
        upd = _bwd_update(inner, lt_log_ref[:], diag_rows, band, neg, tiny)
        active = (lens - jnp.float32(1.0)) > tf
        lbw_ref[:] = jnp.where(active, upd, lbw_init)

        m_g = (lens > tf) & (vmask > zero)
        gamma = jnp.exp(jnp.minimum(la_t + lbw_ref[:] - z, zero))
        gamma = jnp.where(m_g, gamma, zero)
        acc_dm = acc_dm + gamma
        acc_dt = acc_dt + jnp.where(m_xi, gamma, zero)

        for p in range(P):
            x = feats_refs[p][k] - o_refs[p][:]
            lift = _lift(x, full)
            q = _emission_q(
                x, a_refs[p], bias_g_refs[p], bias_refs[p], logw_refs[p], full
            )
            # the stream's OWN mixture logsumexp normalizes its posteriors
            # (the total log_b only drives the lattice recursion)
            lb_p = _log_b_from_q(q, S, mixes[p])
            gm_rows = []
            for m in range(mixes[p]):
                qm = q[m * S : (m + 1) * S]
                post = jnp.exp(jnp.minimum(qm - lb_p, zero))
                post = jnp.where(lb_p > jnp.float32(NEG_INF / 2), post, zero)
                gm_rows.append(gamma * post)
            gm = jnp.concatenate(gm_rows, axis=0)
            lift19 = jnp.concatenate(
                [lift, jnp.ones((1, B), jnp.float32)], axis=0
            )
            acc_moms[p] = acc_moms[p] + jax.lax.dot_general(
                gm, lift19, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    lbb_ref[:] = lb_ref[0]
    first = tb == 0

    @pl.when(first)
    def _():
        if band is None:
            uv_ref[:] = acc_uv
        else:
            for d in range(band + 1):
                uv_ref[d] = acc_xi[d]
        den_trans_ref[:] = acc_dt
        den_mix_ref[:] = acc_dm
        for p in range(P):
            mom_refs[p][:] = acc_moms[p]

    @pl.when(jnp.logical_not(first))
    def _():
        if band is None:
            uv_ref[:] += acc_uv
        else:
            for d in range(band + 1):
                uv_ref[d] += acc_xi[d]
        den_trans_ref[:] += acc_dt
        den_mix_ref[:] += acc_dm
        for p in range(P):
            mom_refs[p][:] += acc_moms[p]


@partial(jax.jit, static_argnames=("k_block", "band", "interpret"))
def emit_forward_pallas_multi(
    feats_list,
    a_list,
    bias_g_list,
    bias_list,
    logw_list,
    trans,
    lengths,
    origins,
    k_block: int = 16,
    band: int | None = None,
    interpret: bool | None = None,
):
    """Multi-stream emit+forward: per-stream (T, D_p, B) features and
    pack_lane_constants outputs (tuples, one entry per stream) ->
    (log_b, log_alpha) on the SUMMED per-stream log-likelihoods."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = len(feats_list)
    T, _, B = feats_list[0].shape
    S = trans.shape[0]
    full = a_list[0].shape[1] == feats_list[0].shape[1]
    mixes = tuple(
        (a.shape[0] // f.shape[1] if full else a.shape[0]) // S
        for a, f in zip(a_list, feats_list)
    )
    assert T % k_block == 0
    lens = lengths.astype(jnp.float32).reshape(1, B)
    o_cols = [
        o.astype(jnp.float32).reshape(f.shape[1], 1)
        for o, f in zip(origins, feats_list)
    ]
    lt_lin = trans.astype(jnp.float32)
    lt_log = jnp.where(
        lt_lin > 0.0, jnp.log(jnp.maximum(lt_lin, _TINY)), NEG_INF
    ).astype(jnp.float32)
    nbands = (band + 1) if band is not None else 1
    j = jnp.arange(S)
    diag = jnp.stack(
        [
            jnp.where(
                (j - d >= 0)[:, None],
                lt_log[jnp.maximum(j - d, 0), j][:, None],
                NEG_INF,
            ).astype(jnp.float32)
            for d in range(nbands)
        ],
        axis=0,
    )

    grid = (T // k_block,)
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    tblk = lambda shape: pl.BlockSpec(
        shape, lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM
    )
    in_specs = (
        [tblk((k_block, f.shape[1], B)) for f in feats_list]
        + [tvm(a.shape) for a in a_list]
        + [tvm(bg.shape) for bg in bias_g_list]
        + [tvm(b.shape) for b in bias_list]
        + [tvm(lw.shape) for lw in logw_list]
        + [tvm(o.shape) for o in o_cols]
        + [tvm((S, S)), tvm((nbands, S, 1)), tvm((1, B))]
    )
    return pl.pallas_call(
        partial(_emit_fwd_kernel_multi, mixes, k_block, band, full),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            tblk((k_block, S, B)),
            tblk((k_block, S, B)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, B), jnp.float32),
            jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(
        *[f.astype(jnp.float32) for f in feats_list],
        *a_list, *bias_g_list, *bias_list, *logw_list, *o_cols,
        lt_log, diag, lens,
    )


@partial(jax.jit, static_argnames=("k_block", "band", "interpret"))
def backward_stats_pallas_multi(
    feats_list,
    log_b,
    log_alpha,
    a_list,
    bias_g_list,
    bias_list,
    logw_list,
    trans,
    lengths,
    safe_z,
    vmask,
    origins,
    k_block: int = 16,
    band: int | None = None,
    interpret: bool | None = None,
):
    """Multi-stream backward+stats: returns (xi_or_uv, den_trans,
    den_mix, (mom_p, ...)) with one (M_p*S, L_p+1) moment block per
    stream; xi_or_uv follows backward_stats_pallas' banded/dense
    contract."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = len(feats_list)
    T, _, B = feats_list[0].shape
    S = trans.shape[0]
    full = a_list[0].shape[1] == feats_list[0].shape[1]
    mixes = tuple(
        (a.shape[0] // f.shape[1] if full else a.shape[0]) // S
        for a, f in zip(a_list, feats_list)
    )
    lifts = tuple(
        (f.shape[1] + f.shape[1] ** 2) if full else 2 * f.shape[1]
        for f in feats_list
    )
    assert T % k_block == 0
    lens = lengths.astype(jnp.float32).reshape(1, B)
    zr = safe_z.astype(jnp.float32).reshape(1, B)
    vm = vmask.astype(jnp.float32).reshape(1, B)
    o_cols = [
        o.astype(jnp.float32).reshape(f.shape[1], 1)
        for o, f in zip(origins, feats_list)
    ]
    lt_lin = trans.astype(jnp.float32)
    lt_log = jnp.where(
        lt_lin > 0.0, jnp.log(jnp.maximum(lt_lin, _TINY)), NEG_INF
    ).astype(jnp.float32)
    nbands = (band + 1) if band is not None else 1
    i = jnp.arange(S)
    diag = jnp.stack(
        [
            jnp.where(
                (i + d < S)[:, None],
                lt_log[i, jnp.minimum(i + d, S - 1)][:, None],
                NEG_INF,
            ).astype(jnp.float32)
            for d in range(nbands)
        ],
        axis=0,
    )

    nb = T // k_block
    rev = lambda shape: pl.BlockSpec(
        shape, lambda t: (nb - 1 - t, 0 * t, 0 * t), memory_space=pltpu.VMEM
    )
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = (
        [rev((k_block, f.shape[1], B)) for f in feats_list]
        + [tvm(a.shape) for a in a_list]
        + [tvm(bg.shape) for bg in bias_g_list]
        + [tvm(b.shape) for b in bias_list]
        + [tvm(lw.shape) for lw in logw_list]
        + [tvm(o.shape) for o in o_cols]
        + [
            rev((k_block, S, B)),
            rev((k_block, S, B)),
            tvm((S, S)),
            tvm((nbands, S, 1)),
            tvm((1, B)),
            tvm((1, B)),
            tvm((1, B)),
        ]
    )
    xi_shape = (S, S) if band is None else (band + 1, S, B)
    out_specs = [
        tvm(xi_shape),
        tvm((S, B)),
        tvm((S, B)),
    ] + [tvm((mixes[p] * S, lifts[p] + 1)) for p in range(P)]
    out_shape = [
        jax.ShapeDtypeStruct(xi_shape, jnp.float32),
        jax.ShapeDtypeStruct((S, B), jnp.float32),
        jax.ShapeDtypeStruct((S, B), jnp.float32),
    ] + [
        jax.ShapeDtypeStruct((mixes[p] * S, lifts[p] + 1), jnp.float32)
        for p in range(P)
    ]
    out = pl.pallas_call(
        partial(_bwd_stats_kernel_multi, mixes, k_block, band, full),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((S, B), jnp.float32),
            pltpu.VMEM((S, B), jnp.float32),
        ],
        interpret=interpret,
    )(
        *[f.astype(jnp.float32) for f in feats_list],
        *a_list, *bias_g_list, *bias_list, *logw_list, *o_cols,
        log_b, log_alpha, lt_log, diag, lens, zr, vm,
    )
    return out[0], out[1], out[2], tuple(out[3:])
