"""Embedded re-estimation: Baum-Welch over transcript-composed HMM chains.

The reference trains each word model in isolation from pre-segmented
exemplars.  Phone-based systems (BASELINE.json config 4: ~40 monophones,
32-mixture GMMs) instead train ALL unit models jointly from full utterances
plus transcripts: each utterance's HMM is the left-to-right concatenation of
its transcript's unit models (decode/continuous.py compose_sequence), the
forward-backward runs over the composed state space, and the per-position
statistics scatter-add back onto the shared unit models.

TPU-native design:
* unit emissions/posteriors are computed ONCE per unit (P, T, S[, M]) — a
  batched GEMM over the whole unit inventory — then gathered per transcript
  position; repeated units cost nothing extra;
* the composed forward/backward reuses the masked log-space scans over the
  (T, L*S) lattice; xi is accumulated block-wise ((L, S, S) within-unit plus
  the (L-1,) chain arcs folded into the exit self-loop, never materializing
  (L*S)^2 per frame;
* the scatter back to units is `zeros.at[transcript].add(...)` — a dense
  segment-sum XLA lowers efficiently; utterances with equal (T, L) buckets
  batch under vmap;
* the M-step is the standard one vmapped over the unit axis.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gmm_hmm import DIAG, FULL, GmmHmm
from ..ops.emission import log_mixture_posteriors
from ..ops.forward_backward import log_backward_full, log_forward_full
from .em import StreamStats, SuffStats, gmm_moment_stats, m_step


def _composed_log_trans(unit_log_trans: jax.Array) -> jax.Array:
    """(L, S, S) per-position unit transitions -> (L*S, L*S) chain graph.
    The chain arc k.exit -> (k+1).entry carries the exit state's self-loop
    mass (see decode/continuous.compose_sequence)."""
    L, S, _ = unit_log_trans.shape
    lt = jnp.full((L, S, L, S), -jnp.inf, unit_log_trans.dtype)
    lt = lt.at[jnp.arange(L), :, jnp.arange(L), :].set(unit_log_trans)
    if L > 1:
        arc = unit_log_trans[:-1, S - 1, S - 1]
        lt = lt.at[jnp.arange(L - 1), S - 1, jnp.arange(1, L), 0].set(arc)
    return lt.reshape(L * S, L * S)


def utterance_stats_positional(
    models: GmmHmm,
    transcript: jax.Array,
    feats: jax.Array,
    length: jax.Array,
) -> SuffStats:
    """Per-POSITION E-step statistics for one utterance against the shared
    unit models.

    models: stacked GmmHmm with leading unit axis P; transcript: (L,) int32
    unit ids; feats: (T, D) padded; length: valid frames.
    Returns SuffStats whose leading axis is the transcript POSITION L (and
    the (L, S) pair for den_trans/den_mix) — the scatter back to unit space
    happens at the batch level in `batch_stats`.
    """
    P = models.trans.shape[0]
    S = models.trans.shape[-1]
    L = transcript.shape[0]
    T = feats.shape[0]
    dtype = feats.dtype

    # Gather the (L, S) per-position GMM parameters into a flat (L*S,) bank
    # and compute emissions/posteriors on that bank only.  Computing
    # emissions for ALL P units and gathering afterwards (the round-1
    # design) materializes (B, P, T, S, M) posteriors under the batch vmap
    # — 4 GB and 43 of the 66 ms/iter at the config-4 shape; the gathered
    # bank is (B, T, L*S, M) and scales with the transcript, not the
    # inventory (same structure as train/tied.py).
    def gather_stream(stream):
        return stream.replace(
            weights=stream.weights[transcript].reshape(L * S, -1),
            means=stream.means[transcript].reshape(L * S, *stream.means.shape[2:]),
            inv_cov=stream.inv_cov[transcript].reshape(
                L * S, *stream.inv_cov.shape[2:]
            ),
            det=stream.det[transcript].reshape(L * S, -1),
            log_det=(
                None
                if stream.log_det is None
                else stream.log_det[transcript].reshape(L * S, -1)
            ),
        )

    pos_lbs, pos_posts = [], []
    for stream in models.streams:
        lb, post = log_mixture_posteriors(feats, gather_stream(stream))
        pos_lbs.append(lb)  # (T, L*S)
        pos_posts.append(post)  # (T, L*S, M)
    log_b = sum(pos_lbs[1:], pos_lbs[0])  # (T, L*S)
    lb_pos = log_b.reshape(T, L, S)

    unit_logt = models.log_trans().astype(dtype)  # (P, S, S)
    pos_logt = unit_logt[transcript]  # (L, S, S)
    log_trans = _composed_log_trans(pos_logt)

    la = log_forward_full(log_b, log_trans, length)
    lbw = log_backward_full(log_b, log_trans, length)
    log_z = la[-1, -1]
    valid = jnp.isfinite(log_z) & (length > 0)
    safe_z = jnp.where(valid, log_z, 0.0)

    t_idx = jnp.arange(T)
    frame_mask = (t_idx < length).astype(dtype)
    la_p = la.reshape(T, L, S)
    lb_p = lbw.reshape(T, L, S)

    gamma = jnp.exp(jnp.minimum(la_p + lb_p - safe_z, 0.0)) * frame_mask[:, None, None]

    xi_mask = (t_idx[:-1] < length - 1).astype(dtype)
    fwd_in = (lb_pos + lb_p)[1:]  # (T-1, L, S): log_b + beta at t+1
    log_xi = (
        la_p[:-1, :, :, None] + pos_logt[None] + fwd_in[:, :, None, :] - safe_z
    )
    xi = jnp.exp(jnp.minimum(log_xi, 0.0)) * xi_mask[:, None, None, None]
    xi_pos = xi.sum(0)  # (L, S, S)
    if L > 1:
        arc = pos_logt[:-1, S - 1, S - 1]
        cross = (
            la_p[:-1, :-1, S - 1] + arc[None] + fwd_in[:, 1:, 0] - safe_z
        )
        cross_flow = jnp.exp(jnp.minimum(cross, 0.0)) * xi_mask[:, None]
        xi_pos = xi_pos.at[:-1, S - 1, S - 1].add(cross_flow.sum(0))

    den_trans_pos = (gamma[:-1] * xi_mask[:, None, None]).sum(0)  # (L, S)
    den_mix_pos = gamma.sum(0)  # (L, S)

    stream_stats = []
    for si, stream in enumerate(models.streams):
        gm = gamma.reshape(T, L * S)[..., None] * pos_posts[si]  # (T, LS, M)
        # shared single-pass moment GEMMs (train/em.gmm_moment_stats),
        # grouped over the L*S transcript positions
        w, x, xx = gmm_moment_stats(gm, feats, stream.cov_type)
        unflat = lambda a: a.reshape(L, S, *a.shape[1:])
        stream_stats.append(
            StreamStats(w=unflat(w), x=unflat(x), xx=unflat(xx))
        )

    zero = lambda a: jnp.where(valid, a, jnp.zeros_like(a))
    return SuffStats(
        num_trans=zero(xi_pos),
        den_trans=zero(den_trans_pos),
        den_mix=zero(den_mix_pos),
        streams=tuple(
            StreamStats(w=zero(s.w), x=zero(s.x), xx=zero(s.xx))
            for s in stream_stats
        ),
        log_prob=jnp.where(valid, log_z, 0.0),
        num_valid=valid.astype(dtype),
    )


def batch_stats(
    models: GmmHmm,
    transcripts: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
) -> SuffStats:
    """Batch E-step statistics in UNIT space: vmapped positional stats, then
    ONE scatter-add over the (B*L,) transcript unit ids.  Scattering inside
    the per-utterance vmap would materialize (B, P, ...) inventory stats —
    prohibitive for large unit inventories (the tied config-5 analog is
    gigabytes); positional stats are only (B, L, ...)."""
    P = models.trans.shape[0]
    B, L = transcripts.shape
    dtype = feats.dtype
    per = jax.vmap(
        lambda tr, f, l: utterance_stats_positional(models, tr, f, l)
    )(transcripts, feats, lengths)

    ids = transcripts.reshape(B * L)
    seg = lambda a: (
        jnp.zeros((P,) + a.shape[2:], dtype).at[ids].add(a.reshape(B * L, *a.shape[2:]))
    )
    return SuffStats(
        num_trans=seg(per.num_trans),
        den_trans=seg(per.den_trans),
        den_mix=seg(per.den_mix),
        streams=tuple(
            StreamStats(w=seg(s.w), x=seg(s.x), xx=seg(s.xx))
            for s in per.streams
        ),
        log_prob=per.log_prob.sum(),
        num_valid=per.num_valid.sum(),
    )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def fused_positional_stats(
    ids: jax.Array,
    bank: jax.Array,
    bias2: jax.Array | None,
    pos_logt: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
    n_mix: int,
    cov_full: bool = False,
    k_block: int = 16,
    group: int = 8,
    gamma_lattice: bool = True,
    interpret: bool | None = None,
):
    """Shared fused composed-lattice E-step core (embedded AND tied paths).

    ids (B, L*S) int32 flat-position -> bank-row map (unit_id*S + s for
    embedded, senone id for tied); bank / bias2: VMEM-resident parameter
    bank from pack_position_bank_diag / pack_position_bank_full (mixtures
    padded to Mp, a multiple of 8); pos_logt (B, L, S, S) per-position
    LEFT-RIGHT unit log-transitions; feats (B, T, D); lengths (B,).

    Runs the four composed_pallas.py kernels (emission, forward,
    backward+stats, moments).  The per-utterance emission constants are
    assembled IN-KERNEL from the bank via scalar-prefetched ids — the
    round-3 XLA `a_pos` gather (3 HBM passes over a ~150x-inflated bank
    copy, ~half the config-4 step) no longer exists — and the GMM moment
    statistics come back already scatter-accumulated in BANK-ROW space
    (the moments kernel RMWs its VMEM-resident accumulator; the round-3
    (B, L, S, M, 2D+1) per-utterance moment tensor and its XLA
    segment-sum are gone).  Returns:
      mom      (NB, Mp, Cm)  bank-row rows of [sum gm*x | sum gm*x^2 or
               sum gm*vec(xx^T) | sum gm], Cm = 2D+1 diag, D+D^2+1 full;
               slice [:, :n_mix] for the real mixtures
      den_mix  (B, L, S)
      den_trans(B, L, S)
      num_trans(B, L, S, S)        incl. chain flow folded into exit loops
      safe_z   (B,), vmask (B,)
    """
    from ..ops.pallas.composed_pallas import (
        NEG_INF,
        bank_emission_pallas,
        bank_moments_pallas,
        composed_backward_stats_pallas,
        composed_forward_pallas,
    )

    multi = isinstance(bank, tuple)
    banks = bank if multi else (bank,)
    bias2s = bias2 if multi else (bias2,)
    P_s = len(banks)
    B, L, S, _ = pos_logt.shape
    T = feats.shape[1]
    D = feats.shape[-1]
    mixes = n_mix if multi else (n_mix,)
    mps = tuple(
        (bk.shape[1] // D) if cov_full else bk.shape[1] for bk in banks
    )
    LS = L * S
    band = max(S - 1, 1)  # chain arc is flattened distance 1
    dtype = jnp.float32

    B_pad = _round_up(B, 128)
    T_pad = _round_up(_round_up(T, k_block), 128)
    LS_pad = _round_up(LS, 8)
    feats = jnp.pad(
        feats.astype(dtype), ((0, B_pad - B), (0, T_pad - T), (0, 0))
    )
    lengths = jnp.pad(lengths, (0, B_pad - B))
    ids = jnp.pad(ids.astype(jnp.int32), ((0, B_pad - B), (0, 0)))
    pos_logt = jnp.pad(
        pos_logt.astype(dtype), ((0, B_pad - B), (0, 0), (0, 0), (0, 0))
    )

    # --- emissions (lane axis = time; lattice-layout transpose fused) -----
    feats_bdt = jnp.transpose(feats, (0, 2, 1))  # (B, D, T)
    feats_tup = (feats_bdt,) * P_s  # streams share the feature matrix
    log_b_tsb = bank_emission_pallas(
        ids, banks, bias2s, feats_tup, n_mix_p=mps, ls_pad=LS_pad,
        full=cov_full, interpret=interpret,
    )  # (T, LS_pad, B) — forward/backward-ready, no XLA transpose

    # --- per-lane composed banded transition diagonals ---------------------
    s_idx = jnp.arange(S)
    diags = []
    for d in range(band + 1):
        within = jnp.where(
            (s_idx + d < S)[None, None, :],
            pos_logt[:, :, s_idx, jnp.minimum(s_idx + d, S - 1)],
            -jnp.inf,
        )  # (B, L, S)
        if d == 1 and L > 1:
            # chain arc: exit of unit l -> entry of unit l+1 carries the
            # exit self-loop mass (_composed_log_trans)
            chain = pos_logt[:, :, S - 1, S - 1]  # (B, L)
            within = within.at[:, :-1, S - 1].set(chain[:, :-1])
        diags.append(within.reshape(B_pad, LS))
    diag_row = jnp.stack(diags, 0)  # (band+1, B, LS): row form lt[i, i+d]
    diag_row = jnp.pad(
        jnp.transpose(diag_row, (0, 2, 1)),
        ((0, 0), (0, LS_pad - LS), (0, 0)),
        constant_values=-jnp.inf,
    )  # (band+1, LS_pad, B)
    neg = jnp.float32(NEG_INF)
    diag_row = jnp.maximum(diag_row, neg)
    # column form: diag_col[d, j] = lt[j-d, j] = diag_row[d, j-d]
    diag_col = jnp.stack(
        [
            jnp.pad(
                diag_row[d, : LS_pad - d], ((d, 0), (0, 0)), constant_values=NEG_INF
            )
            for d in range(band + 1)
        ],
        0,
    )

    # --- lattices (lane axis = batch) --------------------------------------
    la = composed_forward_pallas(
        log_b_tsb, diag_col, lengths, k_block=k_block, band=band,
        interpret=interpret,
    )
    log_z = la[-1, LS - 1, :]  # (B,) — rows repeat past each length
    valid = jnp.isfinite(log_z) & (log_z > NEG_INF / 2) & (lengths > 0)
    vmask = valid.astype(dtype)
    safe_z = jnp.where(valid, log_z, 0.0)

    gamma_tsb, xi_diag, den_trans_sb, den_mix_sb = composed_backward_stats_pallas(
        log_b_tsb, la, diag_row, lengths, safe_z, vmask,
        final=LS - 1, k_block=k_block, band=band, interpret=interpret,
    )

    # --- moments (lane axis = time; in-kernel bank-row scatter) -----------
    if gamma_lattice:
        # round 5: the moments kernel consumes K_B's (T, LSp, B) gamma
        # layout directly (per-grid-step VMEM transpose) — the XLA gamma
        # transpose, the last HBM round-trip between the kernels, no
        # longer exists
        from ..ops.pallas.composed_pallas import bank_moments_lattice_pallas

        mom = bank_moments_lattice_pallas(
            ids, banks, bias2s, feats_tup, gamma_tsb,
            n_mix_p=mps, full=cov_full, interpret=interpret,
        )  # per-stream (NB, Mp, Cm) bank-row accumulators
    else:  # the round-4 path (kept for A/B measurement and fallback)
        gamma_bst = jnp.transpose(gamma_tsb[:, :LS, :], (2, 1, 0))  # (B, LS, T)
        mom = bank_moments_pallas(
            ids, banks, bias2s, feats_tup, gamma_bst,
            n_mix_p=mps, full=cov_full, group=group, interpret=interpret,
        )
    if not multi:
        mom = mom[0]
    den_mix = jnp.transpose(den_mix_sb[:LS], (1, 0)).reshape(B_pad, L, S)[:B]
    den_trans = jnp.transpose(den_trans_sb[:LS], (1, 0)).reshape(B_pad, L, S)[:B]

    xi_bls = jnp.transpose(xi_diag[:, :LS, :], (2, 0, 1)).reshape(
        B_pad, band + 1, L, S
    )
    nt = jnp.zeros((B_pad, L, S, S), dtype)
    for d in range(band + 1):
        s_in = jnp.arange(S - d)
        nt = nt.at[:, :, s_in, s_in + d].add(xi_bls[:, d, :, : S - d])
    if L > 1:
        # the d=1 diagonal at each unit's exit row is the CHAIN arc flow;
        # reference semantics fold it into the exit self-loop
        # (train/embedded.batch_stats; R-chain in _composed_log_trans)
        nt = nt.at[:, :-1, S - 1, S - 1].add(xi_bls[:, 1, :-1, S - 1])
    return mom, den_mix, den_trans, nt[:B], safe_z[:B], vmask[:B]


def pack_position_bank(means, inv_cov, weights, log_abs_det, D):
    """Diag-Gaussian lifted-GEMM constants for a parameter bank with an
    arbitrary leading index shape: means/inv_cov (..., M, D), weights /
    log_abs_det (..., M).  Returns (a (..., M, 2D), bias (..., M)) such
    that  a . [x; x^2] + bias  is the weighted per-mixture log-likelihood
    (pack_lane_constants semantics, ops/pallas/fused_em_pallas.py)."""
    mu = means.astype(jnp.float64)
    kk = inv_cov.astype(jnp.float64)
    w = weights.astype(jnp.float64)
    from ..ops.pallas.composed_pallas import NEG_INF

    a = jnp.concatenate([mu * kk, -0.5 * kk], axis=-1)
    bias = (
        -0.5 * jnp.sum(mu * mu * kk, axis=-1)
        + jnp.log(jnp.maximum(w, 1e-300))
        - 0.5 * (D * math.log(2.0 * math.pi) + log_abs_det.astype(jnp.float64))
    )
    return a, jnp.maximum(bias, NEG_INF)


def _pad_mix(M: int) -> int:
    """Mixture rows padded to the f32 sublane tile so every in-kernel bank
    copy / reshape / mixture reduction is tile-aligned."""
    return _round_up(max(M, 1), 8)


def pack_position_bank_diag(means, inv_cov, weights, log_abs_det, D):
    """VMEM-resident diag bank for the in-kernel-gather composed kernels:
    (NB, Mp, 2D+1) f32 rows [mu*k | -k/2 | bias+logw], leading dims of the
    inputs flattened to NB, mixtures padded to Mp (multiple of 8) with
    bias = NEG_INF rows (inert in logsumexp and posteriors)."""
    from ..ops.pallas.composed_pallas import NEG_INF

    a, bias = pack_position_bank(means, inv_cov, weights, log_abs_det, D)
    M = a.shape[-2]
    bank = jnp.concatenate([a, bias[..., None]], axis=-1)  # (..., M, 2D+1)
    bank = bank.reshape(-1, M, 2 * D + 1)
    Mp = _pad_mix(M)
    if Mp > M:
        pad = jnp.full((bank.shape[0], Mp - M, 2 * D + 1), 0.0, bank.dtype)
        pad = pad.at[..., -1].set(NEG_INF)
        bank = jnp.concatenate([bank, pad], axis=1)
    return bank.astype(jnp.float32)


def pack_position_bank_full(means, inv_cov, weights, log_abs_det, D):
    """VMEM-resident FULL-covariance bank (Cholesky z-GEMM lift,
    fused_em_pallas.pack_lane_constants semantics): means (..., M, D),
    inv_cov (..., M, D, D), weights / log_abs_det (..., M).

    Returns (bank (NB, D*Mp, D+1), bias2 (NB, Mp, 2)): bank rows d-major
    per entry — row d*Mp + m = [row d of L_m^T | -(L_m^T mu_m)_d] with
    K_m = L_m L_m^T — so  z = bank[i] . [x; 1]  gives the Cholesky factors
    and  quad_m = sum_d z_{d,m}^2  the quadratic form with NO cancellation;
    bias2 = [normalizer-bias, logw] kept separate so the 1e20 density clamp
    (calc_gaus T1:1880-1883) lands between them.  Degenerate mixtures
    (non-finite log|det| -> NEG_INF bias; finite det, non-PD inverse ->
    LOG_GAUS_CLAMP bias) get zeroed rows, as in pack_lane_constants."""
    from ..ops.pallas.composed_pallas import NEG_INF
    from ..ops.pallas.fused_em_pallas import LOG_GAUS_CLAMP

    mu = means.astype(jnp.float64)  # (..., M, D)
    kk = inv_cov.astype(jnp.float64)  # (..., M, D, D)
    w = weights.astype(jnp.float64)
    ld = log_abs_det.astype(jnp.float64)
    M = mu.shape[-2]
    norm = -0.5 * (D * math.log(2.0 * math.pi) + ld)  # (..., M)
    logw = jnp.log(jnp.maximum(w, 1e-300))
    chol = jnp.linalg.cholesky(kk)  # (..., M, D, D) lower, K = L L^T
    zmu = jnp.einsum("...ed,...e->...d", chol, mu)  # L^T mu per mixture
    det_ok = jnp.isfinite(norm)
    ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1)) & det_ok
    chol = jnp.where(ok[..., None, None], chol, 0.0)
    zmu = jnp.where(ok[..., None], zmu, 0.0)
    bias = jnp.where(ok, norm, jnp.where(det_ok, LOG_GAUS_CLAMP, NEG_INF))

    # rows[..., d, m, :] = [chol[..., m, :, d] (row d of L^T) | -zmu[..., m, d]]
    g = jnp.moveaxis(jnp.swapaxes(chol, -1, -2), -2, -3)  # (..., D, M, D)
    c = -jnp.moveaxis(zmu, -1, -2)  # (..., D, M)
    rows = jnp.concatenate([g, c[..., None]], axis=-1)  # (..., D, M, D+1)
    Mp = _pad_mix(M)
    rows = rows.reshape(-1, D, M, D + 1)
    if Mp > M:
        rows = jnp.concatenate(
            [rows, jnp.zeros((rows.shape[0], D, Mp - M, D + 1), rows.dtype)],
            axis=2,
        )
    bank = rows.reshape(-1, D * Mp, D + 1)

    bias2 = jnp.stack(
        [jnp.maximum(bias, NEG_INF), jnp.maximum(logw, NEG_INF)], axis=-1
    ).reshape(-1, M, 2)  # (NB, M, 2)
    if Mp > M:
        pad = jnp.zeros((bias2.shape[0], Mp - M, 2), bias2.dtype)
        pad = pad.at[..., 0].set(NEG_INF)
        bias2 = jnp.concatenate([bias2, pad], axis=1)
    return bank.astype(jnp.float32), bias2.astype(jnp.float32)


def bank_vmem_bytes(n_entries: int, M: int, D: int, full: bool) -> int:
    """VMEM footprint of the resident bank PLUS the moments kernel's
    bank-row-space accumulator (lane-padded f32 tiles) — the fused
    composed path requires both to fit alongside the working blocks."""
    Mp = _pad_mix(M)
    rows = (D * Mp) if full else Mp
    cols = (D + 1) if full else (2 * D + 1)
    bank = n_entries * _round_up(rows, 8) * _round_up(cols, 128) * 4
    if full:
        bank += n_entries * Mp * 128 * 4  # bias2
    cm = (D + D * D + 1) if full else (2 * D + 1)
    mom_acc = n_entries * Mp * _round_up(cm, 128) * 4
    return bank + mom_acc


# conservative resident-bank budget: VMEM on this part is ~128 MB and the
# kernels' working blocks + double-buffered IO need headroom
_BANK_VMEM_LIMIT = 48 * 1024 * 1024


def fused_bank_eligible(n_entries: int, M: int, D: int, full: bool) -> bool:
    """Whether the in-kernel-gather composed path can hold the bank
    VMEM-resident (callers fall back to the XLA path otherwise — only
    enormous full-covariance inventories exceed it)."""
    return bank_vmem_bytes(n_entries, M, D, full) <= _BANK_VMEM_LIMIT


def batch_stats_fused(
    models: GmmHmm,
    transcripts: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
    k_block: int = 16,
    group: int = 8,
    interpret: bool | None = None,
) -> SuffStats:
    """Batch embedded E-step on the fused composed-lattice Pallas kernels
    (ops/pallas/composed_pallas.py) — one or MORE streams (homogeneous
    cov type: the reference's product-of-streams emission, T1:1437-1441),
    diagonal OR full covariance, LEFT-RIGHT (upper-triangular) unit
    transitions.

    Equivalent to `batch_stats` (test-locked); none of the XLA path's
    (B, T, L, S, M) per-mixture tensors ever reach HBM, and the per-unit
    parameter banks stay VMEM-resident (positions resolved in-kernel from
    the scalar-prefetched transcript — no per-utterance constant gather;
    GMM moments scatter in-kernel into unit-state rows).  The composed
    chain is banded with band <= S-1 (see composed_pallas.py), so the
    per-lane lattice recursions run over S rolled diagonals.
    """
    cov = models.streams[0].cov_type
    if cov not in (DIAG, FULL) or any(
        s.cov_type != cov for s in models.streams
    ):
        raise ValueError(
            "batch_stats_fused: homogeneous diag/full streams required"
        )
    cov_full = cov == FULL
    multi = len(models.streams) > 1
    P = models.trans.shape[0]
    S = models.trans.shape[-1]
    B, L = transcripts.shape
    D = feats.shape[-1]
    dtype = jnp.float32

    # bank rows at unit-state granularity: row u*S + s
    banks, bias2s, mixes = [], [], []
    for stream in models.streams:
        if cov_full:
            bk, b2 = pack_position_bank_full(
                stream.means, stream.inv_cov, stream.weights,
                stream.log_abs_det(), D,
            )
        else:
            bk = pack_position_bank_diag(
                stream.means, stream.inv_cov, stream.weights,
                stream.log_abs_det(), D,
            )
            b2 = None
        banks.append(bk)
        bias2s.append(b2)
        mixes.append(stream.num_mixtures)
    pos_ids = (
        transcripts[:, :, None] * S + jnp.arange(S, dtype=jnp.int32)
    ).reshape(B, L * S)
    pos_logt = models.log_trans().astype(dtype)[transcripts]  # (B, L, S, S)

    bank_in = tuple(banks) if multi else banks[0]
    bias2_in = tuple(bias2s) if multi else bias2s[0]
    mix_in = tuple(mixes) if multi else mixes[0]
    mom, den_mix_p, den_trans_p, nt, safe_z, vmask = fused_positional_stats(
        pos_ids, bank_in, bias2_in, pos_logt, feats, lengths, n_mix=mix_in,
        cov_full=cov_full, k_block=k_block, group=group, interpret=interpret,
    )

    # --- unit space: moments arrive pre-scattered (bank row = u*S + s) ----
    ids = transcripts.reshape(B * L)

    def seg(a):  # (B, L, ...) -> (P, ...)
        return jnp.zeros((P,) + a.shape[2:], dtype).at[ids].add(
            a.reshape(B * L, *a.shape[2:])
        )

    moms = mom if multi else (mom,)
    stream_stats = []
    for p_s, m_p in enumerate(moms):
        M = mixes[p_s]
        m_p = m_p[:, :M].reshape(P, S, M, -1)  # (P, S, M, Cm)
        if cov_full:
            xx = m_p[..., D : D + D * D].reshape(P, S, M, D, D)
        else:
            xx = m_p[..., D : 2 * D]
        stream_stats.append(
            StreamStats(
                w=m_p[..., m_p.shape[-1] - 1], x=m_p[..., :D], xx=xx
            )
        )
    return SuffStats(
        num_trans=seg(nt),
        den_trans=seg(den_trans_p),
        den_mix=seg(den_mix_p),
        streams=tuple(stream_stats),
        log_prob=jnp.sum(safe_z * vmask),
        num_valid=vmask.sum(),
    )


def batch_stats_fused_sharded(
    models: GmmHmm,
    transcripts: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
    mesh,
    axis: str = "data",
    k_block: int = 16,
    group: int = 8,
    interpret: bool | None = None,
) -> SuffStats:
    """Data-parallel fused composed E-step: each device runs the
    bank-gather kernels on its utterance shard, unit-space statistics
    psum over `axis` (EM stats are linear in the data — SURVEY §2.4; the
    senone/unit scatter-reductions ARE the mixture-sharded multi-host EM
    all-reduce payload of BASELINE config 5).  GSPMD cannot partition
    pallas_call, so the partitioning is explicit shard_map + ICI psum,
    exactly like train/em.e_step_fused_lane_sharded.  The batch axis
    must divide the mesh `axis`; the model is replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    transcripts = jax.device_put(
        transcripts, NamedSharding(mesh, P(axis, None))
    )
    feats = jax.device_put(feats, NamedSharding(mesh, P(axis, None, None)))
    lengths = jax.device_put(lengths, NamedSharding(mesh, P(axis)))
    fn = _jitted_fused_composed_shard(
        mesh, axis, k_block, group, interpret, jax.tree.structure(models)
    )
    return fn(models, transcripts, feats, lengths)


@lru_cache(maxsize=32)
def _jitted_fused_composed_shard(
    mesh, axis, k_block, group, interpret, model_treedef
):
    """Cached jitted shard_map fused composed E-step (one trace per
    mesh/config — the train/em._jitted_fused_shard policy)."""
    from jax.sharding import PartitionSpec as P

    model_spec = jax.tree.unflatten(
        model_treedef, [P()] * model_treedef.num_leaves
    )

    def shard_fn(models, transcripts, feats, lengths):
        st = batch_stats_fused(
            models, transcripts, feats, lengths,
            k_block=k_block, group=group, interpret=interpret,
        )
        return jax.tree.map(lambda a: jax.lax.psum(a, axis), st)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(model_spec, P(axis, None), P(axis, None, None), P(axis)),
        out_specs=P(),
        # pallas outputs carry no varying-mesh-axes annotation; the psum
        # establishes the replicated out_specs by construction
        check_vma=False,
    )
    return jax.jit(fn)


def embedded_train_scan_sharded(
    models: GmmHmm,
    packed,
    n_iters: int,
    mesh,
    axis: str = "data",
    var_floor: float = 0.0,
    k_block: int = 16,
    group: int = 8,
    interpret: bool | None = None,
):
    """N DATA-PARALLEL embedded EM iterations as ONE jitted
    shard_map(lax.scan) — the em.em_train_scan_sharded dispatch
    amortization for composed-lattice (embedded) training: each device
    runs the bank-gather kernels on its utterance shard of every bucket,
    unit-space statistics psum over `axis` inside the scan body, and the
    replicated vmapped unit M-step is the scan carry.

    packed: tuple of (transcripts (Bk, Lk), feats (Bk, Tk, D),
    lengths (Bk,)) shape buckets (the train_embedded packing); every
    bucket's Bk must divide the mesh `axis` (pad with lengths == 0
    utterances — they contribute nothing).  Returns (final models,
    (n_iters,) log-prob history, (n_iters,) num_valid history) —
    trajectory identical to the single-device _embedded_chunk scan.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_dev = mesh.shape[axis]
    sharded = []
    for trs, feats, lengths in packed:
        if trs.shape[0] % n_dev:
            raise ValueError(
                f"bucket batch {trs.shape[0]} not divisible by mesh axis "
                f"'{axis}' ({n_dev}); pad with empty utterances"
            )
        sharded.append(
            (
                jax.device_put(trs, NamedSharding(mesh, P(axis, None))),
                jax.device_put(feats, NamedSharding(mesh, P(axis, None, None))),
                jax.device_put(lengths, NamedSharding(mesh, P(axis))),
            )
        )
    fn = _jitted_embedded_sharded_scan(
        mesh, axis, n_iters, var_floor, k_block, group, interpret,
        jax.tree.structure(models), len(sharded),
    )
    return fn(models, tuple(sharded))


@lru_cache(maxsize=32)
def _jitted_embedded_sharded_scan(
    mesh, axis, n_iters, var_floor, k_block, group, interpret,
    model_treedef, n_buckets,
):
    """Cached jitted shard_map N-iteration embedded EM scan (one trace per
    mesh/config, the em._jitted_sharded_scan policy)."""
    from jax.sharding import PartitionSpec as P

    from .em import _with_log_det, m_step

    model_spec = jax.tree.unflatten(
        model_treedef, [P()] * model_treedef.num_leaves
    )
    bucket_spec = tuple(
        (P(axis, None), P(axis, None, None), P(axis))
        for _ in range(n_buckets)
    )

    def shard_fn(models, packed):
        models = _with_log_det(models)

        def step(m, _):
            agg = None
            for trs, feats, lengths in packed:
                st = batch_stats_fused(
                    m, trs, feats, lengths,
                    k_block=k_block, group=group, interpret=interpret,
                )
                agg = st if agg is None else jax.tree.map(jnp.add, agg, st)
            agg = jax.tree.map(lambda a: jax.lax.psum(a, axis), agg)
            new = jax.vmap(
                lambda mm, ss: m_step(mm, ss, var_floor=var_floor)
            )(m, _unstack_stats_axis(agg))
            return new, (agg.log_prob, agg.num_valid)

        final, (lps, nvs) = jax.lax.scan(step, models, None, length=n_iters)
        return final, lps, nvs

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(model_spec, bucket_spec),
        out_specs=(model_spec, P(), P()),
        # the psum in the scan body establishes replication by construction
        check_vma=False,
    )
    return jax.jit(fn)


def utterance_stats(
    models: GmmHmm, transcript: jax.Array, feats: jax.Array, length: jax.Array
) -> SuffStats:
    """Unit-space E-step statistics for ONE utterance (batch_stats of a
    singleton batch) — the per-utterance convenience/compat API."""
    return batch_stats(
        models,
        transcript[None],
        feats[None],
        jnp.asarray(length).reshape(1),
    )


def _embedded_fused_default(models: GmmHmm, D: int) -> bool:
    """Auto-select rule shared by embedded_em_step and train_embedded:
    fused composed kernels for homogeneous diag/full streams on TPU with
    VMEM-resident-size banks (all streams' banks must co-reside)."""
    if jax.default_backend() != "tpu":
        return False
    cov = models.streams[0].cov_type
    if cov not in (DIAG, FULL) or any(
        s.cov_type != cov for s in models.streams
    ):
        return False
    P = models.trans.shape[0]
    S = models.trans.shape[-1]
    total = sum(
        bank_vmem_bytes(P * S, s.num_mixtures, D, cov == FULL)
        for s in models.streams
    )
    return total <= _BANK_VMEM_LIMIT


@partial(jax.jit, static_argnames=("var_floor", "fused"))
def embedded_em_step(
    models: GmmHmm,
    transcripts: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
    var_floor: float = 0.0,
    fused: bool | None = None,
):
    """One embedded EM iteration over a bucket of utterances with equal
    padded shapes.  transcripts: (B, L) unit ids (pad positions by repeating
    the last unit and masking via lengths is NOT needed — transcripts must be
    exact; bucket utterances by transcript length); feats: (B, T, D).
    Returns (new models (P-stacked), total log prob, num valid).

    fused=None auto-selects the fused composed-lattice Pallas E-step
    (batch_stats_fused) on TPU for single-stream models (diagonal or full
    covariance) with left-right transitions (the reference structure);
    fused=False forces the XLA path (required for multi-stream models,
    non-left-right unit graphs, or banks too large for VMEM residency).
    """
    if fused is None:
        fused = _embedded_fused_default(models, feats.shape[-1])
    stats = (batch_stats_fused if fused else batch_stats)(
        models, transcripts, feats, lengths
    )
    new_models = jax.vmap(lambda m, s: m_step(m, s, var_floor=var_floor))(
        models, _unstack_stats_axis(stats)
    )
    return new_models, stats.log_prob, stats.num_valid


def _unstack_stats_axis(stats: SuffStats) -> SuffStats:
    """SuffStats whose arrays carry a leading P axis; scalar fields must be
    broadcast so vmap over units sees per-unit scalars."""
    P = stats.num_trans.shape[0]
    return SuffStats(
        num_trans=stats.num_trans,
        den_trans=stats.den_trans,
        den_mix=stats.den_mix,
        streams=stats.streams,
        log_prob=jnp.broadcast_to(stats.log_prob, (P,)),
        num_valid=jnp.broadcast_to(stats.num_valid, (P,)),
    )


@partial(jax.jit, static_argnames=("k", "var_floor", "fused"))
def _embedded_chunk(models, packed, k, var_floor, fused):
    """k embedded EM iterations as one lax.scan over all shape buckets
    (the train/driver.py run_chunk contract): per iteration, bucket
    statistics aggregate on device, then one vmapped unit M-step."""
    from .em import _with_log_det

    models = _with_log_det(models)  # stable scan-carry pytree structure
    stats_fn = batch_stats_fused if fused else batch_stats

    def step(m, _):
        agg = None
        for trs, feats, lengths in packed:
            st = stats_fn(m, trs, feats, lengths)
            agg = st if agg is None else jax.tree.map(jnp.add, agg, st)
        new = jax.vmap(lambda mm, ss: m_step(mm, ss, var_floor=var_floor))(
            m, _unstack_stats_axis(agg)
        )
        return new, (agg.log_prob, agg.num_valid)

    final, (lps, nvs) = jax.lax.scan(step, models, None, length=k)
    return final, lps, nvs


def train_embedded(
    models: GmmHmm,
    utterances: list[np.ndarray],
    transcripts: list[list[int]],
    threshold: float = 1e-3,
    max_iterations: int = 50,
    var_floor: float = 0.0,
    pad_multiple: int = 32,
    fused: bool | None = None,
    chunk: int = 8,
    mesh=None,
    mesh_axis: str = "data",
    checkpoint_dir=None,
    log_prob_offset: float = 0.0,
):
    """Embedded EM driver: buckets utterances by transcript length, then
    runs the chunked convergence driver (train/driver.py) — iterations
    execute in device-side scans of `chunk`, speculatively pipelined, with
    the exact reference convergence semantics.

    checkpoint_dir: optional directory — chunk-granular checkpoint/resume
    through the driver (train/checkpoint.CheckpointManager); a restarted
    call with the same arguments resumes from the newest complete
    checkpoint with the identical trajectory (round 5: failure recovery
    for the beyond-reference trainers, VERDICT r4 missing #2).

    fused=None auto-selects the fused composed-lattice Pallas E-step
    (batch_stats_fused) exactly like embedded_em_step — the driver rides
    the same kernels as the raw step API (round-3 fix; round 2 left the
    driver on the XLA path and paid a host sync per bucket per
    iteration).

    mesh: optional Mesh with a `mesh_axis` axis — data-parallel training
    via embedded_train_scan_sharded (round 4: the chunk scan inside one
    shard_map); buckets pad with empty utterances so every bucket batch
    divides the axis."""
    from ..io.dataset import round_up
    from .driver import chunked_convergence_train
    from .em_parity import TrainResult

    if fused is None:
        fused = _embedded_fused_default(models, utterances[0].shape[1])

    dtype = models.trans.dtype
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (u, tr) in enumerate(zip(utterances, transcripts)):
        key = (round_up(len(u), pad_multiple), len(tr))
        buckets.setdefault(key, []).append(i)

    n_dev = mesh.shape[mesh_axis] if mesh is not None else 1
    packed = []
    for (T, L), idxs in buckets.items():
        D = utterances[0].shape[1]
        nb = round_up(len(idxs), n_dev)  # empty-utterance pad rows for DP
        feats = np.zeros((nb, T, D))
        lengths = np.zeros(nb, np.int32)
        trs = np.zeros((nb, L), np.int32)
        for row, i in enumerate(idxs):
            feats[row, : len(utterances[i])] = utterances[i]
            lengths[row] = len(utterances[i])
            trs[row] = transcripts[i]
        packed.append(
            (
                jnp.asarray(trs),
                jnp.asarray(feats, dtype),
                jnp.asarray(lengths),
            )
        )

    if mesh is not None:
        run = lambda m, k: embedded_train_scan_sharded(
            m, tuple(packed), k, mesh, axis=mesh_axis, var_floor=var_floor
        )
    else:
        run = lambda m, k: _embedded_chunk(m, tuple(packed), k, var_floor, fused)
    manager = None
    if checkpoint_dir is not None:
        from .checkpoint import CheckpointManager
        from .em import _with_log_det

        manager = CheckpointManager(checkpoint_dir)
        # normalize the carry structure BEFORE the driver so checkpoints
        # deserialize against the template (the chunk scans set log_det)
        models = _with_log_det(models)
    models, iteration, history, n_valid = chunked_convergence_train(
        models, run, threshold=threshold, max_iterations=max_iterations,
        chunk=chunk, checkpoint=manager, log_prob_offset=log_prob_offset,
    )
    return TrainResult(
        model=models,
        iterations=iteration,
        mean_log_prob=history[-1] / max(n_valid, 1),
        exemplar_count=n_valid,
        log_prob_history=history,
    )
