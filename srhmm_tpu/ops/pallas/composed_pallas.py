"""Fused Pallas kernels for COMPOSED-lattice (embedded / tied) E-steps.

The embedded re-estimation E-step (train/embedded.py, train/tied.py) runs
Baum-Welch over per-utterance transcript-composed chains: L units x S
states, with per-UTTERANCE transitions and per-POSITION emission
parameters.  That breaks the isolated-word fused kernels'
(fused_em_pallas.py) central assumption — one shared (M*S, 2D) emission
GEMM and one shared transition matrix across the whole 128-lane batch.

Layout strategy (two lane axes, two kernel families):

* **Per-utterance bank kernels** (emission K_E, moments K_M): grid over
  groups of G utterances, TIME on the 128-lane axis.  The ENTIRE
  unit-state / senone parameter bank stays VMEM-resident (constant
  BlockSpec, fetched once), and each utterance's per-position GEMM
  constants are assembled IN-KERNEL by dynamic VMEM block copies driven
  by scalar-prefetched transcript ids (PrefetchScalarGridSpec).  The
  round-3 design instead materialized a per-utterance (B, M*L*S, 2D)
  `a_pos` gather in HBM — XLA lowered it as per-element dynamic gathers
  costing ~9.4 ms (half the config-4 E-step) and 3 extra HBM passes over
  a ~150x-inflated copy of a 0.4 MB bank (PERF.md round-3 roofline).
  The per-mixture log-likelihood GEMM is one (pc*R, C) x (C, T) MXU
  contraction per 8-position chunk; the (B, T, L, S, M) per-mixture
  tensors the XLA path materializes (1.2 GB at the config-4 shape) live
  only as chunked VMEM temporaries.  Mixture rows are padded to Mp
  (multiple of 8) so every assembled block copy, reshape, and
  mixture-axis reduction is sublane-tile aligned.
* **Per-lane lattice kernels** (forward K_F, backward+stats K_B): grid
  over time blocks, BATCH on the lane axis — the fused_em_pallas.py
  recursion structure — but with per-LANE banded transition diagonals
  (nbands, LS, B) instead of a shared (S, S) matrix, because every
  utterance composes a different chain.  xi is accumulated per diagonal
  ((nbands, LS, B) running sums) instead of the shared-transition U/V
  MXU factorization.

Covariance support: diagonal banks pack [mu*k | -k/2 | bias+logw] rows
against the lift [x; x^2; 1]; FULL covariance (the reference's canonical
T1 regime, T1:1834-1887) rides the same kernels through the Cholesky
z-GEMM of fused_em_pallas.pack_lane_constants — bank rows are d-major
[row d of L^T | -(L^T mu)_d] against the lift [x; 1], the quadratic form
is an all-positive sum of squares (no cancellation), and the 1e20
density clamp (calc_gaus T1:1880-1883) lands between density and weight.

The composed chain of upper-triangular (left-right) unit transitions is
banded with band <= S-1: within-unit arcs sit on diagonals 0..S-1 of the
flattened (L*S, L*S) matrix, and the unit-k.exit -> unit-(k+1).entry
chain arc (which carries the exit self-loop mass, train/embedded.py
`_composed_log_trans`, mirroring decode/continuous.compose_sequence) is
flattened distance exactly 1.  Lower-triangular unit transitions are NOT
representable — callers must keep the XLA path for non-left-right units
(the reference's banded uniform initializer T1:772-791 is always
left-right).

All recursions are log-domain with NEG_INF clamps (see
fused_em_pallas.py for why the reference's scaled-linear f32 scheme loses
probability mass at real scale).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_em_pallas import (
    LOG_GAUS_CLAMP as _LOG_GAUS_CLAMP,
    NEG_INF,
    _TINY,
    _bwd_update,
    _fwd_update,
    _lift,
    _shift_up,
)

# ---------------------------------------------------------------------------
# K_E: per-utterance VMEM-resident-bank emission (lane axis = time)
# ---------------------------------------------------------------------------

_POS_CHUNK = 8  # positions per assembled-GEMM chunk (sublane-aligned writes)


def _pos_chunks(LS: int):
    """Static (start, size) chunks of the LS position axis, size 8 except a
    final remainder — starts stay multiples of 8 so every out write and
    assembled-scratch slice is sublane-tile aligned."""
    return [
        (c0, min(_POS_CHUNK, LS - c0)) for c0 in range(0, LS, _POS_CHUNK)
    ]


def _emit_lift(x, full: bool):
    """Emission GEMM rhs for one utterance: [x; 1] (full-cov z-GEMM) or
    [x; x^2; 1] (diag; the trailing ones row multiplies the bias column and
    doubles as the count column of the moment GEMM)."""
    T = x.shape[1]
    ones = jnp.ones((1, T), jnp.float32)
    if full:
        return jnp.concatenate([x, ones], axis=0)  # (D+1, T)
    return jnp.concatenate([x, x * x, ones], axis=0)  # (2D+1, T)


def _assemble_chunk(ids_ref, bank_ref, bias2_ref, a_scr, b_scr, b_idx, c0, pcn, full):
    """Copy the pcn bank entries for positions [c0, c0+pcn) of utterance
    b_idx into the assembled scratch (VMEM block copies at dynamic leading
    indices; aligned because R = bank_ref.shape[1] is a multiple of 8).

    Every index constant is an explicit jnp.int32 — under jax_enable_x64
    bare Python ints lower as i64 and Mosaic rejects the mixed-width
    address arithmetic (the PERF.md kernel-constant rule).  The copy loop
    is STATICALLY unrolled: a fori_loop pays per-iteration control
    overhead that dominates the ~16 KB copies (hardware-measured)."""
    R = bank_ref.shape[1]
    for j in range(pcn):  # static unroll — only the bank row id is dynamic
        i = ids_ref[b_idx, jnp.int32(c0 + j)]
        a_scr[j * R : (j + 1) * R, :] = bank_ref[i]
        if full:
            b_scr[j : j + 1] = bias2_ref[i][None]


def _chunk_q(a_scr, b_scr, lift, Mp, D, pcn, full):
    """Per-mixture weighted log-likelihoods q3 (pcn, Mp, T) for one
    assembled chunk.  diag: one (pcn*Mp, 2D+1) x (2D+1, T) GEMM (bias and
    log-weight pre-folded into the last bank column).  full: the Cholesky
    z-GEMM — z (pcn*D*Mp, T), all-positive sum of squares over the D
    d-major sublane groups, then the reference's 1e20 density clamp
    BETWEEN density and mixture weight (calc_gaus T1:1880-1883)."""
    R = (D * Mp) if full else Mp
    q2 = jnp.dot(
        a_scr[0 : pcn * R, :], lift, preferred_element_type=jnp.float32
    )  # (pcn*R, T)
    T = lift.shape[1]
    if full:
        z4 = q2.reshape(pcn, D, Mp, T)
        quad = jnp.sum(z4 * z4, axis=1)  # (pcn, Mp, T)
        b3 = b_scr[0:pcn]  # (pcn, Mp, 2)
        q3 = jnp.float32(-0.5) * quad + b3[:, :, 0:1]
        q3 = jnp.minimum(q3, jnp.float32(_LOG_GAUS_CLAMP)) + b3[:, :, 1:2]
    else:
        q3 = q2.reshape(pcn, Mp, T)
    return q3


def _chunk_lse(q3, pcn, T, neg, tiny):
    """Per-position mixture logsumexp of a (pcn, Mp, T) chunk -> (pcn, T)."""
    m1 = jnp.maximum(jnp.max(q3, axis=1, keepdims=True), neg)
    e1 = jnp.sum(jnp.exp(q3 - m1), axis=1, keepdims=True)
    return (jnp.log(jnp.maximum(e1, tiny)) + m1).reshape(pcn, T)


def _bank_emit_kernel(
    LS, LSp, Mps, Ds, full,
    ids_ref, *refs,
):
    """Emission for a G-utterance block: in-kernel bank assembly + chunked
    GEMMs, one or more parameter STREAMS (the reference's
    product-of-streams emission, T1:1437-1441 — per-stream logsumexps sum
    into one log_b) — and the LATTICE-LAYOUT TRANSPOSE fused into the
    epilogue: per-utterance rows accumulate in a (G, LSp, T) VMEM scratch
    and one 3D transpose writes the (T, LSp, G) block the forward/backward
    kernels consume, so the XLA (B, LS, T) -> (T, LS, B) transpose (an
    extra full HBM round-trip) no longer exists.  refs: per-stream bank,
    bias2, feats(G, D_p, T); then out_ref (T, LSp, G); then lb_all scratch
    (G, LSp, T) and per-stream scratches a_scr, b_scr."""
    P = len(Mps)
    bank_refs = refs[0:P]
    bias2_refs = refs[P : 2 * P]
    f_refs = refs[2 * P : 3 * P]
    out_ref = refs[3 * P]
    lb_all = refs[3 * P + 1]
    a_scrs = refs[3 * P + 2 : 3 * P + 2 + P]
    b_scrs = refs[3 * P + 2 + P :]
    G = f_refs[0].shape[0]
    T = f_refs[0].shape[2]
    b0 = pl.program_id(0) * jnp.int32(G)
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    if LSp > LS:  # padded lattice rows must read NEG_INF
        lb_all[:, LS:LSp, :] = jnp.full((G, LSp - LS, T), neg, jnp.float32)

    def per_g(g, _):
        lifts = [_emit_lift(f_refs[p][g], full) for p in range(P)]
        for c0, pcn in _pos_chunks(LS):
            lb = None
            for p in range(P):
                _assemble_chunk(
                    ids_ref, bank_refs[p], bias2_refs[p], a_scrs[p],
                    b_scrs[p], b0 + g, c0, pcn, full,
                )
                q3 = _chunk_q(
                    a_scrs[p], b_scrs[p], lifts[p], Mps[p], Ds[p], pcn, full
                )
                lb_p = _chunk_lse(q3, pcn, T, neg, tiny)
                lb = lb_p if lb is None else lb + lb_p
            lb_all[g, c0 : c0 + pcn, :] = jnp.maximum(lb, neg)
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), per_g, jnp.int32(0))
    out_ref[:] = jnp.transpose(lb_all[:], (2, 1, 0))


def _norm_streams(bank, bias2, feats_bdt, n_mix_p):
    """Normalize single-stream args to per-stream tuples."""
    banks = bank if isinstance(bank, tuple) else (bank,)
    P = len(banks)
    bias2s = bias2 if isinstance(bias2, tuple) else (bias2,) * P
    featss = feats_bdt if isinstance(feats_bdt, tuple) else (feats_bdt,)
    mps = n_mix_p if isinstance(n_mix_p, tuple) else (n_mix_p,)
    bias2s = tuple(
        jnp.zeros((1, 8, 2), jnp.float32) if b is None else b for b in bias2s
    )
    return banks, bias2s, featss, mps


@partial(jax.jit, static_argnames=("n_mix_p", "ls_pad", "full", "group", "interpret"))
def bank_emission_pallas(
    ids: jax.Array,
    bank,
    bias2,
    feats_bdt,
    n_mix_p,
    ls_pad: int | None = None,
    full: bool = False,
    group: int = 128,
    interpret: bool | None = None,
):
    """VMEM-resident-bank emission in LATTICE layout: log_b (T, LSp, B) —
    ready for the forward/backward kernels, the transpose fused into the
    kernel epilogue (rows past LS are NEG_INF filler).

    ids (B, LS) int32 flat position -> bank row (scalar-prefetched);
    bank: diag (NB, Mp, 2D+1) rows [mu*k | -k/2 | bias+logw], full
    (NB, D*Mp, D+1) d-major Cholesky rows [row d of L^T | -(L^T mu)_d];
    bias2 (full only): (NB, Mp, 2) [bias, logw] — kept separate so the
    1e20 clamp lands between density and weight; feats_bdt (B, D, T).
    Mp = n_mix_p must be a multiple of 8 (pad mixtures with
    bias = NEG_INF rows); B a multiple of `group` (128 so the fused
    transpose feeds full lane tiles); T a multiple of 128.

    MULTI-STREAM (the reference's product-of-streams emission,
    T1:1437-1441): pass tuples for bank / bias2 / feats_bdt / n_mix_p —
    one entry per stream, homogeneous cov type, shared ids; the output
    is the summed per-stream mixture logsumexp.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    banks, bias2s, featss, mps = _norm_streams(bank, bias2, feats_bdt, n_mix_p)
    P = len(banks)
    B, LS = ids.shape
    LSp = ls_pad if ls_pad is not None else -(-LS // 8) * 8
    T = featss[0].shape[2]
    ds = tuple(f.shape[1] for f in featss)
    rs = [(d * m if full else m) for d, m in zip(ds, mps)]
    cs = [((d + 1) if full else (2 * d + 1)) for d in ds]
    for p in range(P):
        assert banks[p].shape[1:] == (rs[p], cs[p]), (p, banks[p].shape)
        assert mps[p] % 8 == 0
    assert B % group == 0 and LSp >= LS
    G = group
    fix3 = lambda b, ids: (0 * b,) * 3
    blk3 = lambda b, ids: (b, 0 * b, 0 * b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=(
            [pl.BlockSpec(bk.shape, fix3, memory_space=pltpu.VMEM) for bk in banks]
            + [pl.BlockSpec(b2.shape, fix3, memory_space=pltpu.VMEM) for b2 in bias2s]
            + [
                pl.BlockSpec((G, d, T), blk3, memory_space=pltpu.VMEM)
                for d in ds
            ]
        ),
        out_specs=pl.BlockSpec(
            (T, LSp, G), lambda b, ids: (0 * b, 0 * b, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((G, LSp, T), jnp.float32)]
            + [pltpu.VMEM((_POS_CHUNK * r, c), jnp.float32) for r, c in zip(rs, cs)]
            + [pltpu.VMEM((_POS_CHUNK, m, 2), jnp.float32) for m in mps]
        ),
    )
    return pl.pallas_call(
        partial(_bank_emit_kernel, LS, LSp, mps, ds, full),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, LSp, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        ids.astype(jnp.int32),
        *[bk.astype(jnp.float32) for bk in banks],
        *[b2.astype(jnp.float32) for b2 in bias2s],
        *[f.astype(jnp.float32) for f in featss],
    )


# ---------------------------------------------------------------------------
# K_F: per-lane banded composed forward (lane axis = batch)
# ---------------------------------------------------------------------------


def _lat_fwd_kernel(k_block, band, lb_ref, diag_ref, len_ref, la_ref, la_carry_ref):
    """One ascending time block of the composed log-domain forward.

    lb_ref (k_block, LS, B); diag_ref (band+1, LS, B) per-LANE diagonal
    columns (diag[d][j, b] = log composed-trans_b[j-d, j]); len_ref (1, B).
    Output la_ref (k_block, LS, B); scratch la_carry_ref (LS, B).
    Rows at t >= length repeat the last valid row (carry freeze)."""
    tb = pl.program_id(0)
    LS, B = la_carry_ref.shape
    lens = len_ref[:]
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    diag_cols = [diag_ref[d] for d in range(band + 1)]

    for k in range(k_block):
        log_b = lb_ref[k]

        def first():
            start = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (LS, B), 0) == 0,
                jnp.float32(0.0),
                neg,
            )
            return jnp.maximum(start + log_b, neg)

        def rest():
            upd = _fwd_update(la_carry_ref[:], None, diag_cols, band, neg, tiny)
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


@partial(jax.jit, static_argnames=("k_block", "band", "interpret"))
def composed_forward_pallas(
    log_b_tsb: jax.Array,
    diag_col: jax.Array,
    lengths: jax.Array,
    k_block: int = 16,
    band: int = 2,
    interpret: bool | None = None,
):
    """log_b (T, LS, B) + per-lane diagonal columns (band+1, LS, B) ->
    log-alpha (T, LS, B).  T % k_block == 0; LS should be a multiple of 8
    (pad with NEG_INF rows) and B a multiple of 128."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, LS, B = log_b_tsb.shape
    assert T % k_block == 0 and diag_col.shape == (band + 1, LS, B)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    blk = lambda t: (t, 0 * t, 0 * t)
    fix3 = lambda t: (0 * t, 0 * t, 0 * t)
    return pl.pallas_call(
        partial(_lat_fwd_kernel, k_block, band),
        grid=(T // k_block,),
        in_specs=[
            pl.BlockSpec((k_block, LS, B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((band + 1, LS, B), fix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (0 * t, 0 * t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_block, LS, B), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, LS, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((LS, B), jnp.float32)],
        interpret=interpret,
    )(log_b_tsb, diag_col, lens)


# ---------------------------------------------------------------------------
# K_B: per-lane banded backward + lattice statistics (lane axis = batch)
# ---------------------------------------------------------------------------


def _lat_bwd_kernel(
    k_block, band, final,
    lb_ref, la_ref, diag_ref, len_ref, z_ref, vm_ref,
    gamma_ref, xi_ref, dt_ref, dm_ref,
    lbw_ref, lbb_ref,
):
    """One DESCENDING time block: composed log-domain backward, writing
    gamma (occupancies) and accumulating per-diagonal xi sums.

    diag_ref (band+1, LS, B) per-LANE diagonal ROWS (diag[d][i, b] =
    log composed-trans_b[i, i+d]).  Outputs: gamma_ref (k_block, LS, B);
    xi_ref (band+1, LS, B) = sum_t xi_t(i, i+d); dt_ref / dm_ref (LS, B)
    transition / mixture occupancy denominators.  Scratches as in
    fused_em_pallas._bwd_stats_kernel (lbw carry + saved log_b[t+1] row).
    """
    tb = pl.program_id(0)
    nb = pl.num_programs(0)
    LS, B = lbw_ref.shape
    lens = len_ref[:]
    z = z_ref[:]
    vmask = vm_ref[:]
    t_lo = (nb - 1 - tb) * k_block
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    zero = jnp.float32(0.0)
    diag_rows = [diag_ref[d] for d in range(band + 1)]

    # `final` is the UNPADDED final-state row — rows past it are -inf filler
    lbw_init = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (LS, B), 0) == final, zero, neg
    )

    acc_xi = [jnp.zeros((LS, B), jnp.float32) for _ in range(band + 1)]
    acc_dt = jnp.zeros((LS, B), jnp.float32)
    acc_dm = jnp.zeros((LS, B), jnp.float32)

    for k in range(k_block - 1, -1, -1):
        t = t_lo + k
        tf = jnp.float32(1.0) * t
        la_t = la_ref[k]
        if k == k_block - 1:
            lbn = lbb_ref[:]  # garbage on first grid step; every use masked
        else:
            lbn = lb_ref[k + 1]
        lbw_next = lbw_ref[:]

        m_xi = ((lens - jnp.float32(1.0)) > tf) & (vmask > zero)  # (1, B)
        inner = jnp.maximum(lbn + lbw_next, neg)  # (LS, B)
        # xi_t(i, i+d) = exp(la[t,i] + lt[i,i+d] + log_b[t+1,i+d]
        #                    + log_beta[t+1,i+d] - z) — mathematically <= 1,
        # so the min(., 0) clamp only guards masked-lane garbage.
        for d in range(band + 1):
            xi_t = jnp.exp(
                jnp.minimum(la_t + diag_rows[d] + _shift_up(inner, d, neg) - z, zero)
            )
            acc_xi[d] = acc_xi[d] + jnp.where(m_xi, xi_t, zero)

        upd = _bwd_update(inner, None, diag_rows, band, neg, tiny)
        active = (lens - jnp.float32(1.0)) > tf
        lbw_ref[:] = jnp.where(active, upd, lbw_init)

        m_g = (lens > tf) & (vmask > zero)
        gamma = jnp.exp(jnp.minimum(la_t + lbw_ref[:] - z, zero))
        gamma = jnp.where(m_g, gamma, zero)
        gamma_ref[k] = gamma
        acc_dm = acc_dm + gamma
        acc_dt = acc_dt + jnp.where(m_xi, gamma, zero)

    lbb_ref[:] = lb_ref[0]

    first = tb == 0

    @pl.when(first)
    def _():
        for d in range(band + 1):
            xi_ref[d] = acc_xi[d]
        dt_ref[:] = acc_dt
        dm_ref[:] = acc_dm

    @pl.when(jnp.logical_not(first))
    def _():
        for d in range(band + 1):
            xi_ref[d] += acc_xi[d]
        dt_ref[:] += acc_dt
        dm_ref[:] += acc_dm


@partial(jax.jit, static_argnames=("final", "k_block", "band", "interpret"))
def composed_backward_stats_pallas(
    log_b_tsb: jax.Array,
    log_alpha: jax.Array,
    diag_row: jax.Array,
    lengths: jax.Array,
    safe_z: jax.Array,
    vmask: jax.Array,
    final: int | None = None,
    k_block: int = 16,
    band: int = 2,
    interpret: bool | None = None,
):
    """Fused composed backward + statistics.

    Returns (gamma (T, LS, B), xi_diag (band+1, LS, B), den_trans (LS, B),
    den_mix (LS, B)).  diag_row[d][i, b] = log composed-trans_b[i, i+d].
    final: UNPADDED final-state row index (default LS - 1) — the backward
    initialization row; padded filler rows must lie after it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, LS, B = log_b_tsb.shape
    if final is None:
        final = LS - 1
    assert T % k_block == 0 and diag_row.shape == (band + 1, LS, B)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    zr = safe_z.astype(jnp.float32).reshape(1, B)
    vm = vmask.astype(jnp.float32).reshape(1, B)
    nb = T // k_block
    rev = lambda t: (nb - 1 - t, 0 * t, 0 * t)
    fix2 = lambda t: (0 * t, 0 * t)
    fix3 = lambda t: (0 * t, 0 * t, 0 * t)
    return pl.pallas_call(
        partial(_lat_bwd_kernel, k_block, band, final),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k_block, LS, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, LS, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((band + 1, LS, B), fix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), fix2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_block, LS, B), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((band + 1, LS, B), fix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((LS, B), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((LS, B), fix2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, LS, B), jnp.float32),
            jax.ShapeDtypeStruct((band + 1, LS, B), jnp.float32),
            jax.ShapeDtypeStruct((LS, B), jnp.float32),
            jax.ShapeDtypeStruct((LS, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LS, B), jnp.float32),
            pltpu.VMEM((LS, B), jnp.float32),
        ],
        interpret=interpret,
    )(log_b_tsb, log_alpha, diag_row, lens, zr, vm)


# ---------------------------------------------------------------------------
# K_M: per-utterance VMEM-resident-bank GMM moments (lane axis = time)
# ---------------------------------------------------------------------------


def _bank_mom_kernel(
    LS, Mps, Ds, full,
    ids_ref, *refs,
):
    """Gamma-weighted mixture moments with in-kernel bank assembly AND
    in-kernel scatter into BANK-ROW space, one or more streams.

    refs: per-stream bank, bias2, feats(G, D_p, T); then gam_ref
    (G, LS, T) — the backward kernel's occupancies (already masked to
    valid frames); then per-stream mom_ref (NB, Mp_p, Cm_p) accumulators,
    rows of [sum gm*x | sum gm*x^2 (diag) / sum gm*vec(x x^T) (full) |
    sum gm]; then per-stream scratches.  Bank-row granularity IS the
    statistics' scatter target (unit-state rows for embedded, senones for
    tied), so the accumulation happens here: TPU grid steps execute
    sequentially, making the dynamic-index read-modify-writes race-free,
    and the (B, LS, Mp, Cm) per-utterance moment tensor (63 MB at config
    4: one HBM write + one scatter-add read on the XLA side) never
    exists.  The emission GEMMs AND each stream's mixture logsumexp are
    recomputed in VMEM (the normalizer needs no stored log_b — round 4
    dropped that input entirely, saving its HBM read): storing
    per-mixture posteriors would cost a (B, T, LS, M) HBM round-trip
    (~1.2 GB at the config-4 shape, a measured ~12x loss vs recompute,
    PERF.md)."""
    P = len(Mps)
    bank_refs = refs[0:P]
    bias2_refs = refs[P : 2 * P]
    f_refs = refs[2 * P : 3 * P]
    gam_ref = refs[3 * P]
    mom_refs = refs[3 * P + 1 : 4 * P + 1]
    a_scrs = refs[4 * P + 1 : 5 * P + 1]
    b_scrs = refs[5 * P + 1 :]
    G = f_refs[0].shape[0]
    T = f_refs[0].shape[2]
    b0 = pl.program_id(0) * jnp.int32(G)
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    neg_half = jnp.float32(NEG_INF / 2)
    zero = jnp.float32(0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for p in range(P):
            mom_refs[p][:] = jnp.zeros_like(mom_refs[p])

    for g in range(G):
        lifts = [_emit_lift(f_refs[p][g], full) for p in range(P)]
        if full:
            lift_moms = [
                jnp.concatenate(
                    [_lift(f_refs[p][g], True), jnp.ones((1, T), jnp.float32)],
                    axis=0,
                )
                for p in range(P)
            ]  # (D+D^2+1, T) each
        else:
            lift_moms = lifts  # (2D+1, T): same rhs, count from the ones row
        for c0, pcn in _pos_chunks(LS):
            b_idx = b0 + jnp.int32(g)
            gm1 = gam_ref[g, c0 : c0 + pcn, :].reshape(pcn, 1, T)
            for p in range(P):
                Mp, Cm = Mps[p], mom_refs[p].shape[-1]
                _assemble_chunk(
                    ids_ref, bank_refs[p], bias2_refs[p], a_scrs[p],
                    b_scrs[p], b_idx, c0, pcn, full,
                )
                q3 = _chunk_q(
                    a_scrs[p], b_scrs[p], lifts[p], Mp, Ds[p], pcn, full
                )
                m1 = jnp.maximum(jnp.max(q3, axis=1, keepdims=True), neg)
                e1 = jnp.sum(jnp.exp(q3 - m1), axis=1, keepdims=True)
                lb1 = jnp.log(jnp.maximum(e1, tiny)) + m1
                post = jnp.exp(jnp.minimum(q3 - lb1, zero))
                post = jnp.where(lb1 > neg_half, post, zero)
                gm2 = (post * gm1).reshape(pcn * Mp, T)
                mom2 = jax.lax.dot_general(
                    gm2, lift_moms[p], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (pcn*Mp, Cm)
                mom3 = mom2.reshape(pcn, Mp, Cm)
                for j in range(pcn):  # sequential RMW: repeats accumulate
                    i = ids_ref[b_idx, jnp.int32(c0 + j)]
                    mom_refs[p][i] += mom3[j]


def _bank_mom_tsb_kernel(
    LS, Mps, Ds, full,
    ids_ref, *refs,
):
    """_bank_mom_kernel consuming gamma in the LATTICE layout (T, LSp, G)
    — the layout K_B writes — with the per-utterance transpose done ONCE
    per grid step in VMEM (round 5): the XLA (T, LS, B) -> (B, LS, T)
    gamma transpose (a full HBM round-trip, ~2.4 ms at config 4 on the
    round-4 session) no longer exists.  The utterance group G is 128 so
    the gamma block reads full lane tiles, and the per-utterance loop is
    a fori_loop (static unrolling at G=128 would explode the op count;
    the per-g body is GEMM-heavy so loop overhead is noise here, unlike
    the 16 KB bank copies where unrolling was measured necessary)."""
    P = len(Mps)
    bank_refs = refs[0:P]
    bias2_refs = refs[P : 2 * P]
    f_refs = refs[2 * P : 3 * P]
    gam_ref = refs[3 * P]
    mom_refs = refs[3 * P + 1 : 4 * P + 1]
    gam_scr = refs[4 * P + 1]
    a_scrs = refs[4 * P + 2 : 5 * P + 2]
    b_scrs = refs[5 * P + 2 :]
    G = f_refs[0].shape[0]
    T = f_refs[0].shape[2]
    b0 = pl.program_id(0) * jnp.int32(G)
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    neg_half = jnp.float32(NEG_INF / 2)
    zero = jnp.float32(0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for p in range(P):
            mom_refs[p][:] = jnp.zeros_like(mom_refs[p])

    gam_scr[:] = jnp.transpose(gam_ref[:], (2, 1, 0))  # (G, LSp, T)

    def per_g(g, _):
        lifts = [_emit_lift(f_refs[p][g], full) for p in range(P)]
        if full:
            lift_moms = [
                jnp.concatenate(
                    [_lift(f_refs[p][g], True), jnp.ones((1, T), jnp.float32)],
                    axis=0,
                )
                for p in range(P)
            ]
        else:
            lift_moms = lifts
        b_idx = b0 + g
        for c0, pcn in _pos_chunks(LS):
            gm1 = gam_scr[g, c0 : c0 + pcn, :].reshape(pcn, 1, T)
            for p in range(P):
                Mp, Cm = Mps[p], mom_refs[p].shape[-1]
                _assemble_chunk(
                    ids_ref, bank_refs[p], bias2_refs[p], a_scrs[p],
                    b_scrs[p], b_idx, c0, pcn, full,
                )
                q3 = _chunk_q(
                    a_scrs[p], b_scrs[p], lifts[p], Mp, Ds[p], pcn, full
                )
                m1 = jnp.maximum(jnp.max(q3, axis=1, keepdims=True), neg)
                e1 = jnp.sum(jnp.exp(q3 - m1), axis=1, keepdims=True)
                lb1 = jnp.log(jnp.maximum(e1, tiny)) + m1
                post = jnp.exp(jnp.minimum(q3 - lb1, zero))
                post = jnp.where(lb1 > neg_half, post, zero)
                gm2 = (post * gm1).reshape(pcn * Mp, T)
                mom2 = jax.lax.dot_general(
                    gm2, lift_moms[p], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                mom3 = mom2.reshape(pcn, Mp, Cm)
                for j in range(pcn):  # sequential RMW: repeats accumulate
                    i = ids_ref[b_idx, jnp.int32(c0 + j)]
                    mom_refs[p][i] += mom3[j]
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), per_g, jnp.int32(0))


@partial(jax.jit, static_argnames=("n_mix_p", "full", "group", "interpret"))
def bank_moments_lattice_pallas(
    ids: jax.Array,
    bank,
    bias2,
    feats_bdt,
    gamma_tsb: jax.Array,
    n_mix_p,
    full: bool = False,
    group: int = 128,
    interpret: bool | None = None,
):
    """bank_moments_pallas consuming gamma in K_B's (T, LSp, B) lattice
    layout directly — no XLA transpose, no extra HBM traffic (round 5).
    gamma rows past LS are ignored (NEG_INF-filler positions are never
    addressed by the position chunks).  B must be a multiple of `group`
    (default 128: full-lane gamma block reads)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    multi = isinstance(bank, tuple)
    banks, bias2s, featss, mps = _norm_streams(bank, bias2, feats_bdt, n_mix_p)
    P = len(banks)
    B, LS = ids.shape
    T = featss[0].shape[2]
    LSp = gamma_tsb.shape[1]
    ds = tuple(f.shape[1] for f in featss)
    rs = [(d * m if full else m) for d, m in zip(ds, mps)]
    cs = [((d + 1) if full else (2 * d + 1)) for d in ds]
    cms = [((d + d * d + 1) if full else (2 * d + 1)) for d in ds]
    nbs = [bk.shape[0] for bk in banks]
    for p in range(P):
        assert banks[p].shape[1:] == (rs[p], cs[p]) and mps[p] % 8 == 0
    assert B % group == 0 and LSp >= LS
    assert gamma_tsb.shape == (T, LSp, B)
    G = group
    blk3 = lambda b, ids: (b, 0 * b, 0 * b)
    fix3 = lambda b, ids: (0 * b,) * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=(
            [pl.BlockSpec(bk.shape, fix3, memory_space=pltpu.VMEM) for bk in banks]
            + [pl.BlockSpec(b2.shape, fix3, memory_space=pltpu.VMEM) for b2 in bias2s]
            + [
                pl.BlockSpec((G, d, T), blk3, memory_space=pltpu.VMEM)
                for d in ds
            ]
            + [
                pl.BlockSpec(
                    (T, LSp, G), lambda b, ids: (0 * b, 0 * b, b),
                    memory_space=pltpu.VMEM,
                )
            ]
        ),
        out_specs=[
            pl.BlockSpec((nbs[p], mps[p], cms[p]), fix3, memory_space=pltpu.VMEM)
            for p in range(P)
        ],
        scratch_shapes=(
            [pltpu.VMEM((G, LSp, T), jnp.float32)]
            + [pltpu.VMEM((_POS_CHUNK * r, c), jnp.float32) for r, c in zip(rs, cs)]
            + [pltpu.VMEM((_POS_CHUNK, m, 2), jnp.float32) for m in mps]
        ),
    )
    out = pl.pallas_call(
        partial(_bank_mom_tsb_kernel, LS, mps, ds, full),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbs[p], mps[p], cms[p]), jnp.float32)
            for p in range(P)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        ids.astype(jnp.int32),
        *[bk.astype(jnp.float32) for bk in banks],
        *[b2.astype(jnp.float32) for b2 in bias2s],
        *[f.astype(jnp.float32) for f in featss],
        gamma_tsb,
    )
    return tuple(out) if multi else out[0]


@partial(jax.jit, static_argnames=("n_mix_p", "full", "group", "interpret"))
def bank_moments_pallas(
    ids: jax.Array,
    bank,
    bias2,
    feats_bdt,
    gamma_bst: jax.Array,
    n_mix_p,
    full: bool = False,
    group: int = 8,
    interpret: bool | None = None,
):
    """BANK-ROW-space moment statistics (NB, Mp, Cm) — already
    scatter-accumulated over every utterance and position in-kernel,
    Cm = 2D+1 (diag) or D+D^2+1 (full).  Inputs as bank_emission_pallas
    plus the backward kernel's gamma (B, LS, T); each stream's posterior
    normalizer (mixture logsumexp) is recomputed in VMEM, so no log_b
    input exists.  MULTI-STREAM: pass tuples (bank_emission_pallas
    contract); returns a tuple of per-stream moment accumulators."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    multi = isinstance(bank, tuple)
    banks, bias2s, featss, mps = _norm_streams(bank, bias2, feats_bdt, n_mix_p)
    P = len(banks)
    B, LS = ids.shape
    T = featss[0].shape[2]
    ds = tuple(f.shape[1] for f in featss)
    rs = [(d * m if full else m) for d, m in zip(ds, mps)]
    cs = [((d + 1) if full else (2 * d + 1)) for d in ds]
    cms = [((d + d * d + 1) if full else (2 * d + 1)) for d in ds]
    nbs = [bk.shape[0] for bk in banks]
    for p in range(P):
        assert banks[p].shape[1:] == (rs[p], cs[p]) and mps[p] % 8 == 0
    assert B % group == 0
    assert gamma_bst.shape == (B, LS, T)
    G = group
    blk3 = lambda b, ids: (b, 0 * b, 0 * b)
    fix3 = lambda b, ids: (0 * b,) * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=(
            [pl.BlockSpec(bk.shape, fix3, memory_space=pltpu.VMEM) for bk in banks]
            + [pl.BlockSpec(b2.shape, fix3, memory_space=pltpu.VMEM) for b2 in bias2s]
            + [
                pl.BlockSpec((G, d, T), blk3, memory_space=pltpu.VMEM)
                for d in ds
            ]
            + [pl.BlockSpec((G, LS, T), blk3, memory_space=pltpu.VMEM)]
        ),
        # constant index maps: the accumulators stay VMEM-resident across
        # the whole grid and are flushed to HBM once
        out_specs=[
            pl.BlockSpec((nbs[p], mps[p], cms[p]), fix3, memory_space=pltpu.VMEM)
            for p in range(P)
        ],
        scratch_shapes=(
            [pltpu.VMEM((_POS_CHUNK * r, c), jnp.float32) for r, c in zip(rs, cs)]
            + [pltpu.VMEM((_POS_CHUNK, m, 2), jnp.float32) for m in mps]
        ),
    )
    out = pl.pallas_call(
        partial(_bank_mom_kernel, LS, mps, ds, full),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbs[p], mps[p], cms[p]), jnp.float32)
            for p in range(P)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        ids.astype(jnp.int32),
        *[bk.astype(jnp.float32) for bk in banks],
        *[b2.astype(jnp.float32) for b2 in bias2s],
        *[f.astype(jnp.float32) for f in featss],
        gamma_bst,
    )
    return tuple(out) if multi else out[0]
