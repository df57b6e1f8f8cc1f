"""Fused Pallas kernels for COMPOSED-lattice (embedded / tied) E-steps.

The embedded re-estimation E-step (train/embedded.py, train/tied.py) runs
Baum-Welch over per-utterance transcript-composed chains: L units x S
states, with per-UTTERANCE transitions and per-POSITION emission
parameters.  That breaks the isolated-word fused kernels'
(fused_em_pallas.py) central assumption — one shared (M*S, 2D) emission
GEMM and one shared transition matrix across the whole 128-lane batch.

Layout strategy (two lane axes, two kernel families):

* **Per-utterance kernels** (emission K_E, moments K_M): grid over groups
  of G utterances, TIME on the 128-lane axis.  Each utterance has its own
  (N, 2D) position-bank GEMM constants (N = M * L * S, m-major), so the
  per-mixture log-likelihood GEMM is (N, 2D) x (2D, T) per utterance —
  a real MXU contraction; per-lane gathers never happen on device.  The
  (B, T, L, S, M) per-mixture tensors the XLA path materializes (1.2 GB
  at the config-4 shape) live only as one (N, T) VMEM temporary.
* **Per-lane lattice kernels** (forward K_F, backward+stats K_B): grid
  over time blocks, BATCH on the lane axis — the fused_em_pallas.py
  recursion structure — but with per-LANE banded transition diagonals
  (nbands, LS, B) instead of a shared (S, S) matrix, because every
  utterance composes a different chain.  xi is accumulated per diagonal
  ((nbands, LS, B) running sums) instead of the shared-transition U/V
  MXU factorization.

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
    NEG_INF,
    _TINY,
    _bwd_update,
    _fwd_update,
    _log_b_from_q,
    _shift_up,
)

# ---------------------------------------------------------------------------
# K_E: per-utterance position-bank emission (lane axis = time)
# ---------------------------------------------------------------------------


def _pos_emit_kernel(n_mix, a_ref, bias_ref, f_ref, out_ref):
    """a_ref (G, N, 2D) m-major position-bank constants; f_ref (G, D, T);
    out_ref (G, LS, T) per-position per-state mixture-logsumexp log_b."""
    G, LS, _ = out_ref.shape
    for g in range(G):  # static unroll; VMEM temporaries are reused
        x = f_ref[g]  # (D, T)
        lift = jnp.concatenate([x, x * x], axis=0)  # (2D, T)
        q = (
            jnp.dot(a_ref[g], lift, preferred_element_type=jnp.float32)
            + bias_ref[g]
        )  # (N, T)
        out_ref[g] = _log_b_from_q(q, LS, n_mix)


@partial(jax.jit, static_argnames=("n_mix", "group", "interpret"))
def pos_emission_pallas(
    a_pos: jax.Array,
    bias_pos: jax.Array,
    feats_bdt: jax.Array,
    n_mix: int,
    group: int = 8,
    interpret: bool | None = None,
):
    """(B, N, 2D) position-bank constants + (B, D, T) features ->
    log_b (B, LS, T).  N = n_mix * LS, m-major rows (row m*LS + p is
    mixture m of flat position p).  T must be a multiple of 128 (lane
    tiles); B a multiple of `group`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, twoD = a_pos.shape
    _, D, T = feats_bdt.shape
    assert twoD == 2 * D and N % n_mix == 0 and B % group == 0, (
        a_pos.shape, feats_bdt.shape, n_mix, group)
    LS = N // n_mix
    G = group
    return pl.pallas_call(
        partial(_pos_emit_kernel, n_mix),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, twoD), lambda b: (b, 0 * b, 0 * b), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, 1), lambda b: (b, 0 * b, 0 * b), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, D, T), lambda b: (b, 0 * b, 0 * b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, LS, T), lambda b: (b, 0 * b, 0 * b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, LS, T), jnp.float32),
        # the statically-unrolled G-loop gets a distinct (N, T) q temporary
        # per iteration on the Mosaic stack; lift the default 16 MB scoped
        # limit (VMEM is 128 MB on v5e)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_pos.astype(jnp.float32), bias_pos.astype(jnp.float32),
      feats_bdt.astype(jnp.float32))


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
# K_M: per-utterance position-bank GMM moment statistics (lane axis = time)
# ---------------------------------------------------------------------------


def _pos_mom_kernel(n_mix, a_ref, bias_ref, f_ref, lb_ref, gam_ref, mom_ref):
    """Per-utterance gamma-weighted mixture moments.

    a_ref/bias_ref as in _pos_emit_kernel; lb_ref (G, LS, T) the emission
    kernel's log_b; gam_ref (G, LS, T) occupancies (already masked to the
    valid frames by the backward kernel); mom_ref (G, N, 2D+1) m-major
    rows of [sum gm*x, sum gm*x^2, sum gm]."""
    G, N, _ = mom_ref.shape
    LS = lb_ref.shape[1]
    neg_half = jnp.float32(NEG_INF / 2)
    zero = jnp.float32(0.0)
    for g in range(G):
        x = f_ref[g]  # (D, T)
        T = x.shape[1]
        lift = jnp.concatenate([x, x * x], axis=0)  # (2D, T)
        q = (
            jnp.dot(a_ref[g], lift, preferred_element_type=jnp.float32)
            + bias_ref[g]
        )  # (N, T)
        lb = lb_ref[g]  # (LS, T)
        gamma = gam_ref[g]
        rows = []
        for m in range(n_mix):
            qm = q[m * LS : (m + 1) * LS]
            post = jnp.exp(jnp.minimum(qm - lb, zero))
            post = jnp.where(lb > neg_half, post, zero)
            rows.append(gamma * post)
        gm = jnp.concatenate(rows, axis=0)  # (N, T)
        lift1 = jnp.concatenate(
            [lift, jnp.ones((1, T), jnp.float32)], axis=0
        )  # (2D+1, T)
        mom_ref[g] = jax.lax.dot_general(
            gm, lift1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@partial(jax.jit, static_argnames=("n_mix", "group", "interpret"))
def pos_moments_pallas(
    a_pos: jax.Array,
    bias_pos: jax.Array,
    feats_bdt: jax.Array,
    log_b_bst: jax.Array,
    gamma_bst: jax.Array,
    n_mix: int,
    group: int = 8,
    interpret: bool | None = None,
):
    """Per-utterance moment statistics: (B, N, 2D+1), N m-major.

    Recomputes the emission GEMM in VMEM (FLOPs are free next to the HBM
    round-trip of a (B, T, LS, M) posterior tensor) and contracts over
    time on the MXU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, twoD = a_pos.shape
    _, D, T = feats_bdt.shape
    LS = N // n_mix
    assert twoD == 2 * D and B % group == 0
    assert log_b_bst.shape == (B, LS, T) and gamma_bst.shape == (B, LS, T)
    G = group
    blk3 = lambda b: (b, 0 * b, 0 * b)
    return pl.pallas_call(
        partial(_pos_mom_kernel, n_mix),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, twoD), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, 1), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, D, T), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, LS, T), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, LS, T), blk3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, N, 2 * D + 1), blk3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 2 * D + 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        a_pos.astype(jnp.float32),
        bias_pos.astype(jnp.float32),
        feats_bdt.astype(jnp.float32),
        log_b_bst,
        gamma_bst,
    )
