"""Full forward/backward lattice kernels, lane-major (Pallas, TPU).

EM needs the whole (T, S, B) log-alpha / log-beta lattices, and the scans'
VPU utilization depends on the minor axis: (B, S) layouts put S (8..64) on
the 128-lane axis and idle most of the machine.  These kernels keep the
carry as (S, B) in VMEM — batch on the lanes — with the grid as the time
loop (the layout/structure that has proven to compile and run on this
toolchain, unlike the equivalent XLA scan, which hangs compilation).

Outputs are (T, S, B) lattices; gamma/xi/moment statistics are GEMM-shaped
contractions left to XLA downstream.

STATUS: SUPERSEDED by ops/pallas/fused_em_pallas.py — the time-blocked,
banded, log-domain kernels that fuse emission/forward and
backward/statistics and beat the XLA path 3.2x at the headline shape
(PERF.md).  The per-frame-grid kernels here are kept as the documented
first iteration: (1, S, B) blocks are DMA-latency-bound (~30x slower at
B=2048, T=512, S=8) and the unblocked kernels compile in ~5 min.  The
blocked variants below informed the final design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fwd_lattice_kernel(lb_ref, lt_ref, len_ref, out_ref, carry_ref):
    t = pl.program_id(0)
    S, B = carry_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)

    @pl.when(t == 0)
    def _():
        start = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == 0,
            jnp.asarray(0.0, dt),
            neg,
        )
        carry_ref[:] = lb_ref[0] + start
        out_ref[0] = carry_ref[:]

    @pl.when(t > 0)
    def _():
        carry = carry_ref[:]
        # cand[i, j, b] = carry[i, b] + lt[i, j]
        cand = carry[:, None, :] + lt_ref[:][:, :, None]
        m = jnp.maximum(jnp.max(cand, axis=0), neg)  # (S_to, B)
        new = m + jnp.log(jnp.sum(jnp.exp(cand - m[None]), axis=0))
        new = jnp.maximum(new + lb_ref[0], neg)
        keep = jnp.broadcast_to(len_ref[0][None, :], (S, B)) > t.astype(dt)
        carry_ref[:] = jnp.where(keep, new, carry)
        out_ref[0] = carry_ref[:]


def _bwd_lattice_kernel(lb_ref, lt_ref, len_ref, out_ref, carry_ref):
    # grid runs t = 0..T-1 mapping to lattice row T-1-t (reverse time)
    tr = pl.program_id(0)
    S, B = carry_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)
    T = pl.num_programs(0)
    t = T - 1 - tr  # lattice row being produced

    beta_T = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == S - 1,
        jnp.asarray(0.0, dt),
        neg,
    )

    @pl.when(tr == 0)
    def _():
        carry_ref[:] = beta_T
        out_ref[0] = beta_T

    @pl.when(tr > 0)
    def _():
        carry = carry_ref[:]
        # lb_ref here is log_b[t+1] (index map supplies row t+1)
        inner = lb_ref[0] + carry  # (S_next, B)
        cand = lt_ref[:][:, :, None] + inner[None, :, :]  # (from, to, B)
        m = jnp.maximum(jnp.max(cand, axis=1), neg)  # (S_from, B)
        new = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None, :]), axis=1))
        new = jnp.maximum(new, neg)
        # rows at t >= length-1 hold the final-state init (recursion starts
        # at each utterance's last valid frame)
        active = jnp.broadcast_to(len_ref[0][None, :], (S, B)) > (
            t.astype(dt) + 1.0
        )
        carry_ref[:] = jnp.where(active, new, beta_T)
        out_ref[0] = carry_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def forward_lattice_pallas(
    log_b_tsb: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """(T, S, B) emissions -> (T, S, B) log-alpha lattice (rows at
    t >= length repeat the row at length-1)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, S, B = log_b_tsb.shape
    lb = jnp.maximum(log_b_tsb.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    return pl.pallas_call(
        _fwd_lattice_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, B), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, B), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(lb, lt, lens)


@partial(jax.jit, static_argnames=("interpret",))
def backward_lattice_pallas(
    log_b_tsb: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """(T, S, B) emissions -> (T, S, B) log-beta lattice, final-state
    initialization at each utterance's last valid frame."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, S, B = log_b_tsb.shape
    lb = jnp.maximum(log_b_tsb.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lens = lengths.astype(jnp.float32).reshape(1, B)

    def lb_index(tr):
        # producing lattice row t = T-1-tr needs log_b[t+1]; clamp at T-1
        t_next = jnp.minimum(T - 1 - tr + 1, T - 1)
        return (t_next, tr * 0, tr * 0)

    def out_index(tr):
        return (T - 1 - tr, tr * 0, tr * 0)

    return pl.pallas_call(
        _bwd_lattice_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, B), lb_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, B), out_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(lb, lt, lens)


def _fwd_lattice_blocked_kernel(lb_ref, lt_ref, len_ref, out_ref, carry_ref):
    """K_BLOCK frames per grid step, statically unrolled (no dynamic sublane
    indexing — the pattern that breaks Mosaic).  lb/out blocks: (K, S, B)."""
    tb = pl.program_id(0)
    K, S, B = lb_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)
    lt = lt_ref[:]
    lens = len_ref[0]

    carry = carry_ref[:]
    for k in range(K):  # static unroll
        t = tb * K + k

        def first():
            start = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == 0,
                jnp.asarray(0.0, dt),
                neg,
            )
            return lb_ref[k] + start

        def rest():
            cand = carry[:, None, :] + lt[:, :, None]
            m = jnp.maximum(jnp.max(cand, axis=0), neg)
            new = m + jnp.log(jnp.sum(jnp.exp(cand - m[None]), axis=0))
            new = jnp.maximum(new + lb_ref[k], neg)
            keep = jnp.broadcast_to(lens[None, :], (S, B)) > t.astype(dt)
            return jnp.where(keep, new, carry)

        carry = jax.lax.cond(t == 0, first, rest)
        out_ref[k] = carry
    carry_ref[:] = carry


def _bwd_lattice_blocked_kernel(lb_ref, lt_ref, len_ref, out_ref, carry_ref):
    """K_BLOCK lattice rows per grid step, reverse time, statically unrolled.

    Grid step tb produces lattice rows [T-(tb+1)K, T-tb*K); the lb block
    supplied by the index map is rows [t_lo+1, t_lo+K+1) clamped at T-1 —
    row k of the block is log_b[t+1] for the row t being produced (the
    final row's lb is unused: it holds the init)."""
    tb = pl.program_id(0)
    K, S, B = lb_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)
    lt = lt_ref[:]
    lens = len_ref[0]
    T = pl.num_programs(0) * K

    beta_T = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, B), 0) == S - 1,
        jnp.asarray(0.0, dt),
        neg,
    )

    carry = carry_ref[:]
    for k in range(K - 1, -1, -1):  # static unroll, reverse time
        t = (pl.num_programs(0) - 1 - tb) * K + k  # lattice row produced

        def first():
            return beta_T

        def rest():
            inner = lb_ref[k] + carry  # log_b[t+1] + beta[t+1]
            cand = lt[:, :, None] + inner[None, :, :]
            m = jnp.maximum(jnp.max(cand, axis=1), neg)
            new = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None, :]), axis=1))
            new = jnp.maximum(new, neg)
            # rows at t >= length-1 hold the final-state init
            active = jnp.broadcast_to(lens[None, :], (S, B)) > (
                t.astype(dt) + 1.0
            )
            return jnp.where(active, new, beta_T)

        carry = jax.lax.cond(t == T - 1, first, rest)
        out_ref[k] = carry
    carry_ref[:] = carry


@partial(jax.jit, static_argnames=("k_block", "interpret"))
def backward_lattice_pallas_blocked(
    log_b_tsb: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    k_block: int = 16,
    interpret: bool | None = None,
) -> jax.Array:
    """Time-blocked lane-major log-beta lattice: (T, S, B) -> (T, S, B),
    final-state initialization at each utterance's last valid frame
    (semantics of ops.forward_backward.log_backward_full)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, S, B = log_b_tsb.shape
    assert T % k_block == 0, (T, k_block)
    lb = jnp.maximum(log_b_tsb.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    nb = T // k_block

    # producing rows of block j = nb-1-tb needs log_b rows [jK+1, jK+K+1);
    # blocks are K-aligned, so supply the SHIFTED view log_b[1:] padded by
    # one duplicate final row, block index j (the pad row is only ever read
    # for the init row, whose value is unused)
    lb_shift = jnp.concatenate([lb[1:], lb[-1:]], axis=0)

    return pl.pallas_call(
        _bwd_lattice_blocked_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (k_block, S, B),
                lambda tb, nb=nb: (nb - 1 - tb, 0 * tb, 0 * tb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((S, S), lambda tb: (0 * tb, 0 * tb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda tb: (0 * tb, 0 * tb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_block, S, B),
            lambda tb, nb=nb: (nb - 1 - tb, 0 * tb, 0 * tb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(lb_shift, lt, lens)


@partial(jax.jit, static_argnames=("k_block", "interpret"))
def forward_lattice_pallas_blocked(
    log_b_tsb: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    k_block: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Time-blocked variant of forward_lattice_pallas: k_block frames per
    grid step (T % k_block == 0), amortizing the per-step block DMA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, S, B = log_b_tsb.shape
    assert T % k_block == 0, (T, k_block)
    lb = jnp.maximum(log_b_tsb.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    return pl.pallas_call(
        _fwd_lattice_blocked_kernel,
        grid=(T // k_block,),
        in_specs=[
            pl.BlockSpec((k_block, S, B), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_block, S, B), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(lb, lt, lens)
