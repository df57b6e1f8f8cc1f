"""Log-space forward and Viterbi scan kernels (Pallas, TPU).

Design: **the grid is the time loop**.  Emissions are laid out time-major
(T, B, S); grid step t streams the (B, S) emission slab into VMEM (Mosaic
double-buffers the block DMA automatically), updates a persistent (B, S)
carry held in VMEM scratch, and the batch axis fills the VPU sublanes.  There
is no in-kernel dynamic indexing and no fori_loop — both of which proved
fragile in Mosaic on this toolchain (dynamic sublane reads hung compilation
for T >= 96).

Per-step work for the forward kernel is a (B, S_from, S_to) log-sum-exp
candidate expansion — pure VPU; Viterbi replaces it with max/argmax and
writes the (1, B, S) backpointer slab for its grid step.

Length masking: lengths ride along as an f32 (1, B) VMEM row; step t keeps
the old carry for utterances with t >= length, so the final carry equals the
value at each utterance's last valid frame.

Scores read off as in ops/forward_backward.py: total = logsumexp(out),
final-state = out[..., -1]; -inf is encoded as -1e30 in-kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # -inf surrogate inside kernels (avoids inf-inf NaNs on VPU)


def _forward_kernel(lb_ref, lt_ref, len_ref, out_ref, carry_ref):
    t = pl.program_id(0)
    B, S = carry_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)
    # lt_ref is (S, S) shared, or (B, S, S) per-row (vocabulary scoring)
    lt = lt_ref[:] if lt_ref.ndim == 3 else lt_ref[:][None]

    @pl.when(t == 0)
    def _():
        start = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B, S), 1) == 0,
            jnp.asarray(0.0, dt),
            neg,
        )
        carry_ref[:] = lb_ref[0] + start

    @pl.when(t > 0)
    def _():
        carry = carry_ref[:]
        cand = carry[:, :, None] + lt  # (B, from, to)
        m = jnp.maximum(jnp.max(cand, axis=1), neg)  # (B, to)
        new = m + jnp.log(jnp.sum(jnp.exp(cand - m[:, None, :]), axis=1))
        new = jnp.maximum(new + lb_ref[0], neg)
        # mask built in 2-D from the f32 row: reshaping an i1 vector
        # ((B,) -> (B,1)) is unsupported in Mosaic for 1-bit types
        keep = jnp.broadcast_to(len_ref[0][:, None], (B, S)) > t.astype(dt)
        carry_ref[:] = jnp.where(keep, new, carry)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = carry_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def log_forward_batch_pallas(
    log_b: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, T, S) emissions + (S, S) log-transitions -> (B, S) final log-alpha."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, S = log_b.shape
    lbt = jnp.maximum(
        jnp.swapaxes(log_b.astype(jnp.float32), 0, 1), NEG_INF
    )  # (T, B, S)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lt_spec = (
        pl.BlockSpec((B, S, S), lambda t: (t * 0, t * 0, t * 0), memory_space=pltpu.VMEM)
        if lt.ndim == 3
        else pl.BlockSpec((S, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM)
    )
    lens = lengths.astype(jnp.float32).reshape(1, B)
    return pl.pallas_call(
        _forward_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, S), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM),
            lt_spec,
            pl.BlockSpec((1, B), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(lbt, lt, lens)


def _viterbi_kernel(lb_ref, lt_ref, len_ref, score_ref, bptr_ref, carry_ref):
    t = pl.program_id(0)
    B, S = carry_ref.shape
    dt = carry_ref.dtype
    neg = jnp.asarray(NEG_INF, dt)
    idc = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

    @pl.when(t == 0)
    def _():
        start = jnp.where(idc == 0, jnp.asarray(0.0, dt), neg)
        carry_ref[:] = lb_ref[0] + start
        bptr_ref[0] = idc

    @pl.when(t > 0)
    def _():
        carry = carry_ref[:]
        cand = carry[:, :, None] + lt_ref[:][None]  # (B, from, to)
        best = jnp.max(cand, axis=1)  # (B, to)
        # lax.argmax with explicit i32: x64 would make the index i64,
        # which Mosaic's reduce-index lowering rejects
        arg = jax.lax.argmax(cand, 1, jnp.int32)
        new = jnp.maximum(best + lb_ref[0], neg)
        keep = jnp.broadcast_to(len_ref[0][:, None], (B, S)) > t.astype(dt)
        bptr_ref[0] = jnp.where(keep, arg, idc)
        carry_ref[:] = jnp.where(keep, new, carry)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        score_ref[:] = carry_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_batch_pallas(
    log_b: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    interpret: bool | None = None,
):
    """(B, T, S) -> (final scores (B, S), backpointers (B, T, S) int32).

    Backpointer row t maps state-at-t -> best state at t-1 (row 0 is the
    identity).  Use `backtrace` to recover paths.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, S = log_b.shape
    lbt = jnp.maximum(
        jnp.swapaxes(log_b.astype(jnp.float32), 0, 1), NEG_INF
    )
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    lens = lengths.astype(jnp.float32).reshape(1, B)
    scores, bptr_tm = pl.pallas_call(
        _viterbi_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, S), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, S), lambda t: (t * 0, t * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, S), lambda t: (t, t * 0, t * 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((T, B, S), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(lbt, lt, lens)
    return scores, jnp.swapaxes(bptr_tm, 0, 1)


def backtrace(bptr: jax.Array, lengths: jax.Array, end_state: int):
    """(B, T, S) backpointers -> (B, T) int32 state paths ending at end_state
    at the last valid frame (identity through padding)."""

    def one(bp, length):
        def step(state, bp_row):
            prev = bp_row[state]
            return prev, prev

        # walk from the end; padding rows are identity so starting at T-1 is
        # equivalent to starting at length-1
        _, rev = jax.lax.scan(
            step, jnp.asarray(end_state, jnp.int32), bp[1:], reverse=True
        )
        return jnp.concatenate(
            [rev, jnp.asarray([end_state], jnp.int32)], axis=0
        )

    return jax.vmap(one)(bptr, lengths)
