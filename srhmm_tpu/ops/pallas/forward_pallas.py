"""Log-space forward and Viterbi scan kernels (Pallas, TPU).

One kernel invocation processes one utterance of a padded batch (grid over
B): the (T, S) emission lattice block and the (S, S) log-transition matrix
are VMEM-resident, and the time recursion is an in-kernel `fori_loop`
carrying the (1, S) state vector in registers — no per-step XLA scan
overhead, no HBM round-trips between steps.

The Viterbi variant additionally writes the (T, S) int32 backpointer lattice
(argmax over predecessors per step); the backtrace itself is a trivially
cheap reversed gather done outside the kernel.

Sizing: T * S * 4B must fit VMEM alongside (S, S) — e.g. T=4096, S=512 is
~8.4 MB.  Longer utterances should use time-chunked grids (the carry between
chunks is the (1, S) vector); not yet needed for the benchmark configs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # -inf surrogate inside kernels (avoids inf-inf NaNs on VPU)


def _forward_kernel(len_ref, lb_ref, lt_ref, out_ref):
    S = lt_ref.shape[0]
    dt = lb_ref.dtype
    # every constant pinned to the kernel dtype: under global x64, weak f64
    # Python scalars would promote the carry to f64, which Mosaic cannot
    # lower (its convert-element-type rule recurses)
    neg = jnp.asarray(NEG_INF, dt)
    zero = jnp.asarray(0.0, dt)
    length = len_ref.at[pl.program_id(0)].get()
    lt = lt_ref[:]

    init = lb_ref[0, 0:1, :] + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) == 0, zero, neg
    )

    def step(t, carry):
        # carry: (1, S).  cand[i, j] = carry[i] + lt[i, j]
        cand = carry.reshape(S, 1) + lt
        safe_m = jnp.maximum(jnp.max(cand, axis=0, keepdims=True), neg)
        new = safe_m + jnp.log(
            jnp.sum(jnp.exp(cand - safe_m), axis=0, keepdims=True)
        )
        new = new + lb_ref[0, t]
        return jnp.where(t < length, jnp.maximum(new, neg), carry)

    # i32 loop bounds: under global x64 a Python-int bound makes `t` an i64,
    # whose Mosaic convert-element-type lowering recurses infinitely
    final = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(lb_ref.shape[1]), step, init
    )
    out_ref[0] = final


@partial(jax.jit, static_argnames=("interpret",))
def log_forward_batch_pallas(
    log_b: jax.Array,
    log_trans: jax.Array,
    lengths: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, T, S) emissions + (S, S) log-transitions -> (B, S) final log-alpha.

    Scores read off as in ops/forward_backward.py: total = logsumexp(out),
    final-state = out[..., -1].  -inf is represented as -1e30.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, S = log_b.shape
    lb = jnp.maximum(log_b.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, S), lambda b, _: (b, b * 0, b * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda b, _: (b * 0, b * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, S), lambda b, _: (b, b * 0, b * 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _forward_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), lb, lt)
    return out[:, 0, :]


def _viterbi_kernel(len_ref, lb_ref, lt_ref, score_ref, bptr_ref):
    S = lt_ref.shape[0]
    # explicit load: indexing a scalar-prefetch ref with a dynamic program id
    # can yield a TransformedRef whose deferred binary ops recurse at trace
    # time on the TPU lowering path
    length = len_ref.at[pl.program_id(0)].get()
    lt = lt_ref[:]

    init = lb_ref[0, 0:1, :] + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) == 0, 0.0, NEG_INF
    )
    bptr_ref[0, 0] = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0]

    def step(t, carry):
        cand = carry.reshape(S, 1) + lt  # (from, to)
        best = jnp.max(cand, axis=0, keepdims=True)  # (1, S)
        arg = jnp.argmax(cand, axis=0).astype(jnp.int32)  # (S,)
        new = jnp.maximum(best + lb_ref[0, t], NEG_INF)
        keep = t < length
        idc = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0]
        bptr_ref[0, t] = jnp.where(keep, arg, idc)
        return jnp.where(keep, new, carry)

    final = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(lb_ref.shape[1]), step, init
    )
    score_ref[0] = final


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
    lb = jnp.maximum(log_b.astype(jnp.float32), NEG_INF)
    lt = jnp.maximum(log_trans.astype(jnp.float32), NEG_INF)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, S), lambda b, _: (b, b * 0, b * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda b, _: (b * 0, b * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, S), lambda b, _: (b, b * 0, b * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, T, S), lambda b, _: (b, b * 0, b * 0), memory_space=pltpu.VMEM),
        ),
    )
    scores, bptr = pl.pallas_call(
        _viterbi_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, T, S), jnp.int32),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), lb, lt)
    return scores[:, 0, :], bptr


def backtrace(bptr: jax.Array, lengths: jax.Array, end_state: int):
    """(B, T, S) backpointers -> (B, T) int32 state paths ending at end_state
    at the last valid frame (identity through padding)."""

    def one(bp, length):
        T = bp.shape[0]

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
