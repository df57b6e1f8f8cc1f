"""Viterbi decoding (max-plus forward scan + backpointer backtrace).

The reference has no Viterbi — it scores isolated words with the forward
algorithm only.  Viterbi is required for the continuous-recognition
capability (composed word HMMs, token passing, N-best) and as the
speed-of-light per-chip decode kernel named in BASELINE.json's north star.

Design: a `lax.scan` over time carrying per-state best log-scores; the
backpointer lattice (T, S) int32 is emitted as scan output and traced back
with a second reversed scan.  Mask-aware for padded batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def viterbi(
    log_b: jax.Array,
    log_trans: jax.Array,
    length: jax.Array | None = None,
    final_state_only: bool = True,
):
    """Single-utterance Viterbi.

    log_b: (T, S), log_trans: (S, S); start state fixed to 0 (reference
    left-right contract).  Returns (best_score, path (T,) int32).

    final_state_only: score/backtrace from the last state (the reference's
    models must end in state S-1); False takes the argmax end state.
    Padded steps (t >= length) carry scores unchanged and store backpointer
    j -> j so backtrace through padding is the identity.
    """
    T, S = log_b.shape
    init = jnp.full((S,), -jnp.inf, log_b.dtype).at[0].set(0.0) + log_b[0]
    idint = jnp.arange(S, dtype=jnp.int32)

    def step(carry, inputs):
        lb, t = inputs
        cand = carry[:, None] + log_trans  # (from, to)
        best_prev = jnp.argmax(cand, axis=0).astype(jnp.int32)
        new = jnp.max(cand, axis=0) + lb
        if length is not None:
            new = jnp.where(t < length, new, carry)
            best_prev = jnp.where(t < length, best_prev, idint)
        return new, (new, best_prev)

    ts = jnp.arange(1, T)
    final, (_, bptr) = jax.lax.scan(step, init, (log_b[1:], ts))
    # bptr[t-1] maps state at time t -> best state at time t-1
    if final_state_only:
        end_state = jnp.asarray(S - 1, jnp.int32)
        best_score = final[S - 1]
    else:
        end_state = jnp.argmax(final).astype(jnp.int32)
        best_score = jnp.max(final)

    def back(carry, bp):
        prev = bp[carry]
        return prev, prev

    _, rev_path = jax.lax.scan(back, end_state, bptr, reverse=True)
    path = jnp.concatenate([rev_path, end_state[None]], axis=0)
    return best_score, path


def viterbi_batch(log_b, log_trans, lengths, final_state_only: bool = True):
    """vmapped Viterbi over a padded batch: log_b (B, T, S), lengths (B,)."""
    return jax.vmap(
        lambda lb, ln: viterbi(lb, log_trans, ln, final_state_only)
    )(log_b, lengths)
