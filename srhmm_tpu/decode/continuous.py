"""Continuous recognition: composed-HMM token passing, N-best decode.

The reference only recognizes isolated words (one forward score per whole
utterance per word, R2:341-369).  Continuous strings (BASELINE.json config 3)
need word models composed into a decoding graph and a frame-synchronous
Viterbi over the composed state space.

TPU-native design:

* the composed graph is a dense (S_tot, S_tot) log-transition matrix — for
  vocabulary word-loops S_tot = W x S_word stays small (hundreds to a few
  thousand states), and a dense max-plus matmul per frame lives happily on
  the MXU; emissions come from the stacked vocabulary in one batched GEMM
  per frame block (T, W, S) -> (T, S_tot);
* decoding is one `lax.scan` carrying (S_tot, K) K-best token scores — the
  N-best semiring: each step does a dense candidate expansion
  (S_from x K) + trans -> top-K per destination state, with backpointers
  stored as flat (from_state * K + k) indices for the backtrace scan;
* word boundaries are recovered from the backtrace by detecting exit->entry
  arc crossings (state_to_word changes or re-entry into an entry state).

`compose_sequence` builds the left-to-right concatenation of per-unit models
for a known transcript — the graph used by forced alignment and embedded
re-estimation (train/embedded.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.gmm_hmm import GmmHmm
from ..ops.emission import log_state_emission


@struct.dataclass
class ComposedGraph:
    """A decoding graph over the composed state space of a stacked vocab.

    log_trans: (S_tot, S_tot); state_to_word: (S_tot,) int32;
    entry/exit: (W,) int32 composed-state ids; log_entry: (S_tot,) initial
    scores (word entries get lm + entry prob; others -inf).
    """

    log_trans: jax.Array
    state_to_word: jax.Array
    entry_states: jax.Array
    exit_states: jax.Array
    log_entry: jax.Array
    words: tuple = struct.field(pytree_node=False, default=())


def compose_word_loop(
    vocab: GmmHmm,
    lm_logprobs: np.ndarray | None = None,
    exit_logprob: float = np.log(0.1),
    lm_scale: float = 1.0,
    word_insertion_penalty: float = 0.0,
    lm_initial: np.ndarray | None = None,
) -> ComposedGraph:
    """Word-loop graph: every word's left-right HMM, with an arc from each
    word's final state to every word's entry state, enabling unrestricted
    word sequences.

    lm_logprobs: language-model scores over the vocabulary —
      * None: uniform unigram (-log W);
      * shape (W,): unigram log-probs, same score into word v from any
        predecessor;
      * shape (W, W): bigram log P(next=v | prev=w) — row w weights the arcs
        out of word w's exit state.  The word-loop state space identifies the
        previous word at every exit state, so a bigram needs no state-space
        expansion (higher-order LMs would; documented non-goal here).
    lm_scale: multiplier on all LM scores (the standard acoustic/LM balance
      knob; the reference has no LM at all — its model-set weights
      `coef_model`, R2:193-196, scale *acoustic* scores and live in
      cli/recognize.py).
    word_insertion_penalty: additive log-score per word transition (negative
      discourages insertions); applied on exit->entry arcs only, so an
      N-word hypothesis accumulates (N-1) penalties.
    lm_initial: optional (W,) log-probs for the first word; defaults to
      lm_logprobs when that is a unigram, uniform when it is a bigram.
    """
    W = vocab.trans.shape[0]
    S = vocab.trans.shape[-1]
    S_tot = W * S
    if lm_logprobs is None:
        lm_logprobs = np.full(W, -np.log(W))
    lm_logprobs = np.asarray(lm_logprobs, dtype=np.float64)
    if lm_logprobs.ndim == 1:
        arc_lm = np.broadcast_to(lm_logprobs, (W, W))
        initial = lm_logprobs if lm_initial is None else np.asarray(lm_initial)
    elif lm_logprobs.shape == (W, W):
        arc_lm = lm_logprobs
        initial = (
            np.full(W, -np.log(W)) if lm_initial is None else np.asarray(lm_initial)
        )
    else:
        raise ValueError(
            f"lm_logprobs must be (W,) or (W, W) for W={W}, got {lm_logprobs.shape}"
        )

    lt = np.full((S_tot, S_tot), -np.inf)
    trans = np.asarray(vocab.trans)
    with np.errstate(divide="ignore"):
        log_word_trans = np.where(trans > 0, np.log(np.maximum(trans, 1e-300)), -np.inf)
    for w in range(W):
        lt[w * S : (w + 1) * S, w * S : (w + 1) * S] = log_word_trans[w]
    entry = np.arange(W) * S
    exit_ = np.arange(W) * S + (S - 1)
    for w in range(W):
        lt[exit_[w], entry] = np.maximum(
            lt[exit_[w], entry],
            exit_logprob + lm_scale * arc_lm[w] + word_insertion_penalty,
        )

    log_entry = np.full(S_tot, -np.inf)
    log_entry[entry] = lm_scale * initial

    return ComposedGraph(
        log_trans=jnp.asarray(lt),
        state_to_word=jnp.asarray(np.repeat(np.arange(W, dtype=np.int32), S)),
        entry_states=jnp.asarray(entry.astype(np.int32)),
        exit_states=jnp.asarray(exit_.astype(np.int32)),
        log_entry=jnp.asarray(log_entry),
        words=tuple(vocab.word) if isinstance(vocab.word, tuple) else (),
    )


def compose_sequence(vocab: GmmHmm, transcript: list[int]) -> ComposedGraph:
    """Left-to-right concatenation of the models in `transcript` (word/phone
    ids into the stacked vocab): unit k's final state feeds unit k+1's entry.
    This is the embedded-training / forced-alignment graph."""
    S = vocab.trans.shape[-1]
    L = len(transcript)
    S_tot = L * S
    trans = np.asarray(vocab.trans)
    with np.errstate(divide="ignore"):
        logt = np.where(trans > 0, np.log(np.maximum(trans, 1e-300)), -np.inf)
    lt = np.full((S_tot, S_tot), -np.inf)
    for k, w in enumerate(transcript):
        lt[k * S : (k + 1) * S, k * S : (k + 1) * S] = logt[w]
        if k + 1 < L:
            # exit from unit k's final state into unit k+1's first state; use
            # the final state's self-loop mass as the exit weight so rows stay
            # sub-stochastic rather than inventing probability
            lt[k * S + S - 1, (k + 1) * S] = logt[w][S - 1, S - 1]
    log_entry = np.full(S_tot, -np.inf)
    log_entry[0] = 0.0
    return ComposedGraph(
        log_trans=jnp.asarray(lt),
        state_to_word=jnp.asarray(
            np.repeat(np.asarray(transcript, dtype=np.int32), S)
        ),
        entry_states=jnp.asarray((np.arange(L) * S).astype(np.int32)),
        exit_states=jnp.asarray((np.arange(L) * S + S - 1).astype(np.int32)),
        log_entry=jnp.asarray(log_entry),
        words=tuple(vocab.word) if isinstance(vocab.word, tuple) else (),
    )


def composed_emissions(vocab: GmmHmm, frames) -> jax.Array:
    """(T, S_tot) emission log-likelihoods for the composed space: one
    batched computation over the stacked vocabulary.

    frames: (T, D) shared-stream frames, or a tuple of per-stream (T, D_p)
    arrays for MULTI-STREAM vocabularies — per-stream emissions sum in log
    space (the reference's product-of-streams semantics, R2:352-358,
    lifted to the composed graph; round 5)."""
    per_word = jax.vmap(
        lambda m: log_state_emission(frames, m.streams)
    )(vocab)  # (W, T, S)
    W, T, S = per_word.shape
    return jnp.transpose(per_word, (1, 0, 2)).reshape(T, W * S)


def emissions_for_graph(
    vocab: GmmHmm, graph: ComposedGraph, frames
) -> jax.Array:
    """(T, S_tot) emissions for an arbitrary composed graph: computed per
    unique word then gathered by state_to_word (sequence graphs repeat
    units, so compute once per word, not per occurrence).  frames may be a
    per-stream tuple (see composed_emissions)."""
    per_word = jax.vmap(lambda m: log_state_emission(frames, m.streams))(vocab)
    S = per_word.shape[-1]
    n_states = graph.state_to_word.shape[0]
    within = jnp.arange(n_states) % S
    return jnp.transpose(per_word, (1, 0, 2))[:, graph.state_to_word, within]


@partial(jax.jit, static_argnames=("n_best", "beam"))
def token_passing(
    graph: ComposedGraph,
    log_b: jax.Array,
    length: jax.Array | None = None,
    n_best: int = 1,
    beam: float | None = None,
):
    """Frame-synchronous K-best Viterbi over the composed graph.

    log_b: (T, S_tot).  Returns (scores (S_tot, K) at the last valid frame,
    backpointers (T-1, S_tot, K) flat from-(state*K+k) indices).

    beam: optional log-domain beam width — tokens more than `beam` below the
    frame's best token are pruned to -inf (exact decode when None; histogram
    pruning for large composed graphs).  Vectorized: pruning is a mask, not
    a dynamic active list, so the step stays a dense TPU computation.
    """
    T, S_tot = log_b.shape
    K = n_best
    init = graph.log_entry[:, None] + log_b[0][:, None]  # (S, 1) -> pad K
    init = jnp.concatenate(
        [init, jnp.full((S_tot, K - 1), -jnp.inf, log_b.dtype)], axis=1
    )
    id_bp = (jnp.arange(S_tot)[:, None] * K + jnp.arange(K)[None, :]).astype(
        jnp.int32
    )

    def step(carry, inputs):
        lb, t = inputs
        # candidates into state j: carry[i, k] + log_trans[i, j]
        cand = carry[:, :, None] + graph.log_trans[:, None, :]  # (S, K, S_to)
        cand = cand.reshape(S_tot * K, S_tot)
        top, idx = jax.lax.top_k(cand.T, K)  # (S_to, K)
        new = top + lb[:, None]
        if beam is not None:
            best = jnp.max(new)
            new = jnp.where(new >= best - beam, new, -jnp.inf)
        bp = idx.astype(jnp.int32)
        if length is not None:
            keep = t < length
            new = jnp.where(keep, new, carry)
            bp = jnp.where(keep, bp, id_bp)
        return new, bp

    ts = jnp.arange(1, T)
    final, bps = jax.lax.scan(step, init, (log_b[1:], ts))
    return final, bps


@struct.dataclass
class BlockGraph:
    """Block-structured word-loop graph: the dense (S_tot, S_tot) matrix of
    ComposedGraph factors into per-word (W, S, S) within-word blocks plus a
    (W, W) exit->entry arc matrix.  Token passing then costs
    O(W S^2 K + W^2 K) per frame instead of the dense O((W S K) W S) —
    sub-quadratic in W for the left-right word HMMs where almost all dense
    entries are -inf.  Backpointers use the same flat (w*S+s)*K + k encoding
    as the dense path, so backtrace_words works on either."""

    log_trans: jax.Array  # (W, S, S) within-word log-transitions
    arc: jax.Array  # (W, W) exit->entry arc log-weights (lm, penalty incl.)
    log_entry: jax.Array  # (W,) initial scores at each word's entry state
    words: tuple = struct.field(pytree_node=False, default=())
    # (W,) within-word EXIT state index per word, or None for the
    # homogeneous S-1 (round 5: HETEROGENEOUS word lengths — words padded
    # to a common stride by pad_stack_models keep their real final state)
    exit_states: jax.Array | None = None


def compose_word_loop_blocks(
    vocab: GmmHmm,
    lm_logprobs: np.ndarray | None = None,
    exit_logprob: float = np.log(0.1),
    lm_scale: float = 1.0,
    word_insertion_penalty: float = 0.0,
    lm_initial: np.ndarray | None = None,
    final_states: np.ndarray | None = None,
) -> BlockGraph:
    """Block-structured equivalent of compose_word_loop (same LM arguments,
    same arc semantics — test-locked equal decodes).

    final_states: optional (W,) REAL final-state index per word — for
    HETEROGENEOUS vocabularies stacked by models.pad_stack_models (filler
    states are unreachable self-loops past each word's real exit); the
    engines then read exits and attach cross-word arcs at these rows
    (round 5)."""
    W = vocab.trans.shape[0]
    if lm_logprobs is None:
        lm_logprobs = np.full(W, -np.log(W))
    lm_logprobs = np.asarray(lm_logprobs, dtype=np.float64)
    if lm_logprobs.ndim == 1:
        arc_lm = np.broadcast_to(lm_logprobs, (W, W))
        initial = lm_logprobs if lm_initial is None else np.asarray(lm_initial)
    elif lm_logprobs.shape == (W, W):
        arc_lm = lm_logprobs
        initial = (
            np.full(W, -np.log(W)) if lm_initial is None else np.asarray(lm_initial)
        )
    else:
        raise ValueError(
            f"lm_logprobs must be (W,) or (W, W) for W={W}, got {lm_logprobs.shape}"
        )
    trans = np.asarray(vocab.trans)
    with np.errstate(divide="ignore"):
        log_word_trans = np.where(trans > 0, np.log(np.maximum(trans, 1e-300)), -np.inf)
    arc = exit_logprob + lm_scale * arc_lm + word_insertion_penalty
    return BlockGraph(
        log_trans=jnp.asarray(log_word_trans),
        arc=jnp.asarray(arc),
        log_entry=jnp.asarray(lm_scale * initial),
        words=tuple(vocab.word) if isinstance(vocab.word, tuple) else (),
        exit_states=(
            None
            if final_states is None
            else jnp.asarray(np.asarray(final_states), jnp.int32)
        ),
    )


@partial(jax.jit, static_argnames=("n_best", "beam"))
def token_passing_blocks(
    graph: BlockGraph,
    log_b: jax.Array,
    length: jax.Array | None = None,
    n_best: int = 1,
    beam: float | None = None,
):
    """Frame-synchronous K-best Viterbi over the block-structured word loop.

    log_b: (T, W*S) composed emissions (same layout as composed_emissions).
    Returns (scores (W*S, K) at the last valid frame, backpointers
    (T-1, W*S, K) flat (w*S+s)*K + k indices) — identical contract (and
    test-locked identical values) to the dense token_passing, at
    O(W S^2 K + W^2 K) per frame."""
    T = log_b.shape[0]
    W, S, _ = graph.log_trans.shape
    K = n_best
    lb = log_b.reshape(T, W, S)
    neg = jnp.asarray(-jnp.inf, log_b.dtype)

    init = jnp.full((W, S, K), neg, log_b.dtype)
    init = init.at[:, 0, 0].set(
        (graph.log_entry + lb[0, :, 0]).astype(log_b.dtype)
    )
    # non-entry states unreachable at t=0 (dense path: log_entry is -inf
    # off-entry); keep K>0 slots -inf
    flat_ids = (
        (jnp.arange(W * S)[:, None] * K + jnp.arange(K)[None, :])
        .astype(jnp.int32)
        .reshape(W, S, K)
    )

    lt = graph.log_trans.astype(log_b.dtype)  # (W, S, S)
    arc = graph.arc.astype(log_b.dtype)  # (W, W)

    def step(carry, inputs):
        lbt, t = inputs  # (W, S), scalar
        # within-word: candidates into (w, j) from (w, i, k)
        cand_in = carry[:, :, :, None] + lt[:, :, None, :]  # (W, i, K, j)
        cand_in = cand_in.reshape(W, S * K, S)
        top_in, idx_in = jax.lax.top_k(
            jnp.swapaxes(cand_in, 1, 2), K
        )  # (W, j, K) values + indices into (i*K + k)
        # flat encoding of the within-word source: (w*S + i)*K + k
        i_src = idx_in // K
        k_src = idx_in % K
        bp_in = ((jnp.arange(W)[:, None, None] * S + i_src) * K + k_src).astype(
            jnp.int32
        )

        # cross-word: exit tokens of every word -> every entry state
        if graph.exit_states is None:
            exit_tok = carry[:, S - 1, :]  # (W, K)
            exit_off = jnp.full((W,), S - 1, jnp.int32)
        else:  # heterogeneous word lengths: per-word real exit rows
            exit_off = graph.exit_states.astype(jnp.int32)
            exit_tok = jnp.take_along_axis(
                carry, exit_off[:, None, None], axis=1
            )[:, 0, :]
        cross = exit_tok[:, None, :] + arc[:, :, None]  # (from_w, to_v, K)
        cross = jnp.swapaxes(cross, 0, 1).reshape(W, W * K)  # (to_v, from_w*K)
        top_x, idx_x = jax.lax.top_k(cross, K)  # (W, K)
        w_src = idx_x // K
        kx_src = idx_x % K
        bp_x = ((w_src * S + exit_off[w_src]) * K + kx_src).astype(jnp.int32)

        # merge at entry state 0: within-word K + cross-word K
        merged = jnp.concatenate([top_in[:, 0, :], top_x], axis=1)  # (W, 2K)
        merged_bp = jnp.concatenate([bp_in[:, 0, :], bp_x], axis=1)
        m_top, m_idx = jax.lax.top_k(merged, K)
        m_bp = jnp.take_along_axis(merged_bp, m_idx, axis=1)

        new = top_in.at[:, 0, :].set(m_top) + lbt[:, :, None]
        bp = bp_in.at[:, 0, :].set(m_bp)
        if beam is not None:
            best = jnp.max(new)
            new = jnp.where(new >= best - beam, new, neg)
        if length is not None:
            keep = t < length
            new = jnp.where(keep, new, carry)
            bp = jnp.where(keep, bp, flat_ids)
        return new, bp

    ts = jnp.arange(1, T)
    final, bps = jax.lax.scan(step, init, (lb[1:], ts))
    return final.reshape(W * S, K), bps.reshape(T - 1, W * S, K)


@partial(jax.jit, static_argnames=())
def backtrace_path_device(backpointers: jax.Array, state: jax.Array, k: jax.Array):
    """Device-side backtrace: follow flat (state*K + k) pointers from the
    final (state, k) token through the (T-1, S_tot, K) backpointer lattice.
    Returns the (T,) state path — O(T) gathers on device instead of a host
    loop over a (T-1, S_tot, K) transfer."""
    K = backpointers.shape[-1]

    def step(carry, bp_t):
        s, kk = carry
        flat = bp_t[s, kk]
        return (flat // K, flat % K), s

    (s0, _), rest = jax.lax.scan(
        step, (state.astype(jnp.int32), k.astype(jnp.int32)),
        backpointers, reverse=True,
    )
    return jnp.concatenate([s0[None], rest], axis=0)  # (T,)


def backtrace_words(
    graph: ComposedGraph,
    final_scores: np.ndarray,
    backpointers: np.ndarray,
    length: int,
    rank: int = 0,
) -> tuple[float, list[int], list[tuple[int, int]]]:
    """Recover the rank-th best word sequence from a token-passing run.

    Returns (score, word_ids, word_spans) where word_spans are (start, end)
    frame ranges.  Ends in any word's exit state (word-loop semantics).
    """
    exit_states = np.asarray(graph.exit_states)
    s2w = np.asarray(graph.state_to_word)
    K = final_scores.shape[1]
    # best end tokens among exit states
    ends = [(final_scores[s, k], s, k) for s in exit_states for k in range(K)]
    ends.sort(key=lambda x: -x[0])
    score, state, k = ends[min(rank, len(ends) - 1)]

    path = [state]
    for t in range(length - 2, -1, -1):
        flat = backpointers[t, state, k]
        state, k = int(flat) // K, int(flat) % K
        path.append(state)
    path.reverse()

    entry_set = set(int(s) for s in np.asarray(graph.entry_states))
    exit_set = set(int(s) for s in exit_states)
    words, spans = [], []
    start = 0
    for t in range(1, length):
        # a word boundary is exactly an exit->entry arc: left-right internals
        # never reach an entry state except via its self-loop (from itself)
        crossed = (
            path[t] in entry_set
            and path[t - 1] in exit_set
            and path[t] != path[t - 1]
        )
        if crossed:
            words.append(int(s2w[path[start]]))
            spans.append((start, t))
            start = t
    words.append(int(s2w[path[start]]))
    spans.append((start, length))
    return float(score), words, spans


def _words_from_path(
    path: np.ndarray, S: int, exit_off=None
) -> tuple[list[int], list[tuple[int, int]]]:
    """Vectorized word-boundary extraction from a composed-state path: a
    boundary is exactly an exit -> entry(0) arc crossing (the rule of
    backtrace_words, without the host loop).  exit_off: exit state index
    within each word — scalar (default S - 1; smaller when the word
    stride S includes unreachable filler states, token_passing_fused's
    padded bigram case) or a (W,) per-word array for heterogeneous word
    lengths (round 5)."""
    if exit_off is None:
        exit_off = S - 1
    p = np.asarray(path)
    crossed = np.zeros(len(p), dtype=bool)
    exit_off = np.asarray(exit_off)
    prev_exit = (
        exit_off[p[:-1] // S] if exit_off.ndim else exit_off
    ) if len(p) > 1 else exit_off
    if len(p) > 1:
        crossed[1:] = (p[1:] % S == 0) & (p[:-1] % S == prev_exit) & (p[1:] != p[:-1])
    starts = np.flatnonzero(np.concatenate([[True], crossed[1:]]))
    ends = np.append(starts[1:], len(p))
    words = (p[starts] // S).astype(int).tolist()
    return words, list(zip(starts.tolist(), ends.tolist()))


def decode_continuous(
    vocab: GmmHmm,
    frames: jax.Array,
    lm_logprobs: np.ndarray | None = None,
    n_best: int = 1,
    exit_logprob: float = float(np.log(0.1)),
    lm_scale: float = 1.0,
    word_insertion_penalty: float = 0.0,
    lm_initial: np.ndarray | None = None,
    engine: str = "blocks",
    final_states: np.ndarray | None = None,
):
    """End-to-end continuous decode: compose word loop (unigram or bigram
    LM, see compose_word_loop), token-pass, return the N best
    (score, word_ids, spans) hypotheses.

    lm_initial: optional (W,) first-word log-probs forwarded to
    compose_word_loop — without it a bigram LM decode starts from a uniform
    first-word distribution.
    engine: "blocks" (default) — block-structured token passing,
    O(W S^2 K + W^2 K) per frame with device-side backtrace, scales to
    hundreds of words; "dense" — the (S_tot K, S_tot) expansion (small
    graphs / reference for equality tests)."""
    kwargs = dict(
        lm_logprobs=lm_logprobs,
        exit_logprob=exit_logprob,
        lm_scale=lm_scale,
        word_insertion_penalty=word_insertion_penalty,
        lm_initial=lm_initial,
    )
    log_b = composed_emissions(vocab, frames)
    T = log_b.shape[0]
    W = vocab.trans.shape[0]
    S = vocab.trans.shape[-1]

    if engine == "dense":
        if final_states is not None:
            raise ValueError(
                "decode_continuous: heterogeneous final_states require the "
                "blocks engine"
            )
        graph = compose_word_loop(vocab, **kwargs)
        final, bps = token_passing(graph, log_b, n_best=n_best)
        final = np.asarray(final)
        bps = np.asarray(bps)
        out = []
        seen = set()
        for r in range(n_best * len(np.asarray(graph.exit_states))):
            score, words, spans = backtrace_words(graph, final, bps, T, rank=r)
            key = tuple(words)
            if key not in seen and np.isfinite(score):
                seen.add(key)
                out.append((score, words, spans))
            if len(out) >= n_best:
                break
        return out

    graph = compose_word_loop_blocks(vocab, final_states=final_states, **kwargs)
    final, bps = token_passing_blocks(graph, log_b, n_best=n_best)
    fin = np.asarray(final)  # (W*S, K); bps stays on device for backtrace
    K = fin.shape[1]
    ex_off = (
        np.full(W, S - 1)
        if final_states is None
        else np.asarray(final_states)
    )
    exit_states = np.arange(W) * S + ex_off
    ends = [(fin[s, k], s, k) for s in exit_states for k in range(K)]
    ends.sort(key=lambda x: -x[0])
    out = []
    seen = set()
    for score, s, k in ends:
        if not np.isfinite(score):
            continue
        path = np.asarray(
            backtrace_path_device(
                bps, jnp.asarray(s, jnp.int32), jnp.asarray(k, jnp.int32)
            )
        )
        words, spans = _words_from_path(path[:T], S, exit_off=ex_off)
        key = tuple(words)
        if key not in seen:
            seen.add(key)
            out.append((float(score), words, spans))
        if len(out) >= n_best:
            break
    return out


@jax.jit
def backtrace_batch_device(bps: jax.Array, states: jax.Array) -> jax.Array:
    """Batched device-side backtrace for the fused decode kernel's
    (T, W*S, B) source-row backpointer lattice: follow each lane's chain
    from its final state.  bps[0] is the identity frame (unused as a
    pointer); rows at t >= length are identity, so padded frames keep the
    state constant.  Returns the (T, B) state paths."""

    def step(s, bp_t):  # s: (B,) current states; bp_t: (N, B)
        flat = jnp.take_along_axis(bp_t.T, s[:, None], axis=1)[:, 0]
        return flat, s

    s0, rest = jax.lax.scan(step, states.astype(jnp.int32), bps[1:], reverse=True)
    return jnp.concatenate([s0[None], rest], axis=0)  # (T, B)


def _pad_vocab_states(vocab: GmmHmm, s_pad: int) -> GmmHmm:
    """Pad every word of a stacked vocabulary to s_pad states.  Filler
    states are unreachable (no arcs from real states; self-loop 1.0 keeps
    rows stochastic) with benign unit-weight mixture-0 emissions — the
    pad_stack_models filler recipe applied uniformly to an
    already-stacked model.  Used by token_passing_fused to make bigram
    vocabularies s_word % 8 == 0 for the fused kernel's layout-free
    (W, S, B) splits; the exit_col operand keeps the REAL exit row
    (S-1) live."""
    from ..models import GmmStream

    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    assert s_pad >= S
    dtype = np.asarray(vocab.trans).dtype
    trans = np.zeros((W, s_pad, s_pad), dtype)
    trans[:, :S, :S] = np.asarray(vocab.trans)
    for s in range(S, s_pad):
        trans[:, s, s] = 1.0
    new_streams = []
    for st in vocab.streams:
        M, D = st.num_mixtures, st.dim
        w = np.zeros((W, s_pad, M), dtype)
        w[:, :S] = np.asarray(st.weights)
        w[:, S:, 0] = 1.0
        mu = np.zeros((W, s_pad, M, D), dtype)
        mu[:, :S] = np.asarray(st.means)
        det = np.ones((W, s_pad, M), dtype)
        det[:, :S] = np.asarray(st.det)
        ld = np.zeros((W, s_pad, M), dtype)
        ld[:, :S] = np.asarray(st.log_abs_det())
        if st.cov_type == "full":
            ic = np.tile(np.eye(D, dtype=dtype), (W, s_pad, M, 1, 1))
            ic[:, :S] = np.asarray(st.inv_cov)
        else:
            ic = np.ones((W, s_pad, M, D), dtype)
            ic[:, :S] = np.asarray(st.inv_cov)
        new_streams.append(
            GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(mu),
                inv_cov=jnp.asarray(ic),
                det=jnp.asarray(det),
                cov_type=st.cov_type,
                log_det=jnp.asarray(ld),
            )
        )
    return GmmHmm(
        trans=jnp.asarray(trans), streams=tuple(new_streams), word=vocab.word
    )


def token_passing_fused(
    vocab: GmmHmm,
    graph: BlockGraph,
    batch,
    k_block: int = 4,
    interpret: bool | None = None,
):
    """Batched word-loop Viterbi on the fused lane-major decode kernel
    (ops/pallas/decode_pallas.py): emissions + block-banded (max, +)
    recursion + cross-word merge in ONE kernel over all utterances, the
    backpointer lattice as the only large HBM write.

    batch: UtteranceBatch (B, T, D), or a TUPLE of per-stream batches for
    MULTI-STREAM vocabularies (round 5: per-stream in-kernel emission
    sums, the reference's product-of-streams semantics R2:352-358);
    homogeneous diag/full covariance; n_best=1.  Unigram-decomposable cross arcs (graph.arc rows identical —
    uniform/unigram LMs) use the O(W*S) reduction; genuine BIGRAM arcs run
    the in-kernel (W, W) (max, +) contraction (round 4).  Bigram
    vocabularies whose state count is not a multiple of 8 are
    AUTO-PADDED with unreachable filler states (round 4: the kernel's
    exit_col operand keeps the real exit row live), so outputs come back
    in s_eff = padded state space.  Only a bigram W^2 working set past
    the VMEM budget (W <= ~256 at B=128) still raises — callers keep the
    XLA engine.  Returns (final (W*s_eff, B) scores, bps
    (T, W*s_eff, B) int32, both trimmed to the original B, s_eff) —
    s_eff == S except for the padded-bigram case; row r encodes
    word r // s_eff, state r % s_eff."""
    from ..ops.pallas.decode_pallas import NEG_INF as DNEG
    from ..ops.pallas.decode_pallas import word_loop_decode_pallas
    from ..ops.pallas.scoring_pallas import pack_vocab_constants

    batches = batch if isinstance(batch, (tuple, list)) else (batch,)
    P_s = len(vocab.streams)
    if len(batches) != P_s:
        raise ValueError(
            f"token_passing_fused: {P_s} streams need {P_s} feature batches"
        )
    cov_types = {st.cov_type for st in vocab.streams}
    if cov_types - {"diag", "full"} or len(cov_types) != 1:
        raise ValueError(
            "token_passing_fused: homogeneous diag/full-cov streams only"
        )
    cov = vocab.streams[0].cov_type
    if cov == "full":
        # the d-major z-GEMM's (D*M*nb_pad, B) working sets (~2 live f32
        # planes per stream) must fit VMEM next to the carries/backpointer
        # window
        _N8 = -(-(vocab.trans.shape[0] * vocab.trans.shape[-1]) // 8) * 8
        zbytes = sum(
            st.dim * st.num_mixtures * _N8 * 128 * 4 * 2
            for st in vocab.streams
        )
        if zbytes > 48 * 1024 * 1024:
            raise ValueError(
                "token_passing_fused: full-cov z-GEMM working set exceeds the VMEM "
                "budget — use the XLA engine"
            )
    arc = np.asarray(graph.arc, np.float64)
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    unigram = bool(np.allclose(arc, arc[0:1]))
    s_eff = S
    if not unigram:
        if W * W * 128 * 4 * 2 > 48 * 1024 * 1024:
            raise ValueError(
                "token_passing_fused: bigram W^2 working set exceeds the "
                "VMEM budget — use token_passing_blocks"
            )
        if S % 8 != 0:
            s_eff = -(-S // 8) * 8
            vocab = _pad_vocab_states(vocab, s_eff)
    N = W * s_eff
    lengths = batches[0].lengths
    B, T = batches[0].features.shape[:2]
    pad_b = (-B) % 128
    pad_t = (-T) % k_block
    featss = [b.features for b in batches]
    if pad_b or pad_t:
        featss = [
            jnp.pad(f, ((0, pad_b), (0, pad_t), (0, 0))) for f in featss
        ]
        lengths = jnp.pad(lengths, (0, pad_b))

    packs = [
        pack_vocab_constants(vocab, jnp.float32, stream=p)
        for p in range(P_s)
    ]
    band = packs[0][5]
    a = tuple(pk[0] for pk in packs)
    bias = tuple(pk[2] for pk in packs)
    diag = packs[0][4]
    if cov == "full":
        bias_g = tuple(pk[1] for pk in packs)
        logw = tuple(pk[3] for pk in packs)
    else:
        bias_g = logw = (None,) * P_s
    if P_s == 1:
        a, bias, bias_g, logw = a[0], bias[0], bias_g[0], logw[0]
    entry_rows = np.arange(W) * s_eff
    if unigram:
        arc_col = np.full((N, 1), DNEG)
        arc_col[entry_rows, 0] = arc[0]
    else:
        arc_col = np.maximum(arc, DNEG)  # (W, W) bigram matrix
    entry_col = np.full((N, 1), DNEG)
    entry_col[entry_rows, 0] = np.asarray(graph.log_entry, np.float64)
    ex_off = (
        None if graph.exit_states is None else np.asarray(graph.exit_states)
    )
    exit_col = None
    if s_eff != S or ex_off is not None:
        off = ex_off if ex_off is not None else np.full(W, S - 1)
        ec = np.full((N, 1), DNEG)
        ec[np.arange(W) * s_eff + off, 0] = 0.0
        exit_col = jnp.asarray(ec, jnp.float32)

    feats_tdb = tuple(
        jnp.transpose(f.astype(jnp.float32), (1, 2, 0)) for f in featss
    )
    if P_s == 1:
        feats_tdb = feats_tdb[0]
    final, bps = word_loop_decode_pallas(
        feats_tdb, a, bias, diag,
        jnp.asarray(arc_col, jnp.float32),
        jnp.asarray(entry_col, jnp.float32),
        lengths, s_word=s_eff, band=band, k_block=k_block,
        exit_col=exit_col, bias_g=bias_g, logw=logw, interpret=interpret,
    )
    return final[:, :B], bps[:, :, :B], s_eff


def _fused_stream_checks(vocab: GmmHmm, batch, name: str):
    """Shared multi-stream validation for the fused decode wrappers
    (round 5): returns (batches tuple, cov type).  Homogeneous diag/full
    streams; one UtteranceBatch per stream; full-cov z-GEMM working sets
    summed over streams against the VMEM budget."""
    batches = batch if isinstance(batch, (tuple, list)) else (batch,)
    P_s = len(vocab.streams)
    if len(batches) != P_s:
        raise ValueError(f"{name}: {P_s} streams need {P_s} feature batches")
    cov_types = {st.cov_type for st in vocab.streams}
    if cov_types - {"diag", "full"} or len(cov_types) != 1:
        raise ValueError(f"{name}: homogeneous diag/full-cov streams only")
    cov = vocab.streams[0].cov_type
    if cov == "full":
        _N8 = -(-(vocab.trans.shape[0] * vocab.trans.shape[-1]) // 8) * 8
        zbytes = sum(
            st.dim * st.num_mixtures * _N8 * 128 * 4 * 2
            for st in vocab.streams
        )
        if zbytes > 48 * 1024 * 1024:
            raise ValueError(
                f"{name}: full-cov z-GEMM working set exceeds the VMEM "
                "budget — use the XLA engine"
            )
    return tuple(batches), cov


def _fused_emission_inputs(vocab: GmmHmm, batches, cov, k_block):
    """Per-stream padded feats + packed constants for the fused decode
    wrappers; tuples collapse to bare arrays for single-stream vocabs
    (the kernels' P=1 layout).  Returns (feats_tdb, lengths, B, a, bias,
    bias_g, logw, diag, band)."""
    from ..ops.pallas.scoring_pallas import pack_vocab_constants

    lengths = batches[0].lengths
    B, T = batches[0].features.shape[:2]
    pad_b = (-B) % 128
    pad_t = (-T) % k_block
    featss = [b.features for b in batches]
    if pad_b or pad_t:
        featss = [
            jnp.pad(f, ((0, pad_b), (0, pad_t), (0, 0))) for f in featss
        ]
        lengths = jnp.pad(lengths, (0, pad_b))
    P_s = len(batches)
    packs = [
        pack_vocab_constants(vocab, jnp.float32, stream=p)
        for p in range(P_s)
    ]
    band = packs[0][5]
    diag = packs[0][4]
    a = tuple(pk[0] for pk in packs)
    bias = tuple(pk[2] for pk in packs)
    if cov == "full":
        bias_g = tuple(pk[1] for pk in packs)
        logw = tuple(pk[3] for pk in packs)
    else:
        bias_g = logw = (None,) * P_s
    feats_tdb = tuple(
        jnp.transpose(f.astype(jnp.float32), (1, 2, 0)) for f in featss
    )
    if P_s == 1:
        feats_tdb, a, bias = feats_tdb[0], a[0], bias[0]
        bias_g, logw = bias_g[0], logw[0]
    return feats_tdb, lengths, B, a, bias, bias_g, logw, diag, band


def token_passing_fused_k2(
    vocab: GmmHmm,
    graph: BlockGraph,
    batch,
    k_block: int = 4,
    interpret: bool | None = None,
):
    """Batched n_best=2 word-loop Viterbi on the fused K=2 decode kernel
    (ops/pallas/decode_pallas.py word_loop_decode_k2_pallas) — two token
    planes per state, in-kernel top-2 merges; unigram-decomposable AND
    (round 4) genuine bigram arcs, the latter auto-padding state counts
    to a multiple of 8 as in token_passing_fused.  Returns (final
    (2, W*s_eff, B) scores, bps (T, 2, W*s_eff, B) int32 flat src*2+k
    backpointers, trimmed to the original B, s_eff)."""
    from ..ops.pallas.decode_pallas import NEG_INF as DNEG
    from ..ops.pallas.decode_pallas import word_loop_decode_k2_pallas

    batches, cov = _fused_stream_checks(vocab, batch, "token_passing_fused_k2")
    arc = np.asarray(graph.arc, np.float64)
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    unigram = bool(np.allclose(arc, arc[0:1]))
    s_eff = S
    if not unigram:
        if W * W * 128 * 4 * 2 > 48 * 1024 * 1024:
            raise ValueError(
                "token_passing_fused_k2: bigram W^2 working set exceeds "
                "the VMEM budget — use token_passing_blocks"
            )
        if W * W * 128 * 4 > 4 * 1024 * 1024:
            # the per-plane (W, W, B) contraction temporaries leave no
            # VMEM headroom for a double-buffered multi-frame bp window
            # (W=200 at k_block=4 exceeds the 128 MB capacity by 17 MB;
            # k_block=1 fits and costs ~nothing — the kernel is
            # VPU-bound, not grid-overhead-bound, at this size)
            k_block = 1
        if S % 8 != 0:
            s_eff = -(-S // 8) * 8
            vocab = _pad_vocab_states(vocab, s_eff)
    N = W * s_eff
    (feats_tdb, lengths, B, a, bias, bias_g, logw, diag, band) = (
        _fused_emission_inputs(vocab, batches, cov, k_block)
    )
    entry_rows = np.arange(W) * s_eff
    if unigram:
        arc_col = np.full((N, 1), DNEG)
        arc_col[entry_rows, 0] = arc[0]
    else:
        arc_col = np.maximum(arc, DNEG)  # (W, W) bigram matrix
    entry_col = np.full((N, 1), DNEG)
    entry_col[entry_rows, 0] = np.asarray(graph.log_entry, np.float64)
    ex_off = (
        None if graph.exit_states is None else np.asarray(graph.exit_states)
    )
    exit_col = None
    if s_eff != S or ex_off is not None:
        off = ex_off if ex_off is not None else np.full(W, S - 1)
        ec = np.full((N, 1), DNEG)
        ec[np.arange(W) * s_eff + off, 0] = 0.0
        exit_col = jnp.asarray(ec, jnp.float32)

    final, bps = word_loop_decode_k2_pallas(
        feats_tdb, a, bias, diag,
        jnp.asarray(arc_col, jnp.float32),
        jnp.asarray(entry_col, jnp.float32),
        lengths, s_word=s_eff, band=band, k_block=k_block,
        exit_col=exit_col, bias_g=bias_g, logw=logw, interpret=interpret,
    )
    return final[:, :, :B], bps[:, :, :, :B], s_eff


def token_passing_fused_kn(
    vocab: GmmHmm,
    graph: BlockGraph,
    batch,
    n_best: int,
    k_block: int = 2,
    w_blk: int | None = None,
    interpret: bool | None = None,
):
    """Batched general n_best=K word-loop Viterbi on the fused K-slot
    kernel (ops/pallas/decode_pallas.py word_loop_decode_kn_pallas) —
    unigram-decomposable AND genuine bigram arcs, the latter
    auto-padding state counts.  Round 5: the kernel tiles the bigram
    take-counter's destination axis (w_blk, auto-chosen from the VMEM
    budget), so W=200-class bigram K>2 graphs run fused — only graphs
    needing > 64 destination blocks keep the XLA engine (compile-time
    unroll cap).  K=2 callers should prefer token_passing_fused_k2.
    Returns (final (K, W*s_eff, B), bps (T, K, W*s_eff, B) int32 flat
    src*K + k, trimmed to the original B, s_eff)."""
    from ..ops.pallas.decode_pallas import NEG_INF as DNEG
    from ..ops.pallas.decode_pallas import word_loop_decode_kn_pallas

    batches, cov = _fused_stream_checks(vocab, batch, "token_passing_fused_kn")
    arc = np.asarray(graph.arc, np.float64)
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    unigram = bool(np.allclose(arc, arc[0:1]))
    s_eff = S
    if not unigram:
        # round 5: the kernel tiles the destination axis, so the (W, W, B)
        # take-counter plane no longer gates W directly — only the
        # destination-block COUNT (statically unrolled per frame) is
        # capped so Mosaic compile time stays bounded
        _B128 = -(-batches[0].features.shape[0] // 128) * 128
        _cap = max(1, (24 * 1024 * 1024) // (16 * W * _B128))
        _w_blk = max(d for d in range(1, W + 1) if W % d == 0 and d <= _cap)
        if W // _w_blk > 64:
            raise ValueError(
                "token_passing_fused_kn: bigram destination tiling would "
                "unroll > 64 blocks at this (W, B) — use "
                "token_passing_blocks"
            )
        if S % 8 != 0:
            s_eff = -(-S // 8) * 8
            vocab = _pad_vocab_states(vocab, s_eff)
        k_block = 1
    N = W * s_eff
    (feats_tdb, lengths, B, a, bias, bias_g, logw, diag, band) = (
        _fused_emission_inputs(vocab, batches, cov, k_block)
    )
    entry_rows = np.arange(W) * s_eff
    if unigram:
        arc_col = np.full((N, 1), DNEG)
        arc_col[entry_rows, 0] = arc[0]
    else:
        arc_col = np.maximum(arc, DNEG)  # (W, W) bigram matrix
    entry_col = np.full((N, 1), DNEG)
    entry_col[entry_rows, 0] = np.asarray(graph.log_entry, np.float64)
    ex_off = (
        None if graph.exit_states is None else np.asarray(graph.exit_states)
    )
    exit_col = None
    if s_eff != S or ex_off is not None:
        off = ex_off if ex_off is not None else np.full(W, S - 1)
        ec = np.full((N, 1), DNEG)
        ec[np.arange(W) * s_eff + off, 0] = 0.0
        exit_col = jnp.asarray(ec, jnp.float32)

    final, bps = word_loop_decode_kn_pallas(
        feats_tdb, a, bias, diag,
        jnp.asarray(arc_col, jnp.float32),
        jnp.asarray(entry_col, jnp.float32),
        lengths, s_word=s_eff, band=band, n_best=n_best, k_block=k_block,
        exit_col=exit_col, bias_g=bias_g, logw=logw, w_blk=w_blk,
        interpret=interpret,
    )
    return final[:, :, :B], bps[:, :, :, :B], s_eff


def decode_continuous_batch(
    vocab: GmmHmm,
    batch,
    lm_logprobs: np.ndarray | None = None,
    exit_logprob: float = float(np.log(0.1)),
    lm_scale: float = 1.0,
    word_insertion_penalty: float = 0.0,
    lm_initial: np.ndarray | None = None,
    k_block: int = 4,
    n_best: int = 1,
    final_states: np.ndarray | None = None,
    interpret: bool | None = None,
):
    """Batched end-to-end continuous decode: ALL utterances of a padded
    batch decode in one fused kernel pass (token_passing_fused — unigram
    and, since round 4, bigram LMs) plus one batched device backtrace.
    Falls back to the per-utterance XLA block engine when the fused
    kernel is ineligible (non-diag streams, bigram with s_word % 8 != 0,
    or W^2 past the VMEM budget).

    n_best=1 (default) returns a list over utterances of
    (score, word_ids, word_spans); n_best=2 rides the fused K=2 kernel
    (token_passing_fused_k2; unigram AND bigram arcs since round 4) and
    n_best>=3 the general K-slot kernel (token_passing_fused_kn;
    unigram and, for W within the VMEM gate, bigram arcs — oversized
    bigram K>2 graphs fall back to the per-utterance engine);
    both return a list over utterances of UP TO n_best tuples, best
    first.

    MULTI-STREAM vocabularies (round 5): pass `batch` as a tuple of
    per-stream UtteranceBatch objects (shared lengths, one feature set
    per stream, the reference's R2:331-339 contract) — decoding runs the
    per-utterance XLA block engine with per-stream composed emissions
    summed in log space (R2:352-358 product-of-streams lifted to the
    word loop)."""
    if isinstance(batch, (tuple, list)) and len(vocab.streams) > 1:
        if n_best >= 2:
            # round 5: multi-stream K-best rides the fused K-plane kernels
            # (per-stream in-kernel emission sums); ineligible graphs fall
            # back to the per-utterance engine inside _decode_batch_kn
            return _decode_batch_kn(
                vocab, tuple(batch), lm_logprobs, exit_logprob, lm_scale,
                word_insertion_penalty, lm_initial, k_block, n_best,
                interpret,
            )
        if n_best == 1:
            # round 5: multi-stream rides the fused K=1 kernel (per-stream
            # in-kernel emission sums); ineligible graphs fall through to
            # the per-utterance engine below
            try:
                graph = compose_word_loop_blocks(
                    vocab, lm_logprobs=lm_logprobs,
                    exit_logprob=exit_logprob, lm_scale=lm_scale,
                    word_insertion_penalty=word_insertion_penalty,
                    lm_initial=lm_initial,
                )
                final, bps, s_eff = token_passing_fused(
                    vocab, graph, tuple(batch), k_block=k_block,
                    interpret=interpret,
                )
                W = vocab.trans.shape[0]
                S = vocab.trans.shape[-1]
                fin = np.asarray(final)
                exit_rows = np.arange(W) * s_eff + (S - 1)
                best_states = exit_rows[np.argmax(fin[exit_rows], axis=0)]
                paths = np.asarray(
                    backtrace_batch_device(
                        bps, jnp.asarray(best_states, jnp.int32)
                    )
                )
                lengths_np = np.asarray(batch[0].lengths)
                out = []
                for b in range(fin.shape[1]):
                    L = int(lengths_np[b])
                    if L <= 0:
                        out.append((float("-inf"), [], []))
                        continue
                    words, spans = _words_from_path(
                        paths[:L, b], s_eff, exit_off=S - 1
                    )
                    out.append((float(fin[best_states[b], b]), words, spans))
                return out
            except ValueError:
                pass
        lengths_np = np.asarray(batch[0].lengths)
        out = []
        for b in range(batch[0].features.shape[0]):
            L = int(lengths_np[b])
            if L <= 0:
                out.append((float("-inf"), [], []) if n_best == 1 else [])
                continue
            hyp = decode_continuous(
                vocab,
                tuple(bb.features[b, :L] for bb in batch),
                lm_logprobs=lm_logprobs,
                exit_logprob=exit_logprob,
                lm_scale=lm_scale,
                word_insertion_penalty=word_insertion_penalty,
                lm_initial=lm_initial,
                n_best=n_best,
            )
            out.append(hyp[0] if n_best == 1 else hyp)
        return out
    if n_best >= 2:
        return _decode_batch_kn(
            vocab, batch, lm_logprobs, exit_logprob, lm_scale,
            word_insertion_penalty, lm_initial, k_block, n_best, interpret,
            final_states=final_states,
        )
    if n_best != 1:
        raise ValueError("decode_continuous_batch: n_best must be >= 1")
    graph = compose_word_loop_blocks(
        vocab,
        lm_logprobs=lm_logprobs,
        exit_logprob=exit_logprob,
        lm_scale=lm_scale,
        word_insertion_penalty=word_insertion_penalty,
        lm_initial=lm_initial,
        final_states=final_states,
    )
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    try:
        final, bps, s_eff = token_passing_fused(
            vocab, graph, batch, k_block=k_block, interpret=interpret
        )
    except ValueError:
        lengths_np = np.asarray(batch.lengths)
        out = []
        for b in range(batch.features.shape[0]):
            L = int(lengths_np[b])
            if L <= 0:
                out.append((float("-inf"), [], []))
                continue
            frames = batch.features[b, :L]
            hyp = decode_continuous(
                vocab,
                frames,
                lm_logprobs=lm_logprobs,
                exit_logprob=exit_logprob,
                lm_scale=lm_scale,
                word_insertion_penalty=word_insertion_penalty,
                lm_initial=lm_initial,
                n_best=1,
                final_states=final_states,
            )[0]
            out.append(hyp)
        return out
    fin = np.asarray(final)  # (W*s_eff, B)
    ex_off = (
        np.full(W, S - 1)
        if final_states is None
        else np.asarray(final_states)
    )
    exit_rows = np.arange(W) * s_eff + ex_off
    best_states = exit_rows[np.argmax(fin[exit_rows], axis=0)]  # (B,)
    paths = np.asarray(
        backtrace_batch_device(bps, jnp.asarray(best_states, jnp.int32))
    )  # (T, B)
    lengths = np.asarray(batch.lengths)
    out = []
    for b in range(fin.shape[1]):
        L = int(lengths[b])
        if L <= 0:
            out.append((float("-inf"), [], []))
            continue
        words, spans = _words_from_path(paths[:L, b], s_eff, exit_off=ex_off)
        out.append((float(fin[best_states[b], b]), words, spans))
    return out


def _decode_batch_kn(
    vocab, batch, lm_logprobs, exit_logprob, lm_scale,
    word_insertion_penalty, lm_initial, k_block, n_best, interpret,
    final_states=None,
):
    """n_best=K batched decode on the fused K-plane kernels: the flat
    n*K+k token-id space makes backtrace_batch_device directly
    reusable — transpose the (T, K, N, B) backpointers to (T, N, K, B)
    and flatten, so pointer entries and row indices share the
    id = n*K+k encoding.  K=2 rides token_passing_fused_k2; K>=3 the
    general K-slot kernel."""
    K = n_best
    graph = compose_word_loop_blocks(
        vocab,
        lm_logprobs=lm_logprobs,
        exit_logprob=exit_logprob,
        lm_scale=lm_scale,
        word_insertion_penalty=word_insertion_penalty,
        lm_initial=lm_initial,
        final_states=final_states,
    )
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    try:
        if K == 2:
            try:
                final, bps, s_eff = token_passing_fused_k2(
                    vocab, graph, batch, k_block=k_block, interpret=interpret
                )  # (2, N, B), (T, 2, N, B) with N = W * s_eff
            except ValueError:
                # round 5: oversized-W bigram K=2 rides the K-slot kernel
                # (its take counter is destination-tiled) before giving up
                final, bps, s_eff = token_passing_fused_kn(
                    vocab, graph, batch, n_best=2,
                    k_block=max(1, min(k_block, 4)), interpret=interpret,
                )
        else:
            final, bps, s_eff = token_passing_fused_kn(
                vocab, graph, batch, n_best=K,
                k_block=max(1, min(k_block, 8 // K)), interpret=interpret,
            )
    except ValueError:  # ineligible graph: per-utterance XLA engine
        batches = batch if isinstance(batch, (tuple, list)) else (batch,)
        lengths_np = np.asarray(batches[0].lengths)
        out = []
        for b in range(batches[0].features.shape[0]):
            L = int(lengths_np[b])
            if L <= 0:
                out.append([])
                continue
            frames = tuple(bb.features[b, :L] for bb in batches)
            out.append(
                decode_continuous(
                    vocab,
                    frames if len(batches) > 1 else frames[0],
                    lm_logprobs=lm_logprobs,
                    exit_logprob=exit_logprob,
                    lm_scale=lm_scale,
                    word_insertion_penalty=word_insertion_penalty,
                    lm_initial=lm_initial,
                    n_best=K,
                    final_states=final_states,
                )
            )
        return out
    N = W * s_eff
    T = bps.shape[0]
    B = final.shape[-1]
    # flat id space: id = n*K + k
    scores_flat = jnp.transpose(final, (1, 0, 2)).reshape(K * N, B)
    bp_flat = jnp.transpose(bps, (0, 2, 1, 3)).reshape(T, K * N, B)
    row = jnp.arange(K * N)[:, None]
    _W = N // s_eff
    _ex = (
        np.full(_W, S - 1) if final_states is None else np.asarray(final_states)
    )
    _ex_j = jnp.asarray(_ex, jnp.int32)
    is_exit = ((row // K) % s_eff) == _ex_j[(row // K) // s_eff]
    masked = jnp.where(is_exit, scores_flat, -jnp.inf)
    # the engine dedupes hypotheses by WORD SEQUENCE, so the two returned
    # hypotheses may come from deeper than the top-2 exit tokens: rank the
    # top-R candidates, backtrace them all in one batched scan, dedupe on
    # the host (R = all 2W exit tokens, matching decode_continuous exactly)
    R = K * W
    ranked = jnp.argsort(-masked, axis=0)[:R]  # (R, B) candidate ids

    def _bt_step(s, bp_t):  # s: (R, B); bp_t: (K*N, B)
        nxt = jnp.take_along_axis(bp_t, s, axis=0)
        return nxt, s

    s0, rest = jax.lax.scan(
        _bt_step, ranked.astype(jnp.int32), bp_flat[1:], reverse=True
    )
    paths = np.asarray(
        jnp.concatenate([s0[None], rest], axis=0)
    )  # (T, R, B) token-id paths
    sc = np.asarray(scores_flat)
    ranked_np = np.asarray(ranked)
    b0 = batch[0] if isinstance(batch, (tuple, list)) else batch
    lengths = np.asarray(b0.lengths)
    out = []
    for b in range(b0.features.shape[0]):
        L = int(lengths[b])
        hyps = []
        seen = set()
        if L > 0:
            for r in range(R):
                cid = int(ranked_np[r, b])
                score = float(sc[cid, b])
                if not np.isfinite(score):
                    break
                states = paths[:L, r, b] // K  # token id -> composed state
                words, spans = _words_from_path(states, s_eff, exit_off=_ex)
                key = tuple(words)
                if key not in seen:
                    seen.add(key)
                    hyps.append((score, words, spans))
                if len(hyps) >= K:
                    break
        out.append(hyps)
    return out
