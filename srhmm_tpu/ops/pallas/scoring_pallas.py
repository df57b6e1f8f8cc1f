"""Fused lane-major vocabulary scoring kernel (Pallas, TPU).

Scores EVERY utterance of a padded batch against EVERY word of a stacked
vocabulary in one kernel — the whole isolated-word recognition compute
(the reference's quadruple loop with its 13x redundant .perfil re-reads,
recognition-fs/recognition_continuous_fs.c:283-369) as a single pass over
the features.

Layout follows ops/pallas/fused_em_pallas.py (batch on the 128 lanes),
with the vocabulary stacked on the sublane axis: the carry is the
(W*S, B) log-alpha of ALL words at once, and the banded left-right update
runs over the band+1 diagonals with a BLOCK-banded shift mask
((row % S) >= d), so word boundaries never leak into each other.  Per
frame: M MXU GEMMs (Nb, 2D) x (2D, B) for the block's per-mixture
log-likelihoods, a per-state mixture logsumexp, and the banded recursion
— under the (logsumexp, +) semiring for forward scores (the reference's
scoring) or (max, +) for Viterbi scores.  Nothing but the final (W*S, B)
log-alpha is written to HBM: reading the T-frame features is the only
large I/O.

Large vocabularies block over W on an outer PARALLEL grid axis (the time
axis iterates innermost, so each word-block's carry lives across its time
sweep); features are re-read once per word block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.gmm_hmm import DIAG, GmmHmm

NEG_INF = -1e30
_TINY = 1e-38


def pack_vocab_constants(vocab: GmmHmm, dtype=jnp.float32):
    """Packed GEMM constants for a stacked single-stream diag vocabulary.

    Returns (a: (M, W*S, 2D), bias: (M, W*S, 1), diag: (band+1, W*S, 1),
    band) with rows ordered (w, s) within each mixture plane, so a word
    block is a contiguous sublane slice."""
    import math

    import numpy as np

    stream = vocab.streams[0]
    if stream.cov_type != DIAG:
        raise ValueError("pack_vocab_constants: diagonal covariance only")
    mu = stream.means.astype(jnp.float64)  # (W, S, M, D)
    k = stream.inv_cov.astype(jnp.float64)
    w = stream.weights.astype(jnp.float64)
    log_det = stream.log_abs_det().astype(jnp.float64)
    W, S, M, D = mu.shape
    N = W * S
    a = jnp.concatenate([mu * k, -0.5 * k], axis=-1)  # (W, S, M, 2D)
    a = jnp.transpose(a, (2, 0, 1, 3)).reshape(M, N, 2 * D)
    bias = (
        -0.5 * jnp.sum(mu * mu * k, axis=-1)
        + jnp.log(jnp.maximum(w, 1e-300))
        - 0.5 * (D * math.log(2.0 * math.pi) + log_det)
    )  # (W, S, M)
    bias = jnp.transpose(bias, (2, 0, 1)).reshape(M, N, 1)

    # block-banded diagonals of the per-word transition matrices:
    # diag[d][w*S + j] = log trans_w[j-d, j] (rows with j < d are NEG_INF)
    trans = np.asarray(vocab.trans, np.float64)  # (W, S, S)
    from .fused_em_pallas import trans_band

    band = trans_band(trans)
    if band is None:
        raise ValueError("pack_vocab_constants: left-right (banded) models only")
    with np.errstate(divide="ignore"):
        lt = np.where(trans > 0, np.log(np.maximum(trans, 1e-300)), NEG_INF)
    j = np.arange(S)
    diag = np.full((band + 1, W, S), NEG_INF)
    for d in range(band + 1):
        cols = j[d:]
        diag[d, :, cols] = lt[:, cols - d, cols].T  # (W, S-d)
    diag = diag.reshape(band + 1, N, 1)
    return (
        a.astype(dtype),
        jnp.maximum(bias, NEG_INF).astype(dtype),
        jnp.asarray(np.maximum(diag, NEG_INF), dtype),
        band,
    )


def _score_kernel(
    n_mix, k_block, band, s_word, semiring,
    feats_ref, a_ref, bias_ref, diag_ref, len_ref,
    out_ref,
    la_ref,
):
    """Grid (word_blocks, time_blocks), time innermost.  Block shapes:
    feats (k_block, D, B); a (M, Nb, 2D); bias (M, Nb, 1);
    diag (band+1, Nb, 1); out (Nb, B); scratch la (Nb, B)."""
    tb = pl.program_id(1)
    Nb = la_ref.shape[0]
    B = la_ref.shape[1]
    lens = len_ref[:]  # (1, B)
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    row_in_word = jax.lax.broadcasted_iota(jnp.int32, (Nb, B), 0) % jnp.int32(
        s_word
    )

    for k in range(k_block):
        x = feats_ref[k]  # (D, B)
        lift = jnp.concatenate([x, x * x], axis=0)
        q0 = (
            jnp.dot(a_ref[0], lift, preferred_element_type=jnp.float32)
            + bias_ref[0]
        )
        m_s = jnp.maximum(q0, neg)
        qs = [q0]
        for m in range(1, n_mix):
            qm = (
                jnp.dot(a_ref[m], lift, preferred_element_type=jnp.float32)
                + bias_ref[m]
            )
            qs.append(qm)
            m_s = jnp.maximum(m_s, qm)
        e = jnp.exp(qs[0] - m_s)
        for m in range(1, n_mix):
            e = e + jnp.exp(qs[m] - m_s)
        log_b = jnp.log(jnp.maximum(e, tiny)) + m_s  # (Nb, B)

        def first():
            start = jnp.where(row_in_word == 0, jnp.float32(0.0), neg)
            return jnp.maximum(start + log_b, neg)

        def rest():
            carry = la_ref[:]
            # block-banded shift: y[j] = carry[j-d], NEG_INF where the
            # shift would cross a word boundary (row % S < d)
            terms = []
            for d in range(band + 1):
                if d == 0:
                    sh = carry
                else:
                    sh = pltpu.roll(carry, shift=jnp.int32(d), axis=0)
                    sh = jnp.where(row_in_word >= d, sh, neg)
                terms.append(sh + diag_ref[d])
            if semiring == "max":
                upd = terms[0]
                for t_ in terms[1:]:
                    upd = jnp.maximum(upd, t_)
                upd = jnp.maximum(upd, neg)
            else:
                m = terms[0]
                for t_ in terms[1:]:
                    m = jnp.maximum(m, t_)
                m = jnp.maximum(m, neg)
                e2 = jnp.exp(terms[0] - m)
                for t_ in terms[1:]:
                    e2 = e2 + jnp.exp(t_ - m)
                upd = jnp.maximum(jnp.log(jnp.maximum(e2, tiny)) + m, neg)
            return jnp.maximum(upd + log_b, neg)

        if k == 0:
            new = jax.lax.cond(tb == 0, first, rest)
        else:
            new = rest()
        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t
        if k == 0:
            keep = keep | (tb == 0)
        la_ref[:] = jnp.where(keep, new, la_ref[:])

    out_ref[:] = la_ref[:]


@partial(jax.jit, static_argnames=("k_block", "w_block", "band", "s_word", "semiring", "interpret"))
def vocab_scores_pallas(
    feats_tdb: jax.Array,
    a: jax.Array,
    bias: jax.Array,
    diag: jax.Array,
    lengths: jax.Array,
    s_word: int,
    band: int,
    k_block: int = 32,
    w_block: int | None = None,
    semiring: str = "sum",
    interpret: bool | None = None,
) -> jax.Array:
    """(T, D, B) features + packed vocab constants -> (W*S, B) final
    log-alpha of every word at every utterance's last valid frame.

    semiring: "sum" = forward scores (reference scoring); "max" = Viterbi.
    w_block: words per grid block (None = whole vocabulary in one block).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, D, B = feats_tdb.shape
    M, N, twoD = a.shape
    assert twoD == 2 * D and N % s_word == 0 and T % k_block == 0
    W = N // s_word
    if w_block is None:
        w_block = W
    assert W % w_block == 0
    Nb = w_block * s_word
    nw = W // w_block
    nt = T // k_block
    lens = lengths.astype(jnp.float32).reshape(1, B)

    return pl.pallas_call(
        partial(_score_kernel, M, k_block, band, s_word, semiring),
        grid=(nw, nt),
        in_specs=[
            # NOTE: index maps must not return Python-int literals — under
            # jax_enable_x64 they become i64 and Mosaic cannot legalize the
            # index function's return; derive zeros from the i32 grid ids
            pl.BlockSpec((k_block, D, B), lambda wb, tb: (tb, 0 * tb, 0 * tb), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Nb, twoD), lambda wb, tb: (0 * wb, wb, 0 * wb), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Nb, 1), lambda wb, tb: (0 * wb, wb, 0 * wb), memory_space=pltpu.VMEM),
            pl.BlockSpec((band + 1, Nb, 1), lambda wb, tb: (0 * wb, wb, 0 * wb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda wb, tb: (0 * wb, 0 * wb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Nb, B), lambda wb, tb: (wb, 0 * wb), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Nb, B), jnp.float32)],
        interpret=interpret,
    )(feats_tdb.astype(jnp.float32), a, bias, diag, lens)


def score_batch_fused_lane(
    vocab: GmmHmm,
    batch,
    mode: str = "total",
    semiring: str = "sum",
    k_block: int = 32,
    w_block: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, W) scores of every utterance against every word on the fused
    lane-major scoring kernel — drop-in for decode.scorer.score_batch_log
    on TPU for single-stream diagonal vocabularies.

    mode: "total" (R1, logsumexp over states) or "final" (R2, last state).
    semiring="max" gives Viterbi (best-path) scores instead of forward.
    """
    stream = vocab.streams[0]
    if len(vocab.streams) != 1 or stream.cov_type != DIAG:
        raise ValueError("score_batch_fused_lane: single diag stream only")
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    M = stream.num_mixtures
    feats = batch.features
    B, T, D = feats.shape
    while T % k_block:
        k_block //= 2
    if w_block is None:
        # keep the per-frame working set (M q-planes of (Nb, B)) modest:
        # larger blocks inflate Mosaic compile time and VMEM pressure
        target = max(1, 512 // (S * max(M, 1)))
        w_block = max(d for d in range(1, W + 1) if W % d == 0 and d <= target)
    # Mosaic compile time scales with the statically-unrolled op count
    # ~ k_block * Nb * M; cap it near the measured-fast regime (~2.5k)
    while k_block > 8 and k_block * w_block * S * max(M, 1) > 4096:
        k_block //= 2
    while T % k_block:
        k_block //= 2
    a, bias, diag, band = pack_vocab_constants(vocab, jnp.float32)
    feats_tdb = jnp.transpose(feats.astype(jnp.float32), (1, 2, 0))
    la = vocab_scores_pallas(
        feats_tdb, a, bias, diag, batch.lengths, s_word=S, band=band,
        k_block=k_block, w_block=w_block, semiring=semiring,
        interpret=interpret,
    )  # (W*S, B)
    la = la.reshape(W, S, B)
    if mode == "total":
        scores = jax.nn.logsumexp(jnp.maximum(la, NEG_INF), axis=1)  # (W, B)
        scores = jnp.where(scores > NEG_INF / 2, scores, -jnp.inf)
    else:
        scores = jnp.where(
            la[:, S - 1, :] > NEG_INF / 2, la[:, S - 1, :], -jnp.inf
        )
    return scores.T  # (B, W)
