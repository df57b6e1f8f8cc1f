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
log-likelihoods (diagonal covariance), or ONE (D*M*Nb, D) x (D, B) GEMM
building the Cholesky z sum-of-squares (FULL covariance — the
reference's canonical R1 regime, the committed fixture models in
test/test/models/*.hmm scored by
recognition-full-fs/recognition_continuous_full_fs.c:822-836, rides the
fused scorer too; same z-GEMM formulation as
fused_em_pallas.pack_lane_constants, no cancellation); then a per-state
mixture logsumexp and the banded recursion — under the (logsumexp, +)
semiring for forward scores (the reference's scoring) or (max, +) for
Viterbi scores.  Nothing but the final (W*S, B) log-alpha is written to
HBM: reading the T-frame features is the only large I/O.

Large vocabularies block over W on an outer PARALLEL grid axis (the time
axis iterates innermost, so each word-block's carry lives across its time
sweep); features are re-read once per word block.

All emission GEMMs run at Precision.HIGHEST: the backend's default f32
matmul uses truncated bf16 passes, and at raw feature scale (the .perfil
profiles reach |x| ~ 3e3) that cost ~185 nats on the top-ranked fixture
score and flipped rankings (hardware-debugged round 3; HIGHEST restores
agreement with the XLA scorer to ~2e-4 relative).  The GEMMs are a small
fraction of the kernel, so the extra passes are ~free.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.gmm_hmm import DIAG, FULL, GmmHmm
from .fused_em_pallas import LOG_GAUS_CLAMP

NEG_INF = -1e30
_TINY = 1e-38


def pack_vocab_constants(vocab: GmmHmm, dtype=jnp.float32, stream: int = 0):
    """Packed GEMM constants for ONE stream of a stacked vocabulary
    (stream index `stream`; multi-stream callers pack each stream and
    pass tuples to vocab_scores_pallas).

    Returns (a, bias_g, bias, logw, diag, band) with rows ordered (w, s)
    within each plane, so a word block is a contiguous sublane slice.

    Diagonal covariance: a (M, W*S, 2D) lift rows; bias (M, W*S, 1) with
    the mixture log-weight FOLDED IN (no density clamp on the diag path —
    matches decode.scorer's XLA behavior); bias_g / logw are (1, 1, 1)
    dummies.

    Full covariance: the Cholesky z-GEMM (fused_em_pallas
    .pack_lane_constants, K = L L^T):  a (M*D, W*S, D) with
    a[m*D + d, w*S + s] = row d of L^T for mixture m of state s of word
    w; bias_g (M*D, W*S, 1) = -(L^T mu)_d; bias (M, W*S, 1) the Gaussian
    normalizer alone; logw (M, W*S, 1) the log mixture weight, separate
    so the reference's 1e20 density clamp lands between density and
    weight (calc_gaus R1:902-953 -> calc_symbol_probab R1:855).
    Degenerate mixtures follow pack_lane_constants: non-finite log|det|
    -> NEG_INF bias; finite det but non-PD inverse -> LOG_GAUS_CLAMP.

    The packing math runs in HOST numpy float64, never jnp: the vocab is
    concrete at pack time, and a jnp "float64" silently degrades to f32
    in a process without jax_enable_x64 — on the TPU backend that made
    the f32 Cholesky of the reference fixture inv-covariances (entries
    ~1e3) produce NaNs and kill whole states (hardware-debugged)."""
    import numpy as np

    stream = vocab.streams[stream]
    if stream.cov_type not in (DIAG, FULL):
        raise ValueError("pack_vocab_constants: diag or full covariance")
    mu = np.asarray(stream.means, np.float64)  # (W, S, M, D)
    k = np.asarray(stream.inv_cov, np.float64)
    w = np.asarray(stream.weights, np.float64)
    log_det = np.asarray(stream.log_abs_det(), np.float64)
    W, S, M, D = mu.shape
    N = W * S
    norm = -0.5 * (D * math.log(2.0 * math.pi) + log_det)  # (W, S, M)
    logw = np.log(np.maximum(w, 1e-300))  # (W, S, M)
    if stream.cov_type == FULL:
        # np.linalg.cholesky raises on any non-PD matrix instead of
        # returning NaN blocks — factor each mixture independently
        det_ok = np.isfinite(norm)
        try:  # batched fast path; per-mixture fallback isolates failures
            chol = np.linalg.cholesky(k)
            pd_ok = np.ones((W, S, M), bool)
        except np.linalg.LinAlgError:
            chol = np.zeros_like(k)
            pd_ok = np.zeros((W, S, M), bool)
            for idx in np.ndindex(W, S, M):
                try:
                    chol[idx] = np.linalg.cholesky(k[idx])
                    pd_ok[idx] = True
                except np.linalg.LinAlgError:
                    pass
        ok = pd_ok & det_ok
        zmu = np.einsum("wsmed,wsme->wsmd", chol, mu)  # L^T mu
        chol = np.where(ok[..., None, None], chol, 0.0)
        zmu = np.where(ok[..., None], zmu, 0.0)
        bias = np.where(ok, norm, np.where(det_ok, LOG_GAUS_CLAMP, NEG_INF))
        # a[m*D + d, w*S + s, e] = chol[w, s, m, e, d]  (row d of L^T)
        a = np.transpose(chol, (2, 4, 0, 1, 3)).reshape(M * D, N, D)
        bias_g = -np.transpose(zmu, (2, 3, 0, 1)).reshape(M * D, N, 1)
        bias = np.transpose(bias, (2, 0, 1)).reshape(M, N, 1)
        logw_out = np.transpose(logw, (2, 0, 1)).reshape(M, N, 1)
    else:
        a = np.concatenate([mu * k, -0.5 * k], axis=-1)  # (W, S, M, 2D)
        a = np.transpose(a, (2, 0, 1, 3)).reshape(M, N, 2 * D)
        bias = -0.5 * np.sum(mu * mu * k, axis=-1) + logw + norm
        bias = np.transpose(bias, (2, 0, 1)).reshape(M, N, 1)
        bias_g = np.zeros((1, 1, 1), np.float64)
        logw_out = np.zeros((1, 1, 1), np.float64)

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
        jnp.maximum(bias_g, NEG_INF).astype(dtype),
        jnp.maximum(bias, NEG_INF).astype(dtype),
        jnp.maximum(logw_out, NEG_INF).astype(dtype),
        jnp.asarray(np.maximum(diag, NEG_INF), dtype),
        band,
    )


def _stream_log_b(x, a_ref, bias_g_ref, bias_ref, logw_ref, n_mix, n_dim, Nb, full):
    """Per-stream mixture log-likelihood (Nb, B) for one frame."""
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    clamp = jnp.float32(LOG_GAUS_CLAMP)
    qs = []
    if full:
        # Cholesky z sum-of-squares (module docstring); one
        # (D*M*Nb_pad, D) x (D, B) GEMM, then the all-positive
        # d-slice accumulation.  Every slice offset is a multiple of
        # the 8-sublane tile: each (d, m) plane is padded to nb_pad
        # rows host-side (vocab_scores_pallas) — misaligned sublane
        # slice offsets miscompile on Mosaic (hardware-debugged:
        # offsets at multiples of 78 returned wrong scores while the
        # interpreter was exact).  The 1e20 clamp sits between
        # density and weight (calc_gaus R1:946-949 ->
        # calc_symbol_probab R1:869).
        nb_pad = a_ref.shape[1] // (n_dim * n_mix)
        z = (
            jnp.dot(a_ref[0], x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + bias_g_ref[0]
        )  # (D*M*nb_pad, B)
        z2 = z * z
        mnbp = n_mix * nb_pad
        quad = z2[0:mnbp]
        for d in range(1, n_dim):
            quad = quad + z2[d * mnbp : (d + 1) * mnbp]
        for m in range(n_mix):
            qm = (
                jnp.float32(-0.5) * quad[m * nb_pad : m * nb_pad + Nb]
                + bias_ref[m]
            )
            qs.append(jnp.minimum(qm, clamp) + logw_ref[m])
    else:
        lift = jnp.concatenate([x, x * x], axis=0)
        for m in range(n_mix):
            qs.append(
                jnp.dot(
                    a_ref[m], lift,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + bias_ref[m]
            )
    m_s = jnp.maximum(qs[0], neg)
    for m in range(1, n_mix):
        m_s = jnp.maximum(m_s, qs[m])
    e = jnp.exp(qs[0] - m_s)
    for m in range(1, n_mix):
        e = e + jnp.exp(qs[m] - m_s)
    return jnp.log(jnp.maximum(e, tiny)) + m_s  # (Nb, B)


def _score_kernel(
    n_mixs, n_dims, k_block, band, s_word, semiring, full,
    *refs,
):
    """Grid (word_blocks, time_blocks), time innermost.  One or more
    parameter STREAMS (the reference's product-of-streams scoring,
    R2:352-358 — per-stream mixture logsumexps SUM into one log_b).
    refs: per-stream feats (k_block, D_p, B); per-stream a (M_p, Nb, 2D_p)
    diag | (1, D_p*M_p*Nb_pad, D_p) full (d-major rows, the
    fused_em_pallas._emission_q layout: ONE MXU GEMM per frame, quad
    accumulated over the D contiguous (M*Nb, B) slices); per-stream
    bias_g (full); per-stream bias (M_p, Nb, 1); per-stream logw (full);
    then diag (band+1, Nb, 1); len (1, B); out (Nb, B); scratch la
    (Nb, B)."""
    P = len(n_mixs)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    diag_ref = refs[5 * P]
    len_ref = refs[5 * P + 1]
    out_ref = refs[5 * P + 2]
    la_ref = refs[5 * P + 3]
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
        log_b = None
        for p in range(P):
            lb_p = _stream_log_b(
                feats_refs[p][k], a_refs[p], bias_g_refs[p], bias_refs[p],
                logw_refs[p], n_mixs[p], n_dims[p], Nb, full,
            )
            log_b = lb_p if log_b is None else log_b + lb_p
        # (Nb, B); the recursion's maximum(. , neg) clamps any
        # multi-stream sum underflow

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
    feats_tdb,
    a,
    bias_g,
    bias,
    logw,
    diag: jax.Array,
    lengths: jax.Array,
    s_word: int,
    band: int,
    k_block: int = 32,
    w_block: int | None = None,
    semiring: str = "sum",
    interpret: bool | None = None,
) -> jax.Array:
    """(T, D, B) features + packed vocab constants (pack_vocab_constants)
    -> (W*S, B) final log-alpha of every word at every utterance's last
    valid frame.

    semiring: "sum" = forward scores (reference scoring); "max" = Viterbi.
    w_block: words per grid block (None = whole vocabulary in one block).
    The covariance type is inferred from a's plane width (2D diag, D full).
    MULTI-STREAM (the reference's product-of-streams scoring,
    R2:352-358): pass tuples for feats_tdb / a / bias_g / bias / logw —
    one entry per stream, homogeneous cov type, shared diag."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    multi = isinstance(a, tuple)
    featss = feats_tdb if isinstance(feats_tdb, tuple) else (feats_tdb,)
    a_s = a if multi else (a,)
    bias_gs = bias_g if multi else (bias_g,)
    biass = bias if multi else (bias,)
    logws = logw if multi else (logw,)
    P = len(a_s)
    T, _, B = featss[0].shape
    ds = tuple(f.shape[1] for f in featss)
    N = a_s[0].shape[1]
    fulls = []
    ms = []
    for p in range(P):
        n_planes, n_p, a_w = a_s[p].shape
        assert n_p == N and a_w in (2 * ds[p], ds[p])
        fp = a_w == ds[p] and a_w != 2 * ds[p]
        fulls.append(fp)
        ms.append(n_planes // ds[p] if fp else n_planes)
    assert len(set(fulls)) == 1, "homogeneous covariance across streams"
    full = fulls[0]
    ms = tuple(ms)
    assert T % k_block == 0 and N % s_word == 0
    W = N // s_word
    if w_block is None:
        w_block = W
    assert W % w_block == 0
    Nb = w_block * s_word
    nw = W // w_block
    nt = T // k_block
    lens = lengths.astype(jnp.float32).reshape(1, B)

    a_specs, bias_g_specs, logw_specs = [], [], []
    a_ops, bias_g_ops = [], []
    for p in range(P):
        ap, bgp, D, M = a_s[p], bias_gs[p], ds[p], ms[p]
        if full:
            # regroup the (M*D, N, D) planes into per-word-block d-major
            # GEMM matrices (_score_kernel docstring): a6[wb,
            # (d*M + m)*nb_pad + n, e] = a[m*D + d, wb*Nb + n, e], each
            # (d, m) plane zero-padded to nb_pad = 8-sublane-aligned rows
            # (misaligned slice offsets miscompile on Mosaic) — host-side
            # constant shuffle, traced once per jit
            nb_pad = -(-Nb // 8) * 8
            a5 = jnp.transpose(ap.reshape(M, D, nw, Nb, D), (2, 1, 0, 3, 4))
            a5 = jnp.pad(a5, ((0, 0), (0, 0), (0, 0), (0, nb_pad - Nb), (0, 0)))
            a_ops.append(a5.reshape(nw, D * M * nb_pad, D))
            bg5 = jnp.transpose(bgp.reshape(M, D, nw, Nb, 1), (2, 1, 0, 3, 4))
            bg5 = jnp.pad(bg5, ((0, 0), (0, 0), (0, 0), (0, nb_pad - Nb), (0, 0)))
            bias_g_ops.append(bg5.reshape(nw, D * M * nb_pad, 1))
            a_specs.append(
                pl.BlockSpec(
                    (1, D * M * nb_pad, D),
                    lambda wb, tb: (wb, 0 * wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
            bias_g_specs.append(
                pl.BlockSpec(
                    (1, D * M * nb_pad, 1),
                    lambda wb, tb: (wb, 0 * wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
            logw_specs.append(
                pl.BlockSpec(
                    (M, Nb, 1),
                    lambda wb, tb: (0 * wb, wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            a_ops.append(ap)
            bias_g_ops.append(bgp)
            a_specs.append(
                pl.BlockSpec(
                    (M, Nb, 2 * D),
                    lambda wb, tb: (0 * wb, wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
            bias_g_specs.append(
                pl.BlockSpec(
                    bgp.shape,
                    lambda wb, tb: (0 * wb, 0 * wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
            logw_specs.append(
                pl.BlockSpec(
                    logws[p].shape,
                    lambda wb, tb: (0 * wb, 0 * wb, 0 * wb),
                    memory_space=pltpu.VMEM,
                )
            )
    # NOTE: index maps must not return Python-int literals — under
    # jax_enable_x64 they become i64 and Mosaic cannot legalize the
    # index function's return; derive zeros from the i32 grid ids
    in_specs = (
        [
            pl.BlockSpec(
                (k_block, d, B), lambda wb, tb: (tb, 0 * tb, 0 * tb),
                memory_space=pltpu.VMEM,
            )
            for d in ds
        ]
        + a_specs
        + bias_g_specs
        + [
            pl.BlockSpec(
                (ms[p], Nb, 1), lambda wb, tb: (0 * wb, wb, 0 * wb),
                memory_space=pltpu.VMEM,
            )
            for p in range(P)
        ]
        + logw_specs
        + [
            pl.BlockSpec(
                (band + 1, Nb, 1), lambda wb, tb: (0 * wb, wb, 0 * wb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, B), lambda wb, tb: (0 * wb, 0 * wb),
                memory_space=pltpu.VMEM,
            ),
        ]
    )
    return pl.pallas_call(
        partial(_score_kernel, ms, ds, k_block, band, s_word, semiring, full),
        grid=(nw, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Nb, B), lambda wb, tb: (wb, 0 * wb), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Nb, B), jnp.float32)],
        interpret=interpret,
    )(
        *[f.astype(jnp.float32) for f in featss],
        *a_ops,
        *bias_g_ops,
        *biass,
        *logws,
        diag,
        lens,
    )


def score_batch_fused_lane(
    vocab: GmmHmm,
    batch,
    mode: str = "total",
    semiring: str = "sum",
    k_block: int = 32,
    w_block: int | None = None,
    final_states: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, W) scores of every utterance against every word on the fused
    lane-major scoring kernel — drop-in for decode.scorer.score_batch_log
    on TPU for single-stream diagonal OR full-covariance vocabularies
    (full cov = the reference's committed R1 fixture regime).

    mode: "total" (R1, logsumexp over states) or "final" (R2, last state).
    semiring="max" gives Viterbi (best-path) scores instead of forward.
    final_states: optional (W,) per-word final-state indices for
    HETEROGENEOUS vocabularies (pad_stack_models): filler states are
    unreachable inside the kernel (their banded-transition diagonals are
    NEG_INF and their all-zero-weight mixtures emit ~NEG_INF), so "total"
    needs no change and "final" is a per-word gather on the (W, S, B)
    output — the reference's linked-list recognizer freely mixes
    states_number across .hmm models (recognition-fs:201-245).
    Any (B, T) is accepted: lanes zero-pad to the 128 tile and time to the
    k_block tile (padded lanes return -inf scores and are sliced off).
    MULTI-STREAM vocabularies (the reference's product-of-streams scoring,
    R2:352-358): pass `batch` as a tuple of per-stream UtteranceBatch
    objects (shared lengths, one feature set per stream — the reference
    reads one .perfil per stream, R2:331-339); per-stream mixture
    logsumexps sum in-kernel.  Homogeneous covariance across streams.
    """
    P = len(vocab.streams)
    for st in vocab.streams:
        if st.cov_type not in (DIAG, FULL):
            raise ValueError("score_batch_fused_lane: diag/full covariance only")
    if len({st.cov_type for st in vocab.streams}) != 1:
        raise ValueError("score_batch_fused_lane: homogeneous covariance only")
    full = vocab.streams[0].cov_type == FULL
    W, S = vocab.trans.shape[0], vocab.trans.shape[-1]
    batches = batch if isinstance(batch, tuple) else (batch,)
    if len(batches) != P:
        raise ValueError(
            f"score_batch_fused_lane: {P} streams need {P} feature batches"
        )
    featss = [b.features for b in batches]
    lengths = batches[0].lengths
    B, T, _ = featss[0].shape
    if w_block is None:
        # keep the per-frame working set (sum-M q-planes of (Nb, B))
        # modest: larger blocks inflate Mosaic compile time and VMEM
        # pressure
        m_sum = sum(max(st.num_mixtures, 1) for st in vocab.streams)
        target = max(1, 512 // (S * m_sum))
        w_block = max(d for d in range(1, W + 1) if W % d == 0 and d <= target)
    # Mosaic compile time scales with the statically-unrolled op count
    # ~ k_block * Nb * sum(M); cap near the measured-fast regime (~2.5k).
    # The full-cov path is ONE GEMM per frame (d-major layout) plus D
    # vector adds — roughly twice a diag plane's op weight
    unroll_planes = sum(max(st.num_mixtures, 1) for st in vocab.streams) * (
        2 if full else 1
    )
    while k_block > 8 and k_block * w_block * S * unroll_planes > 4096:
        k_block //= 2
    # pad lanes/time instead of shrinking the unroll below the tile
    pad_b = (-B) % 128
    pad_t = (-T) % k_block
    if pad_b or pad_t:
        featss = [
            jnp.pad(f, ((0, pad_b), (0, pad_t), (0, 0))) for f in featss
        ]
        lengths = jnp.pad(lengths, (0, pad_b))
    packs = [
        pack_vocab_constants(vocab, jnp.float32, stream=p) for p in range(P)
    ]
    band = packs[0][5]
    feats_tdb = tuple(
        jnp.transpose(f.astype(jnp.float32), (1, 2, 0)) for f in featss
    )
    if P == 1:
        feats_tdb = feats_tdb[0]
        args = packs[0][:4]
    else:
        args = tuple(tuple(pk[i] for pk in packs) for i in range(4))
    la = vocab_scores_pallas(
        feats_tdb, *args, packs[0][4], lengths, s_word=S, band=band,
        k_block=k_block, w_block=w_block, semiring=semiring,
        interpret=interpret,
    )  # (W*S, B_padded)
    la = la.reshape(W, S, -1)[:, :, :B]
    if mode == "total":
        scores = jax.nn.logsumexp(jnp.maximum(la, NEG_INF), axis=1)  # (W, B)
        scores = jnp.where(scores > NEG_INF / 2, scores, -jnp.inf)
    else:
        if final_states is None:
            fin = la[:, S - 1, :]
        else:
            fin = jnp.take_along_axis(
                la, final_states.astype(jnp.int32)[:, None, None], axis=1
            )[:, 0, :]
        scores = jnp.where(fin > NEG_INF / 2, fin, -jnp.inf)
    return scores.T  # (B, W)
