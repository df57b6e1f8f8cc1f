"""Fused lane-major continuous-decode kernel (Pallas, TPU).

One kernel runs the ENTIRE frame-synchronous word-loop Viterbi for a
batch of utterances: per frame it computes the composed emissions from
the packed vocabulary constants (the scoring kernel's GEMM,
scoring_pallas.pack_vocab_constants), applies the block-banded (max, +)
within-word update over the band+1 transition diagonals (sublane rolls,
word-boundary masked), merges the cross-word arc at every entry state,
and writes the per-frame argmax BACKPOINTERS as the only large HBM
output.  The utterance batch rides the 128 VPU lanes ((W*S, B) carries) —
decode/continuous.py's XLA engine (token_passing_blocks) processes one
utterance per scan and re-reads a precomputed (T, W*S) emission tensor;
here B utterances decode concurrently and emissions never touch HBM.

Cross-word arcs come in two forms:

* UNIGRAM decomposition: when every exit state sees the same
  per-destination arc weight (arc[w, v] = f(v) — uniform and unigram
  LMs), the best cross-word candidate at entry v is (max over exit
  tokens) + f(v): an O(W*S) sublane reduction per frame.
* BIGRAM (round 4): a genuine (W, W) arc runs the (max, +) contraction
  cross[v] = max_u(exit[u] + arc[u, v]) as a per-frame broadcast-reduce
  over a (W_src, W_dst, B) candidate block (plus a second equality pass
  for the argmax backpointers).  (max, +) does not map to the MXU, but
  at W=200 the 2 * W^2 * B VPU elements/frame are a minor add-on to the
  per-frame W*S*M emission GEMM.  Requires s_word % 8 == 0 (the exit-row
  extraction and entry-row scatter are layout-free (W, S, B) reshapes) —
  decode/continuous.token_passing_fused AUTO-PADS other state counts
  with unreachable filler states, keeping the real exit row live via
  the exit_col/exitrow operands (per-word exit positions).  Very large
  vocabularies (W^2 * B temporaries past the VMEM budget) stay on the
  XLA engine.

K-best: n_best=1 is the production kernel; round 4 adds an n_best=2
kernel (`word_loop_decode_k2_pallas`) — the token carry doubles to
(2, N, B), every frame runs an elementwise top-2 merge over the
2*(band+1) within-word candidate planes plus 2 cross-word planes (the
unigram top-2 of all W*K exit tokens is destination-independent: two
global reductions per frame; BIGRAM runs the (W, W) contraction per
plane, the per-destination union top-2 being max(runner-up source's
best, best source's own second) since plane 2 <= plane 1 rowwise), and
backpointers encode the XLA engine's flat (w*S+i)*K + k convention.
Late round 4 generalizes to ANY n_best (`word_loop_decode_kn_pallas`):
a K-slot elementwise insertion network over the (band+1)*K within-word
planes plus K cross-word planes, the global top-K of all N*K exit
tokens extracted by K masked max-reductions with a per-row take
counter — per-(source, destination) for bigram arcs, whose (W, W, B)
counter block gates eligibility to W <~ 100 at B=128.  Tie-breaks
may differ from the XLA engine (it prefers the lowest source state,
these kernels the shortest jump) — both are optimal paths; equality
tests use continuous random emissions where ties have measure zero.

No beam parameter, by design: beam pruning exists to SKIP work in
sparse CPU decoders (and the XLA engines expose it for such
experiments, token_passing/token_passing_blocks `beam=`), but these
kernels evaluate every state on the VPU lanes regardless — a beam
would only discard tokens (approximating the result) while saving
zero cycles.  Dense lane-parallel Viterbi IS the pruning-free fast
path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_em_pallas import LOG_GAUS_CLAMP

NEG_INF = -1e30
_TINY = 1e-38


def _frame_log_b(x, a_ref, bias_g_ref, bias_ref, logw_ref, n_mix, n_dim, N, full):
    """Per-frame composed-emission log-likelihoods (N, B).

    diag: M (N, 2D) x (2D, B) GEMMs with a RUNNING mixture logsumexp —
    at most two live (N, B) temporaries instead of M q-planes (the carry
    + backpointer block leave only a few MB of VMEM headroom at W=200;
    hardware OOM'd at 22.4M/16M with the M-plane formulation).  full:
    the scoring kernel's Cholesky z sum-of-squares (ONE d-major
    (D*M*nb_pad, D) x (D, B) GEMM; scoring_pallas module docstring) with
    the reference's 1e20 density clamp between density and weight."""
    neg = jnp.float32(NEG_INF)
    tiny = jnp.float32(_TINY)
    m_s = None
    e = None
    if full:
        clamp = jnp.float32(LOG_GAUS_CLAMP)
        nb_pad = a_ref.shape[1] // (n_dim * n_mix)
        z = (
            jnp.dot(
                a_ref[0], x,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + bias_g_ref[0]
        )  # (D*M*nb_pad, B)
        z2 = z * z
        mnbp = n_mix * nb_pad
        quad = z2[0:mnbp]
        for d in range(1, n_dim):
            quad = quad + z2[d * mnbp : (d + 1) * mnbp]
        for m in range(n_mix):
            qm = (
                jnp.float32(-0.5) * quad[m * nb_pad : m * nb_pad + N]
                + bias_ref[m]
            )
            q = jnp.minimum(qm, clamp) + logw_ref[m]
            if m == 0:
                m_s = jnp.maximum(q, neg)
                e = jnp.exp(q - m_s)
            else:
                new_m = jnp.maximum(m_s, q)
                e = e * jnp.exp(m_s - new_m) + jnp.exp(q - new_m)
                m_s = new_m
    else:
        lift = jnp.concatenate([x, x * x], axis=0)
        for m in range(n_mix):
            q = (
                jnp.dot(
                    a_ref[m], lift,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + bias_ref[m]
            )
            if m == 0:
                m_s = jnp.maximum(q, neg)
                e = jnp.exp(q - m_s)
            else:
                new_m = jnp.maximum(m_s, q)
                e = e * jnp.exp(m_s - new_m) + jnp.exp(q - new_m)
                m_s = new_m
    return jnp.log(jnp.maximum(e, tiny)) + m_s  # (N, B)


def _emission_operands(a, bias_g, logw, D):
    """Normalize the emission constants for the decode kernels: detect the
    covariance type from a's plane width (2D diag, D full), regroup the
    full-cov (M*D, N, D) planes into the d-major single-GEMM layout
    (1, D*M*nb_pad, D) with 8-sublane-aligned (d, m) plane offsets
    (the scoring kernel's hardware-debugged requirement), and supply
    (1, 1, 1) dummies for the diag path's unused bias_g/logw operands.
    Returns (full, M, a_op, bias_g_op, logw_op)."""
    planes, N, a_w = a.shape
    full = a_w == D and a_w != 2 * D
    if full:
        assert bias_g is not None and logw is not None
        M = planes // D
        nb_pad = -(-N // 8) * 8
        a5 = jnp.transpose(a.reshape(M, D, 1, N, D), (2, 1, 0, 3, 4))
        a5 = jnp.pad(a5, ((0, 0), (0, 0), (0, 0), (0, nb_pad - N), (0, 0)))
        a_op = a5.reshape(1, D * M * nb_pad, D)
        bg5 = jnp.transpose(bias_g.reshape(M, D, 1, N, 1), (2, 1, 0, 3, 4))
        bg5 = jnp.pad(bg5, ((0, 0), (0, 0), (0, 0), (0, nb_pad - N), (0, 0)))
        bg_op = bg5.reshape(1, D * M * nb_pad, 1)
        lw_op = logw
    else:
        assert a_w == 2 * D
        M = planes
        a_op = a
        bg_op = jnp.zeros((1, 1, 1), jnp.float32)
        lw_op = jnp.zeros((1, 1, 1), jnp.float32)
    return full, M, a_op, bg_op, lw_op


def _norm_emission_streams(feats_tdb, a, bias, bias_g, logw):
    """Normalize (possibly multi-stream tuple) emission args: returns
    (featss, ds, mixes, a_ops, bias_g_ops, bias_list, logw_ops, full,
    T, B, N) — the per-stream operand groups every decode wrapper feeds
    its kernel (round 5: multi-stream)."""
    multi = isinstance(feats_tdb, tuple)
    featss = feats_tdb if multi else (feats_tdb,)
    a_s = a if multi else (a,)
    bias_s = bias if multi else (bias,)
    P_s = len(featss)
    bias_g_s = bias_g if isinstance(bias_g, tuple) else (bias_g,) * P_s
    logw_s = logw if isinstance(logw, tuple) else (logw,) * P_s
    T, _, B = featss[0].shape
    ds = tuple(f.shape[1] for f in featss)
    N = a_s[0].shape[1]
    ems = [
        _emission_operands(a_s[p], bias_g_s[p], logw_s[p], ds[p])
        for p in range(P_s)
    ]
    full = ems[0][0]
    assert all(e[0] == full for e in ems), "homogeneous covariance only"
    return (
        [f.astype(jnp.float32) for f in featss], ds,
        tuple(e[1] for e in ems), [e[2] for e in ems],
        [e[3] for e in ems], list(bias_s), [e[4] for e in ems],
        full, T, B, N,
    )


def _emission_specs_ops(featss, ds, mixes, a_ops, bias_g_ops, bias_list,
                        logw_ops, k_block, B, N):
    """(in_specs, operands) for the per-stream emission groups, in the
    kernels' unpack order: feats*, a*, bias_g*, bias*, logw*."""
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    specs = (
        [
            pl.BlockSpec(
                (k_block, d, B), lambda t: (t, 0 * t, 0 * t),
                memory_space=pltpu.VMEM,
            )
            for d in ds
        ]
        + [tvm(a_op.shape) for a_op in a_ops]
        + [tvm(bg.shape) for bg in bias_g_ops]
        + [tvm((mixes[i], N, 1)) for i in range(len(mixes))]
        + [tvm(lw.shape) for lw in logw_ops]
    )
    ops = list(featss) + a_ops + bias_g_ops + bias_list + logw_ops
    return specs, ops


def _decode_kernel(
    mixes, dims, k_block, band, s_word, bigram, full,
    *refs,
):
    """Grid: ascending time blocks.  Emission operands come in PER-STREAM
    groups (round 5: multi-stream decode — per-stream mixture logsumexps
    sum into one composed log_b, the reference's product-of-streams
    semantics R2:352-358): feats (k_block, D_p, B); a (M_p, N, 2D_p) diag
    | (1, D_p*M_p*nb_pad, D_p) full (the scoring kernel's d-major z-GEMM
    layout); bias_g / logw: full-cov operands ((1, 1, 1) dummies for
    diag); bias (M_p, N, 1).  Then: diag (band+1, N, 1); arc: (N, 1)
    per-destination cross-arc weight at entry rows (unigram) or (W, W)
    full bigram arc matrix; entry (N, 1) initial score at entry rows,
    NEG_INF elsewhere; exit (N, 1) additive exit mask (0.0 at each word's
    EXIT row, NEG_INF elsewhere — per-word exit positions, so padded
    state counts decode correctly); bigram only: exitrow (W, 1) int32
    global row index of each word's exit; len (1, B).  Outputs: bp
    (k_block, N, B) int32 source-row backpointers; final (N, B)
    last-frame scores.  Scratch: la (N, B) token carry."""
    P = len(mixes)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    diag_ref, arc_ref, entry_ref, exit_ref = refs[5 * P : 5 * P + 4]
    rest_refs = refs[5 * P + 4 :]
    if bigram:
        exitrow_ref, len_ref, bp_ref, final_ref, la_ref = rest_refs
    else:
        len_ref, bp_ref, final_ref, la_ref = rest_refs
    tb = pl.program_id(0)
    N = la_ref.shape[0]
    B = la_ref.shape[1]
    W = N // s_word
    lens = len_ref[:]
    neg = jnp.float32(NEG_INF)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
    row_in_word = row % jnp.int32(s_word)
    is_exit = exit_ref[:] > jnp.float32(-1.0)  # (N, 1) bool, broadcasts
    is_entry = row_in_word == jnp.int32(0)

    for k in range(k_block):
        log_b = None
        for p in range(P):
            lb_p = _frame_log_b(
                feats_refs[p][k], a_refs[p], bias_g_refs[p], bias_refs[p],
                logw_refs[p], mixes[p], dims[p], N, full,
            )
            log_b = lb_p if log_b is None else log_b + lb_p

        def first():
            return jnp.maximum(entry_ref[:] + log_b, neg), row

        def rest():
            carry = la_ref[:]
            best = carry + diag_ref[0]  # d = 0 (self loop)
            bp = row
            for d in range(1, band + 1):
                sh = pltpu.roll(carry, shift=jnp.int32(d), axis=0)
                sh = jnp.where(row_in_word >= d, sh, neg)
                cand = sh + diag_ref[d]
                take = cand > best
                best = jnp.where(take, cand, best)
                bp = jnp.where(take, row - jnp.int32(d), bp)
            if bigram:
                # full (W, W) cross-arc (max, +) contraction (module
                # docstring): per-word exit scores via the exit mask + a
                # (W, S, B) max-reduce (the layout-free split needs
                # s_word % 8 == 0, which the wrapper guarantees by state
                # padding), then a (W_src, W_dst, B) broadcast-max plus an
                # equality pass for the argmax — carried as the exit ROW
                # itself (exitrow operand) so per-word exit positions need
                # no index arithmetic
                ex3 = (carry + exit_ref[:]).reshape(W, s_word, B)
                exit_w = jnp.max(ex3, axis=1)  # (W_src, B)
                cand = exit_w[:, None, :] + arc_ref[:][:, :, None]
                cr_w = jnp.max(cand, axis=0)  # (W_dst, B)
                rows3 = jnp.broadcast_to(
                    exitrow_ref[:][:, :, None], (W, W, B)
                )
                am_row = jnp.min(
                    jnp.where(cand == cr_w[None], rows3, jnp.int32(N)),
                    axis=0,
                )  # (W_dst, B) exit ROW of the best source word
                cross = jnp.where(
                    is_entry,
                    jnp.broadcast_to(
                        cr_w[:, None, :], (W, s_word, B)
                    ).reshape(N, B),
                    neg,
                )
                bp_x = jnp.broadcast_to(
                    am_row[:, None, :], (W, s_word, B)
                ).reshape(N, B)
            else:
                # unigram decomposition: best exit token + per-destination
                # arc; deterministic lowest-row tie-break via the masked
                # min-reduce
                exit_m = jnp.where(is_exit, carry, neg)
                m_exit = jnp.max(exit_m, axis=0, keepdims=True)  # (1, B)
                am_exit = jnp.min(
                    jnp.where(exit_m == m_exit, row, jnp.int32(N)),
                    axis=0,
                    keepdims=True,
                )  # (1, B)
                cross = m_exit + arc_ref[:]  # (N, B); NEG_INF off entry rows
                bp_x = jnp.broadcast_to(am_exit, (N, B))
            take_x = cross > best
            best = jnp.where(take_x, cross, best)
            bp = jnp.where(take_x, bp_x, bp)
            return jnp.maximum(best + log_b, neg), bp

        if k == 0:
            new, bp = jax.lax.cond(tb == 0, first, rest)
        else:
            new, bp = rest()
        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t  # (1, B)
        if k == 0:
            keep = keep | (tb == 0)
        la_ref[:] = jnp.where(keep, new, la_ref[:])
        bp_ref[k] = jnp.where(keep, bp, row)

    final_ref[:] = la_ref[:]


@partial(jax.jit, static_argnames=("s_word", "band", "k_block", "interpret"))
def word_loop_decode_pallas(
    feats_tdb: jax.Array,
    a: jax.Array,
    bias: jax.Array,
    diag: jax.Array,
    arc_col: jax.Array,
    entry_col: jax.Array,
    lengths: jax.Array,
    s_word: int,
    band: int,
    k_block: int = 4,
    exit_col: jax.Array | None = None,
    bias_g: jax.Array | None = None,
    logw: jax.Array | None = None,
    interpret: bool | None = None,
):
    """(T, D, B) features + packed constants -> (final (W*S, B) scores,
    bp (T, W*S, B) int32 source-row backpointers; bp[0] is the identity).

    a/bias/diag: pack_vocab_constants — diagonal OR (late round 4) FULL
    covariance, the latter passing pack's bias_g/logw and riding the
    scoring kernel's d-major Cholesky z-GEMM; arc_col:
    (W*S, 1) per-destination cross-arc weight at entry rows (unigram) OR
    (W, W) full bigram arc matrix (requires s_word % 8 == 0 — callers
    with other state counts pad states and pass exit_col, as
    token_passing_fused does); entry_col: (W*S, 1) initial score
    (NEG_INF off entry rows); exit_col: optional (W*S, 1) additive exit
    mask — 0.0 at each word's exit row, NEG_INF elsewhere (defaults to
    exit = last state of every word).

    MULTI-STREAM (round 5): pass tuples for feats_tdb / a / bias (and
    bias_g / logw for full cov) — one entry per stream, homogeneous
    covariance; per-stream mixture logsumexps sum in-kernel (the
    reference's product-of-streams emission, R2:352-358)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    multi = isinstance(feats_tdb, tuple)
    featss = feats_tdb if multi else (feats_tdb,)
    a_s = a if multi else (a,)
    bias_s = bias if multi else (bias,)
    P_s = len(featss)
    bias_g_s = bias_g if isinstance(bias_g, tuple) else (bias_g,) * P_s
    logw_s = logw if isinstance(logw, tuple) else (logw,) * P_s
    T, _, B = featss[0].shape
    ds = tuple(f.shape[1] for f in featss)
    N = a_s[0].shape[1]
    ems = [
        _emission_operands(a_s[p], bias_g_s[p], logw_s[p], ds[p])
        for p in range(P_s)
    ]
    full = ems[0][0]
    assert all(e[0] == full for e in ems), "homogeneous covariance only"
    mixes = tuple(e[1] for e in ems)
    a_ops = [e[2] for e in ems]
    bias_g_ops = [e[3] for e in ems]
    logw_ops = [e[4] for e in ems]
    assert N % s_word == 0 and T % k_block == 0
    bigram = arc_col.shape == (N // s_word, N // s_word) and s_word != 1
    if bigram:
        assert s_word % 8 == 0, (
            "bigram fused decode requires s_word % 8 == 0 (pad states)"
        )
    rid = jnp.arange(N, dtype=jnp.int32) % jnp.int32(s_word)
    if exit_col is None:
        exit_col = jnp.where(
            rid == jnp.int32(s_word - 1), jnp.float32(0.0), jnp.float32(NEG_INF)
        )[:, None]
    exit_col = exit_col.astype(jnp.float32)
    assert exit_col.shape == (N, 1)
    if bigram:
        # global row index of each word's exit (the masked row)
        exit_row = (
            jnp.argmax(
                (exit_col[:, 0] > -1.0).reshape(N // s_word, s_word), axis=1
            ).astype(jnp.int32)
            + jnp.arange(N // s_word, dtype=jnp.int32) * jnp.int32(s_word)
        )[:, None]
    lens = lengths.astype(jnp.float32).reshape(1, B)
    nt = T // k_block
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    tblk = lambda shape: pl.BlockSpec(
        shape, lambda t: (t, 0 * t, 0 * t), memory_space=pltpu.VMEM
    )
    in_specs = (
        [tblk((k_block, d, B)) for d in ds]
        + [tvm(a_op.shape) for a_op in a_ops]
        + [tvm(bg.shape) for bg in bias_g_ops]
        + [tvm((mixes[p], N, 1)) for p in range(P_s)]
        + [tvm(lw.shape) for lw in logw_ops]
        + [
            tvm((band + 1, N, 1)),
            tvm(arc_col.shape),
            tvm((N, 1)),
            tvm((N, 1)),
        ]
    )
    operands = (
        [f.astype(jnp.float32) for f in featss]
        + a_ops
        + bias_g_ops
        + list(bias_s)
        + logw_ops
        + [diag, arc_col, entry_col, exit_col]
    )
    if bigram:
        in_specs.append(tvm((N // s_word, 1)))
        operands.append(exit_row)
    in_specs.append(tvm((1, B)))
    operands.append(lens)
    bp, final = pl.pallas_call(
        partial(_decode_kernel, mixes, ds, k_block, band, s_word, bigram, full),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            tblk((k_block, N, B)),
            tvm((N, B)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, B), jnp.int32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, B), jnp.float32)],
        # v5e VMEM is 128 MB; the default 16 MB scoped limit OOMs at
        # W=200 with k_block > 1 (composed_pallas.py sets the same)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return final, bp


# ---------------------------------------------------------------------------
# n_best = 2 (module docstring): (2, N, B) token carry, elementwise top-2
# merges, bp in the XLA engine's flat (w*S+i)*K + k encoding
# ---------------------------------------------------------------------------


def _top2_fold(state, v, i):
    """Elementwise top-2 accumulator: state = (v1, i1, v2, i2) best/second
    values + plane ids; fold in candidate (v, i).  Strict > keeps the
    first-seen plane on ties (deterministic)."""
    v1, i1, v2, i2 = state
    better1 = v > v1
    nv1 = jnp.where(better1, v, v1)
    ni1 = jnp.where(better1, i, i1)
    dem_v = jnp.where(better1, v1, v)  # loser of the best comparison
    dem_i = jnp.where(better1, i1, i)
    better2 = dem_v > v2
    nv2 = jnp.where(better2, dem_v, v2)
    ni2 = jnp.where(better2, dem_i, i2)
    return nv1, ni1, nv2, ni2


def _decode_k2_kernel(
    mixes, dims, k_block, band, s_word, bigram, full,
    *refs,
):
    """n_best=2 word-loop Viterbi.  Shapes as _decode_kernel except:
    outputs bp (k_block, 2, N, B) int32 flat src*2+k backpointers and
    final (2, N, B); scratch la (2, N, B) two-plane token carry.
    Emission operands come in per-stream groups like _decode_kernel
    (round 5: multi-stream).  BIGRAM (round 4): the (W, W) cross-arc
    contraction runs per candidate plane — per-destination top-2 over
    the union of every source word's two exit planes (second-best = max
    of the runner-up source's best and the winning source's own second,
    since plane 2 <= plane 1 rowwise)."""
    P = len(mixes)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    diag_ref, arc_ref, entry_ref, exit_ref = refs[5 * P : 5 * P + 4]
    rest_refs = refs[5 * P + 4 :]
    if bigram:
        exitrow_ref, len_ref, bp_ref, final_ref, la_ref = rest_refs
    else:
        len_ref, bp_ref, final_ref, la_ref = rest_refs
    tb = pl.program_id(0)
    _, N, B = la_ref.shape
    W = N // s_word
    lens = len_ref[:]
    neg = jnp.float32(NEG_INF)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
    row_in_word = row % jnp.int32(s_word)
    is_exit = exit_ref[:] > jnp.float32(-1.0)  # (N, 1) bool, broadcasts
    is_entry = row_in_word == jnp.int32(0)
    n_within = 2 * (band + 1)

    for k in range(k_block):
        log_b = None
        for p in range(P):
            lb_p = _frame_log_b(
                feats_refs[p][k], a_refs[p], bias_g_refs[p], bias_refs[p],
                logw_refs[p], mixes[p], dims[p], N, full,
            )
            log_b = lb_p if log_b is None else log_b + lb_p

        def first():
            b0 = jnp.maximum(entry_ref[:] + log_b, neg)
            b1 = jnp.full((N, B), neg)
            return b0, b1, row * jnp.int32(2), row * jnp.int32(2) + jnp.int32(1)

        def rest():
            c = [la_ref[0], la_ref[1]]
            # ---- within-word candidate planes p = d*2 + kk ----
            state = None
            for d in range(band + 1):
                for kk in range(2):
                    if d == 0:
                        sh = c[kk]
                    else:
                        sh = pltpu.roll(c[kk], shift=jnp.int32(d), axis=0)
                        sh = jnp.where(row_in_word >= d, sh, neg)
                    v = sh + diag_ref[d]
                    i = jnp.full((N, B), d * 2 + kk, jnp.int32)
                    if state is None:
                        state = (v, i, jnp.full((N, B), neg), i)
                    else:
                        state = _top2_fold(state, v, i)
            # ---- cross-word: top-2 of the union of both exit planes ----
            if bigram:
                # per-source-word exit values of both planes (exit mask +
                # (W, S, B) max-reduce, per-word exit rows as in
                # _decode_kernel), then the (W_src, W_dst, B) (max, +)
                # contraction per plane.  Union top-2 per destination:
                # best = best source's plane 1; second = max(runner-up
                # source's plane 1, best source's plane 2) — valid since
                # plane 2 <= plane 1 rowwise.
                e0w = jnp.max((c[0] + exit_ref[:]).reshape(W, s_word, B), axis=1)
                e1w = jnp.max((c[1] + exit_ref[:]).reshape(W, s_word, B), axis=1)
                arc3 = arc_ref[:][:, :, None]  # (W_src, W_dst, 1)
                cand1 = e0w[:, None, :] + arc3  # (W_src, W_dst, B)
                cr1 = jnp.max(cand1, axis=0)  # (W_dst, B)
                rows3 = jnp.broadcast_to(
                    exitrow_ref[:][:, :, None], (W, W, B)
                )
                amr = jnp.min(
                    jnp.where(cand1 == cr1[None], rows3, jnp.int32(N)), axis=0
                )  # (W_dst, B) exit ROW of the best source word
                is_best = rows3 == amr[None]
                excl = jnp.where(is_best, neg, cand1)
                s1x = jnp.max(excl, axis=0)  # runner-up source's plane 1
                asr = jnp.min(
                    jnp.where(excl == s1x[None], rows3, jnp.int32(N)), axis=0
                )
                c2b = jnp.max(
                    jnp.where(is_best, e1w[:, None, :] + arc3, neg), axis=0
                )  # best source's plane 2
                use_ru = s1x >= c2b
                x2v_w = jnp.where(use_ru, s1x, c2b)
                x2bp_w = jnp.where(
                    use_ru,
                    asr * jnp.int32(2),
                    amr * jnp.int32(2) + jnp.int32(1),
                )

                def spread(v):
                    return jnp.broadcast_to(
                        v[:, None, :], (W, s_word, B)
                    ).reshape(N, B)

                cx1 = jnp.where(is_entry, spread(cr1), neg)
                cx2 = jnp.where(is_entry, spread(x2v_w), neg)
                x1bp = spread(amr * jnp.int32(2))
                x2bp = spread(x2bp_w)
            else:
                e0 = jnp.where(is_exit, c[0], neg)
                e1 = jnp.where(is_exit, c[1], neg)
                rm0 = jnp.max(e0, axis=0, keepdims=True)  # (1, B)
                rm1 = jnp.max(e1, axis=0, keepdims=True)
                am0 = jnp.min(
                    jnp.where(e0 == rm0, row, jnp.int32(N)), axis=0, keepdims=True
                )
                am1 = jnp.min(
                    jnp.where(e1 == rm1, row, jnp.int32(N)), axis=0, keepdims=True
                )
                # second-best within each plane (excluding its own argmax row)
                s0 = jnp.max(jnp.where(row == am0, neg, e0), axis=0, keepdims=True)
                s1 = jnp.max(jnp.where(row == am1, neg, e1), axis=0, keepdims=True)
                as0 = jnp.min(
                    jnp.where(jnp.where(row == am0, neg, e0) == s0, row, jnp.int32(N)),
                    axis=0, keepdims=True,
                )
                as1 = jnp.min(
                    jnp.where(jnp.where(row == am1, neg, e1) == s1, row, jnp.int32(N)),
                    axis=0, keepdims=True,
                )
                take0 = rm0 >= rm1  # union best comes from plane 0
                x1v = jnp.where(take0, rm0, rm1)
                x1bp_u = jnp.where(
                    take0, am0 * jnp.int32(2), am1 * jnp.int32(2) + jnp.int32(1)
                )
                # union second: loser of the best comparison vs the winner's
                # own second
                cand_a_v = jnp.where(take0, rm1, rm0)
                cand_a_bp = jnp.where(
                    take0, am1 * jnp.int32(2) + jnp.int32(1), am0 * jnp.int32(2)
                )
                cand_b_v = jnp.where(take0, s0, s1)
                cand_b_bp = jnp.where(
                    take0, as0 * jnp.int32(2), as1 * jnp.int32(2) + jnp.int32(1)
                )
                use_a = cand_a_v >= cand_b_v
                x2v = jnp.where(use_a, cand_a_v, cand_b_v)
                x2bp_u = jnp.where(use_a, cand_a_bp, cand_b_bp)
                # per-destination arc (entry rows only)
                arc = arc_ref[:]  # (N, 1), NEG_INF off entry rows
                cx1 = jnp.where(arc > neg, x1v + arc, neg)
                cx2 = jnp.where(arc > neg, x2v + arc, neg)
                x1bp = jnp.broadcast_to(x1bp_u, (N, B))
                x2bp = jnp.broadcast_to(x2bp_u, (N, B))
            state = _top2_fold(
                state, cx1, jnp.full((N, B), n_within, jnp.int32)
            )
            state = _top2_fold(
                state, cx2, jnp.full((N, B), n_within + 1, jnp.int32)
            )
            v1, i1, v2, i2 = state

            # ---- reconstruct flat src*2+k backpointers from plane ids ----
            def bp_of(pid):
                bp = jnp.zeros((N, B), jnp.int32)
                for d in range(band + 1):
                    for kk in range(2):
                        p = d * 2 + kk
                        bp = jnp.where(
                            pid == p,
                            (row - jnp.int32(d)) * jnp.int32(2) + jnp.int32(kk),
                            bp,
                        )
                bp = jnp.where(
                    pid == n_within, jnp.broadcast_to(x1bp, (N, B)), bp
                )
                bp = jnp.where(
                    pid == n_within + 1, jnp.broadcast_to(x2bp, (N, B)), bp
                )
                return bp

            return (
                jnp.maximum(v1 + log_b, neg),
                jnp.maximum(v2 + log_b, neg),
                bp_of(i1),
                bp_of(i2),
            )

        if k == 0:
            b0, b1, bp0, bp1 = jax.lax.cond(tb == 0, first, rest)
        else:
            b0, b1, bp0, bp1 = rest()
        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t
        if k == 0:
            keep = keep | (tb == 0)
        la_ref[0] = jnp.where(keep, b0, la_ref[0])
        la_ref[1] = jnp.where(keep, b1, la_ref[1])
        bp_ref[k, 0] = jnp.where(keep, bp0, row * jnp.int32(2))
        bp_ref[k, 1] = jnp.where(keep, bp1, row * jnp.int32(2) + jnp.int32(1))

    final_ref[:] = la_ref[:]


@partial(jax.jit, static_argnames=("s_word", "band", "k_block", "interpret"))
def word_loop_decode_k2_pallas(
    feats_tdb: jax.Array,
    a: jax.Array,
    bias: jax.Array,
    diag: jax.Array,
    arc_col: jax.Array,
    entry_col: jax.Array,
    lengths: jax.Array,
    s_word: int,
    band: int,
    k_block: int = 4,
    exit_col: jax.Array | None = None,
    bias_g: jax.Array | None = None,
    logw: jax.Array | None = None,
    interpret: bool | None = None,
):
    """n_best=2 variant of word_loop_decode_pallas: returns (final
    (2, W*S, B), bp (T, 2, W*S, B) int32 flat src*2+k).  arc_col
    (W*S, 1) unigram OR (W, W) bigram (requires s_word % 8 == 0 — the
    token_passing_fused_k2 wrapper pads states); exit_col as in
    word_loop_decode_pallas (per-word exit-row mask); bias_g/logw for
    FULL covariance (pack_vocab_constants outputs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (featss, ds, mixes, a_ops, bias_g_ops, bias_list, logw_ops, full,
     T, B, N) = _norm_emission_streams(feats_tdb, a, bias, bias_g, logw)
    assert N % s_word == 0 and T % k_block == 0
    bigram = arc_col.shape == (N // s_word, N // s_word) and s_word != 1
    if bigram:
        assert s_word % 8 == 0, (
            "bigram fused decode requires s_word % 8 == 0 (pad states)"
        )
    else:
        assert arc_col.shape == (N, 1)
    rid = jnp.arange(N, dtype=jnp.int32) % jnp.int32(s_word)
    if exit_col is None:
        exit_col = jnp.where(
            rid == jnp.int32(s_word - 1), jnp.float32(0.0), jnp.float32(NEG_INF)
        )[:, None]
    exit_col = exit_col.astype(jnp.float32)
    assert exit_col.shape == (N, 1)
    if bigram:
        exit_row = (
            jnp.argmax(
                (exit_col[:, 0] > -1.0).reshape(N // s_word, s_word), axis=1
            ).astype(jnp.int32)
            + jnp.arange(N // s_word, dtype=jnp.int32) * jnp.int32(s_word)
        )[:, None]
    lens = lengths.astype(jnp.float32).reshape(1, B)
    nt = T // k_block
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    em_specs, em_ops = _emission_specs_ops(
        featss, ds, mixes, a_ops, bias_g_ops, bias_list, logw_ops,
        k_block, B, N,
    )
    in_specs = em_specs + [
        tvm((band + 1, N, 1)),
        tvm(arc_col.shape),
        tvm((N, 1)),
        tvm((N, 1)),
    ]
    operands = em_ops + [diag, arc_col, entry_col, exit_col]
    if bigram:
        in_specs.append(tvm((N // s_word, 1)))
        operands.append(exit_row)
    in_specs.append(tvm((1, B)))
    operands.append(lens)
    bp, final = pl.pallas_call(
        partial(_decode_k2_kernel, mixes, ds, k_block, band, s_word, bigram, full),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (k_block, 2, N, B), lambda t: (t, 0 * t, 0 * t, 0 * t),
                memory_space=pltpu.VMEM,
            ),
            tvm((2, N, B)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, N, B), jnp.int32),
            jax.ShapeDtypeStruct((2, N, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, N, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return final, bp


# ---------------------------------------------------------------------------
# general n_best = K (round 4): K-slot elementwise insertion network.
# The global top-K of the exit-token multiset comes from K masked
# max-reductions with a take counter (the planes are maintained sorted
# per state, so the next-best token after t takes IS plane t) — per-row
# for unigram arcs, per-(source, destination) over the (W, W, B)
# candidate block for bigram (eligibility gated by that block's VMEM
# footprint: W <~ 100 at B=128; larger bigram K>2 graphs stay on the
# XLA engine).
# ---------------------------------------------------------------------------


def _topk_insert(vals, ids, v, i):
    """Elementwise K-slot insertion: bubble candidate (v, i) down the
    descending-sorted slot lists.  Strict > keeps first-seen on ties
    (deterministic, matches _top2_fold)."""
    K = len(vals)
    for k in range(K):
        better = v > vals[k]
        vals[k], v = (
            jnp.where(better, v, vals[k]),
            jnp.where(better, vals[k], v),
        )
        ids[k], i = (
            jnp.where(better, i, ids[k]),
            jnp.where(better, ids[k], i),
        )
    return vals, ids


def _decode_kn_kernel(
    mixes, dims, k_block, band, s_word, K, bigram, full, w_blk,
    *refs,
):
    """n_best=K word-loop Viterbi.  Shapes as _decode_k2_kernel with the
    plane axis K instead of 2: bp (k_block, K, N, B) int32 flat
    src*K + k backpointers, final / la (K, N, B).  BIGRAM: the take
    counter generalizes to a per-(source, destination) pair (W, W, B)
    int32 — per destination, a source word's next-best exit token after
    t takes is its plane t, so the global top-K per destination is K
    masked max-reductions over the (W_src, W_dst, B) candidate block.
    Round 5: the destination axis is TILED in blocks of w_blk (take
    counters for different destinations are independent), so only
    (W_src, w_blk, B) planes are live at once and W=200-class bigram
    K>2 graphs fit VMEM (the round-4 W<~100 gate is lifted; w_blk is
    chosen by the wrapper from the VMEM budget, 1 in the worst case).
    Emission operands come in per-stream groups (round 5:
    multi-stream)."""
    P = len(mixes)
    feats_refs = refs[0:P]
    a_refs = refs[P : 2 * P]
    bias_g_refs = refs[2 * P : 3 * P]
    bias_refs = refs[3 * P : 4 * P]
    logw_refs = refs[4 * P : 5 * P]
    diag_ref, arc_ref, entry_ref, exit_ref = refs[5 * P : 5 * P + 4]
    rest_refs = refs[5 * P + 4 :]
    if bigram:
        exitrow_ref, len_ref, bp_ref, final_ref, la_ref = rest_refs
    else:
        len_ref, bp_ref, final_ref, la_ref = rest_refs
    tb = pl.program_id(0)
    _, N, B = la_ref.shape
    W = N // s_word
    lens = len_ref[:]
    neg = jnp.float32(NEG_INF)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
    row_in_word = row % jnp.int32(s_word)
    is_exit = exit_ref[:] > jnp.float32(-1.0)
    is_entry = row_in_word == jnp.int32(0)
    n_within = (band + 1) * K

    for k in range(k_block):
        log_b = None
        for p in range(P):
            lb_p = _frame_log_b(
                feats_refs[p][k], a_refs[p], bias_g_refs[p], bias_refs[p],
                logw_refs[p], mixes[p], dims[p], N, full,
            )
            log_b = lb_p if log_b is None else log_b + lb_p

        def first():
            outs = [jnp.maximum(entry_ref[:] + log_b, neg)]
            outs += [jnp.full((N, B), neg) for _ in range(K - 1)]
            bps = [row * jnp.int32(K) + jnp.int32(kk) for kk in range(K)]
            return tuple(outs) + tuple(bps)

        def rest():
            c = [la_ref[kk] for kk in range(K)]
            vals = [jnp.full((N, B), neg) for _ in range(K)]
            ids = [jnp.full((N, B), 0, jnp.int32) for _ in range(K)]
            # within-word planes pid = d*K + kk
            for d in range(band + 1):
                for kk in range(K):
                    if d == 0:
                        sh = c[kk]
                    else:
                        sh = pltpu.roll(c[kk], shift=jnp.int32(d), axis=0)
                        sh = jnp.where(row_in_word >= d, sh, neg)
                    v = sh + diag_ref[d]
                    i = jnp.full((N, B), d * K + kk, jnp.int32)
                    vals, ids = _topk_insert(vals, ids, v, i)
            # cross-word: global top-K of the exit-token multiset via take
            # counters (the planes are maintained sorted per state, so a
            # source's next-best token after t takes IS plane t)
            bp_x = []
            if bigram:
                # per-(source, destination) take counter, DESTINATION-TILED
                # (round 5): destination blocks of w_blk are independent
                # (each dst consumes its own source-plane counters), so
                # only (W_src, w_blk, B) planes are live at once
                e_w = [
                    jnp.max(
                        (c[kk] + exit_ref[:]).reshape(W, s_word, B), axis=1
                    )
                    for kk in range(K)
                ]  # each (W_src, B), sorted over kk per source
                exitrow2 = exitrow_ref[:]  # (W_src, 1)
                n_blk = arc_ref.shape[0]  # arc operand is (n_blk, W, w_blk)

                def spread(v):
                    return jnp.broadcast_to(
                        v[:, None, :], (W, s_word, B)
                    ).reshape(N, B)

                # per take t, per dst block: (m, bp) pieces; the arc is
                # PRE-BLOCKED host-side (leading-dim kernel reads — Mosaic
                # cannot lower lane-axis value slices at unaligned offsets)
                m_parts = [[] for _ in range(K)]
                bp_parts = [[] for _ in range(K)]
                for jb in range(n_blk):
                    arc3 = arc_ref[jb][:, :, None]  # (W, w_blk, 1)
                    rows3 = jnp.broadcast_to(
                        exitrow2[:, :, None], (W, w_blk, B)
                    )
                    tc3 = jnp.zeros((W, w_blk, B), jnp.int32)
                    for t in range(K):
                        cand = jnp.full((W, w_blk, B), neg)
                        for kk in range(K - 1, -1, -1):
                            cand = jnp.where(
                                tc3 == kk, e_w[kk][:, None, :] + arc3, cand
                            )
                        m = jnp.max(cand, axis=0)  # (w_blk, B)
                        amr = jnp.min(
                            jnp.where(cand == m[None], rows3, jnp.int32(N)),
                            axis=0,
                        )  # exit ROW of the chosen source word
                        is_ch = rows3 == amr[None]
                        tcs = jnp.min(
                            jnp.where(is_ch, tc3, jnp.int32(K)), axis=0
                        )  # plane taken from the chosen source
                        m_parts[t].append(m)
                        bp_parts[t].append(amr * jnp.int32(K) + tcs)
                        tc3 = jnp.where(is_ch, tc3 + jnp.int32(1), tc3)
                for t in range(K):
                    m_full = (
                        m_parts[t][0]
                        if len(m_parts[t]) == 1
                        else jnp.stack(m_parts[t], axis=0).reshape(W, B)
                    )  # (W_dst, B) — stack on a NEW leading axis + merge
                    bp_full = (
                        bp_parts[t][0]
                        if len(bp_parts[t]) == 1
                        else jnp.stack(bp_parts[t], axis=0).reshape(W, B)
                    )
                    bp_t = spread(bp_full)  # (N, B)
                    v = jnp.where(is_entry, spread(m_full), neg)
                    vals, ids = _topk_insert(
                        vals, ids, v,
                        jnp.full((N, B), n_within + t, jnp.int32),
                    )
                    bp_x.append(bp_t)
            else:
                planes = [jnp.where(is_exit, c[kk], neg) for kk in range(K)]
                tc = jnp.zeros((N, B), jnp.int32)
                arc = arc_ref[:]  # (N, 1), NEG_INF off entry rows
                for t in range(K):
                    cand = jnp.full((N, B), neg)
                    for kk in range(K - 1, -1, -1):
                        cand = jnp.where(tc == kk, planes[kk], cand)
                    m = jnp.max(cand, axis=0, keepdims=True)  # (1, B)
                    am = jnp.min(
                        jnp.where(cand == m, row, jnp.int32(N)),
                        axis=0, keepdims=True,
                    )
                    tc_sel = jnp.min(
                        jnp.where(row == am, tc, jnp.int32(N)),
                        axis=0, keepdims=True,
                    )
                    bp_t = am * jnp.int32(K) + tc_sel  # (1, B)
                    v = jnp.where(arc > neg, m + arc, neg)
                    vals, ids = _topk_insert(
                        vals, ids, v,
                        jnp.full((N, B), n_within + t, jnp.int32),
                    )
                    tc = jnp.where(row == am, tc + jnp.int32(1), tc)
                    bp_x.append(bp_t)

            def bp_of(pid):
                bp = jnp.zeros((N, B), jnp.int32)
                for d in range(band + 1):
                    for kk in range(K):
                        bp = jnp.where(
                            pid == d * K + kk,
                            (row - jnp.int32(d)) * jnp.int32(K) + jnp.int32(kk),
                            bp,
                        )
                for t in range(K):
                    bp = jnp.where(
                        pid == n_within + t,
                        jnp.broadcast_to(bp_x[t], (N, B)),
                        bp,
                    )
                return bp

            outs = [jnp.maximum(vals[kk] + log_b, neg) for kk in range(K)]
            bps = [bp_of(ids[kk]) for kk in range(K)]
            return tuple(outs) + tuple(bps)

        if k == 0:
            res = jax.lax.cond(tb == 0, first, rest)
        else:
            res = rest()
        t = tb * k_block + k
        keep = lens > jnp.float32(1.0) * t
        if k == 0:
            keep = keep | (tb == 0)
        for kk in range(K):
            la_ref[kk] = jnp.where(keep, res[kk], la_ref[kk])
            bp_ref[k, kk] = jnp.where(
                keep, res[K + kk], row * jnp.int32(K) + jnp.int32(kk)
            )

    final_ref[:] = la_ref[:]


@partial(
    jax.jit,
    static_argnames=("s_word", "band", "n_best", "k_block", "w_blk", "interpret"),
)
def word_loop_decode_kn_pallas(
    feats_tdb: jax.Array,
    a: jax.Array,
    bias: jax.Array,
    diag: jax.Array,
    arc_col: jax.Array,
    entry_col: jax.Array,
    lengths: jax.Array,
    s_word: int,
    band: int,
    n_best: int,
    k_block: int = 2,
    exit_col: jax.Array | None = None,
    bias_g: jax.Array | None = None,
    logw: jax.Array | None = None,
    w_blk: int | None = None,
    interpret: bool | None = None,
):
    """General n_best=K variant: returns (final (K, W*S, B), bp
    (T, K, W*S, B) int32 flat src*K + k).  arc_col (W*S, 1) unigram OR
    (W, W) bigram (requires s_word % 8 == 0 — token_passing_fused_kn
    pads states; W gated by the (W, W, B) take-counter VMEM budget);
    bias_g/logw for FULL covariance (pack_vocab_constants outputs).
    K=2 callers should prefer word_loop_decode_k2_pallas; this kernel
    exists for K >= 3."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K = n_best
    (featss, ds, mixes, a_ops, bias_g_ops, bias_list, logw_ops, full,
     T, B, N) = _norm_emission_streams(feats_tdb, a, bias, bias_g, logw)
    assert N % s_word == 0 and T % k_block == 0
    assert K >= 2
    bigram = arc_col.shape == (N // s_word, N // s_word) and s_word != 1
    if bigram:
        assert s_word % 8 == 0, (
            "bigram fused decode requires s_word % 8 == 0 (pad states)"
        )
        if w_blk is None:
            # destination-tile width from the VMEM budget: ~4 live
            # (W_src, w_blk, B) f32/i32 planes per take pass (round 5 —
            # replaces the round-4 hard W <~ 100 eligibility gate)
            _W = N // s_word
            cap = max(1, (24 * 1024 * 1024) // (16 * _W * B))
            w_blk = max(
                d for d in range(1, _W + 1) if _W % d == 0 and d <= cap
            )
        assert (N // s_word) % w_blk == 0
    else:
        w_blk = 1
        assert arc_col.shape == (N, 1)
    if exit_col is None:
        rid = jnp.arange(N, dtype=jnp.int32) % jnp.int32(s_word)
        exit_col = jnp.where(
            rid == jnp.int32(s_word - 1), jnp.float32(0.0), jnp.float32(NEG_INF)
        )[:, None]
    exit_col = exit_col.astype(jnp.float32)
    assert exit_col.shape == (N, 1)
    if bigram:
        exit_row = (
            jnp.argmax(
                (exit_col[:, 0] > -1.0).reshape(N // s_word, s_word), axis=1
            ).astype(jnp.int32)
            + jnp.arange(N // s_word, dtype=jnp.int32) * jnp.int32(s_word)
        )[:, None]
    lens = lengths.astype(jnp.float32).reshape(1, B)
    nt = T // k_block
    arc_op = arc_col
    if bigram:
        # pre-block the (W, W) arc into (n_blk, W, w_blk) destination
        # tiles: the kernel indexes the LEADING axis per block (Mosaic
        # cannot lower lane-axis value slices at unaligned offsets)
        _W = N // s_word
        arc_op = jnp.stack(
            [arc_col[:, j0 : j0 + w_blk] for j0 in range(0, _W, w_blk)], 0
        )
    tvm = lambda shape: pl.BlockSpec(
        shape, lambda t: (0 * t,) * len(shape), memory_space=pltpu.VMEM
    )
    em_specs, em_ops = _emission_specs_ops(
        featss, ds, mixes, a_ops, bias_g_ops, bias_list, logw_ops,
        k_block, B, N,
    )
    in_specs = em_specs + [
        tvm((band + 1, N, 1)),
        tvm(arc_op.shape),
        tvm((N, 1)),
        tvm((N, 1)),
    ]
    operands = em_ops + [diag, arc_op, entry_col, exit_col]
    if bigram:
        in_specs.append(tvm((N // s_word, 1)))
        operands.append(exit_row)
    in_specs.append(tvm((1, B)))
    operands.append(lens)
    bp, final = pl.pallas_call(
        partial(
            _decode_kn_kernel, mixes, ds, k_block, band, s_word, K, bigram,
            full, w_blk,
        ),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (k_block, K, N, B), lambda t: (t, 0 * t, 0 * t, 0 * t),
                memory_space=pltpu.VMEM,
            ),
            tvm((K, N, B)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, K, N, B), jnp.int32),
            jax.ShapeDtypeStruct((K, N, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, N, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return final, bp
