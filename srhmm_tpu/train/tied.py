"""Tied-state (senone) embedded re-estimation.

The tied variant of train/embedded.py: each utterance gathers the senone
parameters for its L*S transcript positions (an utterance touches a tiny
slice of the inventory, so gather-then-compute beats materializing (T, N, M)
posteriors for all N senones), and the E-step statistics scatter-add into
senone space — tying IS the scatter.  Per-unit transition statistics stay
unit-level.

This is BASELINE.json config 5's compute/communication shape: with the
senone axis sharded over a `model` mesh axis and utterances over `data`,
the scatter-reductions become the mixture-sharded multi-host EM all-reduces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gmm_hmm import FULL
from ..models.tying import TiedHmmSet
from ..ops.emission import log_mixture_posteriors
from ..ops.forward_backward import log_backward_full, log_forward_full
from .em import StreamStats, update_stream
from .embedded import _composed_log_trans


def tied_utterance_stats(
    tied: TiedHmmSet,
    transcript: jax.Array,
    feats: jax.Array,
    length: jax.Array,
):
    """E-step statistics for one utterance against a tied set.

    Returns (senone StreamStats (N, ...), den_mix_senone (N,),
    num_trans (P, S, S), den_trans (P, S), log_prob, valid).
    """
    P = tied.num_units
    S = tied.num_states
    N = tied.num_senones
    L = transcript.shape[0]
    T = feats.shape[0]
    dtype = feats.dtype

    # gather the per-position senone parameters (L*S of them) and compute
    # emissions on the gathered bank: computing/materializing posteriors for
    # the FULL inventory (T x N x M) would blow HBM at config-5 scale
    # (N=2000, M=16) for no benefit — an utterance touches <= L*S senones.
    sen_ids = tied.state_map[transcript]  # (L, S)
    flat_ids = sen_ids.reshape(L * S)
    sen = tied.senones
    gathered = sen.replace(
        weights=sen.weights[flat_ids],
        means=sen.means[flat_ids],
        inv_cov=sen.inv_cov[flat_ids],
        det=sen.det[flat_ids],
        log_det=None if sen.log_det is None else sen.log_det[flat_ids],
    )
    pos_lb, pos_post = log_mixture_posteriors(feats, gathered)  # (T,LS),(T,LS,M)
    lb_pos = pos_lb.reshape(T, L, S)
    log_b = pos_lb

    unit_logt = tied.log_trans().astype(dtype)
    pos_logt = unit_logt[transcript]  # (L, S, S)
    log_trans = _composed_log_trans(pos_logt)

    la = log_forward_full(log_b, log_trans, length)
    lbw = log_backward_full(log_b, log_trans, length)
    log_z = la[-1, -1]
    valid = jnp.isfinite(log_z) & (length > 0)
    safe_z = jnp.where(valid, log_z, 0.0)

    t_idx = jnp.arange(T)
    frame_mask = (t_idx < length).astype(dtype)
    la_p = la.reshape(T, L, S)
    lb_p = lbw.reshape(T, L, S)
    gamma = jnp.exp(jnp.minimum(la_p + lb_p - safe_z, 0.0)) * frame_mask[:, None, None]

    xi_mask = (t_idx[:-1] < length - 1).astype(dtype)
    fwd_in = (lb_pos + lb_p)[1:]
    log_xi = la_p[:-1, :, :, None] + pos_logt[None] + fwd_in[:, :, None, :] - safe_z
    xi = jnp.exp(jnp.minimum(log_xi, 0.0)) * xi_mask[:, None, None, None]
    xi_pos = xi.sum(0)
    if L > 1:
        arc = pos_logt[:-1, S - 1, S - 1]
        cross = la_p[:-1, :-1, S - 1] + arc[None] + fwd_in[:, 1:, 0] - safe_z
        cross_flow = jnp.exp(jnp.minimum(cross, 0.0)) * xi_mask[:, None]
        xi_pos = xi_pos.at[:-1, S - 1, S - 1].add(cross_flow.sum(0))

    num_trans = jnp.zeros((P, S, S), dtype).at[transcript].add(xi_pos)
    den_trans = jnp.zeros((P, S), dtype).at[transcript].add(
        (gamma[:-1] * xi_mask[:, None, None]).sum(0)
    )

    # senone-space GMM statistics: scatter positional gamma into the inventory
    gm_ls = gamma.reshape(T, L * S)[..., None] * pos_post  # (T, LS, M)
    M = gm_ls.shape[-1]
    D = feats.shape[-1]
    seg = lambda vals, shape: jnp.zeros(shape, dtype).at[flat_ids].add(vals)

    w = seg(gm_ls.sum(0), (N, M))
    den_mix = seg(gamma.reshape(T, L * S).sum(0), (N,))
    x = seg(
        jnp.einsum("tlm,td->lmd", gm_ls, feats, preferred_element_type=dtype),
        (N, M, D),
    )
    if tied.senones.cov_type == FULL:
        xx = seg(
            jnp.einsum(
                "tlm,td,te->lmde", gm_ls, feats, feats,
                preferred_element_type=dtype,
            ),
            (N, M, D, D),
        )
    else:
        xx = seg(
            jnp.einsum(
                "tlm,td->lmd", gm_ls, feats * feats,
                preferred_element_type=dtype,
            ),
            (N, M, D),
        )

    zero = lambda a: jnp.where(valid, a, jnp.zeros_like(a))
    return (
        StreamStats(w=zero(w), x=zero(x), xx=zero(xx)),
        zero(den_mix),
        zero(num_trans),
        zero(den_trans),
        jnp.where(valid, log_z, 0.0),
        valid.astype(dtype),
    )


@partial(jax.jit, static_argnames=("var_floor",))
def tied_em_step(
    tied: TiedHmmSet,
    transcripts: jax.Array,
    feats: jax.Array,
    lengths: jax.Array,
    var_floor: float = 0.0,
):
    """One tied-state embedded EM iteration over an equal-shape bucket.
    Returns (new TiedHmmSet, total log prob, num valid)."""
    per = jax.vmap(lambda tr, f, l: tied_utterance_stats(tied, tr, f, l))(
        transcripts, feats, lengths
    )
    sen_stats, den_mix, num_trans, den_trans, log_prob, valid = jax.tree.map(
        lambda a: a.sum(0), per
    )

    senones = update_stream(tied.senones, sen_stats, den_mix, var_floor)

    band = (tied.trans > 0).astype(tied.trans.dtype)  # per-unit support mask
    trans_new = jnp.where(
        (den_trans > 0)[..., None],
        band * num_trans / jnp.where(den_trans > 0, den_trans, 1.0)[..., None],
        tied.trans,
    )
    return (
        tied.replace(senones=senones, trans=trans_new),
        log_prob,
        valid,
    )


def train_tied(
    tied: TiedHmmSet,
    utterances: list[np.ndarray],
    transcripts: list[list[int]],
    threshold: float = 1e-3,
    max_iterations: int = 50,
    var_floor: float = 0.0,
    pad_multiple: int = 32,
):
    """Tied-state embedded EM driver (bucketed by shape, reference
    convergence semantics)."""
    from ..io.dataset import round_up
    from .em_parity import TrainResult

    dtype = tied.trans.dtype
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (u, tr) in enumerate(zip(utterances, transcripts)):
        buckets.setdefault((round_up(len(u), pad_multiple), len(tr)), []).append(i)
    packed = []
    D = utterances[0].shape[1]
    for (T, L), idxs in buckets.items():
        f = np.zeros((len(idxs), T, D))
        ln = np.zeros(len(idxs), np.int32)
        trs = np.zeros((len(idxs), L), np.int32)
        for row, i in enumerate(idxs):
            f[row, : len(utterances[i])] = utterances[i]
            ln[row] = len(utterances[i])
            trs[row] = transcripts[i]
        packed.append((jnp.asarray(trs), jnp.asarray(f, dtype), jnp.asarray(ln)))

    old = 1.0
    history = []
    iteration = 0
    n_valid = 0
    while iteration < max_iterations:
        iteration += 1
        total_lp = 0.0
        n_valid = 0
        agg = None  # raw stats accumulated across shape buckets
        for trs, f, ln in packed:
            per = jax.vmap(
                lambda tr, ff, l: tied_utterance_stats(tied, tr, ff, l)
            )(trs, f, ln)
            stats = jax.tree.map(lambda a: a.sum(0), per)
            total_lp += float(stats[4])
            n_valid += int(stats[5])
            agg = stats if agg is None else jax.tree.map(jnp.add, agg, stats)
        history.append(total_lp)
        if old != 0.0 and abs((old - total_lp) / old) <= threshold:
            break
        old = total_lp
        sen_stats, den_mix, num_trans, den_trans = agg[0], agg[1], agg[2], agg[3]
        senones = update_stream(tied.senones, sen_stats, den_mix, var_floor)
        band = (tied.trans > 0).astype(tied.trans.dtype)
        trans_new = jnp.where(
            (den_trans > 0)[..., None],
            band * num_trans / jnp.where(den_trans > 0, den_trans, 1.0)[..., None],
            tied.trans,
        )
        tied = tied.replace(senones=senones, trans=trans_new)
    return TrainResult(
        model=tied,
        iterations=iteration,
        mean_log_prob=history[-1] / max(n_valid, 1),
        exemplar_count=n_valid,
        log_prob_history=history,
    )
