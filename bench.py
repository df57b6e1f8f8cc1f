#!/usr/bin/env python3
"""Headline benchmarks. Prints one JSON line per metric; the FINAL line is
the headline EM-training metric (with the decode RTF attached), so both
BASELINE.json metrics — EM audio-seconds/s and Viterbi decode RTF — are in
the recorded output.

1. EM training throughput (audio-seconds of speech processed per second of
   wall time, steady-state per-iteration):
   * workload: diagonal-covariance GMM-HMM, 8 states, 3 mixtures/state,
     9-dim features, 500-frame utterances (10 ms shift -> 5 s audio each) —
     within the reference C's compile-time limits so the baseline can run
     the identical job.
   * ours: train/em.py em_step — the fused lane-major Pallas E-step
     (ops/pallas/fused_em_pallas.py) on the TPU, f32, B=2048 batch.
   * baseline: the reference diag trainer (train/source/hmm-fs/
     hmm_continuous_fs.c) compiled -O2 on this machine's CPU; per-iteration
     time = EM wall time / iterations (cached in .bench_baseline.json).

2. Viterbi decode RTF: continuous token-passing decode (block engine,
   decode/continuous.py) over a 13-word loop of reference-scale models
   (6 states, 1 mixture, 9-dim) — real-time factor = decode seconds per
   audio second.  Baseline: the C recognizer's implied RTF 0.021
   (hmm-result.txt: 0.03 s per 1.42 s utterance; BASELINE.md).

3. All five suite configs (bench/suite.py): reference-scale EM, 10-word
   4-mix EM, continuous word-loop decode RTF (W=10/200), 40-monophone
   32-mix embedded re-estimation, 2k-senone tied-state EM.
"""

import json
import pathlib
import shutil
import struct
import subprocess
import time

REPO = pathlib.Path(__file__).resolve().parent
CACHE = REPO / ".bench_baseline.json"
REF_SRC = pathlib.Path("/root/reference/train/source/hmm-fs/hmm_continuous_fs.c")

S, M, D, B, T = 8, 3, 9, 64, 500  # C-baseline job (within its limits)
OUR_B = 2048  # our side runs the same per-frame workload over a larger
             # data-parallel batch; audio-seconds/s is batch-normalized
FRAME_SHIFT_S = 0.01
AUDIO_SECONDS = B * T * FRAME_SHIFT_S  # per C EM iteration
BASELINE_DECODE_RTF = 0.021  # hmm-result.txt:182-183 (BASELINE.md row 4)


def make_dataset(seed=0):
    """Synthetic utterances from a wandering left-right process (well-behaved
    for EM: distinct per-state means, moderate variances)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    state_means = rng.normal(size=(S, D)) * 5.0
    utts = []
    for _ in range(B):
        bounds = np.sort(rng.choice(np.arange(1, T), S - 1, replace=False))
        ids = np.zeros(T, dtype=int)
        for k, b in enumerate(bounds):
            ids[b:] = k + 1
        utts.append(state_means[ids] + rng.normal(size=(T, D)))
    return utts


def bench_ours(utts) -> float:
    """Seconds per EM iteration (steady state), per OUR_B-utterance batch,
    on the production training path: em_train_scan — N iterations of the
    fused lane-major Pallas E-step + M-step as ONE jitted lax.scan program
    (per-iteration program launches and host syncs are pure overhead at a
    fixed iteration budget; the reference's convergence rule needs a host
    check per iteration and train_fast still provides it)."""
    import jax
    import jax.numpy as jnp

    from srhmm_tpu.init.lbg import create_initial_model
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.ops.pallas.fused_em_pallas import trans_band
    from srhmm_tpu.train.em import em_train_scan

    model = create_initial_model([utts], S, [M], cov_type="diag").astype(
        jnp.float32
    )
    reps = -(-OUR_B // len(utts))
    batch = pack_utterances(
        (utts * reps)[:OUR_B], pad_multiple=128, dtype=jnp.float32
    )
    band = trans_band(model.trans)
    feats_tdb = jnp.transpose(batch.features, (1, 2, 0))

    n_iter = 20
    final, lps, nvs = em_train_scan(model, batch, n_iter, feats_tdb, band=band)
    float(lps[-1])  # NOTE: block_until_ready does not synchronize on this
    # environment's TPU backend; a scalar fetch does
    reps_outer = 3
    t0 = time.perf_counter()
    for _ in range(reps_outer):
        final, lps, nvs = em_train_scan(model, batch, n_iter, feats_tdb, band=band)
    last = float(lps[-1])  # forces completion of the chained sequence
    dt = (time.perf_counter() - t0) / (reps_outer * n_iter)
    import numpy as np

    assert (np.asarray(nvs) == OUR_B).all(), "invalid utterances in bench"
    return dt


def bench_decode_rtf() -> float:
    """Continuous Viterbi decode RTF at reference scale: 13-word loop of
    6-state 1-mixture 9-dim models, block token passing, T=1000 frames."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srhmm_tpu.decode.continuous import (
        compose_word_loop_blocks,
        composed_emissions,
        token_passing_blocks,
    )
    from srhmm_tpu.models import DIAG, GmmHmm, GmmStream, init_left_right_trans, stack_models

    W, Sd, Dd, Td = 13, 6, 9, 1000
    rng = np.random.default_rng(1)

    def one(seed):
        r = np.random.default_rng(seed)
        means = r.normal(size=(Sd, 1, Dd)) * 4.0
        var = r.uniform(0.5, 1.5, size=(Sd, 1, Dd))
        return GmmHmm(
            trans=init_left_right_trans(Sd),
            streams=(
                GmmStream(
                    weights=jnp.ones((Sd, 1)),
                    means=jnp.asarray(means),
                    inv_cov=jnp.asarray(1.0 / var),
                    det=jnp.asarray(np.prod(var, -1)),
                    cov_type=DIAG,
                ),
            ),
            word=f"w{seed}",
        )

    vocab = stack_models([one(i) for i in range(W)]).astype(jnp.float32)
    graph = compose_word_loop_blocks(vocab)
    frames = jnp.asarray(rng.normal(size=(Td, Dd)), jnp.float32)

    @jax.jit
    def decode(frames):
        log_b = composed_emissions(vocab, frames)
        final, bps = token_passing_blocks(graph, log_b, n_best=1)
        return final

    out = decode(frames)
    float(jnp.max(out))
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = decode(frames)
    float(jnp.max(out))
    dt = (time.perf_counter() - t0) / n
    return dt / (Td * FRAME_SHIFT_S)


def bench_recognition(cov_type: str = "diag") -> float:
    """Batch isolated-word recognition throughput (audio-s scored per
    second): 13-word reference-scale vocabulary, every utterance scored
    against every word on the fused lane-major scoring kernel
    (ops/pallas/scoring_pallas.py).  The C recognizer scores one utterance
    against the 13 models in 0.03 s (hmm-result.txt:182) = ~47 audio-s/s.
    cov_type="full" is the apples-to-apples workload: R1 (the program
    behind the golden report) scores FULL-covariance models
    (recognition-full-fs/recognition_continuous_full_fs.c:822-836), and
    the fused scorer rides the Cholesky z-GEMM for it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.models import DIAG, FULL, GmmHmm, GmmStream, init_left_right_trans, stack_models
    from srhmm_tpu.ops.pallas.scoring_pallas import (
        NEG_INF,
        pack_vocab_constants,
        vocab_scores_pallas,
    )

    W, Sr, Dr, Br, Tr = 13, 6, 9, 2048, 500
    rng = np.random.default_rng(2)

    def one(seed):
        r = np.random.default_rng(seed)
        means = r.normal(size=(Sr, 1, Dr)) * 4.0
        if cov_type == "full":
            a_rnd = r.normal(size=(Sr, 1, Dr, Dr)) * 0.3
            cov = a_rnd @ np.swapaxes(a_rnd, -1, -2) + np.eye(Dr)[None, None]
            inv_cov, det = np.linalg.inv(cov), np.linalg.det(cov)
            ct = FULL
        else:
            var = r.uniform(0.5, 1.5, size=(Sr, 1, Dr))
            inv_cov, det = 1.0 / var, np.prod(var, -1)
            ct = DIAG
        return GmmHmm(
            trans=init_left_right_trans(Sr),
            streams=(
                GmmStream(
                    weights=jnp.ones((Sr, 1)),
                    means=jnp.asarray(means),
                    inv_cov=jnp.asarray(inv_cov),
                    det=jnp.asarray(det),
                    cov_type=ct,
                ),
            ),
            word=f"w{seed}",
        )

    vocab = stack_models([one(i) for i in range(W)]).astype(jnp.float32)
    batch = pack_utterances(
        [rng.normal(size=(Tr, Dr)) for _ in range(64)] * (Br // 64),
        pad_multiple=128,
        dtype=jnp.float32,
    )
    a_c, bias_g_c, bias_c, logw_c, diag_c, band = pack_vocab_constants(
        vocab, jnp.float32
    )

    @jax.jit
    def score(feats, lengths):
        f_tdb = jnp.transpose(feats, (1, 2, 0))
        la = vocab_scores_pallas(
            f_tdb, a_c, bias_g_c, bias_c, logw_c, diag_c, lengths,
            s_word=Sr, band=band, k_block=32, semiring="sum", interpret=False,
        ).reshape(W, Sr, -1)
        sc = jax.nn.logsumexp(jnp.maximum(la, NEG_INF), axis=1)
        best = jnp.argmax(sc, axis=0)  # recognized word per utterance
        return jnp.sum(best) + jnp.sum(jnp.where(sc > NEG_INF / 2, sc, 0.0))

    out = score(batch.features, batch.lengths)
    float(out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = score(batch.features, batch.lengths)
    float(out)
    dt = (time.perf_counter() - t0) / n
    return Br * Tr * FRAME_SHIFT_S / dt


def _stat_rel_err(ref, got) -> float:
    import numpy as np

    worst = 0.0
    pairs = [
        (ref.num_trans, got.num_trans),
        (ref.den_trans, got.den_trans),
        (ref.den_mix, got.den_mix),
        (ref.streams[0].w, got.streams[0].w),
        (ref.streams[0].x, got.streams[0].x),
        (ref.streams[0].xx, got.streams[0].xx),
    ]
    for a, b in pairs:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        worst = max(worst, float(np.abs(a - b).max() / max(np.abs(a).max(), 1.0)))
    return worst


def hardware_equivalence(utts) -> dict:
    """ON-DEVICE E-step cross-checks (round-4 gate), diag AND full cov.

    Every Pallas equivalence test runs interpret-mode on the forced-CPU
    mesh (tests/conftest.py), which structurally cannot catch Mosaic
    miscompiles — all three hardware-only bugs found in round 3 (f64-range
    overflow at array creation, bf16 GEMM precision, no-x64 f64 silently
    f32) were found by ad-hoc scripts.  Two checks, both on the real chip:

    1. MISCOMPILE gate: the fused kernels COMPILED (Mosaic) vs the same
       kernels in INTERPRET mode (identical arithmetic and op order, only
       the codegen differs) — log-Z relative <= 1e-6, stats <= 1e-5.
       Hardware-measured bitwise identical on a healthy path, so any
       Mosaic codegen divergence is self-announcing.
    2. ALGORITHM gate: fused vs the independent XLA e_step — loose f32
       bounds (log-Z rel <= 1e-2, stats <= 0.3).  The two paths differ by
       MXU default-precision noise at raw feature scale (hardware-measured
       3.4e-3 log-Z rel on this tunneled backend's degraded-precision
       session state; both sit tens of nats from the f64 oracle, the
       documented reason --cmvn exists), so this bound catches wholesale
       divergence, not rounding.  A deliberate kernel perturbation fails
       THIS check (it moves compiled and interpret together, away from
       XLA).

    bench.py exits nonzero if either gate fails."""
    import jax.numpy as jnp

    from srhmm_tpu.init.lbg import create_initial_model
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.train.em import e_step, e_step_fused_lane

    out = {"metric": "hw_equivalence"}
    ok = True
    batch = pack_utterances(utts[:64], pad_multiple=128, dtype=jnp.float32)
    for cov in ("diag", "full"):
        model = create_initial_model([utts], S, [M], cov_type=cov).astype(
            jnp.float32
        )
        comp = e_step_fused_lane(model, batch, interpret=False)
        interp = e_step_fused_lane(model, batch, interpret=True)
        xla = e_step(model, batch)
        lz_c = float(comp.log_prob)
        mis_lz = abs(lz_c - float(interp.log_prob)) / max(abs(lz_c), 1.0)
        mis_st = _stat_rel_err(interp, comp)
        alg_lz = abs(lz_c - float(xla.log_prob)) / max(abs(float(xla.log_prob)), 1.0)
        alg_st = _stat_rel_err(xla, comp)
        this_ok = bool(
            mis_lz <= 1e-6 and mis_st <= 1e-5
            and alg_lz <= 1e-2 and alg_st <= 0.3
        )
        out[f"{cov}_miscompile_log_z_rel"] = float(f"{mis_lz:.3g}")
        out[f"{cov}_miscompile_stat_rel"] = float(f"{mis_st:.3g}")
        out[f"{cov}_vs_xla_log_z_rel"] = float(f"{alg_lz:.3g}")
        out[f"{cov}_vs_xla_stat_rel"] = float(f"{alg_st:.3g}")
        ok = ok and this_ok

    # decode-kernel family miscompile gate: compiled vs interpret of the
    # SAME fused word-loop Viterbi at a small shape — backpointers must be
    # int-identical, final scores within f32 accumulation noise
    try:
        import numpy as np

        from srhmm_tpu.decode.continuous import (
            compose_word_loop_blocks,
            token_passing_fused,
        )
        from srhmm_tpu.io.dataset import pack_utterances
        from srhmm_tpu.models import (
            DIAG, GmmHmm, GmmStream, init_left_right_trans, stack_models,
        )

        rng = np.random.default_rng(4)

        def one(seed, S=8, M=2, D=9):
            r = np.random.default_rng(seed)
            var = r.uniform(0.5, 1.5, size=(S, M, D))
            return GmmHmm(
                trans=init_left_right_trans(S),
                streams=(
                    GmmStream(
                        weights=jnp.ones((S, M)) / M,
                        means=jnp.asarray(r.normal(size=(S, M, D)) * 3.0),
                        inv_cov=jnp.asarray(1.0 / var),
                        det=jnp.asarray(np.prod(var, -1)),
                        cov_type=DIAG,
                    ),
                ),
                word=f"w{seed}",
            )

        dvocab = stack_models([one(i) for i in range(8)]).astype(jnp.float32)
        dgraph = compose_word_loop_blocks(dvocab)
        dbatch = pack_utterances(
            [rng.normal(size=(100 + 7 * i, 9)) for i in range(8)],
            pad_multiple=8, dtype=jnp.float32,
        )
        fc, bc, _ = token_passing_fused(
            dvocab, dgraph, dbatch, k_block=4, interpret=False
        )
        fi, bi, _ = token_passing_fused(
            dvocab, dgraph, dbatch, k_block=4, interpret=True
        )
        fc, fi = np.asarray(fc), np.asarray(fi)
        bp_mis = int((np.asarray(bc) != np.asarray(bi)).sum())
        msk = np.isfinite(fi) & (fi > -1e29)
        dec_abs = float(np.max(np.abs(fc[msk] - fi[msk])))
        out["decode_miscompile_bp_mismatches"] = bp_mis
        out["decode_miscompile_score_abs"] = float(f"{dec_abs:.3g}")
        ok = ok and bp_mis == 0 and dec_abs <= 1e-2

        # MULTI-STREAM fused decode (round 5): compiled vs interpret of
        # the same kernel with 2-stream emission sums.  NOT bitwise by
        # construction — the per-stream logsumexp sum adds an f32
        # reduction-order difference between codegens, so near-tie
        # backpointers can flip (hardware-measured 8 of 10.5M entries);
        # gate on scores tight + a tiny bp-flip allowance.
        ms_vocab2 = stack_models(
            [
                GmmHmm(
                    trans=one(i).trans,
                    streams=one(i).streams + one(i + 40, D=5).streams,
                    word=f"ms{i}",
                )
                for i in range(6)
            ]
        ).astype(jnp.float32)
        ms_graph = compose_word_loop_blocks(ms_vocab2)
        dbatch2 = pack_utterances(
            [rng.normal(size=(100 + 7 * i, 5)) for i in range(8)],
            pad_multiple=8, dtype=jnp.float32,
        )
        mfc, mbc, _ = token_passing_fused(
            ms_vocab2, ms_graph, (dbatch, dbatch2), k_block=4,
            interpret=False,
        )
        mfi, mbi, _ = token_passing_fused(
            ms_vocab2, ms_graph, (dbatch, dbatch2), k_block=4,
            interpret=True,
        )
        mfc, mfi = np.asarray(mfc), np.asarray(mfi)
        ms_bp = int((np.asarray(mbc) != np.asarray(mbi)).sum())
        ms_total = int(np.asarray(mbc).size)
        mm = np.isfinite(mfi) & (mfi > -1e29)
        ms_abs = float(np.max(np.abs(mfc[mm] - mfi[mm])))
        out["ms_decode_miscompile_bp_mismatch_frac"] = float(
            f"{ms_bp / ms_total:.3g}"
        )
        out["ms_decode_miscompile_score_abs"] = float(f"{ms_abs:.3g}")
        ok = ok and ms_bp <= ms_total * 1e-4 and ms_abs <= 2e-2
    except Exception as e:  # pragma: no cover
        out["decode_miscompile_error"] = str(e)[:120]
        ok = False

    # scoring-kernel family miscompile gate (round 5): compiled vs
    # interpret of the fused lane scorer across its whole matrix — diag,
    # full-cov, MULTI-STREAM (product-of-streams), and HETEROGENEOUS
    # (padded states + per-word final gather).  Same-arithmetic compare:
    # any Mosaic codegen divergence is self-announcing.
    try:
        import numpy as np

        from srhmm_tpu.io.dataset import pack_utterances
        from srhmm_tpu.models import (
            DIAG, FULL, GmmHmm, GmmStream, init_left_right_trans,
            pad_stack_models, stack_models,
        )
        from srhmm_tpu.ops.pallas.scoring_pallas import score_batch_fused_lane

        rng = np.random.default_rng(7)

        def mk(seed, S=6, M=2, D=9, cov="diag"):
            r = np.random.default_rng(seed)
            means = r.normal(size=(S, M, D)) * 3.0
            if cov == "full":
                a_r = r.normal(size=(S, M, D, D)) * 0.3
                covm = a_r @ np.swapaxes(a_r, -1, -2) + np.eye(D)[None, None]
                ic, det, ct = np.linalg.inv(covm), np.linalg.det(covm), FULL
            else:
                var = r.uniform(0.5, 1.5, size=(S, M, D))
                ic, det, ct = 1.0 / var, np.prod(var, -1), DIAG
            w = r.uniform(0.3, 0.7, size=(S, M))
            return GmmHmm(
                trans=init_left_right_trans(S),
                streams=(
                    GmmStream(
                        weights=jnp.asarray(w / w.sum(-1, keepdims=True)),
                        means=jnp.asarray(means),
                        inv_cov=jnp.asarray(ic),
                        det=jnp.asarray(det),
                        cov_type=ct,
                    ),
                ),
                word=f"w{seed}",
            )

        sb = pack_utterances(
            [rng.normal(size=(60 + 9 * i, 9)) for i in range(8)],
            pad_multiple=32, dtype=jnp.float32,
        )

        def gate(name, vocab, batch, **kw):
            nonlocal ok
            sc = np.asarray(
                score_batch_fused_lane(vocab, batch, interpret=False, **kw)
            )
            si = np.asarray(
                score_batch_fused_lane(vocab, batch, interpret=True, **kw)
            )
            m = np.isfinite(si)
            rel = float(
                np.max(np.abs(sc[m] - si[m]) / np.maximum(np.abs(si[m]), 1.0))
            ) if m.any() else 0.0
            rel = max(rel, float((np.isfinite(sc) != m).sum()))
            out[f"score_{name}_miscompile_rel"] = float(f"{rel:.3g}")
            # hardware-measured ~1.3e-7 on a healthy path (compiled and
            # interpret differ by f32 reduction order in the lane scorer's
            # in-kernel logsumexp); 1e-5 still catches codegen divergence
            ok = ok and rel <= 1e-5

        gate("diag", stack_models([mk(i) for i in range(5)]).astype(jnp.float32), sb)
        gate(
            "full",
            stack_models([mk(i, cov="full") for i in range(4)]).astype(jnp.float32),
            sb,
        )
        ms_vocab = stack_models(
            [
                GmmHmm(
                    trans=mk(i).trans,
                    streams=mk(i).streams + mk(i + 50).streams,
                    word=f"m{i}",
                )
                for i in range(4)
            ]
        ).astype(jnp.float32)
        gate("multistream", ms_vocab, (sb, sb))
        het, fin = pad_stack_models(
            [mk(0, S=4), mk(1, S=6), mk(2, S=6), mk(3, S=4)]
        )
        gate(
            "heterogeneous", het.astype(jnp.float32), sb,
            mode="final", final_states=fin,
        )
    except Exception as e:  # pragma: no cover
        out["score_miscompile_error"] = str(e)[:120]
        ok = False

    # composed-lattice (bank gather/scatter) family miscompile gate
    # (round 5): compiled vs interpret of the fused embedded E-step
    try:
        from srhmm_tpu.models import stack_models as _sm
        from srhmm_tpu.train.embedded import batch_stats_fused

        units = _sm([mk(i, S=4, M=2, D=9) for i in range(3)]).astype(jnp.float32)
        trs = jnp.asarray(rng.integers(0, 3, size=(8, 2)), jnp.int32)
        fts = jnp.asarray(rng.normal(size=(8, 32, 9)), jnp.float32)
        lns = jnp.asarray([32, 30, 28, 32, 26, 32, 31, 29], jnp.int32)
        cs = batch_stats_fused(units, trs, fts, lns, k_block=8, interpret=False)
        ci = batch_stats_fused(units, trs, fts, lns, k_block=8, interpret=True)
        clz = float(cs.log_prob)
        c_lz = abs(clz - float(ci.log_prob)) / max(abs(clz), 1.0)
        c_st = _stat_rel_err(ci, cs)
        out["composed_miscompile_log_z_rel"] = float(f"{c_lz:.3g}")
        out["composed_miscompile_stat_rel"] = float(f"{c_st:.3g}")
        ok = ok and c_lz <= 1e-6 and c_st <= 1e-5
    except Exception as e:  # pragma: no cover
        out["composed_miscompile_error"] = str(e)[:120]
        ok = False

    # fused-MFCC family miscompile gate (round 5): compiled vs interpret
    # of the STFT+mel+DCT kernel on one waveform
    try:
        import numpy as np

        from srhmm_tpu.features import FrontendConfig
        from srhmm_tpu.features.pallas_mfcc import mfcc_pallas

        wave = jnp.asarray(
            np.random.default_rng(9).normal(size=16_000), jnp.float32
        )
        fcfg = FrontendConfig()
        mc = np.asarray(mfcc_pallas(wave, fcfg, interpret=False))
        mi = np.asarray(mfcc_pallas(wave, fcfg, interpret=True))
        m_abs = float(np.max(np.abs(mc - mi)))
        out["mfcc_miscompile_abs"] = float(f"{m_abs:.3g}")
        ok = ok and m_abs <= 1e-3
    except Exception as e:  # pragma: no cover
        out["mfcc_miscompile_error"] = str(e)[:120]
        ok = False

    out["ok"] = ok
    return out


def bench_pipeline() -> dict:
    """The WHOLE framework as one system, on the chip, with a quality axis:
    synthetic audio -> fused MFCC -> LBG -> monophone fused EM -> decision
    tree -> tied fused EM -> materialize -> bigram n_best=2 fused decode ->
    WER (srhmm_tpu/pipeline.py), at three SNR conditions.  Clean synthetic
    speech should sit near 0% WER; the SNR rows give the decode numbers an
    accuracy story (VERDICT r4 #10).  Word count is FIXED per utterance so
    shape buckets collapse and TPU compile count stays bounded."""
    import dataclasses

    from srhmm_tpu.pipeline import PipelineConfig, run_pipeline

    out = {"metric": "pipeline_e2e"}
    base = PipelineConfig(min_words=3, max_words=3)
    t_all = time.perf_counter()
    for label, snr in (("clean", None), ("10db", 10.0), ("0db", 0.0)):
        cfg = dataclasses.replace(base, snr_db=snr)
        t0 = time.perf_counter()
        res = run_pipeline(
            cfg, n_train=40, n_test=16, max_iterations=5, tied_iterations=5,
            n_best=2, pad_multiple=128,
        )
        out[f"wer_{label}"] = round(res.wer.wer, 4)
        out[f"wall_s_{label}"] = round(time.perf_counter() - t0, 1)
    out["n_senones"] = res.n_senones
    out["n_units"] = res.n_units
    out["ref_words"] = res.wer.num_ref_words
    out["wall_s_total"] = round(time.perf_counter() - t_all, 1)
    return out


def bench_reference(utts) -> float | None:
    """Seconds per EM iteration of the reference C diag trainer; None if the
    reference isn't available.  Includes its per-iteration disk re-reads —
    that is how the reference works (T1:259/287)."""
    if CACHE.exists():
        try:
            return json.loads(CACHE.read_text())["ref_seconds_per_iter"]
        except Exception:
            pass
    if not REF_SRC.exists():
        return None
    import numpy as np

    work = pathlib.Path("/tmp/srhmm_bench_ref")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    exe = work / "hmm_fs"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(REF_SRC), "-lm"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        return None
    lines = []
    for i, u in enumerate(utts):
        p = work / f"u{i:03d}.perfil"
        with open(p, "wb") as f:
            f.write(struct.pack("<i", D))
            f.write(np.ascontiguousarray(u, dtype="<f8").tobytes())
        lines.append(str(p))
    (work / "list.txt").write_text("\n".join(lines) + "\n")
    t0 = time.perf_counter()
    r = subprocess.run(
        [str(exe), "bench", str(S), "1", str(M), str(work / "list.txt"),
         str(work / "out.hmm")],
        capture_output=True,
        text=True,
        cwd=work,
        timeout=3600,
    )
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        return None
    txt = (work / "out.txt").read_text()
    iters = int(txt.split("number of iterations:")[1].split()[0])
    per_iter = wall / max(iters, 1)
    CACHE.write_text(
        json.dumps(
            {"ref_seconds_per_iter": per_iter, "wall": wall, "iterations": iters}
        )
    )
    return per_iter


def session_calibration() -> dict:
    """30-second probe of THIS session's effective chip speed — recorded
    in every BENCH_r{N}.json so cross-round numbers can be read against
    the hardware state.  Round 4 measured a session at ~49 GB/s HBM copy
    and 6.9 TFLOP/s GEMM (~10x below the 450 GB/s / 70 TF/s roofline),
    with XLA-generated code degraded 5-10x while Pallas kernels ran at
    full speed (PERF.md): absolute numbers are meaningless without this
    context."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(16 * 1024 * 1024,)), jnp.float32
    )  # 64 MB
    copy = jax.jit(lambda x: (x + 1.0).ravel()[0])
    float(copy(x))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        o = copy(x)
    float(o)
    gbps = 2 * 64 / 1024 / ((time.perf_counter() - t0) / n)
    a = x[: 2048 * 2048].reshape(2048, 2048)
    gemm = jax.jit(
        lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32).ravel()[0]
    )
    float(gemm(a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = gemm(a)
    float(o)
    tflops = 2 * 2048**3 / ((time.perf_counter() - t0) / n) / 1e12
    return {
        "metric": "session_calibration",
        "hbm_copy_gbps": round(gbps, 1),
        "xla_gemm_tflops": round(tflops, 2),
    }


def main():
    utts = make_dataset()

    try:
        print(json.dumps(session_calibration()), flush=True)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "session_calibration", "error": str(e)[:120]}), flush=True)

    # all five suite configs — each is independent; failures don't block
    # the headline metrics
    try:
        from srhmm_tpu.bench import suite
        import numpy as np

        rng = np.random.default_rng(0)
        for c in (1, 2, 3, 4, 5):
            try:
                print(json.dumps(suite.CONFIGS[c](rng)), flush=True)
            except Exception as e:  # pragma: no cover
                print(json.dumps({"config": c, "error": str(e)[:120]}), flush=True)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"suite_error": str(e)[:120]}), flush=True)

    pipe = None
    try:
        pipe = bench_pipeline()
        print(json.dumps(pipe), flush=True)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "pipeline_e2e", "error": str(e)[:120]}), flush=True)

    for ct, name in (("diag", "batch_recognition_audio_s_per_sec"),
                     ("full", "batch_recognition_fullcov_audio_s_per_sec")):
        try:
            rec = bench_recognition(ct)
            print(
                json.dumps(
                    {
                        "metric": name,
                        "value": round(rec, 1),
                        "unit": "audio_s/s",
                        # C: 13-model score+rank in 0.03 s per 1.42 s utterance
                        "vs_baseline": round(rec / (1.42 / 0.03), 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # pragma: no cover
            print(
                json.dumps({"metric": name, "error": str(e)[:120]}),
                flush=True,
            )

    rtf = None
    try:
        rtf = bench_decode_rtf()
        print(
            json.dumps(
                {
                    "metric": "decode_rtf",
                    "value": round(rtf, 6),
                    "unit": "rtf",
                    "vs_baseline": round(BASELINE_DECODE_RTF / rtf, 1),
                }
            ),
            flush=True,
        )
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "decode_rtf", "error": str(e)[:120]}), flush=True)

    hw = hardware_equivalence(utts)
    print(json.dumps(hw), flush=True)

    ours = bench_ours(utts)
    ref = bench_reference(utts)
    ours_rate = OUR_B * T * FRAME_SHIFT_S / ours
    vs = (ours_rate / (AUDIO_SECONDS / ref)) if ref else None
    print(
        json.dumps(
            {
                "metric": "em_train_audio_seconds_per_sec",
                "value": round(ours_rate, 1),
                "unit": "audio_s/s",
                "vs_baseline": round(vs, 1) if vs else None,
                "decode_rtf": round(rtf, 6) if rtf else None,
                "decode_rtf_vs_baseline": (
                    round(BASELINE_DECODE_RTF / rtf, 1) if rtf else None
                ),
                "hw_equivalence_ok": hw["ok"],
                "pipeline_wer_clean": (
                    pipe.get("wer_clean") if pipe else None
                ),
                "pipeline_wer_0db": (
                    pipe.get("wer_0db") if pipe else None
                ),
            }
        )
    )
    if not hw["ok"]:  # self-announcing Mosaic-miscompile gate
        raise SystemExit("hardware equivalence gate FAILED: " + json.dumps(hw))


if __name__ == "__main__":
    main()
