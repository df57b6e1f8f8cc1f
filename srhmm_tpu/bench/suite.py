"""Benchmark suite: the five BASELINE.json configurations.

  1. single word, 5 states, 1 diag Gaussian, MFCC-13 (reference-scale)
  2. 10-word isolated digits, 8 states, 4-mix diag, full Baum-Welch
  3. continuous digit strings: composed word HMMs + token-passing decode
  4. ~40 monophones, 32-mix GMMs, embedded re-estimation
  5. tied-state triphones, 2k states x 16 mixtures, mixture-sharded EM

Each config reports EM audio-seconds/s (or decode RTF for config 3) on
whatever devices are visible; config 5 shards mixtures over a `model` mesh
axis when more than one device is present.  `python -m srhmm_tpu.bench.suite
[config...]` prints one JSON line per config.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FRAME_SHIFT_S = 0.01


def _synth_utts(rng, B, T, D, S):
    state_means = rng.normal(size=(S, D)) * 5.0
    utts = []
    for _ in range(B):
        bounds = np.sort(rng.choice(np.arange(1, T), S - 1, replace=False))
        ids = np.zeros(T, dtype=int)
        for k, b in enumerate(bounds):
            ids[b:] = k + 1
        utts.append(state_means[ids] + rng.normal(size=(T, D)))
    return utts


def _rand_model(rng, S, M, D, dtype):
    import jax.numpy as jnp

    from ..models import DIAG, GmmHmm, GmmStream, init_left_right_trans

    means = rng.normal(size=(S, M, D)) * 3.0
    var = rng.uniform(0.5, 1.5, size=(S, M, D))
    w = rng.uniform(0.3, 0.7, size=(S, M))
    w /= w.sum(-1, keepdims=True)
    return GmmHmm(
        trans=init_left_right_trans(S),
        streams=(
            GmmStream(
                weights=jnp.asarray(w),
                means=jnp.asarray(means),
                inv_cov=jnp.asarray(1.0 / var),
                det=jnp.asarray(np.prod(var, -1)),
                cov_type=DIAG,
            ),
        ),
    ).astype(dtype)


def _time_em(model, batch, iters=10, var_floor=0.0):
    """Steady-state seconds/EM-iteration on the PRODUCTION trainer:
    em_train_scan (N iterations as one jitted lax.scan) with the fused
    lane-major Pallas E-step when eligible.  Round-2's hand-forced
    fused=False is gone — the "Mosaic stalls minutes at S=5/D=13" turned
    out to be cold-server compile noise (fresh shapes compile in ~5 s
    through the scan; only k_block=128 unrolls genuinely stall, which
    e_step_fused_lane now caps), and the ~30 ms/call dispatch overhead of
    the per-call loop on this tunneled backend is amortized by the scan.
    Ineligible (non-TPU / multi-stream) workloads time the per-call XLA
    loop as before."""
    import jax.numpy as jnp

    from ..train.em import _fused_lane_eligible, em_step, em_train_scan

    if _fused_lane_eligible(model, batch, False):
        from ..ops.pallas.fused_em_pallas import trans_band

        band = trans_band(model.trans)
        feats_tdb = jnp.transpose(batch.features, (1, 2, 0))
        # enough iterations that the per-program-call tunnel RTT (~15 ms on
        # this backend) is noise next to the on-device per-iteration time
        iters = max(iters, 50)
        _, lps, _ = em_train_scan(
            model, batch, iters, feats_tdb, var_floor=var_floor, band=band
        )
        float(lps[-1])  # forced fetch: block_until_ready doesn't sync here
        t0 = time.perf_counter()
        _, lps, _ = em_train_scan(
            model, batch, iters, feats_tdb, var_floor=var_floor, band=band
        )
        float(lps[-1])
        return (time.perf_counter() - t0) / iters

    new_model, lp, nv = em_step(model, batch, var_floor, fused=False)
    float(lp)
    model = new_model
    t0 = time.perf_counter()
    for _ in range(iters):
        model, lp, nv = em_step(model, batch, var_floor, fused=False)
    float(lp)
    return (time.perf_counter() - t0) / iters


def _time_em_xla(model, batch, iters=5, var_floor=0.0):
    """Seconds/EM-iteration on the XLA (non-Pallas) path, same scan driver —
    the in-session reference point for the fused speedup (absolute
    throughput on the tunneled chip swings ~2x between sessions, PERF.md;
    in-session fused/XLA ratios are stable)."""
    import jax.numpy as jnp

    from ..train.em import em_train_scan

    _, lps, _ = em_train_scan(model, batch, iters, var_floor=var_floor, fused=False)
    float(lps[-1])
    t0 = time.perf_counter()
    _, lps, _ = em_train_scan(model, batch, iters, var_floor=var_floor, fused=False)
    float(lps[-1])
    return (time.perf_counter() - t0) / iters


def config1(rng):
    """Reference-scale: 1 word, 5 states, 1 diag Gaussian, MFCC-13."""
    import jax.numpy as jnp

    from ..io.dataset import pack_utterances

    S, M, D, B, T = 5, 1, 13, 64, 300
    model = _rand_model(rng, S, M, D, jnp.float32)
    batch = pack_utterances(_synth_utts(rng, B, T, D, S), dtype=jnp.float32)
    dt = _time_em(model, batch)
    dt_x = _time_em_xla(model, batch)
    return {"config": 1, "metric": "em_audio_s_per_s",
            "value": round(B * T * FRAME_SHIFT_S / dt, 1),
            "xla_value": round(B * T * FRAME_SHIFT_S / dt_x, 1)}


def config2(rng):
    """10-word digits, 8 states, 4-mix diag, full Baum-Welch."""
    import jax.numpy as jnp

    from ..io.dataset import pack_utterances

    S, M, D, B, T = 8, 4, 13, 256, 500
    model = _rand_model(rng, S, M, D, jnp.float32)
    batch = pack_utterances(_synth_utts(rng, B, T, D, S), dtype=jnp.float32)
    dt = _time_em(model, batch)
    dt_x = _time_em_xla(model, batch)
    return {"config": 2, "metric": "em_audio_s_per_s",
            "value": round(B * T * FRAME_SHIFT_S / dt, 1),
            "xla_value": round(B * T * FRAME_SHIFT_S / dt_x, 1)}


def _decode_rtf(rng, W, S, M, D, T, n=20):
    """Continuous-decode RTF for a W-word loop (block token passing)."""
    import jax
    import jax.numpy as jnp

    from ..decode.continuous import (
        compose_word_loop_blocks,
        composed_emissions,
        token_passing_blocks,
    )
    from ..models import stack_models

    vocab = stack_models(
        [_rand_model(rng, S, M, D, jnp.float32).replace(word=f"w{i}") for i in range(W)]
    )
    graph = compose_word_loop_blocks(vocab)
    frames = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)

    def decode(frames):
        log_b = composed_emissions(vocab, frames)
        return token_passing_blocks(graph, log_b, n_best=1)

    jitted = jax.jit(decode)
    out = jitted(frames)
    float(np.asarray(out[0])[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jitted(frames)
    float(np.asarray(out[0])[0, 0])  # forced fetch: see _time_em note
    return (time.perf_counter() - t0) / n / (T * FRAME_SHIFT_S)


def _fused_decode_rtf(rng, W, S, M, D, T, B=128, n=5, bigram=False):
    """Per-utterance RTF of the fused BATCHED decode kernel
    (ops/pallas/decode_pallas.py): B utterances decode concurrently on the
    128 lanes, including the batched device backtrace.  bigram=True runs a
    genuine (W, W) LM through the in-kernel (max, +) cross-arc contraction
    (round 4)."""
    import jax
    import jax.numpy as jnp

    from ..decode.continuous import (
        backtrace_batch_device,
        compose_word_loop_blocks,
        token_passing_fused,
    )
    from ..io.dataset import UtteranceBatch
    from ..models import stack_models

    vocab = stack_models(
        [_rand_model(rng, S, M, D, jnp.float32).replace(word=f"w{i}") for i in range(W)]
    )
    lm = np.log(rng.dirichlet(np.ones(W), size=W)) if bigram else None
    graph = compose_word_loop_blocks(vocab, lm_logprobs=lm)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    batch = UtteranceBatch(features=feats, lengths=jnp.full((B,), T, jnp.int32))

    def run():
        f, b, s_eff = token_passing_fused(vocab, graph, batch, interpret=False)
        states = jnp.argmax(
            jnp.where(
                jnp.arange(W * s_eff)[:, None] % s_eff == S - 1, f, -1e30
            ),
            axis=0,
        )
        paths = backtrace_batch_device(b, states)
        return float(paths[0, 0] + paths[-1, -1])  # forced fetch

    run()
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    return (time.perf_counter() - t0) / n / (B * T * FRAME_SHIFT_S)


def _fused_k2_rtf(
    rng, W, S, M, D, T, B=128, n=5, bigram=False, k_block=4, n_best=2
):
    """Per-utterance RTF of the n_best=K fused decode kernels (K=2: two
    token planes + in-kernel top-2 merges, round 4; K>=3: the K-slot
    insertion network, with the bigram take counter DESTINATION-TILED
    since round 5 so W=200 bigram K>2 runs fused)."""
    import jax
    import jax.numpy as jnp

    from ..decode.continuous import (
        compose_word_loop_blocks,
        token_passing_fused_k2,
        token_passing_fused_kn,
    )
    from ..io.dataset import UtteranceBatch
    from ..models import stack_models

    vocab = stack_models(
        [_rand_model(rng, S, M, D, jnp.float32).replace(word=f"w{i}") for i in range(W)]
    )
    lm = np.log(rng.dirichlet(np.ones(W), size=W)) if bigram else None
    graph = compose_word_loop_blocks(vocab, lm_logprobs=lm)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    batch = UtteranceBatch(features=feats, lengths=jnp.full((B,), T, jnp.int32))

    def run():
        if n_best == 2:
            f, b, _ = token_passing_fused_k2(
                vocab, graph, batch, k_block=k_block, interpret=False
            )
        else:
            f, b, _ = token_passing_fused_kn(
                vocab, graph, batch, n_best=n_best, k_block=1,
                interpret=False,
            )
        return float(jnp.max(f[0]) + jnp.max(f[1]))  # forced fetch

    run()
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    return (time.perf_counter() - t0) / n / (B * T * FRAME_SHIFT_S)


def config3(rng):
    """Continuous strings: composed word-loop token-passing decode RTF at
    W=10 (BASELINE config) and W=200 — the XLA block engine (single
    utterance) and the fused batched decode kernel (128 utterances per
    pass, round 3)."""
    rtf10 = _decode_rtf(rng, W=10, S=8, M=4, D=13, T=1000)
    rtf200 = _decode_rtf(rng, W=200, S=8, M=4, D=13, T=1000)
    out = {"config": 3, "metric": "decode_rtf", "value": round(rtf10, 6),
           "audio_s_per_s": round(1.0 / rtf10, 1),
           "decode_rtf_w200": round(rtf200, 6),
           "w200_audio_s_per_s": round(1.0 / rtf200, 1)}
    try:
        import jax

        if jax.default_backend() == "tpu":
            f200 = _fused_decode_rtf(rng, W=200, S=8, M=4, D=13, T=1000)
            out["fused_batch_rtf_w200"] = round(f200, 6)
            out["fused_w200_audio_s_per_s"] = round(1.0 / f200, 1)
            bg200 = _fused_decode_rtf(
                rng, W=200, S=8, M=4, D=13, T=1000, bigram=True
            )
            out["bigram_fused_rtf_w200"] = round(bg200, 6)
            out["bigram_fused_w200_audio_s_per_s"] = round(1.0 / bg200, 1)
            k2 = _fused_k2_rtf(rng, W=200, S=8, M=4, D=13, T=1000)
            out["k2_fused_rtf_w200"] = round(k2, 6)
            out["k2_fused_w200_audio_s_per_s"] = round(1.0 / k2, 1)
            k2b = _fused_k2_rtf(
                rng, W=200, S=8, M=4, D=13, T=1000, bigram=True
            )
            out["k2_bigram_fused_rtf_w200"] = round(k2b, 6)
            out["k2_bigram_fused_w200_audio_s_per_s"] = round(1.0 / k2b, 1)
            # round 5: W=200 bigram K=3 rides the destination-tiled take
            # counter (previously W-gated to the XLA engine)
            k3b = _fused_k2_rtf(
                rng, W=200, S=8, M=4, D=13, T=1000, bigram=True, n_best=3,
            )
            out["k3_bigram_fused_rtf_w200"] = round(k3b, 6)
            out["k3_bigram_fused_w200_audio_s_per_s"] = round(1.0 / k3b, 1)
    except Exception as e:  # pragma: no cover
        out["fused_decode_error"] = str(e)[:120]
    return out


def config4(rng):
    """~40 monophones, 32-mix GMMs, embedded re-estimation."""
    import jax
    import jax.numpy as jnp

    from ..models import stack_models
    from ..train.embedded import embedded_em_step

    P, S, M, D = 40, 3, 32, 13
    B, T, L = 512, 512, 12  # B saturates one chip (throughput flat past 512)
    units = [_rand_model(rng, S, M, D, jnp.float32).replace(word=f"p{i}") for i in range(P)]
    models = stack_models(units)
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    # PRODUCTION path (round 5): the train_embedded driver runs iterations
    # as device-side scans (_embedded_chunk) — per-step program dispatches
    # over the tunneled backend cost several ms each and dominated the
    # round-4 numbers (7.1 ms/step dispatched vs 1.65 ms/step in-scan,
    # hardware-measured, scratch/r5_gamma_ab.py)
    from ..train.embedded import _embedded_chunk

    packed = ((transcripts, feats, lengths),)
    k = 10
    mm, lps, _ = _embedded_chunk(models, packed, k, 0.0, True)
    float(lps[-1])  # forced fetch: block_until_ready does not sync here
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        mm, lps, _ = _embedded_chunk(mm, packed, k, 0.0, True)
    float(lps[-1])
    dt = (time.perf_counter() - t0) / (n * k)
    # single-dispatch step (the round-4 metric) for continuity
    models, lp, _nv = embedded_em_step(models, transcripts, feats, lengths)
    float(lp)
    t0 = time.perf_counter()
    for _ in range(5):
        models, lp, _nv = embedded_em_step(models, transcripts, feats, lengths)
    float(lp)
    dt_step = (time.perf_counter() - t0) / 5
    # in-session XLA reference point (2 iterations; the XLA composed path
    # is several-fold slower, n=2 bounds bench time)
    mx, lpx, _ = embedded_em_step(models, transcripts, feats, lengths, fused=False)
    float(lpx)
    t0 = time.perf_counter()
    for _ in range(2):
        mx, lpx, _ = embedded_em_step(mx, transcripts, feats, lengths, fused=False)
    float(lpx)
    dt_x = (time.perf_counter() - t0) / 2
    return {"config": 4, "metric": "em_audio_s_per_s",
            "value": round(B * T * FRAME_SHIFT_S / dt, 1),
            "per_dispatch_value": round(B * T * FRAME_SHIFT_S / dt_step, 1),
            "xla_value": round(B * T * FRAME_SHIFT_S / dt_x, 1)}


def config5(rng):
    """Tied-state triphones: 2k senones x 16 mixtures, tied embedded EM.

    500 context-dependent units (3 states each) share a 2000-senone
    inventory; senone-space statistics are the mixture-sharded all-reduce
    payload on a multi-chip mesh."""
    import jax
    import jax.numpy as jnp
    import time as _time

    from ..models import stack_models
    from ..models.tying import tie_from_models
    from ..train.tied import tied_em_step

    P, S, M, D = 700, 3, 16, 39
    N = 2000
    B, T, L = 1024, 304, 10  # B saturates one chip
    units = [
        _rand_model(np.random.default_rng(1000 + i), S, M, D, jnp.float32)
        .replace(word=f"tri{i}")
        for i in range(P)
    ]
    sm = rng.integers(0, N, size=(P, S)).astype(np.int32)
    cover = -(-N // S)  # enough units to touch every senone id at least once
    sm[:cover, :] = np.minimum(np.arange(cover * S).reshape(-1, S), N - 1)
    tied = tie_from_models(stack_models(units), sm).astype(jnp.float32)
    transcripts = jnp.asarray(rng.integers(0, P, size=(B, L)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    # PRODUCTION path (round 5): the train_tied driver's device-side scan
    # (_tied_chunk) — per-step dispatches dominated the round-4 numbers
    # (see config4 note; 11.2 ms/step dispatched vs 2.2 ms in-scan)
    from ..train.tied import _tied_chunk

    packed = ((transcripts, feats, lengths),)
    k = 10
    tt, lps, _ = _tied_chunk(tied, packed, k, 0.1, True)
    float(lps[-1])
    t0 = _time.perf_counter()
    for _ in range(3):
        tt, lps, _ = _tied_chunk(tt, packed, k, 0.1, True)
    float(lps[-1])
    dt = (_time.perf_counter() - t0) / (3 * k)

    new_tied, lp, nv = tied_em_step(tied, transcripts, feats, lengths, var_floor=0.1)
    float(lp)
    t0 = _time.perf_counter()
    n = 3
    cur = new_tied
    for _ in range(n):
        cur, lp, nv = tied_em_step(cur, transcripts, feats, lengths, var_floor=0.1)
    float(lp)
    dt_step = (_time.perf_counter() - t0) / n
    tx, lpx, _ = tied_em_step(cur, transcripts, feats, lengths, var_floor=0.1, fused=False)
    float(lpx)
    t0 = _time.perf_counter()
    for _ in range(2):
        tx, lpx, _ = tied_em_step(tx, transcripts, feats, lengths, var_floor=0.1, fused=False)
    float(lpx)
    dt_x = (_time.perf_counter() - t0) / 2
    return {"config": 5, "metric": "em_audio_s_per_s",
            "value": round(B * T * FRAME_SHIFT_S / dt, 1),
            "per_dispatch_value": round(B * T * FRAME_SHIFT_S / dt_step, 1),
            "xla_value": round(B * T * FRAME_SHIFT_S / dt_x, 1),
            "senones": N, "units": P, "devices": len(jax.devices())}


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    which = [int(a) for a in argv] or [1, 2, 3]
    rng = np.random.default_rng(0)
    for c in which:
        out = CONFIGS[c](rng)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
