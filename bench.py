#!/usr/bin/env python3
"""Headline benchmark: Baum-Welch EM training throughput (audio-seconds/s).

Workload (within the reference C's compile-time limits so the baseline can run
the identical job): diagonal-covariance GMM-HMM, 8 states, 3 mixtures/state,
9-dim features, 64 utterances x 500 frames (10 ms shift -> 5 s audio each).

* ours: train/em.py fast path (log-space batched EM), f32, one chip, steady-
  state per-iteration time after compile.
* baseline: the reference diag trainer (train/source/hmm-fs/
  hmm_continuous_fs.c) compiled -O2 and run on the same synthetic dataset on
  this machine's CPU; per-iteration time = total EM wall time / iterations
  reported in its .txt.  Cached in .bench_baseline.json (delete to re-measure).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
CACHE = REPO / ".bench_baseline.json"
REF_SRC = pathlib.Path("/root/reference/train/source/hmm-fs/hmm_continuous_fs.c")

S, M, D, B, T = 8, 3, 9, 64, 500  # C-baseline job (within its limits)
OUR_B = 2048  # our side runs the same per-frame workload over a larger
             # data-parallel batch; audio-seconds/s is batch-normalized
FRAME_SHIFT_S = 0.01
AUDIO_SECONDS = B * T * FRAME_SHIFT_S  # per EM iteration


def make_dataset(seed=0):
    """Synthetic utterances from a wandering left-right process (well-behaved
    for EM: distinct per-state means, moderate variances)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    state_means = rng.normal(size=(S, D)) * 5.0
    utts = []
    for _ in range(B):
        # soft left-to-right progression
        bounds = np.sort(rng.choice(np.arange(1, T), S - 1, replace=False))
        ids = np.zeros(T, dtype=int)
        for k, b in enumerate(bounds):
            ids[b:] = k + 1
        utts.append(state_means[ids] + rng.normal(size=(T, D)))
    return utts


def bench_ours(utts) -> float:
    """Seconds per EM iteration (steady state), per OUR_B-utterance batch."""
    import jax
    import jax.numpy as jnp

    from srhmm_tpu.init.lbg import create_initial_model
    from srhmm_tpu.io.dataset import pack_utterances
    from srhmm_tpu.train.em import em_step

    model = create_initial_model([utts], S, [M], cov_type="diag").astype(
        jnp.float32
    )
    reps = -(-OUR_B // len(utts))
    batch = pack_utterances(
        (utts * reps)[:OUR_B], pad_multiple=128, dtype=jnp.float32
    )

    new_model, lp, nv = em_step(model, batch)  # compile + warm
    float(lp)  # NOTE: block_until_ready does not synchronize on this
    model = new_model  # environment's TPU backend; a scalar fetch does

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        model, lp, nv = em_step(model, batch)
    last = float(lp)  # forces completion of the whole chained sequence
    dt = (time.perf_counter() - t0) / n_iter
    assert float(nv) == OUR_B, f"invalid utterances in bench: {float(nv)}"
    return dt


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
    import struct

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


def main():
    utts = make_dataset()
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
            }
        )
    )


if __name__ == "__main__":
    main()
