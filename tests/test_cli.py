"""End-to-end CLI tests: the train/recognize entry points reproduce the
reference's golden artifacts when run against copies of its run directories."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from srhmm_tpu.io import read_hmm

REPO = Path(__file__).resolve().parent.parent


def _strip_volatile(text: str) -> str:
    return "\n".join(
        l
        for l in text.splitlines()
        if "Date and time" not in l
        and "Average recognition time" not in l
        and "time:" not in l
    )


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-m", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_recognize_cli_reproduces_golden_report(reference_root, tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "test" / "test", run / "test")
    r = _run(
        [
            "srhmm_tpu.cli.recognize",
            "1",
            "./test/models/models.txt",
            "1",
            "./test/perfil_data/mean_list.txt",
            "./test/words.txt",
            "./test/out.txt",
        ],
        cwd=run,
    )
    assert r.returncode == 0, r.stderr
    got = _strip_volatile((run / "test" / "out.txt").read_text())
    want = _strip_volatile(
        (reference_root / "test" / "test" / "result" / "hmm-result.txt").read_text()
    )
    assert got == want


def test_train_cli_reproduces_golden_model(reference_root, tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "train" / "test", run / "test")
    (run / "test" / "parameters.txt").write_text(
        "./test/perfil_data/mean_vc_186_f_03_ap_0225.perfil\n"
    )
    r = _run(
        [
            "srhmm_tpu.cli.train",
            "vc_186_f_03_ap_0225",
            "6",
            "1",
            "1",
            "./test/parameters.txt",
            "./test/out.hmm",
        ],
        cwd=run,
    )
    assert r.returncode == 0, r.stderr
    got = read_hmm(run / "test" / "out.hmm")
    gold = read_hmm(
        reference_root / "train" / "test" / "result" / "mean_vc_186_f_03_ap_0225.hmm"
    )
    np.testing.assert_allclose(
        np.asarray(got.trans), np.asarray(gold.trans), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.streams[0].inv_cov),
        np.asarray(gold.streams[0].inv_cov),
        rtol=1e-6,
    )
    # derived text-file naming + fixed fields
    txt = (run / "test" / "out.txt").read_text()
    assert "number of iterations: 3" in txt
    assert "mean probability: -7928.721460" in txt
    assert "number of exemplars in training sequence: 1" in txt


def test_train_cli_reproduces_golden_text(reference_root, tmp_path):
    """Trainer .txt summary byte-parity (modulo time lines) against the
    committed golden summary written by writing_text (T1:2421-2527).  The
    output path matches the reference run recipe so derived fields (model
    file, parameter list path) reproduce exactly."""
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "train" / "test", run / "test")
    (run / "test" / "parameters.txt").write_text(
        "./test/perfil_data/mean_vc_186_f_03_ap_0225.perfil\n"
    )
    r = _run(
        [
            "srhmm_tpu.cli.train",
            "vc_186_f_03_ap_0225",
            "6",
            "1",
            "1",
            "./test/parameters.txt",
            "./test/result/mean_vc_186_f_03_ap_0225.hmm",
        ],
        cwd=run,
    )
    assert r.returncode == 0, r.stderr
    got = _strip_volatile(
        (run / "test" / "result" / "mean_vc_186_f_03_ap_0225.txt").read_text()
    )
    want = _strip_volatile(
        (
            reference_root / "train" / "test" / "result" / "mean_vc_186_f_03_ap_0225.txt"
        ).read_text()
    )
    assert got == want


def test_cli_usage_errors():
    r = _run(["srhmm_tpu.cli.train"], cwd=REPO)
    assert r.returncode == 1
    assert "Usage:" in r.stderr
    r = _run(["srhmm_tpu.cli.recognize", "1"], cwd=REPO)
    assert r.returncode == 1
    assert "Usage:" in r.stderr


def test_decode_cli_end_to_end(reference_root, tmp_path):
    """Continuous-decode CLI on fixture models: each utterance decodes to its
    own word, WER 0%."""
    models = sorted((reference_root / "test/test/models").glob("*.hmm"))[:3]
    perfils = [
        reference_root / "test/test/perfil_data" / (m.stem.replace("mean_", "mean_") + ".perfil")
        for m in models
    ]
    (tmp_path / "models.txt").write_text("\n".join(str(m) for m in models) + "\n")
    (tmp_path / "inputs.txt").write_text("\n".join(str(p) for p in perfils) + "\n")
    (tmp_path / "refs.txt").write_text(
        "\n".join(m.stem.replace("mean_", "") for m in models) + "\n"
    )
    r = _run(
        [
            "srhmm_tpu.cli.decode",
            str(tmp_path / "models.txt"),
            str(tmp_path / "inputs.txt"),
            str(tmp_path / "out.txt"),
            "--ref",
            str(tmp_path / "refs.txt"),
        ],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    out = (tmp_path / "out.txt").read_text()
    assert "WER: 0.00%" in out


def test_decode_cli_batch_bigram(reference_root, tmp_path):
    """--batch --lm bigram --n-best 2 from the CLI (round 4).  The fixture
    models are FULL covariance, so this drives decode_continuous_batch's
    ineligible-graph fallback (per-utterance XLA engine) end-to-end; the
    fused path itself is equivalence-locked in test_continuous.py.  Each
    utterance must still decode to its own word as the 1-best."""
    models = sorted((reference_root / "test/test/models").glob("*.hmm"))[:3]
    perfils = [
        reference_root / "test/test/perfil_data" / (m.stem + ".perfil")
        for m in models
    ]
    names = [m.stem.replace("mean_", "") for m in models]
    (tmp_path / "models.txt").write_text("\n".join(str(m) for m in models) + "\n")
    (tmp_path / "inputs.txt").write_text("\n".join(str(p) for p in perfils) + "\n")
    (tmp_path / "refs.txt").write_text("\n".join(names) + "\n")
    import numpy as np

    W = len(models)
    lm = np.log(np.random.default_rng(0).dirichlet(np.ones(W), size=W))
    lines = [
        f"{names[u]} {names[v]} {lm[u, v]:.6f}"
        for u in range(W)
        for v in range(W)
    ]
    (tmp_path / "lm.txt").write_text("\n".join(lines) + "\n")
    r = _run(
        [
            "srhmm_tpu.cli.decode",
            str(tmp_path / "models.txt"),
            str(tmp_path / "inputs.txt"),
            str(tmp_path / "out.txt"),
            "--batch",
            "--n-best", "2",
            "--lm", str(tmp_path / "lm.txt"),
            "--ref", str(tmp_path / "refs.txt"),
        ],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    out = (tmp_path / "out.txt").read_text()
    assert "WER: 0.00%" in out
    assert "2-best" in out


def test_features_cli_wav_to_perfil(tmp_path):
    """WAV -> MFCC -> .perfil round trip through the features CLI."""
    import struct
    import wave

    import numpy as np

    wav = tmp_path / "tone.wav"
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    (tmp_path / "wavs.txt").write_text(str(wav) + "\n")
    out_dir = tmp_path / "feats"
    r = _run(
        ["srhmm_tpu.cli.features", str(tmp_path / "wavs.txt"), str(out_dir)],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from srhmm_tpu.io import read_perfil

    feats = read_perfil(out_dir / "tone.perfil")
    assert feats.shape == (98, 13)
    assert np.isfinite(feats).all()


def test_train_cli_scan_iters_fixed_budget(reference_root, tmp_path):
    """--scan-iters N (fast path) trains a fixed N-iteration budget through
    em_train_scan (one jitted scan, no convergence host syncs) and writes a
    valid model + text summary reporting exactly N iterations."""
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "train" / "test", run / "test")
    (run / "test" / "parameters.txt").write_text(
        "./test/perfil_data/mean_vc_186_f_03_ap_0225.perfil\n"
    )
    r = _run(
        [
            "srhmm_tpu.cli.train",
            "--numerics", "fast",
            "--scan-iters", "4",
            "vc_186_f_03_ap_0225",
            "6",
            "1",
            "1",
            "./test/parameters.txt",
            "./test/out.hmm",
        ],
        cwd=run,
    )
    assert r.returncode == 0, r.stderr
    assert "after 4 iterations" in r.stdout
    got = read_hmm(run / "test" / "out.hmm")
    assert got.num_states == 6
    # the fixed-budget model should be close to the converged golden one
    gold = read_hmm(
        reference_root / "train" / "test" / "result" / "mean_vc_186_f_03_ap_0225.hmm"
    )
    np.testing.assert_allclose(
        np.asarray(got.streams[0].means),
        np.asarray(gold.streams[0].means),
        rtol=5e-2, atol=5e-2,
    )
    txt = (run / "test" / "out.txt").read_text()
    assert "number of iterations: 4" in txt


def test_train_cli_fast_cmvn_close_to_golden(reference_root, tmp_path):
    """--numerics fast --cmvn global trains in normalized space and exports
    a de-normalized raw-space model; on the fixture word the f32+CMVN model
    must land near the f64 golden model and report the Jacobian-corrected
    mean probability."""
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "train" / "test", run / "test")
    (run / "test" / "parameters.txt").write_text(
        "./test/perfil_data/mean_vc_186_f_03_ap_0225.perfil\n"
    )
    r = _run(
        [
            "srhmm_tpu.cli.train",
            "--numerics", "fast",
            "--cmvn", "global",
            "vc_186_f_03_ap_0225",
            "6",
            "1",
            "1",
            "./test/parameters.txt",
            "./test/out.hmm",
        ],
        cwd=run,
    )
    assert r.returncode == 0, r.stderr
    got = read_hmm(run / "test" / "out.hmm")
    gold = read_hmm(
        reference_root / "train" / "test" / "result" / "mean_vc_186_f_03_ap_0225.hmm"
    )
    np.testing.assert_allclose(
        np.asarray(got.streams[0].means),
        np.asarray(gold.streams[0].means),
        rtol=1e-3, atol=1e-3,
    )
    # Jacobian-corrected raw-space mean probability near the golden value
    import re

    m = re.search(r"probability (-?\d+\.\d+)", r.stdout)
    assert m, r.stdout
    assert abs(float(m.group(1)) - (-7928.721460)) < 2.0, r.stdout


def test_train_cli_stream_shards(reference_root, tmp_path):
    """--stream-shards N trains through the async double-buffered input
    pipeline end-to-end and reproduces the resident-batch fast result."""
    run = tmp_path / "run"
    run.mkdir()
    shutil.copytree(reference_root / "train" / "test", run / "test")
    (run / "test" / "parameters.txt").write_text(
        "./test/perfil_data/mean_vc_186_f_03_ap_0225.perfil\n"
        "./test/perfil_data/mean_vc_200_f_02_ap_015.perfil\n"
        "./test/perfil_data/mean_vc_200_f_02_ap_030.perfil\n"
    )
    args = [
        "srhmm_tpu.cli.train", "--numerics", "fast",
        "vc_186_f_03_ap_0225", "6", "1", "1",
        "./test/parameters.txt", "./test/out_resident.hmm",
    ]
    r = _run(args, cwd=run)
    assert r.returncode == 0, r.stderr
    args_s = [
        "srhmm_tpu.cli.train", "--numerics", "fast", "--stream-shards", "2",
        "vc_186_f_03_ap_0225", "6", "1", "1",
        "./test/parameters.txt", "./test/out_stream.hmm",
    ]
    r2 = _run(args_s, cwd=run)
    assert r2.returncode == 0, r2.stderr
    a = read_hmm(run / "test" / "out_stream.hmm")
    b = read_hmm(run / "test" / "out_resident.hmm")
    np.testing.assert_allclose(
        np.asarray(a.streams[0].means), np.asarray(b.streams[0].means),
        rtol=1e-4, atol=1e-4,
    )


def test_train_embedded_cli_end_to_end(tmp_path):
    """The beyond-reference trainers' CLI (round 5): embedded and tied
    training runs from the command line, exports reference-compatible
    per-unit .hmm files, warm-starts, and checkpoints/resumes."""
    from srhmm_tpu.cli.train_embedded import main
    from srhmm_tpu.io import read_hmm, write_perfil

    rng = np.random.default_rng(11)
    D, P = 6, 3
    names = ["a-b+c", "b-c+a", "c-a+b"]
    means = rng.normal(size=(P, D)) * 4.0
    lines = []
    for i in range(10):
        seq = rng.integers(0, P, 2 + (i % 2))
        f = np.concatenate(
            [means[u] + rng.normal(size=(14 + (i % 3), D)) for u in seq]
        )
        p = tmp_path / f"u{i}.perfil"
        write_perfil(p, f)
        lines.append(str(p) + " " + " ".join(names[u] for u in seq))
    (tmp_path / "trans.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "out_emb"
    rc = main(
        [str(tmp_path / "trans.txt"), str(out), "--states", "3", "--mix", "1",
         "--max-iters", "4", "--checkpoint-dir", str(tmp_path / "ck")]
    )
    assert rc == 0
    import json

    summary = json.loads((out / "summary.json").read_text())
    assert summary["iterations"] >= 1
    for u in names:
        m = read_hmm(str(out / f"{u}.hmm"))
        assert m.num_states == 3

    # warm start from the trained inventory: resumes in <= as many iters
    out2 = tmp_path / "out_warm"
    rc = main(
        [str(tmp_path / "trans.txt"), str(out2), "--states", "3", "--mix", "1",
         "--max-iters", "4", "--init", str(out)]
    )
    assert rc == 0

    # fixed-budget + CMVN modes (the isolated trainer's production flags
    # on the composed trainer, round 5): exactly N iterations, trained in
    # normalized space, exported raw — must stay close to the raw-space run
    out_sc = tmp_path / "out_scan"
    rc = main(
        [str(tmp_path / "trans.txt"), str(out_sc), "--states", "3",
         "--mix", "1", "--scan-iters", "4", "--cmvn", "global"]
    )
    assert rc == 0
    sc_summary = json.loads((out_sc / "summary.json").read_text())
    assert sc_summary["iterations"] == 4
    for u in names:
        m_raw = read_hmm(str(out / f"{u}.hmm"))
        m_sc = read_hmm(str(out_sc / f"{u}.hmm"))
        np.testing.assert_allclose(
            np.asarray(m_sc.streams[0].means),
            np.asarray(m_raw.streams[0].means),
            rtol=0.2, atol=0.5,
        )  # same data, raw space — close, not identical (4 vs 4 iters, f32)

    # tied-state variant: decision tree + senone map + materialized units
    out3 = tmp_path / "out_tied"
    rc = main(
        [str(tmp_path / "trans.txt"), str(out3), "--states", "3", "--mix", "1",
         "--tied", "--min-gain", "1.0", "--min-occ", "2.0",
         "--max-iters", "3"]
    )
    assert rc == 0
    smap = json.loads((out3 / "senone_map.json").read_text())
    assert set(smap) == set(names)
    tied_summary = json.loads((out3 / "summary.json").read_text())
    assert tied_summary["n_senones"] >= 3
    for u in names:
        read_hmm(str(out3 / f"{u}.hmm"))


def test_decode_cli_multistream(tmp_path):
    """Round 5: multi-stream continuous decode from the CLI — one
    comma-separated input list per stream (the reference's one feature
    file per stream, R2:331-339)."""
    import jax.numpy as jnp

    from srhmm_tpu.cli.decode import main as decode_main
    from srhmm_tpu.io import write_hmm, write_perfil
    from srhmm_tpu.models import (
        DIAG, GmmHmm, GmmStream, init_left_right_trans,
    )

    rng = np.random.default_rng(17)
    S, D1, D2, W = 3, 4, 3, 3

    def stream(r, D, scale):
        var = np.full((S, 1, D), 1.0)
        return GmmStream(
            weights=jnp.ones((S, 1)),
            means=jnp.asarray(r.normal(size=(S, 1, D)) * scale),
            inv_cov=jnp.asarray(1.0 / var),
            det=jnp.asarray(np.prod(var, -1)),
            cov_type=DIAG,
        )

    words = []
    for w in range(W):
        r = np.random.default_rng(200 + w)
        words.append(
            GmmHmm(
                trans=init_left_right_trans(S),
                streams=(stream(r, D1, 6.0), stream(r, D2, 5.0)),
                word=f"w{w}",
            )
        )
    model_paths = []
    for m in words:
        p = tmp_path / f"{m.word}.hmm"
        write_hmm(p, m)
        model_paths.append(str(p))
    (tmp_path / "models.txt").write_text("\n".join(model_paths) + "\n")

    truth = [2, 0, 1]
    f1, f2 = [], []
    for w in truth:
        mu1 = np.asarray(words[w].streams[0].means)[:, 0]
        mu2 = np.asarray(words[w].streams[1].means)[:, 0]
        for s in range(S):
            f1.append(mu1[s] + 0.1 * rng.normal(size=(4, D1)))
            f2.append(mu2[s] + 0.1 * rng.normal(size=(4, D2)))
    p1 = tmp_path / "u0_s1.perfil"
    p2 = tmp_path / "u0_s2.perfil"
    write_perfil(p1, np.concatenate(f1))
    write_perfil(p2, np.concatenate(f2))
    (tmp_path / "list1.txt").write_text(str(p1) + "\n")
    (tmp_path / "list2.txt").write_text(str(p2) + "\n")
    (tmp_path / "refs.txt").write_text("w2 w0 w1\n")

    out = tmp_path / "out.txt"
    rc = decode_main(
        [
            str(tmp_path / "models.txt"),
            f"{tmp_path}/list1.txt,{tmp_path}/list2.txt",
            str(out),
            "--ref", str(tmp_path / "refs.txt"),
        ]
    )
    assert rc == 0
    text = out.read_text()
    assert "w2 w0 w1" in text
    assert "WER: 0.00%" in text


def test_align_cli_segments_transcripts(tmp_path):
    """Round 5: forced-alignment CLI — Viterbi segmentation of transcripts
    against unit models, boundaries near the true 10-frame grid."""
    import jax.numpy as jnp

    from srhmm_tpu.cli.align import main as align_main
    from srhmm_tpu.io import write_hmm, write_perfil
    from srhmm_tpu.models import (
        DIAG, GmmHmm, GmmStream, init_left_right_trans,
    )

    rng = np.random.default_rng(53)
    S, D, P = 2, 4, 3
    units = []
    for u in range(P):
        r = np.random.default_rng(400 + u)
        var = np.full((S, 1, D), 1.0)
        units.append(
            GmmHmm(
                trans=init_left_right_trans(S),
                streams=(
                    GmmStream(
                        weights=jnp.ones((S, 1)),
                        means=jnp.asarray(r.normal(size=(S, 1, D)) * 6.0),
                        inv_cov=jnp.asarray(1.0 / var),
                        det=jnp.asarray(np.prod(var, -1)),
                        cov_type=DIAG,
                    ),
                ),
                word=f"ph{u}",
            )
        )
    paths = []
    for m in units:
        pth = tmp_path / f"{m.word}.hmm"
        write_hmm(pth, m)
        paths.append(str(pth))
    (tmp_path / "models.txt").write_text("\n".join(paths) + "\n")

    seq = [2, 0, 1]
    frames = []
    for u in seq:
        mu = np.asarray(units[u].streams[0].means)[:, 0]
        for st in range(S):
            for _ in range(5):  # 10 frames per unit
                frames.append(mu[st] + 0.1 * rng.normal(size=D))
    perfil = tmp_path / "u0.perfil"
    write_perfil(perfil, np.asarray(frames))
    (tmp_path / "trans.txt").write_text(
        f"{perfil} ph2 ph0 ph1\n"
    )
    out = tmp_path / "align.txt"
    rc = align_main(
        [str(tmp_path / "models.txt"), str(tmp_path / "trans.txt"),
         str(out), "--frame-shift", "10"]
    )
    assert rc == 0
    lines = [l.split("\t") for l in out.read_text().splitlines()]
    assert [l[1] for l in lines] == ["ph2", "ph0", "ph1"]
    starts = [int(l[2]) for l in lines]
    ends = [int(l[3]) for l in lines]
    assert starts[0] == 0 and ends[-1] == 30
    for i, a in enumerate(starts):
        assert abs(a - 10 * i) <= 2  # near the true 10-frame grid
    assert lines[0][4] == "0.000"  # --frame-shift seconds columns
