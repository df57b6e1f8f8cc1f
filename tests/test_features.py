"""MFCC frontend vs NumPy FFT oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from srhmm_tpu.features import (
    FrontendConfig,
    add_deltas,
    frame_signal,
    log_mel,
    mel_filterbank,
    mfcc,
)
from srhmm_tpu.features.frontend import _window, dct_matrix


def np_mfcc_oracle(x, cfg: FrontendConfig):
    if cfg.preemphasis:
        x = np.concatenate([x[:1], x[1:] - cfg.preemphasis * x[:-1]])
    F = 1 + max(0, len(x) - cfg.frame_length) // cfg.frame_shift
    frames = np.stack(
        [
            x[i * cfg.frame_shift : i * cfg.frame_shift + cfg.frame_length]
            for i in range(F)
        ]
    )
    win = _window(cfg)
    spec = np.fft.rfft(frames * win, n=cfg.frame_length, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank(cfg)
    logmel = np.log(np.maximum(mel, cfg.log_floor))
    return logmel @ dct_matrix(cfg)


def test_mfcc_matches_fft_oracle():
    cfg = FrontendConfig()
    rng = np.random.default_rng(0)
    x = rng.normal(size=16_000)  # 1 s
    got = np.asarray(mfcc(jnp.asarray(x), cfg))
    want = np_mfcc_oracle(x, cfg)
    assert got.shape == want.shape == (98, 13)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_log_mel_shape_and_finiteness():
    cfg = FrontendConfig(n_mels=40)
    x = jnp.zeros(8000)  # silence: log floor must prevent -inf
    out = np.asarray(log_mel(x, cfg))
    assert out.shape[1] == 40
    assert np.isfinite(out).all()


def test_frontend_batched():
    cfg = FrontendConfig()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 16_000)))
    out = np.asarray(mfcc(x, cfg))
    assert out.shape == (3, 98, 13)
    one = np.asarray(mfcc(x[1], cfg))
    np.testing.assert_allclose(out[1], one, rtol=1e-12)


def test_deltas():
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(50, 13)))
    out = np.asarray(add_deltas(f))
    assert out.shape == (50, 39)
    # delta of a constant signal is zero
    const = jnp.ones((50, 13))
    out_c = np.asarray(add_deltas(const))
    np.testing.assert_allclose(out_c[:, 13:], 0.0, atol=1e-12)
    # delta of a linear ramp is the slope (away from edges)
    ramp = jnp.asarray(np.arange(50, dtype=np.float64)[:, None] * np.ones((1, 13)))
    out_r = np.asarray(add_deltas(ramp))
    np.testing.assert_allclose(out_r[5:-5, 13:26], 1.0, rtol=1e-9)


def test_sine_peak_lands_in_right_mel_bin():
    """A pure 1 kHz tone's energy concentrates at the right filterbank bin."""
    cfg = FrontendConfig(n_mels=26)
    t = np.arange(16_000) / cfg.sample_rate
    x = jnp.asarray(np.sin(2 * np.pi * 1000.0 * t))
    lm = np.asarray(log_mel(x, cfg)).mean(0)
    # find which mel bin covers 1 kHz
    fb = mel_filterbank(cfg)
    freqs = np.linspace(0, cfg.sample_rate / 2, fb.shape[0])
    centers = freqs[np.argmax(fb, axis=0)]
    expect = int(np.argmin(np.abs(centers - 1000.0)))
    assert abs(int(np.argmax(lm)) - expect) <= 1


def test_cmvn_unpadded_moments():
    from srhmm_tpu.features import cmvn

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(3, 40, 6)) * 4.0 + 2.5)
    out = np.asarray(cmvn(feats))
    np.testing.assert_allclose(out.mean(axis=-2), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.var(axis=-2), 1.0, atol=1e-4)

    centered = np.asarray(cmvn(feats, var_norm=False))
    np.testing.assert_allclose(centered.mean(axis=-2), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        centered, np.asarray(feats) - np.asarray(feats).mean(-2, keepdims=True),
        rtol=1e-6,
    )


def test_cmvn_padded_matches_unpadded_prefix():
    from srhmm_tpu.features import cmvn

    rng = np.random.default_rng(6)
    B, T, D = 4, 50, 5
    feats = rng.normal(size=(B, T, D)) * 3.0 - 1.0
    lengths = np.array([50, 33, 17, 1])
    out = np.asarray(cmvn(jnp.asarray(feats), jnp.asarray(lengths)))
    for b, L in enumerate(lengths):
        solo = np.asarray(cmvn(jnp.asarray(feats[b, :L])))
        np.testing.assert_allclose(out[b, :L], solo, atol=1e-5)
        # padded frames pass through untouched
        np.testing.assert_allclose(out[b, L:], feats[b, L:], rtol=1e-7)
