"""Fused MFCC kernel (Pallas, TPU): STFT + mel + log + DCT in one pass.

The jnp pipeline (features/frontend.py) is already GEMM-native, but XLA keeps
the (F, K) power spectrum and (F, n_mels) log-mel intermediates in HBM
between ops.  This kernel chains all four GEMMs over a VMEM-resident frame
block, so HBM traffic is frames in, MFCCs out:

    (F_blk, W) @ cos/sin (W, K)  -> re, im          (MXU)
    re*re + im*im                -> power           (VPU)
    power @ mel (K, n_mels)      -> melspec         (MXU)
    log(max(melspec, floor))                        (VPU)
    logmel @ dct (n_mels, n_mfcc)                   (MXU)

This is the Pallas STFT+mel+DCT frontend named in BASELINE.json's north star.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import FrontendConfig, dft_matrices, dct_matrix, frame_signal, mel_filterbank


def _mfcc_kernel(log_floor_ref, frames_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref):
    re = jnp.dot(frames_ref[:], cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames_ref[:], sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    logmel = jnp.log(jnp.maximum(melspec, log_floor_ref[0]))
    out_ref[:] = jnp.dot(logmel, dct_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "f_block", "interpret"))
def mfcc_pallas(
    x: jax.Array,
    cfg: FrontendConfig = FrontendConfig(),
    f_block: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Waveform (N,) -> MFCC (F, n_mfcc), fully fused on TPU.

    The frame count is padded up to a multiple of f_block inside (zero-padded
    frames produce log-floor MFCC rows; callers track the true F).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.preemphasis:
        x = jnp.concatenate(
            [x[:1], x[1:] - cfg.preemphasis * x[:-1]], axis=-1
        )
    frames = frame_signal(x, cfg).astype(jnp.float32)  # (F, W)
    F, W = frames.shape
    F_pad = -(-F // f_block) * f_block
    frames = jnp.pad(frames, ((0, F_pad - F), (0, 0)))

    cos_m, sin_m = dft_matrices(cfg)
    mel = mel_filterbank(cfg)
    dct = dct_matrix(cfg)
    K, n_mels, n_mfcc = cos_m.shape[1], mel.shape[1], dct.shape[1]

    out = pl.pallas_call(
        _mfcc_kernel,
        grid=(F_pad // f_block,),
        in_specs=[
            pl.BlockSpec((1,), lambda f: (f * 0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((f_block, W), lambda f: (f, f * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, K), lambda f: (f * 0, f * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, K), lambda f: (f * 0, f * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, n_mels), lambda f: (f * 0, f * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, n_mfcc), lambda f: (f * 0, f * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (f_block, n_mfcc), lambda f: (f, f * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((F_pad, n_mfcc), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray([cfg.log_floor], jnp.float32),
        frames,
        jnp.asarray(cos_m, jnp.float32),
        jnp.asarray(sin_m, jnp.float32),
        jnp.asarray(mel, jnp.float32),
        jnp.asarray(dct, jnp.float32),
    )
    return out[:F]
