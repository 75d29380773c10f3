"""On-device preprocessing (BASELINE north-star item).

- ``resize_normalize``: jitted bicubic resize + CLIP normalization on the
  accelerator; replaces host-side PIL resize + numpy normalize in the hub
  (ref hub_interface.py:92-101,150-168 does this on CPU with PIL).  PIL
  and jax.image.resize both use the Keys cubic kernel (a=-0.5) with
  antialiasing on downsample, so outputs agree to ~1e-2 in normalized
  units (documented tolerance; exact-parity evaluation should keep the
  host path, which remains the default).
- ``LogMelFbank``: optional 16 kHz log-mel filterbank frontend.  NOTE the
  reference does NOT compute fbanks — it LayerNorms the raw waveform
  (ref hub_interface.py:174-186, SURVEY §7 numerics note); this frontend
  is the optional extra named in BASELINE.json, not the parity path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("size",))
def resize_normalize(image_u8: jnp.ndarray, size: int,
                     mean: Tuple[float, ...], std: Tuple[float, ...]) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (3, size, size) float32, bicubic + CLIP norm."""
    x = image_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (size, size, 3), "bicubic")
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# log-mel filterbank
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: float = None) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular HTK-style mel matrix (host-side)."""
    fmax = fmax or sample_rate / 2
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


class LogMelFbank:
    """Jit-friendly log-mel frontend: 25 ms Hann frames, 10 ms hop.

    wav (B, T) float32 at ``sample_rate`` -> (B, frames, n_mels) log-mel.
    """

    def __init__(self, sample_rate: int = 16000, n_fft: int = 400,
                 hop: int = 160, n_mels: int = 80, fmin: float = 0.0,
                 fmax: float = None, eps: float = 1e-6):
        self.n_fft = n_fft
        self.hop = hop
        self.n_mels = n_mels
        self.eps = eps
        self.window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
        self.mel = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate,
                                              fmin, fmax))

    def num_frames(self, length: int) -> int:
        return max(0, 1 + (length - self.n_fft) // self.hop)

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        b, t = wav.shape
        n = self.num_frames(t)
        idx = (np.arange(n)[:, None] * self.hop
               + np.arange(self.n_fft)[None, :])  # (n, n_fft) static
        frames = wav[:, idx] * self.window  # (B, n, n_fft)
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        power = jnp.abs(spec) ** 2
        mel = jnp.einsum("bnf,fm->bnm", power, self.mel)
        return jnp.log(mel + self.eps)
