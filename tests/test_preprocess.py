"""On-device preprocessing: resize/normalize parity vs PIL, fbank frontend."""

import math

import jax.numpy as jnp
import numpy as np
import pytest


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def test_device_resize_normalize_close_to_pil():
    """PIL bicubic and jax.image.resize share the Keys a=-0.5 kernel;
    documented tolerance ~1e-2 in normalized units (antialias details
    differ slightly on downsample)."""
    from PIL import Image
    from one_peace_tpu.ops.preprocess import resize_normalize

    rs = np.random.RandomState(0)
    raw = rs.randint(0, 256, (96, 80, 3), np.uint8)
    size = 32

    ours = np.asarray(resize_normalize(jnp.asarray(raw), size,
                                       CLIP_MEAN, CLIP_STD))

    pil = Image.fromarray(raw).resize((size, size), Image.BICUBIC)
    ref = np.asarray(pil, np.float32) / 255.0
    ref = ((ref - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)).transpose(2, 0, 1)

    assert ours.shape == ref.shape == (3, size, size)
    # mean abs error small in normalized units
    assert np.abs(ours - ref).mean() < 2e-2, np.abs(ours - ref).mean()


def test_hub_on_device_path_matches_host_path():
    """The hub's on_device image path must agree with the host PIL path
    within the documented tolerance."""
    from one_peace_tpu import hub as hub_mod

    class _H(hub_mod.OnePeaceHubInterface):
        def __init__(self):  # bypass model loading; preprocessing only
            from one_peace_tpu.core.config import ModelConfig, TaskConfig

            self.task_cfg = TaskConfig()
            self.task_cfg.patch_image_size = 32
            self.dtype = jnp.float32

    h = _H()
    rs = np.random.RandomState(1)
    from PIL import Image

    imgs = [Image.fromarray(rs.randint(0, 256, (64, 48, 3), np.uint8))]
    host = np.asarray(h.process_image(imgs))
    dev = np.asarray(h.process_image(imgs, on_device=True))
    assert host.shape == dev.shape
    assert np.abs(host - dev).mean() < 2e-2


def test_fbank_matches_numpy_reference():
    from one_peace_tpu.ops.preprocess import LogMelFbank, mel_filterbank

    fb = LogMelFbank(n_fft=64, hop=32, n_mels=8, sample_rate=1600)
    rs = np.random.RandomState(2)
    wav = rs.randn(2, 400).astype(np.float32)
    out = np.asarray(fb(jnp.asarray(wav)))
    n_frames = 1 + (400 - 64) // 32
    assert out.shape == (2, n_frames, 8)
    assert np.isfinite(out).all()

    # independent numpy STFT derivation
    win = np.hanning(64).astype(np.float32)
    mel = mel_filterbank(8, 64, 1600)
    ref = np.zeros_like(out)
    for b in range(2):
        for i in range(n_frames):
            frame = wav[b, i * 32: i * 32 + 64] * win
            power = np.abs(np.fft.rfft(frame)) ** 2
            ref[b, i] = np.log(power @ mel + 1e-6)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_mel_matrix_properties():
    from one_peace_tpu.ops.preprocess import mel_filterbank

    mel = mel_filterbank(80, 400, 16000)
    assert mel.shape == (201, 80)
    assert (mel >= 0).all()
    # every filter has support
    assert (mel.sum(0) > 0).all()
