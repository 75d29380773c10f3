"""Shape-bucketed jitted model runner for evaluation loops.

The reference evaluates eagerly (op-by-op module dispatch); on TPU every
un-jitted 40-layer forward is orders of magnitude slower than the compiled
program.  This runner jits ``model.__call__`` once per (shape bucket,
static kwargs) signature — the same strategy the hub uses for
``extract_*`` (hub.py) — and pads eval batches into a small set of buckets
so the ragged final batch does not trigger a recompile:

- batch dim: padded up to the next power-of-two bucket (>= 8);
- ``src_tokens``: sequence length padded to a multiple of 16 with the
  padding index (extra pad columns do not change unpadded outputs —
  padding-invariance is covered by the attention mask tests);
- ``src_audios``: waveform length padded up to the next whole second
  (16 kHz), with ``audio_padding_masks`` extended by True for the extra
  conv frames — clip durations are arbitrary (crop caps at 15 s, tile
  raises to >= 1 s, anything between stays ragged), so without this every
  batch-max length is a fresh multi-minute remote compile;
- other arrays: batch-dim padding only.

Padded rows produce garbage-but-finite outputs that are sliced off.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

PAD_IDX = 1


def _batch_bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


def _seq_bucket(n: int) -> int:
    return -(-n // 16) * 16


class JitEvaluator:
    """Callable: (params, net_input dict, **static_kwargs) -> outputs.

    Compiles one program per distinct (bucketed shapes, static kwargs)
    signature; ``n_compiles`` reports how many programs were built.
    """

    def __init__(self, model, audio_bucket: int = 16000):
        self.model = model
        self._fns: Dict[Any, Any] = {}
        self.audio_bucket = audio_bucket  # waveform bucket quantum (1 s)
        # audio bucketing needs the frontend length arithmetic; best-effort
        # discovery from the model config (absent -> batch-dim only)
        enc = getattr(getattr(model, "cfg", None), "encoder", None)
        ad = getattr(enc, "audio_adapter", None)
        self._audio_spec = getattr(ad, "feature_encoder_spec", None)
        self._audio_out_len = None
        if self._audio_spec is not None:
            if getattr(ad, "frontend", "waveform") == "fbank":
                from ..ops.preprocess import LogMelFbank

                self._audio_out_len = LogMelFbank(
                    n_fft=ad.fbank_n_fft, hop=ad.fbank_hop,
                    n_mels=ad.fbank_n_mels).num_frames
            else:
                from ..models.adapters.audio import conv_output_length

                spec = self._audio_spec
                self._audio_out_len = lambda n: conv_output_length(n, spec)

    @property
    def n_compiles(self) -> int:
        return len(self._fns)

    def __call__(self, params, net_input: Dict[str, Any], **static_kw):
        arrays = {k: np.asarray(v) for k, v in net_input.items()}
        n = next(iter(arrays.values())).shape[0]
        nb = _batch_bucket(n)
        mask_len = None
        if "src_audios" in arrays and self._audio_out_len is not None:
            t = arrays["src_audios"].shape[1]
            q = self.audio_bucket
            tb = max(-(-t // q) * q, q)  # next whole bucket
            arrays["src_audios"] = np.pad(
                arrays["src_audios"], [(0, 0), (0, tb - t)])
            mask_len = self._audio_out_len(tb) + 1
            if "audio_padding_masks" not in arrays:
                # the bucket tail is silence the model must not attend to;
                # synthesize the mask (CLS + real conv frames False, padded
                # tail True) instead of leaving it unmasked
                real = self._audio_out_len(t) + 1
                mask = np.zeros((n, mask_len), bool)
                mask[:, real:] = True
                arrays["audio_padding_masks"] = mask
        padded = {}
        for k, v in arrays.items():
            pad = [(0, nb - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
            if k == "src_tokens":
                pad[1] = (0, _seq_bucket(v.shape[1]) - v.shape[1])
                v = np.pad(v, pad, constant_values=PAD_IDX)
            elif k == "audio_padding_masks" and mask_len is not None:
                # extra conv frames from the waveform bucket are padding
                # (True); padded batch rows stay all-False so no row is
                # entirely padded (softmax over all -inf keys)
                v = np.pad(v, [(0, 0), (0, mask_len - v.shape[1])],
                           constant_values=True)
                v = np.pad(v, [pad[0], (0, 0)])
            else:
                v = np.pad(v, pad)
            padded[k] = v

        key = (tuple(sorted(static_kw.items())),
               tuple(sorted((k, v.shape, v.dtype.str)
                            for k, v in padded.items())))
        fn = self._fns.get(key)
        if fn is None:
            model = self.model

            def call(params, net):
                return model(params, **net, **static_kw)

            fn = jax.jit(call)
            self._fns[key] = fn

        out = fn(params, padded)
        if isinstance(out, tuple):
            return tuple(o[:n] for o in out)
        return out[:n]
