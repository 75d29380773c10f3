"""Public inference API — the ``from_pretrained`` hub interface.

API parity with the reference (ref: one_peace/models/one_peace/
hub_interface.py:53-226): ``from_pretrained`` loads a fairseq ``.pt``
checkpoint (converted on the fly) or a native ``.npz``/orbax checkpoint,
and the interface exposes ``process_text/image/audio`` +
``extract_{text,image,audio,vl}_features``.

Preprocessing parity:
- text: ``' ' + lower()`` -> GPT-2 BPE -> dict ids -> trunc 70 -> +EOS
  (hub_interface.py:134-148);
- image: PIL bicubic resize to (patch_image_size,)*2, CLIP mean/std
  (hub_interface.py:92-101);
- audio: 16 kHz mono waveform, LayerNorm over the raw waveform, crop to
  15 s / tile to >= 1 s, conv-length arithmetic for the padding mask
  (hub_interface.py:170-193).  The reference decodes via librosa; here WAV
  is decoded with the stdlib and other formats take pre-decoded arrays
  (or the native decoder, when built).

Each ``extract_*`` path is jitted once per input shape; inputs are padded
to shape buckets to avoid recompilation (SURVEY.md §7 hard part 7).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import ModelConfig, TaskConfig
from .data.tokenizer import TextTokenizer, find_bpe_dir
from .models.adapters.audio import conv_output_length
from .models.one_peace import OnePeaceRetrievalModel
from .utils.checkpoint_convert import (
    convert_retrieval_model,
    load_torch_state_dict,
    to_jax,
)

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode a WAV file to mono fp32 at target_sr (stdlib + scipy)."""
    import wave

    with wave.open(path, "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        from scipy.signal import resample_poly

        g = math.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data


def load_audio(path_or_array, target_sr: int = 16000) -> np.ndarray:
    """Accepts a file path (wav/flac) or a raw waveform array."""
    if isinstance(path_or_array, np.ndarray):
        return path_or_array.astype(np.float32)
    path = str(path_or_array)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return _load_wav(path, target_sr)
    if ext == ".flac":
        from .data.flac import read_flac  # native/pure decoder

        wav, sr = read_flac(path)
        if sr != target_sr:
            from scipy.signal import resample_poly

            g = math.gcd(sr, target_sr)
            wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
        return wav
    raise ValueError(f"unsupported audio format: {path}")


def from_pretrained(
    model_path: str,
    model_type: str = "one_peace_retrieval",
    dtype: str = "float32",
    bpe_dir: Optional[str] = None,
    model_cfg: Optional[ModelConfig] = None,
    task_cfg: Optional[TaskConfig] = None,
    attn_impl: str = "pallas",
    num_classes: Optional[int] = None,
    classify_kwargs: Optional[dict] = None,
    quantize: str = "none",
) -> "OnePeaceHubInterface":
    """Load a checkpoint into the retrieval model.

    ``model_path`` may be a fairseq ``.pt`` (converted via
    utils/checkpoint_convert) or a native ``.npz`` of flat params.

    ``quantize`` selects the int8 serving path (ops/quant.py): ``"ffn"``
    converts the per-modality FFN projections (measured on the full 4B
    model on v5e: +8.7% image / +17.9% audio throughput, max emb err
    ~5e-4 — PARITY.md); ``"ffn_attn"`` additionally converts the
    self-attention q/k/v/out projections (measured SLOWER than ffn-only
    at L=257; kept for experimentation).  ``"none"`` (default) keeps
    exact parity numerics.
    """
    built_default_model_cfg = model_cfg is None
    if model_cfg is None:
        model_cfg = ModelConfig(_name=model_type)
        model_cfg.encoder.attn_impl = attn_impl
    if task_cfg is None:
        task_cfg = TaskConfig()
    if built_default_model_cfg:
        # keep the image rel-pos grid in step with the eval resolution
        # (cli/train.py does the same sync); without it a non-default
        # patch_image_size trips the adapter's bucket-size guard
        model_cfg.encoder.image_adapter.rel_bucket_size = \
            task_cfg.patch_image_size // 16
    jdtype = {"float32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}[dtype]

    if model_type == "one_peace_classify":
        from .models.classify import OnePeaceClassifyModel

        model = OnePeaceClassifyModel(model_cfg, num_classes=num_classes or 2,
                                      **(classify_kwargs or {}))
    else:
        model = OnePeaceRetrievalModel(model_cfg)
    if model_path.endswith(".pt"):
        from .utils.checkpoint_convert import convert_classify_model

        sd = load_torch_state_dict(model_path)
        convert = (convert_classify_model if model_type == "one_peace_classify"
                   else convert_retrieval_model)
        params = to_jax(convert(sd, model_cfg), dtype=jdtype)
    else:
        from .utils.native_checkpoint import load_params

        params = load_params(model_path, dtype=jdtype)
    if quantize != "none":
        from .ops.quant import quantize_ffn_params

        assert quantize in ("ffn", "ffn_attn"), quantize
        params = dict(params)
        params["encoder_wrapper"] = quantize_ffn_params(
            params["encoder_wrapper"], include_attn=(quantize == "ffn_attn"))
    return OnePeaceHubInterface(model_cfg, task_cfg, model, params, dtype=jdtype,
                                bpe_dir=bpe_dir)


class OnePeaceHubInterface:
    """User-facing embedding interface (ref hub_interface.py:76-226)."""

    def __init__(self, model_cfg: ModelConfig, task_cfg: TaskConfig, model,
                 params, dtype=jnp.float32, bpe_dir: Optional[str] = None):
        self.model_cfg = model_cfg
        self.task_cfg = task_cfg
        self.model = model
        self.params = params
        self.dtype = dtype
        bpe = find_bpe_dir(bpe_dir or task_cfg.bpe_dir or None)
        if bpe is None:
            raise FileNotFoundError(
                "BPE assets not found; set bpe_dir or $ONE_PEACE_BPE_DIR to a "
                "directory with encoder.json/vocab.bpe/dict.txt")
        self.tokenizer = TextTokenizer(bpe, max_src_length=task_cfg.max_src_length)
        self.feature_encoder_spec = model_cfg.encoder.audio_adapter.feature_encoder_spec
        # frontend-aware samples->frames arithmetic (waveform conv stack or
        # the optional fbank frontend; ref hub_interface.py:124-132)
        ad_cfg = model_cfg.encoder.audio_adapter
        if getattr(ad_cfg, "frontend", "waveform") == "fbank":
            from .ops.preprocess import LogMelFbank

            self._audio_out_len = LogMelFbank(
                n_fft=ad_cfg.fbank_n_fft, hop=ad_cfg.fbank_hop,
                n_mels=ad_cfg.fbank_n_mels).num_frames
        else:
            self._audio_out_len = lambda n: conv_output_length(
                n, self.feature_encoder_spec)

        self.is_classify = model_cfg._name == "one_peace_classify"
        if self.is_classify:
            # classify models take no encoder_type (ref hub_interface.py:
            # 206-222 dispatch)
            self._jit_forward = jax.jit(
                lambda params, batch, et: self.model(params, **batch),
                static_argnames=("et",),
            )
        else:
            self._jit_forward = jax.jit(
                lambda params, batch, et: self.model(params, **batch, encoder_type=et),
                static_argnames=("et",),
            )

    # ------------------------------------------------------------------
    # preprocessing
    # ------------------------------------------------------------------

    def process_text(self, text_list: Sequence[str], pad_to: Optional[int] = None) -> jnp.ndarray:
        batch = self.tokenizer.encode_batch(list(text_list))
        if pad_to is not None and batch.shape[1] < pad_to:
            batch = np.pad(batch, ((0, 0), (0, pad_to - batch.shape[1])),
                           constant_values=self.tokenizer.pad)
        return jnp.asarray(batch)

    def _load_image(self, img) -> np.ndarray:
        from PIL import Image

        size = self.task_cfg.patch_image_size
        if isinstance(img, (str, os.PathLike)):
            img = Image.open(img).convert("RGB")
        if isinstance(img, Image.Image):  # bicubic resize like the ref
            img = img.resize((size, size), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
        elif np.asarray(img).dtype == np.uint8:  # pre-resized raw pixels
            arr = np.asarray(img, np.float32) / 255.0
        else:  # ndarray float: pre-resized, scaled to [0, 1]
            arr = np.asarray(img, np.float32)
        arr = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        return arr.transpose(2, 0, 1)  # CHW for API parity

    def process_image(self, image_list, return_image_sizes: bool = False,
                      on_device: bool = False):
        """``on_device=True`` runs the bicubic resize + CLIP normalization
        on the accelerator (ops/preprocess.resize_normalize, jitted per
        input shape) — host work shrinks to decode only.  PIL and
        jax.image.resize share the Keys a=-0.5 cubic kernel, agreeing to
        ~1e-2 normalized units; the host path stays the parity default
        (ref hub_interface.py:150-168)."""
        from PIL import Image

        arrays, widths, heights = [], [], []
        for item in image_list:
            if isinstance(item, (str, os.PathLike)):
                img = Image.open(item).convert("RGB")
            else:
                img = item
            is_pil = isinstance(img, Image.Image)
            if is_pil:
                w, h = img.size
            else:
                h, w = np.shape(img)[:2]
            widths.append(w)
            heights.append(h)
            if on_device:
                from .ops.preprocess import resize_normalize

                raw = np.asarray(img)
                if raw.dtype != np.uint8:  # pre-scaled [0,1] float input
                    raw = np.clip(raw * 255.0, 0, 255).astype(np.uint8)
                arrays.append(resize_normalize(
                    jnp.asarray(raw), self.task_cfg.patch_image_size,
                    CLIP_MEAN, CLIP_STD))
            else:
                arrays.append(self._load_image(img))
        src_images = jnp.stack(arrays).astype(self.dtype) if on_device \
            else jnp.asarray(np.stack(arrays), self.dtype)
        if return_image_sizes:
            return src_images, jnp.asarray(widths), jnp.asarray(heights)
        return src_images

    def process_audio(self, audio_list, pad_to: Optional[int] = None):
        """ref hub_interface.py:170-193: LayerNorm the raw waveform, crop to
        15 s, tile to >= 1 s, build the conv-length padding mask."""
        sr = 16000
        feats_list, lengths = [], []
        for item in audio_list:
            wav = load_audio(item, sr)
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
            if wav.shape[-1] > sr * self.task_cfg.max_duration:
                wav = wav[: sr * self.task_cfg.max_duration]
            if wav.shape[-1] < sr:
                reps = math.ceil(sr / wav.shape[-1])
                wav = np.tile(wav, reps)[:sr]
            feats_list.append(wav)
            lengths.append(wav.shape[-1])
        max_len = max(lengths) if pad_to is None else max(pad_to, max(lengths))
        src = np.zeros((len(feats_list), max_len), np.float32)
        t_out_max = self._audio_out_len(max_len)
        masks = np.ones((len(feats_list), t_out_max + 1), bool)
        for i, wav in enumerate(feats_list):
            src[i, : len(wav)] = wav
            t_out = self._audio_out_len(len(wav))
            masks[i, : t_out + 1] = False
        return jnp.asarray(src, self.dtype), jnp.asarray(masks)

    def process_image_text_pairs(self, image_text_list, return_image_sizes=False):
        images = [p[0] for p in image_text_list]
        texts = [p[1] for p in image_text_list]
        src_tokens = self.process_text(texts)
        if return_image_sizes:
            src_images, w, h = self.process_image(images, return_image_sizes=True)
            return (src_images, w, h), src_tokens
        return self.process_image(images), src_tokens

    # ------------------------------------------------------------------
    # feature extraction
    # ------------------------------------------------------------------

    def extract_text_features(self, src_tokens) -> jnp.ndarray:
        return self._jit_forward(self.params, {"src_tokens": src_tokens}, "text")

    def extract_image_features(self, src_images) -> jnp.ndarray:
        return self._jit_forward(self.params, {"src_images": src_images}, "image")

    def extract_audio_features(self, src_audios, audio_padding_masks) -> jnp.ndarray:
        return self._jit_forward(
            self.params,
            {"src_audios": src_audios, "audio_padding_masks": audio_padding_masks},
            "audio",
        )

    def extract_vl_features(self, src_images, src_tokens):
        """Joint VL forward returning per-modality features — jitted once
        per input shape like every other extract_* path (an eager call
        would dispatch the 40-layer encoder op-by-op)."""
        if not hasattr(self, "_jit_vl_forward"):
            self._jit_vl_forward = jax.jit(
                lambda wparams, tokens, images: self.model.wrapper(
                    wparams, src_tokens=tokens, src_images=images,
                    encoder_type="vl"))
        return self._jit_vl_forward(
            self.params["encoder_wrapper"], src_tokens, src_images)
