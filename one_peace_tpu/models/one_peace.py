"""ONE-PEACE model assemblies.

``ModelWrapper`` runs the modality adapters and the fusion encoder and
splits the concatenated output back into per-modality features
(ref: one_peace/models/one_peace/one_peace_base.py:39-129).
``OnePeaceRetrievalModel`` adds per-modality projection heads + L2
normalization (ref: one_peace_retrieval.py:34-150); ``OnePeaceClassifyModel``
adds CLS/attention pooling + MLP classifier (ref: one_peace_base.py:132-235,
one_peace_classify.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import EncoderConfig, ModelConfig
from ..core.registry import MODELS
from .adapters.audio import AudioAdapter
from .adapters.image import ImageAdapter
from .adapters.text import TextAdapter
from .components import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    trunc_normal,
)
from .encoder import FusionEncoder


def _pad_bias(bias: Optional[jnp.ndarray], before: int, after: int) -> Optional[jnp.ndarray]:
    """Embed a per-modality (.., H, l, l) bias into the (.., H, L, L) frame as
    a diagonal block at offset ``before`` (off-diagonal blocks are zero —
    cross-modal attention carries no rel-pos bias, ref encoder:148-158)."""
    if bias is None:
        return None
    pad = [(0, 0)] * (bias.ndim - 2) + [(before, after), (before, after)]
    return jnp.pad(bias, pad)


def combine_rel_bias(biases, lens) -> Optional[jnp.ndarray]:
    """Combine per-modality biases block-diagonally.

    biases: list of (T, H, l, l) / (T, B, H, l, l) / None per modality;
    lens: matching sequence lengths.  Returns a bias over sum(lens).
    """
    total = sum(lens)
    out = None
    offset = 0
    # broadcast table counts (1 vs layers) and batch dims before adding
    for bias, l in zip(biases, lens):
        if bias is not None:
            padded = _pad_bias(bias, offset, total - offset - l)
            if out is None:
                out = padded
            else:
                if out.ndim < padded.ndim:
                    out = out[:, None] if out.ndim == 4 else out
                if padded.ndim < out.ndim:
                    padded = padded[:, None] if padded.ndim == 4 else padded
                out = out + padded
        offset += l
    return out


class ModelWrapper:
    """Adapters + fusion encoder (ref one_peace_base.py:39-129)."""

    def __init__(self, cfg: EncoderConfig, use_text_norm=True, use_image_norm=True,
                 use_audio_norm=True, num_rel_tables: Optional[int] = None):
        self.cfg = cfg
        self.text_adapter = (
            TextAdapter(cfg.text_adapter, cfg.embed_dim, cfg.attention_heads, num_rel_tables)
            if cfg.use_text_moe else None
        )
        self.image_adapter = (
            ImageAdapter(cfg.image_adapter, cfg.embed_dim, cfg.attention_heads, num_rel_tables)
            if cfg.use_image_moe else None
        )
        self.audio_adapter = (
            AudioAdapter(cfg.audio_adapter, cfg.embed_dim, cfg.attention_heads, num_rel_tables)
            if cfg.use_audio_moe else None
        )
        self.fusion = FusionEncoder(cfg, use_text_norm, use_image_norm, use_audio_norm)

    def enable_pipeline(self, mesh, num_micro_batches: int) -> None:
        self.fusion.enable_pipeline(mesh, num_micro_batches)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 4)
        params = {"fusion": self.fusion.init(keys[3], dtype=dtype)}
        if self.text_adapter is not None:
            params["text_adapter"] = self.text_adapter.init(keys[0], dtype=dtype)
        if self.image_adapter is not None:
            params["image_adapter"] = self.image_adapter.init(keys[1], dtype=dtype)
        if self.audio_adapter is not None:
            params["audio_adapter"] = self.audio_adapter.init(keys[2], dtype=dtype)
        return params

    def __call__(
        self,
        params,
        src_tokens: Optional[jnp.ndarray] = None,
        text_preserve_ids=None, text_preserve_embed=None, text_mask_token=None,
        src_images: Optional[jnp.ndarray] = None,
        image_preserve_ids=None, image_preserve_embed=None, image_mask_token=None,
        is_second_image: bool = False,
        src_audios: Optional[jnp.ndarray] = None,
        audio_padding_masks: Optional[jnp.ndarray] = None,
        audio_preserve_ids=None, audio_preserve_embed=None, audio_mask_token=None,
        encoder_type: str = "text",
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_padding_mask: bool = False,
    ):
        """Returns per-modality feature tensors (None where absent), each
        (B, l_mod, D), plus padding masks when requested."""
        if encoder_type not in ("text", "image", "audio", "vl", "al", "val"):
            raise NotImplementedError(f"unknown encoder_type {encoder_type!r}")
        rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

        text_info = image_info = audio_info = None
        if encoder_type in ("text", "vl", "al", "val"):
            text_info = self.text_adapter(
                params["text_adapter"], src_tokens, text_preserve_ids,
                text_preserve_embed, text_mask_token,
                deterministic=deterministic, rng=rngs[0])
        if encoder_type in ("image", "vl", "val"):
            image_info = self.image_adapter(
                params["image_adapter"], src_images, image_preserve_ids,
                image_preserve_embed, image_mask_token, is_second_image,
                deterministic=deterministic, rng=rngs[1])
        if encoder_type in ("audio", "al", "val"):
            audio_info = self.audio_adapter(
                params["audio_adapter"], src_audios, audio_padding_masks,
                audio_preserve_ids, audio_preserve_embed, audio_mask_token,
                deterministic=deterministic, rng=rngs[2])

        infos = [i for i in (text_info, image_info, audio_info) if i is not None]
        xs = [i[0] for i in infos]
        masks = [i[1] for i in infos]
        lens = [x.shape[1] for x in xs]
        x = jnp.concatenate(xs, axis=1) if len(xs) > 1 else xs[0]
        padding_mask = jnp.concatenate(masks, axis=1) if len(masks) > 1 else masks[0]
        rel_bias = combine_rel_bias([i[2] for i in infos], lens)

        text_len = text_info[0].shape[1] if text_info is not None else 0
        image_len = image_info[0].shape[1] if image_info is not None else 0
        audio_len = audio_info[0].shape[1] if audio_info is not None else 0

        out, _ = self.fusion(
            params["fusion"], x, padding_mask, rel_bias, encoder_type,
            (text_len, image_len, audio_len),
            deterministic=deterministic, rng=rngs[3],
        )

        text_features = image_features = audio_features = None
        text_pad = image_pad = audio_pad = None
        if text_info is not None:
            text_features = out[:, :text_len]
            text_pad = padding_mask[:, :text_len]
        if image_info is not None:
            start = text_len
            image_features = out[:, start:start + image_len]
            image_pad = padding_mask[:, start:start + image_len]
        if audio_info is not None:
            audio_features = out[:, -audio_len:]
            audio_pad = padding_mask[:, -audio_len:]
        if return_padding_mask:
            return (text_features, image_features, audio_features,
                    text_pad, image_pad, audio_pad)
        return text_features, image_features, audio_features


@MODELS.register("one_peace_retrieval")
class OnePeaceRetrievalModel:
    """Dual/tri-encoder with L2-normalized CLS projections
    (ref: one_peace_retrieval.py:34-131)."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        enc = cfg.encoder
        head = cfg.head_type
        # drop modality branches not used by the head (ref :43-51)
        enc.use_text_moe = head in ("text", "vl", "al", "val")
        enc.use_image_moe = head in ("image", "vl", "val")
        enc.use_audio_moe = head in ("audio", "al", "val")
        self.head_type = head
        self.wrapper = ModelWrapper(
            enc,
            use_text_norm=enc.use_text_moe,
            use_image_norm=enc.use_image_moe,
            use_audio_norm=enc.use_audio_moe,
            num_rel_tables=enc.layers if cfg.copy_rel_pos_table else None,
        )

    def enable_pipeline(self, mesh, num_micro_batches: int) -> None:
        self.wrapper.enable_pipeline(mesh, num_micro_batches)

    def init(self, key, dtype=jnp.float32):
        enc = self.cfg.encoder
        keys = jax.random.split(key, 4)
        params = {"encoder_wrapper": self.wrapper.init(keys[0], dtype=dtype)}
        if enc.use_text_moe:
            params["text_proj"] = init_linear(keys[1], enc.embed_dim, enc.embed_dim, dtype=dtype)
        if enc.use_image_moe:
            params["image_proj"] = init_linear(keys[2], enc.embed_dim, enc.embed_dim, dtype=dtype)
        if enc.use_audio_moe:
            params["audio_proj"] = init_linear(keys[3], enc.embed_dim, enc.embed_dim, dtype=dtype)
        params["logit_scale"] = jnp.asarray(math.log(1 / 0.07), jnp.float32)
        return params

    def logit_scale_exp(self, params):
        """Clamped to ln(100) (ref :96-99)."""
        x = params["logit_scale"]
        # straight-through clamp (ref clamps the STORED param in place,
        # :96-99): value saturates at [0, ln 100] but the gradient stays
        # identity, so a parameter pushed past a bound by momentum can
        # still be pulled back — a plain clip has zero gradient outside
        # the range and sticks forever
        clipped = jnp.clip(x, 0.0, math.log(100.0))
        return jnp.exp(x + jax.lax.stop_gradient(clipped - x))

    def __call__(
        self,
        params,
        src_tokens=None,
        src_images=None,
        src_audios=None,
        audio_padding_masks=None,
        encoder_type: str = "text",
        deterministic: bool = True,
        rng=None,
    ):
        text_f, image_f, audio_f = self.wrapper(
            params["encoder_wrapper"],
            src_tokens=src_tokens, src_images=src_images,
            src_audios=src_audios, audio_padding_masks=audio_padding_masks,
            encoder_type=encoder_type, deterministic=deterministic, rng=rng,
        )
        if encoder_type == "text":
            cls = text_f[:, 0]
            proj = params["text_proj"]
        elif encoder_type == "image":
            cls = image_f[:, 0]
            proj = params["image_proj"]
        elif encoder_type == "audio":
            cls = audio_f[:, 0]
            proj = params["audio_proj"]
        else:
            raise NotImplementedError(encoder_type)
        out = linear(proj, cls)
        outf = out.astype(jnp.float32)
        return (outf / jnp.linalg.norm(outf, axis=-1, keepdims=True)).astype(out.dtype)


def init_attention_pooling(key, embed_dim: int, num_heads: int, dtype=jnp.float32):
    """ref: one_peace_base.py:132-144."""
    keys = jax.random.split(key, 4)
    head_dim = embed_dim // num_heads
    return {
        "k_proj": {"w": trunc_normal(keys[0], (embed_dim, embed_dim), dtype=dtype)},
        "v_proj": init_linear(keys[1], embed_dim, embed_dim, dtype=dtype),
        "out_proj": init_linear(keys[2], embed_dim, embed_dim, dtype=dtype),
        "q": trunc_normal(keys[3], (1, 1, num_heads, head_dim), dtype=dtype),
    }


def attention_pooling(params, x, key_padding_mask, num_heads: int):
    """Single-query multi-head pooling (ref one_peace_base.py:146-172).

    x: (B, L, D); returns (B, D).  Note the reference applies no 1/sqrt(d)
    scaling here — replicated.
    """
    b, l, d = x.shape
    hd = d // num_heads
    q = jnp.broadcast_to(params["q"], (b, 1, num_heads, hd))
    k = linear(params["k_proj"], x).reshape(b, l, num_heads, hd)
    v = linear(params["v_proj"], x).reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    neg = float(jnp.finfo(jnp.float32).min)
    logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, d)
    return linear(params["out_proj"], attn)


class ClassifyHead:
    """CLS-token or attention pooling -> MLP classifier
    (ref one_peace_base.py:175-235)."""

    def __init__(self, attn_pooling: bool, use_pooler: bool, pooler_dropout: float,
                 input_dim: int, num_heads: int, head_scale_ratio: float,
                 num_classes: int, use_two_images: bool = False):
        self.attn_pooling = attn_pooling
        self.use_pooler = use_pooler
        self.pooler_dropout = pooler_dropout
        self.input_dim = input_dim
        self.num_heads = num_heads
        self.inner_dim = int(input_dim * head_scale_ratio)
        self.num_classes = num_classes
        self.use_two_images = use_two_images

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 5)
        params = {"norm": init_layer_norm(self.input_dim, dtype)}
        if self.attn_pooling:
            params["attn_pooling"] = init_attention_pooling(
                keys[0], self.input_dim, self.num_heads, dtype)
        if self.use_pooler:
            params["pooler"] = init_linear(keys[1], self.input_dim, self.input_dim, dtype=dtype)
        cin = self.input_dim * 2 if self.use_two_images else self.input_dim
        params["classifier"] = {
            "fc1": init_linear(keys[2], cin, self.inner_dim, dtype=dtype),
            "ln": init_layer_norm(self.inner_dim, dtype),
            "fc2": init_linear(keys[3], self.inner_dim, self.num_classes, dtype=dtype),
        }
        return params

    def forward_features(self, params, features, padding_masks, deterministic, rng):
        from .components import dropout as _dropout, gelu

        if self.attn_pooling:
            x = attention_pooling(params["attn_pooling"], features[:, 1:],
                                  padding_masks[:, 1:], self.num_heads)
            x = layer_norm(params["norm"], x)
        else:
            x = features[:, 0]
        if self.use_pooler:
            rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
            x = _dropout(rngs[0], x, self.pooler_dropout, deterministic)
            x = jnp.tanh(linear(params["pooler"], x).astype(jnp.float32)).astype(x.dtype)
            x = _dropout(rngs[1], x, self.pooler_dropout, deterministic)
        return x

    def __call__(self, params, features_1, features_2, padding_masks,
                 deterministic=True, rng=None):
        from .components import gelu

        x = self.forward_features(params, features_1, padding_masks, deterministic, rng)
        if features_2 is not None:
            x2 = self.forward_features(params, features_2, padding_masks, deterministic, rng)
            x = jnp.concatenate([x, x2], axis=1)
        c = params["classifier"]
        x = linear(c["fc1"], x)
        x = layer_norm(c["ln"], x)
        x = gelu(x)
        return linear(c["fc2"], x)
