"""Audio modality adapter.

wav2vec2-style 1-D conv feature extractor on the LayerNormed raw 16 kHz
waveform -> LN -> Linear(512 -> embed_dim), convolutional relative positional
embedding (5 grouped convs, k=19), CLS token, and the same log-bucketed
relative-position bias as text.
Behavioral spec: ref one_peace/models/adapter/audio.py:35-311.

TPU-first deltas: NWC convs (waveform (B, T) -> (B, T, 1)), batch-first,
rel bias (layers, H, L, L).  The conv stack runs in fp32 via
``preferred_element_type`` and XLA maps it onto the MXU as strided matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.config import AudioAdapterConfig
from ..components import (
    conv1d,
    dropout,
    gelu,
    init_conv1d,
    init_linear,
    layer_norm,
    linear,
    trunc_normal,
)
from ..rel_pos import make_token_bucket_position_with_cls


def conv_output_length(length: int, spec) -> int:
    """Conv length recurrence driving the audio padding mask
    (ref: hub_interface.py:124-132) — off-by-one here breaks ESC-50."""
    for (_, kernel, stride) in spec:
        length = (length - kernel) // stride + 1
    return length


class AudioAdapter:
    def __init__(self, cfg: AudioAdapterConfig, embed_dim: int, attention_heads: int,
                 num_rel_tables: Optional[int] = None):
        self.cfg = cfg
        self.embed_dim = embed_dim
        self.attention_heads = attention_heads
        self.num_rel_tables = num_rel_tables if num_rel_tables is not None else 1
        self.num_rel_dis = 2 * cfg.bucket_size - 1 + 3 if cfg.use_attn_bias else 0
        self.fbank = None
        if getattr(cfg, "frontend", "waveform") == "fbank":
            from ...ops.preprocess import LogMelFbank

            self.fbank = LogMelFbank(n_fft=cfg.fbank_n_fft, hop=cfg.fbank_hop,
                                     n_mels=cfg.fbank_n_mels)
        # fbank frames run ~1500 for 15 s at a 10 ms hop; size the bucket
        # AND fixed abs-pos tables to cover them (waveform conv frames
        # stay <= 1024 — a 1024-slot fixed table under fbank would slice
        # short and shape-error the preserve_embed path)
        self.max_pos = 1024 if self.fbank is None else 2048
        if cfg.use_attn_bias:
            self.rp_bucket = make_token_bucket_position_with_cls(
                cfg.bucket_size, self.max_pos)
        else:
            self.rp_bucket = None
        # conv positional embedding: depth 5, k = max(3, width // depth) = 19
        # (ref audio.py:57-80)
        self.pos_conv_kernel = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        keys = jax.random.split(key, 16)
        d = self.embed_dim
        params = {}

        # feature extractor: conv (kaiming normal) -> LN(affine) -> GELU per
        # layer (ref audio.py:254-311).  The pretrain decoder's adapter has
        # no conv frontend (feature_encoder_spec empty, ref
        # pretrain_al_3B.yaml decoder.audio_adapter) — it only ever runs
        # the preserve_embed scatter path.
        if self.fbank is not None:
            params["fbank_ln"] = {
                "scale": jnp.ones((cfg.fbank_n_mels,), dtype),
                "bias": jnp.zeros((cfg.fbank_n_mels,), dtype)}
            params["fbank_proj"] = init_linear(keys[8], cfg.fbank_n_mels, d,
                                               dtype=dtype)
        elif cfg.feature_encoder_spec:
            feat = []
            in_ch = 1
            for i, (out_ch, k, _s) in enumerate(cfg.feature_encoder_spec):
                feat.append({
                    "conv": init_conv1d(keys[i % 8], in_ch, out_ch, k, bias=cfg.conv_bias,
                                        init="kaiming_normal", dtype=dtype),
                    "ln": {"scale": jnp.ones((out_ch,), dtype), "bias": jnp.zeros((out_ch,), dtype)},
                })
                in_ch = out_ch
            params["feature_extractor"] = feat
            feature_dim = cfg.feature_encoder_spec[-1][0]
            params["post_extract_ln"] = {
                "scale": jnp.ones((feature_dim,), dtype), "bias": jnp.zeros((feature_dim,), dtype)
            }
            params["post_extract_proj"] = init_linear(keys[8], feature_dim, d, dtype=dtype)

        if cfg.abs_pos_type == "conv":
            # one fresh key per conv layer (a fixed modulo would hand
            # repeated layers identical init draws)
            conv_keys = jax.random.split(keys[9], cfg.conv_pos_depth)
            pos_convs = []
            for i in range(cfg.conv_pos_depth):
                pos_convs.append(
                    init_conv1d(conv_keys[i], d, d, self.pos_conv_kernel,
                                groups=cfg.conv_pos_groups, dtype=dtype)
                )
            params["pos_convs"] = pos_convs
            if cfg.conv_pos_pre_ln:
                params["pos_pre_ln"] = {
                    "scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)
                }
            params["cls_pos_embed"] = trunc_normal(keys[13], (1, 1, d), dtype=dtype)
        elif cfg.abs_pos_type == "fixed":
            params["embed_positions"] = trunc_normal(
                keys[13], (self.max_pos + 2, d), dtype=dtype)
        else:
            raise ValueError(cfg.abs_pos_type)

        if cfg.layernorm_embedding:
            params["layernorm_embedding"] = {
                "scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)
            }
        params["cls_embedding"] = trunc_normal(keys[14], (1, 1, d), dtype=dtype)
        if cfg.add_type_embedding:
            params["type_embedding"] = jnp.zeros((1, 1, d), dtype)
        if cfg.use_attn_bias:
            params["rel_pos_table"] = jnp.zeros(
                (self.num_rel_tables, self.num_rel_dis, self.attention_heads), dtype
            )
        params["mask_embedding"] = trunc_normal(keys[15], (1, d), dtype=dtype)
        return params

    def output_length(self, length: int) -> int:
        """Waveform samples -> frontend frames (drives the padding mask)."""
        if self.fbank is not None:
            return self.fbank.num_frames(length)
        return conv_output_length(length, self.cfg.feature_encoder_spec)

    def extract_features(self, params, src_audios: jnp.ndarray) -> jnp.ndarray:
        """(B, T) raw waveform -> (B, T', embed_dim)."""
        cfg = self.cfg
        dtype = params["cls_embedding"].dtype
        if self.fbank is not None:
            feats = self.fbank(src_audios.astype(jnp.float32))
            x = layer_norm(params["fbank_ln"], feats)
            x = linear(params["fbank_proj"], x).astype(dtype)
            if cfg.freeze_extractor:
                x = jax.lax.stop_gradient(x)
            return x
        x = src_audios.astype(dtype)[..., None]  # (B, T, 1) NWC
        for block, (_, k, s) in zip(params["feature_extractor"], cfg.feature_encoder_spec):
            x = conv1d(block["conv"], x, stride=s)
            x = layer_norm(block["ln"], x)
            x = gelu(x)
        x = layer_norm(params["post_extract_ln"], x)
        x = linear(params["post_extract_proj"], x)
        if cfg.freeze_extractor:
            x = jax.lax.stop_gradient(x)
        return x

    def conv_pos_embed(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T', D) -> (B, T', D) convolutional positional features
        (ref audio.py:57-80: conv -> SamePad -> LN(no affine) -> GELU, x5)."""
        cfg = self.cfg
        y = x
        if "pos_pre_ln" in params:
            y = layer_norm(params["pos_pre_ln"], y)
        k = self.pos_conv_kernel
        for conv_params in params["pos_convs"]:
            y = conv1d(conv_params, y, stride=1, padding=k // 2, groups=cfg.conv_pos_groups)
            if k % 2 == 0:  # SamePad trims one frame for even kernels
                y = y[:, :-1]
            y = layer_norm(None, y)  # elementwise_affine=False
            y = gelu(y)
        return y

    def rel_pos_bias(self, params, seq_len: int) -> Optional[jnp.ndarray]:
        if self.rp_bucket is None:
            return None
        if seq_len > self.rp_bucket.shape[0]:
            raise ValueError(
                f"audio sequence of {seq_len} frames exceeds the rel-pos "
                f"table ({self.rp_bucket.shape[0]} positions); check the "
                f"conv feature_encoder_spec stride vs clip length")
        idx = jnp.asarray(self.rp_bucket[:seq_len, :seq_len])
        values = params["rel_pos_table"].astype(jnp.float32)[:, idx]
        return jnp.transpose(values, (0, 3, 1, 2))

    def __call__(
        self,
        params,
        src_audios: jnp.ndarray,
        padding_mask: jnp.ndarray,
        preserve_ids: Optional[jnp.ndarray] = None,
        preserve_embed: Optional[jnp.ndarray] = None,
        mask_token: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """src_audios: (B, T) waveform; padding_mask: (B, T'+1) where
        T' = conv_output_length(T) (computed host-side by the data layer,
        ref hub_interface.py:186-193).

        Returns (x, padding_mask, rel_bias): x (B, T'+1, D).
        """
        cfg = self.cfg
        bsz, seq_len = padding_mask.shape
        dtype = params["cls_embedding"].dtype
        rel_bias = self.rel_pos_bias(params, seq_len)

        if preserve_embed is not None:
            keep = preserve_ids >= 0
            pos_ids = jnp.where(keep, preserve_ids, 0)
            base = jnp.broadcast_to(mask_token.astype(dtype), (bsz, seq_len, self.embed_dim))
            upd = jnp.where(keep[..., None], preserve_embed.astype(dtype), 0.0)
            onehot = jax.nn.one_hot(pos_ids, seq_len, dtype=dtype) * keep[..., None].astype(dtype)
            scattered = jnp.einsum("bps,bpd->bsd", onehot, upd)
            covered = jnp.einsum("bps->bs", onehot)[..., None]
            x = base * (1.0 - covered) + scattered
            # fixed abs positions for the decoder path (ref audio.py:177-178)
            pos_embed = params["embed_positions"][:seq_len][None]
            x = x + pos_embed.astype(dtype)
        else:
            feats = self.extract_features(params, src_audios)  # (B, T', D)
            if preserve_ids is not None:
                padding_mask = preserve_ids == -1
                pos_ids = jnp.where(preserve_ids == -1, preserve_ids.shape[1] - 1, preserve_ids)
                # frame gather excludes CLS: ids index (CLS + frames), frame i
                # lives at row i-1 of feats (ref audio.py:133-135)
                frame_ids = jnp.clip(pos_ids[:, 1:] - 1, 0, feats.shape[1] - 1)
                feats = jnp.take_along_axis(feats, frame_ids[..., None], axis=1)
                if rel_bias is not None:
                    # (T,H,L,L) indexed -> (T,H,B,P,P) -> (T,B,H,P,P)
                    rel_bias = rel_bias[:, :, pos_ids[:, :, None], pos_ids[:, None, :]]
                    rel_bias = jnp.transpose(rel_bias, (0, 2, 1, 3, 4))
            pos = self.conv_pos_embed(params, feats)
            cls_pos = jnp.broadcast_to(params["cls_pos_embed"], (bsz, 1, self.embed_dim))
            pos_embed = jnp.concatenate([cls_pos, pos], axis=1)
            cls = jnp.broadcast_to(params["cls_embedding"], (bsz, 1, self.embed_dim))
            x = jnp.concatenate([cls, feats], axis=1)
            if "layernorm_embedding" in params:
                x = layer_norm(params["layernorm_embedding"], x)
            if cfg.shrink_alpha != 1.0:
                x = x * cfg.shrink_alpha + jax.lax.stop_gradient(x) * (1 - cfg.shrink_alpha)
            x = x + pos_embed.astype(dtype)

        if "type_embedding" in params:
            x = x + params["type_embedding"]
        x = dropout(rng, x, cfg.dropout, deterministic)
        return x, padding_mask, rel_bias
