"""Image modality adapter.

hMLP patch embedding (conv4 -> LN -> GELU -> conv2 -> LN -> GELU -> conv2;
overall stride 16) + CLS + learned 2-D absolute positions (bicubic-resized
for non-native resolutions) + 2-D relative-position bucket bias.
Behavioral spec: ref one_peace/models/adapter/image.py:50-260.

TPU-first deltas: NHWC convs (images arrive NCHW for API parity and are
transposed once), batch-first outputs, rel bias kept (layers, H, L, L),
bicubic pos-embed resize as a precomputed matrix pair (utils/interpolate.py)
instead of F.interpolate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.config import ImageAdapterConfig
from ...utils.interpolate import bicubic_resize_matrix
from ..components import (
    conv2d,
    dropout,
    init_conv2d,
    layer_norm,
    trunc_normal,
)
from ..rel_pos import make_image_bucket_position


class ImageAdapter:
    def __init__(self, cfg: ImageAdapterConfig, embed_dim: int, attention_heads: int,
                 num_rel_tables: Optional[int] = None):
        self.cfg = cfg
        self.embed_dim = embed_dim
        self.attention_heads = attention_heads
        self.num_rel_tables = num_rel_tables if num_rel_tables is not None else 1
        if cfg.use_attn_bias:
            self.num_rel_dis = (2 * cfg.rel_bucket_size - 1) ** 2 + 3
            self.rp_bucket = make_image_bucket_position(cfg.rel_bucket_size)
        else:
            self.num_rel_dis = 0
            self.rp_bucket = None

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        params = {}
        d = self.embed_dim
        if cfg.vision_encoder_type == "mlp":
            params["patch_conv"] = init_conv2d(keys[0], 3, d, 16, bias=False, dtype=dtype)
        elif cfg.vision_encoder_type == "hmlp":
            params["hmlp"] = {
                "conv1": init_conv2d(keys[0], 3, d // 4, 4, dtype=dtype),
                "ln1": {"scale": jnp.ones((d // 4,), dtype), "bias": jnp.zeros((d // 4,), dtype)},
                "conv2": init_conv2d(keys[1], d // 4, d // 4, 2, dtype=dtype),
                "ln2": {"scale": jnp.ones((d // 4,), dtype), "bias": jnp.zeros((d // 4,), dtype)},
                "conv3": init_conv2d(keys[2], d // 4, d, 2, dtype=dtype),
            }
        params["cls_embedding"] = trunc_normal(keys[3], (1, 1, d), dtype=dtype)
        params["pos_embed"] = trunc_normal(keys[4], (cfg.bucket_size**2 + 1, d), dtype=dtype)
        if cfg.layernorm_embedding:
            params["layernorm_embedding"] = {
                "scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)
            }
        if cfg.add_type_embedding:
            params["type_embedding"] = jnp.zeros((1, 1, d), dtype)
            params["type_embedding_2"] = jnp.zeros((1, 1, d), dtype)
        if cfg.use_attn_bias:
            params["rel_pos_table"] = jnp.zeros(
                (self.num_rel_tables, self.num_rel_dis, self.attention_heads), dtype
            )
        return params

    def embed_patches(self, params, images_nhwc: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, (H/16)*(W/16), D)."""
        cfg = self.cfg
        images_nhwc = images_nhwc.astype(params["cls_embedding"].dtype)
        if cfg.vision_encoder_type == "mlp":
            y = conv2d(params["patch_conv"], images_nhwc, stride=16)
        elif cfg.vision_encoder_type == "hmlp":
            p = params["hmlp"]
            y = conv2d(p["conv1"], images_nhwc, stride=4)
            y = layer_norm(p["ln1"], y)
            from ..components import gelu

            y = gelu(y)
            y = conv2d(p["conv2"], y, stride=2)
            y = layer_norm(p["ln2"], y)
            y = gelu(y)
            y = conv2d(p["conv3"], y, stride=2)
        else:
            raise ValueError(f"no patch embed for {cfg.vision_encoder_type!r}")
        b, h, w, d = y.shape
        return y.reshape(b, h * w, d)

    def get_pos_embed(self, params, window_size: int) -> jnp.ndarray:
        """(1, window**2+1, D); bicubic-resized when the input resolution
        differs from the native bucket grid (ref image.py:173-186)."""
        cfg = self.cfg
        pos = params["pos_embed"]
        if window_size != cfg.bucket_size:
            d = pos.shape[-1]
            cls_pos, grid = pos[:1], pos[1:]
            m = jnp.asarray(bicubic_resize_matrix(cfg.bucket_size, window_size))
            gridf = grid.reshape(cfg.bucket_size, cfg.bucket_size, d).astype(jnp.float32)
            out = jnp.einsum("oi,ijd->ojd", m, gridf)
            out = jnp.einsum("pj,ojd->opd", m, out)
            pos = jnp.concatenate(
                [cls_pos, out.reshape(window_size**2, d).astype(pos.dtype)], axis=0
            )
        return pos[None]

    def rel_pos_bias(self, params) -> Optional[jnp.ndarray]:
        if self.rp_bucket is None:
            return None
        idx = jnp.asarray(self.rp_bucket)
        values = params["rel_pos_table"].astype(jnp.float32)[:, idx]
        return jnp.transpose(values, (0, 3, 1, 2))

    def __call__(
        self,
        params,
        src_images: jnp.ndarray,
        preserve_ids: Optional[jnp.ndarray] = None,
        preserve_embed: Optional[jnp.ndarray] = None,
        mask_token: Optional[jnp.ndarray] = None,
        is_second_image: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """src_images: (B, 3, H, W) (NCHW for reference API parity).

        Returns (x, padding_mask, rel_bias): x (B, win**2+1, D).
        """
        cfg = self.cfg
        bsz = src_images.shape[0]
        window_size = src_images.shape[2] // 16
        seq_len = window_size**2 + 1
        if cfg.use_attn_bias and window_size != cfg.rel_bucket_size:
            raise ValueError(
                f"image {src_images.shape[2]}px gives a {window_size}x"
                f"{window_size} patch grid but rel_bucket_size is "
                f"{cfg.rel_bucket_size}; set image_adapter.rel_bucket_size = "
                f"patch_image_size // 16 (ref one_peace_retrieval.py:128)")
        dtype = params["cls_embedding"].dtype

        padding_mask = jnp.zeros((bsz, seq_len), bool)
        pos_embed = self.get_pos_embed(params, window_size)
        rel_bias = self.rel_pos_bias(params)

        if preserve_embed is not None:
            keep = preserve_ids >= 0
            pos_ids = jnp.where(keep, preserve_ids, 0)
            base = jnp.broadcast_to(mask_token.astype(dtype), (bsz, seq_len, self.embed_dim))
            upd = jnp.where(keep[..., None], preserve_embed.astype(dtype), 0.0)
            onehot = jax.nn.one_hot(pos_ids, seq_len, dtype=dtype) * keep[..., None].astype(dtype)
            scattered = jnp.einsum("bps,bpd->bsd", onehot, upd)
            covered = jnp.einsum("bps->bs", onehot)[..., None]
            x = base * (1.0 - covered) + scattered
        else:
            patches = self.embed_patches(params, jnp.transpose(src_images, (0, 2, 3, 1)))
            cls = jnp.broadcast_to(params["cls_embedding"], (bsz, 1, self.embed_dim))
            x = jnp.concatenate([cls, patches], axis=1)
            if preserve_ids is not None:
                padding_mask = preserve_ids == -1
                pos_ids = jnp.where(preserve_ids == -1, preserve_ids.shape[1] - 1, preserve_ids)
                x = jnp.take_along_axis(x, pos_ids[..., None], axis=1)
                pos_embed = jnp.take_along_axis(
                    jnp.broadcast_to(pos_embed, (bsz, seq_len, self.embed_dim)),
                    pos_ids[..., None], axis=1,
                )
                if rel_bias is not None:
                    # (T,H,L,L) indexed -> (T,H,B,P,P) -> (T,B,H,P,P)
                    rel_bias = rel_bias[:, :, pos_ids[:, :, None], pos_ids[:, None, :]]
                    rel_bias = jnp.transpose(rel_bias, (0, 2, 1, 3, 4))
            if "layernorm_embedding" in params:
                x = layer_norm(params["layernorm_embedding"], x)
            if cfg.shrink_alpha != 1.0:
                x = x * cfg.shrink_alpha + jax.lax.stop_gradient(x) * (1 - cfg.shrink_alpha)

        x = x + pos_embed.astype(dtype)
        if "type_embedding" in params:
            x = x + params["type_embedding"]
        if is_second_image and "type_embedding_2" in params:
            x = x + params["type_embedding_2"]
        x = dropout(rng, x, cfg.dropout, deterministic)
        return x, padding_mask, rel_bias
