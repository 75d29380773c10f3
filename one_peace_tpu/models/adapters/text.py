"""Text modality adapter.

Token embedding + prepended CLS + learned absolute positions (514 slots) +
per-layer relative-position attention bias from log-bucketed distances.
Behavioral spec: ref one_peace/models/adapter/text.py:32-164.

TPU-first deltas vs the reference:
- batch-first (B, L, D) layout;
- the rel-pos bias is returned batch-independent as (layers, H, L, L) —
  the batch broadcast and padding -inf (ref text.py:88, encoder:148-162)
  happen inside the attention op instead of materializing (B, H, L, L);
- the masked-pretraining "preserve ids" scatter (ref text.py:93-109,135-142)
  is a fixed-shape `jnp.where` merge instead of flat index surgery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.config import TextAdapterConfig
from ..components import dropout, layer_norm, normal_embedding, trunc_normal
from ..rel_pos import make_token_bucket_position_with_cls


class TextAdapter:
    """Static config + constant buffers; params live in a separate pytree."""

    def __init__(self, cfg: TextAdapterConfig, embed_dim: int, attention_heads: int,
                 num_rel_tables: Optional[int] = None):
        self.cfg = cfg
        self.embed_dim = embed_dim
        self.attention_heads = attention_heads
        self.num_rel_tables = num_rel_tables if num_rel_tables is not None else 1
        self.num_rel_dis = 2 * cfg.bucket_size - 1 + 3 if cfg.use_attn_bias else 0
        if cfg.use_attn_bias:
            self.rp_bucket = make_token_bucket_position_with_cls(cfg.bucket_size, 1024)
        else:
            self.rp_bucket = None

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        keys = jax.random.split(key, 6)
        params = {
            "embed_tokens": trunc_normal(keys[0], (cfg.vocab_size, self.embed_dim), dtype=dtype)
            .at[cfg.padding_idx]
            .set(0.0),
            "embed_positions": trunc_normal(keys[1], (cfg.max_positions, self.embed_dim), dtype=dtype),
            "cls_embedding": trunc_normal(keys[2], (1, 1, self.embed_dim), dtype=dtype),
        }
        if cfg.layernorm_embedding:
            params["layernorm_embedding"] = {
                "scale": jnp.ones((self.embed_dim,), dtype),
                "bias": jnp.zeros((self.embed_dim,), dtype),
            }
        if cfg.add_type_embedding:
            params["type_embedding"] = jnp.zeros((1, 1, self.embed_dim), dtype)
        if cfg.use_attn_bias:
            # zero-init rel-pos tables (ref components.py:42-43 zero_init=True)
            params["rel_pos_table"] = jnp.zeros(
                (self.num_rel_tables, self.num_rel_dis, self.attention_heads), dtype
            )
        return params

    def rel_pos_bias(self, params, seq_len: int) -> Optional[jnp.ndarray]:
        """(tables, H, L, L) fp32 — tables is layers or 1 (shared)."""
        if self.rp_bucket is None:
            return None
        idx = jnp.asarray(self.rp_bucket[:seq_len, :seq_len])
        # (tables, R, H)[idx] -> (tables, L, L, H) -> (tables, H, L, L)
        values = params["rel_pos_table"].astype(jnp.float32)[:, idx]
        return jnp.transpose(values, (0, 3, 1, 2))

    def __call__(
        self,
        params,
        src_tokens: jnp.ndarray,
        preserve_ids: Optional[jnp.ndarray] = None,
        preserve_embed: Optional[jnp.ndarray] = None,
        mask_token: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """Returns (x, padding_mask, rel_bias).

        x: (B, Lt+1, D); padding_mask: (B, Lt+1) True at pads;
        rel_bias: (tables, H, Lt+1, Lt+1) or None.
        """
        cfg = self.cfg
        bsz, tok_len = src_tokens.shape
        seq_len = tok_len + 1  # CLS prepended
        dtype = params["embed_tokens"].dtype

        padding_mask = jnp.concatenate(
            [jnp.zeros((bsz, 1), bool), src_tokens == cfg.padding_idx], axis=1
        )
        pos_embed = params["embed_positions"][:seq_len][None]  # (1, L, D)
        rel_bias = self.rel_pos_bias(params, seq_len)

        if preserve_embed is not None:
            # decoder input: mask tokens everywhere, preserved (student-visible)
            # embeddings scattered back to their original positions
            # (ref text.py:135-142, fixed-shape formulation)
            keep = preserve_ids >= 0  # (B, P)
            pos_ids = jnp.where(keep, preserve_ids, 0)
            base = jnp.broadcast_to(mask_token.astype(dtype), (bsz, seq_len, self.embed_dim))
            upd = jnp.where(keep[..., None], preserve_embed.astype(dtype), 0.0)
            onehot = jax.nn.one_hot(pos_ids, seq_len, dtype=dtype) * keep[..., None].astype(dtype)
            scattered = jnp.einsum("bps,bpd->bsd", onehot, upd)
            covered = jnp.einsum("bps->bs", onehot)[..., None]
            x = base * (1.0 - covered) + scattered
        else:
            tok = params["embed_tokens"][src_tokens]
            cls = jnp.broadcast_to(params["cls_embedding"], (bsz, 1, self.embed_dim))
            x = jnp.concatenate([cls, tok], axis=1)
            if preserve_ids is not None:
                # student path: gather the un-masked positions (fixed shape:
                # preserve_ids is right-padded with -1 -> last position)
                padding_mask = preserve_ids == -1
                pos_ids = jnp.where(preserve_ids == -1, preserve_ids.shape[1] - 1, preserve_ids)
                x = jnp.take_along_axis(x, pos_ids[..., None], axis=1)
                pos_embed = jnp.take_along_axis(
                    jnp.broadcast_to(pos_embed, (bsz, seq_len, self.embed_dim)),
                    pos_ids[..., None], axis=1,
                )
                if rel_bias is not None:
                    # bias becomes batch-dependent after gathering:
                    # (T,H,L,L) indexed -> (T,H,B,P,P) -> (T,B,H,P,P)
                    rel_bias = rel_bias[:, :, pos_ids[:, :, None], pos_ids[:, None, :]]
                    rel_bias = jnp.transpose(rel_bias, (0, 2, 1, 3, 4))
                seq_len = pos_ids.shape[1]
            if "layernorm_embedding" in params:
                x = layer_norm(params["layernorm_embedding"], x)
            if cfg.shrink_alpha != 1.0:
                x = x * cfg.shrink_alpha + jax.lax.stop_gradient(x) * (1 - cfg.shrink_alpha)

        x = x + pos_embed.astype(dtype)
        if "type_embedding" in params:
            x = x + params["type_embedding"]
        x = dropout(rng, x, cfg.dropout, deterministic)
        return x, padding_mask, rel_bias
