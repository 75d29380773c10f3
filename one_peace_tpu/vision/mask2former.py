"""Mask2Former segmentation head — the reference's actual ADE20K decoder.

The reference's 896px ADE20K recipe is ViT-Adapter + **Mask2Former**
(ref seg/configs/ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k_ss
.py: num_queries=200, feat/out channels 1024, MSDeformAttnPixelDecoder
with 6 deformable encoder layers over the 1/8–1/32 levels, a 9-layer
masked-attention transformer decoder, sine positional encoding; base
semantics in seg/configs/_base_/models/mask2former_onepeace.py).
UperNet (vision/upernet.py) remains as the lighter alternative head.

TPU-native: NHWC param-dict modules, fp32-softmax attention einsums,
static query/level counts so the whole head jits into the train step.
The masked cross-attention (attend only inside the previous round's
predicted mask, fall back to full attention for empty masks) is an
additive -inf bias — no boolean scatter, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import (
    conv2d,
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from .adapter import group_norm
from .ms_deform_attn import MSDeformAttnModule


# ---------------------------------------------------------------------------
# sine positional encoding (mmdet SinePositionalEncoding, normalize=True)
# ---------------------------------------------------------------------------


def sine_positional_encoding(h: int, w: int, dim: int,
                             temperature: float = 10000.0) -> np.ndarray:
    """(h*w, dim) host-side constant; num_feats = dim/2 per axis, row/col
    indices 1..H cumsum-style, normalized to [0, 2pi] (mmdet
    SinePositionalEncoding with normalize=True, eps=1e-6)."""
    num_feats = dim // 2
    eps, scale = 1e-6, 2 * math.pi
    y = (np.arange(1, h + 1, dtype=np.float64)[:, None]
         / (h + eps) * scale)  # (h, 1)
    x = (np.arange(1, w + 1, dtype=np.float64)[None, :]
         / (w + eps) * scale)  # (1, w)
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)
    py = y[..., None] / dim_t  # (h, 1, F)
    px = x[..., None] / dim_t  # (1, w, F)

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        axis=-1).reshape(p.shape[:-1] + (num_feats,))

    py = np.broadcast_to(interleave(py), (h, w, num_feats))
    px = np.broadcast_to(interleave(px), (h, w, num_feats))
    pos = np.concatenate([py, px], axis=-1)  # (h, w, dim) — y first
    return pos.reshape(h * w, dim).astype(np.float32)


# ---------------------------------------------------------------------------
# plain multi-head attention with an additive mask (decoder building block)
# ---------------------------------------------------------------------------


def init_mha(key, dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {n: init_linear(k, dim, dim, dtype=dtype)
            for n, k in zip(("q", "k", "v", "out"), ks)}


def mha(params, heads: int, q, k, v, attn_bias=None):
    """q (B, Lq, D); k/v (B, Lk, D); attn_bias (B, Lq, Lk) additive fp32
    (broadcast over heads) or None."""
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // heads
    qh = linear(params["q"], q).reshape(b, lq, heads, dh)
    kh = linear(params["k"], k).reshape(b, lk, heads, dh)
    vh = linear(params["v"], v).reshape(b, lk, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    if attn_bias is not None:
        logits = logits + attn_bias[:, None].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, lq, d)
    return linear(params["out"], out)


def init_ffn(key, dim: int, hidden: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden, dtype=dtype),
            "fc2": init_linear(k2, hidden, dim, dtype=dtype)}


def ffn(params, x):
    return linear(params["fc2"], jax.nn.relu(linear(params["fc1"], x)))


# ---------------------------------------------------------------------------
# pixel decoder (mmdet MSDeformAttnPixelDecoder semantics)
# ---------------------------------------------------------------------------


class MSDeformAttnPixelDecoder:
    """Deformable-encoder pixel decoder over the backbone pyramid.

    Inputs: 4 NHWC levels [f4, f8, f16, f32]; the 3 coarse levels go
    through 6 deformable self-attention encoder layers; f4 is fused back
    FPN-style; outputs per-scale decoder memories (coarse->fine:
    [1/32, 1/16, 1/8]) and the 1/4 mask features.
    """

    def __init__(self, in_channels: Sequence[int], feat_channels: int = 256,
                 out_channels: int = 256, num_layers: int = 6,
                 num_heads: int = 8, num_points: int = 4,
                 ffn_dim: int = 1024):
        self.cin = list(in_channels)  # [f4, f8, f16, f32] dims
        self.c = feat_channels
        self.out = out_channels
        self.num_layers = num_layers
        self.heads = num_heads
        self.points = num_points
        self.ffn_dim = ffn_dim
        self.attn = MSDeformAttnModule(feat_channels, n_levels=3,
                                       n_heads=num_heads, n_points=num_points)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 6 + 3 * self.num_layers)
        ki = iter(keys)
        params = {
            # 1x1 input projections + GN for the 3 transformer levels
            # (coarse->fine order: f32, f16, f8 — mmdet reverses)
            "inputs": [{
                "conv": init_conv2d(next(ki), cin, self.c, 1, dtype=dtype),
                "gn": {"scale": jnp.ones((self.c,), dtype),
                       "bias": jnp.zeros((self.c,), dtype)},
            } for cin in (self.cin[3], self.cin[2], self.cin[1])],
            "level_embed": jax.random.normal(
                next(ki), (3, self.c)).astype(dtype),
            "layers": [{
                "attn": self.attn.init(next(ki), dtype=dtype),
                "attn_ln": init_layer_norm(self.c, dtype),
                "ffn": init_ffn(next(ki), self.c, self.ffn_dim, dtype),
                "ffn_ln": init_layer_norm(self.c, dtype),
            } for _ in range(self.num_layers)],
            # FPN fusion of the 1/4 level
            "lateral": {
                "conv": init_conv2d(next(ki), self.cin[0], self.c, 1,
                                    bias=False, dtype=dtype),
                "gn": {"scale": jnp.ones((self.c,), dtype),
                       "bias": jnp.zeros((self.c,), dtype)},
            },
            "output": {
                "conv": init_conv2d(next(ki), self.c, self.c, 3, bias=False,
                                    dtype=dtype),
                "gn": {"scale": jnp.ones((self.c,), dtype),
                       "bias": jnp.zeros((self.c,), dtype)},
            },
            "mask_feature": init_conv2d(next(ki), self.c, self.out, 1,
                                        dtype=dtype),
        }
        return params

    def __call__(self, params, feats: List[jnp.ndarray]):
        """feats: NHWC [f4, f8, f16, f32].  Returns (mask_features
        (B, H4, W4, out), memories [(B, Hl*Wl, C)] coarse->fine,
        shapes [(Hl, Wl)] coarse->fine)."""
        from .adapter import get_reference_points

        b = feats[0].shape[0]
        coarse = [feats[3], feats[2], feats[1]]  # f32, f16, f8
        shapes = [f.shape[1:3] for f in coarse]
        toks, poss = [], []
        for i, (f, p) in enumerate(zip(coarse, params["inputs"])):
            t = group_norm(p["gn"], conv2d(p["conv"], f, stride=1))
            h, w = t.shape[1:3]
            toks.append(t.reshape(b, h * w, self.c))
            pos = jnp.asarray(sine_positional_encoding(h, w, self.c))
            poss.append(pos[None] + params["level_embed"][i][None, None])
        x = jnp.concatenate(toks, axis=1)
        pos = jnp.concatenate(poss, axis=1).astype(x.dtype)
        ref = jnp.asarray(np.tile(get_reference_points(shapes), (b, 1, 1, 1)))

        for lp in params["layers"]:
            y = self.attn(lp["attn"], x + pos, ref, x, shapes)
            x = layer_norm(lp["attn_ln"], x + y)
            x = layer_norm(lp["ffn_ln"], x + ffn(lp["ffn"], x))

        # split levels back out; fuse the finest (1/8) into f4
        sizes = [h * w for h, w in shapes]
        offs = np.cumsum([0] + sizes)
        memories = [x[:, offs[i]:offs[i + 1]] for i in range(3)]
        f8 = memories[2].reshape(b, shapes[2][0], shapes[2][1], self.c)
        lat = group_norm(params["lateral"]["gn"],
                         conv2d(params["lateral"]["conv"], feats[0], 1))
        h4, w4 = lat.shape[1:3]
        y = lat + jax.image.resize(f8, (b, h4, w4, self.c), "bilinear")
        y = jax.nn.relu(group_norm(params["output"]["gn"],
                                   conv2d(params["output"]["conv"], y, 1,
                                          "SAME")))
        mask_features = conv2d(params["mask_feature"], y, stride=1)
        return mask_features, memories, shapes


# ---------------------------------------------------------------------------
# transformer decoder head (mmdet Mask2FormerHead semantics)
# ---------------------------------------------------------------------------


class Mask2FormerHead:
    """Learned queries -> (class, mask) set predictions.

    9 decoder layers round-robin over the 3 pixel-decoder scales; each
    layer: masked cross-attention (attend only inside the previous
    prediction's mask; empty masks attend everywhere), self-attention,
    FFN — order per ref config operation_order ('cross_attn', 'norm',
    'self_attn', 'norm', 'ffn', 'norm').  Predictions are emitted before
    layer 0 and after every layer (10 total) for deep supervision.
    """

    def __init__(self, num_classes: int, in_channels: Sequence[int],
                 feat_channels: int = 256, out_channels: int = 256,
                 num_queries: int = 100, num_layers: int = 9,
                 num_heads: int = 8, ffn_dim: int = 2048,
                 pixel_decoder_layers: int = 6, pixel_heads: int = 8,
                 pixel_ffn_dim: int = 1024):
        self.num_classes = num_classes
        self.c = feat_channels
        self.out = out_channels
        self.q = num_queries
        self.num_layers = num_layers
        self.heads = num_heads
        self.ffn_dim = ffn_dim
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            in_channels, feat_channels, out_channels,
            num_layers=pixel_decoder_layers, num_heads=pixel_heads,
            ffn_dim=pixel_ffn_dim)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 8 + 3 * self.num_layers)
        ki = iter(keys)
        c = self.c
        return {
            "pixel_decoder": self.pixel_decoder.init(next(ki), dtype),
            "query_feat": jax.random.normal(next(ki),
                                            (self.q, c)).astype(dtype) * 0.02,
            "query_embed": jax.random.normal(next(ki),
                                             (self.q, c)).astype(dtype) * 0.02,
            "level_embed": jax.random.normal(next(ki), (3, c)).astype(dtype)
            * 0.02,
            "layers": [{
                "cross_attn": init_mha(next(ki), c, dtype),
                "cross_ln": init_layer_norm(c, dtype),
                "self_attn": init_mha(next(ki), c, dtype),
                "self_ln": init_layer_norm(c, dtype),
                "ffn": init_ffn(next(ki), c, self.ffn_dim, dtype),
                "ffn_ln": init_layer_norm(c, dtype),
            } for _ in range(self.num_layers)],
            "post_norm": init_layer_norm(c, dtype),
            "cls_embed": init_linear(next(ki), c, self.num_classes + 1,
                                     dtype=dtype),
            "mask_embed": [
                init_linear(next(ki), c, c, dtype=dtype),
                init_linear(next(ki), c, c, dtype=dtype),
                init_linear(next(ki), c, self.out, dtype=dtype),
            ],
        }

    def _predict(self, params, query, mask_features,
                 target_hw: Tuple[int, int]):
        """-> (cls (B, Q, C+1), mask (B, Q, H4, W4), attn_bias
        (B, Q, th*tw) additive for the next round's cross-attention)."""
        x = layer_norm(params["post_norm"], query)
        cls = linear(params["cls_embed"], x)
        emb = x
        for i, mp in enumerate(params["mask_embed"]):
            emb = linear(mp, emb)
            if i < len(params["mask_embed"]) - 1:
                emb = jax.nn.relu(emb)
        mask = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
        b, q, h, w = mask.shape
        th, tw = target_hw
        small = jax.image.resize(mask, (b, q, th, tw), "bilinear")
        blocked = (small.reshape(b, q, th * tw) < 0.0)  # sigmoid < 0.5
        # a fully-blocked query attends everywhere (mmdet rule)
        blocked = blocked & ~jnp.all(blocked, axis=-1, keepdims=True)
        attn_bias = jnp.where(blocked, -1e9, 0.0).astype(jnp.float32)
        return cls, mask, attn_bias

    def __call__(self, params, feats: List[jnp.ndarray]):
        """feats: backbone pyramid [f4, f8, f16, f32] NHWC.  Returns
        (all_cls (L+1, B, Q, C+1), all_masks (L+1, B, Q, H4, W4))."""
        mask_features, memories, shapes = self.pixel_decoder(
            params["pixel_decoder"], feats)
        b = mask_features.shape[0]
        poss = []
        for i, (h, w) in enumerate(shapes):
            pos = jnp.asarray(sine_positional_encoding(h, w, self.c))
            poss.append((pos[None] + params["level_embed"][i][None, None])
                        .astype(mask_features.dtype))

        query = jnp.broadcast_to(params["query_feat"][None],
                                 (b, self.q, self.c))
        qpos = jnp.broadcast_to(params["query_embed"][None],
                                (b, self.q, self.c))

        all_cls, all_masks = [], []
        cls, mask, attn_bias = self._predict(params, query, mask_features,
                                             shapes[0])
        all_cls.append(cls)
        all_masks.append(mask)
        for li, lp in enumerate(params["layers"]):
            lvl = li % 3
            mem = memories[lvl]
            y = mha(lp["cross_attn"], self.heads, query + qpos,
                    mem + poss[lvl], mem, attn_bias)
            query = layer_norm(lp["cross_ln"], query + y)
            y = mha(lp["self_attn"], self.heads, query + qpos,
                    query + qpos, query)
            query = layer_norm(lp["self_ln"], query + y)
            query = layer_norm(lp["ffn_ln"], query + ffn(lp["ffn"], query))
            nxt = shapes[(li + 1) % 3]
            cls, mask, attn_bias = self._predict(params, query,
                                                 mask_features, nxt)
            all_cls.append(cls)
            all_masks.append(mask)
        return jnp.stack(all_cls), jnp.stack(all_masks)


def semantic_inference(cls_logits: jnp.ndarray,
                       mask_logits: jnp.ndarray) -> jnp.ndarray:
    """Final-layer (B, Q, C+1) + (B, Q, H, W) -> (B, H, W, C) semantic
    logits: sum_q p(q, c) * sigmoid(mask_q) (Mask2Former semantic head)."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)[..., :-1]
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    return jnp.einsum("bqc,bqhw->bhwc", probs, masks)
