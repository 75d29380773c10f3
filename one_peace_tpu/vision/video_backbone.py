"""Video (K400) backbone: AIM-style temporal adaptation of the frozen trunk.

Behavioral spec: ref one_peace_vision/video/mmaction_custom/models/
backbones/onepeace.py —

- ``Adapter`` bottleneck MLP (down D/4, GELU, up; optional skip)
  (ref :21-39);
- the image adapter adds a learned ``temporal_embedding`` over frames
  after the spatial pos embed (ref :158,195-200);
- every encoder layer performs, with the *shared frozen* attention
  weights (ref :332-353):
    1. temporal adaptation: attention over the ``t`` axis per spatial
       location, wrapped by T_Adapter (no skip), added to x with DropPath;
    2. spatial adaptation: bias-attention over tokens per frame, wrapped
       by S_Adapter (skip), residual from the *pre-temporal* x with
       gamma_1;
    3. joint adaptation: GeGLU FFN + scale * MLP_Adapter (no skip) off
       the same LN, both added to the residual (gamma_2 on the FFN).
- replaces the round-1 mean-pool-over-frames classifier (VERDICT r1
  missing #4): K400 88.1 needs temporal modeling.

TPU-first: layers are homogeneous -> stacked params + one lax.scan; the
(b t) n d <-> (b n) t d rearranges are pure reshapes/transposes under a
static frame count; only adapters/temporal embedding/head are trainable
(``trainable_mask``), matching AIM's frozen-trunk recipe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import (
    drop_path,
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from ..models.rel_pos import make_image_bucket_position
from ..ops.attention import multihead_attention


# ---------------------------------------------------------------------------
# adapter bottleneck (ref :21-39)
# ---------------------------------------------------------------------------


def subgrid_token_indices(h: int, w: int, bucket_size: int) -> np.ndarray:
    """Token indices (CLS + row-major (h, w) sub-grid) into the
    (bucket_size**2 + 1)-token position tables.  A flat ``[:h*w+1]``
    prefix would pick the first h*w positions of the FULL bucket grid —
    wrong whenever the frame grid is smaller than bucket_size."""
    grid = (1 + np.arange(h)[:, None] * bucket_size
            + np.arange(w)[None, :]).reshape(-1)
    return np.concatenate([[0], grid])


def init_adapter(key, d: int, mlp_ratio: float = 0.25, dtype=jnp.float32):
    """fc2 zero-init: the adapted model starts exactly equal to the frozen
    trunk (ref onepeace.py:640-665 zeroes every adapter's D_fc2)."""
    hid = int(d * mlp_ratio)
    return {"fc1": init_linear(key, d, hid, dtype=dtype),
            "fc2": {"w": jnp.zeros((hid, d), dtype),
                    "b": jnp.zeros((d,), dtype)}}


def adapter(params, x, skip: bool):
    y = linear(params["fc2"], gelu(linear(params["fc1"], x)))
    return x + y if skip else y


# ---------------------------------------------------------------------------
# video encoder layer (ref :332-353)
# ---------------------------------------------------------------------------


def _attn(params, heads: int, x, rel_bias=None):
    """Shared frozen attention: fused-qkv semantics + Magneto LN
    (ref video onepeace.py MultiheadAttention)."""
    b, l, d = x.shape
    dh = d // heads
    q = linear(params["q_proj"], x).reshape(b, l, heads, dh)
    k = linear(params["k_proj"], x).reshape(b, l, heads, dh)
    v = linear(params["v_proj"], x).reshape(b, l, heads, dh)
    out = multihead_attention(q, k, v, rel_bias, None, scaling=dh ** -0.5)
    out = out.reshape(b, l, d)
    out = layer_norm(params["ln"], out)
    return linear(params["out_proj"], out)


def init_video_layer(key, d: int, f: int, dtype=jnp.float32):
    """Trunk layer (shared structure with the det backbone, no rel-pos
    tables) + the three AIM adapters."""
    from .det_backbone import init_det_layer

    k_base, k1, k2, k3 = jax.random.split(key, 4)
    layer = init_det_layer(k_base, d, f, heads=1, input_size=1,
                           use_decomposed_rel_pos=False, dtype=dtype)
    layer.update({
        "t_adapter": init_adapter(k1, d, dtype=dtype),
        "s_adapter": init_adapter(k2, d, dtype=dtype),
        "mlp_adapter": init_adapter(k3, d, dtype=dtype),
    })
    return layer


def video_layer(params, heads: int, num_frames: int, adapter_scale: float,
                x: jnp.ndarray, rel_bias, dpr, deterministic=True, rng=None):
    """x (B*T, N, D) -> same (ref video onepeace.py:332-353)."""
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    bt, n, d = x.shape
    b = bt // num_frames
    residual = x

    # 1. temporal adaptation: attention over frames per spatial location
    xt = layer_norm(params["self_attn_layer_norm"], x)
    xt = xt.reshape(b, num_frames, n, d).transpose(0, 2, 1, 3) \
        .reshape(b * n, num_frames, d)
    xt = _attn(params["self_attn"], heads, xt)
    xt = adapter(params["t_adapter"], xt, skip=False)
    xt = xt.reshape(b, n, num_frames, d).transpose(0, 2, 1, 3).reshape(bt, n, d)
    x = x + drop_path(rngs[0], xt, dpr, deterministic)

    # 2. spatial adaptation (residual from the pre-temporal x, ref :337-345)
    xs = layer_norm(params["self_attn_layer_norm"], x)
    xs = _attn(params["self_attn"], heads, xs, rel_bias)
    xs = adapter(params["s_adapter"], xs, skip=True)
    x = residual + drop_path(rngs[1], xs * params["gamma_1"], dpr,
                             deterministic)

    # 3. joint adaptation: FFN + scaled MLP adapter off the same LN
    residual = x
    xn = layer_norm(params["final_layer_norm"], x)
    ffn = params["image_ffn"]
    # serving-mode int8 dispatch (same pattern as models/encoder)
    from ..ops.quant import is_quantized, quantized_linear
    lin = quantized_linear if is_quantized(ffn["wi_0"]) else linear
    y = gelu(lin(ffn["wi_0"], xn)) * lin(ffn["wi_1"], xn)
    y = layer_norm(ffn["ffn_ln"], y)
    y = (quantized_linear if is_quantized(ffn["wo"]) else linear)(
        ffn["wo"], y)
    mlp = adapter(params["mlp_adapter"], xn, skip=False) * adapter_scale
    return residual + y * params["gamma_2"] + drop_path(
        rngs[2], mlp, dpr, deterministic)


# ---------------------------------------------------------------------------
# backbone + classifier
# ---------------------------------------------------------------------------


class VideoBackbone:
    """hMLP embed + CLS + pos + temporal embedding -> scanned video layers."""

    def __init__(self, embed_dim=1536, ffn_embed_dim=6144, heads=24,
                 layers=40, bucket_size=16, num_frames=8, adapter_scale=0.5,
                 drop_path_rate=0.0, checkpoint_activations=False):
        self.d, self.f, self.heads = embed_dim, ffn_embed_dim, heads
        self.layers = layers
        self.bucket_size = bucket_size
        self.num_frames = num_frames
        self.adapter_scale = adapter_scale
        self.checkpoint_activations = checkpoint_activations
        self.dpr = np.linspace(0, drop_path_rate, layers, dtype=np.float32)

    def init(self, key, dtype=jnp.float32):
        from .det_backbone import init_hmlp

        d = self.d
        keys = jax.random.split(key, 5)
        scale = d ** -0.5
        layer_keys = jax.random.split(keys[3], self.layers)
        num_rel = (2 * self.bucket_size - 1) ** 2 + 3
        return {
            "hmlp": init_hmlp(keys[0], d, dtype),
            "cls_embedding": (scale * jax.random.normal(
                keys[1], (1, 1, d))).astype(dtype),
            "pos_embed": (scale * jax.random.normal(
                keys[2], (self.bucket_size ** 2 + 1, d))).astype(dtype),
            # zero-init like the reference (ref :158)
            "temporal_embedding": jnp.zeros((1, self.num_frames, d), dtype),
            "rel_pos_table": jnp.zeros((num_rel, self.heads), dtype),
            "layers": jax.vmap(lambda k: init_video_layer(
                k, d, self.f, dtype))(layer_keys),
        }

    def trainable_mask(self, params):
        """AIM recipe: only adapters, temporal embedding and the rel table
        train; the pretrained trunk stays frozen."""
        def mark(path_leaf):
            kp, _ = path_leaf
            names = {str(getattr(k, "key", k)) for k in kp}
            return bool(names & {"t_adapter", "s_adapter", "mlp_adapter",
                                 "temporal_embedding", "rel_pos_table"})

        flat = jax.tree_util.tree_flatten_with_path(params)
        leaves = [mark(x) for x in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], leaves)

    def __call__(self, params, frames: jnp.ndarray, deterministic=True,
                 rng=None) -> jnp.ndarray:
        """frames (B, T, 3, H, W) -> (B*T, N, D) token features (CLS at 0)."""
        b, t = frames.shape[:2]
        assert t == self.num_frames, (t, self.num_frames)
        from .det_backbone import hmlp_stem

        x = hmlp_stem(params["hmlp"], frames.reshape(
            (b * t,) + frames.shape[2:]).transpose(0, 2, 3, 1))
        bt, h, w, d = x.shape
        assert h <= self.bucket_size and w <= self.bucket_size, \
            (h, w, self.bucket_size)
        x = x.reshape(bt, h * w, d)
        cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype),
                               (bt, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
        tok_idx = subgrid_token_indices(h, w, self.bucket_size)
        x = x + params["pos_embed"][tok_idx].astype(x.dtype)

        # temporal embedding over frames (ref :195-200)
        n = x.shape[1]
        x = x.reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b * n, t, d)
        x = x + params["temporal_embedding"].astype(x.dtype)
        x = x.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(bt, n, d)

        rp = make_image_bucket_position(self.bucket_size)[
            np.ix_(tok_idx, tok_idx)]
        rel_bias = params["rel_pos_table"][rp].transpose(2, 0, 1)

        heads, t_frames, ascale = self.heads, self.num_frames, self.adapter_scale
        use_rng = rng is not None and not deterministic
        layer_rngs = (jax.random.split(rng, self.layers) if use_rng
                      else jnp.zeros((self.layers, 2), jnp.uint32))

        def body(carry, scanned):
            lp, l_dpr, l_rng = scanned
            out = video_layer(lp, heads, t_frames, ascale, carry, rel_bias,
                              l_dpr, deterministic,
                              l_rng if use_rng else None)
            return out, None

        if self.checkpoint_activations:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(
            body, x, (params["layers"], jnp.asarray(self.dpr), layer_rngs))
        return x


class VideoClassifierV2:
    """K400 classifier: temporal-adapted backbone -> CLS tokens -> mean over
    frames -> LN + linear head (the recognizer head capability of
    ref one_peace_vision/video/)."""

    def __init__(self, num_classes: int, **backbone_kw):
        self.backbone = VideoBackbone(**backbone_kw)
        self.num_classes = num_classes

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "backbone": self.backbone.init(k1, dtype),
            "norm": init_layer_norm(self.backbone.d, dtype),
            "head": init_linear(k2, self.backbone.d, self.num_classes,
                                dtype=dtype),
        }

    def trainable_mask(self, params):
        mask = {"backbone": self.backbone.trainable_mask(params["backbone"])}
        mask["norm"] = jax.tree.map(lambda _: True, params["norm"])
        mask["head"] = jax.tree.map(lambda _: True, params["head"])
        return mask

    def __call__(self, params, frames: jnp.ndarray, deterministic=True,
                 rng=None) -> jnp.ndarray:
        b, t = frames.shape[:2]
        tokens = self.backbone(params["backbone"], frames, deterministic, rng)
        cls = tokens[:, 0].reshape(b, t, -1).mean(axis=1)
        cls = layer_norm(params["norm"], cls)
        return linear(params["head"], cls)
