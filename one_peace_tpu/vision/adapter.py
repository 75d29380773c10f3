"""ViT-Adapter interaction modules for dense prediction.

Behavioral spec: ref one_peace_vision/seg/mmseg_custom/models/backbones/
adapter_modules.py — SpatialPriorModule (conv stem producing 1/4..1/32
priors), Injector (deformable attention from multi-scale priors into ViT
tokens, LayerScale-gated), Extractor (reverse + ConvFFN with depthwise
conv), and the CLS-aware interaction block that interleaves them with the
backbone's transformer layers.

TPU-native: NHWC convs, GroupNorm instead of SyncBatchNorm (single-host
pjit has no cross-process BN; GN is the standard drop-in for dense
prediction), the MSDeformAttnModule from vision/ms_deform_attn.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import (
    conv2d,
    gelu,
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from .ms_deform_attn import MSDeformAttnModule


def get_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """(1, sum(H*W), 1, 2) pixel-center reference points in [0, 1]
    (ref adapter_modules.py:10-22)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij")
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)[None, :, None, :]
    return ref.astype(np.float32)


def group_norm(params, x, groups: int = 32, eps: float = 1e-5):
    """NHWC GroupNorm."""
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * params["scale"] + params["bias"]).astype(x.dtype)


class SpatialPriorModule:
    """Conv stem -> {c1 (1/4, spatial), c2, c3, c4 (flattened tokens)}
    (ref adapter_modules.py:234-295)."""

    def __init__(self, inplanes: int = 64, embed_dim: int = 384):
        self.inplanes = inplanes
        self.embed_dim = embed_dim

    def init(self, key, dtype=jnp.float32):
        cp_ = self.inplanes
        keys = jax.random.split(key, 16)

        def conv_gn(k, cin, cout, kernel):
            return {
                "conv": init_conv2d(k, cin, cout, kernel, bias=False, dtype=dtype),
                "gn": {"scale": jnp.ones((cout,), dtype),
                       "bias": jnp.zeros((cout,), dtype)},
            }

        return {
            "stem1": conv_gn(keys[0], 3, cp_, 3),
            "stem2": conv_gn(keys[1], cp_, cp_, 3),
            "stem3": conv_gn(keys[2], cp_, cp_, 3),
            "conv2": conv_gn(keys[3], cp_, 2 * cp_, 3),
            "conv3": conv_gn(keys[4], 2 * cp_, 4 * cp_, 3),
            "conv4": conv_gn(keys[5], 4 * cp_, 4 * cp_, 3),
            "fc1": init_conv2d(keys[6], cp_, self.embed_dim, 1, dtype=dtype),
            "fc2": init_conv2d(keys[7], 2 * cp_, self.embed_dim, 1, dtype=dtype),
            "fc3": init_conv2d(keys[8], 4 * cp_, self.embed_dim, 1, dtype=dtype),
            "fc4": init_conv2d(keys[9], 4 * cp_, self.embed_dim, 1, dtype=dtype),
        }

    def __call__(self, params, images_nhwc):
        def block(p, x, stride):
            y = conv2d(p["conv"], x, stride=stride, padding="SAME")
            y = group_norm(p["gn"], y)
            return jax.nn.relu(y)

        c1 = block(params["stem1"], images_nhwc, 2)
        c1 = block(params["stem2"], c1, 1)
        c1 = block(params["stem3"], c1, 1)
        c1 = jax.lax.reduce_window(c1, -jnp.inf, jax.lax.max,
                                   (1, 3, 3, 1), (1, 2, 2, 1), "SAME")  # 1/4
        c2 = block(params["conv2"], c1, 2)   # 1/8
        c3 = block(params["conv3"], c2, 2)   # 1/16
        c4 = block(params["conv4"], c3, 2)   # 1/32
        c1 = conv2d(params["fc1"], c1, stride=1)
        c2 = conv2d(params["fc2"], c2, stride=1)
        c3 = conv2d(params["fc3"], c3, stride=1)
        c4 = conv2d(params["fc4"], c4, stride=1)
        b = c1.shape[0]
        flat = lambda c: c.reshape(b, -1, self.embed_dim)  # noqa: E731
        return c1, flat(c2), flat(c3), flat(c4)


class ConvFFN:
    """FFN with a depthwise 3x3 conv between the projections
    (ref adapter_modules.py:47-84)."""

    def __init__(self, dim: int, hidden: int):
        self.dim = dim
        self.hidden = hidden

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 3)
        # depthwise kernel: (kh, kw, in/groups=1, out)
        dw = init_conv2d(keys[1], 1, self.hidden, 3, dtype=dtype)
        return {
            "fc1": init_linear(keys[0], self.dim, self.hidden, dtype=dtype),
            "dw": dw,
            "fc2": init_linear(keys[2], self.hidden, self.dim, dtype=dtype),
        }

    def __call__(self, params, x, shapes: Sequence[Tuple[int, int]]):
        """x: (B, sum(H*W), dim) multi-level tokens; the depthwise conv runs
        per level in its 2-D shape (ref DWConv.forward splits levels)."""
        y = linear(params["fc1"], x)
        b = y.shape[0]
        pieces = []
        off = 0
        for (h, w) in shapes:
            seg = y[:, off:off + h * w].reshape(b, h, w, self.hidden)
            seg = jax.lax.conv_general_dilated(
                seg, params["dw"]["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.hidden,
            ) + params["dw"]["b"]
            pieces.append(seg.reshape(b, h * w, self.hidden))
            off += h * w
        y = jnp.concatenate(pieces, axis=1)
        return linear(params["fc2"], gelu(y))


class Injector:
    """priors -> ViT tokens, gated by LayerScale (ref :124-150)."""

    def __init__(self, dim, num_heads=6, n_points=4, n_levels=3,
                 deform_ratio=1.0, init_values=0.0):
        self.attn = MSDeformAttnModule(dim, n_levels, num_heads, n_points,
                                       deform_ratio)
        self.dim = dim
        self.init_values = init_values

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 2)
        return {
            "query_norm": init_layer_norm(self.dim, dtype),
            "feat_norm": init_layer_norm(self.dim, dtype),
            "attn": self.attn.init(keys[0], dtype=dtype),
            "gamma": jnp.full((self.dim,), self.init_values, dtype),
        }

    def __call__(self, params, query, reference_points, feat, spatial_shapes):
        attn = self.attn(params["attn"],
                         layer_norm(params["query_norm"], query, eps=1e-6),
                         reference_points,
                         layer_norm(params["feat_norm"], feat, eps=1e-6),
                         spatial_shapes)
        return query + params["gamma"] * attn


class Extractor:
    """ViT tokens -> priors + ConvFFN (ref :87-121)."""

    def __init__(self, dim, num_heads=6, n_points=4, n_levels=1,
                 deform_ratio=1.0, with_cffn=True, cffn_ratio=0.25):
        self.attn = MSDeformAttnModule(dim, n_levels, num_heads, n_points,
                                       deform_ratio)
        self.dim = dim
        self.with_cffn = with_cffn
        self.ffn = ConvFFN(dim, int(dim * cffn_ratio)) if with_cffn else None

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 3)
        params = {
            "query_norm": init_layer_norm(self.dim, dtype),
            "feat_norm": init_layer_norm(self.dim, dtype),
            "attn": self.attn.init(keys[0], dtype=dtype),
        }
        if self.with_cffn:
            params["ffn"] = self.ffn.init(keys[1], dtype=dtype)
            params["ffn_norm"] = init_layer_norm(self.dim, dtype)
        return params

    def __call__(self, params, query, reference_points, feat, spatial_shapes,
                 prior_shapes):
        attn = self.attn(params["attn"],
                         layer_norm(params["query_norm"], query, eps=1e-6),
                         reference_points,
                         layer_norm(params["feat_norm"], feat, eps=1e-6),
                         spatial_shapes)
        query = query + attn
        if self.with_cffn:
            query = query + self.ffn(
                params["ffn"], layer_norm(params["ffn_norm"], query, eps=1e-6),
                prior_shapes)
        return query


class OnePeaceAdapterBackbone:
    """The full ViT-Adapter segmentation/detection backbone
    (ref: seg/mmseg_custom/models/backbones/onepeace_adapter.py:19-140):
    spatial priors + interaction blocks interleaved with the vision-branch
    encoder layers, emitting a {1/4, 1/8, 1/16, 1/32} NHWC pyramid.

    The vision branch runs through the framework's image adapter + stacked
    encoder layers; interaction groups slice the stacked parameter tree by
    depth (``interaction_indexes``) and run each slice as its own scan.
    """

    def __init__(self, enc_cfg, conv_inplane=64, n_points=4,
                 deform_num_heads=6, init_values=0.0, cffn_ratio=0.25,
                 deform_ratio=1.0, interaction_indexes=None,
                 add_vit_feature=True):
        from ..core.config import EncoderConfig
        from ..models.adapters.image import ImageAdapter
        from ..models.encoder import FusionEncoder

        enc_cfg.use_text_moe = False
        enc_cfg.use_audio_moe = False
        self.cfg = enc_cfg
        self.dim = enc_cfg.embed_dim
        n_layers = enc_cfg.layers
        if interaction_indexes is None:
            # 4 equal groups (ref onepeace_adapter flags)
            step = n_layers // 4
            interaction_indexes = [
                [i * step, (i + 1) * step - 1] for i in range(4)]
        self.interaction_indexes = interaction_indexes
        self.add_vit_feature = add_vit_feature
        if add_vit_feature:
            # ref :124 unpacks exactly four block outputs onto the levels
            assert len(interaction_indexes) == 4, interaction_indexes

        self.image_adapter = ImageAdapter(
            enc_cfg.image_adapter, self.dim, enc_cfg.attention_heads,
            num_rel_tables=n_layers)
        self.encoder = FusionEncoder(enc_cfg, use_text_norm=False,
                                     use_image_norm=True, use_audio_norm=False)
        self.spm = SpatialPriorModule(conv_inplane, self.dim)
        self.injectors = [
            Injector(self.dim, deform_num_heads, n_points, 3, deform_ratio,
                     init_values)
            for _ in interaction_indexes]
        self.extractors = [
            Extractor(self.dim, deform_num_heads, n_points, 1, deform_ratio,
                      with_cffn=True, cffn_ratio=cffn_ratio)
            for _ in interaction_indexes]
        # the LAST interaction block carries two extra prior-refinement
        # extractor passes (ref adapter_modules.py:164-170
        # extra_extractor=True on the final InteractionBlock)
        self.extra_extractors = [
            Extractor(self.dim, deform_num_heads, n_points, 1, deform_ratio,
                      with_cffn=True, cffn_ratio=cffn_ratio)
            for _ in range(2)]

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 8 + 2 * len(self.injectors))
        params = {
            "image_adapter": self.image_adapter.init(keys[0], dtype=dtype),
            "encoder": self.encoder.init(keys[1], dtype=dtype),
            "spm": self.spm.init(keys[2], dtype=dtype),
            "level_embed": jax.random.normal(keys[3], (3, self.dim), dtype) * 0.02,
            "up": init_conv2d(keys[4], self.dim, self.dim, 2, dtype=dtype),
            "injectors": [inj.init(keys[5 + 2 * i], dtype=dtype)
                          for i, inj in enumerate(self.injectors)],
            "extractors": [ext.init(keys[6 + 2 * i], dtype=dtype)
                           for i, ext in enumerate(self.extractors)],
            "extra_extractors": [
                ext.init(jax.random.fold_in(keys[7], i), dtype=dtype)
                for i, ext in enumerate(self.extra_extractors)],
        }
        for name in ("norm1", "norm2", "norm3", "norm4"):
            params[name] = {"scale": jnp.ones((self.dim,), dtype),
                            "bias": jnp.zeros((self.dim,), dtype)}
        return params

    def _run_layers(self, enc_params, x, rel_bias, lo, hi):
        """Scan encoder layers [lo, hi] on image tokens (with CLS)."""
        from ..models.encoder import encoder_layer

        sliced = jax.tree.map(lambda leaf: leaf[lo:hi + 1],
                              enc_params["layers"])
        per_layer_bias = rel_bias is not None and rel_bias.shape[0] > 1

        def body(carry, scanned):
            layer_params, layer_bias = scanned
            out = encoder_layer(
                layer_params, self.cfg, carry, None,
                layer_bias if per_layer_bias else (
                    rel_bias[0] if rel_bias is not None else None),
                "image", (0, carry.shape[1], 0), 0.0, deterministic=True)
            return out, None

        bias_sliced = (rel_bias[lo:hi + 1] if per_layer_bias
                       else jnp.zeros((hi - lo + 1,), x.dtype))
        out, _ = jax.lax.scan(body, x, (sliced, bias_sliced))
        return out

    def __call__(self, params, images_nchw: jnp.ndarray):
        """images (B, 3, H, W) -> [f4, f8, f16, f32] NHWC maps."""
        b = images_nchw.shape[0]
        hw = images_nchw.shape[2]
        grid = hw // 16
        images_nhwc = jnp.transpose(images_nchw, (0, 2, 3, 1))

        # spatial priors with level embeddings
        c1, c2, c3, c4 = self.spm(params["spm"], images_nhwc)
        le = params["level_embed"]
        c2, c3, c4 = c2 + le[0], c3 + le[1], c4 + le[2]
        c = jnp.concatenate([c2, c3, c4], axis=1)
        prior_shapes = [(grid * 2, grid * 2), (grid, grid),
                        (grid // 2, grid // 2)]

        # vit tokens from the image adapter
        x, _, rel_bias = self.image_adapter(params["image_adapter"], images_nchw)
        cls_tok, tokens = x[:, :1], x[:, 1:]

        ref_vit = jnp.asarray(np.tile(
            get_reference_points([(grid, grid)]), (b, 1, 1, 1)))
        ref_priors = jnp.asarray(np.tile(
            get_reference_points(prior_shapes), (b, 1, 1, 1)))

        outs = []
        for i, (lo, hi) in enumerate(self.interaction_indexes):
            tokens = self.injectors[i](
                params["injectors"][i], tokens, ref_vit, c, prior_shapes)
            full = jnp.concatenate([cls_tok, tokens], axis=1)
            full = self._run_layers(params["encoder"], full, rel_bias, lo, hi)
            cls_tok, tokens = full[:, :1], full[:, 1:]
            c = self.extractors[i](
                params["extractors"][i], c, ref_priors, tokens,
                [(grid, grid)], prior_shapes)
            if i == len(self.interaction_indexes) - 1:
                for j, ext in enumerate(self.extra_extractors):
                    c = ext(params["extra_extractors"][j], c, ref_priors,
                            tokens, [(grid, grid)], prior_shapes)
            outs.append(tokens.reshape(b, grid, grid, self.dim))

        # split priors back to levels
        n2 = prior_shapes[0][0] * prior_shapes[0][1]
        n3 = prior_shapes[1][0] * prior_shapes[1][1]
        c2 = c[:, :n2].reshape(b, grid * 2, grid * 2, self.dim)
        c3 = c[:, n2:n2 + n3].reshape(b, grid, grid, self.dim)
        c4 = c[:, n2 + n3:].reshape(b, grid // 2, grid // 2, self.dim)
        # c1 (1/4) refined with transposed-conv upsample of c2 (ref :121)
        c1 = c1 + jax.lax.conv_transpose(
            c2, params["up"]["w"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["up"]["b"]

        if self.add_vit_feature:
            # each pyramid level gets ITS OWN interaction block's output
            # (ref onepeace_adapter.py:124-128: x1..x4 = outs, bilinear
            # 4x / 2x / identity / 0.5x), not the last block's
            x1, x2, x3, x4 = outs
            c1 = c1 + jax.image.resize(x1, c1.shape, "bilinear")
            c2 = c2 + jax.image.resize(x2, c2.shape, "bilinear")
            c3 = c3 + x3
            c4 = c4 + jax.image.resize(x4, c4.shape, "bilinear")

        f1 = layer_norm(params["norm1"], c1)
        f2 = layer_norm(params["norm2"], c2)
        f3 = layer_norm(params["norm3"], c3)
        f4 = layer_norm(params["norm4"], c4)
        return [f1, f2, f3, f4]
