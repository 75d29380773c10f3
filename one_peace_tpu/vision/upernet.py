"""UperNet segmentation head.

The decode head the reference's ADE20K config uses on top of the
ViT-Adapter backbone (mmseg UPerHead: PSP pyramid pooling on the deepest
level + FPN lateral fusion + conv classifier).  TPU-native NHWC
implementation; pair with vision/backbone.py or vision/adapter.py
pyramids.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..models.components import conv2d, init_conv2d
from .adapter import group_norm


def _conv_gn_relu_init(key, cin, cout, kernel, dtype):
    return {
        "conv": init_conv2d(key, cin, cout, kernel, bias=False, dtype=dtype),
        "gn": {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)},
    }


def _conv_gn_relu(params, x, stride=1):
    y = conv2d(params["conv"], x, stride=stride, padding="SAME")
    return jax.nn.relu(group_norm(params["gn"], y))


def _resize(x, h, w):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), "bilinear")


def _adaptive_pool_matrix(in_size: int, out_size: int):
    """(out, in) row-stochastic matrix reproducing torch's
    AdaptiveAvgPool2d bin rule: bin i averages rows
    [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        a = (i * in_size) // out_size
        b = -((-(i + 1) * in_size) // out_size)
        m[i, a:b] = 1.0 / (b - a)
    return m


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC exact adaptive average pooling (torch AdaptiveAvgPool2d
    semantics — mmseg's PPM uses it; plain bilinear resize is NOT
    equivalent when the grid doesn't divide evenly)."""
    h, w = x.shape[1:3]
    ph = jnp.asarray(_adaptive_pool_matrix(h, out_h))
    pw = jnp.asarray(_adaptive_pool_matrix(w, out_w))
    y = jnp.einsum("ph,bhwc->bpwc", ph, x.astype(jnp.float32))
    y = jnp.einsum("qw,bpwc->bpqc", pw, y)
    return y.astype(x.dtype)


class UperNetHead:
    def __init__(self, in_channels: Sequence[int], channels: int = 512,
                 num_classes: int = 150, pool_scales=(1, 2, 3, 6)):
        self.in_channels = list(in_channels)
        self.channels = channels
        self.num_classes = num_classes
        self.pool_scales = pool_scales

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 32)
        ki = iter(keys)
        params = {
            # PSP over the deepest feature
            "psp": [_conv_gn_relu_init(next(ki), self.in_channels[-1],
                                       self.channels, 1, dtype)
                    for _ in self.pool_scales],
            "psp_bottleneck": _conv_gn_relu_init(
                next(ki),
                self.in_channels[-1] + len(self.pool_scales) * self.channels,
                self.channels, 3, dtype),
            # FPN laterals + output convs for the shallower levels
            "laterals": [_conv_gn_relu_init(next(ki), c, self.channels, 1, dtype)
                         for c in self.in_channels[:-1]],
            "fpn_convs": [_conv_gn_relu_init(next(ki), self.channels,
                                             self.channels, 3, dtype)
                          for _ in self.in_channels[:-1]],
            "fuse": _conv_gn_relu_init(
                next(ki), len(self.in_channels) * self.channels,
                self.channels, 3, dtype),
            "classifier": init_conv2d(next(ki), self.channels,
                                      self.num_classes, 1, dtype=dtype),
        }
        return params

    def __call__(self, params, feats: List[jnp.ndarray]) -> jnp.ndarray:
        """feats: NHWC maps shallow->deep (e.g. strides 4, 8, 16, 32).
        Returns (B, H4, W4, num_classes) logits at the shallowest scale."""
        deep = feats[-1]
        b, h, w, _ = deep.shape
        psp_outs = [deep]
        for scale, p in zip(self.pool_scales, params["psp"]):
            pooled = adaptive_avg_pool(deep, scale, scale)
            psp_outs.append(_resize(_conv_gn_relu(p, pooled), h, w))
        top = _conv_gn_relu(params["psp_bottleneck"],
                            jnp.concatenate(psp_outs, axis=-1))

        laterals = [
            _conv_gn_relu(p, f) for p, f in zip(params["laterals"], feats[:-1])
        ] + [top]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            hh, ww = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], hh, ww)
        outs = [
            _conv_gn_relu(p, lat)
            for p, lat in zip(params["fpn_convs"], laterals[:-1])
        ] + [laterals[-1]]
        h0, w0 = outs[0].shape[1:3]
        outs = [_resize(o, h0, w0) for o in outs]
        fused = _conv_gn_relu(params["fuse"], jnp.concatenate(outs, axis=-1))
        return conv2d(params["classifier"], fused, stride=1, padding="SAME")


def seg_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = 255) -> jnp.ndarray:
    """Pixel-wise CE with ignore label, logits upsampled to label size —
    the UperNet training objective (mmseg decode-head loss)."""
    b, h, w, c = logits.shape
    lh, lw = labels.shape[1:3]
    if (h, w) != (lh, lw):
        logits = jax.image.resize(logits, (b, lh, lw, c), "bilinear")
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    vf = valid.astype(jnp.float32)
    return jnp.sum(nll * vf) / jnp.maximum(vf.sum(), 1.0)
