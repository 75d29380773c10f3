"""Shared building blocks: initializers and small functional layers.

Numerics deliberately match the reference's torch primitives
(ref: one_peace/models/components.py):

- ``LayerNorm``: eps 1e-5, elementwise affine, statistics in fp32.
- ``gelu``: exact erf-based GELU (torch ``nn.GELU()`` default).
- ``Linear``: Xavier-uniform weight, zero bias (components.py:29-34).
- ``Embedding``: normal(0, dim**-0.5), zero pad row (components.py:37-44).
- ``trunc_normal``: std 0.02 truncated at +/-0.02 (components.py:19-20).

Parameters are plain dicts.  Weights of dense layers are stored as
``(in_features, out_features)`` — column-major relative to torch's
``(out, in)`` — so matmuls are ``x @ w`` with no transpose on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    """timm-style truncated normal: N(0, std) truncated to [-std, std]
    (ref: components.py:19-20 — note a=-std, b=std, i.e. one sigma)."""
    u = jax.random.truncated_normal(key, -1.0, 1.0, shape, dtype=jnp.float32)
    return (u * std).astype(dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform for a dense weight of shape (in, out)."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-limit, maxval=limit, dtype=jnp.float32).astype(dtype)


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """He-normal (fan_in, relu gain) for conv kernels stored as
    (spatial..., in_ch, out_ch) — matches torch kaiming_normal_ defaults
    used by the audio conv stack (ref: adapter/audio.py:270-273).

    torch's kaiming_normal_ default mode is fan_in with gain sqrt(2)
    (nonlinearity relu is explicit there via init.kaiming_normal_).
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    std = math.sqrt(2.0 / fan_in)
    return (jax.random.normal(key, shape, dtype=jnp.float32) * std).astype(dtype)


def normal_embedding(key, num_embeddings, dim, padding_idx: Optional[int] = None,
                     zero_init: bool = False, dtype=jnp.float32):
    """ref: components.py:37-44."""
    if zero_init:
        return jnp.zeros((num_embeddings, dim), dtype=dtype)
    w = jax.random.normal(key, (num_embeddings, dim), dtype=jnp.float32) * (dim ** -0.5)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Functional layers
# ---------------------------------------------------------------------------


def init_linear(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    params = {"w": xavier_uniform(kw, (in_features, out_features), dtype=dtype)}
    if bias:
        params["b"] = jnp.zeros((out_features,), dtype=dtype)
    return params


def linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm over the last axis with fp32 statistics.

    torch's LayerNorm normalizes with biased variance and eps inside the
    sqrt; replicated exactly here (ref: components.py:23-26).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if params is not None:
        normed = normed * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return normed.astype(dtype)


def gelu(x):
    """Exact (erf) GELU, fp32 internally — matches torch nn.GELU()."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(dtype)


def dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(key, x, rate, deterministic: bool):
    """Stochastic depth, one mask per batch element, shared across the
    sequence (ref: transformer_layer.py:21-37 — mask shape (1, B, 1) in
    T,B,C layout == (B, 1, 1) in our B,T,C layout).

    ``rate`` may be a traced scalar (the per-layer linspace is scanned), so
    no Python branching on it.
    """
    if deterministic or key is None:
        return x
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    mask = jax.random.uniform(key, (x.shape[0], 1, 1)) < keep
    scale = jnp.where(keep > 0, 1.0 / jnp.maximum(keep, 1e-8), 0.0).astype(x.dtype)
    return jnp.where(mask, x * scale, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv helpers (NHWC / NWC layouts — TPU-native)
# ---------------------------------------------------------------------------


def init_conv2d(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32):
    """Kernel stored as (kh, kw, in_ch, out_ch) for NHWC conv.

    torch Conv2d default init: kaiming_uniform(a=sqrt(5)) for weight,
    uniform(-1/sqrt(fan_in), +) for bias.  Replicated so that from-scratch
    training matches the reference distributionally.
    """
    kw_key, kb_key = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    # kaiming_uniform with a=sqrt(5) -> gain = sqrt(2/(1+5)) = 1/sqrt(3)
    bound = math.sqrt(6.0 / ((1 + 5) * fan_in / 2)) if fan_in > 0 else 0
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    w = jax.random.uniform(kw_key, (kernel, kernel, in_ch, out_ch),
                           minval=-bound, maxval=bound, dtype=jnp.float32)
    params = {"w": w.astype(dtype)}
    if bias:
        bbound = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(
            kb_key, (out_ch,), minval=-bbound, maxval=bbound, dtype=jnp.float32
        ).astype(dtype)
    return params


def conv2d(params, x, stride: int, padding="VALID"):
    """NHWC conv; kernel (kh, kw, in, out).

    Non-overlapping convs (stride == kernel, the patch-embed case) run as
    an EXACT patchify reshape + one dense dot instead: XLA's TPU conv
    with tiny input channels (e.g. the 4x4x3 hMLP stem) wastes most of
    the MXU on channel padding — profiled at ~10% of the whole 40-layer
    image forward before this path (PARITY.md r5).  The patch flatten
    order (kh, kw, in) matches the (kh, kw, in, out) kernel reshape, so
    weights are bit-compatible with the conv formulation.

    No ``preferred_element_type``: with low-precision inputs it breaks the
    conv VJP (cotangent comes back fp32 against a bf16/fp16 kernel), and
    the TPU MXU accumulates partial sums in fp32 internally regardless —
    only the output store is low precision."""
    w = params["w"]
    kh, kw, cin, cout = w.shape
    b, h, wd, c = x.shape
    if (kh == stride and kw == stride and padding == "VALID"
            and h % stride == 0 and wd % stride == 0):
        ho, wo = h // stride, wd // stride
        patches = x.reshape(b, ho, stride, wo, stride, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, ho, wo, stride * stride * c)
        y = patches @ w.reshape(kh * kw * cin, cout).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, groups: int = 1,
                bias: bool = True, init: str = "torch", dtype=jnp.float32):
    """Kernel stored as (k, in_ch // groups, out_ch) for NWC conv."""
    kw_key, kb_key = jax.random.split(key)
    shape = (kernel, in_ch // groups, out_ch)
    if init == "kaiming_normal":
        w = kaiming_normal_conv(kw_key, shape, dtype=jnp.float32)
    else:
        fan_in = (in_ch // groups) * kernel
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        w = jax.random.uniform(kw_key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)
    params = {"w": w.astype(dtype)}
    if bias:
        fan_in = (in_ch // groups) * kernel
        bbound = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(
            kb_key, (out_ch,), minval=-bbound, maxval=bbound, dtype=jnp.float32
        ).astype(dtype)
    return params


def conv1d(params, x, stride: int, padding=0, groups: int = 1):
    """NWC 1-D conv; kernel (k, in/groups, out).  See conv2d for why no
    preferred_element_type."""
    pad = [(padding, padding)] if isinstance(padding, int) else [padding]
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y
