"""Fairseq checkpoint ingestion.

Converts the reference's PyTorch state dict (``one-peace.pt``-style, saved
by fairseq: a flat ``model`` dict of torch tensors) into this framework's
nested parameter pytree, replicating the reference's
``upgrade_state_dict_named`` rules (SURVEY.md §5 "schema migration"):

- legacy ``rel_pos_table.weight`` -> ``rel_pos_table_list.0.weight``
  (ref adapter/text.py:169-172);
- a single shared rel-pos table broadcast to one per layer when the model
  wants per-layer tables (ref adapter/text.py:173-178);
- absolute/relative positional tables interpolated to new resolutions
  (ref adapter/image.py:262-305) — abs pos via torch-compatible bicubic
  (utils/interpolate.py), rel tables via geometric-spaced cubic;
- modality branches not used by the head pruned
  (ref one_peace_retrieval.py:143-150).

Layout conversions to the TPU-native parameter scheme:
- torch Linear (out, in) -> (in, out);
- torch Conv2d (out, in, kh, kw) -> NHWC HWIO (kh, kw, in, out);
- torch Conv1d (out, in/groups, k) -> NWC WIO (k, in/groups, out);
- per-layer transformer weights stacked along a leading ``layers`` axis
  (matching the scan-based encoder).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a fairseq .pt checkpoint to {name: np.ndarray} on host."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _lin(sd, name, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def upgrade_state_dict(sd: Dict[str, np.ndarray], num_layers_rel: int) -> Dict[str, np.ndarray]:
    """Apply the reference's legacy-key upgrades in place."""
    out = dict(sd)
    for prefix in list({k.rsplit("rel_pos_table.weight", 1)[0]
                        for k in sd if k.endswith("rel_pos_table.weight")}):
        out[f"{prefix}rel_pos_table_list.0.weight"] = out.pop(f"{prefix}rel_pos_table.weight")
    if num_layers_rel > 1:
        adapters = {k.rsplit("rel_pos_table_list.", 1)[0]
                    for k in out if "rel_pos_table_list.0.weight" in k}
        for prefix in adapters:
            if f"{prefix}rel_pos_table_list.1.weight" not in out:
                base = out[f"{prefix}rel_pos_table_list.0.weight"]
                for i in range(num_layers_rel):
                    out[f"{prefix}rel_pos_table_list.{i}.weight"] = base.copy()
    return out


def geometric_sequence_interpolation(src_size: int, dst_size: int,
                                     table: np.ndarray) -> np.ndarray:
    """Interpolate a (src_size**2, H) relative-position table to
    (dst_size**2, H) on a geometric-progression coordinate grid
    (ref adapter/image.py:115-162): bucket spacing grows geometrically
    away from zero so the outer buckets stretch; values are resampled with
    a bicubic spline (scipy interp2d 'cubic' equivalent)."""
    from scipy.interpolate import RectBivariateSpline

    def geometric_progression(a, r, n):
        return a * (1.0 - r**n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        gp = geometric_progression(1, q, src_size // 2)
        if gp > dst_size // 2:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = np.asarray(r_ids + [0] + dis)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    heads = table.shape[-1]
    k = min(3, src_size - 1)  # cubic when the grid allows it
    out = np.empty((dst_size * dst_size, heads), np.float32)
    for h in range(heads):
        z = table[:, h].reshape(src_size, src_size).astype(np.float64)
        spline = RectBivariateSpline(x, x, z, kx=k, ky=k)
        out[:, h] = spline(dx, dx).reshape(-1)
    return out


def upgrade_image_adapter_resolution(sd: Dict[str, np.ndarray], prefix: str,
                                     bucket_size: int, rel_bucket_size: int) -> None:
    """In-place abs/rel position-table interpolation to a new input
    resolution (ref adapter/image.py:262-305) — applied when the model is
    built for a larger patch_image_size than the checkpoint's."""
    from .interpolate import resize_pos_embed_2d

    pos_key = f"{prefix}.pos_embed"
    if pos_key in sd:
        pos = sd[pos_key]
        src = int((pos.shape[0] - 1) ** 0.5)
        if src != bucket_size:
            logger.info("interpolating abs pos embed %d -> %d", src, bucket_size)
            sd[pos_key] = np.concatenate(
                [pos[:1], resize_pos_embed_2d(pos[1:], src, bucket_size)], axis=0)
    i = 0
    while f"{prefix}.rel_pos_table_list.{i}.weight" in sd:
        key = f"{prefix}.rel_pos_table_list.{i}.weight"
        tbl = sd[key]
        src = int((tbl.shape[0] - 3) ** 0.5)
        dst = 2 * rel_bucket_size - 1
        if src != dst:
            logger.info("interpolating rel pos table %d -> %d", src, dst)
            extra = tbl[-3:]
            sd[key] = np.concatenate(
                [geometric_sequence_interpolation(src, dst, tbl[:-3]), extra],
                axis=0)
        i += 1


def _collect_rel_tables(sd, prefix) -> Optional[np.ndarray]:
    tables = []
    i = 0
    while f"{prefix}.rel_pos_table_list.{i}.weight" in sd:
        tables.append(sd[f"{prefix}.rel_pos_table_list.{i}.weight"])
        i += 1
    if not tables:
        return None
    return np.stack(tables)


def convert_text_adapter(sd, prefix) -> Dict[str, Any]:
    p = {
        "embed_tokens": sd[f"{prefix}.embed_tokens.weight"],
        "embed_positions": sd[f"{prefix}.embed_positions.weight"],
        "cls_embedding": sd[f"{prefix}.cls_embedding"],
    }
    if f"{prefix}.layernorm_embedding.weight" in sd:
        p["layernorm_embedding"] = _ln(sd, f"{prefix}.layernorm_embedding")
    if f"{prefix}.type_embedding" in sd:
        p["type_embedding"] = sd[f"{prefix}.type_embedding"]
    rel = _collect_rel_tables(sd, prefix)
    if rel is not None:
        p["rel_pos_table"] = rel
    return p


def convert_image_adapter(sd, prefix, vision_encoder_type="hmlp") -> Dict[str, Any]:
    p = {
        "cls_embedding": sd[f"{prefix}.cls_embedding"],
        "pos_embed": sd[f"{prefix}.pos_embed"],
    }
    if vision_encoder_type == "hmlp":
        # Sequential indices: 0 conv4, 1 LN2D, 3 conv2, 4 LN2D, 6 conv2
        def conv(i):
            w = sd[f"{prefix}.embed_images.{i}.weight"]  # (out, in, kh, kw)
            c = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
            if f"{prefix}.embed_images.{i}.bias" in sd:
                c["b"] = sd[f"{prefix}.embed_images.{i}.bias"]
            return c

        p["hmlp"] = {
            "conv1": conv(0),
            "ln1": _ln(sd, f"{prefix}.embed_images.1.layer_norm"),
            "conv2": conv(3),
            "ln2": _ln(sd, f"{prefix}.embed_images.4.layer_norm"),
            "conv3": conv(6),
        }
    elif vision_encoder_type == "mlp":
        w = sd[f"{prefix}.embed_images.weight"]
        p["patch_conv"] = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.layernorm_embedding.weight" in sd:
        p["layernorm_embedding"] = _ln(sd, f"{prefix}.layernorm_embedding")
    if f"{prefix}.type_embedding" in sd:
        p["type_embedding"] = sd[f"{prefix}.type_embedding"]
        p["type_embedding_2"] = sd[f"{prefix}.type_embedding_2"]
    rel = _collect_rel_tables(sd, prefix)
    if rel is not None:
        p["rel_pos_table"] = rel
    return p


def convert_audio_adapter(sd, prefix, num_feat_layers: int, conv_pos_depth: int) -> Dict[str, Any]:
    def conv1d_w(name):
        w = sd[f"{name}.weight"]  # (out, in/groups, k)
        c = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}
        if f"{name}.bias" in sd:
            c["b"] = sd[f"{name}.bias"]
        return c

    feat = []
    for i in range(num_feat_layers):
        base = f"{prefix}.embed_audios.0.conv_layers.{i}"
        feat.append({
            "conv": conv1d_w(f"{base}.0"),
            "ln": _ln(sd, f"{base}.2.1"),
        })
    p = {
        "feature_extractor": feat,
        "post_extract_ln": _ln(sd, f"{prefix}.embed_audios.2"),
        "post_extract_proj": _lin(sd, f"{prefix}.embed_audios.3"),
        "cls_embedding": sd[f"{prefix}.cls_embedding"],
        "mask_embedding": sd[f"{prefix}.mask_embedding"],
    }
    if f"{prefix}.cls_pos_embed" in sd:
        p["cls_pos_embed"] = sd[f"{prefix}.cls_pos_embed"]
        # embed_positions Sequential: 0 TransposeLast, then depth blocks
        pos_convs = []
        for i in range(conv_pos_depth):
            pos_convs.append(conv1d_w(f"{prefix}.embed_positions.{i + 1}.0"))
        p["pos_convs"] = pos_convs
        if f"{prefix}.embed_positions.0.weight" in sd:  # conv_pos_pre_ln variant
            p["pos_pre_ln"] = _ln(sd, f"{prefix}.embed_positions.0")
    elif f"{prefix}.embed_positions.weight" in sd:
        p["embed_positions"] = sd[f"{prefix}.embed_positions.weight"]
    if f"{prefix}.layernorm_embedding.weight" in sd:
        p["layernorm_embedding"] = _ln(sd, f"{prefix}.layernorm_embedding")
    if f"{prefix}.type_embedding" in sd:
        p["type_embedding"] = sd[f"{prefix}.type_embedding"]
    rel = _collect_rel_tables(sd, prefix)
    if rel is not None:
        p["rel_pos_table"] = rel
    return p


def convert_encoder_layer(sd, prefix) -> Dict[str, Any]:
    attn_prefix = f"{prefix}.self_attn"
    attn = {
        "q_proj": _lin(sd, f"{attn_prefix}.q_proj"),
        "k_proj": _lin(sd, f"{attn_prefix}.k_proj"),
        "v_proj": _lin(sd, f"{attn_prefix}.v_proj"),
        "out_proj": _lin(sd, f"{attn_prefix}.out_proj"),
    }
    if f"{attn_prefix}.c_attn" in sd:
        attn["c_attn"] = sd[f"{attn_prefix}.c_attn"]
    if f"{attn_prefix}.ln.weight" in sd:
        attn["ln"] = _ln(sd, f"{attn_prefix}.ln")
    layer = {
        "self_attn": attn,
        "self_attn_layer_norm": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "final_layer_norm": _ln(sd, f"{prefix}.final_layer_norm"),
    }
    if f"{prefix}.attn_ln.weight" in sd:
        layer["attn_ln"] = _ln(sd, f"{prefix}.attn_ln")
    for mod in ("text", "image", "audio"):
        base = f"{prefix}.{mod}_ffn"
        if f"{base}.0.wi_0.weight" not in sd:
            continue
        ffn = {
            "wi_0": _lin(sd, f"{base}.0.wi_0"),
            "wi_1": _lin(sd, f"{base}.0.wi_1"),
            "wo": _lin(sd, f"{base}.3"),
        }
        if f"{base}.2.weight" in sd:
            ffn["ffn_ln"] = _ln(sd, f"{base}.2")
        layer[f"{mod}_ffn"] = ffn
    if f"{prefix}.gamma_1" in sd:
        layer["gamma_1"] = sd[f"{prefix}.gamma_1"]
        layer["gamma_2"] = sd[f"{prefix}.gamma_2"]
    return layer


def _stack_layers(layers) -> Dict[str, Any]:
    """list of per-layer trees -> one tree with stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def convert_wrapper(sd, prefix, enc_cfg) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    if any(k.startswith(f"{prefix}.text_adapter.") for k in sd):
        params["text_adapter"] = convert_text_adapter(sd, f"{prefix}.text_adapter")
    if any(k.startswith(f"{prefix}.image_adapter.") for k in sd):
        upgrade_image_adapter_resolution(
            sd, f"{prefix}.image_adapter",
            enc_cfg.image_adapter.bucket_size,
            enc_cfg.image_adapter.rel_bucket_size)
        params["image_adapter"] = convert_image_adapter(
            sd, f"{prefix}.image_adapter", enc_cfg.image_adapter.vision_encoder_type)
    if any(k.startswith(f"{prefix}.audio_adapter.") for k in sd):
        params["audio_adapter"] = convert_audio_adapter(
            sd, f"{prefix}.audio_adapter",
            len(enc_cfg.audio_adapter.feature_encoder_spec),
            enc_cfg.audio_adapter.conv_pos_depth)

    layers = []
    i = 0
    while f"{prefix}.fusion_model.layers.{i}.self_attn_layer_norm.weight" in sd:
        layers.append(convert_encoder_layer(sd, f"{prefix}.fusion_model.layers.{i}"))
        i += 1
    fusion: Dict[str, Any] = {"layers": _stack_layers(layers)}
    for mod in ("text", "image", "audio"):
        if f"{prefix}.fusion_model.{mod}_layer_norm.weight" in sd:
            fusion[f"{mod}_layer_norm"] = _ln(sd, f"{prefix}.fusion_model.{mod}_layer_norm")
    params["fusion"] = fusion
    return params


def convert_classify_model(sd: Dict[str, np.ndarray], model_cfg) -> Dict[str, Any]:
    """Conversion for one_peace_classify checkpoints (finetune_vggsound.pt,
    finetune_refcocog.pt — ref one_peace_classify.py naming: classify_head
    with norm/pooler/attn-pooling/classifier)."""
    enc = model_cfg.encoder
    sd = upgrade_state_dict(sd, enc.layers)
    params: Dict[str, Any] = {
        "encoder_wrapper": convert_wrapper(sd, "encoder_wrapper", enc)}
    head: Dict[str, Any] = {"norm": _ln(sd, "classify_head.norm")}
    if "classify_head.attn_pooling_func.q" in sd:
        ap = {
            "k_proj": _lin(sd, "classify_head.attn_pooling_func.k_proj"),
            "v_proj": _lin(sd, "classify_head.attn_pooling_func.v_proj"),
            "out_proj": _lin(sd, "classify_head.attn_pooling_func.out_proj"),
            "q": sd["classify_head.attn_pooling_func.q"],
        }
        head["attn_pooling"] = ap
    if "classify_head.pooler.1.weight" in sd:
        head["pooler"] = _lin(sd, "classify_head.pooler.1")
    head["classifier"] = {
        "fc1": _lin(sd, "classify_head.classifier.0"),
        "ln": _ln(sd, "classify_head.classifier.1"),
        "fc2": _lin(sd, "classify_head.classifier.3"),
    }
    params["classify_head"] = head
    return params


def convert_retrieval_model(sd: Dict[str, np.ndarray], model_cfg) -> Dict[str, Any]:
    """Full conversion for one_peace_retrieval
    (ref naming from one_peace_retrieval.py:34-131)."""
    enc = model_cfg.encoder
    num_rel = enc.layers if model_cfg.copy_rel_pos_table else 1
    sd = upgrade_state_dict(sd, num_rel)
    params = {"encoder_wrapper": convert_wrapper(sd, "encoder_wrapper", enc)}
    for mod in ("text", "image", "audio"):
        if f"{mod}_proj.weight" in sd:
            params[f"{mod}_proj"] = _lin(sd, f"{mod}_proj")
    if "logit_scale" in sd:
        params["logit_scale"] = sd["logit_scale"].reshape(())
    return params


def to_jax(params, dtype=None):
    """numpy tree -> jax arrays (optionally casting floats)."""
    import jax.numpy as jnp

    def cast(x):
        arr = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        return arr

    import jax

    return jax.tree.map(cast, params)
