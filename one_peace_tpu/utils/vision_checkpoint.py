"""Checkpoint converters for the vision-transfer backbones.

The reference ships ``one_peace_vision/convert_to_vision.py`` to strip a
pretrain ``one-peace.pt`` down to its image branch (drop text/audio/
decoder/mask/logit_scale branches, rename ``encoder_wrapper`` ->
``encoder``, flatten ``fusion_model.``), after which the det backbone
(ref det/models/onepeace.py:472-482) and the video backbone (ref
video/mmaction_custom/models/backbones/onepeace.py:611-637) load it with
``strict=False`` + abs/rel position-table resizing.  This module is the
same pipeline for the TPU param trees:

- :func:`to_vision_state_dict` — the convert_to_vision.py remap;
- :func:`convert_det_backbone` — vision sd -> DetBackbone param tree
  (windowed/global layer groups, shared rel table kept at pretrain size
  for runtime interpolation, decomposed rel-pos tables zero-init exactly
  as the reference's nn.Parameter(torch.zeros(...)) at
  det/models/onepeace.py:191);
- :func:`convert_video_backbone` — vision sd -> VideoBackbone param tree
  (frozen trunk from the checkpoint; temporal embedding + adapters fresh,
  with every adapter fc2 zeroed so the adapted model starts equal to the
  trunk, ref video onepeace.py:640-665).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .checkpoint_convert import _ln, convert_encoder_layer
from .interpolate import resize_pos_embed_2d

_DROP_SUBSTR = ("text", "audio", "decoder", "mask", "logit_scale", "version")


def to_vision_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pretrain/retrieval flat sd -> vision naming (convert_to_vision.py):
    image branch only, ``encoder.layers.N.*`` + unprefixed
    ``image_adapter.*``.  Pass-through when already in vision naming."""
    if any(k.startswith("encoder.layers.") for k in sd):
        return dict(sd)
    out = {}
    for k, v in sd.items():
        if any(s in k for s in _DROP_SUBSTR):
            continue
        if k.startswith("image_proj.") or "image_layer_norm" in k:
            continue
        if "rp_bucket" in k:
            continue
        k = k.replace("encoder_wrapper", "encoder")
        k = k.replace("fusion_model.", "")
        if "image_adapter" in k:
            k = k.replace("encoder.", "")
        out[k] = v
    return out


def _convert_hmlp(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def conv(i):
        w = sd[f"image_adapter.embed_images.{i}.weight"]  # (out, in, kh, kw)
        c = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        if f"image_adapter.embed_images.{i}.bias" in sd:
            c["b"] = sd[f"image_adapter.embed_images.{i}.bias"]
        return c

    return {
        "conv1": conv(0),
        "ln1": _ln(sd, "image_adapter.embed_images.1.layer_norm"),
        "conv2": conv(3),
        "ln2": _ln(sd, "image_adapter.embed_images.4.layer_norm"),
        "conv3": conv(6),
    }


def _resized_pos_embed(sd: Dict[str, np.ndarray], bucket_size: int) -> np.ndarray:
    """(src^2+1, D) -> (bucket^2+1, D), CLS row kept, grid rows bicubic
    (ref det onepeace.py resize_abs_pos_embed)."""
    pos = sd["image_adapter.pos_embed"]
    src = int((pos.shape[0] - 1) ** 0.5)
    if src == bucket_size:
        return pos
    return np.concatenate(
        [pos[:1], np.asarray(resize_pos_embed_2d(pos[1:], src, bucket_size))],
        axis=0)


def _trunk_layer(sd: Dict[str, np.ndarray], i: int) -> Dict[str, Any]:
    """One encoder layer, image branch only (vision naming)."""
    lay = convert_encoder_layer(sd, f"encoder.layers.{i}")
    return {k: v for k, v in lay.items()
            if k in ("self_attn", "self_attn_layer_norm", "final_layer_norm",
                     "image_ffn", "gamma_1", "gamma_2")}


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def convert_det_backbone(sd: Dict[str, np.ndarray], backbone) -> Dict[str, Any]:
    """Vision (or pretrain) flat sd -> DetBackbone param tree."""
    sd = to_vision_state_dict(sd)
    dh = backbone.d // backbone.heads

    def det_layer(i: int, input_size: int) -> Dict[str, Any]:
        lay = _trunk_layer(sd, i)
        if backbone.use_decomposed:
            # fresh zeros exactly like ref det onepeace.py:191 (not in ckpt)
            lay["self_attn"]["rel_pos_h"] = np.zeros(
                (2 * input_size - 1, dh), np.float32)
            lay["self_attn"]["rel_pos_w"] = np.zeros(
                (2 * input_size - 1, dh), np.float32)
        return lay

    groups = backbone.layers // backbone.global_period
    nwin = backbone.global_period - 1
    win_groups, glob_layers = [], []
    for g in range(groups):
        win_groups.append(_stack([
            det_layer(g * backbone.global_period + s, backbone.window_size)
            for s in range(nwin)]))
        glob_layers.append(det_layer(
            g * backbone.global_period + nwin, backbone.bucket_size))

    params: Dict[str, Any] = {
        "image_adapter": {
            "hmlp": _convert_hmlp(sd),
            "pos_embed": _resized_pos_embed(sd, backbone.bucket_size),
        },
        "win_layers": _stack(win_groups),
        "glob_layers": _stack(glob_layers),
    }
    if backbone.shared_rp_bias:
        # kept at pretrain size; shared_bias_from_table interpolates at
        # runtime (ref det onepeace.py:118,130-141)
        params["rel_pos_table"] = sd[
            "image_adapter.rel_pos_table_list.0.weight"]
    return _to_jnp(params)


def convert_video_backbone(sd: Dict[str, np.ndarray], backbone,
                           key=None) -> Dict[str, Any]:
    """Vision (or pretrain) flat sd -> VideoBackbone param tree.  The
    trunk comes from the checkpoint; temporal embedding and rel table are
    zero-init (ref video onepeace.py:158,164), adapters fresh (fc1 from
    ``key``, fc2 zero)."""
    import jax

    from ..vision.video_backbone import init_adapter

    sd = to_vision_state_dict(sd)
    if key is None:
        key = jax.random.PRNGKey(0)

    layer_keys = jax.random.split(key, backbone.layers * 3).reshape(
        backbone.layers, 3, 2)
    layers = []
    for i in range(backbone.layers):
        lay = _trunk_layer(sd, i)
        lay["t_adapter"] = init_adapter(layer_keys[i, 0], backbone.d)
        lay["s_adapter"] = init_adapter(layer_keys[i, 1], backbone.d)
        lay["mlp_adapter"] = init_adapter(layer_keys[i, 2], backbone.d)
        layers.append(lay)

    num_rel = (2 * backbone.bucket_size - 1) ** 2 + 3
    table = sd.get("image_adapter.rel_pos_table_list.0.weight")
    if table is None or table.shape[0] != num_rel:
        # ref video zero-inits its table when sizes differ (Embedding
        # zero_init=True, onepeace.py:164) — the geometric resize path is
        # upstream checkpoint_convert.geometric_sequence_interpolation
        table = np.zeros((num_rel, backbone.heads), np.float32)

    params = {
        "hmlp": _convert_hmlp(sd),
        "cls_embedding": sd["image_adapter.cls_embedding"].reshape(
            1, 1, backbone.d),
        "pos_embed": _resized_pos_embed(sd, backbone.bucket_size),
        "temporal_embedding": np.zeros(
            (1, backbone.num_frames, backbone.d), np.float32),
        "rel_pos_table": table,
        "layers": _stack(layers),
    }
    return _to_jnp(params)


def _to_jnp(params, dtype=None):
    # one float-cast tree mapper for the whole package (a dtype-policy
    # change must not have to be replicated across loaders)
    from .checkpoint_convert import to_jax

    return to_jax(params, dtype)
