"""Bias-aware multi-head attention.

This op replaces both the reference's xFormers ``memory_efficient_attention``
call and its naive bmm fallback (ref: one_peace/models/transformer/
multihead_attention.py:79-115), *and* the materialized per-layer
``(B, heads, L, L)`` float bias the reference builds in
transformer_encoder.py:144-162.  Here the relative-position bias stays
batch-independent ``(heads, L, L)`` and the key-padding mask stays ``(B, L)``;
they are combined on the fly:

- ``xla`` path: plain einsum attention with fp32 softmax.  XLA fuses the
  bias add and mask into the softmax; for ONE-PEACE's short sequences
  (<= ~800) this is already strong on the MXU.
- ``pallas`` path: fused flash-attention kernel (ops/flash_attention.py)
  that streams K/V tiles through VMEM and adds bias/mask tiles inline —
  never materializing the (B, H, L, L) logits in HBM.

Shapes: q, k, v are ``(B, L, H, Dh)``; output ``(B, L, H, Dh)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _combine_bias(
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Materialize the full additive bias (B, H, Lq, Lk) in fp32.

    Only used by the XLA path; the reference materializes exactly this
    (transformer_encoder.py:148-162).  Padding positions get -inf.
    """
    bias = None
    if rel_bias is not None:
        bias = rel_bias.astype(jnp.float32)
        if bias.ndim == 3:
            bias = bias[None]
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0).astype(jnp.float32)
        bias = pad if bias is None else bias + pad
    return bias


# Mesh for the multi-device Pallas path (set by the Trainer / dryrun when
# a >1-device mesh is active).  pallas_call has no SPMD partitioning rule,
# so under a mesh the kernel is wrapped in shard_map: batch shards over the
# data axes (dp, fsdp), heads + the per-head rel-pos bias shard over tp.
# shard_map's transpose inserts the psum over data axes for the replicated
# bias cotangent automatically (verified vs the XLA vjp in
# tests/test_flash_attention.py::test_shard_map_*).
_FLASH_MESH = None


def set_flash_mesh(mesh) -> None:
    """Register the active device mesh so attn_impl='pallas' stays fused
    under pjit.  Pass None to clear.  Call BEFORE tracing the step fn."""
    global _FLASH_MESH
    _FLASH_MESH = mesh


def _flash_mode() -> str:
    """'direct' (single device), 'shard_map' (mesh registered), or 'off'."""
    try:
        on_tpu = jax.default_backend() == "tpu"
        ndev = jax.device_count()
    except Exception:  # backend not initialized yet
        return "off"
    from . import flash_attention as fa

    if not (on_tpu or fa.INTERPRET):
        return "off"
    if ndev == 1:
        return "direct"
    if _FLASH_MESH is not None:
        return "shard_map"
    return "off"


def _shard_map_flash(q, k, v, rel_bias, key_padding_mask, scaling):
    """shard_map-wrapped fused kernel; returns None when the shapes do not
    divide the mesh (caller falls back to XLA, which pjit partitions)."""
    from jax.sharding import PartitionSpec as P

    from .flash_attention import flash_attention

    mesh = _FLASH_MESH
    names = set(mesh.axis_names)
    data = tuple(a for a in ("dp", "fsdp") if a in names)
    tp = "tp" if "tp" in names else None
    b, _, h, _ = q.shape
    ndata = 1
    for a in data:
        ndata *= mesh.shape[a]
    ntp = mesh.shape[tp] if tp else 1
    if (not data and tp is None) or b % max(ndata, 1) or h % max(ntp, 1):
        return None

    qkv_spec = P(data or None, None, tp, None)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if rel_bias is not None:
        in_specs.append(P(data or None, tp, None, None) if rel_bias.ndim == 4
                        else P(tp, None, None))
        args.append(rel_bias)
    if key_padding_mask is not None:
        in_specs.append(P(data or None, None))
        args.append(key_padding_mask)

    def local_fn(*xs):
        it = iter(xs)
        q_, k_, v_ = next(it), next(it), next(it)
        bias_ = next(it) if rel_bias is not None else None
        mask_ = next(it) if key_padding_mask is not None else None
        return flash_attention(q_, k_, v_, bias_, mask_, scaling)

    # partial-manual: only the axes the specs mention (composes under the
    # pipeline's own shard_map over 'pp', where this runs per-stage)
    manual = set(data) | ({tp} if tp else set())
    return jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=qkv_spec, axis_names=manual,
                         check_vma=False)(*args)


def _shard_map_ring(q, k, v, rel_bias, key_padding_mask, scaling):
    """Sequence-sharded exact attention over the mesh's ``sp`` axis
    (ops/ring_attention.py); returns None when no sp axis is active or
    the shapes do not divide it (caller falls back)."""
    from jax.sharding import PartitionSpec as P

    from .ring_attention import ring_attention

    mesh = _FLASH_MESH
    if mesh is None or "sp" not in mesh.axis_names:
        return None
    nsp = mesh.shape["sp"]
    if nsp == 1 or q.shape[1] % nsp or q.shape[1] != k.shape[1]:
        return None
    if rel_bias is not None and rel_bias.ndim != 3:
        return None  # batch-dependent bias tiles are not ring-sliced
    names = set(mesh.axis_names)
    if "pp" in names and mesh.shape["pp"] > 1:
        return None  # the pipeline path wraps its own shard_map over pp
    data = tuple(a for a in ("dp", "fsdp") if a in names)
    ndata = 1
    for a in data:
        ndata *= mesh.shape[a]
    ntp = mesh.shape["tp"] if "tp" in names else 1
    if q.shape[0] % max(ndata, 1) or q.shape[2] % max(ntp, 1):
        return None

    # full-manual over (dp, fsdp, tp, sp): batch over the data axes, heads
    # (and the per-head bias) over tp, sequence around the sp ring
    qkv_spec = P(data or None, "sp", "tp" if ntp > 1 else None, None)
    bias_spec = P("tp" if ntp > 1 else None, None, None)
    in_specs = [qkv_spec, qkv_spec, qkv_spec,
                bias_spec if rel_bias is not None else P(),
                P(data or None, None) if key_padding_mask is not None else P()]

    def local_fn(q_, k_, v_, bias_, mask_):
        return ring_attention(q_, k_, v_,
                              bias_ if rel_bias is not None else None,
                              mask_ if key_padding_mask is not None else None,
                              scaling, axis="sp")

    zero = jnp.zeros((), q.dtype)
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=qkv_spec,
        check_vma=False)(
        q, k, v,
        rel_bias if rel_bias is not None else zero,
        key_padding_mask if key_padding_mask is not None else zero)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
    scaling: float,
    impl: str = "pallas",
) -> jnp.ndarray:
    """Softmax attention with additive relative-position bias.

    Args:
      q/k/v: (B, L, H, Dh)
      rel_bias: (H, L, L) or (B, H, L, L) additive bias, or None
      key_padding_mask: (B, L) bool, True at padding positions, or None
      scaling: query scale (head_dim ** -0.5)
      impl: 'pallas' (fused kernel where supported, XLA otherwise) |
        'ring' (sequence-sharded over the mesh 'sp' axis, XLA fallback) |
        'xla'
    """
    if impl == "ring":
        out = _shard_map_ring(q, k, v, rel_bias, key_padding_mask, scaling)
        if out is not None:
            return out
    if impl == "pallas":
        mode = _flash_mode()
        if mode == "direct":
            from .flash_attention import flash_attention

            return flash_attention(q, k, v, rel_bias, key_padding_mask, scaling)
        if mode == "shard_map":
            out = _shard_map_flash(q, k, v, rel_bias, key_padding_mask, scaling)
            if out is not None:
                return out

    b, lq, h, _ = q.shape
    lk = k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scaling
    bias = _combine_bias(rel_bias, key_padding_mask)
    if bias is not None:
        logits = logits + bias
    # fp32 softmax (ref uses utils.softmax in fp32: multihead_attention.py:112);
    # ONE_PEACE_SOFTMAX=bf16 opts into bf16 exp/normalize (max stays fp32)
    from .flash_attention import _SOFTMAX_BF16

    if _SOFTMAX_BF16:
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - mx).astype(jnp.bfloat16))
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# (a multihead_attention_packed fused-projection companion lived here
# until 2026-08-20; chip-gated and rejected — see ops/flash_attention.py
# tail note and PARITY.md)
