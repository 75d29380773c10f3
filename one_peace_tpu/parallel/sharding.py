"""Parameter sharding rules (pjit partition specs).

Covers every parallelism row of SURVEY.md §2.3 with a TPU-native
equivalent:

- DP: batch sharded over (dp, fsdp); XLA psums grads (== DDP all-reduce).
- ZeRO / FSDP: parameters + optimizer state sharded over ``fsdp`` by these
  rules; XLA all-gathers weights per layer during fwd/bwd and
  reduce-scatters grads (== fairscale FSDP / DistributedFusedAdam).
- TP: d_model/ffn contraction dims sharded over ``tp`` (Megatron-style
  column/row pairs: wi_0/wi_1 column-split, wo row-split; q/k/v
  column-split over heads, out_proj row-split).
- EP: the three modality FFNs are static branches, sharded like TP
  (the reference's "MoE" is not routed — transformer_layer.py:123-128).

Rules are matched on the parameter path (joined with '/'); first match
wins.  Anything unmatched is replicated (LN scales, LayerScale gammas,
rel-pos tables, conv stacks — all small).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex on path, spec builder given leaf ndim). Paths for stacked encoder
# layers have a leading `layers` axis -> leading None in the spec.
_RULES: List[Tuple[str, Dict[int, P]]] = [
    # attention projections, stacked (L, D, D): qkv column-parallel,
    # out row-parallel; fsdp shards the other dim
    (r"layers/self_attn/(q_proj|k_proj|v_proj)/w$", {3: P(None, "fsdp", "tp")}),
    (r"layers/self_attn/out_proj/w$", {3: P(None, "tp", "fsdp")}),
    (r"layers/self_attn/(q_proj|v_proj|out_proj)/b$", {2: P(None, None)}),
    # GeGLU FFN: wi_* column-parallel (L, D, F), wo row-parallel (L, F, D)
    (r"layers/(text|image|audio)_ffn/(wi_0|wi_1)/w$", {3: P(None, "fsdp", "tp")}),
    (r"layers/(text|image|audio)_ffn/wo/w$", {3: P(None, "tp", "fsdp")}),
    (r"layers/(text|image|audio)_ffn/wo/b$", {2: P(None, None)}),
    # the FFN-internal LN lives on the sharded F dim
    (r"layers/(text|image|audio)_ffn/ffn_ln/(scale|bias)$", {2: P(None, "tp")}),
    # token embedding: shard vocab over fsdp
    (r"text_adapter/embed_tokens$", {2: P("fsdp", None)}),
    # projection heads (D, D)
    (r"(text|image|audio)_proj/w$", {2: P("fsdp", "tp")}),
    # int8-quantized trees (quantize_ffn_params renames w -> w_q +
    # per-output-channel w_scale): same placements as the bf16 weights,
    # scales on the output dim
    (r"layers/self_attn/(q_proj|k_proj|v_proj)/w_q$", {3: P(None, "fsdp", "tp")}),
    (r"layers/self_attn/(q_proj|k_proj|v_proj)/w_scale$", {2: P(None, "tp")}),
    (r"layers/self_attn/out_proj/w_q$", {3: P(None, "tp", "fsdp")}),
    (r"layers/self_attn/out_proj/w_scale$", {2: P(None, "fsdp")}),
    (r"layers/(text|image|audio)_ffn/(wi_0|wi_1)/w_q$", {3: P(None, "fsdp", "tp")}),
    (r"layers/(text|image|audio)_ffn/(wi_0|wi_1)/w_scale$", {2: P(None, "tp")}),
    (r"layers/(text|image|audio)_ffn/wo/w_q$", {3: P(None, "tp", "fsdp")}),
    (r"layers/(text|image|audio)_ffn/wo/w_scale$", {2: P(None, "fsdp")}),
]


def spec_for_path(path: str, ndim: int) -> P:
    for pattern, by_ndim in _RULES:
        if re.search(pattern, path):
            if ndim in by_ndim:
                return by_ndim[ndim]
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _with_pp(path: str, spec: P, leaf, pp_size: int) -> P:
    """Shard the leading (layers) axis of stacked encoder params over the
    ``pp`` mesh axis (pipeline stages own disjoint layer ranges).  Only
    the fusion-encoder stack is pipelined (models.pretrain/encoder route
    it through parallel/pipeline.py); other stacks — e.g. the 2-layer
    pretrain decoder, whose serial lax.scan over pp-sharded params would
    force per-layer cross-stage gathers — stay on the base rules."""
    if not re.search(r"(^|/)(encoder_wrapper|encoder)/fusion/layers/", path):
        return spec
    if np.ndim(leaf) == 0 or np.shape(leaf)[0] % pp_size:
        return spec
    rest = tuple(spec)[1:] if len(spec) else ()
    rest = rest + (None,) * (np.ndim(leaf) - 1 - len(rest))
    return P("pp", *rest)


def param_specs(params, pp_size: int = 1) -> Any:
    """Pytree of PartitionSpec mirroring ``params``; pp_size > 1
    additionally shards stacked layer leaves over the pipeline axis."""
    def spec(kp, leaf):
        path = _path_str(kp)
        s = spec_for_path(path, np.ndim(leaf))
        return _with_pp(path, s, leaf, pp_size) if pp_size > 1 else s

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(mesh: Mesh, params) -> Any:
    pp_size = mesh.shape["pp"] if "pp" in mesh.axis_names else 1
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params, pp_size=pp_size)
    )


def shard_params(mesh: Mesh, params):
    """Place (or re-place) a param tree onto the mesh per the rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_spec() -> P:
    """Global batch sharded over both data axes."""
    return P(("dp", "fsdp"))


def batch_shardings(mesh: Mesh, batch) -> Any:
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, batch_spec()) if np.ndim(leaf) > 0
        else NamedSharding(mesh, P()),
        batch,
    )
