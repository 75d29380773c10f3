"""Independent torch implementation of the ONE-PEACE forward math, used
only to generate golden fixtures for numerics-parity tests.

This is *not* a copy of the reference: it is a compact functional
re-derivation driven directly by a fairseq-style flat state dict, written
batch-first.  Its purpose is to catch layout/transpose/ordering mistakes in
the JAX implementation and to exercise the checkpoint converter with
reference-naming state dicts.  Torch primitives (F.layer_norm, F.conv2d,
F.gelu) are numerically the same ones the reference runs on CPU.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

# bucket tables come from the REFERENCE's own code (AST-extracted and
# executed at test time) so the fixture is independent of the repo's
# implementation — see reference_funcs.py
from reference_funcs import (
    ref_image_bucket as make_image_bucket_position,
    ref_token_bucket_with_cls as make_token_bucket_position_with_cls,
)


def t(sd, name):
    return torch.as_tensor(sd[name])


def ln(x, sd, name, eps=1e-5):
    return F.layer_norm(x, x.shape[-1:], t(sd, f"{name}.weight"), t(sd, f"{name}.bias"), eps)


def lin(x, sd, name):
    w = t(sd, f"{name}.weight")
    b = t(sd, f"{name}.bias") if f"{name}.bias" in sd else None
    return F.linear(x, w, b)


# ---------------------------------------------------------------------------
# random fairseq-style state dict for a tiny config
# ---------------------------------------------------------------------------


def make_random_state_dict(cfg, seed=0):
    """Build a flat {fairseq_name: np.ndarray} dict for the retrieval model
    defined by a one_peace_tpu ModelConfig (tiny dims)."""
    rng = np.random.RandomState(seed)
    enc = cfg.encoder
    d = enc.embed_dim
    f_dim = enc.ffn_embed_dim
    sd = {}

    def add(name, *shape, scale=0.05):
        sd[name] = rng.randn(*shape).astype(np.float32) * scale

    ta = enc.text_adapter
    pre = "encoder_wrapper.text_adapter"
    add(f"{pre}.embed_tokens.weight", ta.vocab_size, d)
    sd[f"{pre}.embed_tokens.weight"][ta.padding_idx] = 0
    add(f"{pre}.embed_positions.weight", 514, d)
    add(f"{pre}.cls_embedding", 1, 1, d)
    if ta.use_attn_bias:
        n_rel = 2 * ta.bucket_size - 1 + 3
        tables = enc.layers if cfg.copy_rel_pos_table else 1
        for i in range(tables):
            add(f"{pre}.rel_pos_table_list.{i}.weight", n_rel, enc.attention_heads)

    ia = enc.image_adapter
    pre = "encoder_wrapper.image_adapter"
    add(f"{pre}.embed_images.0.weight", d // 4, 3, 4, 4)
    add(f"{pre}.embed_images.0.bias", d // 4)
    add(f"{pre}.embed_images.1.layer_norm.weight", d // 4, scale=1.0)
    sd[f"{pre}.embed_images.1.layer_norm.weight"] += 1
    add(f"{pre}.embed_images.1.layer_norm.bias", d // 4)
    add(f"{pre}.embed_images.3.weight", d // 4, d // 4, 2, 2)
    add(f"{pre}.embed_images.3.bias", d // 4)
    add(f"{pre}.embed_images.4.layer_norm.weight", d // 4, scale=1.0)
    sd[f"{pre}.embed_images.4.layer_norm.weight"] += 1
    add(f"{pre}.embed_images.4.layer_norm.bias", d // 4)
    add(f"{pre}.embed_images.6.weight", d, d // 4, 2, 2)
    add(f"{pre}.embed_images.6.bias", d)
    add(f"{pre}.cls_embedding", 1, 1, d)
    add(f"{pre}.pos_embed", ia.bucket_size**2 + 1, d)
    if ia.use_attn_bias:
        n_rel = (2 * ia.rel_bucket_size - 1) ** 2 + 3
        tables = enc.layers if cfg.copy_rel_pos_table else 1
        for i in range(tables):
            add(f"{pre}.rel_pos_table_list.{i}.weight", n_rel, enc.attention_heads)

    aa = enc.audio_adapter
    pre = "encoder_wrapper.audio_adapter"
    in_ch = 1
    for i, (out_ch, k, _s) in enumerate(aa.feature_encoder_spec):
        add(f"{pre}.embed_audios.0.conv_layers.{i}.0.weight", out_ch, in_ch, k, scale=0.2)
        add(f"{pre}.embed_audios.0.conv_layers.{i}.2.1.weight", out_ch, scale=1.0)
        sd[f"{pre}.embed_audios.0.conv_layers.{i}.2.1.weight"] += 1
        add(f"{pre}.embed_audios.0.conv_layers.{i}.2.1.bias", out_ch)
        in_ch = out_ch
    add(f"{pre}.embed_audios.2.weight", in_ch, scale=1.0)
    sd[f"{pre}.embed_audios.2.weight"] += 1
    add(f"{pre}.embed_audios.2.bias", in_ch)
    add(f"{pre}.embed_audios.3.weight", d, in_ch)
    add(f"{pre}.embed_audios.3.bias", d)
    kpos = max(3, aa.conv_pos_width // aa.conv_pos_depth)
    for i in range(aa.conv_pos_depth):
        add(f"{pre}.embed_positions.{i + 1}.0.weight", d, d // aa.conv_pos_groups, kpos, scale=0.1)
        add(f"{pre}.embed_positions.{i + 1}.0.bias", d)
    add(f"{pre}.cls_pos_embed", 1, 1, d)
    add(f"{pre}.cls_embedding", 1, 1, d)
    add(f"{pre}.mask_embedding", 1, d)
    if aa.use_attn_bias:
        n_rel = 2 * aa.bucket_size - 1 + 3
        tables = enc.layers if cfg.copy_rel_pos_table else 1
        for i in range(tables):
            add(f"{pre}.rel_pos_table_list.{i}.weight", n_rel, enc.attention_heads)

    for li in range(enc.layers):
        pre = f"encoder_wrapper.fusion_model.layers.{li}"
        add(f"{pre}.self_attn.q_proj.weight", d, d)
        add(f"{pre}.self_attn.q_proj.bias", d)
        add(f"{pre}.self_attn.k_proj.weight", d, d)
        add(f"{pre}.self_attn.v_proj.weight", d, d)
        add(f"{pre}.self_attn.v_proj.bias", d)
        add(f"{pre}.self_attn.out_proj.weight", d, d)
        add(f"{pre}.self_attn.out_proj.bias", d)
        if enc.scale_heads:
            sd[f"{pre}.self_attn.c_attn"] = (
                1 + 0.1 * rng.randn(enc.attention_heads)).astype(np.float32)
        if enc.magneto_scale_attn:
            add(f"{pre}.self_attn.ln.weight", d, scale=1.0)
            sd[f"{pre}.self_attn.ln.weight"] += 1
            add(f"{pre}.self_attn.ln.bias", d)
        for nrm in ("self_attn_layer_norm", "final_layer_norm"):
            add(f"{pre}.{nrm}.weight", d, scale=1.0)
            sd[f"{pre}.{nrm}.weight"] += 1
            add(f"{pre}.{nrm}.bias", d)
        if enc.scale_attn:
            add(f"{pre}.attn_ln.weight", d, scale=1.0)
            sd[f"{pre}.attn_ln.weight"] += 1
            add(f"{pre}.attn_ln.bias", d)
        for mod, used in (("text", enc.use_text_moe), ("image", enc.use_image_moe),
                          ("audio", enc.use_audio_moe)):
            if not used:
                continue
            add(f"{pre}.{mod}_ffn.0.wi_0.weight", f_dim, d)
            add(f"{pre}.{mod}_ffn.0.wi_1.weight", f_dim, d)
            if enc.scale_fc:
                add(f"{pre}.{mod}_ffn.2.weight", f_dim, scale=1.0)
                sd[f"{pre}.{mod}_ffn.2.weight"] += 1
                add(f"{pre}.{mod}_ffn.2.bias", f_dim)
            add(f"{pre}.{mod}_ffn.3.weight", d, f_dim)
            add(f"{pre}.{mod}_ffn.3.bias", d)
        if enc.use_layer_scale:
            sd[f"{pre}.gamma_1"] = np.full(d, 0.1, np.float32)
            sd[f"{pre}.gamma_2"] = np.full(d, 0.1, np.float32)

    for mod, used in (("text", enc.use_text_moe), ("image", enc.use_image_moe),
                      ("audio", enc.use_audio_moe)):
        if used:
            pre = f"encoder_wrapper.fusion_model.{mod}_layer_norm"
            add(f"{pre}.weight", d, scale=1.0)
            sd[f"{pre}.weight"] += 1
            add(f"{pre}.bias", d)
            add(f"{mod}_proj.weight", d, d)
            add(f"{mod}_proj.bias", d)
    sd["logit_scale"] = np.asarray(math.log(1 / 0.07), np.float32)
    return sd


# ---------------------------------------------------------------------------
# torch forward
# ---------------------------------------------------------------------------


def text_adapter_forward(sd, cfg, src_tokens):
    enc = cfg.encoder
    ta = enc.text_adapter
    pre = "encoder_wrapper.text_adapter"
    tokens = torch.as_tensor(np.asarray(src_tokens))
    bsz, tok_len = tokens.shape
    seq_len = tok_len + 1
    padding_mask = torch.zeros(bsz, seq_len, dtype=torch.bool)
    padding_mask[:, 1:] = tokens == ta.padding_idx
    emb = F.embedding(tokens, t(sd, f"{pre}.embed_tokens.weight"))
    cls = t(sd, f"{pre}.cls_embedding").expand(bsz, -1, -1)
    x = torch.cat([cls, emb], dim=1)
    x = x + t(sd, f"{pre}.embed_positions.weight")[:seq_len]
    biases = None
    if ta.use_attn_bias:
        rp = torch.as_tensor(make_token_bucket_position_with_cls(ta.bucket_size, 1024))
        biases = []
        i = 0
        while f"{pre}.rel_pos_table_list.{i}.weight" in sd:
            tbl = t(sd, f"{pre}.rel_pos_table_list.{i}.weight")
            biases.append(tbl[rp[:seq_len, :seq_len]].permute(2, 0, 1))  # (H, L, L)
            i += 1
    return x, padding_mask, biases


def image_adapter_forward(sd, cfg, src_images):
    enc = cfg.encoder
    ia = enc.image_adapter
    pre = "encoder_wrapper.image_adapter"
    imgs = torch.as_tensor(np.asarray(src_images))
    bsz = imgs.shape[0]
    win = imgs.shape[2] // 16

    def ln2d(y, name):
        y = y.permute(0, 2, 3, 1)
        y = ln(y, sd, name)
        return y.permute(0, 3, 1, 2)

    y = F.conv2d(imgs, t(sd, f"{pre}.embed_images.0.weight"),
                 t(sd, f"{pre}.embed_images.0.bias"), stride=4)
    y = F.gelu(ln2d(y, f"{pre}.embed_images.1.layer_norm"))
    y = F.conv2d(y, t(sd, f"{pre}.embed_images.3.weight"),
                 t(sd, f"{pre}.embed_images.3.bias"), stride=2)
    y = F.gelu(ln2d(y, f"{pre}.embed_images.4.layer_norm"))
    y = F.conv2d(y, t(sd, f"{pre}.embed_images.6.weight"),
                 t(sd, f"{pre}.embed_images.6.bias"), stride=2)
    patches = y.flatten(2).transpose(1, 2)
    cls = t(sd, f"{pre}.cls_embedding").expand(bsz, -1, -1)
    x = torch.cat([cls, patches], dim=1)
    pos = t(sd, f"{pre}.pos_embed")
    assert win == ia.bucket_size, "fixture only covers native resolution"
    x = x + pos
    padding_mask = torch.zeros(bsz, win * win + 1, dtype=torch.bool)
    biases = None
    if ia.use_attn_bias:
        rp = torch.as_tensor(make_image_bucket_position(ia.rel_bucket_size))
        biases = []
        i = 0
        while f"{pre}.rel_pos_table_list.{i}.weight" in sd:
            tbl = t(sd, f"{pre}.rel_pos_table_list.{i}.weight")
            biases.append(tbl[rp].permute(2, 0, 1))
            i += 1
    return x, padding_mask, biases


def audio_adapter_forward(sd, cfg, src_audios, audio_padding_masks):
    enc = cfg.encoder
    aa = enc.audio_adapter
    pre = "encoder_wrapper.audio_adapter"
    wav = torch.as_tensor(np.asarray(src_audios))
    pad_mask = torch.as_tensor(np.asarray(audio_padding_masks))
    bsz = wav.shape[0]
    x = wav.unsqueeze(1)  # (B, 1, T)
    for i, (out_ch, k, s) in enumerate(aa.feature_encoder_spec):
        x = F.conv1d(x, t(sd, f"{pre}.embed_audios.0.conv_layers.{i}.0.weight"), stride=s)
        x = ln(x.transpose(1, 2), sd, f"{pre}.embed_audios.0.conv_layers.{i}.2.1").transpose(1, 2)
        x = F.gelu(x)
    x = x.transpose(1, 2)  # (B, T', C)
    x = ln(x, sd, f"{pre}.embed_audios.2")
    x = lin(x, sd, f"{pre}.embed_audios.3")
    feats = x
    # conv positional embedding
    kpos = max(3, aa.conv_pos_width // aa.conv_pos_depth)
    y = feats.transpose(1, 2)
    for i in range(aa.conv_pos_depth):
        y = F.conv1d(y, t(sd, f"{pre}.embed_positions.{i + 1}.0.weight"),
                     t(sd, f"{pre}.embed_positions.{i + 1}.0.bias"),
                     padding=kpos // 2, groups=aa.conv_pos_groups)
        if kpos % 2 == 0:
            y = y[:, :, :-1]
        y = F.layer_norm(y.transpose(1, 2), (y.shape[1],)).transpose(1, 2)
        y = F.gelu(y)
    pos = y.transpose(1, 2)
    pos = torch.cat([t(sd, f"{pre}.cls_pos_embed").expand(bsz, -1, -1), pos], dim=1)
    cls = t(sd, f"{pre}.cls_embedding").expand(bsz, -1, -1)
    x = torch.cat([cls, feats], dim=1) + pos
    biases = None
    if aa.use_attn_bias:
        rp = torch.as_tensor(make_token_bucket_position_with_cls(aa.bucket_size, 1024))
        L = x.shape[1]
        biases = []
        i = 0
        while f"{pre}.rel_pos_table_list.{i}.weight" in sd:
            tbl = t(sd, f"{pre}.rel_pos_table_list.{i}.weight")
            biases.append(tbl[rp[:L, :L]].permute(2, 0, 1))
            i += 1
    return x, pad_mask, biases


def encoder_forward(sd, cfg, x, padding_mask, biases, encoder_type,
                    split_lens, _states=None):
    enc = cfg.encoder
    d = enc.embed_dim
    h = enc.attention_heads
    hd = d // h
    bsz, L, _ = x.shape
    text_len, image_len, audio_len = split_lens

    x = x * (1 - padding_mask.unsqueeze(-1).float())

    def attn(xi, sd_pre, bias):
        q = lin(xi, sd, f"{sd_pre}.q_proj") * hd**-0.5
        k = lin(xi, sd, f"{sd_pre}.k_proj")
        v = lin(xi, sd, f"{sd_pre}.v_proj")
        q = q.view(bsz, L, h, hd).transpose(1, 2)
        k = k.view(bsz, L, h, hd).transpose(1, 2)
        v = v.view(bsz, L, h, hd).transpose(1, 2)
        logits = q @ k.transpose(-1, -2)
        if bias is not None:
            logits = logits + bias
        logits = logits.masked_fill(
            padding_mask.view(bsz, 1, 1, L), float("-inf"))
        probs = F.softmax(logits.float(), dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(bsz, L, d)
        if f"{sd_pre}.c_attn" in sd:
            out = (out.view(bsz, L, h, hd) * t(sd, f"{sd_pre}.c_attn").view(h, 1)).reshape(bsz, L, d)
        if f"{sd_pre}.ln.weight" in sd:
            out = ln(out, sd, f"{sd_pre}.ln")
        return lin(out, sd, f"{sd_pre}.out_proj")

    def geglu(xi, base):
        y = F.gelu(lin(xi, sd, f"{base}.0.wi_0")) * lin(xi, sd, f"{base}.0.wi_1")
        if f"{base}.2.weight" in sd:
            y = ln(y, sd, f"{base}.2")
        return lin(y, sd, f"{base}.3")

    for li in range(enc.layers):
        pre = f"encoder_wrapper.fusion_model.layers.{li}"
        bias = None
        if biases is not None:
            bias = biases[li] if len(biases) > 1 else biases[0]
        residual = x
        y = ln(x, sd, f"{pre}.self_attn_layer_norm")
        y = attn(y, f"{pre}.self_attn", bias)
        if f"{pre}.attn_ln.weight" in sd:
            y = ln(y, sd, f"{pre}.attn_ln")
        if f"{pre}.gamma_1" in sd:
            y = y * t(sd, f"{pre}.gamma_1")
        x = residual + y
        residual = x
        y = ln(x, sd, f"{pre}.final_layer_norm")
        if encoder_type in ("text", "image", "audio"):
            y = geglu(y, f"{pre}.{encoder_type}_ffn")
        elif encoder_type == "vl":
            y = torch.cat([geglu(y[:, :text_len], f"{pre}.text_ffn"),
                           geglu(y[:, text_len:], f"{pre}.image_ffn")], dim=1)
        elif encoder_type == "al":
            y = torch.cat([geglu(y[:, :text_len], f"{pre}.text_ffn"),
                           geglu(y[:, text_len:], f"{pre}.audio_ffn")], dim=1)
        if f"{pre}.gamma_2" in sd:
            y = y * t(sd, f"{pre}.gamma_2")
        x = residual + y
        if _states is not None:
            _states.append(x.clone())

    def final_norm(seg, mod):
        name = f"encoder_wrapper.fusion_model.{mod}_layer_norm"
        return ln(seg, sd, name) if f"{name}.weight" in sd else seg

    if encoder_type in ("text", "image", "audio"):
        x = final_norm(x, encoder_type)
    elif encoder_type == "vl":
        x = torch.cat([final_norm(x[:, :text_len], "text"),
                       final_norm(x[:, text_len:], "image")], dim=1)
    elif encoder_type == "al":
        x = torch.cat([final_norm(x[:, :text_len], "text"),
                       final_norm(x[:, text_len:], "audio")], dim=1)
    return x


def combine_biases(bias_lists, lens, num_heads=None):
    """Block-diagonal combine per-modality per-layer (H, l, l) biases.
    Modalities with biases=None (use_attn_bias=False) contribute zero
    blocks; all-None returns None (encoder_forward handles it)."""
    present = [(b, l) for b, l in zip(bias_lists, lens) if l > 0]
    with_bias = [b for b, _ in present if b is not None]
    if not with_bias:
        return None
    n_tables = max(len(b) for b in with_bias)
    L = sum(l for _, l in present)
    out = []
    for ti in range(n_tables):
        h = with_bias[0][0].shape[0]
        full = torch.zeros(h, L, L)
        off = 0
        for b, l in present:
            if b is not None:
                full[:, off:off + l, off:off + l] = b[ti if len(b) > 1 else 0]
            off += l
        out.append(full)
    return out


def retrieval_forward(sd, cfg, encoder_type, src_tokens=None, src_images=None,
                      src_audios=None, audio_padding_masks=None):
    """Returns the L2-normalized CLS embedding, mirroring
    OnePeaceRetrievalModel.forward."""
    infos = {}
    if encoder_type in ("text", "vl", "al"):
        infos["text"] = text_adapter_forward(sd, cfg, src_tokens)
    if encoder_type in ("image", "vl"):
        infos["image"] = image_adapter_forward(sd, cfg, src_images)
    if encoder_type in ("audio", "al"):
        infos["audio"] = audio_adapter_forward(sd, cfg, src_audios, audio_padding_masks)

    order = [m for m in ("text", "image", "audio") if m in infos]
    xs = [infos[m][0] for m in order]
    masks = [infos[m][1] for m in order]
    lens3 = tuple(infos[m][0].shape[1] if m in infos else 0
                  for m in ("text", "image", "audio"))
    x = torch.cat(xs, dim=1)
    padding_mask = torch.cat(masks, dim=1)
    biases = combine_biases([infos[m][2] for m in order], [xi.shape[1] for xi in xs])
    out = encoder_forward(sd, cfg, x, padding_mask, biases, encoder_type, lens3)
    if encoder_type in ("text", "image", "audio"):
        cls = out[:, 0]
        proj = lin(cls, sd, f"{encoder_type}_proj")
        return F.normalize(proj, dim=-1)
    return out


def add_classify_head_state(sd, cfg, num_classes, attn_pooling=False,
                            use_pooler=False, head_scale_ratio=1.0, seed=10):
    """Extend a state dict with classify_head keys (ref one_peace_base.py:
    175-214 naming)."""
    rng = np.random.RandomState(seed)
    d = cfg.encoder.embed_dim
    inner = int(d * head_scale_ratio)

    def add(name, *shape, scale=0.05):
        sd[name] = rng.randn(*shape).astype(np.float32) * scale

    add("classify_head.norm.weight", d, scale=1.0)
    sd["classify_head.norm.weight"] += 1
    add("classify_head.norm.bias", d)
    if attn_pooling:
        add("classify_head.attn_pooling_func.k_proj.weight", d, d)
        add("classify_head.attn_pooling_func.v_proj.weight", d, d)
        add("classify_head.attn_pooling_func.v_proj.bias", d)
        add("classify_head.attn_pooling_func.out_proj.weight", d, d)
        add("classify_head.attn_pooling_func.out_proj.bias", d)
        heads = cfg.encoder.attention_heads
        add("classify_head.attn_pooling_func.q", 1, 1, heads, d // heads)
    if use_pooler:
        add("classify_head.pooler.1.weight", d, d)
        add("classify_head.pooler.1.bias", d)
    add("classify_head.classifier.0.weight", inner, d)
    add("classify_head.classifier.0.bias", inner)
    add("classify_head.classifier.1.weight", inner, scale=1.0)
    sd["classify_head.classifier.1.weight"] += 1
    add("classify_head.classifier.1.bias", inner)
    add("classify_head.classifier.3.weight", num_classes, inner)
    add("classify_head.classifier.3.bias", num_classes)
    return sd


def encoder_layer_states(sd, cfg, x, padding_mask, biases, encoder_type,
                         split_lens):
    """Per-layer hidden states (for the layer-by-layer drift harness,
    SURVEY.md S7 hard part 1) — the output of every layer before the
    final modality LayerNorms.  Thin wrapper over encoder_forward so the
    two can never diverge (the previous copy had already silently
    dropped the 'al' FFN branch)."""
    states = []
    encoder_forward(sd, cfg, x, padding_mask, biases, encoder_type,
                    split_lens, _states=states)
    return states
