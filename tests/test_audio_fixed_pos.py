"""Audio adapter ``abs_pos_type='fixed'`` decoder path vs a torch
re-derivation of ref adapter/audio.py:177-185 (the preserve_embed scatter
with fixed positional embeddings) — the one path r1 left untested."""

import jax
import jax.numpy as jnp
import numpy as np
import torch


def test_fixed_pos_preserve_embed_matches_torch():
    from one_peace_tpu.core.config import AudioAdapterConfig
    from one_peace_tpu.models.adapters.audio import AudioAdapter

    d, heads = 16, 2
    cfg = AudioAdapterConfig(
        feature_encoder_spec=((8, 4, 2),), feature_embed_dim=8,
        abs_pos_type="fixed", bucket_size=8, use_attn_bias=True)
    adapter = AudioAdapter(cfg, embed_dim=d, attention_heads=heads,
                           num_rel_tables=1)
    params = adapter.init(jax.random.PRNGKey(0))
    assert "embed_positions" in params, "fixed path must exist"

    rs = np.random.RandomState(1)
    bsz, seq_len = 2, 6
    # preserve_ids: -1 = masked-out slot (mask token), else target position
    preserve_ids = np.array([[0, 2, 5, -1, -1, -1],
                             [1, 3, -1, -1, -1, -1]], np.int32)
    preserve_embed = rs.randn(bsz, seq_len, d).astype(np.float32)
    mask_token = rs.randn(1, d).astype(np.float32)
    padding_mask = np.zeros((bsz, seq_len), bool)

    x, out_mask, rel_bias = adapter(
        params, src_audios=None, padding_mask=jnp.asarray(padding_mask),
        preserve_ids=jnp.asarray(preserve_ids),
        preserve_embed=jnp.asarray(preserve_embed),
        mask_token=jnp.asarray(mask_token))

    # --- torch re-derivation of ref audio.py:177-185
    pos_table = torch.as_tensor(np.asarray(params["embed_positions"]))
    pos_embed = pos_table[:seq_len].unsqueeze(0).expand(bsz, -1, -1)
    emb = torch.as_tensor(mask_token).repeat(bsz * seq_len, 1)
    pids = torch.as_tensor(preserve_ids)
    right = torch.nonzero(pids.ne(-1).flatten(), as_tuple=False).flatten()
    left = pids + (torch.arange(bsz) * seq_len).unsqueeze(1).to(pids.dtype)
    left = left.view(-1)[right]
    emb[left] = torch.as_tensor(preserve_embed).reshape(-1, d)[right]
    ref = emb.reshape(bsz, seq_len, d) + pos_embed

    np.testing.assert_allclose(np.asarray(x), ref.numpy(), rtol=1e-5,
                               atol=1e-5)
    # rel bias still produced for the decoder attention
    assert rel_bias is not None and rel_bias.shape[-1] == seq_len


def test_fixed_pos_rows_match_reference_indexing():
    """Fixed positions are table[0:L] — position i gets row i
    (ref audio.py:86,177: Embedding(1024+2) indexed by new_arange)."""
    from one_peace_tpu.core.config import AudioAdapterConfig
    from one_peace_tpu.models.adapters.audio import AudioAdapter

    d = 8
    cfg = AudioAdapterConfig(
        feature_encoder_spec=((4, 4, 2),), feature_embed_dim=4,
        abs_pos_type="fixed", bucket_size=8, use_attn_bias=False)
    adapter = AudioAdapter(cfg, embed_dim=d, attention_heads=2,
                           num_rel_tables=1)
    params = adapter.init(jax.random.PRNGKey(2))
    assert params["embed_positions"].shape == (1024 + 2, d)

    bsz, seq_len = 1, 4
    preserve_ids = -np.ones((bsz, seq_len), np.int32)  # all mask tokens
    mask_token = np.zeros((1, d), np.float32)
    x, _, _ = adapter(
        params, src_audios=None,
        padding_mask=jnp.zeros((bsz, seq_len), bool),
        preserve_ids=jnp.asarray(preserve_ids),
        preserve_embed=jnp.zeros((bsz, seq_len, d), jnp.float32),
        mask_token=jnp.asarray(mask_token))
    # with zero mask token and zero preserved embeds, x == pos rows
    np.testing.assert_allclose(
        np.asarray(x[0]), np.asarray(params["embed_positions"][:seq_len]),
        rtol=1e-6)
