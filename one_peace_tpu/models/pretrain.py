"""ONE-PEACE pretraining model: encoder wrapper + small decoder wrapper +
projection/mask heads.  Behavioral spec: ref one_peace/models/one_peace/
one_peace_pretrain.py:36-198.

Teacher passes (no preserve ids) return (normalized CLS projection, full
features); student passes (with preserve ids) run the encoder on the
preserved subsequence, project its features to decoder width, scatter them
among mask tokens at the original positions, run the 2-layer decoder, and
map back to encoder width via the mask head — the masked-denoising branch
scored by the DCL losses.
"""

from __future__ import annotations

import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from .components import init_linear, linear
from .one_peace import ModelWrapper

logger = logging.getLogger(__name__)


@MODELS.register("one_peace_pretrain")
class OnePeacePretrainModel:
    def __init__(self, cfg: ModelConfig, logit_scale_init: float = 1 / 0.07,
                 stage2_pretrain: Optional[bool] = None):
        self.cfg = cfg
        if stage2_pretrain is None:
            stage2_pretrain = getattr(cfg, "stage2_pretrain", False)
        self.stage2_pretrain = stage2_pretrain
        self.logit_scale_init = logit_scale_init
        self.encoder_wrapper = ModelWrapper(cfg.encoder)
        self.decoder_wrapper = ModelWrapper(cfg.decoder)

    def enable_pipeline(self, mesh, num_micro_batches: int) -> None:
        """Pipeline the 40-layer encoder; the 2-layer decoder stays scanned
        (its depth rarely divides a pp axis and it is ~1% of the FLOPs)."""
        self.encoder_wrapper.enable_pipeline(mesh, num_micro_batches)

    def init(self, key, dtype=jnp.float32):
        enc = self.cfg.encoder
        dec = self.cfg.decoder
        d, dd = enc.embed_dim, dec.embed_dim
        keys = jax.random.split(key, 16)
        from .components import trunc_normal

        params = {
            "encoder_wrapper": self.encoder_wrapper.init(keys[0], dtype=dtype),
            "decoder_wrapper": self.decoder_wrapper.init(keys[1], dtype=dtype),
            "logit_scale": jnp.asarray(math.log(self.logit_scale_init), jnp.float32),
        }
        i = 2
        for mod, used_enc, used_dec in (
            ("text", enc.use_text_moe, dec.use_text_moe),
            ("image", enc.use_image_moe, dec.use_image_moe),
            ("audio", enc.use_audio_moe, dec.use_audio_moe),
        ):
            if used_enc:
                params[f"{mod}_proj"] = init_linear(keys[i], d, d, dtype=dtype)
                i += 1
            if used_enc and used_dec:
                params[f"decoder_{mod}_embed"] = init_linear(keys[i], d, dd, dtype=dtype)
                params[f"{mod}_mask_token"] = trunc_normal(keys[i + 1], (1, dd), dtype=dtype)
                params[f"{mod}_mask_head"] = init_linear(keys[i + 2], dd, d, dtype=dtype)
                i += 3
        return params

    def logit_scale_exp(self, params):
        x = params["logit_scale"]
        # straight-through clamp (ref clamps the STORED param in place,
        # :96-99): value saturates at [0, ln 100] but the gradient stays
        # identity, so a parameter pushed past a bound by momentum can
        # still be pulled back — a plain clip has zero gradient outside
        # the range and sticks forever
        clipped = jnp.clip(x, 0.0, math.log(100.0))
        return jnp.exp(x + jax.lax.stop_gradient(clipped - x))

    def __call__(
        self,
        params,
        src_tokens=None,
        text_preserve_ids=None,
        src_images=None,
        image_preserve_ids=None,
        src_audios=None,
        audio_padding_masks=None,
        audio_preserve_ids=None,
        encoder_type: str = "text",
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """Teacher mode (no preserve ids): ('text'|'image'|'audio') ->
        (normalized CLS logits, features); ('vl'|'al') -> (text_f, other_f).
        Student mode (any preserve ids given): decoder mask-head features
        per modality (ref :131-160)."""
        rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
        enc_text, enc_image, enc_audio = self.encoder_wrapper(
            params["encoder_wrapper"],
            src_tokens=src_tokens, text_preserve_ids=text_preserve_ids,
            src_images=src_images, image_preserve_ids=image_preserve_ids,
            src_audios=src_audios, audio_padding_masks=audio_padding_masks,
            audio_preserve_ids=audio_preserve_ids,
            encoder_type=encoder_type, deterministic=deterministic, rng=rngs[0],
        )

        student = (text_preserve_ids is not None or image_preserve_ids is not None
                   or audio_preserve_ids is not None)
        if student:
            def embed(mod, feats):
                if feats is None or f"decoder_{mod}_embed" not in params:
                    return None
                return linear(params[f"decoder_{mod}_embed"], feats)

            dec_text, dec_image, dec_audio = self.decoder_wrapper(
                params["decoder_wrapper"],
                src_tokens=src_tokens,
                text_preserve_ids=text_preserve_ids,
                text_preserve_embed=embed("text", enc_text),
                text_mask_token=params.get("text_mask_token"),
                src_images=src_images,
                image_preserve_ids=image_preserve_ids,
                image_preserve_embed=embed("image", enc_image),
                image_mask_token=params.get("image_mask_token"),
                src_audios=src_audios,
                audio_padding_masks=audio_padding_masks,
                audio_preserve_ids=audio_preserve_ids,
                audio_preserve_embed=embed("audio", enc_audio),
                audio_mask_token=params.get("audio_mask_token"),
                encoder_type=encoder_type, deterministic=deterministic, rng=rngs[1],
            )

            def head(mod, feats):
                if feats is None:
                    return None
                return linear(params[f"{mod}_mask_head"], feats)

            return head("text", dec_text), head("image", dec_image), head("audio", dec_audio)

        if encoder_type in ("text", "image", "audio"):
            feats = {"text": enc_text, "image": enc_image, "audio": enc_audio}[encoder_type]
            cls = feats[:, 0]
            out = linear(params[f"{encoder_type}_proj"], cls)
            outf = out.astype(jnp.float32)
            logits = (outf / jnp.linalg.norm(outf, axis=-1, keepdims=True)).astype(out.dtype)
            return logits, feats
        if encoder_type == "vl":
            return enc_text, enc_image
        if encoder_type == "al":
            return enc_text, enc_audio
        raise NotImplementedError(encoder_type)

    def trainable_mask(self, params):
        """Stage-2 freezing (ref :98-104): freeze everything except the
        audio adapter, audio FFNs, audio final LN, and the non-encoder
        heads.  Returns a bool pytree for optax masking."""
        if not self.stage2_pretrain:
            return jax.tree.map(lambda _: True, params)

        def mask_subtree(tree, value):
            return jax.tree.map(lambda _: value, tree)

        mask = {k: mask_subtree(v, True) for k, v in params.items()}
        enc = params["encoder_wrapper"]
        enc_mask = {k: mask_subtree(v, False) for k, v in enc.items()}
        if "audio_adapter" in enc:
            enc_mask["audio_adapter"] = mask_subtree(enc["audio_adapter"], True)
        fusion = enc["fusion"]
        fusion_mask = {k: mask_subtree(v, False) for k, v in fusion.items()}
        if "audio_layer_norm" in fusion:
            fusion_mask["audio_layer_norm"] = mask_subtree(fusion["audio_layer_norm"], True)
        layers_mask = {k: mask_subtree(v, k == "audio_ffn")
                       for k, v in fusion["layers"].items()}
        fusion_mask["layers"] = layers_mask
        enc_mask["fusion"] = fusion_mask
        mask["encoder_wrapper"] = enc_mask
        if "text_proj" in params:
            mask["text_proj"] = mask_subtree(params["text_proj"], False)
        return mask

    def upgrade_stage1_params(self, loaded, seed: int = 0):
        """Migrate a stage-1 (VL) checkpoint tree into this model's tree
        (ref one_peace_pretrain.py:181-198 upgrade_state_dict_named):
        overlay checkpoint values where the path exists in the fresh tree
        with a matching shape; everything else (e.g. the audio branch on a
        stage-2 model, whose config drops the image branch entirely) stays
        freshly initialized.  With reset_logit_scale, logit_scale keeps the
        fresh init instead of the checkpoint value (ref :184-185); stage-2's
        deletion of image_* keys (ref :186-191) is implicit — the stage-2
        config has no image branch, so those paths never match."""
        fresh = self.init(jax.random.PRNGKey(seed))
        skip = {"logit_scale"} if getattr(self.cfg, "reset_logit_scale", False) else set()

        def overlay(f, l, path):
            if isinstance(f, dict):
                out = {}
                for k, v in f.items():
                    sub = f"{path}/{k}" if path else k
                    if sub in skip:
                        logger.info("%s reset (reset_logit_scale)", sub)
                        out[k] = v
                    elif isinstance(l, dict) and k in l:
                        out[k] = overlay(v, l[k], sub)
                    else:
                        logger.info("%s not in checkpoint, re-initialized", sub)
                        out[k] = v
                return out
            lsh = getattr(l, "shape", None)
            if lsh is not None and tuple(lsh) == tuple(f.shape):
                return jnp.asarray(l, dtype=f.dtype)
            logger.info("%s shape mismatch %s vs %s, re-initialized",
                        path, lsh, getattr(f, "shape", None))
            return f

        return overlay(fresh, loaded, "")
