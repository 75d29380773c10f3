"""Assembled vision-transfer models (the reference's config entry points).

One class per downstream app, mirroring the reference's mm-framework
configs so a user can build + load in two lines instead of wiring the
backbone/neck/head modules by hand:

- :class:`OnePeaceDetector` — windowed trunk + learned SimpleFeature-
  Pyramid + FCOS proposer + 3-stage cascade box head + mask head
  (ref det/configs/onepeace/cascade_mask_rcnn_vitdet_50ep.py assembly:
  ViTDet-style single-scale trunk behind a cascade Mask R-CNN);
- :class:`OnePeaceMask2FormerSegmenter` — ViT-Adapter backbone +
  Mask2Former head, the reference's shipped ADE20K recipe (ref seg/
  configs/ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k_ss.py);
  :class:`OnePeaceSegmenter` is the lighter UperNet variant on the same
  backbone;
- :class:`OnePeaceVideoClassifier` — AIM temporal-adapter backbone +
  mean-CLS recognizer head (ref video/configs/onepeace/*_k400.py).

Each exposes ``init(key, dtype)`` and ``load_pretrained(sd, key, dtype)``
— ``sd`` being a pretrain ``one-peace.pt``-style flat dict (or the
stripped vision variant); trunk weights come from the checkpoint through
utils/vision_checkpoint.py, task heads/adapters stay freshly initialized,
exactly like the reference's strict=False load.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cascade_rcnn import CascadeBoxHead, MaskHead
from .det_backbone import DetBackbone, SimpleFeaturePyramid
from .detection import FCOSHead
from .upernet import UperNetHead
from .video_backbone import VideoClassifierV2


def _merge_into(base: Dict[str, Any], src: Any) -> Any:
    """Overlay ``src`` onto ``base`` keeping base's structure: keys missing
    from src stay fresh, keys absent from base are dropped (strict=False
    load semantics), matching leaves must agree in shape."""
    if not isinstance(base, dict):
        assert np.shape(base) == np.shape(src), (np.shape(base), np.shape(src))
        return src
    out = {}
    for k, v in base.items():
        if isinstance(src, dict) and k in src:
            out[k] = _merge_into(v, src[k])
        else:
            out[k] = v
    return out


def _cast_like(tree, dtype):
    if dtype is None:
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(
        lambda x: jnp.asarray(x).astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
        tree)


def quantize_serving_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Int8-quantize every trunk FFN (wi_0/wi_1/wo of any ``*_ffn`` block)
    in a zoo param tree for serving: det/video backbone FFNs (their layer
    fns dispatch on the converted tree at the call site, like
    models/encoder) and the encoder FFNs of the seg stack.  The FFNs hold
    ~75% of trunk FLOPs and the MXU runs int8 at 2x the bf16 rate
    (ops/quant.py); heads/adapters/LNs stay full precision.  In-model
    gains measured on the retrieval encoder: +8.7% image, +17.9% audio
    serving (PARITY.md r5) — the 40-layer det/seg trunks share the same
    FFN geometry."""
    from ..ops.quant import quantize_ffn_params

    return quantize_ffn_params(params)


class OnePeaceDetector:
    """Cascade Mask R-CNN over the windowed ONE-PEACE trunk."""

    PYRAMID_KEYS = ("p4", "p8", "p16", "p32")
    STRIDES = (4, 8, 16, 32)

    def __init__(self, num_classes: int = 80, image_size: int = 1024,
                 fpn_channels: int = 256, with_masks: bool = True,
                 proposer: str = "fcos", **backbone_kw):
        backbone_kw.setdefault("bucket_size", image_size // 16)
        self.backbone = DetBackbone(**backbone_kw)
        self.fpn = SimpleFeaturePyramid(in_dim=self.backbone.d,
                                        out_channels=fpn_channels)
        if proposer == "fcos":
            self.proposer = FCOSHead(in_channels=fpn_channels,
                                     num_classes=num_classes,
                                     strides=self.STRIDES)
        elif proposer == "rpn":
            from .rpn import RPNHead

            # the reference recipe's proposer (detectron2 RPN, ref
            # det/configs/onepeace/cascade_mask_rcnn_vitdet_50ep.py)
            self.proposer = RPNHead(in_channels=fpn_channels,
                                    strides=self.STRIDES)
        else:
            raise ValueError(f"unknown proposer {proposer!r}")
        self.proposer_kind = proposer
        self.box_head = CascadeBoxHead(in_channels=fpn_channels,
                                       num_classes=num_classes)
        self.mask_head = (MaskHead(in_channels=fpn_channels,
                                   num_classes=num_classes)
                          if with_masks else None)
        self.num_classes = num_classes
        self._feat_fn = None

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 5)
        params = {
            "backbone": self.backbone.init(keys[0], dtype),
            "fpn": self.fpn.init(keys[1], dtype),
            "proposer": self.proposer.init(keys[2], dtype),
            "box_head": self.box_head.init(keys[3], dtype),
        }
        if self.mask_head is not None:
            params["mask_head"] = self.mask_head.init(keys[4], dtype)
        return params

    def load_pretrained(self, sd, key=None, dtype=jnp.float32):
        """Trunk from the pretrain checkpoint; neck + heads fresh."""
        from ..utils.vision_checkpoint import convert_det_backbone

        params = self.init(key if key is not None else jax.random.PRNGKey(0),
                           dtype)
        params["backbone"] = _cast_like(
            convert_det_backbone(sd, self.backbone), dtype)
        return params

    # ------------------------------------------------------------------

    def features(self, params, images: jnp.ndarray):
        """images (B, 3, H, W) -> pyramid dict + FCOS outputs (jittable)."""
        f16 = self.backbone(params["backbone"], images)
        pyr = self.fpn(params["fpn"], f16)
        feats = [pyr[k] for k in self.PYRAMID_KEYS]
        proposals = self.proposer(params["proposer"], feats)
        return pyr, proposals

    def detect(self, params, images: jnp.ndarray,
               score_thresh: float = 0.05, max_proposals: int = 512,
               max_dets: int = 100) -> List[Dict[str, np.ndarray]]:
        """Full inference: jitted trunk/neck/heads + host NMS decode.

        The cascade/mask heads run as ONE fixed-shape jitted call over
        proposals zero-padded to ``max_proposals`` per image (variable
        per-image counts would dispatch the head op-by-op — a remote
        round-trip per op on the axon tunnel — and retrace per count)."""
        if self._feat_fn is None:
            self._feat_fn = jax.jit(self.features)

            def head_fn(prm, feats, boxes):  # boxes (B, P, 4)
                b, p = boxes.shape[:2]
                bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
                return self.box_head(prm, feats, boxes.reshape(-1, 4), bidx)

            self._head_fn = jax.jit(head_fn)
            if self.mask_head is not None:
                def mask_fn(prm, feats, boxes):
                    b, p = boxes.shape[:2]
                    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
                    return self.mask_head(prm, feats, boxes.reshape(-1, 4),
                                          bidx)

                self._mask_fn = jax.jit(mask_fn)
        pyr, outs = self._feat_fn(params, images)
        # multi-level ROIPooler input (detectron2 poolers.py: each RoI
        # pools from the pyramid level matching its scale)
        feats_t = tuple(pyr[k] for k in self.PYRAMID_KEYS)
        props = self.proposer.decode(outs, score_thresh=score_thresh,
                                     max_dets=max_proposals)
        bsz = int(images.shape[0])
        boxes_pad = np.zeros((bsz, max_proposals, 4), np.float32)
        nprops = np.zeros((bsz,), np.int64)
        for b, p in enumerate(props):
            n = min(len(p["boxes"]), max_proposals)
            boxes_pad[b, :n] = p["boxes"][:n]
            nprops[b] = n
        scores, refined = self._head_fn(params["box_head"], feats_t,
                                        jnp.asarray(boxes_pad))
        scores = np.asarray(scores, np.float32).reshape(bsz, max_proposals, -1)
        refined = np.asarray(refined, np.float32).reshape(bsz, max_proposals, 4)

        results = []
        for b in range(bsz):
            n = int(nprops[b])
            if n == 0:
                results.append({"boxes": np.zeros((0, 4), np.float32),
                                "scores": np.zeros((0,), np.float32),
                                "labels": np.zeros((0,), np.int64)})
                continue
            results.append(self.box_head.decode(
                scores[b, :n], refined[b, :n],
                score_thresh=score_thresh, max_dets=max_dets))

        if self.mask_head is not None and any(len(r["boxes"]) for r in results):
            dboxes = np.zeros((bsz, max_dets, 4), np.float32)
            for b, r in enumerate(results):
                dboxes[b, : len(r["boxes"])] = r["boxes"]
            ml = np.asarray(self._mask_fn(params["mask_head"], feats_t,
                                          jnp.asarray(dboxes)), np.float32)
            ml = ml.reshape((bsz, max_dets) + ml.shape[1:])
            for b, r in enumerate(results):
                nd = len(r["boxes"])
                if nd:
                    sel = ml[b, np.arange(nd), :, :,
                             np.asarray(r["labels"], np.int64)]
                    r["masks"] = 1.0 / (1.0 + np.exp(-sel))
        return results


class OnePeaceSegmenter:
    """ViT-Adapter backbone + UperNet (lighter alternative to the
    reference recipe's Mask2Former head, same 896px backbone)."""

    def __init__(self, enc_cfg, num_classes: int = 150, channels: int = 512,
                 **adapter_kw):
        from .adapter import OnePeaceAdapterBackbone

        self.backbone = OnePeaceAdapterBackbone(enc_cfg, **adapter_kw)
        self.head = UperNetHead([enc_cfg.embed_dim] * 4, channels=channels,
                                num_classes=num_classes)
        self.num_classes = num_classes
        self._slide_fn = None
        self._slide_scan: Dict = {}

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {"backbone": self.backbone.init(k1, dtype),
                "head": self.head.init(k2, dtype)}

    def load_pretrained(self, sd, key=None, dtype=jnp.float32):
        """Image adapter + encoder layers from the checkpoint (with abs/rel
        position-table interpolation to the segmentation resolution);
        spatial priors, interactions and the UperNet head stay fresh.

        Only *pretrain* (one-peace.pt-style) checkpoints are supported: a
        finetuned mmseg checkpoint carries SyncBatchNorm running stats for
        the adapter/head, which have no mapping onto this backbone's
        GroupNorm redesign — fail loudly instead of silently dropping them."""
        bn_keys = [k for k in sd
                   if "running_mean" in k or "running_var" in k
                   or k.startswith(("decode_head.", "auxiliary_head."))]
        if bn_keys:
            raise ValueError(
                "state dict looks like a finetuned mmseg seg checkpoint "
                f"(found {bn_keys[:3]}...); its SyncBatchNorm statistics "
                "have no GroupNorm equivalent in this TPU backbone — load "
                "the multimodal pretrain checkpoint instead")
        from ..utils.checkpoint_convert import convert_wrapper, upgrade_state_dict

        params = self.init(key if key is not None else jax.random.PRNGKey(0),
                           dtype)
        enc_cfg = self.backbone.cfg
        sd = upgrade_state_dict(dict(sd), enc_cfg.layers)
        wrapper = convert_wrapper(sd, "encoder_wrapper", enc_cfg)
        fusion = wrapper["fusion"]
        layers = dict(fusion["layers"])
        src = {"image_adapter": wrapper["image_adapter"],
               "encoder": {"layers": layers}}
        if "image_layer_norm" in fusion:
            src["encoder"]["image_layer_norm"] = fusion["image_layer_norm"]
        params["backbone"] = _cast_like(
            _merge_into(params["backbone"], src), dtype)
        return params

    def logits(self, params, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, 3, H, W) -> (B, H/4, W/4, num_classes) (jittable)."""
        feats = self.backbone(params["backbone"], images)
        return self.head(params["head"], feats)

    @staticmethod
    def _slide_origins(h: int, w: int, crop: int, stride: int):
        """mmseg slide window grid: stride steps plus the shifted-back
        tail window (ref test_cfg mode='slide' semantics)."""
        ys = list(range(0, max(h - crop, 0) + 1, stride))
        xs = list(range(0, max(w - crop, 0) + 1, stride))
        if ys[-1] + crop < h:
            ys.append(h - crop)
        if xs[-1] + crop < w:
            xs.append(w - crop)
        return [(y, x) for y in ys for x in xs]

    def slide_scores(self, params, images, crop: int, stride: int):
        """Sliding-window inference over an arbitrary-size image
        (ref seg config test_cfg: mode='slide', crop_size=896,
        stride=512): overlapping ``crop`` windows, per-window bilinear
        upsample of the class scores to crop resolution (mmseg
        slide_inference resize semantics), per-pixel average.

        The whole window loop is ONE jitted program — `lax.scan` over the
        statically-computed origin grid with the score canvas accumulated
        on device — so an eval pass costs one dispatch per batch instead
        of one tunnel round-trip per window, and the result can stay on
        device for the confusion-matrix reduction.  Compiled once per
        (batch, image, crop, stride) signature; the valid split emits
        fixed-size squares, so that's a single compile per eval config.
        Returns a DEVICE (B, H, W, C) array — except under the host
        fallback (ONE_PEACE_SLIDE_IMPL=host, or a canvas over
        SLIDE_CANVAS_BUDGET_BYTES), where the per-window host loop runs
        and a host ndarray comes back (jnp consumers device-put it)."""
        import jax

        b, _, h, w = images.shape
        canvas_bytes = (4 * b * max(h, crop) * max(w, crop)
                        * self.num_classes)
        if os.environ.get("ONE_PEACE_SLIDE_IMPL") == "host":
            return self._slide_logits_host(params, images, crop, stride)
        if canvas_bytes > self.SLIDE_CANVAS_BUDGET_BYTES:
            import logging

            logging.getLogger(__name__).info(
                "slide canvas %.2f GB exceeds %.2f GB budget; using the "
                "per-window host loop", canvas_bytes / 1e9,
                self.SLIDE_CANVAS_BUDGET_BYTES / 1e9)
            return self._slide_logits_host(params, images, crop, stride)
        origins = np.asarray(self._slide_origins(h, w, crop, stride),
                             np.int32)
        key = (b, h, w, crop, stride, len(origins))
        if key not in self._slide_scan:
            hp, wp = max(h, crop), max(w, crop)
            c = self.num_classes

            def run(params, images, origins):
                imgs = jnp.pad(images.astype(jnp.float32),
                               ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
                canvas = jnp.zeros((b, hp, wp, c), jnp.float32)
                cnt = jnp.zeros((hp, wp), jnp.float32)

                def body(carry, o):
                    canvas, cnt = carry
                    tile = jax.lax.dynamic_slice(
                        imgs, (0, 0, o[0], o[1]), (b, 3, crop, crop))
                    sc = self.logits(params, tile).astype(jnp.float32)
                    sc = jax.image.resize(sc, (b, crop, crop, c),
                                          method="bilinear")
                    patch = jax.lax.dynamic_slice(
                        canvas, (0, o[0], o[1], 0), (b, crop, crop, c))
                    canvas = jax.lax.dynamic_update_slice(
                        canvas, patch + sc, (0, o[0], o[1], 0))
                    cpatch = jax.lax.dynamic_slice(cnt, (o[0], o[1]),
                                                   (crop, crop))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, cpatch + 1.0, (o[0], o[1]))
                    return (canvas, cnt), None

                (canvas, cnt), _ = jax.lax.scan(body, (canvas, cnt), origins)
                out = canvas / jnp.maximum(cnt, 1.0)[None, :, :, None]
                return out[:, :h, :w]

            self._slide_scan[key] = jax.jit(run)
        return self._slide_scan[key](params, jnp.asarray(images),
                                     jnp.asarray(origins))

    def _slide_logits_host(self, params, images: np.ndarray, crop: int,
                           stride: int) -> np.ndarray:
        """Host-orchestrated fallback (one dispatch per window, same
        math as `slide_scores`): used when per-signature compiles are
        unaffordable (ONE_PEACE_SLIDE_IMPL=host) and as the equivalence
        arm in tests."""
        import jax

        if self._slide_fn is None:
            def window(params, tile):
                # resize target from the tile's own (traced) shape so the
                # cached jit serves any crop size
                sc = self.logits(params, tile).astype(jnp.float32)
                return jax.image.resize(
                    sc, (tile.shape[0], tile.shape[2], tile.shape[3],
                         sc.shape[-1]), method="bilinear")

            self._slide_fn = jax.jit(window)
        b, _, h, w = images.shape
        images = np.asarray(images, np.float32)
        out = None
        cnt = np.zeros((1, h, w, 1), np.float32)
        for y0, x0 in self._slide_origins(h, w, crop, stride):
            tile = images[:, :, y0:y0 + crop, x0:x0 + crop]
            ph, pw = crop - tile.shape[2], crop - tile.shape[3]
            if ph or pw:
                tile = np.pad(tile, ((0, 0), (0, 0), (0, ph), (0, pw)))
            sc = np.asarray(self._slide_fn(params, jnp.asarray(tile)),
                            np.float32)[:, : crop - ph, : crop - pw]
            if out is None:
                out = np.zeros((b, h, w, sc.shape[-1]), np.float32)
            out[:, y0:y0 + sc.shape[1], x0:x0 + sc.shape[2]] += sc
            cnt[:, y0:y0 + sc.shape[1], x0:x0 + sc.shape[2]] += 1.0
        return out / np.maximum(cnt, 1.0)

    # device canvas budget for the fused slide path: the scan keeps a
    # (B, H, W, C) fp32 canvas in HBM next to the model params (C=150 at
    # 1024px, B=4 is ~2.5 GB) — route oversize canvases through the
    # per-window host loop automatically instead of OOMing
    SLIDE_CANVAS_BUDGET_BYTES = int(1.5e9)

    def slide_logits(self, params, images: np.ndarray, crop: int,
                     stride: int) -> np.ndarray:
        """Host-side (B, H, W, C) averaged slide scores; thin fetch over
        `slide_scores` (which owns the ONE_PEACE_SLIDE_IMPL=host /
        canvas-budget routing)."""
        return np.asarray(self.slide_scores(params, images, crop, stride))

    def ms_flip_logits(self, params, images: np.ndarray, crop: int,
                       stride: int,
                       ratios=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
                       flip: bool = True) -> np.ndarray:
        """mmseg MultiScaleFlipAug test protocol — the reference's "ms"
        eval numbers (ref seg/test.py:143-148 img_ratios + flip; mmseg
        EncoderDecoder.aug_test): for each image ratio (and its horizontal
        flip) run slide inference, bilinearly resize the class scores back
        to the input resolution, softmax, and average the per-view
        probabilities.  Returns (B, H, W, C) averaged probs."""
        import jax

        b, _, h, w = images.shape
        images = np.asarray(images, np.float32)
        acc = None
        views = 0
        for r in ratios:
            nh, nw = max(1, round(h * r)), max(1, round(w * r))
            if (nh, nw) == (h, w):
                imr = images
            else:
                imr = np.asarray(jax.image.resize(
                    jnp.asarray(images), (b, 3, nh, nw), method="bilinear"))
            for flipped in ((False, True) if flip else (False,)):
                v = imr[:, :, :, ::-1] if flipped else imr
                sc = self.slide_logits(params, np.ascontiguousarray(v),
                                       crop, stride)
                if flipped:
                    sc = sc[:, :, ::-1, :]
                if sc.shape[1:3] != (h, w):
                    sc = np.asarray(jax.image.resize(
                        jnp.asarray(sc), (b, h, w, sc.shape[-1]),
                        method="bilinear"))
                e = np.exp(sc - sc.max(-1, keepdims=True))
                prob = e / e.sum(-1, keepdims=True)
                acc = prob if acc is None else acc + prob
                views += 1
        return acc / views

    __call__ = logits


class OnePeaceMask2FormerSegmenter(OnePeaceSegmenter):
    """ViT-Adapter backbone + Mask2Former decode head — the assembly the
    reference's headline 896px ADE20K recipe actually trains
    (ref seg/configs/ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k
    _ss.py: num_queries=200, feat/out 1024, 6-layer MSDeformAttn pixel
    decoder, 9-layer masked-attention transformer decoder).
    ``load_pretrained`` is inherited (backbone from the pretrain
    checkpoint, head fresh)."""

    is_mask2former = True

    def __init__(self, enc_cfg, num_classes: int = 150,
                 feat_channels: int = 256, out_channels: Optional[int] = None,
                 num_queries: int = 100, dec_layers: int = 9,
                 dec_heads: int = 8, dec_ffn_dim: Optional[int] = None,
                 pixel_layers: int = 6, pixel_heads: int = 8,
                 pixel_ffn_dim: Optional[int] = None, **adapter_kw):
        from .mask2former import Mask2FormerHead

        super().__init__(enc_cfg, num_classes=num_classes, **adapter_kw)
        self.num_queries = num_queries
        d = enc_cfg.embed_dim
        self.head = Mask2FormerHead(
            num_classes, [d, d, d, d], feat_channels=feat_channels,
            out_channels=out_channels or feat_channels,
            num_queries=num_queries, num_layers=dec_layers,
            num_heads=dec_heads,
            ffn_dim=dec_ffn_dim or 8 * feat_channels,
            pixel_decoder_layers=pixel_layers, pixel_heads=pixel_heads,
            pixel_ffn_dim=pixel_ffn_dim or 4 * feat_channels)

    def forward_sets(self, params, images: jnp.ndarray):
        """images (B, 3, H, W) -> (all_cls (L, B, Q, C+1),
        all_masks (L, B, Q, H/4, W/4)) for the set losses (jittable)."""
        feats = self.backbone(params["backbone"], images)
        return self.head(params["head"], feats)

    def logits(self, params, images: jnp.ndarray) -> jnp.ndarray:
        """Semantic class scores (B, H/4, W/4, C): final-layer set
        prediction collapsed per pixel (Mask2Former semantic inference).
        Scores are probabilities, not logits — argmax-compatible with the
        UperNet path the eval loop uses."""
        from .mask2former import semantic_inference

        all_cls, all_masks = self.forward_sets(params, images)
        return semantic_inference(all_cls[-1], all_masks[-1])

    __call__ = logits


class OnePeaceVideoClassifier(VideoClassifierV2):
    """K400 recognizer with pretrain loading."""

    def load_pretrained(self, sd, key=None, dtype=jnp.float32):
        from ..utils.vision_checkpoint import convert_video_backbone

        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        params = self.init(k1, dtype)
        params["backbone"] = _cast_like(
            convert_video_backbone(sd, self.backbone, key=k2), dtype)
        return params
