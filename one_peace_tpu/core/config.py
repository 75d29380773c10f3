"""Configuration system.

Plain Python dataclasses with YAML + CLI dot-override layering, replicating
the semantics of the reference's Hydra/OmegaConf stack
(ref: one_peace/train.py:472-500, fairseq/fairseq/dataclass/configs.py) with
no external dependency beyond PyYAML.

Model-architecture defaults below are the *released* ONE-PEACE 4B settings
(ref: one_peace/run_scripts/finetune_3B.yaml:77-130), not the dataclass
defaults of the reference code — the dataclass defaults there are overridden
by every shipped YAML.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple


# ---------------------------------------------------------------------------
# Adapter configs (ref: one_peace/models/unify_model_config.py:14-121)
# ---------------------------------------------------------------------------


@dataclass
class TextAdapterConfig:
    bucket_size: int = 256
    layernorm_embedding: bool = False
    add_type_embedding: bool = False
    shrink_alpha: float = 1.0
    dropout: float = 0.0
    use_attn_bias: bool = True
    # defaults to the shipped GPT-2 dict: 50260 dict.txt rows + 4 specials
    vocab_size: int = 50264
    padding_idx: int = 1
    max_positions: int = 512 + 2  # learned abs pos table size (ref text.py:60)


@dataclass
class ImageAdapterConfig:
    bucket_size: int = 16  # abs-pos grid (patch_image_size // 16)
    rel_bucket_size: int = 16
    layernorm_embedding: bool = False
    add_type_embedding: bool = False
    vision_encoder_type: str = "hmlp"  # mlp | hmlp | none
    shrink_alpha: float = 1.0
    dropout: float = 0.0
    use_attn_bias: bool = True


@dataclass
class AudioAdapterConfig:
    # frontend: 'waveform' = the reference's conv stack on the LayerNormed
    # raw waveform (parity default; ref adapter/audio.py:35-55); 'fbank' =
    # log-mel filterbank frames -> LN -> Linear (the optional frontend of
    # BASELINE.json, ops/preprocess.LogMelFbank)
    frontend: str = "waveform"
    fbank_n_mels: int = 80
    fbank_n_fft: int = 400
    fbank_hop: int = 160
    feature_embed_dim: int = 512
    # wav2vec2-style conv stack: (channels, kernel, stride) per layer
    # (ref: unify_model_config.py:74-77)
    feature_encoder_spec: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    abs_pos_type: str = "conv"  # conv | fixed
    conv_pos_depth: int = 5
    conv_pos_width: int = 95
    conv_pos_groups: int = 16
    conv_pos_pre_ln: bool = False
    bucket_size: int = 512
    layernorm_embedding: bool = False
    add_type_embedding: bool = False
    shrink_alpha: float = 1.0
    dropout: float = 0.0
    use_attn_bias: bool = True
    conv_bias: bool = False
    freeze_extractor: bool = False


# ---------------------------------------------------------------------------
# Encoder / decoder config (ref: unify_model_config.py:124-219)
# ---------------------------------------------------------------------------


@dataclass
class EncoderConfig:
    text_adapter: TextAdapterConfig = field(default_factory=TextAdapterConfig)
    image_adapter: ImageAdapterConfig = field(default_factory=ImageAdapterConfig)
    audio_adapter: AudioAdapterConfig = field(default_factory=AudioAdapterConfig)

    embed_dim: int = 1536
    ffn_embed_dim: int = 6144
    layers: int = 40
    attention_heads: int = 24

    drop_path_rate: float = 0.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0

    # Released 4B settings (ref: finetune_3B.yaml:121-130)
    magneto_scale_attn: bool = True  # LN before attention out-proj
    scale_attn: bool = False  # LN after attention (Magneto variant)
    scale_fc: bool = True  # LN inside the GeGLU FFN
    scale_heads: bool = False  # per-head output gains (c_attn)

    use_text_moe: bool = True
    use_image_moe: bool = True
    use_audio_moe: bool = True

    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-6

    max_positions: int = 1024
    layerdrop: float = 0.0
    checkpoint_activations: bool = False
    # remat granularity when checkpoint_activations is on: 'full' replays
    # the whole layer in bwd; 'qkv' additionally saves the named q/k/v
    # projections so the replay skips the qkv dots + attention fwd
    # (more memory, less recompute); 'offload_qkv' parks those saves in
    # pinned host DRAM instead of HBM (the reference's offload_activations,
    # unify_model_config.py:208-213, as a TPU host-offload)
    remat_policy: str = "full"

    # attention implementation: 'pallas' (fused flash kernel; falls back
    # to XLA off-TPU; under a multi-device mesh the kernel runs through
    # shard_map — batch over (dp, fsdp), heads/bias over tp) or 'xla'
    attn_impl: str = "pallas"


def decoder_default_config() -> EncoderConfig:
    """The 2-layer / 768-dim pretrain decoder settings
    (ref: run_scripts/pretrain/pretrain_vl_3B.yaml:132-168)."""
    dec = EncoderConfig(
        embed_dim=768,
        ffn_embed_dim=2048,
        layers=2,
        attention_heads=12,
        use_layer_scale=False,
        use_audio_moe=False,
    )
    dec.text_adapter.use_attn_bias = False
    dec.image_adapter.use_attn_bias = False
    dec.image_adapter.vision_encoder_type = "none"
    dec.audio_adapter.use_attn_bias = False
    # decoder audio adapter: no conv frontend, fixed abs positions
    # (ref pretrain_al_3B.yaml decoder.audio_adapter)
    dec.audio_adapter.feature_encoder_spec = ()
    dec.audio_adapter.abs_pos_type = "fixed"
    dec.audio_adapter.bucket_size = 256
    return dec


@dataclass
class ModelConfig:
    """Top-level model config (encoder + small pretrain decoder).

    ref: unify_model_config.py:216-219 (UnifyModelConfig)
    """

    _name: str = "one_peace_retrieval"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    # defaults to the REAL pretrain decoder (2 layers / 768 dim) —
    # a bare EncoderConfig here would silently build a second
    # full-size 40-layer tower on any pretrain run that does not
    # exhaustively override model.decoder.*
    decoder: EncoderConfig = field(default_factory=decoder_default_config)
    # one rel-pos table per layer instead of a shared one
    # (ref: one_peace_retrieval.py:30-31 copy_rel_pos_table)
    copy_rel_pos_table: bool = False
    head_type: str = "val"  # text | image | audio | vl | al | val
    # stage-2 audio-language pretraining from a stage-1 (VL) checkpoint
    # (ref: one_peace_pretrain.py:31-33 + run_scripts/pretrain/
    # pretrain_al_3B.yaml model.{reset_logit_scale,stage2_pretrain}):
    # stage2_pretrain freezes everything but the audio branch;
    # reset_logit_scale re-initializes logit_scale on checkpoint load.
    stage2_pretrain: bool = False
    reset_logit_scale: bool = False



# ---------------------------------------------------------------------------
# Task / training configs
# ---------------------------------------------------------------------------


@dataclass
class TaskConfig:
    _name: str = ""
    data: str = ""
    valid_data: str = ""
    selected_cols: str = ""
    # TSV column separator (ref base_task.py:61 reader_separator)
    reader_separator: str = "\t"
    bpe_dir: str = ""
    max_src_length: int = 70
    patch_image_size: int = 256
    max_duration: int = 15
    head_type: str = "val"
    # pretrain masking ratios (ref: pretrain_vl_3B.yaml:11-16)
    text_mask_ratio: float = 0.15
    image_mask_ratio: float = 0.75
    vl_text_mask_ratio: float = 0.4
    vl_image_mask_ratio: float = 0.6875
    audio_mask_ratio: float = 0.55
    al_text_mask_ratio: float = 0.4
    al_audio_mask_ratio: float = 0.45
    min_scale: float = 0.9
    valid_file: str = ""
    use_template: bool = False
    zero_shot: bool = False
    # classification extras (image_classify / vggsound / fsd50k)
    num_classes: int = 1000
    mixup: float = 0.0
    cutmix: float = 0.0
    # timm Mixup extras (ref image_classify.py:26-58): cutmix_minmax
    # "0.2,0.8" samples the cut box side-ratio uniformly instead of from
    # the beta lam; mixup_mode batch | pair | elem
    cutmix_minmax: str = ""
    mixup_mode: str = "batch"
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    label_smoothing: float = 0.0
    # eval transform: shorter-side resize + center crop instead of the
    # square stretch (ref image_classify_dataset.py:78-84)
    center_crop: bool = False
    # vision-transfer apps (coco_detection / ade20k_seg / k400_video):
    # ``data``/``valid_data`` hold the annotation file (COCO json, video
    # ann txt) or the "img_dir:ann_dir" pair (seg); image roots go here
    image_dir: str = ""
    valid_image_dir: str = ""
    image_size: int = 1024  # det input size / seg crop / video crop
    max_boxes: int = 100  # static GT slot budget per image (det)
    max_proposals: int = 512  # proposal budget per image at eval (det)
    with_masks: bool = True
    mask_stride: int = 4  # GT instance-mask raster stride
    lsj_min_scale: float = 0.1  # detectron2 large-scale-jitter range
    lsj_max_scale: float = 2.0
    ignore_index: int = 255
    reduce_zero_label: bool = True  # ADE20K 0->ignore relabeling
    num_frames: int = 16
    frame_tmpl: str = "img_{:05d}.jpg"  # mmaction2 rawframes naming
    # multi-view video testing (ref video/configs/recognition/
    # onepeace_k400_frame32.py:50-60 test_pipeline: SampleFrames
    # num_clips=3 + ThreeCrop; scores averaged as softmax probs per
    # _base_/models/onepeace.py:23 average_clips='prob')
    video_test_clips: int = 1
    video_test_three_crop: bool = False
    # temporal sampling: dense contiguous clips (SampleFrames clip_len=T
    # frame_interval=4, the recipe family — ref onepeace_k400_frame32.py
    # :20-31) or TSN-style "segment"; train aug: "rrc" (RandomResizedCrop
    # + ColorJitter, the recipe) or legacy "scale_jitter"
    video_sampling: str = "dense"
    video_frame_interval: int = 4
    video_train_aug: str = "rrc"
    video_color_jitter: bool = True
    # detection trunk structure (ref ViTDet window pattern) + proposer
    window_size: int = 16
    global_period: int = 4
    proposer: str = "fcos"  # fcos | rpn
    # segmentation decode head (ref's ADE20K recipe is mask2former:
    # seg/configs/ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k)
    seg_head: str = "upernet"  # upernet | mask2former
    num_queries: int = 100  # mask2former query slots (ref recipe: 200)
    seg_max_instances: int = 32  # static per-crop GT class budget
    seg_feat_channels: int = 256  # mask2former feat/out channels (ref: 1024)
    seg_num_points: int = 2048  # point-sampled loss budget (ref: 12544)
    seg_dec_layers: int = 9  # mask2former decoder depth (ref: 9)
    seg_pixel_layers: int = 6  # mask2former pixel-decoder depth (ref: 6)
    # seg eval protocol: 'whole' (jitted whole-crop argmax), 'slide'
    # (mmseg test_cfg mode='slide'), 'ms_flip' (seg/test.py --aug-test:
    # multi-scale ratios + horizontal flip, softmax-averaged — the
    # reference's "ms" headline numbers)
    seg_eval_protocol: str = "whole"
    seg_eval_stride: int = 512  # slide stride (ref test_cfg stride=512)
    # whole-protocol prediction rule: bilinearly upsample logits to label
    # resolution before argmax (mmseg-exact, costs a (B, H, W, C) fp32
    # volume on device) vs nearest-upsampling the stride-4 argmax
    # (memory-light opt-out).  Default mmseg-exact: measured +1.8-3.1
    # mIoU on a fine-structure corpus (PARITY.md)
    seg_eval_logits_upsample: bool = True
    seg_ms_ratios: Tuple[float, ...] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)


@dataclass
class CriterionConfig:
    _name: str = ""
    label_smoothing: float = 0.0
    # classify_criterion: BCE-with-logits over multi-hot targets instead
    # of soft-target CE (ref classify_loss.py:40-73 use_multi_label; the
    # FSD50K and VQA recipes set it)
    use_multi_label: bool = False
    # hinge_criterion (AQA): answers per question — consumed by BOTH the
    # criterion and AqaTask.valid_step so train/eval can't disagree
    num_choices: int = 4
    dcl_text_alpha: float = 0.5
    dcl_image_alpha: float = 1.0
    dcl_audio_alpha: float = 1.0
    dcl_vl_text_alpha: float = 0.5
    dcl_vl_image_alpha: float = 0.5
    dcl_al_text_alpha: float = 0.5
    dcl_al_audio_alpha: float = 0.5
    dcl_logit_scale: float = 2.5
    # DCL gallery scope: the reference never all_gathers for DCL — each
    # DDP rank's gallery is its LOCAL batch.  1 (default) = global-batch
    # gallery; set to the reference recipe's world size (8 for
    # pretrain_vl_3B) to reproduce its per-rank gallery statistics
    # exactly (losses.dcl_loss docstring)
    dcl_gallery_chunks: int = 1
    # detection: RPN objectness/box weighting — 'subsample' (detectron2's literal
    # 256-anchor 1:1 random sample as static weight vectors — DEFAULT
    # since the 200-step two-seed harness rerun: +0.8 AP consistently,
    # and it is the reference's exact normalizer semantics; PARITY.md) or
    # 'balanced' (pos/neg each carry half the weight, normalized per
    # count — deterministic, no sampler rng)
    rpn_sampler: str = "subsample"
    # segmentation (UperNet path): where the pixel CE is computed —
    # 'full' (logits bilinearly upsampled to label resolution, mmseg-
    # exact; DEFAULT since the 500-step harness rerun: +16 mIoU over
    # 'stride' under the reference's bilinear-logits eval, PARITY.md) or
    # 'stride' (labels subsampled to the stride-4 logit raster — cheaper,
    # but boundary fidelity degrades under the reference eval protocol)
    seg_loss_at: str = "full"


@dataclass
class OptimizerConfig:
    _name: str = "adamw"
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-8
    weight_decay: float = 0.05
    # Adan (ref optim/adan.py:53-223, the reference's pretraining
    # optimizer option): scale_by_adan + proximal (post-update) decay
    use_adan: bool = False
    adan_betas: Tuple[float, float, float] = (0.98, 0.92, 0.99)


@dataclass
class LRSchedulerConfig:
    _name: str = "cosine"
    warmup_updates: int = 0
    warmup_ratio: float = 0.0
    min_lr: float = 1e-6
    max_update: int = 0


@dataclass
class OptimizationConfig:
    max_epoch: int = 0
    max_update: int = 0
    lr: float = 5e-4
    update_freq: int = 1
    clip_norm: float = 0.0
    layer_decay: float = 1.0
    skip_remainder_batch: bool = False


@dataclass
class DatasetConfig:
    num_workers: int = 0
    batch_size: int = 8
    batch_size_valid: int = 8
    fixed_validation_seed: int = 3407
    validate_interval: int = 1
    # mid-epoch validation every N updates (ref train.py:349-353); 0 = off.
    # At pretrain scale (200k updates over giant TSV epochs) epoch-end-only
    # validation would mean best-checkpoint tracking never fires.
    validate_interval_updates: int = 0
    # suppress validation until this many updates (ref dataset config
    # validate_after_updates)
    validate_after_updates: int = 0
    disable_validation: bool = False
    ensure_equal_batch: bool = True


@dataclass
class CommonConfig:
    seed: int = 3407
    bf16: bool = True
    fp16: bool = False  # fp16 + dynamic loss scaling (GPU-parity mode)
    no_bias_decay: bool = True
    log_format: str = "simple"
    log_interval: int = 10
    tensorboard_logdir: str = ""
    # extra metric sinks (ref logging/progress_bar.py:27-583 wires
    # TensorBoard/W&B/Aim wrappers the same way): a JSONL file sink that
    # needs no external service, plus W&B/Aim clients that no-op when the
    # library is absent (zero-egress hosts)
    log_file: str = ""
    wandb_project: str = ""
    aim_repo: str = ""
    # XLA/TPU profiler capture: write a trace of update steps
    # [profile_start, profile_stop) to profile_dir (jax.profiler works on
    # TPU incl. the axon tunnel; view in TensorBoard / Perfetto)
    profile_dir: str = ""
    profile_start: int = 10
    profile_stop: int = 12


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    restore_file: str = ""
    keep_last_epochs: int = -1
    # keep the k best checkpoints by best_checkpoint_metric, named
    # checkpoint.best_{metric}_{value}.npz (ref checkpoint_utils.py:37-189
    # keep_best_checkpoints); -1 = only checkpoint_best.npz
    keep_best_checkpoints: int = -1
    save_interval: int = 1
    save_interval_updates: int = 0
    best_checkpoint_metric: str = ""
    maximize_best_checkpoint_metric: bool = True
    no_save_optimizer_state: bool = False
    reset_optimizer: bool = False
    reset_dataloader: bool = False
    reset_meters: bool = False


@dataclass
class DistributedConfig:
    # logical mesh axis sizes; -1 means "all remaining devices"
    dp: int = -1
    fsdp: int = 1
    tp: int = 1
    # pipeline parallelism: stages over a leading 'pp' mesh axis (GPipe
    # micro-batching, parallel/pipeline.py); 1 = off
    pp: int = 1
    pp_micro_batches: int = 4
    # sequence parallelism: ring attention over a trailing 'sp' mesh axis
    # (ops/ring_attention.py; select with model.encoder.attn_impl=ring)
    sp: int = 1
    # ZeRO-style parameter/optimizer sharding over the fsdp axis
    shard_params: bool = True


@dataclass
class EMAConfig:
    store_ema: bool = False
    ema_decay: float = 0.9999
    ema_start_update: int = 0
    ema_update_freq: int = 1
    ema_fp32: bool = True
    # validate with (and export best checkpoints from) the EMA shadow —
    # the reference passes the EMA model into valid_step when the task
    # uses it (ref trainer.py:962-966) and its classification finetunes
    # evaluate EMA weights (one_peace_vision/classification/main_ft.py
    # model_ema_eval); tasks may override via a ``uses_ema`` attribute
    ema_eval: bool = True


@dataclass
class FrameworkConfig:
    """Root config: composes every subsystem
    (ref: fairseq/dataclass/configs.py:99+ FairseqConfig)."""

    common: CommonConfig = field(default_factory=CommonConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    ema: EMAConfig = field(default_factory=EMAConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    task: TaskConfig = field(default_factory=TaskConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)


# ---------------------------------------------------------------------------
# YAML / dict overlay machinery
# ---------------------------------------------------------------------------


def _coerce(value: Any, target_type: Any) -> Any:
    """Best-effort coercion of YAML/CLI scalars onto dataclass field types."""
    if value is None:
        return None
    if target_type in (int, float, bool, str):
        if target_type is bool and isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        if target_type is int and isinstance(value, str):
            return int(float(value))
        return target_type(value)
    # tuples like adam_betas "(0.9,0.98)" or nested conv specs
    # "((512,10,5),(512,3,2),...)"
    origin = getattr(target_type, "__origin__", None)
    if origin is tuple:
        if isinstance(value, str):
            import ast

            value = ast.literal_eval(value)
        def deep(v):
            if isinstance(v, (list, tuple)):
                return tuple(deep(x) for x in v)
            return v

        return deep(value)
    return value


def merge_dict(cfg: Any, overrides: Dict[str, Any]) -> Any:
    """Recursively merge a plain dict onto a dataclass instance (in place)."""
    field_map = {f.name: f for f in fields(cfg)}
    for key, value in overrides.items():
        if key not in field_map:
            raise KeyError(f"unknown config key {key!r} for {type(cfg).__name__}")
        current = getattr(cfg, key)
        if is_dataclass(current) and isinstance(value, dict):
            merge_dict(current, value)
        else:
            ftype = field_map[key].type
            try:
                ftype = eval(ftype) if isinstance(ftype, str) else ftype  # noqa: S307
            except Exception:
                # unresolvable annotation (e.g. a forward ref to a type not
                # in scope) — store as-is, nothing to coerce against
                setattr(cfg, key, value)
                continue
            try:
                coerced = _coerce(value, ftype)
            except Exception as exc:
                # a swallowed coercion failure would store the raw value
                # (e.g. batch_size='1o0') and crash far from the config
                raise ValueError(
                    f"config key {key!r}: cannot coerce {value!r} "
                    f"to {ftype}") from exc
            setattr(cfg, key, coerced)
    return cfg


def apply_dot_overrides(cfg: Any, dotlist: List[str]) -> Any:
    """Apply CLI-style overrides: ``a.b.c=value``."""
    import yaml

    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of form key=value")
        key, _, raw = item.partition("=")
        try:
            value = yaml.safe_load(raw)
        except yaml.YAMLError:
            # values that are not valid YAML scalars (a bare ',' for
            # reader_separator, stray '{') are taken as literal strings
            value = raw
        node: Dict[str, Any] = {}
        cursor = node
        parts = key.strip().split(".")
        for part in parts[:-1]:
            cursor[part] = {}
            cursor = cursor[part]
        cursor[parts[-1]] = value
        merge_dict(cfg, node)
    return cfg


def load_config(
    yaml_path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
    base: Optional[FrameworkConfig] = None,
) -> FrameworkConfig:
    """Structured defaults <- YAML file <- CLI dot-overrides
    (layering semantics of ref one_peace/train.py:472-500)."""
    import yaml

    cfg = copy.deepcopy(base) if base is not None else FrameworkConfig()
    if yaml_path:
        with open(yaml_path) as fh:
            doc = yaml.safe_load(fh) or {}
        merge_dict(cfg, doc)
    if overrides:
        apply_dot_overrides(cfg, overrides)
    return cfg


def to_dict(cfg: Any) -> Any:
    """Dataclass tree -> plain dict (for checkpoint metadata)."""
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def from_dict(cls: Any, doc: Dict[str, Any]) -> Any:
    """Plain dict -> dataclass tree (checkpoint metadata restore)."""
    cfg = cls()
    merge_dict(cfg, doc)
    return cfg
