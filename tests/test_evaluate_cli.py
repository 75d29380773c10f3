"""Zero-shot audio-text retrieval eval through the real evaluate CLI —
the ESC-50 flow (template text side + audio side + Recall) on synthetic
data with a converted tiny checkpoint."""

import json
import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch_fixture as tf
    from helpers import tiny_model_config
    from one_peace_tpu.utils.checkpoint_convert import convert_retrieval_model
    from one_peace_tpu.utils.native_checkpoint import save_params

    root = tmp_path_factory.mktemp("esc")
    # tiny wav files, 1 s @ 16 kHz
    rs = np.random.RandomState(0)
    rows = ["id\taudio\tlabel\tduration"]
    labels = ["dog", "cow", "rain"]
    for i, lab in enumerate(labels):
        wav_path = root / f"clip{i}.wav"
        data = (rs.randn(16000) * 3000).astype(np.int16)
        with wave.open(str(wav_path), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(data.tobytes())
        rows.append(f"{i}\t{wav_path}\t{lab}\t1.0")
    tsv = root / "valid.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    labels_json = root / "labels.json"
    labels_json.write_text(json.dumps({str(i): [lab] for i, lab in enumerate(labels)}))

    cfg = tiny_model_config(head_type="val")
    cfg.encoder.text_adapter.vocab_size = 50264
    cfg.encoder.audio_adapter.feature_encoder_spec = (
        (16, 10, 5), (16, 8, 8), (16, 8, 8))
    sd = tf.make_random_state_dict(cfg, seed=0)
    params = convert_retrieval_model(sd, cfg)
    ckpt = root / "model.npz"
    save_params(str(ckpt), params)
    return root, tsv, labels_json, ckpt, cfg


def test_zero_shot_eval_cli(setup, capsys):
    from one_peace_tpu.cli.evaluate import main

    root, tsv, labels_json, ckpt, cfg = setup
    spec = "((16,10,5),(16,8,8),(16,8,8))"
    rc = main([
        "--path", str(ckpt),
        "--output", str(root / "metrics.json"),
        "task._name=audio_text_retrieval",
        f"task.valid_data={tsv}",
        "task.selected_cols=id,audio,label,duration",
        f"task.valid_file={labels_json}",
        "task.use_template=true",
        "task.head_type=val",
        "model._name=one_peace_retrieval",
        "model.encoder.embed_dim=32",
        "model.encoder.ffn_embed_dim=64",
        "model.encoder.layers=2",
        "model.encoder.attention_heads=4",
        "model.encoder.image_adapter.bucket_size=2",
        "model.encoder.image_adapter.rel_bucket_size=2",
        "model.encoder.text_adapter.bucket_size=8",
        "model.encoder.audio_adapter.bucket_size=8",
        "model.encoder.audio_adapter.conv_pos_depth=2",
        "model.encoder.audio_adapter.conv_pos_width=6",
        "model.encoder.audio_adapter.conv_pos_groups=4",
        f"model.encoder.audio_adapter.feature_encoder_spec={spec}",
        "dataset.batch_size_valid=3",
        "common.bf16=false",
    ])
    assert rc == 0
    metrics = json.loads((root / "metrics.json").read_text())
    # recall keys renamed to the audio side
    assert "audio_r1" in metrics and "txt_r1" in metrics
    assert metrics["txt_count"] == 3


def test_classify_eval_cli(tmp_path):
    """VGGSound-style classify evaluation through the evaluate CLI with a
    converted classify checkpoint."""
    import torch_fixture as tf
    from helpers import tiny_model_config
    from one_peace_tpu.cli.evaluate import main
    from one_peace_tpu.utils.checkpoint_convert import convert_classify_model
    from one_peace_tpu.utils.native_checkpoint import save_params

    # synthetic audio-classification tsv with wav files
    rs = np.random.RandomState(0)
    rows = ["id\taudio\tlabel\tduration"]
    for i in range(4):
        wav_path = tmp_path / f"c{i}.wav"
        data = (rs.randn(16000) * 3000).astype(np.int16)
        with wave.open(str(wav_path), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(data.tobytes())
        rows.append(f"{i}\t{wav_path}\t{i % 3}\t1.0")
    tsv = tmp_path / "valid.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    cfg = tiny_model_config(head_type="audio")
    cfg._name = "one_peace_classify"
    cfg.encoder.use_text_moe = False
    cfg.encoder.use_image_moe = False
    cfg.encoder.audio_adapter.feature_encoder_spec = (
        (16, 10, 5), (16, 8, 8), (16, 8, 8))
    sd = tf.make_random_state_dict(cfg, seed=0)
    tf.add_classify_head_state(sd, cfg, num_classes=3)
    ckpt = tmp_path / "cls.npz"
    save_params(str(ckpt), convert_classify_model(sd, cfg))

    spec = "((16,10,5),(16,8,8),(16,8,8))"
    rc = main([
        "--path", str(ckpt),
        "--output", str(tmp_path / "m.json"),
        "task._name=vggsound",
        f"task.valid_data={tsv}",
        "task.selected_cols=id,audio,label,duration",
        "task.head_type=audio",
        "task.num_classes=3",
        "model._name=one_peace_classify",
        "model.encoder.embed_dim=32",
        "model.encoder.ffn_embed_dim=64",
        "model.encoder.layers=2",
        "model.encoder.attention_heads=4",
        "model.encoder.image_adapter.bucket_size=2",
        "model.encoder.image_adapter.rel_bucket_size=2",
        "model.encoder.text_adapter.bucket_size=8",
        "model.encoder.audio_adapter.bucket_size=8",
        "model.encoder.audio_adapter.conv_pos_depth=2",
        "model.encoder.audio_adapter.conv_pos_width=6",
        "model.encoder.audio_adapter.conv_pos_groups=4",
        f"model.encoder.audio_adapter.feature_encoder_spec={spec}",
        "dataset.batch_size_valid=4",
        "common.bf16=false",
    ])
    assert rc == 0
    metrics = json.loads((tmp_path / "m.json").read_text())
    assert "accuracy" in metrics and metrics["count"] == 4
