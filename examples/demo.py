"""Tri-modal embedding demo — the reference README's usage, TPU-native.

    python examples/demo.py --path one-peace.pt \
        --images dog.JPEG elephant.JPEG --audios dog.flac cow.flac \
        --texts "a dog" "an elephant" "a cow"

Computes image-text, audio-text and audio-image similarity matrices
(ref: README.md "Usage" section of OFA-Sys/ONE-PEACE).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", required=True)
    parser.add_argument("--texts", nargs="+", required=True)
    parser.add_argument("--images", nargs="*", default=[])
    parser.add_argument("--audios", nargs="*", default=[])
    parser.add_argument("--dtype", default="bf16")
    args = parser.parse_args()

    from one_peace_tpu.hub import from_pretrained

    hub = from_pretrained(args.path, dtype=args.dtype)

    text_emb = np.asarray(
        hub.extract_text_features(hub.process_text(args.texts)), np.float32)
    print("text embeddings:", text_emb.shape)

    if args.images:
        img_emb = np.asarray(
            hub.extract_image_features(hub.process_image(args.images)), np.float32)
        print("\nimage-to-text similarity (softmax over texts):")
        sim = np.exp(img_emb @ text_emb.T * 100)
        sim = sim / sim.sum(-1, keepdims=True)
        for path, row in zip(args.images, sim):
            best = int(row.argmax())
            print(f"  {path}: {args.texts[best]!r}  {row.round(3).tolist()}")

    if args.audios:
        aud_emb = np.asarray(
            hub.extract_audio_features(*hub.process_audio(args.audios)), np.float32)
        print("\naudio-to-text similarity (softmax over texts):")
        sim = np.exp(aud_emb @ text_emb.T * 100)
        sim = sim / sim.sum(-1, keepdims=True)
        for path, row in zip(args.audios, sim):
            best = int(row.argmax())
            print(f"  {path}: {args.texts[best]!r}  {row.round(3).tolist()}")

    if args.images and args.audios:
        print("\naudio-to-image similarity:")
        print((aud_emb @ img_emb.T).round(3))


if __name__ == "__main__":
    main()
