"""Vocabulary persistence + offline training.

The reference ships a pre-trained DBoW3 vocabulary file loaded at startup
(`voc_TUM_FAST_BRIEF.yml.gz`, main.cpp:15,32 — not even included in the
repo). Equivalent workflow here: train a binary codebook offline over a
dataset's descriptors (tools-style entry point below), save it as npz, and
hand it to the LoopDetector so runs skip on-the-fly training.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def save_vocabulary(path: str, words, idf) -> None:
    np.savez_compressed(path, words=np.asarray(words), idf=np.asarray(idf))


def load_vocabulary(path: str):
    import jax.numpy as jnp

    d = np.load(path)
    return jnp.asarray(d["words"]), jnp.asarray(d["idf"])


def train_vocabulary_from_dataset(
    dataset,
    cam,
    extractor_cfg,
    vocab_size: int = 1024,
    iters: int = 8,
    frame_stride: int = 5,
    max_frames: int = 40,
    seed: int = 0,
) -> tuple:
    """Run the extractor over a dataset and k-majority-train a codebook
    (the DBoW3 offline-vocabulary workflow)."""
    import jax
    import jax.numpy as jnp

    from rgbdslam_tpu.frontend.frame import build_frame_features
    from rgbdslam_tpu.loop.codebook import train_codebook

    descs, valids = [], []
    n = min(len(dataset), max_frames * frame_stride)
    for i in range(0, n, frame_stride):
        ts, gray, depth = dataset.grab(i)
        f = build_frame_features(cam, jnp.asarray(gray), jnp.asarray(depth),
                                 extractor_cfg)
        d, v = jax.device_get((f.desc, f.valid))
        descs.append(d)
        valids.append(v)
    desc = np.concatenate(descs)
    valid = np.concatenate(valids)
    return train_codebook(jnp.asarray(desc), jnp.asarray(valid), vocab_size, iters)


def main(argv=None) -> int:
    """CLI: python -m rgbdslam_tpu.loop.vocabulary --dataset ... --out voc.npz"""
    import argparse

    ap = argparse.ArgumentParser(description="train a loop-closure vocabulary")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--kind", default="TUM")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"])
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rgbdslam_tpu.config import ExtractorConfig
    from rgbdslam_tpu.io.datasets import open_dataset

    if args.dataset.startswith("synthetic"):
        ds = open_dataset(args.dataset, n_frames=args.frames * args.stride)
    else:
        ds = open_dataset(args.dataset, kind=args.kind)
    words, idf = train_vocabulary_from_dataset(
        ds, ds.cam, ExtractorConfig(), vocab_size=args.vocab_size,
        frame_stride=args.stride, max_frames=args.frames,
    )
    save_vocabulary(args.out, words, idf)
    print(f"saved {args.vocab_size}-word vocabulary to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
