"""Embedding analyzer — PCA scatter of the trained speaker-embedding table.

Rebuilds Torch_multi/analyze_data.py:8-19 (PCA(2) of the SPEECH_EMBEDDING
weights): writes a CSV of 2-D coordinates per speaker and, when matplotlib
is importable, a scatter PNG.

    python -m dl4ss_tpu.run.analyze --checkpoint-dir ck --out emb_pca
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dl4ss_tpu.run.common import add_common_args, build_cfg
from dl4ss_tpu.train.checkpoint import restore_checkpoint
from dl4ss_tpu.train.state import create_train_state


def pca2(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--out", default="emb_pca")
    args = p.parse_args(argv)
    cfg = build_cfg(args)
    if args.checkpoint_dir:
        # rebuild the state template from the TRAINING config (list-mode
        # checkpoints carry their own speaker count)
        from dl4ss_tpu.run.common import apply_overrides
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            cfg = apply_overrides(ck_cfg, args)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
    table = np.asarray(state.params["embedding"]["table"])
    coords = pca2(table)
    csv = args.out + ".csv"
    with open(csv, "w") as f:
        f.write("speaker,pc1,pc2\n")
        for i, (a, b) in enumerate(coords):
            f.write(f"{i},{a:.6f},{b:.6f}\n")
    print("wrote", csv)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(6, 6))
        plt.scatter(coords[:, 0], coords[:, 1], s=12)
        plt.title("speaker embeddings (PCA-2)")
        plt.savefig(args.out + ".png", dpi=120)
        print("wrote", args.out + ".png")
    except Exception as e:  # headless-safe
        print("no plot:", e)
    return coords


if __name__ == "__main__":
    main()
