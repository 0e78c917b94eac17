"""Point-cloud / embedding visualization tool.

Equivalent of the reference's repo-root `vis_color_pc.py` (t-SNE + open3d
viewer) without GUI dependencies: writes PLY/OBJ artifacts viewable in any
mesh tool, and dumps t-SNE projections of CLIP embeddings to PNG when
matplotlib is available.

Usage:
  python -m coda_neurips2023_tpu.vis_color_pc --pc scene_pc.npz --out out/
  python -m coda_neurips2023_tpu.vis_color_pc --embeddings feats.npy --out out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from coda_neurips2023_tpu.utils.ply import write_bbox_obj, write_ply


def vis_pointcloud(pc_path: str, out_dir: str, bbox_path: str = None):
    os.makedirs(out_dir, exist_ok=True)
    if pc_path.endswith(".npz"):
        pc = np.load(pc_path)["pc"]
    else:
        pc = np.load(pc_path)
    colors = None
    if pc.shape[1] >= 6:
        colors = np.clip(pc[:, 3:6] * 255, 0, 255).astype(np.uint8)
    name = os.path.splitext(os.path.basename(pc_path))[0]
    write_ply(pc[:, :3], os.path.join(out_dir, name + ".ply"), colors)
    if bbox_path and os.path.exists(bbox_path):
        boxes = np.load(bbox_path)  # (K, >=7): cx cy cz l/2 w/2 h/2 angle
        from coda_neurips2023_tpu.ops import box_ops
        import jax.numpy as jnp

        corners = np.asarray(
            box_ops.get_3d_box_batch_xyz(
                jnp.asarray(boxes[None, :, 3:6] * 2.0),
                jnp.asarray(boxes[None, :, 6]),
                jnp.asarray(boxes[None, :, 0:3]),
            )
        )[0]
        write_bbox_obj(corners, os.path.join(out_dir, name + "_boxes.obj"))


def vis_embeddings_tsne(emb_path: str, out_dir: str, labels_path: str = None):
    os.makedirs(out_dir, exist_ok=True)
    emb = np.load(emb_path)
    try:
        from sklearn.manifold import TSNE
    except ImportError:
        print("sklearn unavailable; skipping t-SNE")
        return
    proj = TSNE(n_components=2, init="pca").fit_transform(emb)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        labels = np.load(labels_path) if labels_path else None
        plt.figure(figsize=(8, 8))
        plt.scatter(proj[:, 0], proj[:, 1], c=labels, s=4, cmap="tab20")
        name = os.path.splitext(os.path.basename(emb_path))[0]
        plt.savefig(os.path.join(out_dir, name + "_tsne.png"), dpi=150)
    except ImportError:
        np.save(os.path.join(out_dir, "tsne_proj.npy"), proj)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pc", default=None)
    p.add_argument("--bbox", default=None)
    p.add_argument("--embeddings", default=None)
    p.add_argument("--labels", default=None)
    p.add_argument("--out", default="vis_out")
    args = p.parse_args()
    if args.pc:
        vis_pointcloud(args.pc, args.out, args.bbox)
    if args.embeddings:
        vis_embeddings_tsne(args.embeddings, args.out, args.labels)


if __name__ == "__main__":
    main()
