"""Plotting: graph/CC grids, learning curves, diffusion-trajectory GIFs.

Parity target: ccsd/src/utils/plot.py:39-763.  matplotlib is host-side;
rank-2 cells are shaded as convex patches on the spring layout (replacing
the reference's hypernetx dependency); RDKit molecule drawing and plotly 3D
figures are gated on their imports.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import networkx as nx
import numpy as np


def plot_graphs_list(
    graphs: Sequence[nx.Graph],
    title: str = "graphs",
    max_num: int = 16,
    save_dir: Optional[str] = None,
    N: int = 0,
) -> Optional[str]:
    """Grid plot of graphs.  (plot.py:39-116)"""
    n = min(max_num, len(graphs))
    rows = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(rows, rows, figsize=(3 * rows, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes:
        ax.axis("off")
    for i in range(n):
        G = graphs[i + N]
        pos = nx.spring_layout(G, seed=0)
        nx.draw(G, pos, ax=axes[i], node_size=40, width=0.8, node_color="#333")
        axes[i].set_title(
            f"n={G.number_of_nodes()}, e={G.number_of_edges()}", fontsize=8
        )
    fig.suptitle(title)
    out = None
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"{title}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_cc_list(
    ccs,
    title: str = "ccs",
    max_num: int = 16,
    save_dir: Optional[str] = None,
) -> Optional[str]:
    """Grid plot of combinatorial complexes with shaded rank-2 cells."""
    from ccsd_tpu.data.cc_codec import convert_CC_to_graphs

    n = min(max_num, len(ccs))
    rows = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(rows, rows, figsize=(3 * rows, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes:
        ax.axis("off")
    graphs = convert_CC_to_graphs(ccs[:n])
    for i in range(n):
        G = graphs[i]
        if G.number_of_nodes() == 0:
            continue
        pos = nx.spring_layout(G, seed=0)
        cells = ccs[i].cells.hyperedge_dict.get(2, {})
        for cell in cells:
            pts = np.array([pos[v] for v in cell if v in pos])
            if len(pts) >= 3:
                center = pts.mean(0)
                angles = np.arctan2(*(pts - center).T[::-1])
                order = np.argsort(angles)
                axes[i].fill(
                    pts[order, 0], pts[order, 1], alpha=0.25, color="tab:orange"
                )
        nx.draw(G, pos, ax=axes[i], node_size=40, width=0.8, node_color="#333")
    fig.suptitle(title)
    out = None
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"{title}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_lc(
    history: dict,
    names: Sequence[str],
    save_dir: Optional[str] = None,
    title: str = "learning_curves",
) -> Optional[str]:
    """Learning curves (train/test loss per model).  (plot.py:306-332)"""
    train = np.asarray(history["train"])
    test = np.asarray(history["test"])
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 3))
    axes = np.atleast_1d(axes)
    for i, name in enumerate(names):
        axes[i].plot(train[:, i], label="train")
        axes[i].plot(test[:, i], label="test")
        axes[i].set_title(name)
        axes[i].set_xlabel("epoch")
        axes[i].legend()
    out = None
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"{title}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        np.save(os.path.join(save_dir, f"{title}_train.npy"), train)
        np.save(os.path.join(save_dir, f"{title}_test.npy"), test)
    plt.close(fig)
    return out


def diffusion_animation(
    adj_trajectory: np.ndarray,
    save_dir: str,
    name: str = "diffusion",
    every: int = 25,
    thr: float = 0.5,
) -> Optional[str]:
    """GIF of one sample's reverse diffusion.  (plot.py:606-763)

    adj_trajectory: (T, N, N) array of the sample-0 adjacency means.
    """
    try:
        import imageio.v2 as imageio
    except ImportError:
        return None
    os.makedirs(save_dir, exist_ok=True)
    frames = []
    T = adj_trajectory.shape[0]
    pos = None
    for t in range(0, T, every):
        adj = np.asarray(adj_trajectory[t])
        G = nx.from_numpy_array((adj > thr).astype(float))
        G.remove_edges_from(nx.selfloop_edges(G))
        if pos is None:
            final = np.asarray(adj_trajectory[-1])
            Gf = nx.from_numpy_array((final > thr).astype(float))
            pos = nx.spring_layout(Gf, seed=0)
        fig, ax = plt.subplots(figsize=(3, 3))
        nx.draw(G, pos, ax=ax, node_size=30, width=0.8, node_color="#333")
        ax.set_title(f"t = {t}/{T}")
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(frame)
        plt.close(fig)
    out = os.path.join(save_dir, f"{name}.gif")
    imageio.mimsave(out, frames, fps=8)
    return out


def plot_molecules(mols, title: str = "molecules", max_num: int = 16,
                   save_dir: Optional[str] = None) -> Optional[str]:
    """Molecule grid via RDKit Draw (gated)."""
    try:
        from rdkit.Chem import Draw
    except ImportError:
        return None
    img = Draw.MolsToGridImage(mols[:max_num], molsPerRow=4,
                               subImgSize=(200, 200))
    out = None
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"{title}.png")
        with open(out, "wb") as f:
            f.write(img.data if hasattr(img, "data") else img.tobytes())
    return out
