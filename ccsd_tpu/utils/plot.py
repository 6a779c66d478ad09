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
    cropped: bool = False,
    fps: int = 8,
) -> Optional[str]:
    """GIF of one sample's reverse diffusion.  (plot.py:606-763)

    adj_trajectory: (T, N, N) array of the sample-0 adjacency means.
    cropped: restrict frames to the nodes that carry at least one edge in
    the FINAL quantized graph (reference's "cropped" variant,
    sampler.py:350-360) — the padding nodes of max_node_num never appear.
    """
    try:
        import imageio.v2 as imageio
    except ImportError:
        return None
    os.makedirs(save_dir, exist_ok=True)
    adj_trajectory = np.asarray(adj_trajectory)
    T = adj_trajectory.shape[0]
    final = (np.asarray(adj_trajectory[-1]) > thr).astype(float)
    np.fill_diagonal(final, 0.0)
    keep = np.arange(final.shape[0])
    if cropped:
        keep = np.nonzero(final.sum(axis=1) > 0)[0]
        if keep.size == 0:
            keep = np.arange(min(2, final.shape[0]))
    Gf = nx.from_numpy_array(final[np.ix_(keep, keep)])
    pos = nx.spring_layout(Gf, seed=0)
    frames = []
    steps = list(range(0, T, every))
    if steps[-1] != T - 1:
        steps.append(T - 1)  # always land on the final state
    for t in steps:
        adj = np.asarray(adj_trajectory[t])[np.ix_(keep, keep)]
        G = nx.from_numpy_array((adj > thr).astype(float))
        G.remove_edges_from(nx.selfloop_edges(G))
        fig, ax = plt.subplots(figsize=(3, 3))
        nx.draw(G, pos, ax=ax, node_size=30, width=0.8, node_color="#333")
        ax.set_title(f"t = {t + 1}/{T}")
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(frame)
        plt.close(fig)
    out = os.path.join(save_dir, f"{name}.gif")
    imageio.mimsave(out, frames, fps=fps)
    return out


# ---------------------------------------------------------------- molecules --

# CPK colors / covalent radii (plot.py:350-353 uses the same tables)
CPK_COLORS = {"C": "#222222", "N": "#2244dd", "O": "#dd2222", "F": "#22aa22",
              "H": "#dddddd", "S": "#ccaa00", "Cl": "#22aa22", "Br": "#882211",
              "I": "#771188", "P": "#dd8822"}
ATOMIC_RADII = {"C": 0.77, "N": 0.75, "O": 0.73, "F": 0.71, "H": 0.38,
                "S": 1.02, "Cl": 0.99, "Br": 1.14, "I": 1.33, "P": 1.06}


def _mol_geometry(mol, dim: int = 3):
    """(symbols, positions, bonds) for an RDKit Mol or a vendored chem.Mol.

    Without RDKit there is no ETKDG conformer generator, so coordinates come
    from a force-directed embedding of the bond graph (scaled so the mean
    bond length is ~1.5 A) — honest geometry for depiction purposes.
    """
    symbols = [a.GetSymbol() for a in mol.GetAtoms()]
    bonds = [(b.GetBeginAtomIdx(), b.GetEndAtomIdx(),
              float(b.GetBondTypeAsDouble())) for b in mol.GetBonds()]
    n = len(symbols)
    if hasattr(mol, "GetNumConformers") and callable(
            getattr(mol, "GetConformer", None)) and mol.GetNumConformers():
        pts = np.asarray(mol.GetConformer().GetPositions(), dtype=float)
        if pts.shape[1] < dim:
            pts = np.pad(pts, ((0, 0), (0, dim - pts.shape[1])))
        return symbols, pts[:, :dim], bonds
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from([(i, j) for i, j, _ in bonds])
    pos = nx.spring_layout(G, dim=dim, seed=0)
    pts = np.array([pos[i] for i in range(n)], dtype=float)
    if bonds:
        lengths = [np.linalg.norm(pts[i] - pts[j]) for i, j, _ in bonds]
        mean_len = float(np.mean(lengths)) or 1.0
        pts *= 1.5 / mean_len
    return symbols, pts, bonds


def _draw_mol3d(ax, symbols, pts, bonds) -> None:
    for i, j, order in bonds:
        lw = 1.5 + 1.5 * (order - 1)
        ax.plot(*zip(pts[i], pts[j]), color="#777777", linewidth=lw)
    sizes = [350 * ATOMIC_RADII.get(s, 1.0) for s in symbols]
    colors = [CPK_COLORS.get(s, "gray") for s in symbols]
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=sizes, c=colors,
               edgecolors="black", linewidths=0.5, depthshade=True)
    ax.set_axis_off()
    span = np.abs(pts).max() or 1.0
    ax.set_xlim(-span, span)
    ax.set_ylim(-span, span)
    ax.set_zlim(-span, span)


def plot_3D_molecule(mol, title: str = "mol_3d",
                     save_dir: Optional[str] = None):
    """3D molecule figure.  Parity: plot.py:334-604 (plotly there; native
    matplotlib-3D here — same CPK colors / radii / bond sticks, no plotly
    dependency)."""
    symbols, pts, bonds = _mol_geometry(mol, dim=3)
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(projection="3d")
    _draw_mol3d(ax, symbols, pts, bonds)
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        fig.savefig(os.path.join(save_dir, f"{title}.png"), dpi=120,
                    bbox_inches="tight")
    return fig


def rotate_molecule_animation(
    mol,
    filedir: str,
    filename: str = "mol_3d.gif",
    frames: int = 30,
    duration: float = 1.0,
    rotations_per_sec: float = 1.0,
) -> Optional[str]:
    """Rotating-camera GIF of a molecule.  (plot.py:566-604 /
    sampler.py:959-975)"""
    try:
        import imageio.v2 as imageio
    except ImportError:
        return None
    symbols, pts, bonds = _mol_geometry(mol, dim=3)
    os.makedirs(filedir, exist_ok=True)
    imgs = []
    total_deg = 360.0 * rotations_per_sec * duration
    for k in range(frames):
        fig = plt.figure(figsize=(3, 3))
        ax = fig.add_subplot(projection="3d")
        _draw_mol3d(ax, symbols, pts, bonds)
        ax.view_init(elev=20.0, azim=total_deg * k / frames)
        fig.canvas.draw()
        imgs.append(np.asarray(fig.canvas.buffer_rgba())[..., :3])
        plt.close(fig)
    out = os.path.join(filedir, filename)
    imageio.mimsave(out, imgs, fps=max(1, int(frames / duration)))
    return out


def plot_molecule_list(mols, title: str = "molecules", max_num: int = 16,
                       save_dir: Optional[str] = None) -> Optional[str]:
    """2D molecule grid — native depiction (spring-layout skeleton, CPK
    atom discs, bond-order parallel strokes).  Parity: plot.py:117-305 /
    sampler.py:935-945 (RDKit Draw there; this works with either backend)."""
    n = min(max_num, len(mols))
    if n == 0:
        return None
    rows = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(rows, rows, figsize=(3 * rows, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes:
        ax.axis("off")
    for m in range(n):
        symbols, pts, bonds = _mol_geometry(mols[m], dim=2)
        ax = axes[m]
        for i, j, order in bonds:
            p, q = pts[i], pts[j]
            d = q - p
            norm = np.linalg.norm(d) or 1.0
            perp = np.array([-d[1], d[0]]) / norm * 0.06
            k = int(round(order))
            offsets = [(s - (k - 1) / 2.0) * perp for s in range(max(k, 1))]
            for off in offsets:
                ax.plot([p[0] + off[0], q[0] + off[0]],
                        [p[1] + off[1], q[1] + off[1]],
                        color="#555555", linewidth=1.4, zorder=1)
        for idx, s in enumerate(symbols):
            ax.scatter(*pts[idx], s=260 * ATOMIC_RADII.get(s, 1.0),
                       c=CPK_COLORS.get(s, "gray"), edgecolors="black",
                       linewidths=0.5, zorder=2)
            if s != "C":
                ax.annotate(s, pts[idx], ha="center", va="center",
                            fontsize=7, color="white", zorder=3)
        ax.set_aspect("equal")
    fig.suptitle(title)
    out = None
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"{title}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
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
