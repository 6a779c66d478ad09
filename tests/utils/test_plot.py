"""Figure-parity surfaces: diffusion GIFs, molecule grids, 3D figures.

Reference counterparts: ccsd/src/utils/plot.py:334-763 (plot_3D_molecule,
rotate_molecule_animation, diffusion_animation incl. the cropped variant)
and sampler.py:305-360 / 935-1000 (where they are emitted per run).
"""

import os

import networkx as nx
import numpy as np

from ccsd_tpu.chem import mol_from_nx
from ccsd_tpu.utils.plot import (
    diffusion_animation,
    plot_3D_molecule,
    plot_molecule_list,
    rotate_molecule_animation,
)


def _ethanol():
    g = nx.Graph()
    for i, sym in enumerate(["C", "C", "O"]):
        g.add_node(i, label=sym)
    g.add_edge(0, 1, label=1)
    g.add_edge(1, 2, label=1)
    return mol_from_nx(g)


def _trajectory(T=60, N=8, active=4):
    """Noisy (T, N, N) trajectory converging to a path on `active` nodes."""
    rng = np.random.default_rng(0)
    final = np.zeros((N, N))
    for i in range(active - 1):
        final[i, i + 1] = final[i + 1, i] = 1.0
    traj = np.empty((T, N, N))
    for t in range(T):
        w = t / (T - 1)
        noise = rng.uniform(0, 0.4, (N, N))
        noise = (noise + noise.T) / 2
        traj[t] = w * final + (1 - w) * noise
    return traj


def test_diffusion_animation_full_and_cropped(tmp_path):
    traj = _trajectory()
    full = diffusion_animation(traj, str(tmp_path), name="diff", every=20)
    crop = diffusion_animation(traj, str(tmp_path), name="diff_cropped",
                               every=20, cropped=True)
    for out in (full, crop):
        assert out is not None and os.path.exists(out)
        assert os.path.getsize(out) > 500
    # cropped frames cover fewer pixels of graph => typically smaller file,
    # but at minimum both are valid GIF containers
    with open(crop, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def test_plot_3d_molecule_and_rotation(tmp_path):
    mol = _ethanol()
    fig = plot_3D_molecule(mol, save_dir=str(tmp_path), title="eth3d")
    assert fig is not None
    assert os.path.exists(os.path.join(str(tmp_path), "eth3d.png"))
    out = rotate_molecule_animation(mol, str(tmp_path), filename="eth.gif",
                                    frames=4, duration=0.5)
    assert out is not None and os.path.getsize(out) > 500


def test_plot_molecule_list(tmp_path):
    mols = [_ethanol() for _ in range(3)]
    out = plot_molecule_list(mols, title="mols", save_dir=str(tmp_path))
    assert out is not None and os.path.exists(out)
    assert os.path.getsize(out) > 1000
