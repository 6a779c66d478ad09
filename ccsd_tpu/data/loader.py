"""Dataset loading: pickles -> padded dense numpy batches.

Replaces the torch DataLoader pipeline of ccsd/src/utils/data_loader.py with
a host-side numpy batcher feeding jnp arrays (device placement is left to
the trainer, which shards batches with NamedSharding).

Also provides a compatibility unpickler so the reference's TopoNetX CC
pickles (/root/reference/data/*_CC.pkl) load into our own
CombinatorialComplex without TopoNetX installed.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Iterator, List, Optional, Sequence, Tuple

import networkx as nx
import numpy as np

from ccsd_tpu.data.cc_codec import ccs_to_tensors, graphs_to_tensor
from ccsd_tpu.data.complex import CombinatorialComplex


# ------------------------------------------------- toponetx pickle compat ---

class _ShimObj:
    """Attribute bag standing in for TopoNetX view/complex classes."""


_SHIM_CLASSES = {
    ("toponetx.classes.combinatorial_complex", "CombinatorialComplex"),
    ("toponetx.classes.reportviews", "HyperEdgeView"),
    ("toponetx.classes.reportviews", "SimplexView"),
    ("toponetx.classes.simplicial_complex", "SimplicialComplex"),
    ("toponetx.classes.simplex", "Simplex"),
    ("toponetx.classes.hyperedge", "HyperEdge"),
}


class _TopoNetXUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _SHIM_CLASSES or module.startswith("toponetx"):
            return type(name, (_ShimObj,), {})
        return super().find_class(module, name)


def _adapt_cc(obj) -> CombinatorialComplex:
    """Shimmed TopoNetX CC instance -> our CombinatorialComplex."""
    hyperedge_dict = obj._complex_set.hyperedge_dict
    cc = CombinatorialComplex()
    for rank in sorted(hyperedge_dict):
        for cell, attr in hyperedge_dict[rank].items():
            members = frozenset(cell)
            cc.add_cell(members, rank=rank, **dict(attr))
    return cc


def load_dataset(data_dir: str = "data", file_name: str = ""):
    """Load a pickled dataset (graphs, or CCs possibly pickled by TopoNetX).

    When the workdir copy is absent, falls back to $CCSD_REF_DATA (default
    the read-only reference data tree) — same contract as the checkpoint
    fallback in sampling.sampler, so bare clones run against any reference
    checkout without symlinks.
    """
    path = os.path.join(data_dir, file_name) + ".pkl"
    if not os.path.exists(path):
        ref = os.path.join(
            os.environ.get("CCSD_REF_DATA", "/root/reference/data"),
            file_name + ".pkl",
        )
        if os.path.exists(ref):
            path = ref
    with open(path, "rb") as f:
        data = f.read()
    obj_list = _TopoNetXUnpickler(io.BytesIO(data)).load()
    if obj_list and isinstance(obj_list[0], _ShimObj):
        obj_list = [_adapt_cc(o) for o in obj_list]
    return obj_list


def save_dataset(data_dir: str, obj, save_name: str, save_txt: bool = True) -> None:
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, save_name)
    with open(path + ".pkl", "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    if save_txt:
        with open(path + ".txt", "w") as f:
            f.write(save_name + "\n")
            f.write(str(len(obj)))


# ----------------------------------------------------------- feature init ---

def init_features(init: str, adjs: np.ndarray, nfeat: int = 10) -> np.ndarray:
    """Initial node features (zeros / ones / degree one-hot).

    Parity: graph_utils.py:80-124.
    """
    B, N = adjs.shape[0], adjs.shape[1]
    flags = (np.abs(adjs).sum(-1) > 1e-5).astype(np.float32)
    if init == "zeros":
        feature = np.zeros((B, N, nfeat), dtype=np.float32)
    elif init == "ones":
        feature = np.ones((B, N, nfeat), dtype=np.float32)
    elif init == "deg":
        deg = adjs.sum(-1).astype(np.int64)
        num_classes = nfeat
        if deg.max() >= num_classes:
            if deg.max() == num_classes:  # reference's +1 retry
                num_classes += 1
            else:
                raise ValueError(
                    f"Max degree ({deg.max()}) and number of classes "
                    f"({nfeat}) mismatch"
                )
        feature = np.eye(num_classes, dtype=np.float32)[deg][..., :]
    else:
        raise NotImplementedError(
            f"{init} not implemented. Please select from [zeros, ones, deg]."
        )
    return feature * flags[..., None]


def init_flags(
    obj_list,
    config,
    batch_size: Optional[int] = None,
    is_cc: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Sample node-count flag masks from the training set.

    Parity: cc_utils.py:883-914.
    """
    rng = rng or np.random.default_rng()
    if batch_size is None:
        batch_size = config.data.batch_size
    max_node_num = config.data.max_node_num
    idx = rng.integers(0, len(obj_list), batch_size)
    if not is_cc:
        adjs = graphs_to_tensor([obj_list[i] for i in idx], max_node_num)
        return (np.abs(adjs).sum(-1) > 1e-5).astype(np.float32)
    # CC path: a node is "present" iff it touches an edge (node_flags
    # semantics on |A| row sums) — computed directly from the rank-1 cells,
    # independent of K (the reference materializes the full rank-2 tensor
    # here, cc_utils.py:911)
    flags = np.zeros((batch_size, max_node_num), np.float32)
    for row, i in enumerate(idx):
        for edge in obj_list[i].cells.hyperedge_dict.get(1, {}):
            for v in edge:
                flags[row, v] = 1.0
    return flags


# -------------------------------------------------------------- batching ----

class ArrayDataset:
    """Shuffled minibatch iterator over aligned numpy arrays.

    Multi-host mode (``process_count > 1``): every host constructs the SAME
    global permutation (shared seed) and yields only its contiguous
    1/process_count block of each global batch — the Trainer then assembles
    the global device array with ``jax.make_array_from_process_local_data``
    (parallel/multihost.py), so the global batch is bit-identical to the
    single-process run.  Ragged final batches are dropped in this mode
    (uneven per-host shards cannot form a global array).
    """

    def __init__(self, arrays: Sequence[np.ndarray], batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 process_index: int = 0, process_count: int = 1):
        self.arrays = [np.asarray(a) for a in arrays]
        n = self.arrays[0].shape[0]
        assert all(a.shape[0] == n for a in self.arrays)
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over "
                    f"{process_count} processes"
                )
            drop_last = True
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (self.n // self.batch_size) * self.batch_size if self.drop_last else self.n
        per_host = self.batch_size // self.process_count
        for s in range(0, stop, self.batch_size):
            b = idx[s:s + self.batch_size]
            if self.process_count > 1:
                b = b[self.process_index * per_host:
                      (self.process_index + 1) * per_host]
            yield tuple(a[b] for a in self.arrays)


def _split(n: int, test_split: float) -> Tuple[slice, slice]:
    """Reference split: test = first ceil(test_split * n) items
    (data_loader.py:48-58)."""
    k = int(test_split * n)
    return slice(k, n), slice(0, k)


def _process_info() -> Tuple[int, int]:
    """(process_index, process_count) for host-sharded loading; (0, 1) when
    JAX is not initialized multi-process."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def dataloader(config, get_list: bool = False, seed: int = 0):
    """Generic (non-molecular) graph dataset -> train/test loaders or lists.

    Parity: ccsd/src/utils/data_loader.py:22-117.
    """
    graphs = load_dataset(config.data.dir, config.data.data)
    n = len(graphs)
    tr, te = _split(n, config.data.test_split)
    train_objs, test_objs = graphs[tr], graphs[te]
    if get_list:
        return train_objs, test_objs

    def to_arrays(objs):
        adjs = graphs_to_tensor(objs, config.data.max_node_num)
        x = init_features(config.data.init, adjs, config.data.max_feat_num)
        return x, adjs

    pidx, pcnt = _process_info()
    train = ArrayDataset(to_arrays(train_objs), config.data.batch_size,
                         seed=seed, process_index=pidx, process_count=pcnt)
    test = ArrayDataset(to_arrays(test_objs), config.data.batch_size,
                        seed=seed, process_index=pidx, process_count=pcnt)
    return train, test


def resolve_cc_spec(config, objs=None):
    """ComplexSpec for a CC config; `data.cell_universe: observed` activates
    the active-cell representation (columns = cells seen in the dataset)."""
    from ccsd_tpu.ops.cells import get_spec, observed_cell_universe

    cells = None
    if config.data.get("cell_universe") == "observed":
        if objs is None:
            objs = load_dataset(config.data.dir, config.data.data)
        cells = observed_cell_universe(objs)
    return get_spec(
        config.data.max_node_num, config.data.d_min, config.data.d_max, cells
    )


def dataloader_cc(config, get_list: bool = False, seed: int = 0):
    """CC dataset -> train/test loaders or lists.

    Parity: ccsd/src/utils/data_loader.py:41-117 (cc path), plus the
    active-cell universe option (data.cell_universe: observed).
    """
    ccs = load_dataset(config.data.dir, config.data.data)
    n = len(ccs)
    tr, te = _split(n, config.data.test_split)
    train_objs, test_objs = ccs[tr], ccs[te]
    if get_list:
        return train_objs, test_objs

    spec = None
    if config.data.get("cell_universe") == "observed":
        spec = resolve_cc_spec(config, ccs)

    def to_arrays(objs):
        adjs, rank2 = ccs_to_tensors(
            objs, config.data.max_node_num, config.data.d_min,
            config.data.d_max, spec=spec,
        )
        x = init_features(config.data.init, adjs, config.data.max_feat_num)
        return x, adjs, rank2

    pidx, pcnt = _process_info()
    train = ArrayDataset(to_arrays(train_objs), config.data.batch_size,
                         seed=seed, process_index=pidx, process_count=pcnt)
    test = ArrayDataset(to_arrays(test_objs), config.data.batch_size,
                        seed=seed, process_index=pidx, process_count=pcnt)
    return train, test


def load_data(config, get_list: bool = False, is_cc: bool = False, seed: int = 0):
    """Dispatch molecular vs generic datasets.  Parity: loader.py:187-215."""
    if config.data.data in ["QM9", "ZINC250k"]:
        from ccsd_tpu.data.mol_loader import dataloader_mol, dataloader_mol_cc

        if not is_cc:
            return dataloader_mol(config, get_list)
        return dataloader_mol_cc(config, get_list)
    if not is_cc:
        return dataloader(config, get_list, seed=seed)
    return dataloader_cc(config, get_list, seed=seed)
