"""Helpers for importing the read-only PyTorch reference under stub modules.

The reference at /root/reference imports rdkit / easydict / toponetx at
module import time; none are installed here.  For activation-parity tests we
only need its *model* forward passes on torch CPU, so we install minimal
stub modules before importing it.  (The reference is used strictly as a
numerical oracle; no code is copied from it.)
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_reference(path: str = REFERENCE_ROOT) -> bool:
    """Make `ccsd.src.models.*` importable.  Returns False if unavailable."""
    import os

    if not os.path.isdir(path):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False

    # rdkit stub: graph_utils/mol_utils do `from rdkit import Chem, RDLogger`
    class _RDLogger:
        @staticmethod
        def DisableLog(*a, **k):
            pass

    class _BondType:
        ZERO, SINGLE, AROMATIC, DOUBLE, TWOANDAHALF = 0, 1, 12, 2, 2.5
        TRIPLE, THREEANDAHALF, QUADRUPLE, FOURANDAHALF = 3, 3.5, 4, 4.5
        QUINTUPLE, FIVEANDAHALF = 5, 5.5

    class _rdchem:
        BondType = _BondType

    class _Chem:
        rdchem = _rdchem

        class Mol:  # referenced in type annotations only at import time
            pass

        class RWMol:
            pass

        class Atom:
            pass

        BondType = _BondType

    # __ccsd_stub__ marks this as NOT a real RDKit: the stub outlives the
    # parity test in sys.modules, and mol_utils.has_rdkit() must keep
    # dispatching to the vendored chem backend afterwards.
    _stub("rdkit", Chem=_Chem, RDLogger=_RDLogger, __ccsd_stub__=True)
    _stub("rdkit.Chem", Mol=_Chem.Mol, RWMol=_Chem.RWMol, Atom=_Chem.Atom,
          BondType=_BondType, rdchem=_rdchem, __ccsd_stub__=True)

    # native-dep stubs used only through call paths parity tests never hit
    for missing, attrs in (("pyemd", {"emd": lambda *a, **k: 0.0}),
                           ("dill", {}), ("joblib", {})):
        try:
            __import__(missing)
        except ImportError:
            _stub(missing, **attrs)

    # easydict stub backed by our AttrDict
    from ccsd_tpu.utils.config import AttrDict

    _stub("easydict", EasyDict=AttrDict)

    # toponetx stub backed by our CombinatorialComplex
    from ccsd_tpu.data.complex import CombinatorialComplex

    _stub("toponetx")
    _stub("toponetx.classes")
    _stub("toponetx.classes.combinatorial_complex",
          CombinatorialComplex=CombinatorialComplex)

    if path not in sys.path:
        sys.path.insert(0, path)
    return True
