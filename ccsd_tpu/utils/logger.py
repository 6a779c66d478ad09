"""File + stdout logger and experiment directory layout.

Parity target: ccsd/src/utils/logger.py:18-281 (append-to-file logger with
the logs_train|logs_sample/<dataset>/<name>/ layout and checkpoints/<data>).
"""

from __future__ import annotations

import os
import time
from typing import Optional


class Logger:
    def __init__(self, file_path: Optional[str] = None, verbose: bool = True):
        self.file_path = file_path
        self.verbose = verbose
        if file_path:
            os.makedirs(os.path.dirname(file_path), exist_ok=True)

    def log(self, msg: str, verbose: Optional[bool] = None) -> None:
        if self.file_path:
            with open(self.file_path, "a") as f:
                f.write(msg + "\n")
        if self.verbose if verbose is None else verbose:
            print(msg)


def run_id(timezone: Optional[str] = None) -> str:
    """Timestamp run identifier.  Parity: time_utils.py:12-24."""
    return time.strftime("%b%d-%H-%M-%S")


def set_log(config, is_train: bool = True):
    """Create log/checkpoint dirs, return (folder_name, log_name, ckpt_name).

    Parity: logger.py:68-98.
    """
    data = str(config.data.data)
    exp_name = str(config.train.name)
    ts = run_id()
    config_name = str(config.get("config_name", "config"))
    log_name = f"{config_name}_{ts}"
    root = config.get("folder", "./")
    kind = "logs_train" if is_train else "logs_sample"
    folder = os.path.join(root, kind, data, exp_name)
    os.makedirs(folder, exist_ok=True)
    os.makedirs(os.path.join(root, "checkpoints", data), exist_ok=True)
    return folder, log_name, f"{exp_name}_{ts}"


def check_log(config, is_train: bool = True) -> bool:
    data = str(config.data.data)
    exp_name = str(config.train.name)
    kind = "logs_train" if is_train else "logs_sample"
    return os.path.isdir(
        os.path.join(config.get("folder", "./"), kind, data, exp_name)
    )
