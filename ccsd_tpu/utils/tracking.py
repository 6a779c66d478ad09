"""Optional experiment tracking (wandb) behind a uniform no-op interface.

Parity target: the reference's wandb usage (main.py:63-74,
trainer.py:247-256, sampler.py:296-301).  wandb is not installed in this
environment; the tracker degrades to a silent no-op so training code can
call it unconditionally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class Tracker:
    def __init__(self, general_config=None, run_name: str = "run",
                 config: Optional[Dict[str, Any]] = None):
        self._run = None
        use = bool(general_config and general_config.get("use_wandb", False))
        if use:
            try:
                import wandb

                self._run = wandb.init(
                    project=general_config.get("project_name", "CCSD"),
                    entity=general_config.get("entity") or None,
                    name=run_name,
                    config=config or {},
                )
            except Exception:
                self._run = None

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, data: Dict[str, Any], step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(data, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
            self._run = None
