"""Checkpoint / resume via orbax (replaces HF Trainer save_steps /
save_total_limit / ``save_model(path + "/final")`` machinery — SURVEY.md §5).

Layout: ``<dir>/<step>/`` orbax pytree checkpoints with a retention limit,
plus ``<dir>/final/`` for the end-of-run export the reference's federated
round-robin filesystem layout expects (``<out>_client{id}_round{r}/final``).
Metadata (stage, round, client) rides in a sidecar JSON.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_numpy(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str, save_total_limit: int = 2):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_total_limit = save_total_limit
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, tree: Any, step: int, metadata: dict | None = None,
             name: str | None = None) -> Path:
        path = self.dir / (name if name is not None else f"checkpoint-{step}")
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.absolute(), _as_numpy(tree))
        if metadata is not None:
            (path / "metadata.json").write_text(json.dumps({"step": step, **metadata}))
        if name is None:
            self._prune()
        return path

    def save_final(self, tree: Any, metadata: dict | None = None) -> Path:
        """The reference's ``trainer.save_model(path + "/final")``."""
        return self.save(tree, step=-1, metadata=metadata, name="final")

    def restore(self, name_or_step: str | int, template: Any = None) -> Any:
        """``template``: a pytree with the target structure (e.g. a live
        train state) — needed to restore optax NamedTuple states, which
        orbax otherwise returns as plain dicts."""
        name = (f"checkpoint-{name_or_step}"
                if isinstance(name_or_step, int) else name_or_step)
        path = (self.dir / name).absolute()
        if template is None:
            return self._ckpt.restore(path)
        return self._ckpt.restore(path, item=jax.tree.map(np.asarray, template))

    def latest_step(self) -> int | None:
        steps = sorted(
            int(p.name.split("-")[1])
            for p in self.dir.glob("checkpoint-*") if p.name.split("-")[1].isdigit()
        )
        return steps[-1] if steps else None

    def _prune(self) -> None:
        cks = sorted(
            (p for p in self.dir.glob("checkpoint-*") if p.name.split("-")[1].isdigit()),
            key=lambda p: int(p.name.split("-")[1]),
        )
        for p in cks[: max(0, len(cks) - self.save_total_limit)]:
            shutil.rmtree(p)


def save_params(path: str, params: Any, metadata: dict | None = None) -> None:
    """One-shot params export (the FL engine's weight hand-off format)."""
    ckpt = ocp.PyTreeCheckpointer()
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
    ckpt.save(p.absolute(), _as_numpy(params))
    if metadata:
        (p / "metadata.json").write_text(json.dumps(metadata))


def load_params(path: str) -> Any:
    return ocp.PyTreeCheckpointer().restore(Path(path).absolute())
