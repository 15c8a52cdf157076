"""Checkpoint / resume via orbax (replaces HF Trainer save_steps /
save_total_limit / ``save_model(path + "/final")`` machinery — SURVEY.md §5).

Layout: ``<dir>/<step>/`` orbax pytree checkpoints with a retention limit,
plus ``<dir>/final/`` for the end-of-run export the reference's federated
round-robin filesystem layout expects (``<out>_client{id}_round{r}/final``).
Metadata (stage, round, client) rides in a sidecar JSON.

Saves are ASYNC: ``save`` snapshots the tree to host memory and returns
while orbax commits to disk on a background thread, so checkpoint IO
overlaps the next training steps. Metadata writes and retention pruning are
deferred until the commit finalizes (the checkpoint directory only appears
atomically at commit); any read API flushes pending work first.
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
        # StandardCheckpointer is an AsyncCheckpointer: save() returns after
        # the host snapshot; the disk commit runs on a background thread.
        self._ckpt = ocp.StandardCheckpointer()
        self._pending: list[tuple[Path, dict | None, bool]] = []

    def save(self, tree: Any, step: int, metadata: dict | None = None,
             name: str | None = None) -> Path:
        path = self.dir / (name if name is not None else f"checkpoint-{step}")
        self.wait_until_finished()  # one outstanding save at a time
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.absolute(), _as_numpy(tree))
        md = {"step": step, **metadata} if metadata is not None else None
        self._pending.append((path, md, name is None))
        return path

    def save_final(self, tree: Any, metadata: dict | None = None) -> Path:
        """The reference's ``trainer.save_model(path + "/final")``.

        Synchronous: callers read the export right after training returns.
        """
        path = self.save(tree, step=-1, metadata=metadata, name="final")
        self.wait_until_finished()
        return path

    def wait_until_finished(self) -> None:
        """Block until the in-flight save (if any) is durable on disk, then
        run its deferred metadata write and retention pruning."""
        self._ckpt.wait_until_finished()
        for path, md, prune in self._pending:
            if md is not None:
                (path / "metadata.json").write_text(json.dumps(md))
            if prune:
                self._prune()
        self._pending.clear()

    def restore(self, name_or_step: str | int, template: Any = None) -> Any:
        """``template``: a pytree with the target structure (e.g. a live
        train state) — needed to restore optax NamedTuple states, which
        orbax otherwise returns as plain dicts."""
        self.wait_until_finished()
        name = (f"checkpoint-{name_or_step}"
                if isinstance(name_or_step, int) else name_or_step)
        path = (self.dir / name).absolute()
        if template is None:
            return self._ckpt.restore(path)
        return self._ckpt.restore(path, jax.tree.map(np.asarray, template))

    def latest_step(self) -> int | None:
        self.wait_until_finished()
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
    """One-shot params export (the FL engine's weight hand-off format).

    Synchronous — the export must be durable when this returns.
    """
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(p.absolute(), _as_numpy(params))
    if metadata:
        (p / "metadata.json").write_text(json.dumps(metadata))


def load_params(path: str, template: Any = None) -> Any:
    """``template``: target-structure pytree (needed for optax NamedTuple
    states, which orbax otherwise returns as plain dicts)."""
    with ocp.StandardCheckpointer() as ckpt:
        if template is None:
            return ckpt.restore(Path(path).absolute())
        return ckpt.restore(Path(path).absolute(), _as_numpy(template))
