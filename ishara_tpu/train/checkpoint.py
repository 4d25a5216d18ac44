"""Checkpoint save/restore.

The reference writes best/periodic/final torch state dicts but has **no
restore path** (SURVEY.md §5 Checkpoint/resume). Here: full round-trip of
params / slow_params / batch_stats / opt_state / step via orbax, with a
preemption-safe default policy (keep best + latest) and deterministic resume.
"""

from __future__ import annotations

import json
from pathlib import Path
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with best/latest retention and metadata sidecar."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
            ),
        )
        # best checkpoints live in their own manager so the recency-only
        # retention of the main chain can never garbage-collect them
        self._best_mgr = ocp.CheckpointManager(
            self.directory / "best",
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        self._meta_path = self.directory / "meta.json"

    @staticmethod
    def _payload(state):
        return {
            "params": state.params,
            "slow_params": state.slow_params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    @staticmethod
    def _jsonable(v):
        if isinstance(v, (bool, int, str)) or v is None:
            return v
        return float(v)

    def save(self, step: int, state, metrics: dict | None = None,
             wait: bool = False, best: bool = False) -> None:
        """``best=True`` additionally writes to the protected best chain
        (metric-bearing saves from the Trainer's val-improvement path).
        ``metrics`` lands in the meta.json sidecar — the Trainer stores
        resume bookkeeping there too (``completed_epochs``, ``best_score``),
        which :meth:`step_meta` hands back on restore."""
        self._mgr.save(step, args=ocp.args.StandardSave(self._payload(state)))
        if best:
            self._best_mgr.save(
                step, args=ocp.args.StandardSave(self._payload(state)))
        if metrics is not None:
            meta = self.read_meta()
            entry = meta.get(str(step), {})
            entry.update({k: self._jsonable(v) for k, v in metrics.items()})
            meta[str(step)] = entry
            self._meta_path.write_text(json.dumps(meta, indent=2))
        if wait:
            self._mgr.wait_until_finished()
            self._best_mgr.wait_until_finished()

    def step_meta(self, step: int) -> dict:
        """The meta.json sidecar entry for ``step`` ({} if none)."""
        return self.read_meta().get(str(step), {})

    def restore(self, state, step: int | None = None, best: bool = False):
        """Restore into the structure of ``state`` (same model/optimizer).
        ``best=True`` reads the protected best chain."""
        mgr = self._best_mgr if best else self._mgr
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(self._payload(state))
        )
        return state.replace(**restored)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self, metric: str = "val_score", mode: str = "max") -> int | None:
        meta = self.read_meta()
        entries = [(int(s), m.get(metric)) for s, m in meta.items()
                   if m.get(metric) is not None]
        if not entries:
            return None
        sign = 1 if mode == "max" else -1
        return max(entries, key=lambda kv: sign * kv[1])[0]

    def read_meta(self) -> dict:
        if self._meta_path.exists():
            return json.loads(self._meta_path.read_text())
        return {}

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
        self._best_mgr.wait_until_finished()
        self._best_mgr.close()
