"""Metric logging: JSONL sink + stdout, wandb-compatible surface.

Replaces the reference's hardwired wandb calls (integration.py:21-22,658-672,
760-766) with a local-first logger; if wandb is importable and
``ISHARA_WANDB=1`` is set, metrics mirror there too. Never embeds credentials
(the reference leaked an API key — SURVEY.md header note)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, workdir: str | Path | None = None, name: str = "train",
                 print_every: int = 10):
        self.t0 = time.time()
        self.print_every = print_every
        self._file = None
        if workdir is not None:
            Path(workdir).mkdir(parents=True, exist_ok=True)
            self._file = open(Path(workdir) / f"{name}_metrics.jsonl", "a")
        self._wandb = None
        if os.environ.get("ISHARA_WANDB") == "1":
            try:
                import wandb  # noqa: PLC0415

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=os.environ.get(
                        "ISHARA_WANDB_PROJECT", "ishara-tpu"))
            except Exception:
                self._wandb = None
        # Optional TensorBoard sink (nb4 parity): ISHARA_TENSORBOARD=1
        self._tb = None
        if os.environ.get("ISHARA_TENSORBOARD") == "1" and workdir is not None:
            try:
                from flax.metrics import tensorboard  # noqa: PLC0415

                self._tb = tensorboard.SummaryWriter(
                    str(Path(workdir) / "tb"))
            except Exception:
                self._tb = None
        self._n = 0

    def log(self, metrics: dict, step: int | None = None) -> None:
        rec = {"t": round(time.time() - self.t0, 3), **metrics}
        if step is not None:
            rec["step"] = int(step)
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None and step is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.scalar(k, v, step)
        self._n += 1
        if self._n % self.print_every == 0 or "val_score" in metrics:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
            )
            print(parts, file=sys.stderr, flush=True)

    def log_histograms(self, tree, step: int | None = None,
                       prefix: str = "grad", bins: int = 20) -> None:
        """Per-layer value histograms of a parameter/gradient pytree —
        the reference's ``wandb.watch(model, log_freq=100)`` surface
        (integration.py:672). JSONL gets compact (counts, lo, hi) records;
        wandb gets native Histogram objects; TensorBoard gets histogram
        summaries."""
        import jax
        import numpy as np

        flat = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            v = np.asarray(leaf).ravel()
            if v.size == 0:
                continue
            flat[f"{prefix}/{name}"] = v
        rec: dict = {"t": round(time.time() - self.t0, 3)}
        if step is not None:
            rec["step"] = int(step)
        wb: dict = {}
        for name, v in flat.items():
            finite = v[np.isfinite(v)]
            if finite.size == 0:
                rec[name] = {"nonfinite": int(v.size)}
                continue
            counts, edges = np.histogram(finite, bins=bins)
            rec[name] = {
                "counts": counts.tolist(),
                "lo": float(edges[0]), "hi": float(edges[-1]),
                "norm": float(np.linalg.norm(finite)),
            }
            if self._wandb is not None:
                wb[name] = self._wandb.Histogram(
                    np_histogram=(counts, edges))
            if self._tb is not None and step is not None:
                self._tb.histogram(name, finite, step)
        if self._file is not None:
            self._file.write(json.dumps({"histograms": rec}) + "\n")
            self._file.flush()
        if self._wandb is not None and wb:
            self._wandb.log(wb, step=step)

    def close(self):
        if self._file is not None:
            self._file.close()
