"""Training metrics logging (SURVEY §5.5: the reference logs through
Lightning/TensorBoard; this image has no TF, so metrics stream to JSONL —
easily plotted or tailed — with optional stdout echo)."""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 flush_every: int = 1):
        self.path = Path(path) if path else None
        self.echo = echo
        self.flush_every = flush_every
        self._fh = None
        self._count = 0
        self._t0 = time.time()
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        rec.update({
            k: (float(v) if hasattr(v, "item") or isinstance(v, float) else v)
            for k, v in metrics.items()
        })
        line = json.dumps(rec)
        if self.echo:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._count += 1
            if self._count % self.flush_every == 0:
                self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
