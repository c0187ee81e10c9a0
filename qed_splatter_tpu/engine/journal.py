"""Crash-witness journal: which executable configuration was in flight.

Round-3/4 root cause: the growth memory gate (compile-before-commit) checks
XLA's *predicted* peak, but what actually killed the TPU worker was never
the probed executable — it was a later, never-probed one (the 1080p run
died right after a ``max_per_tile 512 -> 1024 at 1/1 res`` switch: a brand
new executable the capacity gate never saw). Prediction cannot cover every
(capacity, resolution bucket, K) combination the adaptive schedule visits,
so the framework stops trusting prediction and starts *witnessing*
execution: before the FIRST dispatch of any new executable configuration
the trainer appends an ``attempt`` record; after that dispatch completes a
matching ``ok``. A worker kill leaves an unmatched attempt — on restart
(see ``Trainer._apply_crash_policy`` and the ``qed train --supervise``
loop) the crashed configuration is refused *by evidence*, not projection:
a crashed capacity growth is never re-attempted; a crashed K growth caps
that resolution bucket's K below the killing value.

The nerfstudio/gsplat reference never needs this (its CUDA allocator OOMs
recoverably, SURVEY D8); on the tunneled TPU an OOM kills the worker and
every device buffer with it, so crash-only information MUST live on disk.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional


def _key_of(rec: Dict) -> tuple:
    return tuple(sorted(
        (k, v) for k, v in rec.items() if k not in ("event",)
    ))


class AttemptJournal:
    """Append-only jsonl of (attempt, ok) pairs, fsync'd per record."""

    def __init__(self, path) -> None:
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def _append(self, rec: Dict) -> None:
        import os

        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            os.fsync(fh.fileno())  # must survive the process dying NOW

    def attempt(self, **key) -> None:
        self._append({"event": "attempt", **key})

    def ok(self, **key) -> None:
        self._append({"event": "ok", **key})

    def records(self) -> List[Dict]:
        if not self.path.exists():
            return []
        out = []
        for line in self.path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail write from a kill mid-append
        return out

    def crashed(self) -> List[Dict]:
        """All unmatched attempts — one per crash the journal witnessed.

        Unmatched records are deliberately never cleared: a configuration
        that killed the worker once must stay refused across EVERY later
        restart (the startup policy re-applies idempotently), not just the
        first one after the crash.
        """
        pending: Dict[tuple, Dict] = {}
        for rec in self.records():
            k = _key_of(rec)
            if rec.get("event") == "attempt":
                pending[k] = rec
            elif rec.get("event") == "ok":
                pending.pop(k, None)
        return list(pending.values())
