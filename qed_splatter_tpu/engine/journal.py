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
        """All unmatched attempts — one per distinct crashed configuration.

        Unmatched records are deliberately never cleared: the startup
        policy re-reads them idempotently on every restart; whether a
        crashed configuration is refused or granted amnesty is the
        policy's decision (``Trainer._apply_crash_policy``), keyed on the
        crash COUNT (see ``crashed_with_counts``).
        """
        return [rec for rec, _ in self.crashed_with_counts()]

    def crashed_with_counts(self) -> List[tuple]:
        """``[(record, net_crash_count)]`` per distinct configuration.

        net = attempts - oks (floored at 0): a config that was attempted,
        completed, then attempted again and died counts ONE crash. The
        count is the evidence grade the crash policy needs — one crash may
        be a co-tenant stealing the shared chip (round-3 finding), but the
        same configuration dying twice is deterministic-OOM evidence.
        """
        counts: Dict[tuple, int] = {}
        last: Dict[tuple, Dict] = {}
        for rec in self.records():
            k = _key_of(rec)
            if rec.get("event") == "attempt":
                counts[k] = counts.get(k, 0) + 1
                last[k] = rec
            elif rec.get("event") == "ok":
                counts[k] = counts.get(k, 0) - 1
        return [(last[k], c) for k, c in counts.items() if c > 0]
