"""Structured JSONL metrics.

The reference logs loss/ppl with bare print() (SURVEY.md §5 "Metrics /
logging"); here every record is one JSON line with a wall-clock timestamp,
written by rank 0 only in multi-host runs.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class MetricsWriter:
    def __init__(self, path: Optional[str] = None, also_stdout: bool = True,
                 enabled: bool = True):
        self.enabled = enabled
        self.also_stdout = also_stdout
        self.fh: Optional[IO] = open(path, "a") if (path and enabled) else None

    def write(self, record: dict):
        if not self.enabled:
            return
        record = dict(record, ts=time.time())
        line = json.dumps(record)
        if self.fh is not None:
            self.fh.write(line + "\n")
            self.fh.flush()
        if self.also_stdout:
            print(line, file=sys.stdout, flush=True)

    def close(self):
        if self.fh is not None:
            self.fh.close()
            self.fh = None
