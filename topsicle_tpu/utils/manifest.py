"""Restartable-run manifest.

The reference's de-facto resume story: the CSV is appended in real time
under a lock (partial results survive a kill, README.md:155) and the
step-1 subset FASTQ is reused on rerun (main.py:65-66).  Both behaviors
are kept; on top of them the manifest records each completed
(input file, telophrase) unit so an interrupted multi-file / multi-k run
can restart at file granularity instead of recomputing everything
(SURVEY.md §5 "restartable at batch granularity").
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple


class RunManifest:
    FILENAME = ".topsicle_manifest.json"

    def __init__(self, output_dir: str):
        self.path = os.path.join(output_dir, self.FILENAME)
        self._done: Dict[str, int] = {}
        if os.path.exists(self.path):
            try:
                with open(self.path) as fh:
                    data = json.load(fh)
                self._done = dict(data.get("completed", {}))
            except (json.JSONDecodeError, OSError):
                self._done = {}

    @staticmethod
    def _key(path: str, phrase: int) -> str:
        return f"{os.path.abspath(path)}::{phrase}"

    def is_done(self, path: str, phrase: int) -> bool:
        return self._key(path, phrase) in self._done

    def rows_for(self, path: str, phrase: int) -> Optional[int]:
        return self._done.get(self._key(path, phrase))

    def mark_done(self, path: str, phrase: int, n_rows: int) -> None:
        self._done[self._key(path, phrase)] = int(n_rows)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"completed": self._done}, fh, indent=0)
        os.replace(tmp, self.path)

    def reset(self) -> None:
        self._done = {}
        if os.path.exists(self.path):
            os.remove(self.path)
