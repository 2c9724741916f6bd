"""TinyDB-compatible JSON manifests (no tinydb dependency).

The reference stores dataset manifests as TinyDB JSON files
(``dataset_loader/image_dataset.py:20-21``, ``generate_fmap_dataset.py:
68-73``).  The on-disk layout is::

    {"_default": {"1": {...row...}, "2": {...row...}, ...}}

This module reads/writes that exact layout so datasets are interchangeable
with the reference pipeline in both directions.
"""

import json
import os


class Manifest:
    """Read/write a TinyDB-format JSON manifest."""

    TABLE = "_default"

    def __init__(self, path, load=True):
        self.path = str(path)
        if load and os.path.exists(self.path):
            with open(self.path, "r") as f:
                raw = json.load(f)
            table = raw.get(self.TABLE, {})
            # TinyDB doc ids are 1-based stringified ints; keep their order.
            self.rows = [table[k] for k in
                         sorted(table.keys(), key=lambda s: int(s))]
        else:
            self.rows = []

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, index):
        return self.rows[index]

    def insert_multiple(self, rows):
        self.rows.extend(rows)

    def save(self, path=None):
        path = str(path or self.path)
        table = {str(i + 1): row for i, row in enumerate(self.rows)}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({self.TABLE: table}, f)
        os.replace(tmp, path)
        return path


def write_manifest(path, rows):
    """Write rows to path, replacing any existing manifest (load=False:
    the old ``Manifest(os.devnull)`` dodge json-decoded /dev/null and
    crashed the first time a manifest was ever overwritten)."""
    m = Manifest(path, load=False)
    m.rows = list(rows)
    return m.save()
