"""Minimal BIDS entity parser + file index.

Replaces the reference's ``pybids.BIDSLayout`` usage
(``src/data_module.py:63-67``, ``src/eval.py:265-284``) with a dependency-light
filesystem walk: BIDS filenames are ``key-value`` pairs joined by underscores
with a trailing suffix (``sub-X_ses-Y_..._desc-Z_<suffix>.nii.gz``). That is
all the reference ever queries (subject, suffix, desc, scope=derivatives), so
a full pybids dependency is unnecessary; if pybids is installed the behaviour
matches for these queries.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence


def parse_entities(path: str) -> Dict[str, str]:
    """Parse BIDS entities from a filename.

    ``sub-001_ses-01_desc-normtensor_dwi.nii.gz`` →
    ``{'subject': '001', 'session': '01', 'desc': 'normtensor',
       'suffix': 'dwi', 'extension': '.nii.gz'}``
    """
    name = os.path.basename(path)
    ext = ""
    for candidate in (".nii.gz", ".nii", ".json", ".tsv", ".txt"):
        if name.endswith(candidate):
            ext = candidate
            name = name[: -len(candidate)]
            break
    parts = name.split("_")
    ents: Dict[str, str] = {"extension": ext}
    key_map = {"sub": "subject", "ses": "session"}
    for part in parts[:-1]:
        if "-" in part:
            k, v = part.split("-", 1)
            ents[key_map.get(k, k)] = v
    # Last underscore-token without a dash is the suffix.
    if "-" not in parts[-1]:
        ents["suffix"] = parts[-1]
    elif parts[-1]:
        k, v = parts[-1].split("-", 1)
        ents[key_map.get(k, k)] = v
    return ents


class BIDSIndex:
    """Index of one BIDS tree (optionally with a derivatives scope added,
    mirroring ``BIDSLayout(...).add_derivatives(...)``)."""

    def __init__(self, root: str, validate: bool = False):
        self.root = root
        self.files: List[str] = []
        self.scopes: Dict[str, str] = {}  # path -> scope name
        self._walk(root, "raw")

    def _walk(self, root: str, scope: str) -> None:
        for dirpath, dirnames, filenames in os.walk(root):
            # Don't descend into derivatives from the raw walk.
            if scope == "raw" and "derivatives" in dirnames:
                dirnames.remove("derivatives")
            for fn in sorted(filenames):
                if fn.endswith(".nii.gz") or fn.endswith(".nii"):
                    p = os.path.join(dirpath, fn)
                    self.files.append(p)
                    self.scopes[p] = scope

    def add_derivatives(self, deriv_dir: str) -> None:
        scope = os.path.basename(deriv_dir.rstrip("/"))
        self._walk(deriv_dir, scope)

    def get_subjects(self) -> List[str]:
        subs = set()
        for p in self.files:
            ents = parse_entities(p)
            if "subject" in ents:
                subs.add(ents["subject"])
        return sorted(subs)

    def get(
        self,
        scope: Optional[str] = None,
        subject: Optional[str] = None,
        suffix: Optional[str] = None,
        desc: Optional[str] = None,
        extension: Optional[str] = None,
    ) -> List[str]:
        out = []
        for p in self.files:
            if scope is not None and self.scopes.get(p) != scope:
                continue
            ents = parse_entities(p)
            if subject is not None and ents.get("subject") != subject:
                continue
            if suffix is not None and ents.get("suffix") != suffix:
                continue
            if desc is not None and ents.get("desc") != desc:
                continue
            if extension is not None and not p.endswith(extension):
                continue
            out.append(p)
        return sorted(out)


def subject_split(
    subjects: Sequence[str],
    val_split: float,
    test_split: float,
    seed: int,
):
    """Seeded subject-level 80/10/10 split (reference
    ``src/data_module.py:70-75``; torch ``random_split`` over subject ids).

    Uses a seeded permutation; the exact permutation differs from torch's
    Mersenne-backed one, but determinism and subject-level separation match.
    Fractional lengths follow torch semantics: floor each split, distribute
    the remainder round-robin starting at the first split.
    """
    import numpy as np

    n = len(subjects)
    fracs = [1.0 - val_split - test_split, val_split, test_split]
    lengths = [int(np.floor(n * f)) for f in fracs]
    rem = n - sum(lengths)
    for i in range(rem):
        lengths[i % 3] += 1
    perm = np.random.default_rng(seed).permutation(n)
    subjects = list(subjects)
    out, start = [], 0
    for ln in lengths:
        out.append([subjects[i] for i in perm[start : start + ln]])
        start += ln
    return out[0], out[1], out[2]
