"""Measured-variant registry (``TUNING.json`` at the repo root).

Several hot paths carry more than one parity-proven implementation whose
relative speed can only be settled by a compiled TPU slope measurement
(descent diag-gather vs MXU-transpose pack, patches row-block size,
banded vs iterated chamfer). The measurement and the official capture
often happen in different processes hours apart — the dev tunnel can be
down in between — so experiment scripts RECORD their winner here and the
production paths consult it at trace time. The driver's end-of-round
``bench.py`` then runs the tuned configuration automatically, even when
nobody is online between the experiment and the capture.

Precedence per key: ``ROVINA_<KEY>`` environment variable > TUNING.json
entry > the caller's coded default. Values are plain JSON scalars;
``record`` keeps a per-key ``evidence`` blob (measured ms, date, script)
so a recorded winner is auditable.

The file is read once per process (the consumers are jit-static choices;
mid-process changes couldn't retrace anyway) and written atomically.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional

_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "TUNING.json",
)
_cache: Optional[Dict[str, Any]] = None


def _load() -> Dict[str, Any]:
    global _cache
    if _cache is None:
        try:
            with open(_PATH) as f:
                _cache = json.load(f)
        except (OSError, ValueError):
            _cache = {}
    return _cache


def _coerce(raw: str, like: Any) -> Any:
    if isinstance(like, bool):
        return raw not in ("0", "false", "False", "")
    if isinstance(like, int):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    return raw


def get(key: str, default: Any) -> Any:
    """Resolved value for ``key`` (env > TUNING.json > default)."""
    env = os.environ.get("ROVINA_" + key.upper())
    if env is not None:
        return _coerce(env, default)
    entry = _load().get(key)
    if isinstance(entry, dict) and "value" in entry:
        return entry["value"]
    if entry is not None:
        return entry
    return default


def record(key: str, value: Any, evidence: Optional[Dict[str, Any]] = None) -> None:
    """Persist a measured winner (atomic write; refreshes the cache)."""
    global _cache
    data = dict(_load())
    data[key] = {"value": value, "evidence": evidence or {}}
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(_PATH), prefix=".tuning-", suffix=".json"
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, _PATH)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    _cache = data


def snapshot() -> Dict[str, Any]:
    """The resolved {key: value} view (for bench provenance fields)."""
    out = {}
    for key, entry in _load().items():
        out[key] = entry["value"] if isinstance(entry, dict) and "value" in entry else entry
    return out
