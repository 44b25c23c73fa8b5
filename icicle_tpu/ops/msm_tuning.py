"""MSM parameter auto-tuning.

Reference analog: the CPU backend picks (c, nof_threads) from decision trees
fitted to measurements per size/precompute/vendor
(backend/cpu/src/curve/cpu_msm.hpp:199-224 + decision_tree_params/*.h).

TPU-native analog: a *measured table* keyed by
(pipeline, curve, logn, precompute_factor) -> {"c": int, "T": int, ...},
persisted as JSON next to the package data and refreshed by
``tools/msm_autotune.py`` sweeps on the target chip. Lookup snaps to the
nearest measured logn (within +-2); with no measurement the callers keep
their closed-form cost models (ops/msm.py:_auto_c, ops/msm_tpu3.py:_plan3),
exactly like the reference's fallback when a tree has no leaf for a size.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_DATA_PATH = os.path.join(os.path.dirname(__file__), "..", "data",
                          "msm_tuning.json")
_ENV_PATH = "ICICLE_TPU_MSM_TUNING"


def _load() -> dict:
    path = os.environ.get(_ENV_PATH, _DATA_PATH)
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"entries": []}


_table: Optional[dict] = None


def _entries():
    global _table
    if _table is None:
        _table = _load()
    return _table["entries"]


def reload() -> None:
    """Re-read the tuning table (after tools/msm_autotune.py writes it)."""
    global _table
    _table = None


def tuned_params(pipeline: str, curve_name: str, n: int,
                 precompute_factor: int = 1) -> Optional[dict]:
    """Best measured params for an MSM of n points, or None.

    pipeline: "v3:u32" | "v3:r12" | "v2" | "xla".
    Snaps to the nearest measured logn within +-2 (same curve/pipeline/nu);
    among candidates at equal distance the higher-throughput entry wins.
    """
    logn = max(1, (n - 1).bit_length())
    best = None
    for e in _entries():
        if (e.get("pipeline") != pipeline or e.get("curve") != curve_name
                or e.get("nu", 1) != precompute_factor):
            continue
        d = abs(e["logn"] - logn)
        if d > 2:
            continue
        key = (d, -e.get("points_per_sec", 0.0))
        if best is None or key < best[0]:
            best = (key, e)
    return dict(best[1]["params"]) if best else None


def tuned_engine(curve_name: str, n: int,
                 precompute_factor: int = 1) -> Optional[str]:
    """Fastest measured v3 in-kernel engine ("u32" | "r12") for this size,
    or None when nothing is measured. Same nearest-logn snapping as
    tuned_params; this is the engine leg of the reference's decision-tree
    choice (cpu_msm.hpp:199-224 picks algorithm variants the same way)."""
    logn = max(1, (n - 1).bit_length())
    best = None
    for e in _entries():
        pipe = e.get("pipeline", "")
        if (not pipe.startswith("v3:") or e.get("curve") != curve_name
                or e.get("nu", 1) != precompute_factor):
            continue
        d = abs(e["logn"] - logn)
        if d > 2:
            continue
        key = (d, -e.get("points_per_sec", 0.0))
        if best is None or key < best[0]:
            best = (key, pipe.split(":", 1)[1])
    return best[1] if best else None


def record(pipeline: str, curve_name: str, logn: int, params: dict,
           points_per_sec: float, precompute_factor: int = 1,
           path: Optional[str] = None) -> None:
    """Append/replace a measured entry and persist (used by the sweep tool).

    Keeps at most one entry per (pipeline, curve, logn, nu): the fastest.
    """
    path = path or os.environ.get(_ENV_PATH, _DATA_PATH)
    try:
        with open(path) as fh:
            table = json.load(fh)
    except (OSError, ValueError):
        table = {"entries": []}
    key = (pipeline, curve_name, logn, precompute_factor)
    kept = []
    for e in table["entries"]:
        ekey = (e.get("pipeline"), e.get("curve"), e.get("logn"),
                e.get("nu", 1))
        if ekey == key and e.get("points_per_sec", 0.0) >= points_per_sec:
            return  # existing measurement is better
        if ekey != key:
            kept.append(e)
    kept.append({"pipeline": pipeline, "curve": curve_name, "logn": logn,
                 "nu": precompute_factor, "params": params,
                 "points_per_sec": points_per_sec})
    kept.sort(key=lambda e: (e["pipeline"], e["curve"], e["logn"],
                             e.get("nu", 1)))
    table["entries"] = kept
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(table, fh, indent=1)
    os.replace(tmp, path)
    reload()
