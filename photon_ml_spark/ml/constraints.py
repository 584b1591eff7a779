"""Per-feature box-constraint maps (reference parity:
photon-client/.../io/deprecated/GLMSuite.scala:207-287
``createConstraintFeatureMap`` + ConstraintMapKeys).

The reference accepts a JSON array of
``{"name": ..., "term": ..., "lowerBound": ..., "upperBound": ...}``
maps and resolves it against the feature dictionary into per-index
bounds for the box-constrained optimizer (our LBFGSB path,
``fit_fixed_effect(lower_bounds=..., upper_bounds=...)``). Semantics
reproduced exactly:

- ``name`` and ``term`` are required; bounds default to ±inf but may
  not BOTH be infinite; lower must be < upper.
- ``name="*"`` requires ``term="*"`` (all-feature constraint) and must
  be the only constraint; a wildcard name with a concrete term is
  rejected (GLMSuite.scala:240-243).
- ``term="*"`` applies to every feature whose key starts with
  ``name + SEP``.
- Overlapping constraints (any feature bound twice) raise — flagged on
  first collision, without checking whether the bounds agree, same as
  the reference.
- The intercept is never constrained (the all-wildcard loop skips
  INTERCEPT_KEY).

The dictionary is consumed as a driver-side mapping — the same
contract as the reference's ``featureKeyToIdMap`` driver map; this is
config resolution for the (driver-resident) fixed-effect bound
vectors, not a data-path operation.
"""

from __future__ import annotations

import json
import math

import numpy as np

from photon_ml_spark.datamodel import FEATURE_KEY_SEP, INTERCEPT_KEY

WILDCARD = "*"


def parse_constraint_map(
    constraint_json: str | list,
    dictionary,
    dim: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Resolve a constraint-JSON spec against a feature dictionary.

    ``dictionary``: a DataFrame with (feature_key, feature_index)
    columns, or any iterable of such pairs. Returns
    ``(lower_bounds, upper_bounds)`` dense length-``dim`` arrays
    (±inf where unconstrained) ready for ``fit_fixed_effect``, or
    ``None`` when the spec is empty / matches nothing.
    """
    entries = (
        json.loads(constraint_json)
        if isinstance(constraint_json, str)
        else constraint_json
    )
    if not entries:
        return None

    # ---- phase 1: pure driver-side validation + selector extraction
    # (no dictionary access) -------------------------------------------
    # selectors: (order, kind, value, lb, ub) with kind in
    # {"all", "prefix", "exact"}
    selectors: list[tuple[int, str, str | None, float, float]] = []
    saw_all_wildcard = False
    for order, entry in enumerate(entries):
        if saw_all_wildcard:
            # GLMSuite.scala:240-243: the all-feature wildcard must be
            # the ONLY constraint — even a later entry that resolves to
            # nothing is a spec error, not a silent no-op
            raise ValueError(
                "conflicting constraints: no further constraints may "
                "follow the all-feature wildcard"
            )
        if "name" not in entry or "term" not in entry:
            raise ValueError(
                f"each constraint map must specify name and term: {entry}"
            )
        name, term = entry["name"], entry["term"]
        lb = float(entry.get("lowerBound", -math.inf))
        ub = float(entry.get("upperBound", math.inf))
        if lb == -math.inf and ub == math.inf:
            raise ValueError(
                f"bounds are -inf/+inf for name [{name}] term [{term}] — "
                "an empty constraint"
            )
        if not lb < ub:
            raise ValueError(
                f"lower bound [{lb}] >= upper bound [{ub}] for name "
                f"[{name}] term [{term}]"
            )
        if name == WILDCARD:
            if term != WILDCARD:
                raise ValueError(
                    "wildcard in feature name alone is not supported; a "
                    "wildcard name requires a wildcard term"
                )
            if selectors:
                raise ValueError(
                    "conflicting constraints: the all-feature wildcard "
                    "must be the only constraint"
                )
            selectors.append((order, "all", None, lb, ub))
            saw_all_wildcard = True
        elif term == WILDCARD:
            selectors.append(
                (order, "prefix", name + FEATURE_KEY_SEP, lb, ub)
            )
        else:
            selectors.append(
                (order, "exact", name + FEATURE_KEY_SEP + term, lb, ub)
            )

    # ---- phase 2: resolve selectors against the dictionary -----------
    # matches: (order, what, idx) in entry order, then dictionary order
    if hasattr(dictionary, "collect"):
        matches = _resolve_selectors_spark(selectors, dictionary)
    else:
        matches = _resolve_selectors_iterable(selectors, dictionary)

    lo = np.full(dim, -math.inf)
    hi = np.full(dim, math.inf)
    bound: set[int] = set()
    by_order = {order: (lb, ub) for order, _, _, lb, ub in selectors}
    for order, what, idx in matches:
        if idx in bound:
            # flagged on first collision, without checking whether the
            # bounds agree — GLMSuite parity
            raise ValueError(
                f"conflicting constraints: feature {what} was already "
                "bound and was specified again"
            )
        bound.add(idx)
        lo[idx], hi[idx] = by_order[order]
    if not bound:
        return None
    return lo, hi


def _resolve_selectors_iterable(selectors, dictionary):
    """Selector resolution against an in-memory (key, index) iterable."""
    key_to_idx = {k: int(i) for k, i in dictionary}
    matches: list[tuple[int, str, int]] = []
    for order, kind, value, _, _ in selectors:
        if kind == "all":
            for key, idx in key_to_idx.items():
                if key != INTERCEPT_KEY:
                    matches.append((order, key, idx))
        elif kind == "prefix":
            for key, idx in key_to_idx.items():
                if key.startswith(value):
                    matches.append((order, key, idx))
        else:
            idx = key_to_idx.get(value)
            if idx is not None:
                matches.append((order, value, idx))
    return matches


def _resolve_selectors_spark(selectors, dictionary):
    """Selector resolution against a dictionary DataFrame WITHOUT
    collecting the full key→index map: the constraint keys/prefixes are
    broadcast-joined against the dictionary (the avro_io.py model-write
    pattern), so driver traffic is O(matched features) — at the
    reference's own >200k-feature regime a handful of constraints no
    longer pulls every feature-key string to the driver. The one
    exception is the all-feature wildcard, which by definition binds
    every index; there only the integer indices come back, never the
    key strings."""
    from pyspark.sql import functions as F

    spark = dictionary.sparkSession
    dict_kv = dictionary.select("feature_key", "feature_index")
    matches: list[tuple[int, str, int]] = []
    all_sel = [s for s in selectors if s[1] == "all"]
    if all_sel:
        # validated upstream: the all-wildcard is the only selector
        order = all_sel[0][0]
        rows = (
            dict_kv.filter(F.col("feature_key") != INTERCEPT_KEY)
            .select("feature_index")
            .collect()
        )
        return [(order, str(int(r[0])), int(r[0])) for r in rows]
    exact = [(o, v) for o, kind, v, _, _ in selectors if kind == "exact"]
    prefix = [(o, v) for o, kind, v, _, _ in selectors if kind == "prefix"]
    if exact:
        sel = spark.createDataFrame(exact, "__ord int, feature_key string")
        for r in dict_kv.join(F.broadcast(sel), "feature_key").collect():
            matches.append(
                (int(r["__ord"]), r["feature_key"], int(r["feature_index"]))
            )
    if prefix:
        sel = spark.createDataFrame(prefix, "__ord int, __prefix string")
        joined = dict_kv.join(
            F.broadcast(sel),
            F.col("feature_key").startswith(F.col("__prefix")),
        )
        for r in joined.collect():
            matches.append(
                (int(r["__ord"]), r["feature_key"], int(r["feature_index"]))
            )
    matches.sort(key=lambda m: (m[0], m[2]))
    return matches
