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
    if hasattr(dictionary, "collect"):
        key_to_idx = {
            r[0]: int(r[1])
            for r in dictionary.select("feature_key", "feature_index").collect()
        }
    else:
        key_to_idx = {k: int(i) for k, i in dictionary}

    lo = np.full(dim, -math.inf)
    hi = np.full(dim, math.inf)
    bound: set[int] = set()
    saw_all_wildcard = False

    def put(idx: int, lb: float, ub: float, what: str) -> None:
        if idx in bound:
            raise ValueError(
                f"conflicting constraints: feature {what} was already "
                "bound and was specified again"
            )
        bound.add(idx)
        lo[idx], hi[idx] = lb, ub

    for entry in entries:
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
            if bound:
                raise ValueError(
                    "conflicting constraints: the all-feature wildcard "
                    "must be the only constraint"
                )
            for key, idx in key_to_idx.items():
                if key != INTERCEPT_KEY:
                    put(idx, lb, ub, key)
            saw_all_wildcard = True
        elif term == WILDCARD:
            prefix = name + FEATURE_KEY_SEP
            for key, idx in key_to_idx.items():
                if key.startswith(prefix):
                    put(idx, lb, ub, key)
        else:
            key = name + FEATURE_KEY_SEP + term
            idx = key_to_idx.get(key)
            if idx is not None:
                put(idx, lb, ub, key)
    if not bound:
        return None
    return lo, hi
