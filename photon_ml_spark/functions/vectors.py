"""Vector expressions over (indices, values) sparse-pair columns (F6).

The engine's native feature representation is a pair of aligned arrays
(``*_indices: array<long>``, ``*_values: array<double>``) — these stay
inside Tungsten and whole-stage codegen, unlike VectorUDT which is an
opaque struct to Catalyst. Conversion to ml.linalg vectors happens only
at the spark.ml boundary (ml/glm.py).

Mirrors photon-lib/.../util/VectorUtils.scala (dot products, active
indices) as column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# Hard cap on plan-literal coefficient vectors: past this the compiled
# plan itself becomes megabytes (driver analysis/codegen cost, plan
# broadcast per stage) and the coefficient-table join is strictly
# better. ~10k is the comfortable zone; 50k the enforced ceiling.
MAX_LITERAL_COEFFICIENTS = 50_000


def sparse_dot_literal(
    indices: Column, values: Column, coefficients: list[float]
) -> Column:
    """x · w with a plan-literal coefficient array.

    Good to ~10k coefficients (the literal is embedded in the plan and
    broadcast with it); beyond that use ``score_by_join`` in
    ml/scoring.py, which shuffles instead of inlining. JVM-side only:
    zip_with + aggregate, no Python. Raises above
    ``MAX_LITERAL_COEFFICIENTS`` — the same driver-resident contract as
    the reference's broadcast FixedEffectModel, but enforced.
    """
    if len(coefficients) > MAX_LITERAL_COEFFICIENTS:
        raise ValueError(
            f"{len(coefficients)} coefficients exceed the plan-literal "
            f"cap ({MAX_LITERAL_COEFFICIENTS}); score via the "
            "(feature_index -> coefficient) table join instead "
            "(ml/scoring.py score_by_join), which shuffles rather than "
            "inlining the vector into the compiled plan"
        )
    coef = F.array(*[F.lit(float(c)) for c in coefficients])
    terms = F.zip_with(
        values,
        F.transform(indices, lambda i: F.element_at(coef, (i + 1).cast("int"))),
        lambda v, c: v * c,
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def dense_dot(a: Column, b: Column) -> Column:
    """array<numeric> · array<numeric> as a codegen expression."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b); 0.0 when either side has zero norm.

    Computed as dot/‖a‖/‖b‖ — two sequential divisions, NOT
    dot/(‖a‖·‖b‖): the two differ by 1 ulp on some inputs, and the
    oracle contract hashes exact values, so the operation order here is
    part of the cross-engine spec (oracles write
    ``dot/sqrt(aa)/sqrt(bb)``)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when(
        (na > 0) & (nb > 0), dense_dot(a, b) / na / nb
    ).otherwise(F.lit(0.0))
