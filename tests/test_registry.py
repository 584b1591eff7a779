"""Registry integrity: the driver's correctness gate records the first
50 entries of ``all_queries()``, whose order comes from ``GATE_ORDER``.
``all_queries()`` tolerates a query module failing to import (optional
deps), but in THIS environment every module must import — a silent
import failure would shrink both the gate and the oracle test with no
signal (ADVICE round-3 #2)."""

from photon_ml_spark.queries import GATE_ORDER, all_queries


def test_gate_order_fully_registered():
    qs = all_queries()
    missing = [n for n in GATE_ORDER if n not in qs]
    assert not missing, (
        f"GATE_ORDER names missing from the registry (query module "
        f"failed to import?): {missing}"
    )
    # the gate window is exactly the first len(GATE_ORDER) entries
    assert list(qs)[: len(GATE_ORDER)] == GATE_ORDER


def test_gate_order_has_no_duplicates_and_fits_window():
    assert len(GATE_ORDER) == len(set(GATE_ORDER))
    assert len(GATE_ORDER) <= 50  # the driver records the first 50 rows


def test_every_registered_query_has_a_runner():
    for name, spec in all_queries().items():
        assert callable(spec.run), name
