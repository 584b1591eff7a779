"""Property tests for Avro reader/writer schema resolution
(avro_io._make_adapter) — the layer that lets the engine read the
reference toolchain's artifacts. Pure Python (encode with the writer
schema via write_ocf, decode, adapt to the reader schema), no Spark
session: runs in milliseconds per case."""

import json

import pytest
from hypothesis import given, settings, strategies as st

from photon_ml_spark.sources.avro_io import (
    _make_adapter,
    parse_schema,
    read_ocf,
    write_ocf,
)


def _roundtrip(writer_schema: dict, records, reader_schema: dict):
    """Encode records with the writer schema, decode, adapt to reader."""
    blob = write_ocf(json.dumps(writer_schema), records, codec="null")
    _, decoded = read_ocf(blob)
    ad = _make_adapter(
        parse_schema(json.dumps(writer_schema)),
        parse_schema(json.dumps(reader_schema)),
    )
    return decoded if ad is None else [ad(r) for r in decoded]


def _rec(name, fields):
    return {"type": "record", "name": name, "fields": fields}


READER = _rec("R", [
    {"name": "a", "type": ["null", "string"], "default": None},
    {"name": "b", "type": "double"},
    {"name": "c", "type": ["null", "double"], "default": None},
])


@settings(max_examples=200, deadline=None)
@given(
    a=st.one_of(st.none(), st.text(max_size=8), st.integers(-2**31, 2**31 - 1)),
    b=st.one_of(
        st.integers(-2**31, 2**31 - 1),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    c=st.one_of(st.none(), st.integers(-1000, 1000)),
    permute=st.permutations([0, 1, 2]),
)
def test_wide_unions_and_field_order_resolve(a, b, c, permute):
    """Writer: permuted field order, wide unions (the heart.avro
    shapes). Reader: the canonical narrow form. Values must land in
    the right reader slots with the right coercions."""
    wfields = [
        {"name": "a", "type": ["null", "string", "long", "int"],
         "default": None},
        {"name": "b", "type": ["double", "float", "int", "long", "boolean"]},
        {"name": "c", "type": ["null", "int", "long", "float", "double"],
         "default": None},
    ]
    writer = _rec("R", [wfields[i] for i in permute])
    vals = {"a": a, "b": b, "c": c}
    row = tuple(vals[wfields[i]["name"]] for i in permute)
    (out,) = _roundtrip(writer, [row], READER)
    exp_a = None if a is None else (a if isinstance(a, str) else str(a))
    if b is True:
        exp_b = 1.0
    elif b is False:
        exp_b = 0.0
    else:
        exp_b = float(b)
    exp_c = None if c is None else float(c)
    assert out == (exp_a, pytest.approx(exp_b), exp_c)


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.text(max_size=5), st.integers(-10**6, 10**6)),
        max_size=5,
    )
)
def test_missing_reader_fields_take_defaults(vals):
    """Writer lacks reader fields entirely — reader defaults fill in
    (weight→1.0, offset→0.0, the TrainingExampleAvro contract)."""
    writer = _rec("R", [
        {"name": "uid", "type": "string"},
        {"name": "n", "type": "long"},
    ])
    reader = _rec("R", [
        {"name": "uid", "type": "string"},
        {"name": "weight", "type": "double", "default": 1.0},
        {"name": "n", "type": "long"},
        {"name": "offset", "type": ["null", "double"], "default": None},
    ])
    out = _roundtrip(writer, vals, reader)
    assert out == [(u, 1.0, n, None) for u, n in vals]


def test_missing_field_without_default_raises():
    writer = _rec("R", [{"name": "x", "type": "long"}])
    reader = _rec("R", [
        {"name": "x", "type": "long"},
        {"name": "y", "type": "double"},  # no default
    ])
    with pytest.raises(ValueError, match="missing from writer"):
        _make_adapter(
            parse_schema(json.dumps(writer)),
            parse_schema(json.dumps(reader)),
        )


@settings(max_examples=100, deadline=None)
@given(
    feats=st.lists(
        st.tuples(
            st.text(max_size=4),
            st.floats(allow_nan=False, allow_infinity=False, width=16),
            st.one_of(st.none(), st.text(max_size=3)),
        ),
        max_size=6,
    )
)
def test_nested_record_field_reorder(feats):
    """The Feature record trap: writer (name, value, term-nullable) vs
    reader (name, term, value) — elementwise reorder by NAME inside an
    array (the heart.avro features shape)."""
    writer = _rec("R", [{
        "name": "features",
        "type": {"type": "array", "items": _rec("F", [
            {"name": "name", "type": "string"},
            {"name": "value", "type": "double"},
            {"name": "term", "type": ["null", "string"], "default": None},
        ])},
    }])
    reader = _rec("R", [{
        "name": "features",
        "type": {"type": "array", "items": _rec("F2", [
            {"name": "name", "type": "string"},
            {"name": "term", "type": "string"},
            {"name": "value", "type": "double"},
        ])},
    }])
    (out,) = _roundtrip(writer, [([(n, v, t) for n, v, t in feats],)], reader)
    assert out == ([(n, t, pytest.approx(v)) for n, v, t in feats],)


@settings(max_examples=100, deadline=None)
@given(
    m=st.one_of(
        st.none(),
        st.dictionaries(
            st.text(max_size=4),
            st.one_of(
                st.booleans(), st.integers(-10**9, 10**9),
                st.text(max_size=6),
            ),
            max_size=4,
        ),
    )
)
def test_wide_union_map_values_coerce_to_string(m):
    """metadataMap: writer map values are [boolean,int,long,...,string]
    — reader map<string,string> coerces every branch (booleans render
    Java-style)."""
    writer = _rec("R", [{
        "name": "md",
        "type": ["null", {
            "type": "map",
            "values": ["boolean", "int", "long", "float", "double",
                       "string"],
        }],
        "default": None,
    }])
    reader = _rec("R", [{
        "name": "md",
        "type": ["null", {"type": "map", "values": "string"}],
        "default": None,
    }])
    (out,) = _roundtrip(writer, [(m,)], reader)
    if m is None:
        assert out == (None,)
    else:
        exp = {
            k: ("true" if v is True else "false" if v is False else str(v))
            for k, v in m.items()
        }
        assert out == (exp,)


def test_identity_resolution_is_free():
    """Same writer and reader shapes (every self-written round-trip):
    the adapter compiles to None — zero per-row work."""
    schema = _rec("R", [
        {"name": "uid", "type": ["null", "string"], "default": None},
        {"name": "label", "type": "double"},
        {"name": "features", "type": {"type": "array", "items": _rec("F", [
            {"name": "name", "type": "string"},
            {"name": "term", "type": "string"},
            {"name": "value", "type": "double"},
        ])}},
    ])
    parsed = parse_schema(json.dumps(schema))
    assert _make_adapter(parsed, parsed) is None
