"""Property fuzz: schema inference composed with the typed extractor.

For ANY list of JSON-ish records, the inferred {name: DDL} schema must
compile through schema_extract without losing rows, and every non-null
scalar value must survive the round trip (inference can only widen — never
produce a type a present value fails to cast into)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airbyte_spark.plans.transforms import schema_extract
from airbyte_spark.sources.declarative import infer_schema

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(
            st.from_regex(r"[a-z][a-z0-9_]{0,5}", fullmatch=True), inner, max_size=3
        ),
    ),
    max_leaves=6,
)
_record = st.dictionaries(
    st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True), _value, min_size=1, max_size=5
)


@given(records=st.lists(_record, min_size=1, max_size=8))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_inferred_schema_always_compiles_and_preserves_scalars(
    spark, records
):
    schema = infer_schema(records)
    raw = spark.createDataFrame(
        [(json.dumps(r),) for r in records], "_ab_data string"
    )
    df = schema_extract(raw, "_ab_data", schema)
    rows = df.collect()
    assert len(rows) == len(records)  # extraction never drops rows
    for rec, row in zip(records, rows):
        for name, typ in schema.items():
            v = rec.get(name)
            if v is None or isinstance(v, (dict, list)):
                continue
            got = row[name]
            assert got is not None, (name, typ, v)
            if isinstance(v, bool) and typ == "boolean":
                assert got == v
            elif isinstance(v, int) and typ == "bigint":
                assert got == v
            elif isinstance(v, float) and typ == "double":
                assert abs(got - v) <= 1e-6 * max(1.0, abs(v))
            elif typ == "string":
                # widened column: a str value survives verbatim; a widened
                # non-str scalar survives as its JSON text
                if isinstance(v, str):
                    assert got == v
                else:
                    assert json.loads(got) == v
