"""Property-based round-trip of the pure-Python Avro codec — the one
fully handwritten serialization layer, so it gets randomized coverage
beyond the golden files."""

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from icelake_spark.avro_io import read_avro, write_avro

RECORD_SCHEMA = {
    "type": "record", "name": "r",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "kv", "type": {"type": "array", "items": {
            "type": "record", "name": "kv",
            "fields": [{"name": "key", "type": "int"},
                       {"name": "value", "type": "bytes"}]}}},
    ],
}

record_st = st.fixed_dictionaries({
    "i": st.integers(-(2**31), 2**31 - 1),
    "l": st.integers(-(2**63), 2**63 - 1),
    "s": st.text(max_size=50),
    "b": st.binary(max_size=50),
    "f": st.floats(allow_nan=False),
    "flag": st.booleans(),
    "opt": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
    "arr": st.lists(st.integers(-(2**40), 2**40), max_size=8),
    "m": st.dictionaries(st.text(min_size=1, max_size=10), st.text(max_size=10),
                         max_size=5),
    "kv": st.lists(st.fixed_dictionaries({
        "key": st.integers(-100, 100), "value": st.binary(max_size=10)}),
        max_size=4),
})


@settings(max_examples=50, deadline=None)
@given(st.lists(record_st, max_size=20), st.sampled_from(["null", "deflate"]))
def test_avro_roundtrip_random_records(records, codec):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_avro(p, RECORD_SCHEMA, records, codec=codec)
        schema, back = read_avro(p)
        assert schema == RECORD_SCHEMA
        assert back == records


@settings(max_examples=100, deadline=None)
@given(st.integers(-(2**63), 2**63 - 1))
def test_zigzag_long_roundtrip(v):
    from icelake_spark.avro_io import _Reader, _Writer

    w = _Writer()
    w.write_long(v)
    assert _Reader(w.out.getvalue()).read_long() == v
