"""Property-based tests (hypothesis) for the session-free surfaces:
DDL schema parsing and file-mask compilation. These run without a
SparkSession, so hypothesis can afford hundreds of examples."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from getl_spark.schema import parse_ddl, parse_type
from getl_spark.sources import mask_to_regex

_SIMPLE_TYPES = [
    "string", "int", "bigint", "smallint", "tinyint", "double", "float",
    "boolean", "date", "timestamp", "binary", "time",
]

_type = st.deferred(
    lambda: st.one_of(
        st.sampled_from(_SIMPLE_TYPES),
        st.tuples(st.integers(1, 38), st.integers(0, 10)).map(
            lambda ps: f"decimal({ps[0]},{min(ps[1], ps[0])})"
        ),
        _type.map(lambda t: f"array<{t}>"),
        st.tuples(st.sampled_from(_SIMPLE_TYPES), _type).map(
            lambda kv: f"map<{kv[0]},{kv[1]}>"
        ),
    )
)
_name = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,15}", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_name, _type), min_size=1, max_size=8, unique_by=lambda t: t[0].lower()))
def test_parse_ddl_roundtrips_through_simple_string(fields):
    ddl = ", ".join(f"{n} {t}" for n, t in fields)
    schema = parse_ddl(ddl)
    assert [f.name for f in schema.fields] == [n for n, _ in fields]
    # the parsed types' canonical form re-parses to the same schema
    ddl2 = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    assert parse_ddl(ddl2) == schema


@settings(max_examples=200, deadline=None)
@given(_type)
def test_parse_type_idempotent_on_canonical_form(t):
    dt = parse_type(t)
    assert parse_type(dt.simpleString()) == dt


_seg = st.from_regex(r"[a-z0-9_.\-]{1,10}", fullmatch=True)
_var = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_seg, _var), min_size=1, max_size=4), _seg)
def test_mask_to_regex_extracts_the_substituted_values(parts, tail):
    mask = "/".join(f"{seg}_{{{var}}}" for seg, var in parts) + f"/{tail}"
    pattern, names = mask_to_regex(mask)
    assert names == [v for _, v in parts]
    values = [f"val{i}" for i in range(len(parts))]
    concrete = "/".join(f"{seg}_{v}" for (seg, _), v in zip(parts, values)) + f"/{tail}"
    m = re.fullmatch(pattern, concrete)
    assert m is not None
    assert list(m.groups()) == values
