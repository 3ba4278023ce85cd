"""Properties of the associative merge (SURVEY.md §2.4).

These replace the reference's concurrency tests
(`/root/reference/jsonschema_test.go:775-885`): the Go library proves
order-insensitivity by hammering a mutex; the distributed engine proves it
by algebra — fold(any partitioning, any order) == sequential fold.

Run with hypothesis for random JSON documents plus the fixed corpus from
FIXTURES.md §B.
"""

import json

from hypothesis import given, settings, strategies as st

from jsonschema_infer_spark.config import default_config
from jsonschema_infer_spark.operators import state as S
from jsonschema_infer_spark.plans.render import render_schema

CFG = default_config()
CFG_EX = default_config(examples=True)


# JSON value strategy (bounded depth/size to keep runtime sane)
json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
    st.sampled_from(
        ["2023-01-15T10:30:00Z", "a@b.com", "192.168.1.1", "fe80::1",
         "https://x.org", "550e8400-e29b-41d4-a716-446655440000", "item"]
    ),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)
documents = st.lists(json_values, min_size=1, max_size=12)


def fold(docs, cfg=CFG, keyed=False):
    st_ = S.new_state()
    for i, d in enumerate(docs):
        S.observe_value(st_, d, cfg, order_key=(i,) if keyed else None)
    return st_


def render(state, cfg=CFG):
    return render_schema(S.finalize(state, cfg))


@given(documents, st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_any_partitioning_equals_sequential(docs, nparts):
    """Splitting the sample stream across partitions and merging must give a
    byte-identical schema to the sequential fold."""
    seq = render(fold(docs))
    parts = [fold(docs[i::nparts]) for i in range(nparts)]
    merged = None
    for p in parts:
        merged = S.merge(merged, p)
    assert render(merged) == seq


@given(documents)
@settings(max_examples=100, deadline=None)
def test_merge_commutative(docs):
    a = fold(docs[::2])
    b = fold(docs[1::2])
    ab, ba = S.merge(a, b), S.merge(b, a)
    if a["n"] and b["n"]:
        assert render(ab) == render(ba)


@given(documents)
@settings(max_examples=100, deadline=None)
def test_merge_associative(docs):
    thirds = [fold(docs[i::3]) for i in range(3)]
    left = S.merge(S.merge(thirds[0], thirds[1]), thirds[2])
    right = S.merge(thirds[0], S.merge(thirds[1], thirds[2]))
    assert render(left) == render(right)


@given(documents)
@settings(max_examples=100, deadline=None)
def test_merge_identity_and_no_mutation(docs):
    a = fold(docs)
    snapshot = json.dumps(_jsonable(a), sort_keys=True, default=str)
    assert S.merge(a, None) is not a  # returns a copy
    assert render(S.merge(None, a)) == render(a)
    b = fold(docs[:1])
    S.merge(a, b)
    assert json.dumps(_jsonable(a), sort_keys=True, default=str) == snapshot


@given(documents)
@settings(max_examples=75, deadline=None)
def test_examples_deterministic_under_merge(docs):
    """With order keys, the merged 'first value' equals the sequential
    first — regardless of partitioning (SURVEY.md §2.4 firstValue row)."""
    seq = render(fold(docs, CFG_EX, keyed=True), CFG_EX)
    # fold halves with their ORIGINAL order keys
    sa, sb = S.new_state(), S.new_state()
    for i, d in enumerate(docs):
        tgt = sa if i % 2 == 0 else sb
        S.observe_value(tgt, d, CFG_EX, order_key=(i,))
    assert render(S.merge(sa, sb), CFG_EX) == seq
    assert render(S.merge(sb, sa), CFG_EX) == seq


def test_concurrent_add_sample_equivalent():
    """Port of TestConcurrentAddSample (jsonschema_test.go:775-835): 8 docs
    in any split -> 3 required fields with stable types."""
    samples = [
        {"name": "John", "age": 30, "active": True},
        {"name": "Jane", "age": 25, "active": False},
        {"name": "Bob", "age": 35, "active": True},
        {"name": "Alice", "age": 28, "active": False},
        {"name": "Charlie", "age": 32, "active": True},
        {"name": "Diana", "age": 27, "active": False},
        {"name": "Eve", "age": 29, "active": True},
        {"name": "Frank", "age": 31, "active": False},
    ]
    for nparts in (1, 2, 3, 8):
        parts = [fold(samples[i::nparts]) for i in range(nparts)]
        merged = None
        for p in parts:
            merged = S.merge(merged, p)
        schema = json.loads(render(merged))
        assert len(schema["required"]) == 3
        assert schema["properties"]["name"]["type"] == "string"
        assert schema["properties"]["age"]["type"] == "integer"
        assert schema["properties"]["active"]["type"] == "boolean"


def _jsonable(s):
    if s is None:
        return None
    out = dict(s)
    out["items"] = _jsonable(s["items"])
    out["props"] = {k: _jsonable(v) for k, v in s["props"].items()}
    out["const"] = repr(s["const"])
    out["first"] = repr(s["first"])
    out["distinct"] = repr(s["distinct"])
    return out
