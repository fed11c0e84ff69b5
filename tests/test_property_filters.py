"""Property-based filter-semantics test: Hypothesis generates random filter
compositions; the compiled Catalyst predicate must agree with an
independent pure-Python evaluator of the reference semantics
(vector_database.py:157-386: presence gating, typed comparisons,
AND-across-keys, OR-within-dict, equality-only exclude, conjunctive
operator dicts)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from minivectordb_spark.filters import TypedMapResolver, compile_filters
from minivectordb_spark.table import VectorTable

KEYS = ["alpha", "beta", "gamma"]
NUM_VALUES = [1, 5, 10, 20]
STR_VALUES = ["red", "green", "blue"]
TS_VALUES = [dt.datetime(2021, 1, 1), dt.datetime(2022, 6, 15), dt.datetime(2023, 12, 31)]
LIST_VALUES = [["a", "b"], ["b", "c"], ["x"]]

ROWS = []
_seed = 12345
for i in range(48):
    _seed = (_seed * 1103515245 + 12345) % (1 << 31)
    md = {}
    r = _seed
    for j, key in enumerate(KEYS):
        r >>= 3
        mode = r % 6
        if mode == 0:
            continue  # key absent
        elif mode == 1:
            md[key] = NUM_VALUES[r % len(NUM_VALUES)]
        elif mode == 2:
            md[key] = STR_VALUES[r % len(STR_VALUES)]
        elif mode == 3:
            md[key] = TS_VALUES[r % len(TS_VALUES)]
        elif mode == 4:
            md[key] = LIST_VALUES[r % len(LIST_VALUES)]
        else:
            md[key] = NUM_VALUES[(r // 7) % len(NUM_VALUES)]
    ROWS.append((f"id{i}", [float(i % 7), float(i % 3)], md))


@pytest.fixture(scope="module")
def prop_table(spark):
    t = VectorTable.empty(spark).store_embeddings_batch(
        [r[0] for r in ROWS], [r[1] for r in ROWS], [r[2] for r in ROWS]
    )
    t.df.cache().count()
    return t


# ---- pure-python reference evaluator (independent reimplementation) ----

def _type_ok(value, operand, in_op=False):
    if in_op:
        return isinstance(value, list)
    if isinstance(operand, bool):
        return isinstance(value, bool)
    if isinstance(operand, (int, float)):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if isinstance(operand, dt.datetime):
        return isinstance(value, dt.datetime)
    if isinstance(operand, str):
        return isinstance(value, str)
    return False


def _spec_matches(md: dict, key: str, spec) -> bool:
    if key not in md:
        return False  # presence gating
    v = md[key]
    if isinstance(spec, dict):
        for op, operand in spec.items():
            if op == "$in":
                if not _type_ok(v, operand, in_op=True) or str(operand) not in v:
                    return False
            else:
                if not _type_ok(v, operand):
                    return False
                ok = {
                    "$gt": v > operand,
                    "$gte": v >= operand,
                    "$lt": v < operand,
                    "$lte": v <= operand,
                    "$ne": v != operand,
                }[op]
                if not ok:
                    return False
        return True
    return _type_ok(v, spec) and v == spec


def _py_eval(md: dict, metadata_filter, exclude_filter, or_filters) -> bool:
    def dicts(x):
        if x is None:
            return []
        return [x] if isinstance(x, dict) else list(x)

    for d in dicts(metadata_filter):
        for k, s in d.items():
            if not _spec_matches(md, k, s):
                return False
    ors = [d for d in dicts(or_filters) if d]
    if ors:
        if not any(_spec_matches(md, k, s) for d in ors for k, s in d.items()):
            return False
    for d in dicts(exclude_filter):
        for k, s in d.items():
            if isinstance(s, dict):
                continue  # operator-dict exclude never matches (equality-only)
            if _spec_matches(md, k, s):
                return False
    return True


# ---- hypothesis strategies ----

operand = st.one_of(
    st.sampled_from(NUM_VALUES + [3, 15]),
    st.sampled_from(STR_VALUES + ["purple"]),
    st.sampled_from(TS_VALUES),
)
op_name = st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$ne"])
spec = st.one_of(
    operand,
    st.dictionaries(op_name, operand, min_size=1, max_size=2),
    st.builds(lambda v: {"$in": v}, st.sampled_from(["a", "b", "x", "zz"])),
)
filter_dict = st.dictionaries(st.sampled_from(KEYS), spec, min_size=1, max_size=2)
maybe_filters = st.one_of(st.none(), filter_dict, st.lists(filter_dict, min_size=1, max_size=2))
eq_dict = st.dictionaries(
    st.sampled_from(KEYS),
    st.one_of(st.sampled_from(NUM_VALUES), st.sampled_from(STR_VALUES)),
    min_size=1,
    max_size=2,
)
maybe_exclude = st.one_of(st.none(), eq_dict, st.lists(eq_dict, min_size=1, max_size=2))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(mf=maybe_filters, orf=maybe_filters, exf=maybe_exclude)
def test_compiled_filter_matches_python_reference(prop_table, mf, orf, exf):
    pred = compile_filters(mf, exf, orf, TypedMapResolver())
    got = {r["id"] for r in prop_table.df.filter(pred).select("id").collect()}
    expected = {rid for rid, _, md in ROWS if _py_eval(md, mf, exf, orf)}
    assert got == expected, f"mf={mf} orf={orf} exf={exf}"
