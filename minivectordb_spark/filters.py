"""Mongo-like filter DSL -> Catalyst ``Column`` compiler.

Reference semantics (minivectordb/vector_database.py:157-386, duplicated in
the sharded variants), preserved exactly where observable:

1. Candidate universe = rows that HAVE the key.  Every reference filter path
   probes ``inverted_index.get(key, set())`` (vector_database.py:260, :179,
   :325), so a row lacking the key never matches — including for ``$ne``.
   Here every compiled predicate carries an explicit presence conjunct, which
   also neutralizes SQL 3-valued logic on missing/null values.
2. AND across keys of ``metadata_filter`` dicts (vector_database.py:238-318);
   OR across keys within an ``or_filters`` dict and across dicts
   (vector_database.py:157-236); AND+OR together intersect
   (vector_database.py:373-377).
3. ``exclude_filter`` is equality-only (vector_database.py:320-352): an
   operator-dict as an exclude value compares a dict against the stored
   scalar and never matches — compiled here to a constant-false contribution.
4. Operator dicts: the reference evaluates only the FIRST operator
   (``next(iter(value))``, vector_database.py:164, :243).  We evaluate ALL
   operators conjunctively — a documented strict superset of the observable
   reference behavior (its own test suite cannot distinguish the two; see
   SURVEY.md §2.2 quirk 3).
5. Unknown operator -> ``ValueError`` (vector_database.py:174-175) — raised
   here at compile time.
6. ``$in`` means operand ∈ stored list (vector_database.py:172) — compiled to
   ``array_contains(stored, operand)``.
7. Dict inputs auto-wrap into single-element lists; empty dicts are dropped
   from ``or_filters`` (vector_database.py:359-360, :369-371, :381-383).

Known deviations (typed-map edges, intentional):

8. ``$ne`` with an operand whose Python type differs from the stored
   value's type resolves against that type's map and never matches; the
   reference compares loosely across types (``x != y`` on raw Python
   values, so ``{"$ne": "5"}`` matches a stored int 5 there but not here).
   Cross-type ``$ne`` over a typed columnar layout would need a
   stringly-typed fallback comparison on every row — not worth breaking
   pushdown for an edge the reference's own tests never exercise.
9. ``$in`` requires the stored value to be a list (operand ∈ list).  The
   reference evaluates Python ``operand in stored`` which ALSO does
   substring matching when the stored value is a string
   (vector_database.py:172); that accidental substring mode is not
   supported — use an explicit list-typed field.

Everything compiles to ONE boolean ``Column`` so Catalyst can reorder,
short-circuit and push the conjuncts down to the Parquet scan — the
declarative replacement for the reference's inverted-index probes.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

VALID_OPS = ("$gt", "$gte", "$lt", "$lte", "$ne", "$in")

_OP_BUILDERS = {
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$ne": lambda c, v: c != v,
}


class FieldResolver:
    """Maps a DSL key + operand to (value Column, presence Column).

    ``value(key, operand)`` returns the stored value to compare, typed to
    match the operand; ``present(key, operand)`` returns a boolean Column
    that is True iff the row "has" the key (reference inverted-index
    semantics, SURVEY.md §2.2 rule 1).
    """

    def value(self, key: str, operand: Any) -> Column:  # pragma: no cover
        raise NotImplementedError

    def present(self, key: str, operand: Any) -> Column:
        return self.value(key, operand).isNotNull()


class ColumnResolver(FieldResolver):
    """Resolves DSL keys to real DataFrame columns (flat tables).

    ``mapping`` optionally renames DSL keys to column names.  Key presence ==
    the column value is not null, the natural relational analogue of "row has
    the key".
    """

    def __init__(self, mapping: Mapping[str, str] | None = None):
        self._mapping = dict(mapping or {})

    def value(self, key: str, operand: Any) -> Column:
        return F.col(self._mapping.get(key, key))


class JsonResolver(FieldResolver):
    """Resolves DSL keys inside a JSON-string column (e.g. ``events.props``).

    Values are extracted with ``get_json_object`` and try_cast to the operand
    type, so a malformed value behaves as "key absent" rather than erroring
    under ANSI mode.
    """

    def __init__(self, json_col: str):
        self._json_col = json_col

    def _raw(self, key: str) -> Column:
        return F.get_json_object(F.col(self._json_col), f"$.{key}")

    def value(self, key: str, operand: Any) -> Column:
        raw = self._raw(key)
        if isinstance(operand, bool):
            return raw.try_cast("boolean")
        if isinstance(operand, (int, float)):
            return raw.try_cast("double")
        if isinstance(operand, (_dt.datetime, _dt.date)):
            return raw.try_cast("timestamp")
        return raw

    def present(self, key: str, operand: Any) -> Column:
        return self._raw(key).isNotNull()


class TypedMapResolver(FieldResolver):
    """Resolves DSL keys against the typed metadata maps of a VectorTable.

    Schemaless reference metadata (``list[dict]``, vector_database.py:13)
    becomes five typed map columns (FIXTURES.md F1) so comparisons stay
    typed and Catalyst-optimizable:

    meta_str  MAP<STRING,STRING>, meta_num MAP<STRING,DOUBLE>,
    meta_ts   MAP<STRING,TIMESTAMP>, meta_bool MAP<STRING,BOOLEAN>,
    meta_arr  MAP<STRING,ARRAY<STRING>>

    The map is chosen by operand type (bool before int — Python bools are
    ints).  ``$in`` operands address ``meta_arr`` (stored value is the list).
    """

    def __init__(
        self,
        meta_str: str = "meta_str",
        meta_num: str = "meta_num",
        meta_ts: str = "meta_ts",
        meta_bool: str = "meta_bool",
        meta_arr: str = "meta_arr",
    ):
        self._cols = {
            "str": meta_str,
            "num": meta_num,
            "ts": meta_ts,
            "bool": meta_bool,
            "arr": meta_arr,
        }

    def _map_for(self, operand: Any, in_op: bool = False) -> str:
        if in_op:
            return self._cols["arr"]
        if isinstance(operand, bool):
            return self._cols["bool"]
        if isinstance(operand, (int, float)):
            return self._cols["num"]
        if isinstance(operand, (_dt.datetime, _dt.date)):
            return self._cols["ts"]
        return self._cols["str"]

    def value(self, key: str, operand: Any, in_op: bool = False) -> Column:
        return F.col(self._map_for(operand, in_op)).getItem(key)

    def present(self, key: str, operand: Any, in_op: bool = False) -> Column:
        return self.value(key, operand, in_op).isNotNull()


class CompositeResolver(FieldResolver):
    """Routes specific DSL keys to dedicated resolvers (e.g. ``k`` ->
    JsonResolver('props')), everything else to a default resolver — lets the
    DSL span flat columns and semi-structured columns in one filter."""

    def __init__(self, routes: Mapping[str, FieldResolver], default: FieldResolver):
        self._routes = dict(routes)
        self._default = default

    def _pick(self, key: str) -> FieldResolver:
        return self._routes.get(key, self._default)

    def value(self, key: str, operand: Any) -> Column:
        return self._pick(key).value(key, operand)

    def present(self, key: str, operand: Any) -> Column:
        return self._pick(key).present(key, operand)


def _lit(operand: Any) -> Column:
    if isinstance(operand, bool):
        return F.lit(operand)
    if isinstance(operand, int):
        return F.lit(operand).cast("double")
    if isinstance(operand, float):
        return F.lit(operand)
    if isinstance(operand, (_dt.datetime, _dt.date)):
        return F.lit(operand)
    return F.lit(operand)


def _resolve(resolver: FieldResolver, key: str, operand: Any, in_op: bool = False):
    if isinstance(resolver, TypedMapResolver):
        return (
            resolver.value(key, operand, in_op=in_op),
            resolver.present(key, operand, in_op=in_op),
        )
    return resolver.value(key, operand), resolver.present(key, operand)


def _false() -> Column:
    return F.lit(False)


def _safe(pred: Column) -> Column:
    """Collapse SQL NULL to False so NEGATION is exact.  Positive predicates
    deliberately stay bare: in a WHERE context NULL already drops the row
    (filter semantics == FALSE), and a coalesce() wrapper would block
    Parquet predicate pushdown (it hides the comparison from the data-source
    filter translator)."""
    return F.coalesce(pred, F.lit(False))


def _compile_op(key: str, op: str, operand: Any, resolver: FieldResolver) -> Column:
    if op not in VALID_OPS:
        raise ValueError(f"Invalid operator: {op}")
    if op == "$in":
        value, present = _resolve(resolver, key, operand, in_op=True)
        operand_lit = F.lit(str(operand)) if not isinstance(operand, str) else F.lit(operand)
        return present & F.array_contains(value, operand_lit)
    value, present = _resolve(resolver, key, operand)
    return present & _OP_BUILDERS[op](value, _lit(operand))


def _compile_spec(key: str, spec: Any, resolver: FieldResolver) -> Column:
    """One ``{key: spec}`` pair -> predicate.

    Plain value = equality; operator dict = conjunction of ALL ops
    (documented superset of vector_database.py:164's first-op-only quirk).
    """
    if isinstance(spec, Mapping):
        if not spec:
            return _false()
        pred = None
        for op, operand in spec.items():
            p = _compile_op(key, op, operand, resolver)
            pred = p if pred is None else (pred & p)
        return pred
    value, present = _resolve(resolver, key, spec)
    return present & (value == _lit(spec))


def _as_dict_list(filters: Any) -> list[dict]:
    if filters is None:
        return []
    if isinstance(filters, Mapping):
        return [dict(filters)]
    if isinstance(filters, Sequence) and not isinstance(filters, (str, bytes)):
        out = []
        for f in filters:
            if not isinstance(f, Mapping):
                raise ValueError(f"Filter must be a dict or list of dicts, got element {type(f)}")
            out.append(dict(f))
        return out
    raise ValueError(f"Filter must be a dict or list of dicts, got {type(filters)}")


def compile_and(and_filters: Any, resolver: FieldResolver) -> Column | None:
    """AND across every (key, spec) pair of every dict (vector_database.py:238-318)."""
    dicts = _as_dict_list(and_filters)
    pred = None
    for d in dicts:
        for key, spec in d.items():
            p = _compile_spec(key, spec, resolver)
            pred = p if pred is None else (pred & p)
    return pred


def compile_or(or_filters: Any, resolver: FieldResolver) -> Column | None:
    """OR across dicts AND across keys within a dict (vector_database.py:157-236).

    Empty dicts are dropped (vector_database.py:371); all-empty input means
    "no OR constraint".
    """
    dicts = [d for d in _as_dict_list(or_filters) if d]
    if not dicts:
        return None
    pred = None
    for d in dicts:
        for key, spec in d.items():
            p = _compile_spec(key, spec, resolver)
            pred = p if pred is None else (pred | p)
    return pred


def compile_exclude(exclude_filter: Any, resolver: FieldResolver) -> Column | None:
    """Equality-only union of matches, to be negated (vector_database.py:320-352).

    An operator-dict value never matches in the reference (dict == scalar is
    always False) -> constant-false contribution here.
    """
    dicts = _as_dict_list(exclude_filter)
    pred = None
    for d in dicts:
        for key, spec in d.items():
            if isinstance(spec, Mapping):
                p = _false()
            else:
                value, present = _resolve(resolver, key, spec)
                p = _safe(present & (value == _lit(spec)))
            pred = p if pred is None else (pred | p)
    return pred


def compile_filters(
    metadata_filter: Any = None,
    exclude_filter: Any = None,
    or_filters: Any = None,
    resolver: FieldResolver | None = None,
) -> Column:
    """Full composition (vector_database.py:354-386):

    ``AND_pred ∧ OR_pred ∧ ¬EXCLUDE_pred`` — start = all rows when no AND
    filter; AND∩OR; exclude subtracts.  Returns ``lit(True)`` when no
    filters at all.
    """
    resolver = resolver or TypedMapResolver()
    parts: list[Column] = []
    and_pred = compile_and(metadata_filter, resolver)
    if and_pred is not None:
        parts.append(and_pred)
    or_pred = compile_or(or_filters, resolver)
    if or_pred is not None:
        parts.append(or_pred)
    excl_pred = compile_exclude(exclude_filter, resolver)
    if excl_pred is not None:
        parts.append(~_safe(excl_pred))
    if not parts:
        return F.lit(True)
    pred = parts[0]
    for p in parts[1:]:
        pred = pred & p
    return pred
