"""Generic Mongo-style filter-dict → Catalyst ``Column`` compiler.

The reference's entire query IR is a Mongo filter dict handed to its
DocStore (grep of /root/reference shows the full operator vocabulary in
use: implicit equality, $ne, $in, $lt, $and, $exists, $elemMatch, and
the Kuha wire wrapper {"$isodate": "..."} for timestamps — e.g.
cdcagg_oai/metadataformats.py:426-430, tests/test_serve.py:1342-1350).
``functions/predicates.py`` encodes those exact semantics as hand-built
helpers for the OAI planner's fixed query shapes; this module closes the
loop for ARBITRARY filters: a user porting from the reference feeds the
same dict they send today and gets one ``Column`` expression back,
foldable by Catalyst into the scan like any hand-written predicate.

Supported (Mongo semantics, null behavior matching the reference):

- implicit equality ``{field: value}`` and ``$eq``;
- ``$ne`` — NULL-KEEPING (a missing/NULL field matches, the semantics
  the reference's deleted-exclusion depends on — predicates.ne_keep_null);
- ``$in`` / ``$nin`` (``$nin`` also matches NULL, as in Mongo);
- ``$lt $lte $gt $gte``;
- ``$exists`` (fixed relational schema: present == non-null);
- ``$and $or $nor`` at any level, implicit AND across dict keys;
- ``$not`` wrapping an operator spec;
- ``$elemMatch`` over arrays of structs (all sub-conditions on one
  element) and over scalar arrays (operator spec applied to elements);
- ``{"$isodate": "..."}`` value wrapper → TimestampType literal;
- dotted field paths (``_metadata.status``) — Spark resolves them as
  nested struct access natively.

No query executes here: the output is a pure expression, so pushdown,
partition pruning, and codegen all apply unchanged.
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column
from pyspark.sql import functions as F

_CMP = {"$lt": "__lt__", "$lte": "__le__", "$gt": "__gt__", "$gte": "__ge__"}


def _lit(v):
    """Literal with wire-format unwrapping ({"$isodate": ...} → ts)."""
    if isinstance(v, dict):
        if set(v) == {"$isodate"}:
            return F.lit(_dt.datetime.fromisoformat(
                v["$isodate"].replace("Z", "+00:00").replace("+00:00", "")))
        raise ValueError(f"unsupported literal wrapper {sorted(v)}")
    return F.lit(v)


def _is_op_spec(spec) -> bool:
    return (isinstance(spec, dict) and spec
            and all(isinstance(k, str) and k.startswith("$") for k in spec)
            and set(spec) != {"$isodate"})


def _in(col: Column, val) -> Column:
    """Plain scalars go through ``isin`` (pushes down as an In predicate);
    wrapped literals ($isodate) fall back to an equality disjunction."""
    if not val:
        return F.lit(False)
    if all(not isinstance(v, dict) for v in val):
        return col.isin(list(val))
    return reduce(or_, [col == _lit(v) for v in val])


def _compile_op(col: Column, op: str, val) -> Column:
    if op == "$eq":
        return col == _lit(val)
    if op == "$ne":
        return col.isNull() | (col != _lit(val))
    if op == "$in":
        return _in(col, val)
    if op == "$nin":
        return col.isNull() | ~_in(col, val)
    if op in _CMP:
        return getattr(col, _CMP[op])(_lit(val))
    if op == "$exists":
        return col.isNotNull() if val else col.isNull()
    if op == "$not":
        if not _is_op_spec(val):
            raise ValueError("$not takes an operator spec")
        # Mongo negation matches missing fields: NULL-valued inner
        # predicates count as FALSE before the flip (SQL's ~NULL would
        # silently drop them instead)
        return ~F.coalesce(_compile_spec(col, val), F.lit(False))
    if op == "$elemMatch":
        return F.exists(col, lambda x: _compile_element(x, val))
    if op == "$all":
        if not val:
            return F.lit(True)
        return reduce(and_, [F.array_contains(col, _lit(v)) for v in val])
    if op == "$size":
        return F.size(col) == int(val)
    raise ValueError(f"unsupported operator {op}")


def _compile_spec(col: Column, spec: dict) -> Column:
    """All operators in one spec dict AND together (Mongo)."""
    return reduce(and_, [_compile_op(col, k, v) for k, v in spec.items()])


def _compile_cond(col: Column, spec) -> Column:
    if _is_op_spec(spec):
        return _compile_spec(col, spec)
    return col == _lit(spec)


def _compile_element(x: Column, cond) -> Column:
    """$elemMatch body: sub-field conditions on a struct element, or a
    bare operator spec applied to a scalar element."""
    if _is_op_spec(cond):
        return _compile_spec(x, cond)
    parts = []
    for k, v in cond.items():
        if k.startswith("$"):
            parts.append(_compile_op(x, k, v))
        else:
            parts.append(_compile_cond(x[k], v))
    return reduce(and_, parts)


def compile_filter(filt: dict) -> Column:
    """Mongo filter dict → one boolean ``Column`` (empty dict → TRUE,
    matching an unfiltered DocStore query)."""
    parts = []
    for k, v in filt.items():
        if k == "$and":
            parts.append(reduce(and_, [compile_filter(f) for f in v]))
        elif k == "$or":
            parts.append(reduce(or_, [compile_filter(f) for f in v]))
        elif k == "$nor":
            # same null-as-false rule as $not: a document failing every
            # clause matches even when some clause evaluated to NULL
            parts.append(~reduce(or_, [
                F.coalesce(compile_filter(f), F.lit(False)) for f in v]))
        elif k.startswith("$"):
            raise ValueError(f"unsupported top-level operator {k}")
        else:
            parts.append(_compile_cond(F.col(k), v))
    return reduce(and_, parts) if parts else F.lit(True)
