"""Vectorized metadata filtering over columnar field projections.

The reference re-unmarshals every document's JSON per candidate per search
(collection.go:583-596); our per-row fallback (build_filter) already does it
once per row per search, but an uncached 1M-row filtered search still costs
a ~2s Python loop.  This module replaces that loop for the common predicate
shapes with numpy mask algebra over per-field columnar projections:

  * extraction: ONE parse pass per (referenced fields, mutation generation)
    pulls the top-level values of every referenced field into typed arrays
    (float64 numbers, object strings, presence/type masks), cached until the
    collection mutates;
  * evaluation: ==, !=, <, <=, >, >=, IN, NOT IN, CONTAINS, STARTS_WITH,
    ENDS_WITH, MATCHES, EXISTS(f), DOES_NOT_EXIST(f), AND/OR/NOT over those
    become vectorized mask ops — microseconds per million rows instead of
    seconds.

Error-semantics parity with query/compiler.py (which mirrors the Go
compiler's eager evaluation): every node's (value, error) pair is tracked as
two masks; an error anywhere in the tree rejects the row, exactly like the
exception path in build_filter.  Queries or field values outside the
supported shapes (nested paths, :params, functions, array-valued fields)
return None and the caller falls back to the per-row engine — semantics
first, speed second.
"""

from __future__ import annotations

import json
import re
from typing import Optional

import numpy as np

from .parser import (ArrayNode, ExpressionNode, FunctionNode, IdentifierNode,
                     Node, ValueNode, parse_query)

_COMPARE_OPS = (">", ">=", "<", "<=")
_EQ_OPS = ("==", "!=")
_STR_OPS = ("CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES")


class FieldColumn:
    """Typed columnar projection of one top-level metadata key."""

    __slots__ = ("present", "is_num", "is_str", "is_bool", "is_none",
                 "nums", "strs", "scalar")

    def __init__(self, n: int):
        self.present = np.zeros(n, bool)
        self.is_num = np.zeros(n, bool)   # non-bool JSON numbers
        self.is_str = np.zeros(n, bool)
        self.is_bool = np.zeros(n, bool)
        self.is_none = np.zeros(n, bool)  # explicit JSON null
        self.nums = np.zeros(n, np.float64)  # numbers and bools (0/1)
        self.strs = np.empty(n, object)
        self.scalar = True  # False once any row holds an array/object

    def set(self, row: int, value) -> None:
        self.present[row] = True
        if isinstance(value, bool):
            self.is_bool[row] = True
            self.nums[row] = 1.0 if value else 0.0
        elif isinstance(value, (int, float)):
            self.is_num[row] = True
            self.nums[row] = float(value)
        elif isinstance(value, str):
            self.is_str[row] = True
            self.strs[row] = value
        elif value is None:
            self.is_none[row] = True
        else:
            self.scalar = False


def referenced_fields(node) -> Optional[set]:
    """Top-level identifiers the query touches, or None if the query uses
    any construct the vectorizer does not support."""
    if isinstance(node, ExpressionNode):
        op = node.operator
        if op in ("AND", "OR"):
            lf = referenced_fields(node.left)
            rf = referenced_fields(node.right)
            return None if lf is None or rf is None else lf | rf
        if op == "NOT":
            return referenced_fields(node.right)
        if op in _COMPARE_OPS + _EQ_OPS + _STR_OPS:
            ident, lit, _ = _ident_literal(node)
            return None if ident is None else {ident}
        if op in ("IN", "NOT_IN"):
            ident, values = _ident_array(node)
            return None if ident is None else {ident}
        return None
    if isinstance(node, FunctionNode):
        if node.name in ("EXISTS", "DOES_NOT_EXIST") \
                and len(node.arguments) == 1 \
                and isinstance(node.arguments[0], IdentifierNode):
            return {node.arguments[0].name}
        return None
    return None


def _ident_literal(node: ExpressionNode):
    """(field, literal, swapped) for ident-vs-literal nodes, else (None,)*3."""
    l, r = node.left, node.right
    if isinstance(l, IdentifierNode) and isinstance(r, ValueNode):
        return l.name, r.value, False
    if isinstance(l, ValueNode) and isinstance(r, IdentifierNode):
        return r.name, l.value, True
    return None, None, None


def _ident_array(node: ExpressionNode):
    l, r = node.left, node.right
    if isinstance(l, IdentifierNode) and isinstance(r, ArrayNode) and \
            all(isinstance(e, ValueNode) for e in r.elements):
        return l.name, [e.value for e in r.elements]
    return None, None


def _eq_mask(col: FieldColumn, lit) -> np.ndarray:
    """Deep-equality mask (never errors): field == literal.

    A missing top-level key evaluates to None (compiler.py ident closure),
    so `f == null` is also true for absent keys."""
    if isinstance(lit, bool):
        return col.is_bool & (col.nums == (1.0 if lit else 0.0))
    if isinstance(lit, (int, float)):
        return col.is_num & (col.nums == float(lit))
    if isinstance(lit, str):
        with np.errstate(all="ignore"):
            eq = col.strs == lit  # object array: elementwise
        return col.is_str & np.asarray(eq, dtype=bool)
    if lit is None:
        return col.is_none | ~col.present
    return np.zeros(len(col.present), bool)  # non-scalar literal: never equal


def _vectorize(node, cols: dict) -> Optional[tuple]:
    """-> (value_mask, error_mask) or None if unsupported."""
    if isinstance(node, ExpressionNode):
        op = node.operator
        if op in ("AND", "OR", "NOT"):
            rv = _vectorize(node.right, cols)
            if rv is None:
                return None
            if op == "NOT":
                return ~rv[0], rv[1]
            lv = _vectorize(node.left, cols)
            if lv is None:
                return None
            # run() evaluates BOTH sides before the op, so an eval error on
            # either side rejects the row even under OR's type-check
            # short-circuit (compiler.py:79-83, 213-219)
            err = lv[1] | rv[1]
            val = (lv[0] & rv[0]) if op == "AND" else (lv[0] | rv[0])
            return val, err

        if op in _EQ_OPS:
            ident, lit, _ = _ident_literal(node)
            if ident is None:
                return None
            col = cols[ident]
            eq = _eq_mask(col, lit)
            val = eq if op == "==" else ~eq
            return val, np.zeros(len(eq), bool)

        if op in _COMPARE_OPS:
            ident, lit, swapped = _ident_literal(node)
            if ident is None:
                return None
            col = cols[ident]
            if swapped:  # literal OP field  ->  field FLIP(OP) literal
                op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
            if isinstance(lit, (int, float)) and not isinstance(lit, bool):
                ok = col.is_num
                a, b = col.nums, float(lit)
            elif isinstance(lit, str):
                ok = col.is_str
                sa = np.where(col.is_str, col.strs, "")
                with np.errstate(all="ignore"):
                    a, b = sa, lit
            else:
                # bool/null literals never compare: every row errors
                n = len(col.present)
                return np.zeros(n, bool), np.ones(n, bool)
            cmp = {">": a > b, ">=": a >= b, "<": a < b,
                   "<=": a <= b}[op]
            val = ok & np.asarray(cmp, dtype=bool)
            return val, ~ok  # missing/None/wrong-type -> EvalError -> reject

        if op in ("IN", "NOT_IN"):
            ident, values = _ident_array(node)
            if ident is None:
                return None
            col = cols[ident]
            n = len(col.present)
            val = np.zeros(n, bool)
            for lit in values:
                val |= _eq_mask(col, lit)
            if op == "NOT_IN":
                val = ~val
            return val, np.zeros(n, bool)

        if op in _STR_OPS:
            ident, lit, swapped = _ident_literal(node)
            if ident is None or swapped or not isinstance(lit, str):
                return None
            col = cols[ident]
            n = len(col.present)
            val = np.zeros(n, bool)
            rows = np.flatnonzero(col.is_str)
            if op == "CONTAINS":
                pred = lambda s: lit in s
            elif op == "STARTS_WITH":
                pred = lambda s: s.startswith(lit)
            elif op == "ENDS_WITH":
                pred = lambda s: s.endswith(lit)
            else:  # MATCHES
                try:
                    rx = re.compile(lit)
                except re.error:
                    # invalid pattern errors every string row like the
                    # per-row engine; non-strings error on the type check
                    return np.zeros(n, bool), np.ones(n, bool)
                pred = lambda s: rx.search(s) is not None
            for i in rows:
                if pred(col.strs[i]):
                    val[i] = True
            return val, ~col.is_str
        return None

    if isinstance(node, FunctionNode):
        if node.name == "EXISTS" and len(node.arguments) == 1 and \
                isinstance(node.arguments[0], IdentifierNode):
            col = cols[node.arguments[0].name]
            return col.present.copy(), np.zeros(len(col.present), bool)
        if node.name == "DOES_NOT_EXIST" and len(node.arguments) == 1 and \
                isinstance(node.arguments[0], IdentifierNode):
            col = cols[node.arguments[0].name]
            return ~col.present, np.zeros(len(col.present), bool)
        return None
    return None


class ColumnarFilterEngine:
    """Owns the per-field projections for one collection; invalidated by
    mutation generation (columns.version)."""

    def __init__(self):
        self._version = -1
        self._cols: dict[str, FieldColumn] = {}
        # a non-dict-JSON metadata row makes EXISTS-family semantics diverge
        # from the global json gate (exists_top returns False without error,
        # compiler.py) — bail to the per-row engine for the whole collection
        self._nondict = False

    def evaluate(self, query: str, columns) -> Optional[np.ndarray]:
        """Boolean keep-mask over columns.size rows, or None to fall back."""
        try:
            ast = parse_query(query)
        except Exception:
            return None
        fields = referenced_fields(ast)
        if fields is None:
            return None
        cols, json_ok = self._project(fields, columns)
        if cols is None:
            return None
        out = _vectorize(ast, cols)
        if out is None:
            return None
        val, err = out
        return val & ~err & json_ok

    def _project_native(self, fields: list, columns) -> bool:
        """Project `fields` with the C extractor; True on success.

        Rows the C parser flags (escapes in relevant strings, exotic
        literals, broken JSON, non-object docs) are re-parsed by python so
        semantics stay identical to the pure-python path."""
        try:
            from ..native import jp_extract
        except Exception:
            return False
        n = columns.size
        live = columns.valid[:n]
        docs = [columns.metadata[r] if live[r] else None for r in range(n)]
        out = jp_extract(docs, fields)
        if out is None:
            return False
        kinds, nums, strs, flags = out

        build_ok = "" not in self._cols
        json_ok = self._cols.get("") or FieldColumn(n)
        for i, f in enumerate(fields):
            col = FieldColumn(n)
            k = kinds[:, i]
            col.present = k != 0
            col.is_num = k == 1
            col.is_str = k == 2
            col.is_bool = k == 3
            col.is_none = k == 4
            col.nums = nums[:, i].copy()
            col.strs = strs[:, i].copy()
            col.scalar = not bool((k == 5).any())
            self._cols[f] = col
        ok_rows = (flags == 0) & live
        if build_ok:
            json_ok.present[:] = False
            json_ok.present[ok_rows] = True
            self._cols[""] = json_ok

        # python fallback for flagged live rows (rare: escapes, NaN, broken).
        # Reset the row's masks FIRST: a flagged row may carry partial native
        # state (e.g. is_str with strs=None when only the escape decode was
        # the problem), and a failed re-parse must leave it fully absent or
        # string predicates crash on the poisoned entry.
        for r in np.flatnonzero((flags == 1) & live):
            r = int(r)
            for f in fields:
                col = self._cols[f]
                col.present[r] = col.is_num[r] = col.is_str[r] = False
                col.is_bool[r] = col.is_none[r] = False
                col.strs[r] = None
            try:
                data = json.loads(columns.metadata[r], parse_int=float)
            except Exception:
                json_ok.present[r] = False
                continue
            if not isinstance(data, dict):
                self._nondict = True
                json_ok.present[r] = False
                continue
            json_ok.present[r] = True
            for f in fields:
                if f in data:
                    self._cols[f].set(r, data[f])
        return True

    def _project(self, fields: set, columns):
        """Projection strategies, fastest available first:

        1. native (native/jsonproj.cpp via syzgydb_tpu.native.jp_extract):
           one C pass over the concatenated docs extracts the REQUESTED
           fields ~10x faster than json.loads; rows the C parser can't
           handle with exact python semantics are re-parsed by python.
        2. pure python: ONE json pass per mutation generation projects
           EVERY top-level key it encounters (amortized across all fields
           any future query touches)."""
        if self._version != columns.version:
            self._cols.clear()
            self._nondict = False
            self._version = columns.version
        n = columns.size
        missing = [f for f in fields if f not in self._cols]
        if missing or "" not in self._cols:
            if self._project_native(missing or list(fields), columns):
                for f in fields:
                    self._cols.setdefault(f, FieldColumn(n))
                if self._nondict or \
                        any(not self._cols[f].scalar for f in fields):
                    return None, None
                return ({f: self._cols[f] for f in fields},
                        self._cols[""].present)
            elif missing and "" in self._cols:
                # native projected an earlier query's fields this generation
                # but can't project the NEW fields — drop the cache so the
                # full python pass below re-projects everything; otherwise
                # the missing fields would silently default to all-absent
                # columns (wrong filter results, not a fallback)
                self._cols.clear()
                self._nondict = False
        if "" not in self._cols:
            cols: dict[str, FieldColumn] = {}
            json_ok = FieldColumn(n)  # .present doubles as json-ok mask
            for row in np.flatnonzero(columns.valid[:n]):
                md = columns.metadata[row]
                try:
                    # None/empty bytes raise, exactly like the per-row
                    # engine's json.loads -> EvalError -> reject
                    data = json.loads(md, parse_int=float)
                except Exception:
                    continue  # json_ok stays False -> row rejected
                if not isinstance(data, dict):
                    self._nondict = True
                    continue
                json_ok.present[row] = True
                r = int(row)
                for key, value in data.items():
                    col = cols.get(key)
                    if col is None:
                        col = cols[key] = FieldColumn(n)
                    col.set(r, value)
            self._cols = cols
            self._cols[""] = json_ok
        # a field no document carries: all-absent column
        for f in fields:
            self._cols.setdefault(f, FieldColumn(n))
        if self._nondict or any(not self._cols[f].scalar for f in fields):
            return None, None
        return {f: self._cols[f] for f in fields}, self._cols[""].present
