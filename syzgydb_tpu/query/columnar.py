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
    seconds;
  * path expressions: nested dotted paths (`a.b.c`), literal array indexing
    (`tags[0]`), `.length`, `LENGTH(x)`, and `:param` placeholders project
    into derived "path columns".  `:param` derives for free from the root
    field's top-level column (the reference resolves parameters against the
    document map itself — compiler.py:106-112); other non-trivial paths pay
    ONE python parse+walk pass per (new path set, mutation generation),
    cached thereafter — the cost of a single fallback query amortized over
    every query that touches the path.  Field-vs-field predicates
    (`price > cost`, `name == :expected`) vectorize as column-vs-column
    masks.

Error-semantics parity with query/compiler.py (which mirrors the Go
compiler's eager evaluation): every node's (value, error) pair is tracked as
two masks; an error anywhere in the tree rejects the row, exactly like the
exception path in build_filter.  Path extraction records per-row errors in
FieldColumn.err (e.g. `.` on a missing nested key raises, while an
out-of-bounds `[i]` yields nil — compiler.py:244-264).  Queries or field
values outside the supported shapes (ANY/ALL quantifiers, non-literal array
indices, array-valued terminal values) return None and the caller falls
back to the per-row engine — semantics first, speed second.
"""

from __future__ import annotations

import json
import re
from typing import Optional

import numpy as np

from .parser import (ArrayNode, ExpressionNode, FunctionNode, IdentifierNode,
                     Node, ParameterNode, ValueNode, parse_query)

_COMPARE_OPS = (">", ">=", "<", "<=")
_EQ_OPS = ("==", "!=")
_STR_OPS = ("CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES")


class FieldColumn:
    """Typed columnar projection of one top-level metadata key or one
    derived path expression (a.b.c, tags[0], LENGTH(x), :param)."""

    __slots__ = ("present", "is_num", "is_str", "is_bool", "is_none",
                 "nums", "strs", "scalar", "err")

    def __init__(self, n: int):
        self.present = np.zeros(n, bool)
        self.is_num = np.zeros(n, bool)   # non-bool JSON numbers
        self.is_str = np.zeros(n, bool)
        self.is_bool = np.zeros(n, bool)
        self.is_none = np.zeros(n, bool)  # explicit JSON null
        self.nums = np.zeros(n, np.float64)  # numbers and bools (0/1)
        self.strs = np.empty(n, object)
        self.scalar = True  # False once any row holds an array/object
        # rows whose EXTRACTION raised EvalError (path columns only: `.` on
        # a missing key / non-container, `:param` absent, LENGTH of a
        # non-sized value) — any predicate touching the column rejects them
        self.err = np.zeros(n, bool)

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


def _path_of(node) -> Optional[tuple]:
    """Canonical step tuple for a "path expression" — an identifier,
    `:param`, a dotted/indexed chain, or LENGTH(path) — else None.

    Steps: ("id", name) root, ("param", name) root, ("key", k) for `.k`,
    ("idx", i) for a literal `[i]`, ("len",) for LENGTH(...)."""
    if isinstance(node, IdentifierNode):
        return (("id", node.name),)
    if isinstance(node, ParameterNode):
        return (("param", node.name),)
    if isinstance(node, FunctionNode):
        if node.name == "LENGTH" and len(node.arguments) == 1:
            base = _path_of(node.arguments[0])
            return None if base is None else base + (("len",),)
        return None
    if isinstance(node, ExpressionNode):
        if node.operator == ".":
            base = _path_of(node.left)
            if base is None or not isinstance(node.right, IdentifierNode):
                return None
            return base + (("key", node.right.name),)
        if node.operator == "[]":
            base = _path_of(node.left)
            idx = node.right
            if base is None or not isinstance(idx, ValueNode) \
                    or isinstance(idx.value, bool) \
                    or not isinstance(idx.value, (int, float)):
                return None
            # int(round(float)) replicates the per-row engine
            # (compiler.py:261); negative/OOB indices evaluate to nil there
            return base + (("idx", int(round(float(idx.value)))),)
        return None
    return None


def _is_trivial(path: tuple) -> bool:
    """A bare top-level identifier (projects via the native extractor)."""
    return len(path) == 1 and path[0][0] == "id"


def _col_key(path: tuple):
    """Cache key in the engine's column dict: plain field name for trivial
    identifiers (shared with the native projection), the step tuple
    otherwise — the types can't collide."""
    return path[0][1] if _is_trivial(path) else path


def referenced_paths(node) -> Optional[set]:
    """Path expressions the query touches (as step tuples), or None if the
    query uses any construct the vectorizer does not support."""
    if isinstance(node, ExpressionNode):
        op = node.operator
        if op in ("AND", "OR"):
            lf = referenced_paths(node.left)
            rf = referenced_paths(node.right)
            return None if lf is None or rf is None else lf | rf
        if op == "NOT":
            return referenced_paths(node.right)
        if op in _COMPARE_OPS + _EQ_OPS:
            out = set()
            for side in (node.left, node.right):
                if isinstance(side, ValueNode):
                    continue
                p = _path_of(side)
                if p is None:
                    return None
                out.add(p)
            return out or None  # literal-vs-literal: fall back
        if op in _STR_OPS:
            # needle/pattern must be a literal string (a per-row regex
            # compile would defeat the point); subject must be a path
            p = _path_of(node.left)
            if p is None or not isinstance(node.right, ValueNode):
                return None
            return {p}
        if op in ("IN", "NOT_IN"):
            p = _path_of(node.left)
            if p is None or not isinstance(node.right, ArrayNode) or \
                    not all(isinstance(e, ValueNode)
                            for e in node.right.elements):
                return None
            return {p}
        return None
    if isinstance(node, FunctionNode):
        if node.name == "EXISTS" and len(node.arguments) == 1:
            p = _path_of(node.arguments[0])
            return None if p is None else {p}
        if node.name == "DOES_NOT_EXIST" and len(node.arguments) == 1 \
                and isinstance(node.arguments[0], IdentifierNode):
            return {(("id", node.arguments[0].name),)}
        return None
    return None


def _operand(node, cols):
    """("lit", value) | ("col", FieldColumn) | (None, None)."""
    if isinstance(node, ValueNode):
        return "lit", node.value
    p = _path_of(node)
    if p is None:
        return None, None
    return "col", cols[_col_key(p)]


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


def _null_mask(col: FieldColumn) -> np.ndarray:
    """Rows whose value is Go-nil: explicit null, a missing top-level key
    (ident closure returns None), or an OOB index (compiler.py:262-263).
    Extraction-error rows are excluded — they reject regardless."""
    return col.is_none | (~col.present & ~col.err)


def _eq_cols(a: FieldColumn, b: FieldColumn) -> tuple:
    """Vectorized _deep_equal(a, b) per row (compiler.py:48-57): same-typed
    scalars compare by value, bool never equals number, nil == nil."""
    with np.errstate(all="ignore"):
        streq = np.asarray(a.strs == b.strs, dtype=bool)
    val = (a.is_num & b.is_num & (a.nums == b.nums)) \
        | (a.is_bool & b.is_bool & (a.nums == b.nums)) \
        | (a.is_str & b.is_str & streq) \
        | (_null_mask(a) & _null_mask(b))
    return val, a.err | b.err


def _cmp_cols(op: str, a: FieldColumn, b: FieldColumn) -> tuple:
    """Vectorized _compare(a, b): num-num or str-str, else per-row error."""
    ok_num = a.is_num & b.is_num
    ok_str = a.is_str & b.is_str
    cmp = {">": np.greater, ">=": np.greater_equal,
           "<": np.less, "<=": np.less_equal}[op]
    val = ok_num & cmp(a.nums, b.nums)
    if ok_str.any():
        sa = np.where(a.is_str, a.strs, "")
        sb = np.where(b.is_str, b.strs, "")
        with np.errstate(all="ignore"):
            val = val | (ok_str & np.asarray(cmp(sa, sb), dtype=bool))
    return val, ~(ok_num | ok_str) | a.err | b.err


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
            lk, lval = _operand(node.left, cols)
            rk, rval = _operand(node.right, cols)
            if lk is None or rk is None:
                return None
            if lk == "col" and rk == "col":
                val, err = _eq_cols(lval, rval)
            else:  # referenced_paths guarantees at least one column side
                col, lit = (lval, rval) if lk == "col" else (rval, lval)
                val, err = _eq_mask(col, lit), col.err
            if op == "!=":
                val = ~val
            return val, err

        if op in _COMPARE_OPS:
            lk, lval = _operand(node.left, cols)
            rk, rval = _operand(node.right, cols)
            if lk is None or rk is None:
                return None
            if lk == "col" and rk == "col":
                return _cmp_cols(op, lval, rval)
            if lk == "lit":  # literal OP field  ->  field FLIP(OP) literal
                op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
                col, lit = rval, lval
            else:
                col, lit = lval, rval
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
            # missing/None/wrong-type -> EvalError -> reject
            return val, ~ok | col.err

        if op in ("IN", "NOT_IN"):
            p = _path_of(node.left)
            if p is None or not isinstance(node.right, ArrayNode):
                return None
            values = [e.value for e in node.right.elements]
            col = cols[_col_key(p)]
            n = len(col.present)
            val = np.zeros(n, bool)
            for lit in values:
                val |= _eq_mask(col, lit)
            if op == "NOT_IN":
                val = ~val
            return val, col.err.copy()

        if op in _STR_OPS:
            p = _path_of(node.left)
            lit = node.right.value if isinstance(node.right, ValueNode) \
                else None
            if p is None or not isinstance(lit, str):
                return None
            col = cols[_col_key(p)]
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
            return val, ~col.is_str | col.err
        return None

    if isinstance(node, FunctionNode):
        if node.name == "EXISTS" and len(node.arguments) == 1:
            p = _path_of(node.arguments[0])
            if p is None:
                return None
            col = cols[_col_key(p)]
            if _is_trivial(p):
                # top-level key: `key in data` (compiler.py exists_top)
                return col.present.copy(), np.zeros(len(col.present), bool)
            # path: any evaluation that doesn't raise counts, including nil
            # from an OOB index (compiler.py exists closure)
            return ~col.err, np.zeros(len(col.err), bool)
        if node.name == "DOES_NOT_EXIST" and len(node.arguments) == 1 and \
                isinstance(node.arguments[0], IdentifierNode):
            col = cols[node.arguments[0].name]
            return ~col.present, np.zeros(len(col.present), bool)
        return None
    return None


class _PathError(Exception):
    """Per-row extraction error — mirrors compiler.EvalError reject-row."""


def _eval_path_steps(data: dict, steps: tuple):
    """Walk one path over a parsed document with the per-row engine's exact
    semantics (compiler.py: ident :88-94, param :106-112, `.` :244-254,
    `[]` :255-264, LENGTH :152-158).  Returns the terminal value (None for
    Go-nil) or raises _PathError where the closure would raise EvalError."""
    v = data
    for st in steps:
        tag = st[0]
        if tag == "id":
            v = v.get(st[1])  # missing top-level key -> nil, no error
        elif tag == "param":
            if st[1] not in v:
                raise _PathError  # "parameter not provided"
            v = v[st[1]]
        elif tag == "key":
            if isinstance(v, dict):
                if st[1] not in v:
                    raise _PathError  # "key not found in map"
                v = v[st[1]]
            elif isinstance(v, list):
                if st[1] != "length":
                    raise _PathError  # "invalid operation on array"
                v = float(len(v))
            else:
                raise _PathError  # '.' on scalar/nil
        elif tag == "idx":
            if not isinstance(v, list):
                raise _PathError  # '[]' on non-array
            i = st[1]
            v = v[i] if 0 <= i < len(v) else None  # OOB -> nil
        else:  # ("len",)
            if not isinstance(v, (str, list, dict)):
                raise _PathError  # LENGTH of unsized value (incl. nil)
            v = float(len(v))
    return v


def _param_column(col: FieldColumn) -> FieldColumn:
    """`:p` resolves against the document map like an identifier, except a
    missing key is an EvalError instead of nil (compiler.py:106-112) — so
    the parameter column IS the field's column plus an absence error mask.
    Mask/value arrays are shared (projections are immutable per
    generation)."""
    pc = FieldColumn(0)
    pc.present = col.present
    pc.is_num = col.is_num
    pc.is_str = col.is_str
    pc.is_bool = col.is_bool
    pc.is_none = col.is_none
    pc.nums = col.nums
    pc.strs = col.strs
    pc.scalar = col.scalar
    pc.err = ~col.present
    return pc


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
        paths = referenced_paths(ast)
        if paths is None:
            return None
        cols, json_ok = self._project_all(paths, columns)
        if cols is None:
            return None
        out = _vectorize(ast, cols)
        if out is None:
            return None
        val, err = out
        return val & ~err & json_ok

    def _project_all(self, paths: set, columns):
        """Column dict keyed by _col_key for every referenced path, plus the
        json-ok row mask; (None, None) to fall back.

        Trivial identifiers and `:param` roots ride the (native-accelerated)
        top-level projection — a parameter column is the root field's column
        with absence turned into a per-row error (compiler.py:106-112).
        Other paths project via one python parse+walk pass, cached per
        (path, mutation generation)."""
        trivial: set = set()
        params: set = set()
        nontrivial = []
        for p in paths:
            if _is_trivial(p):
                trivial.add(p[0][1])
            elif len(p) == 1 and p[0][0] == "param":
                params.add(p[0][1])
            else:
                nontrivial.append(p)
        base, json_ok = self._project(trivial | params, columns)
        if base is None:
            return None, None
        cols = {f: base[f] for f in trivial}
        for pname in params:
            key = (("param", pname),)
            hit = self._cols.get(key)
            if hit is None:
                hit = self._cols[key] = _param_column(base[pname])
            cols[key] = hit
        if nontrivial:
            pcols = self._project_paths(nontrivial, columns)
            if pcols is None:
                return None, None
            cols.update(pcols)
        return cols, json_ok

    def _project_paths(self, paths: list, columns) -> Optional[dict]:
        """Derived columns for non-trivial paths: ONE pass over the live
        rows parses each document and walks every requested path with the
        per-row engine's exact semantics (_eval_path_steps)."""
        n = columns.size
        missing = [p for p in paths if p not in self._cols]
        if missing:
            built = {p: FieldColumn(n) for p in missing}
            items = list(built.items())
            for row in np.flatnonzero(columns.valid[:n]):
                md = columns.metadata[row]
                try:
                    # parse_int=float: Go decodes every number as float64
                    data = json.loads(md, parse_int=float)
                except Exception:
                    continue  # json_ok (from _project) rejects the row
                if not isinstance(data, dict):
                    self._nondict = True
                    continue
                r = int(row)
                for p, col in items:
                    try:
                        v = _eval_path_steps(data, p)
                    except _PathError:
                        col.err[r] = True
                        continue
                    if v is not None:
                        col.set(r, v)
                    # v is None (missing root / OOB index): leave absent —
                    # every mask treats that exactly like Go-nil
            self._cols.update(built)
        if self._nondict or any(not self._cols[p].scalar for p in paths):
            return None
        return {p: self._cols[p] for p in paths}

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
