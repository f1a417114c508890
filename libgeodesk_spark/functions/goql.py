"""GOQL-lite: compile the reference's selector language to Spark Columns.

Reference grammar (src/match/MatcherParser.cpp:18-54,180-236): a query is
comma-separated selectors (OR); each selector is type letters
(``n|w|a|r|*``) plus zero or more ``[clause]`` predicates (AND). The
reference compiles to bytecode run by MatcherEngine
(src/match/MatcherEngine.cpp:103-332); here the whole matcher compiles
into a single Catalyst Column expression — the interpreter is Catalyst's
codegen, so the "bytecode" is free (SURVEY.md P10).

Supported clauses (P1-P8 of SURVEY.md §2.2):
  [key]           key present and value != 'no'  (MatcherParser.cpp:129-135)
  [!key]          key absent or value == 'no'    (MatcherParser.cpp:61-68)
  [key=v]         equality; value list [k=a,b] is OR (MatcherParser.cpp:141-166)
  [key!=v]        inequality
  [key=v*], [key=*v], [key=*v*]   wildcards (MatcherParser.cpp:313-388)
  [key~"re"], [key!~"re"]         anchored regex (MatcherParser.cpp:263-278)
  [key>n] [key>=n] [key<n] [key<=n]  numeric with string→number coercion
                                  (MatcherEngine.cpp:268-298 STR_TO_NUM)

Types: with a ``type_col``, letters map to values in ``type_values``;
``*`` (or no letters) accepts all.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM = re.compile(r"^-?\d+(\.\d+)?$")


def _scan_clauses(s: str) -> list[str]:
    """Extract [clause] bodies, honoring quotes (a regex may contain ])."""
    out, cur, depth, quote = [], [], 0, None
    for ch in s:
        if depth == 0:
            if ch == "[":
                depth = 1
                cur = []
            continue
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "]":
            depth = 0
            out.append("".join(cur))
        else:
            cur.append(ch)
    if depth or quote:
        raise GoqlError(f"unterminated clause in {s!r}")
    return out

DEFAULT_TYPE_VALUES = {"n": "node", "w": "way", "a": "area", "r": "relation"}


class GoqlError(ValueError):
    pass


def _value_col(resolver, key: str) -> Column:
    return resolver(key)


def _num(col: Column) -> Column:
    """String→number duality (reference STR_TO_NUM via Math::parseDouble).
    try_cast: non-numeric strings become NULL (fail the predicate) instead
    of erroring under ANSI mode."""
    return col.try_cast("double")


def _compile_clause(clause: str, resolver) -> Column:
    clause = clause.strip()
    if not clause:
        raise GoqlError("empty clause")
    if clause.startswith("!"):
        key = clause[1:].strip()
        v = _value_col(resolver, key)
        return v.isNull() | (v == "no")

    m = re.match(r"^([A-Za-z_][\w:]*)\s*(!~|~|!=|>=|<=|=|>|<)?\s*(.*)$", clause)
    if not m:
        raise GoqlError(f"bad clause [{clause}]")
    key, op, rhs = m.group(1), m.group(2), m.group(3).strip()
    v = _value_col(resolver, key)

    if op is None or op == "":
        # [key]: present and != 'no' (reference treats value "no" as absent)
        return v.isNotNull() & (v != "no")

    if op in ("~", "!~"):
        pat = rhs.strip("\"'")
        cond = v.rlike(f"^(?:{pat})$")       # std::regex full-match semantics
        # negated clauses don't require the key (MatcherParser.cpp:139 sets
        # KEY_REQUIRED only for non-negated ops) — missing keys pass !~,
        # consistent with != below
        return cond if op == "~" else (v.isNull() | ~cond)

    if op in (">", ">=", "<", "<="):
        if not _NUM.match(rhs):
            raise GoqlError(f"numeric clause needs a number: [{clause}]")
        n = float(rhs)
        num = _num(v)
        return {"<": num < n, "<=": num <= n,
                ">": num > n, ">=": num >= n}[op]

    # = / != with value list (a,b,c) and wildcards
    values = [x.strip() for x in _split_values(rhs)]
    conds = []
    for raw in values:
        val = raw.strip("\"'")
        if raw and _NUM.match(raw):
            # NULL-SAFE numeric equality: a non-numeric tag value
            # try_casts to NULL, and plain `NULL == 3` is NULL — which
            # would POISON a value-list OR and make [k!=v1,3] reject
            # present-but-non-numeric values (the reference's STR_TO_NUM
            # treats them as simply not-equal). eqNullSafe yields false
            # instead, keeping the OR two-valued.
            conds.append(_num(v).eqNullSafe(F.lit(float(raw))))
        elif val.startswith("*") and val.endswith("*") and len(val) > 1:
            conds.append(v.contains(val[1:-1]))
        elif val.endswith("*"):
            conds.append(v.startswith(val[:-1]))
        elif val.startswith("*"):
            conds.append(v.endswith(val[1:]))
        else:
            conds.append(v == val)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    if op == "!=":
        # negation: absent key passes != (reference: key!=v accepts missing)
        return v.isNull() | ~cond
    return v.isNotNull() & cond


def _split_values(rhs: str) -> list[str]:
    """Split a value list on commas outside quotes."""
    out, cur, quote = [], [], None
    for ch in rhs:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == ",":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [x for x in out if x.strip()]


def _split_selectors(q: str) -> list[str]:
    """Split the query on commas outside brackets/quotes (selector OR)."""
    out, cur, depth, quote = [], [], 0, None
    for ch in q:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s.strip() for s in out if s.strip()]


def compile_goql(query: str, resolver=None, type_col: str | None = None,
                 type_values: dict[str, str] = DEFAULT_TYPE_VALUES) -> Column:
    """Compile a GOQL-lite query to one boolean Column."""
    if resolver is None:
        def resolver(key):
            return F.col(key).cast("string")

    sel_conds = []
    for sel in _split_selectors(query):
        bracket = sel.find("[")
        letters = (sel if bracket < 0 else sel[:bracket]).strip()
        if not re.match(r"^[nwar*]*$", letters):
            raise GoqlError(f"bad selector {sel!r}")
        cond = F.lit(True)
        if type_col and letters and "*" not in letters:
            accepted = [type_values[c] for c in letters]
            cond = cond & F.col(type_col).isin(accepted)
        if bracket >= 0:
            for body in _scan_clauses(sel[bracket:]):
                cond = cond & _compile_clause(body, resolver)
        sel_conds.append(cond)
    out = sel_conds[0]
    for c in sel_conds[1:]:
        out = out | c
    return out


def tags_resolver(tags_col: str = "tags"):
    """Resolver for the reference's FAITHFUL tag model: a dynamic
    ``map<string,string>`` column (TagTable analog — OSM tags are
    sparse key→value, not fixed columns). ``element_at`` returns NULL
    for absent keys, which is exactly the matcher's missing-key
    semantics; the lookup is a JVM map probe inside codegen, the
    column-store analog of the reference's tag-table walk
    (MatcherEngine.cpp:103-332 LOAD_CODE/global-key scan)."""
    def resolver(key):
        return F.element_at(F.col(tags_col), key).cast("string")
    return resolver


def goql_filter(df: DataFrame, query: str, tags_col: str | None = None,
                **kw) -> DataFrame:
    """`Features("...")( "na[amenity=pub]" )` analog: declarative filter.

    ``tags_col``: resolve clause keys against a map<string,string>
    column instead of top-level columns (the OSM-faithful tag model)."""
    if tags_col is not None:
        kw.setdefault("resolver", tags_resolver(tags_col))
    return df.filter(compile_goql(query, **kw))
