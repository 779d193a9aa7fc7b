"""Chain rewrite: compile nested text-named ST_ compositions onto the WKB
binary carrier (r8 verdict item 1).

A user spelling the reference's own chain —
``F.expr("ST_Area(ST_Buffer(ST_GeomFromWKT(w), d))")``, the shape of
``spark_job/process_geodata.py:120-139`` — pays a WKT text round trip
between every stage: each registered pandas UDF parses its WKT input and
serializes WKT output. The ``_B`` twins (functions/geomb.py) chain through
WKB ``BinaryType`` with packed-numpy batch kernels instead, which the r7/r8
profiles measured at ~63% of chained scalar cost saved.

This module is the expression/builder layer that makes the TEXT SPELLING
get carrier speed: ``rewrite(expr)`` parses a SQL expression string, finds
maximal subtrees where every node has a registered ``_B`` twin and at least
one geometry argument is itself a twin-covered producer (i.e. a real chain,
not a lone call), and re-emits them as the ``_B`` pipeline — ``
ST_GeomFromWKT_B`` at the text→WKB edge, ``ST_AsText_B`` wherever a
geometry value surfaces back to the user. Single un-chained calls are left
on the text path (rewriting them would ADD a WKB hop without removing a
WKT one). Binary==text parity for every twin is property-pinned by
tests/test_binary_carrier.py; the rewritten path is pinned by
tests/test_chainrw.py.

Spark-first note: chained Python UDFs in one projection are collapsed by
Catalyst into a single ArrowEvalPython node, so the WKB bytes between
stages never hit an exchange — the rewrite changes serialization format
and kernel, not the shuffle structure (plan-audited).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- specs
#
# text name (lower) -> (B name, geometry-arg positions, output kind)
# output kind: "geom"  = twin returns WKB (text version returns WKT)
#              "scalar" = twin returns the same scalar as the text twin
#              "text"  = twin already returns text (ST_AsText_B)
_SPEC = {
    "st_geomfromwkt": ("ST_GeomFromWKT_B", (), "geom"),
    "st_geomfromtext": ("ST_GeomFromWKT_B", (), "geom"),
    "st_astext": ("ST_AsText_B", (0,), "text"),
    "st_area": ("ST_Area_B", (0,), "scalar"),
    "st_npoints": ("ST_NPoints_B", (0,), "scalar"),
    "st_numpoints": ("ST_NPoints_B", (0,), "scalar"),
    "st_length": ("ST_Length_B", (0,), "scalar"),
    "st_x": ("ST_X_B", (0,), "scalar"),
    "st_y": ("ST_Y_B", (0,), "scalar"),
    "st_centroid": ("ST_Centroid_B", (0,), "geom"),
    "st_envelope": ("ST_Envelope_B", (0,), "geom"),
    "st_transform": ("ST_Transform_B", (0,), "geom"),
    "st_bufferround": ("ST_BufferRound_B", (0,), "geom"),
    "st_distance": ("ST_Distance_B", (0, 1), "scalar"),
    "st_intersects": ("ST_Intersects_B", (0, 1), "scalar"),
    "st_disjoint": ("ST_Disjoint_B", (0, 1), "scalar"),
    "st_touches": ("ST_Touches_B", (0, 1), "scalar"),
    "st_overlaps": ("ST_Overlaps_B", (0, 1), "scalar"),
    "st_equals": ("ST_Equals_B", (0, 1), "scalar"),
    "st_contains": ("ST_Contains_B", (0, 1), "scalar"),
    "st_within": ("ST_Within_B", (0, 1), "scalar"),
    "st_crosses": ("ST_Crosses_B", (0, 1), "scalar"),
}

# Hygiene names are near-identity on the text surface (geometry is
# carried AS canonical WKT: st_astext is `return s`, st_geomfromwkt is a
# fixed-point check on canonical input) — a chain made ONLY of these is
# cheaper on text than any carrier round trip, so rewriting requires at
# least one genuine compute op in the chain.
_HYGIENE = {"st_geomfromwkt", "st_geomfromtext", "st_astext"}

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class _Call:
    __slots__ = ("name", "args")

    def __init__(self, name: str, args: list):
        self.name = name          # as written
        self.args = args          # list of _Expr


class _Expr:
    """A flat sequence of raw text fragments and _Call nodes."""

    __slots__ = ("items",)

    def __init__(self, items: list):
        self.items = items

    def sole_call(self):
        """The single _Call if this expr is exactly one call (allowing
        surrounding whitespace), else None."""
        calls = [x for x in self.items if isinstance(x, _Call)]
        raws = "".join(x for x in self.items if isinstance(x, str))
        if len(calls) == 1 and raws.strip() == "":
            return calls[0]
        return None


def _parse(s: str, i: int = 0, stop_at_paren: bool = False):
    """Parse s[i:] into an _Expr, stopping (exclusive) at an unbalanced
    ')' or at a top-level ',' when stop_at_paren. Returns (expr_items,
    next_index, stopped_char)."""
    items: list = []
    buf: list = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":                                # SQL string literal
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(s[i:j + 1])
            i = j + 1
            continue
        if c == "`":                                # backticked identifier
            j = s.find("`", i + 1)
            j = n - 1 if j < 0 else j
            buf.append(s[i:j + 1])
            i = j + 1
            continue
        if stop_at_paren and c in "),":
            break
        m = _IDENT.match(s, i)
        if m:
            name = m.group(0)
            j = m.end()
            k = j
            while k < n and s[k] in " \t\n":
                k += 1
            if k < n and s[k] == "(":
                # function call: parse comma-separated args
                args = []
                k += 1
                while True:
                    sub, k, stopped = _parse(s, k, stop_at_paren=True)
                    args.append(_Expr(sub))
                    if stopped == ",":
                        k += 1
                        continue
                    if stopped == ")":
                        k += 1
                        break
                    break                            # EOF: tolerate
                if buf:
                    items.append("".join(buf))
                    buf = []
                # zero-arg calls parse as one empty arg; canonicalize
                if len(args) == 1 and not args[0].items:
                    args = []
                items.append(_Call(name, args))
                i = k
                continue
            buf.append(name)
            i = j
            continue
        buf.append(c)
        i += 1
    if buf:
        items.append("".join(buf))
    if stop_at_paren:
        return items, i, (s[i] if i < n else "")
    return items, i, ""


def _producer(call: _Call):
    """Twin spec if this call produces geometry (its B twin returns WKB)."""
    spec = _SPEC.get(call.name.lower())
    if spec and spec[2] == "geom":
        return spec
    return None


def _chain_stats(call: _Call):
    """(size, compute) over the maximal B-chain rooted here: size counts
    twin-covered calls (this call + recursively, geometry args that are
    sole producer calls); compute is True if any of them is a genuine
    compute op (not text-identity hygiene)."""
    spec = _SPEC.get(call.name.lower())
    if spec is None:
        return 0, False
    total = 1
    compute = call.name.lower() not in _HYGIENE
    for pos in spec[1]:
        if pos < len(call.args):
            inner = call.args[pos].sole_call()
            if inner is not None and _producer(inner):
                sz, cp = _chain_stats(inner)
                total += sz
                compute = compute or cp
    return total, compute


def _emit_b(call: _Call) -> str:
    """Emit the B-twin form of a twin-covered call; geometry args become
    WKB (nested producer chains stay binary, everything else parses once
    at the edge via ST_GeomFromWKT_B)."""
    b_name, geom_args, _ = _SPEC[call.name.lower()]
    parts = []
    for i, arg in enumerate(call.args):
        if i in geom_args:
            inner = arg.sole_call()
            if inner is not None and _producer(inner):
                parts.append(_emit_b(inner))
            else:
                parts.append(
                    f"ST_GeomFromWKT_B({_emit_expr(arg).strip()})")
        else:
            parts.append(_emit_expr(arg).strip())
    return f"{b_name}({', '.join(parts)})"


#: scalar-consumer fusions (r13): (outer, inner) -> fused text function.
#: The fused kernel computes the outer scalar WITHOUT materializing the
#: inner geometry (ST_NPoints∘ST_Segmentize is a pure vertex-count
#: formula; the densified ring itself is never built). Applied before
#: the carrier rewrite; fused == composition is parity-pinned
#: (tests/test_chainrw.py).
_FUSE = {
    ("st_npoints", "st_segmentize"): "ST_SegmentizeNPoints",
    ("st_numpoints", "st_segmentize"): "ST_SegmentizeNPoints",
}


def _emit_call(call: _Call) -> str:
    fuse_inner = call.args[0].sole_call() if len(call.args) == 1 else None
    if fuse_inner is not None:
        fused = _FUSE.get((call.name.lower(), fuse_inner.name.lower()))
        if fused is not None:
            inner = ",".join(_emit_expr(a) for a in fuse_inner.args)
            return f"{fused}({inner})"
    spec = _SPEC.get(call.name.lower())
    size, compute = _chain_stats(call) if spec is not None else (0, False)
    if spec is not None and size >= 2 and compute:
        core = _emit_b(call)
        if spec[2] == "geom":
            # geometry surfacing to the user: canonical WKT text edge
            # (ST_AsText_B(ST_GeomFromWKT_B(w)) == ST_GeomFromWKT(w),
            # pinned by the binary==text property suite)
            return f"ST_AsText_B({core})"
        return core
    # not rewritable here — still recurse: chains may hide in any arg.
    # Join with a bare "," (args keep their original surrounding
    # whitespace) so an untouched subtree reproduces its input verbatim.
    inner = ",".join(_emit_expr(a) for a in call.args)
    return f"{call.name}({inner})"


def _emit_expr(expr: _Expr) -> str:
    return "".join(x if isinstance(x, str) else _emit_call(x)
                   for x in expr.items)


def rewrite(expr: str) -> str:
    """Rewrite one SQL expression string: every maximal nested
    registered-ST_ composition (chain of >= 2 twin-covered calls) is
    re-emitted on the WKB carrier; everything else is returned verbatim.
    SPARK_GRAFT_NO_CHAINRW=1 disables the rewrite (A/B benchmarking and
    parity probes run the same query text down both paths)."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_CHAINRW"):
        return expr
    items, _, _ = _parse(expr)
    return _emit_expr(_Expr(items))


def st_expr(expr: str) -> Column:
    """F.expr with the chain rewrite applied — the engine's builder for
    text-spelled ST_ compositions."""
    return F.expr(rewrite(expr))


def select_st(df: DataFrame, *exprs: str) -> DataFrame:
    """df.selectExpr with the chain rewrite applied to every expression.
    Registration (text + _B twins) must already have happened
    (functions.spatial.register_spatial_functions)."""
    return df.select(*[st_expr(e) for e in exprs])


def sql_st(spark: SparkSession, sql: str) -> DataFrame:
    """spark.sql with the engine rewrites applied to the whole statement:
    first the ST_Union_Aggr auto-salt (salt_union_aggr_sql below), then
    the carrier chain rewrite — both safe because they only touch
    recognized ST_ call trees / the strict canonical GROUP BY shape and
    copy every other token (strings, identifiers, keywords) verbatim."""
    from .spatial import register_spatial_functions

    register_spatial_functions(spark)
    return spark.sql(rewrite(salt_union_aggr_sql(sql)))


# ---------------------------------------------- ST_Union_Aggr auto-salt

UNION_AGGR_SALT_BUCKETS = 16


def _depth0_scan(s: str):
    """Yield (i, ch) for characters at paren depth 0 outside string
    literals / backticks."""
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "`":
            j = s.find("`", i + 1)
            i = (n if j < 0 else j) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif depth == 0:
            yield i, c
        i += 1


def _split_top(s: str) -> list:
    """Split at depth-0 commas."""
    cuts = [i for i, c in _depth0_scan(s) if c == ","]
    parts, prev = [], 0
    for i in cuts:
        parts.append(s[prev:i])
        prev = i + 1
    parts.append(s[prev:])
    return parts


def _kw_positions(s: str, kw: str) -> list:
    """Start indices of depth-0 word-boundary occurrences of kw (which
    may contain a space, e.g. 'group by')."""
    low = s.lower()
    pat = re.compile(r"(?<![A-Za-z0-9_])" + kw.replace(" ", r"\s+")
                     + r"(?![A-Za-z0-9_])")
    d0 = {i for i, _ in _depth0_scan(s)}
    return [m.start() for m in pat.finditer(low) if m.start() in d0]


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


def _ua_calls(expr: _Expr, out: list):
    """Collect every st_union_aggr _Call in the tree (any depth)."""
    for it in expr.items:
        if isinstance(it, _Call):
            if it.name.lower() == "st_union_aggr":
                out.append(it)
            for a in it.args:
                _ua_calls(a, out)


_OTHER_AGGS = re.compile(
    r"(?<![A-Za-z0-9_])(count|sum|min|max|avg|first|last|collect_list|"
    r"collect_set|st_envelope_aggr|st_intersection_aggr|st_collect_aggr)"
    r"\s*\(", re.IGNORECASE)


def salt_union_aggr_sql(sql: str, buckets: int = UNION_AGGR_SALT_BUCKETS
                        ) -> str:
    """Auto-salt the registered ST_Union_Aggr SQL name (r8 verdict
    item 8): rewrite

        SELECT keys..., <expr over ST_Union_Aggr(g)> AS u
        FROM body GROUP BY keys

    into the two-phase salted plan (functions/spatial.salted_union_aggr,
    driver-verified by `st_union_aggr_salted`): phase 1 groups by
    (keys, pmod(xxhash64(g), buckets)) computing partial unions, phase 2
    unions the <= buckets partials per group — geometric union is
    associative and commutative, so the result is IDENTICAL while no
    single task ever aggregates more than ~1/buckets of a hot key's rows.

    On the verdict's "above a group-size threshold": group sizes are
    unknowable at SQL-rewrite time without table stats, and the two-phase
    overhead is one extra exchange of <= buckets x groups narrow partial
    rows — negligible at every size — so the rewrite is unconditional for
    statements it recognizes (strictly safer than thresholding on a
    guess). SPARK_GRAFT_NO_UNION_AGGR_SALT=1 disables (A/B probes).

    Strictly scoped: the statement must be a single depth-0
    SELECT ... FROM ... GROUP BY ... block (no HAVING / ORDER BY / LIMIT /
    DISTINCT / UNION / WINDOW at depth 0), every select item must be
    either a group key (textually, or `key AS alias`) or an aliased
    expression over >= 1 ST_Union_Aggr call and no other aggregate.
    Anything else is returned verbatim (the plain bounded-hold UDAF path
    still applies)."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_UNION_AGGR_SALT"):
        return sql
    if "st_union_aggr" not in sql.lower():
        return sql
    stmt = sql.rstrip().rstrip(";")
    sel = _kw_positions(stmt, "select")
    frm = _kw_positions(stmt, "from")
    grp = _kw_positions(stmt, "group by")
    if (len(sel) != 1 or len(frm) != 1 or len(grp) != 1
            or sel[0] != len(stmt) - len(stmt.lstrip())):
        return sql
    for bad in ("having", "order by", "limit", "distinct", "union",
                "window", "qualify", "with"):
        if _kw_positions(stmt, bad):
            return sql
    select_list = stmt[sel[0] + 6:frm[0]]
    body = stmt[frm[0] + 4:grp[0]]
    keys_txt = stmt[grp[0] + len(stmt[grp[0]:grp[0] + 10].rstrip()
                                  .split()[0]):]
    # "group by" spans two words; recompute the slice robustly
    m = re.match(r"group\s+by", stmt[grp[0]:], re.IGNORECASE)
    keys_txt = stmt[grp[0] + m.end():]
    keys = [k.strip() for k in _split_top(keys_txt)]
    key_norm = {_norm_ws(k).lower() for k in keys}

    partials: list = []          # (arg_text, partial_name)

    def partial_for(arg_text: str) -> str:
        for t, name in partials:
            if _norm_ws(t) == _norm_ws(arg_text):
                return name
        name = f"__ua_p{len(partials)}"
        partials.append((arg_text, name))
        return name

    outer_items: list = []
    inner_keys: list = []        # key expr text as written (with alias)

    for item in _split_top(select_list):
        raw = item.strip()
        if not raw:
            return sql
        # trailing depth-0 alias
        alias = None
        expr_txt = raw
        as_pos = _kw_positions(raw, "as")
        if as_pos:
            tail = raw[as_pos[-1] + 2:].strip()
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*|`[^`]+`", tail):
                alias = tail
                expr_txt = raw[:as_pos[-1]].strip()
        if _norm_ws(expr_txt).lower() in key_norm:
            inner_keys.append(raw)       # keep alias in the inner select
            outer_items.append(alias or expr_txt)
            continue
        if "st_union_aggr" not in expr_txt.lower():
            return sql
        if alias is None or _OTHER_AGGS.search(expr_txt):
            return sql
        items, _, _ = _parse(expr_txt)
        tree = _Expr(items)
        calls: list = []
        _ua_calls(tree, calls)
        if not calls:
            return sql

        def emit(e: _Expr) -> str:
            out = []
            for it in e.items:
                if isinstance(it, str):
                    out.append(it)
                elif it.name.lower() == "st_union_aggr":
                    if len(it.args) != 1:
                        raise ValueError
                    out.append("ST_Union_Aggr("
                               + partial_for(_emit_expr(it.args[0]).strip())
                               + ")")
                else:
                    out.append(f"{it.name}("
                               + ",".join(emit(a) for a in it.args) + ")")
            return "".join(out)

        try:
            outer_items.append(f"{emit(tree)} AS {alias}")
        except ValueError:
            return sql

    if not partials:
        return sql
    salt = (f"pmod(xxhash64({partials[0][0]}), {buckets})")
    inner_aggs = ", ".join(
        f"ST_Union_Aggr({t}) AS {name}" for t, name in partials)
    inner = (f"SELECT {', '.join(inner_keys)}, {inner_aggs} "
             f"FROM {body.strip()} "
             f"GROUP BY {', '.join(keys)}, {salt}")
    outer_keys = []
    for item in _split_top(select_list):
        raw = item.strip()
        as_pos = _kw_positions(raw, "as")
        expr_txt = raw[:as_pos[-1]].strip() if as_pos else raw
        if _norm_ws(expr_txt).lower() in key_norm:
            outer_keys.append(raw[as_pos[-1] + 2:].strip() if as_pos
                              else raw)
    return (f"SELECT {', '.join(outer_items)} FROM ({inner}) "
            f"GROUP BY {', '.join(outer_keys)}")
