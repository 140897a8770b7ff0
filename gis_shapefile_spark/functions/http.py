"""HTTP request-plumbing kernels (the engine counterpart of F14).

The reference's only entry point with no engine twin until now was its
HTTP server (``/root/reference/server/main.cpp:87-228``): ``urlDecode``
(percent-decode + '+'→space, main.cpp:186-204), ``extractParameter``
(regex ``param=([^&]+)``, main.cpp:178-184) and the ``/geocode`` /
``/reverse`` endpoint dispatch. A DataFrame engine has no socket loop —
its natural form of that surface is a REQUEST TABLE: a column of request
strings parsed by the same three functions, batch-routed into the
already-implemented geocode operators. This module provides those
functions as dual-dialect SQL (same style as ``functions/cells.py``), so
request parsing is whole-stage-codegen and oracle value-checkable.

Determinism: ``url_decode_sql`` replicates the reference decoder over a
BOUNDED escape set (the characters a geocode query produces) as a
chained ``replace`` — textually identical in both dialects. Spark's
``url_decode`` builtin exists but DuckDB has no counterpart, and a
general %XX loop is not expressible as one SQL scalar; the bounded chain
is bit-identical in both engines and raises nothing on unknown escapes
(they pass through untouched, exactly like the reference's failed-hex
branch, main.cpp:195-197).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decode order matters: '+'→' ' FIRST, so a '+' produced by %2B is not
# re-decoded (the reference's single pass has the same property). The
# reference's hex parse is case-insensitive (istringstream >> hex), so
# every escape with hex letters appears in both cases.
_ESCAPE_CHARS = [("20", " "), ("2C", ","), ("2B", "+"), ("23", "#"),
                 ("26", "&"), ("3D", "="), ("3F", "?"), ("2F", "/")]
URL_ESCAPES: list[tuple[str, str]] = [("+", " ")] + [
    (f"%{hx}", ch)
    for hex_upper, ch in _ESCAPE_CHARS
    for hx in dict.fromkeys((hex_upper, hex_upper.lower()))
]


def url_decode_sql(expr: str, dialect: str = "spark") -> str:
    """Reference urlDecode over the bounded escape set (both dialects)."""
    out = expr
    for esc, ch in URL_ESCAPES:
        out = f"replace({out}, '{esc}', '{ch}')"
    return out


def extract_param_sql(query: str, param: str, dialect: str = "spark") -> str:
    """``extractParameter``: first ``param=([^&]+)`` group, '' if absent
    (the reference returns the empty string too, main.cpp:183)."""
    if not param.isidentifier():
        raise ValueError(f"param {param!r} must be a plain identifier")
    return f"coalesce(regexp_extract({query}, '{param}=([^&]+)', 1), '')"


def route_sql(request: str, dialect: str = "spark") -> str:
    """Endpoint dispatch: '/geocode', '/reverse', else 'not_found' —
    the reference's handleRequest path switch."""
    return (
        f"(CASE WHEN {request} LIKE '/geocode?%' THEN 'geocode' "
        f"WHEN {request} LIKE '/reverse?%' THEN 'reverse' "
        f"ELSE 'not_found' END)"
    )


def query_string_sql(request: str, dialect: str = "spark") -> str:
    """Everything after the first '?' ('' when absent) — the query-string
    split before parameter extraction."""
    if dialect == "spark":
        return (
            f"(CASE WHEN instr({request}, '?') > 0 THEN "
            f"substr({request}, instr({request}, '?') + 1) ELSE '' END)"
        )
    return (
        f"(CASE WHEN strpos({request}, '?') > 0 THEN "
        f"substr({request}, strpos({request}, '?') + 1) ELSE '' END)"
    )


def url_decode_col(expr: str) -> Column:
    return F.expr(url_decode_sql(expr, "spark"))


def extract_param_col(query: str, param: str) -> Column:
    return F.expr(extract_param_sql(query, param, "spark"))
