"""Portable-SQL fragments rendered for either Spark SQL or DuckDB.

The engine's relational operators are written ONCE as SQL templates; the
Spark path executes the 'spark' rendering via ``spark.sql`` (full Catalyst
optimization) and the driver's DuckDB oracle executes the 'duckdb'
rendering. This guarantees the two sides compute the same logical function
— the correctness gate then checks the engines agree numerically.

Only a handful of scalar functions differ between the dialects; everything
else (md5, ||, floor, least/greatest, CASE, window functions, GROUP BY) is
shared ANSI SQL.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def hex2int(expr: str, dialect: str) -> str:
    """First-8-hex-chars of an expr → bigint in [0, 2^32)."""
    if dialect == SPARK:
        return f"cast(conv({expr}, 16, 10) as bigint)"
    return f"('0x' || ({expr}))::bigint"


def md5_slice(col: str, start: int, dialect: str) -> str:
    """bigint from hex digits [start, start+8) of md5(col); 1-indexed."""
    return hex2int(f"substr(md5({col}), {start}, 8)", dialect)


def to_str(expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"cast({expr} as string)"
    return f"cast({expr} as varchar)"


def epoch_to_ts(expr: str, dialect: str) -> str:
    """Epoch seconds (bigint) → TIMESTAMP (UTC, no tz)."""
    if dialect == SPARK:
        return f"timestamp_seconds({expr})"
    return f"make_timestamp(cast({expr} as bigint) * 1000000)"


def ts_to_epoch(expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"unix_timestamp({expr})"
    # floor before the cast: DuckDB's epoch() keeps fractional seconds and
    # bigint casts ROUND, while Spark's unix_timestamp truncates
    return f"cast(floor(epoch({expr})) as bigint)"


def to_binary(expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"cast({expr} as binary)"
    return f"encode({expr})"


def from_binary(expr: str, dialect: str) -> str:
    """BLOB → UTF-8 string (inverse of ``to_binary``)."""
    if dialect == SPARK:
        return f"cast({expr} as string)"
    return f"decode({expr})"


def binary_len(expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"length({expr})"
    return f"octet_length({expr})"


def regexp_count(expr: str, pattern: str, dialect: str) -> str:
    """Number of matches of ``pattern`` in ``expr`` (pattern is a SQL string
    literal, single-quoted by the caller)."""
    if dialect == SPARK:
        return f"regexp_count({expr}, {pattern})"
    return f"len(regexp_extract_all({expr}, {pattern}))"


def rx_lit(pattern: str, dialect: str) -> str:
    """Render a raw regex string as a SQL string literal. Spark SQL
    literals process backslash escapes (so every ``\\`` must double);
    DuckDB's standard literals do not."""
    if dialect == SPARK:
        return "'" + pattern.replace("\\", "\\\\").replace("'", "''") + "'"
    return "'" + pattern.replace("'", "''") + "'"


def regexp_replace_all(expr: str, pattern: str, repl: str,
                       dialect: str) -> str:
    """Replace EVERY match (pattern/repl are SQL string literals,
    single-quoted by the caller). Spark's regexp_replace is global by
    default; DuckDB's replaces only the first match without 'g'."""
    if dialect == SPARK:
        return f"regexp_replace({expr}, {pattern}, {repl})"
    return f"regexp_replace({expr}, {pattern}, {repl}, 'g')"


def ws_split(expr: str, dialect: str) -> str:
    """Whitespace-class token split (regex ``\\s+``). Verified identical
    semantics in both dialects, including retention of a trailing empty
    token when the text ends in whitespace: Spark's split keeps trailing
    empties (Java limit=-1) and so does DuckDB's string_split_regex.
    Spark SQL string literals process backslash escapes (so the SQL text
    is ``'\\\\s+'``); DuckDB's standard literals do not (``'\\s+'``)."""
    if dialect == SPARK:
        return f"split({expr}, '\\\\s+')"
    return f"string_split_regex({expr}, '\\s+')"


def line_split(expr: str, dialect: str) -> str:
    """Split on newline characters only (``\\n`` — NOT the whitespace
    class; lines may contain spaces)."""
    if dialect == SPARK:
        return f"split({expr}, '\\\\n')"
    return f"string_split({expr}, chr(10))"


def mat(dialect: str) -> str:
    """``MATERIALIZED `` in the DuckDB rendering only — DuckDB inlines
    every CTE by default, so a CTE referenced N times is computed N
    times (exponentially through chains); Spark has no such keyword and
    Catalyst decides subplan reuse itself. Use on multi-referenced CTEs:
    ``foo AS {D.mat(d)}(SELECT ...)``."""
    return "MATERIALIZED " if dialect == DUCKDB else ""


def canon_host(hostport: str) -> str:
    """Canonical host from a raw authority expr (``host[:port]``):
    lowercase, strip the port and a single ``www.`` prefix.
    Dialect-invariant ANSI SQL — the SINGLE definition shared by
    q_distinct_hosts and hygiene_q's URL canonicalization, so the two
    host notions cannot silently diverge."""
    h = f"lower(split_part({hostport}, ':', 1))"
    return f"CASE WHEN {h} LIKE 'www.%' THEN substr({h}, 5) ELSE {h} END"


def idiv(a: str, b: str) -> str:
    """Portable non-negative integer division (inputs < 2^52)."""
    return f"cast(floor(({a}) / ({b})) as bigint)"


def idiv_i(a: str, b: str, dialect: str) -> str:
    """EXACT integer division on non-negative operands. Unlike ``idiv``
    this never routes through a double: Spark's ``div`` and DuckDB's
    ``//`` divide integers natively, so quotients stay exact past 2^52
    and a true quotient one ulp below an integer cannot mis-floor.
    (Spark ``div`` truncates toward zero, DuckDB ``//`` floors — equal
    on the non-negative operands callers must pass.)"""
    if dialect == SPARK:
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def values_rel(rows: str, alias: str, dialect: str) -> str:
    """An inline VALUES relation; ``rows`` is ``(1),(2)``-style SQL and
    ``alias`` is ``t(col)``-style. Spark aliases VALUES directly; DuckDB
    needs the parenthesized derived-table form."""
    if dialect == SPARK:
        return f"SELECT * FROM VALUES {rows} AS {alias}"
    return f"SELECT * FROM (VALUES {rows}) {alias}"


def sha256_(expr: str, dialect: str) -> str:
    """Lowercase hex SHA-256 of a string expr."""
    if dialect == SPARK:
        return f"sha2({expr}, 256)"
    return f"sha256({expr})"


def dbl(x: float) -> str:
    """A float literal that is DOUBLE in both dialects. Bare ``0.5``-style
    literals parse as DECIMAL in both Spark and DuckDB, whose division
    rounding differs at the last ulp — enough to break value-hash parity."""
    return f"cast({x!r} as double)"


def xor_(a: str, b: str, dialect: str) -> str:
    """Bitwise XOR of two integer exprs. Spark's ``^`` is xor; DuckDB's
    ``^`` is POWER (its xor is the ``xor()`` function). ``bit_count``,
    ``&``, ``>>``, ``<<`` agree by name/operator in both dialects and
    need no helper."""
    if dialect == SPARK:
        return f"(({a}) ^ ({b}))"
    return f"xor(({a}), ({b}))"


def host_surt(host: str, dialect: str) -> str:
    """SURT-ordered host: dot-labels reversed and comma-joined
    (``src1.example.com`` → ``com,example,src1``) — the key ordering web
    archives (CDX) sort capture indexes by, so one host's captures are
    contiguous under a plain string sort."""
    if dialect == SPARK:
        return f"array_join(reverse(split({host}, '[.]')), ',')"
    return f"array_to_string(list_reverse(string_split({host}, '.')), ',')"


def ts_compact(expr: str, dialect: str) -> str:
    """TIMESTAMP → the 14-digit ``yyyyMMddHHmmss`` string CDX lines use."""
    if dialect == SPARK:
        return f"date_format({expr}, 'yyyyMMddHHmmss')"
    return f"strftime({expr}, '%Y%m%d%H%M%S')"


def json_get(expr: str, key: str, dialect: str) -> str:
    """Extract a JSON field as a string."""
    if dialect == SPARK:
        return f"get_json_object({expr}, '$.{key}')"
    return f"json_extract_string({expr}, '$.{key}')"


def median_(expr: str, dialect: str) -> str:
    """Interpolated median over doubles (Spark ``median`` == DuckDB
    ``quantile_cont(0.5)``; DuckDB's own ``median`` truncates DECIMALs)."""
    if dialect == SPARK:
        return f"median(cast({expr} as double))"
    return f"quantile_cont(cast({expr} as double), 0.5)"


def ordered_string_agg(val: str, order_by: str, sep: str,
                       dialect: str) -> str:
    """Deterministic ``sep``-joined concatenation of ``val`` ordered by
    ``order_by`` (``sep`` is a SQL string expression, e.g. ``"' '"`` or
    ``"chr(10)"``). DuckDB has ordered ``string_agg``; Spark does not, so
    the Spark rendering collects (order, value) structs, sorts the array
    (lexicographic by field order — ``order_by`` must be unique within
    the group for a deterministic result), and joins. Over an EMPTY group
    Spark yields ``''`` where DuckDB yields NULL — callers must ensure
    groups are non-empty (e.g. aggregate a WHERE-filtered relation so the
    group row itself disappears)."""
    if dialect == SPARK:
        return (f"array_join(transform(array_sort(collect_list("
                f"struct({order_by} AS o, {val} AS v))), x -> x.v), {sep})")
    return f"string_agg({val}, {sep} ORDER BY {order_by})"
