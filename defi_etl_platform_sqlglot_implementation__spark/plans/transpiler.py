"""Rule-based SQL transpiler for the canonical analytic subset
(SURVEY.md §2.11 Q1 — the reference's write-once-emit-anywhere contract,
etl_pipeline.py:299-327, without the sqlglot dependency).

This is a *token-level* rewriter, not a parser: SQL is tokenized
(strings / quoted identifiers / words / numbers / operators), and the
dialect-divergent constructs are rewritten on the token stream with
balanced-paren argument extraction. Everything this engine's canonical
subset shares across warehouses — SELECT/WHERE/GROUP/HAVING/ORDER/LIMIT,
arithmetic, CASE, CAST, COUNT/SUM/AVG/MIN/MAX — passes through verbatim;
the constructs that genuinely differ are translated:

- identifier quoting (`` ` `` ↔ ``"``)
- NOW() / current_timestamp()
- INTERVAL literals (``INTERVAL 24 HOURS`` ↔ ``INTERVAL '24 hours'`` ↔
  ``INTERVAL '24' HOUR`` …)
- DATE_TRUNC (incl. BigQuery's argument-order flip and MySQL's
  format-roundtrip emulation)
- DATE_FORMAT with Java patterns → strftime / to_char / FORMAT_TIMESTAMP
  / DATE_FORMAT with per-dialect pattern-token mapping
- integer division ``div`` (→ ``//`` on DuckDB, ``DIV`` on MySQL)
- ``expr::type`` cast shorthand → universal ``CAST(expr AS t)`` with
  per-target type spellings (INT64/FLOAT64 on BigQuery, SIGNED/CHAR on
  MySQL, STRING on Spark)
- the string-position family INSTR/STRPOS/CHARINDEX (incl. CHARINDEX's
  flipped argument order on Snowflake)
- APPROX_COUNT_DISTINCT ↔ APPROX_DISTINCT (Trino); loud on targets with
  no approximate-distinct aggregate
- ``||`` string concatenation → ``CONCAT(...)`` on MySQL (where ``||``
  is logical OR)
- window ``OVER`` clauses: PARTITION BY / ORDER BY / ROWS frames, with
  every sort key's IMPLICIT null position (value-based nulls-smallest on
  Spark/BigQuery/MySQL, nulls-largest on Postgres/Trino/Snowflake,
  position-based NULLS LAST on DuckDB) resolved to an explicit
  NULLS FIRST/LAST on emission; MySQL (no NULLS syntax) emits bare when
  its implied position matches and refuses loudly otherwise.  RANGE
  numeric offsets, GROUPS frames, IGNORE/RESPECT NULLS, and QUALIFY are
  loud edges.
- integral-SUM result-type normalization: SUM over a syntactically
  integral argument (a top-level CAST/`::` to an integer type, or an
  integer literal) is BIGINT on Spark/Trino/BigQuery but WIDENS on
  DuckDB (HUGEINT — which Python clients materialize as float64),
  Postgres (NUMERIC), MySQL (DECIMAL) and Snowflake (NUMBER(38,0));
  emission to a widening target wraps the call — including any attached
  OVER clause — as ``CAST(SUM(...) AS BIGINT)`` so the result type (and
  therefore a value-hash across engines) matches the canonical Spark
  BIGINT. Arguments whose type cannot be established syntactically
  (bare columns, arithmetic over columns) are left untouched — the
  subset rule is "spell the integral intent with a CAST", which the
  canonical texts already do.
- the ordered string-aggregation family STRING_AGG(e, sep ORDER BY ...)
  (postgres/duckdb/bigquery) ↔ LISTAGG(e, sep) WITHIN GROUP (ORDER BY
  ...) (spark/snowflake/trino) ↔ GROUP_CONCAT(e ORDER BY ... SEPARATOR
  sep) (mysql), with the within-group sort keys' null positions
  normalized like window ORDER BY; unordered and DISTINCT forms are
  loud edges (nondeterministic / per-dialect semantics), as is a
  non-literal separator on the MySQL target.

Anything outside the subset raises :class:`UnsupportedConstructError`
instead of emitting silently wrong SQL — a transpiler for a documented
subset with loud edges, exercised by an EXECUTABLE proof: the pytest
suite runs corpus queries on Spark and their transpiled form on DuckDB
and compares results, and the ``transpiled_*`` driver gates register the
transpiled text itself as the oracle, so the driver hash-checks the
transpiler output end-to-end.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class UnsupportedConstructError(NotImplementedError):
    """Raised when the SQL uses a construct outside the documented
    transpilable subset for the requested target dialect."""


DIALECTS = ("spark", "duckdb", "postgres", "trino", "bigquery", "mysql",
            "snowflake")

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""(?P<ws>\s+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<qident>"[^"]*")
      | (?P<bident>`[^`]*`)
      | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<num>[0-9]+(?:\.[0-9]+)?)
      | (?P<op><>|!=|<=|>=|\|\||//|::|.)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str  # ws | str | qident | bident | word | num | op
    text: str

    def is_word(self, *names: str) -> bool:
        return self.kind == "word" and self.text.lower() in names


def tokenize(sql: str) -> list[Tok]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:  # pragma: no cover — the op catch-all matches any char
            raise UnsupportedConstructError(f"cannot tokenize at: {sql[pos:pos+20]!r}")
        out.append(Tok(m.lastgroup, m.group()))
        pos = m.end()
    return out


def render(tokens: list[Tok]) -> str:
    return "".join(t.text for t in tokens)


def _next_code(tokens: list[Tok], i: int) -> int:
    """Index of the next non-whitespace token at or after i (len() if none)."""
    while i < len(tokens) and tokens[i].kind == "ws":
        i += 1
    return i


def _match_paren(tokens: list[Tok], i_open: int) -> int:
    """Index of the ')' matching the '(' at i_open."""
    depth = 0
    for j in range(i_open, len(tokens)):
        if tokens[j].kind == "op":
            if tokens[j].text == "(":
                depth += 1
            elif tokens[j].text == ")":
                depth -= 1
                if depth == 0:
                    return j
    raise UnsupportedConstructError("unbalanced parentheses")


def _split_args(tokens: list[Tok], i_open: int, i_close: int) -> list[list[Tok]]:
    """Split tokens between i_open/i_close (exclusive) on top-level commas."""
    args, cur, depth = [], [], 0
    for t in tokens[i_open + 1:i_close]:
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
        if t.kind == "op" and t.text == "," and depth == 0:
            args.append(cur)
            cur = []
        else:
            cur.append(t)
    args.append(cur)
    return [_strip_ws(a) for a in args]


def _strip_ws(tokens: list[Tok]) -> list[Tok]:
    a, b = 0, len(tokens)
    while a < b and tokens[a].kind == "ws":
        a += 1
    while b > a and tokens[b - 1].kind == "ws":
        b -= 1
    return tokens[a:b]


# ---------------------------------------------------------------------------
# Dialect tables
# ---------------------------------------------------------------------------

_QUOTE = {"spark": "`", "mysql": "`", "bigquery": "`",
          "duckdb": '"', "postgres": '"', "trino": '"', "snowflake": '"'}

_NOW = {"spark": "current_timestamp()", "duckdb": "NOW()", "postgres": "NOW()",
        "trino": "CURRENT_TIMESTAMP", "bigquery": "CURRENT_TIMESTAMP()",
        "mysql": "NOW()", "snowflake": "CURRENT_TIMESTAMP()"}

# unit spellings: canonical singular lower ('hour', 'day', 'minute', ...)
_UNIT_CANON = {"hour": "hour", "hours": "hour", "day": "day", "days": "day",
               "minute": "minute", "minutes": "minute",
               "second": "second", "seconds": "second",
               "week": "week", "weeks": "week",
               "month": "month", "months": "month",
               "year": "year", "years": "year"}


def _interval(target: str, n: str, unit: str) -> str:
    plural = unit + "s" if n != "1" else unit
    if target == "spark":
        return f"INTERVAL {n} {plural.upper()}"
    if target in ("duckdb", "postgres", "snowflake"):
        return f"INTERVAL '{n} {plural}'"
    if target == "trino":
        return f"INTERVAL '{n}' {unit.upper()}"
    # bigquery / mysql
    return f"INTERVAL {n} {unit.upper()}"


# Java SimpleDateFormat pattern tokens -> per-family equivalents.
# Families: c (strftime: duckdb / bigquery), mysql (mysql / trino),
# pg (to_char: postgres / snowflake).
_FMT_TOKENS = [  # longest match first
    ("yyyy", {"c": "%Y", "mysql": "%Y", "pg": "YYYY"}),
    ("MM",   {"c": "%m", "mysql": "%m", "pg": "MM"}),
    ("dd",   {"c": "%d", "mysql": "%d", "pg": "DD"}),
    ("HH",   {"c": "%H", "mysql": "%H", "pg": "HH24"}),
    ("mm",   {"c": "%M", "mysql": "%i", "pg": "MI"}),
    ("ss",   {"c": "%S", "mysql": "%s", "pg": "SS"}),
]


_MYSQL_TO_JAVA = {"%Y": "yyyy", "%m": "MM", "%d": "dd",
                  "%H": "HH", "%i": "mm", "%s": "ss"}


def _mysql_to_java_pattern(pat: str) -> str:
    """MySQL/Trino %-token pattern -> canonical Java pattern. Anything
    outside the 6-token subset — including literal alphabetic characters,
    which Java would reinterpret as pattern letters — raises."""
    out, i = [], 0
    while i < len(pat):
        ch = pat[i]
        if ch == "%":
            tok = pat[i:i + 2]
            if tok not in _MYSQL_TO_JAVA:
                raise UnsupportedConstructError(
                    f"date_format token {tok!r} in {pat!r} not in the "
                    "transpilable subset (%Y %m %d %H %i %s)")
            out.append(_MYSQL_TO_JAVA[tok])
            i += 2
        elif ch.isalpha():
            raise UnsupportedConstructError(
                f"literal letter {ch!r} in mysql pattern {pat!r} would be "
                "reinterpreted as a Java pattern token")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _convert_java_pattern(pat: str, family: str) -> str:
    out, i = [], 0
    while i < len(pat):
        for jtok, table in _FMT_TOKENS:
            if pat.startswith(jtok, i):
                out.append(table[family])
                i += len(jtok)
                break
        else:
            ch = pat[i]
            if ch.isalpha():
                raise UnsupportedConstructError(
                    f"date_format pattern token {ch!r} in {pat!r} not in the "
                    "transpilable subset (yyyy MM dd HH mm ss)")
            if family in ("c", "mysql") and ch == "%":
                out.append("%%")
            else:
                out.append(ch)
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Construct rewrites (source dialect -> canonical IR -> target emission)
# ---------------------------------------------------------------------------

def _emit_date_trunc(target: str, unit: str, arg_sql: str) -> str:
    if target in ("spark", "duckdb", "postgres", "trino", "snowflake"):
        return f"DATE_TRUNC('{unit}', {arg_sql})"
    if target == "bigquery":
        return f"TIMESTAMP_TRUNC({arg_sql}, {unit.upper()})"
    if target == "mysql":
        fmt = {"hour": "%Y-%m-%d %H:00:00", "day": "%Y-%m-%d 00:00:00",
               "minute": "%Y-%m-%d %H:%i:00"}.get(unit)
        if fmt is None:
            raise UnsupportedConstructError(
                f"date_trunc('{unit}') has no MySQL emulation in the subset")
        return (f"STR_TO_DATE(DATE_FORMAT({arg_sql}, '{fmt}'), "
                "'%Y-%m-%d %H:%i:%s')")
    raise UnsupportedConstructError(f"unknown target dialect {target!r}")


def _emit_date_format(target: str, arg_sql: str, java_pat: str) -> str:
    if target == "spark":
        return f"date_format({arg_sql}, '{java_pat}')"
    if target == "duckdb":
        return f"strftime({arg_sql}, '{_convert_java_pattern(java_pat, 'c')}')"
    if target == "bigquery":
        return (f"FORMAT_TIMESTAMP('{_convert_java_pattern(java_pat, 'c')}', "
                f"{arg_sql})")
    if target in ("mysql", "trino"):
        fn = "DATE_FORMAT" if target == "mysql" else "date_format"
        return f"{fn}({arg_sql}, '{_convert_java_pattern(java_pat, 'mysql')}')"
    if target in ("postgres", "snowflake"):
        return f"TO_CHAR({arg_sql}, '{_convert_java_pattern(java_pat, 'pg')}')"
    raise UnsupportedConstructError(f"unknown target dialect {target!r}")


# --- cast / function-family tables -----------------------------------------

# ``expr::type`` shorthand is normalized to the universal CAST(expr AS t);
# type spellings that differ per target come from this table (canonical
# lowercase type -> {target: spelling}; absent target keeps the spelling).
_CAST_TYPE_MAP: dict[str, dict[str, str]] = {
    "bigint": {"bigquery": "INT64", "mysql": "SIGNED"},
    "int": {"bigquery": "INT64", "mysql": "SIGNED"},
    "integer": {"bigquery": "INT64", "mysql": "SIGNED"},
    "smallint": {"bigquery": "INT64", "mysql": "SIGNED"},
    # postgres spells it DOUBLE PRECISION — bare DOUBLE is a syntax error
    # there, so the default spelling must never reach a postgres emission
    "double": {"bigquery": "FLOAT64", "postgres": "DOUBLE PRECISION"},
    "varchar": {"spark": "STRING", "bigquery": "STRING", "mysql": "CHAR"},
    "char": {"spark": "STRING", "bigquery": "STRING", "mysql": "CHAR"},
    "numeric": {},   # canonicalized to decimal before mapping
    "text": {"spark": "STRING", "bigquery": "STRING", "mysql": "CHAR",
             "snowflake": "VARCHAR", "trino": "VARCHAR"},
    "string": {"duckdb": "VARCHAR", "postgres": "VARCHAR",
               "trino": "VARCHAR", "mysql": "CHAR", "snowflake": "VARCHAR"},
    "date": {},
    "timestamp": {"mysql": "DATETIME"},
    "decimal": {},
    "boolean": {"bigquery": "BOOL"},   # mysql has no CAST AS BOOLEAN -> raise
}

_CAST_TYPE_FORBIDDEN = {("mysql", "boolean")}


def _map_cast_type(type_word: str, target: str) -> str:
    canon = type_word.lower()
    if canon not in _CAST_TYPE_MAP:
        raise UnsupportedConstructError(
            f"cast type {type_word!r} is outside the '::' subset")
    if (target, canon) in _CAST_TYPE_FORBIDDEN:
        raise UnsupportedConstructError(
            f"{target} has no CAST spelling for {type_word!r}")
    return _CAST_TYPE_MAP[canon].get(target, type_word.upper())


# parameterized forms: which base types may carry a (p[,s]) suffix, and
# which mapped spellings drop it (length-free string types)
_PARAM_TYPES = frozenset(("decimal", "numeric", "varchar", "char"))
_LENGTH_FREE = frozenset(("STRING",))


def _parse_cast_type(tokens: list[Tok], j: int, target: str) -> tuple[str, int]:
    """Parse a cast type spec starting at the type word ``tokens[j]``:
    handles two-word ``DOUBLE PRECISION``, parameterized DECIMAL/NUMERIC/
    VARCHAR/CHAR(...) (suffix kept unless the mapped spelling is
    length-free), and raises on any other parameterized type instead of
    letting the parens leak into the output as invalid SQL. Returns
    (mapped SQL type text, index after the spec)."""
    n = len(tokens)
    type_word = tokens[j].text
    low = type_word.lower()
    k = _next_code(tokens, j + 1)
    if low == "double" and k < n and tokens[k].is_word("precision"):
        return _map_cast_type("double", target), k + 1
    if k < n and tokens[k].kind == "op" and tokens[k].text == "(":
        if low not in _PARAM_TYPES:
            raise UnsupportedConstructError(
                f"parameterized cast type {type_word}(...) is outside "
                "the '::' subset")
        close = _match_paren(tokens, k)
        canon = "decimal" if low == "numeric" else low
        mapped = _map_cast_type(canon, target)
        suffix = "" if mapped in _LENGTH_FREE else render(tokens[k:close + 1])
        return mapped + suffix, close + 1
    return _map_cast_type("decimal" if low == "numeric" else low,
                          target), j + 1


# SUM(<integral>) result types: BIGINT on spark/trino/bigquery; widened on
# these targets (DuckDB HUGEINT, Postgres NUMERIC, MySQL DECIMAL, Snowflake
# NUMBER(38,0)) — emission there re-casts to the canonical 64-bit integer
_SUM_WIDENING_TARGETS = frozenset(("duckdb", "postgres", "mysql", "snowflake"))

# targets with no aggregate FILTER clause: the subset rewrites
# agg(x) FILTER (WHERE c) -> agg(CASE WHEN c THEN x END), exact for the
# null-skipping aggregates (filtered rows contribute NULL, which the
# aggregate drops; window frame membership is unchanged by either form)
_NO_FILTER_TARGETS = frozenset(("mysql", "bigquery", "snowflake"))
_FILTER_REWRITE_AGGS = frozenset(("sum", "count", "avg", "min", "max"))


def _filter_where_cond(tokens: list[Tok], j_open: int, close: int,
                       source: str, target: str) -> str:
    """Render the rewritten condition of a FILTER (WHERE ...) group."""
    jw = _next_code(tokens, j_open + 1)
    if jw >= close or not tokens[jw].is_word("where"):
        raise UnsupportedConstructError(
            "FILTER clause without WHERE is outside the subset")
    return render(_rewrite(tokens[jw + 1:close], source, target)).strip()


def _case_filtered(name: str, arg: str, cond: str,
                   distinct: bool = False) -> str:
    """The ONE encoding of the FILTER->CASE rewrite, shared by
    _filter_to_case and the integral-SUM widening path so the two can
    never desynchronize."""
    body = f"CASE WHEN {cond} THEN {arg} END"
    return f"{name}({'DISTINCT ' if distinct else ''}{body})"


def _filter_to_case(call: list[Tok], cond: str) -> str:
    """agg-call tokens (already emitted in target dialect) + condition ->
    the CASE-rewritten call for targets without FILTER support."""
    toks = [t for t in call if t.kind != "ws"]
    if not toks or toks[0].kind != "word" \
            or toks[0].text.lower() not in _FILTER_REWRITE_AGGS:
        raise UnsupportedConstructError(
            "FILTER is only rewritten for SUM/COUNT/AVG/MIN/MAX on "
            "targets without a FILTER clause; got: " + render(call))
    if len(toks) < 3 or toks[1].text != "(" or toks[-1].text != ")":
        raise UnsupportedConstructError(
            "FILTER rewrite needs a simple aggregate call; got: "
            + render(call))
    name = toks[0].text
    # the argument list = the (ws-preserving) slice between the
    # outermost parens of the emitted call
    depth = 0
    start = end = None
    for idx, tk in enumerate(call):
        if tk.kind == "op" and tk.text == "(":
            depth += 1
            if depth == 1 and start is None:
                start = idx + 1
        elif tk.kind == "op" and tk.text == ")":
            depth -= 1
            if depth == 0:
                end = idx
    inner = call[start:end]
    # a top-level comma (COUNT(DISTINCT a, b)) cannot ride one CASE arm —
    # emitting it would ship a downstream syntax error, so refuse loudly
    d = 0
    for tk in inner:
        if tk.kind == "op" and tk.text == "(":
            d += 1
        elif tk.kind == "op" and tk.text == ")":
            d -= 1
        elif d == 0 and tk.kind == "op" and tk.text == ",":
            raise UnsupportedConstructError(
                "FILTER rewrite for a multi-argument aggregate has no "
                "single-CASE form; got: " + render(call))
    code = [t for t in inner if t.kind != "ws"]
    distinct = bool(code) and code[0].kind == "word" \
        and code[0].text.lower() == "distinct"
    if distinct:
        first = next(i for i, tk in enumerate(inner) if tk.kind != "ws")
        inner = inner[first + 1:]
    arg = render(inner).strip()
    if arg == "*":
        if name.lower() != "count":
            raise UnsupportedConstructError(f"{name}(*) is not an aggregate")
        arg = "1"
    return _case_filtered(name, arg, cond, distinct)

_INT_CAST_TYPES = frozenset(
    ("tinyint", "smallint", "int", "integer", "bigint", "long", "short",
     "byte"))


def _is_integral_expr(toks: list[Tok]) -> bool:
    """True when the expression is SYNTACTICALLY known-integral: an
    integer literal, a whole-expression ``CAST(... AS <int type>)``, or a
    whole-expression ``<primary>::<int type>``. Deliberately conservative
    — a bare column's type is unknowable at the token level, so it is
    never classified integral (and SUM over it is emitted untouched)."""
    # drop ALL ws (not just edge-trim): the adjacency checks below index
    # neighbouring CODE tokens
    code = [x for x in toks if x.kind != "ws"]
    if not code:
        return False
    if len(code) == 1 and code[0].kind == "num" and "." not in code[0].text:
        return True
    # CAST(expr AS <int type>) spanning the whole expression
    if (code[0].is_word("cast") and len(code) >= 2
            and code[1].kind == "op" and code[1].text == "("):
        close = _match_paren(code, 1)
        if close == len(code) - 1:
            depth = 0
            for k in range(2, close):
                tok = code[k]
                if tok.kind == "op" and tok.text == "(":
                    depth += 1
                elif tok.kind == "op" and tok.text == ")":
                    depth -= 1
                elif depth == 0 and tok.is_word("as"):
                    return (k + 1 < close and code[k + 1].kind == "word"
                            and code[k + 1].text.lower() in _INT_CAST_TYPES)
        return False
    # <primary>::<int type> spanning the whole expression (no other
    # top-level operators — `a + b::bigint` proves nothing about `a`)
    if (len(code) >= 3 and code[-1].kind == "word"
            and code[-1].text.lower() in _INT_CAST_TYPES
            and code[-2].kind == "op" and code[-2].text == "::"):
        depth = 0
        for tok in code[:-2]:
            if tok.kind == "op" and tok.text == "(":
                depth += 1
            elif tok.kind == "op" and tok.text == ")":
                depth -= 1
            elif depth == 0 and tok.kind == "op" and tok.text != ".":
                return False
        return True
    return False


_KEYWORDS = frozenset(
    "select from where and or not when then else end case in on by as having"
    " group order join inner left right full outer cross union all distinct"
    # NOTE: 'null' is deliberately absent — a NULL literal is a valid
    # postfix-operator operand (null::int, x || null)
    " limit offset between like is exists with values insert update".split()
)


def _pop_primary(out: list[Tok]) -> list[Tok]:
    """Remove and return the trailing primary expression from the emitted
    stream: a balanced paren group (with an optional preceding function
    name), or a literal/identifier with optional dotted qualification.
    Used by the postfix rules ('::' cast, '||' concat)."""
    while out and out[-1].kind == "ws":
        out.pop()
    if not out:
        raise UnsupportedConstructError("postfix operator with no operand")
    if out[-1].kind == "op" and out[-1].text == ")":
        depth, k = 0, len(out) - 1
        while k >= 0:
            tok = out[k]
            if tok.kind == "op" and tok.text == ")":
                depth += 1
            elif tok.kind == "op" and tok.text == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if depth != 0:
            raise UnsupportedConstructError("unbalanced parens before operator")
        # include a function name directly before the group — but never a
        # keyword (SELECT (a+b)::t must not swallow SELECT)
        j = k - 1
        while j >= 0 and out[j].kind == "ws":
            j -= 1
        if (j >= 0 and out[j].kind in ("word", "qident", "bident")
                and out[j].text.lower() not in _KEYWORDS):
            k = j
        prim = out[k:]
        del out[k:]
        return prim
    if out[-1].kind in ("word", "num", "str", "qident", "bident"):
        if out[-1].kind == "word" and out[-1].text.lower() in _KEYWORDS:
            # e.g. CASE ... END::int — a bare keyword is not a primary;
            # emitting around it would produce broken SQL silently
            raise UnsupportedConstructError(
                f"keyword {out[-1].text!r} cannot be a postfix-operator "
                "operand (construct outside the subset)")
        prim = [out.pop()]
        # dotted qualification: tbl.col
        while (len(out) >= 2 and out[-1].kind == "op" and out[-1].text == "."
               and out[-2].kind in ("word", "qident", "bident")):
            prim.insert(0, out.pop())
            prim.insert(0, out.pop())
        return prim
    raise UnsupportedConstructError(
        f"cannot take operand ending in {out[-1].text!r}")


def _take_primary(tokens: list[Tok], i: int) -> tuple[list[Tok], int]:
    """Forward twin of :func:`_pop_primary`: read one primary expression
    starting at index ``i`` (skipping whitespace); returns (tokens, next)."""
    n = len(tokens)
    while i < n and tokens[i].kind == "ws":
        i += 1
    if i >= n:
        raise UnsupportedConstructError("operator with no right operand")
    t = tokens[i]
    if t.kind == "word" and t.text.lower() in _KEYWORDS:
        raise UnsupportedConstructError(
            f"keyword {t.text!r} cannot start an operand "
            "(construct outside the subset)")
    if t.kind in ("word", "qident", "bident"):
        j = _next_code(tokens, i + 1)
        if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
            close = _match_paren(tokens, j)
            return tokens[i:close + 1], close + 1
        prim, k = [t], i + 1
        while (k + 1 < n and tokens[k].kind == "op" and tokens[k].text == "."
               and tokens[k + 1].kind in ("word", "qident", "bident")):
            prim += [tokens[k], tokens[k + 1]]
            k += 2
        return prim, k
    if t.kind in ("num", "str"):
        return [t], i + 1
    if t.kind == "op" and t.text == "(":
        close = _match_paren(tokens, i)
        return tokens[i:close + 1], close + 1
    raise UnsupportedConstructError(
        f"cannot take operand starting at {t.text!r}")


# haystack/needle position family: canonical arg order is (hay, needle);
# CHARINDEX (snowflake) flips to (needle, hay) on both read and emit.
_POSITION_EMIT = {
    "spark": ("instr", False), "mysql": ("instr", False),
    "duckdb": ("strpos", False), "postgres": ("strpos", False),
    "trino": ("strpos", False), "bigquery": ("strpos", False),
    "snowflake": ("CHARINDEX", True),
}

_APPROX_DISTINCT_EMIT = {
    "spark": "approx_count_distinct", "duckdb": "approx_count_distinct",
    "snowflake": "APPROX_COUNT_DISTINCT",
    "bigquery": "APPROX_COUNT_DISTINCT", "trino": "approx_distinct",
}


# --- window OVER clauses ----------------------------------------------------
#
# The syntax is near-universal; the trap is the IMPLICIT null position of
# window ORDER BY, which differs three ways: value-based nulls-smallest
# (Spark/BigQuery/MySQL: ASC→first), value-based nulls-largest
# (Postgres/Trino/Snowflake: ASC→last), and position-based
# (DuckDB: last in BOTH directions).  The rewriter resolves every sort key
# to an explicit NULLS FIRST/LAST using the SOURCE dialect's implied
# position, so the emitted query sorts identically everywhere; MySQL (no
# NULLS syntax) is emitted bare when its implied position already matches
# and refused loudly when it cannot express the required order.
_NULL_POS = {
    "spark": {"asc": "first", "desc": "last"},
    "bigquery": {"asc": "first", "desc": "last"},
    "mysql": {"asc": "first", "desc": "last"},
    "duckdb": {"asc": "last", "desc": "last"},
    "postgres": {"asc": "last", "desc": "first"},
    "trino": {"asc": "last", "desc": "first"},
    "snowflake": {"asc": "last", "desc": "first"},
}


def _split_commas_top(body: list[Tok]) -> list[list[Tok]]:
    """Split a token span on top-level commas."""
    parts, cur, depth = [], [], 0
    for tok in body:
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        if depth == 0 and tok.kind == "op" and tok.text == ",":
            parts.append(cur)
            cur = []
        else:
            cur.append(tok)
    parts.append(cur)
    return parts


def _rewrite_frame(words: list[str]) -> str:
    """Validate + canonicalize a window frame clause (lowercased code
    words in, canonical uppercase out).  ROWS frames allow numeric bounds
    (portable); RANGE only the unbounded/current forms — RANGE with a
    numeric or INTERVAL offset has per-dialect type rules and is outside
    the subset, as is GROUPS (absent on BigQuery/MySQL)."""
    kind = words[0]
    if kind == "groups":
        raise UnsupportedConstructError(
            "GROUPS frames are outside the subset (no BigQuery/MySQL form)")

    def bound(ws: list[str]) -> str:
        if ws == ["unbounded", "preceding"]:
            return "UNBOUNDED PRECEDING"
        if ws == ["unbounded", "following"]:
            return "UNBOUNDED FOLLOWING"
        if ws == ["current", "row"]:
            return "CURRENT ROW"
        if len(ws) == 2 and ws[0].isdigit() \
                and ws[1] in ("preceding", "following"):
            if kind == "range":
                raise UnsupportedConstructError(
                    "RANGE frames with numeric offsets are outside the "
                    "subset (per-dialect type rules); use ROWS")
            return f"{ws[0]} {ws[1].upper()}"
        raise UnsupportedConstructError(
            f"window frame bound {' '.join(ws)!r} is outside the subset")

    rest = words[1:]
    if rest and rest[0] == "between":
        try:
            and_i = rest.index("and")
        except ValueError:
            raise UnsupportedConstructError("window frame BETWEEN without AND")
        return (f"{kind.upper()} BETWEEN {bound(rest[1:and_i])}"
                f" AND {bound(rest[and_i + 1:])}")
    # shorthand: <kind> <start-bound>  ==  BETWEEN <start> AND CURRENT ROW
    return f"{kind.upper()} BETWEEN {bound(rest)} AND CURRENT ROW"


def _find_top_level_word(span: list[Tok], word: str) -> int | None:
    """Index of the first top-level (paren-depth-0) occurrence of a code
    word in a token span, or None."""
    depth = 0
    for k, tok in enumerate(span):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_word(word):
            return k
    return None


def _render_order_items(items: list[list[Tok]], source: str,
                        target: str,
                        bare_targets: tuple[str, ...] = ("mysql",)) -> list[str]:
    """Render sort-key items (window OVER or within-aggregate ORDER BY)
    with every IMPLICIT null position resolved to the SOURCE dialect's
    semantics and emitted explicitly.  ``bare_targets`` are dialects
    whose grammar for THIS ordering context has no NULLS FIRST/LAST
    (MySQL everywhere; BigQuery only inside aggregate ORDER BY — its
    window ORDER BY does accept NULLS): they emit bare when their
    implied position already matches and refuse loudly otherwise."""
    rendered_items = []
    for item in items:
        it = _strip_ws(item)
        direction = "asc"
        nulls: str | None = None
        # strip trailing [NULLS FIRST|LAST] then [ASC|DESC], skipping the
        # interior ws tokens _strip_ws leaves in place (indexing it[-2]
        # directly would land on whitespace and silently miss an EXPLICIT
        # NULLS marker — the emitted SQL then carried BOTH the original
        # and a synthesized direction, which is invalid)
        code = [k for k, x in enumerate(it) if x.kind != "ws"]
        if len(code) >= 2 and it[code[-2]].is_word("nulls") \
                and it[code[-1]].is_word("first", "last"):
            nulls = it[code[-1]].text.lower()
            it = _strip_ws(it[:code[-2]])
            code = [k for k, x in enumerate(it) if x.kind != "ws"]
        if code and it[code[-1]].is_word("asc", "desc"):
            direction = it[code[-1]].text.lower()
            it = _strip_ws(it[:code[-1]])
        if not it:
            raise UnsupportedConstructError(
                "empty ORDER BY expression")
        # a clause keyword surviving at top level AFTER the start of a
        # sort-key item means the span grabbed trailing syntax this
        # subset does not model (e.g. BigQuery's STRING_AGG ... ORDER BY
        # a LIMIT 3) — rendering it verbatim would emit malformed SQL on
        # every target.  A bare column NAMED like a keyword stays legal:
        # at item start, or qualified (preceded by '.'), it is an
        # ordinary identifier.
        for kw in ("limit", "separator", "order", "group", "having"):
            k = _find_top_level_word(it, kw)
            if k is None:
                continue
            prev = next((x for x in reversed(it[:k])
                         if x.kind != "ws"), None)
            if prev is None or (prev.kind == "op" and prev.text == "."):
                continue
            raise UnsupportedConstructError(
                f"'{kw.upper()}' inside an ORDER BY item is outside "
                "the subset")
        pos = nulls or _NULL_POS[source][direction]
        expr_sql = render(_rewrite(it, source, target))
        if target in bare_targets:
            if pos != _NULL_POS[target][direction]:
                raise UnsupportedConstructError(
                    f"{target} cannot express NULLS {pos.upper()} for "
                    f"{direction.upper()} ordering in this context (no "
                    "NULLS FIRST/LAST syntax)")
            rendered_items.append(f"{expr_sql} {direction.upper()}")
        else:
            rendered_items.append(
                f"{expr_sql} {direction.upper()} NULLS {pos.upper()}")
    return rendered_items


def _rewrite_over(body: list[Tok], source: str, target: str) -> str:
    code = [(k, tok) for k, tok in enumerate(body) if tok.kind != "ws"]
    if not code:
        return "OVER ()"
    # top-level segment markers
    marks: list[tuple[str, int]] = []   # (segment, code-index)
    depth = 0
    for ci, (k, tok) in enumerate(code):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.kind == "word":
            low = tok.text.lower()
            if low in ("partition", "order"):
                nxt = code[ci + 1][1] if ci + 1 < len(code) else None
                if nxt is not None and nxt.is_word("by"):
                    marks.append((low, ci))
            elif low in ("rows", "range", "groups"):
                marks.append(("frame", ci))
    if not marks:
        # a non-empty OVER body with NO recognized segment is a
        # named-window reference like OVER (w) — silently emitting
        # OVER () would drop the partition/order spec and produce wrong
        # values on every target
        raise UnsupportedConstructError(
            "window specification outside the subset (named windows / "
            "out-of-order clauses)")
    expected = {"partition": 0, "order": 1, "frame": 2}
    if [m for m, _ in marks] != sorted(
            (m for m, _ in marks), key=expected.__getitem__) \
            or len({m for m, _ in marks}) != len(marks) \
            or marks[0][1] != 0:
        raise UnsupportedConstructError(
            "window specification outside the subset (named windows / "
            "out-of-order clauses)")

    def seg(idx: int) -> list[Tok]:
        # use the STORED body positions: Tok is a value-equality
        # dataclass, so body.index(tok) would find an earlier token with
        # identical (kind, text) — e.g. a column named 'rows' inside the
        # ORDER BY expression — and slice the wrong span
        start_k = code[marks[idx][1]][0]
        end_k = (code[marks[idx + 1][1]][0]
                 if idx + 1 < len(marks) else len(body))
        return body[start_k:end_k]

    parts: list[str] = []
    for idx, (name, _ci) in enumerate(marks):
        toks = seg(idx)
        codes = [x for x in toks if x.kind != "ws"]
        if name == "partition":
            exprs = _split_commas_top(_drop_leading_words(toks, 2))
            rendered = [render(_rewrite(_strip_ws(e), source, target))
                        for e in exprs]
            parts.append("PARTITION BY " + ", ".join(rendered))
        elif name == "order":
            items = _split_commas_top(_drop_leading_words(toks, 2))
            parts.append("ORDER BY " + ", ".join(
                _render_order_items(items, source, target)))
        else:
            words = [x.text.lower() for x in codes]
            parts.append(_rewrite_frame(words))
    return "OVER (" + " ".join(parts) + ")"


def _drop_leading_words(toks: list[Tok], n_words: int) -> list[Tok]:
    """Drop the first ``n_words`` non-ws tokens (segment keywords)."""
    seen = 0
    for k, tok in enumerate(toks):
        if tok.kind != "ws":
            seen += 1
            if seen == n_words:
                return toks[k + 1:]
    return []


def _rewrite(tokens: list[Tok], source: str, target: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]

        # --- identifier quoting / spark double-quoted string literals ---
        if t.kind == "qident" and source == "spark":
            # in the Spark dialect "..." is a STRING literal, not an
            # identifier; emit it as a portable single-quoted literal
            body = t.text[1:-1]
            if "\\" in body:
                raise UnsupportedConstructError(
                    "backslash escapes in Spark double-quoted string "
                    "literals are outside the subset")
            out.append(Tok("str", "'" + body.replace("'", "''") + "'"))
            i += 1
            continue
        if t.kind == "bident" or t.kind == "qident":
            q = _QUOTE[target]
            out.append(Tok("qident", f"{q}{t.text[1:-1]}{q}"))
            i += 1
            continue

        # --- NOW() / current_timestamp() ------------------------------
        # `now` REQUIRES call parens (a bare `now` is a legal column
        # name); bare `current_timestamp` is the SQL-standard niladic form
        if t.is_word("now", "current_timestamp"):
            j = _next_code(tokens, i + 1)
            has_parens = (j < n and tokens[j].kind == "op"
                          and tokens[j].text == "(")
            if not has_parens and t.text.lower() == "now":
                out.append(t)  # plain identifier named now
                i += 1
                continue
            if has_parens:
                close = _match_paren(tokens, j)
                if _split_args(tokens, j, close) != [[]]:
                    raise UnsupportedConstructError(
                        f"{t.text} with arguments is outside the subset")
                i = close + 1
            else:
                i += 1
            out.append(Tok("word", _NOW[target]))
            continue

        # --- INTERVAL literal -----------------------------------------
        if t.is_word("interval"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "num":      # INTERVAL 24 HOURS
                num = tokens[j].text
                k = _next_code(tokens, j + 1)
                if k < n and tokens[k].kind == "word" \
                        and tokens[k].text.lower() in _UNIT_CANON:
                    unit = _UNIT_CANON[tokens[k].text.lower()]
                    out.append(Tok("word", _interval(target, num, unit)))
                    i = k + 1
                    continue
            if j < n and tokens[j].kind == "str":      # INTERVAL '24 hours' / '24' HOUR
                body = tokens[j].text[1:-1].strip()
                m = re.fullmatch(r"(\d+)\s*([A-Za-z]+)?", body)
                if m:
                    num, unit_s = m.group(1), m.group(2)
                    if unit_s is None:                 # trino INTERVAL '24' HOUR
                        k = _next_code(tokens, j + 1)
                        if k < n and tokens[k].kind == "word" \
                                and tokens[k].text.lower() in _UNIT_CANON:
                            unit = _UNIT_CANON[tokens[k].text.lower()]
                            out.append(Tok("word", _interval(target, num, unit)))
                            i = k + 1
                            continue
                    elif unit_s.lower() in _UNIT_CANON:
                        unit = _UNIT_CANON[unit_s.lower()]
                        out.append(Tok("word", _interval(target, num, unit)))
                        i = j + 1
                        continue
            raise UnsupportedConstructError(
                "INTERVAL form not in the subset near: "
                + render(tokens[i:i + 6]))

        # --- window OVER clause -----------------------------------------
        if t.is_word("over"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                out.append(Tok("word",
                               _rewrite_over(tokens[j + 1:close],
                                             source, target)))
                i = close + 1
                continue
            if j < n and tokens[j].kind == "word" \
                    and tokens[j].text.lower() not in _KEYWORDS:
                # OVER w — a named-window reference.  Passing it through
                # would skip the WINDOW clause's null-position
                # normalization entirely (silent cross-engine value
                # divergence), and the integral-SUM cast wrap would emit
                # CAST(...) OVER w (invalid SQL): loud edge, like the
                # OVER (w) form.  (A column named `over` aliased by a
                # bare word also lands here — the documented
                # loud-on-ambiguous trade.)
                raise UnsupportedConstructError(
                    "named window reference (OVER w / WINDOW clause) is "
                    "outside the subset — inline the window spec")
            out.append(t)   # bare identifier named over
            i += 1
            continue
        # --- CAST(expr AS type): map the type spelling -------------------
        # (the `::` shorthand always went through _map_cast_type; the
        # function form leaked source spellings — CAST(x AS INT) is a
        # MySQL syntax error, CAST(x AS STRING) a Postgres one)
        if t.is_word("cast"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                # the LAST depth-1 AS separates expr from the type spec
                # (any other AS inside the expr sits deeper in parens)
                depth, as_ix = 0, None
                for ix in range(j, close):
                    tk = tokens[ix]
                    if tk.kind == "op" and tk.text == "(":
                        depth += 1
                    elif tk.kind == "op" and tk.text == ")":
                        depth -= 1
                    elif depth == 1 and tk.is_word("as"):
                        as_ix = ix
                if as_ix is None:
                    raise UnsupportedConstructError(
                        "CAST without AS is outside the subset")
                expr = render(_rewrite(tokens[j + 1:as_ix], source, target))
                jt = _next_code(tokens, as_ix + 1)
                if jt >= close or tokens[jt].kind != "word":
                    raise UnsupportedConstructError(
                        "CAST type spec not found")
                # map KNOWN type spellings; a type outside the map (or a
                # known word carrying an unmodelled suffix, e.g.
                # TIMESTAMP WITH TIME ZONE) keeps its source spelling —
                # the function form always passed those through, and
                # unlike the '::' shorthand it need not restrict to the
                # mapped subset to stay valid SQL
                low = tokens[jt].text.lower()
                spec = tokens[jt:close]
                if low in _CAST_TYPE_MAP or low == "double":
                    mapped, after = _parse_cast_type(spec, 0, target)
                    if _next_code(spec, after) < len(spec):
                        mapped = render(spec).strip()  # unmodelled suffix
                else:
                    mapped = render(spec).strip()
                out.append(Tok("word", f"CAST({expr.strip()} AS {mapped})"))
                i = close + 1
                continue

        # --- aggregate FILTER clause on targets without one -------------
        if t.is_word("filter") and target in _NO_FILTER_TARGETS:
            j = _next_code(tokens, i + 1)
            prev = next((x for x in reversed(out) if x.kind != "ws"), None)
            after_call = prev is not None and (
                (prev.kind == "op" and prev.text == ")")
                or (prev.kind == "word" and prev.text.endswith(")")))
            if after_call and j < n and tokens[j].kind == "op" \
                    and tokens[j].text == "(":
                # `<call> filter (...)` can only be the aggregate FILTER
                # clause — _filter_where_cond raises loudly on a missing
                # WHERE instead of emitting it to a target without FILTER
                close = _match_paren(tokens, j)
                cond = _filter_where_cond(tokens, j, close, source, target)
                call = _pop_primary(out)
                out.append(Tok("word", _filter_to_case(call, cond)))
                i = close + 1
                continue
            # identifier/function named filter: default passthrough below

        if t.is_word("qualify"):
            # clause-position disambiguation (ADVICE r4): QUALIFY the
            # clause follows a COMPLETED expression or clause — a ')',
            # a literal/quoted identifier, CASE...END, or a bare
            # non-keyword word (table/column name). After a keyword,
            # comma, dot, or operator, `qualify` is a legal column/alias
            # identifier (SELECT qualify FROM t) and passes through.
            # The implicit-alias position (SELECT a qualify) also lands
            # on the loud path — consistent with "loud, never silently
            # wrong" for a genuinely ambiguous spelling.
            prev = next((x for x in reversed(out) if x.kind != "ws"), None)
            # clause-TERMINAL keywords can also precede a QUALIFY clause:
            # GROUP BY ALL QUALIFY ... (DuckDB/Snowflake).  `SELECT ALL
            # qualify` (column named qualify after the DISTINCT-dual) now
            # lands loud too — the documented loud-on-ambiguous trade.
            is_clause = prev is not None and (
                (prev.kind == "op" and prev.text == ")")
                or prev.kind in ("num", "str", "qident", "bident")
                or (prev.kind == "word"
                    and (prev.text.lower() in ("end", "all")
                         or prev.text.lower() not in _KEYWORDS)))
            if is_clause:
                raise UnsupportedConstructError(
                    "QUALIFY is outside the subset (no Spark/Postgres/"
                    "MySQL form); filter in an outer query")
            out.append(t)
            i += 1
            continue
        if t.is_word("ignore", "respect"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].is_word("nulls"):
                raise UnsupportedConstructError(
                    "IGNORE/RESPECT NULLS is outside the subset "
                    "(absent on Postgres/MySQL)")
            out.append(t)
            i += 1
            continue

        # --- integral SUM result-type normalization --------------------
        # (see module docstring: DuckDB HUGEINT / Postgres NUMERIC /
        # MySQL DECIMAL / Snowflake NUMBER widen what Spark keeps BIGINT)
        if t.is_word("sum") and target in _SUM_WIDENING_TARGETS:
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                args = _split_args(tokens, j, close)
                if len(args) == 1 and _is_integral_expr(args[0]):
                    inner = render(_rewrite(args[0], source, target))
                    call = f"SUM({inner})"
                    k = _next_code(tokens, close + 1)
                    if k < n and tokens[k].is_word("filter"):
                        # aggregate FILTER clause: the cast must wrap
                        # SUM(...) FILTER (...) — CAST(...) FILTER is a
                        # syntax error on every widening target — and
                        # no-FILTER targets (MySQL/Snowflake) get the
                        # CASE rewrite instead
                        j2 = _next_code(tokens, k + 1)
                        if (j2 < n and tokens[j2].kind == "op"
                                and tokens[j2].text == "("):
                            close2 = _match_paren(tokens, j2)
                            if target in _NO_FILTER_TARGETS:
                                cond = _filter_where_cond(
                                    tokens, j2, close2, source, target)
                                call = _case_filtered("SUM", inner, cond)
                            else:
                                call += " FILTER (" + render(_rewrite(
                                    tokens[j2 + 1:close2], source,
                                    target)) + ")"
                            close = close2
                            k = _next_code(tokens, close + 1)
                    if k < n and tokens[k].is_word("over"):
                        j2 = _next_code(tokens, k + 1)
                        if (j2 < n and tokens[j2].kind == "op"
                                and tokens[j2].text == "("):
                            # the cast must wrap the WHOLE window
                            # expression — OVER binds to the call
                            close2 = _match_paren(tokens, j2)
                            call += " " + _rewrite_over(
                                tokens[j2 + 1:close2], source, target)
                            close = close2
                    int_ty = _map_cast_type("bigint", target)
                    out.append(Tok("word", f"CAST({call} AS {int_ty})"))
                    i = close + 1
                    continue
            # non-integral or unparenthesized: default passthrough below

        # --- DATE_TRUNC / TIMESTAMP_TRUNC ------------------------------
        if t.is_word("date_trunc", "timestamp_trunc"):
            j = _next_code(tokens, i + 1)
            if j >= n or tokens[j].text != "(":
                raise UnsupportedConstructError("date_trunc without call parens")
            close = _match_paren(tokens, j)
            args = _split_args(tokens, j, close)
            if len(args) != 2:
                raise UnsupportedConstructError("date_trunc arity != 2")
            if t.text.lower() == "timestamp_trunc":    # bigquery order
                expr_toks, unit_tok = args[0], args[1]
                unit = render(unit_tok).strip().lower()
            else:
                unit_lit = render(args[0]).strip()
                if not (unit_lit.startswith("'") and unit_lit.endswith("'")):
                    raise UnsupportedConstructError(
                        "date_trunc unit must be a string literal in the subset")
                unit = unit_lit[1:-1].lower()
                expr_toks = args[1]
            if unit not in _UNIT_CANON:
                raise UnsupportedConstructError(f"date_trunc unit {unit!r}")
            inner = render(_rewrite(expr_toks, source, target))
            out.append(Tok("word",
                           _emit_date_trunc(target, _UNIT_CANON[unit], inner)))
            i = close + 1
            continue

        # --- DATE_FORMAT / STRFTIME ------------------------------------
        if t.is_word("date_format", "strftime"):
            j = _next_code(tokens, i + 1)
            if j >= n or tokens[j].text != "(":
                raise UnsupportedConstructError(f"{t.text} without call parens")
            close = _match_paren(tokens, j)
            args = _split_args(tokens, j, close)
            if len(args) != 2:
                raise UnsupportedConstructError(f"{t.text} arity != 2")
            expr_toks, pat_toks = args
            pat_lit = render(pat_toks).strip()
            if not (pat_lit.startswith("'") and pat_lit.endswith("'")):
                raise UnsupportedConstructError(
                    f"{t.text} pattern must be a string literal")
            pat = pat_lit[1:-1]
            if t.text.lower() == "strftime" or source == "duckdb":
                raise UnsupportedConstructError(
                    "strftime source patterns not in the subset; write the "
                    "canonical query in Spark date_format() form")
            if source in ("mysql", "trino"):
                pat = _mysql_to_java_pattern(pat)
            elif source != "spark":
                raise UnsupportedConstructError(
                    f"date_format from {source!r} is not in the subset "
                    "(that dialect formats with TO_CHAR)")
            inner = render(_rewrite(expr_toks, source, target))
            out.append(Tok("word", _emit_date_format(target, inner, pat)))
            i = close + 1
            continue

        # --- YEAR()/MONTH()/DAY() <-> EXTRACT(unit FROM x) --------------
        if t.is_word("year", "month", "day"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                args = _split_args(tokens, j, close)
                if len(args) == 1:
                    unit = t.text.upper()
                    inner = render(_rewrite(args[0], source, target))
                    if target in ("postgres", "trino", "snowflake"):
                        out.append(Tok("word", f"EXTRACT({unit} FROM {inner})"))
                    elif target == "bigquery":
                        out.append(Tok("word", f"EXTRACT({unit} FROM {inner})"))
                    else:  # spark / duckdb / mysql share the function form
                        out.append(Tok("word", f"{t.text.lower()}({inner})"))
                    i = close + 1
                    continue
            out.append(t)
            i += 1
            continue

        if t.is_word("extract"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                raw_body = tokens[j + 1:close]
                code = [(k, x) for k, x in enumerate(raw_body) if x.kind != "ws"]
                # EXTRACT(UNIT FROM expr) — expr keeps its original
                # whitespace (slicing the raw span after FROM), only the
                # unit/FROM keywords are consumed structurally
                if (len(code) >= 3 and code[0][1].kind == "word"
                        and code[0][1].text.lower() in ("year", "month", "day")
                        and code[1][1].is_word("from")):
                    unit = code[0][1].text.lower()
                    expr_toks = _strip_ws(raw_body[code[1][0] + 1:])
                    inner = render(_rewrite(expr_toks, source, target))
                    if target in ("spark", "duckdb", "mysql"):
                        out.append(Tok("word", f"{unit}({inner})"))
                    else:
                        out.append(Tok("word",
                                       f"EXTRACT({unit.upper()} FROM {inner})"))
                    i = close + 1
                    continue
            raise UnsupportedConstructError(
                "EXTRACT form not in the subset (YEAR/MONTH/DAY FROM expr)")

        # --- ``expr::type`` cast shorthand -> universal CAST ------------
        if t.kind == "op" and t.text == "::":
            prim = _pop_primary(out)
            j = _next_code(tokens, i + 1)
            if j >= n or tokens[j].kind != "word":
                raise UnsupportedConstructError("'::' without a type name")
            mapped, k = _parse_cast_type(tokens, j, target)
            out.append(Tok("word",
                           f"CAST({render(prim)} AS {mapped})"))
            i = k
            continue

        # --- position family: instr/strpos/charindex --------------------
        if t.is_word("instr", "strpos", "charindex"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                args = _split_args(tokens, j, close)
                if len(args) != 2:
                    raise UnsupportedConstructError(
                        f"{t.text} arity != 2 is outside the subset")
                a0 = render(_rewrite(args[0], source, target))
                a1 = render(_rewrite(args[1], source, target))
                hay, needle = (a1, a0) if t.text.lower() == "charindex" \
                    else (a0, a1)
                fn, flipped = _POSITION_EMIT[target]
                emitted = (f"{fn}({needle}, {hay})" if flipped
                           else f"{fn}({hay}, {needle})")
                out.append(Tok("word", emitted))
                i = close + 1
                continue
            out.append(t)   # bare identifier named instr/strpos
            i += 1
            continue

        # --- ordered string-aggregation family --------------------------
        # STRING_AGG(e, sep ORDER BY ...) (postgres/duckdb/bigquery) ↔
        # LISTAGG(e, sep) WITHIN GROUP (ORDER BY ...) (spark/snowflake/
        # trino) ↔ GROUP_CONCAT(e ORDER BY ... SEPARATOR sep) (mysql).
        # The within-group ordering is REQUIRED (unordered concatenation
        # is nondeterministic — silently different results per engine),
        # goes through the same null-position normalization as window
        # ORDER BY, and DISTINCT is a loud edge (per-dialect interaction
        # with ORDER BY differs).
        if t.is_word("string_agg", "listagg", "group_concat"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                fname = t.text.lower()
                inner = tokens[j + 1:close]
                first_code = next((x for x in inner if x.kind != "ws"), None)
                if first_code is not None and first_code.is_word("distinct"):
                    raise UnsupportedConstructError(
                        "DISTINCT string aggregation is outside the subset "
                        "(per-dialect DISTINCT/ORDER BY interaction)")
                consume_to = close + 1
                order_span: list[Tok] | None = None
                if fname == "group_concat":
                    ob = _find_top_level_word(inner, "order")
                    sp = _find_top_level_word(inner, "separator")
                    if ob is None or sp is None or sp < ob:
                        raise UnsupportedConstructError(
                            "GROUP_CONCAT outside the subset (need "
                            "ORDER BY ... SEPARATOR 'sep')")
                    expr_span = inner[:ob]
                    if len(_split_commas_top(_strip_ws(expr_span))) != 1:
                        raise UnsupportedConstructError(
                            "GROUP_CONCAT over multiple expressions is "
                            "outside the subset (target arity differs)")
                    by = _next_code(inner, ob + 1)
                    if by >= len(inner) or not inner[by].is_word("by"):
                        raise UnsupportedConstructError(
                            "GROUP_CONCAT ORDER without BY")
                    order_span = inner[by + 1:sp]
                    sep_span = _strip_ws(inner[sp + 1:])
                elif fname == "string_agg":
                    ob = _find_top_level_word(inner, "order")
                    if ob is None:
                        raise UnsupportedConstructError(
                            "unordered STRING_AGG is outside the subset "
                            "(nondeterministic concatenation order)")
                    by = _next_code(inner, ob + 1)
                    if by >= len(inner) or not inner[by].is_word("by"):
                        raise UnsupportedConstructError(
                            "STRING_AGG ORDER without BY")
                    head = _split_commas_top(_strip_ws(inner[:ob]))
                    if len(head) != 2:
                        raise UnsupportedConstructError(
                            "STRING_AGG arity != 2 is outside the subset")
                    expr_span, sep_span = head
                    order_span = inner[by + 1:]
                else:  # listagg
                    head = _split_commas_top(inner)
                    if len(head) != 2:
                        raise UnsupportedConstructError(
                            "LISTAGG arity != 2 is outside the subset")
                    expr_span, sep_span = head
                    k1 = _next_code(tokens, close + 1)
                    k2 = _next_code(tokens, k1 + 1) if k1 < n else n
                    if not (k1 < n and tokens[k1].is_word("within")
                            and k2 < n and tokens[k2].is_word("group")):
                        raise UnsupportedConstructError(
                            "LISTAGG without WITHIN GROUP (ORDER BY ...) "
                            "is outside the subset (nondeterministic)")
                    p = _next_code(tokens, k2 + 1)
                    if not (p < n and tokens[p].kind == "op"
                            and tokens[p].text == "("):
                        raise UnsupportedConstructError(
                            "WITHIN GROUP without (ORDER BY ...)")
                    pclose = _match_paren(tokens, p)
                    g = tokens[p + 1:pclose]
                    gob = _find_top_level_word(g, "order")
                    gby = _next_code(g, gob + 1) if gob is not None else None
                    if gob is None or gby >= len(g) or not g[gby].is_word("by"):
                        raise UnsupportedConstructError(
                            "WITHIN GROUP body must be ORDER BY ...")
                    order_span = g[gby + 1:]
                    consume_to = pclose + 1
                e_sql = render(_rewrite(_strip_ws(expr_span), source, target))
                sep_toks = _strip_ws(sep_span)
                sep_sql = render(_rewrite(sep_toks, source, target))
                # BigQuery's AGGREGATE ORDER BY grammar has no NULLS
                # FIRST/LAST (unlike its window ORDER BY) — treat it like
                # MySQL here: bare when the implied position matches,
                # loud otherwise, never invalid SQL.
                order_sql = ", ".join(_render_order_items(
                    _split_commas_top(_strip_ws(order_span)), source, target,
                    bare_targets=("mysql", "bigquery")))
                if target == "mysql":
                    if not (len(sep_toks) == 1 and sep_toks[0].kind == "str"):
                        raise UnsupportedConstructError(
                            "MySQL SEPARATOR requires a string literal "
                            "separator")
                    emitted = (f"GROUP_CONCAT({e_sql} ORDER BY {order_sql}"
                               f" SEPARATOR {sep_sql})")
                elif target in ("spark", "snowflake", "trino"):
                    emitted = (f"LISTAGG({e_sql}, {sep_sql}) WITHIN GROUP "
                               f"(ORDER BY {order_sql})")
                elif target in ("duckdb", "postgres", "bigquery"):
                    emitted = (f"STRING_AGG({e_sql}, {sep_sql} "
                               f"ORDER BY {order_sql})")
                else:
                    raise UnsupportedConstructError(
                        f"no string-aggregation form for {target!r}")
                out.append(Tok("word", emitted))
                i = consume_to
                continue
            out.append(t)
            i += 1
            continue

        # --- approximate distinct family --------------------------------
        if t.is_word("approx_count_distinct", "approx_distinct"):
            j = _next_code(tokens, i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _match_paren(tokens, j)
                args = _split_args(tokens, j, close)
                if len(args) != 1:
                    raise UnsupportedConstructError(
                        "approx distinct with extra arguments is outside "
                        "the subset")
                if target not in _APPROX_DISTINCT_EMIT:
                    raise UnsupportedConstructError(
                        f"{target} has no approximate-distinct aggregate "
                        "in the subset")
                inner = render(_rewrite(args[0], source, target))
                out.append(Tok(
                    "word", f"{_APPROX_DISTINCT_EMIT[target]}({inner})"))
                i = close + 1
                continue
            out.append(t)
            i += 1
            continue

        # --- ``||``: logical OR on a MySQL SOURCE; string concat
        #     everywhere else (-> CONCAT on a MySQL TARGET) --------------
        if t.kind == "op" and t.text == "||" and source == "mysql":
            # in the MySQL dialect (without PIPES_AS_CONCAT) '||' is
            # boolean OR — keeping the operator on a concat-dialect
            # target would silently change semantics. Emit with explicit
            # spacing: '||' carries no ws neighbors, and render() joins
            # token texts verbatim (a bare OR would fuse into a||b -> aORb)
            out.append(Tok("ws", " "))
            out.append(Tok("word", "OR"))
            out.append(Tok("ws", " "))
            i += 1
            continue
        if t.kind == "op" and t.text == "||" and target == "mysql":
            # precedence guard: '+' binds tighter than '||', so
            # 'a + b || c' means (a+b)||c — a primary-level rewrite would
            # mis-nest it as a + CONCAT(b, c). Loud edge, not wrong SQL.
            left = _pop_primary(out)
            before = next((x for x in reversed(out) if x.kind != "ws"), None)
            if before is not None and before.kind == "op" \
                    and before.text in ("+", "-", "*", "/", "%"):
                raise UnsupportedConstructError(
                    "arithmetic adjacent to '||' is outside the MySQL "
                    "CONCAT subset (precedence would mis-nest)")
            operands = [render(left)]
            k = i
            while k < n and tokens[k].kind == "op" and tokens[k].text == "||":
                prim, k2 = _take_primary(tokens, k + 1)
                opnd = render(_rewrite(list(prim), source, target))
                # a '::' cast binds tighter than '||': consume it into
                # THIS operand instead of letting it pop the whole CONCAT
                k2n = _next_code(tokens, k2)
                while (k2n < n and tokens[k2n].kind == "op"
                       and tokens[k2n].text == "::"):
                    jt = _next_code(tokens, k2n + 1)
                    if jt >= n or tokens[jt].kind != "word":
                        raise UnsupportedConstructError(
                            "'::' without a type name")
                    mapped, k2 = _parse_cast_type(tokens, jt, target)
                    opnd = f"CAST({opnd} AS {mapped})"
                    k2n = _next_code(tokens, k2)
                operands.append(opnd)
                k = _next_code(tokens, k2)
                if not (k < n and tokens[k].kind == "op"
                        and tokens[k].text == "||"):
                    k = k2
                    break
            # right-side twin of the guard above: '-' binds tighter than
            # '||', so 'a || b - 1' means a || (b - 1) and a primary-level
            # rewrite would emit CONCAT(a, b) - 1
            knext = _next_code(tokens, k)
            if (knext < n and tokens[knext].kind == "op"
                    and tokens[knext].text in ("+", "-", "*", "/", "%")):
                raise UnsupportedConstructError(
                    "arithmetic adjacent to '||' is outside the MySQL "
                    "CONCAT subset (precedence would mis-nest)")
            out.append(Tok("word", f"CONCAT({', '.join(operands)})"))
            i = k
            continue

        # --- integer division ``div`` ----------------------------------
        if t.is_word("div"):
            if target == "spark":
                out.append(Tok("word", "div"))
            elif target == "duckdb":
                out.append(Tok("op", "//"))
            elif target == "mysql":
                out.append(Tok("word", "DIV"))
            else:
                raise UnsupportedConstructError(
                    f"integer division 'div' has no {target} mapping in the "
                    "subset (operands are not re-parsed)")
            i += 1
            continue

        out.append(t)
        i += 1
    return out


def transpile(sql: str, target: str, source: str = "spark") -> str:
    """Transpile canonical-subset SQL between dialects. Identity when
    source == target; raises :class:`UnsupportedConstructError` on any
    construct outside the documented subset rather than emitting silently
    wrong SQL."""
    if target not in DIALECTS:
        raise UnsupportedConstructError(f"unknown target dialect {target!r}")
    if source not in DIALECTS:
        raise UnsupportedConstructError(f"unknown source dialect {source!r}")
    if source == target:
        return sql
    return render(_rewrite(tokenize(sql), source, target))
