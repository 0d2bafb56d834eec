"""SQL-text front end for the native Delta surface (r9).

``delta_sql(spark, "ALTER TABLE delta.`/path/t` ADD CONSTRAINT ...")``
parses the practical Delta SQL dialect (the statements delta-spark
registers as Spark SQL extensions — unavailable in this image, since
the package isn't on the classpath) and routes each to the native
implementation. Reference users drive their lake almost entirely
through these strings (rtdl itself funnels SQL to Dremio/delta-spark —
deltawriter/delta_writer.py:88-94), so the text surface is part of
"could switch without rewriting".

Table references use delta-spark's path form: ``delta.`<path>```.
Parsing is deliberately conservative: anything outside the recognized
grammar raises with the native API to call instead — never a silent
partial parse.

Supported statements (each maps 1:1 onto a tested native API):
CREATE [OR REPLACE] TABLE [IF NOT EXISTS] (column DDL incl. NOT NULL /
GENERATED ALWAYS AS (expr) / GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY
[(START WITH n INCREMENT BY m)] / COMMENT '...', PARTITIONED BY,
CLUSTER BY, COMMENT, TBLPROPERTIES) · CREATE TABLE ... SHALLOW CLONE
[VERSION AS OF] · ALTER TABLE SET/UNSET TBLPROPERTIES · ADD CONSTRAINT
... CHECK · DROP CONSTRAINT · ADD COLUMN(S) · RENAME COLUMN · DROP
COLUMN · CLUSTER BY (...) | NONE · ALTER COLUMN ... SYNC IDENTITY ·
DELETE FROM ... WHERE · UPDATE ... SET ... WHERE · MERGE INTO ...
USING (incl. conditional WHEN MATCHED [AND cond] THEN UPDATE SET col =
expr / DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES
(exprs), r10) · OPTIMIZE [WHERE] [ZORDER BY] · VACUUM [RETAIN n HOURS]
[DRY RUN] · REORG TABLE ... APPLY (PURGE) · CONVERT TO DELTA
parquet.`...` [PARTITIONED BY] · RESTORE TABLE ... TO
VERSION|TIMESTAMP AS OF · DESCRIBE HISTORY · DESCRIBE DETAIL · SHOW
TBLPROPERTIES · SELECT/WITH over delta.`path` references (incl.
VERSION/TIMESTAMP AS OF time travel — rewritten to native-reader temp
views and executed by Spark SQL).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TBL = r"delta\.`(?P<path>[^`]+)`"


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren-depth 0 outside quotes."""
    parts, buf, depth, q = [], [], 0, None
    for ch in text:
        if q:
            if ch == q:
                q = None
            buf.append(ch)
            continue
        if ch in ("'", '"', "`"):
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _unquote_ident(s: str) -> str:
    s = s.strip()
    return s[1:-1] if s.startswith("`") and s.endswith("`") else s


_COLDEF_RE = re.compile(
    r"^(?P<name>`[^`]+`|\w+)\s+(?P<type>\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_IDENTITY_RE = re.compile(
    r"^GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?",
    re.IGNORECASE,
)
_GENERATED_RE = re.compile(
    r"^GENERATED\s+ALWAYS\s+AS\s*\((?P<expr>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SPARK_TYPE = {
    "bigint": "long", "long": "long", "int": "integer",
    "integer": "integer", "smallint": "short", "tinyint": "byte",
    "double": "double", "float": "float", "real": "float",
    "string": "string", "varchar": "string", "boolean": "boolean",
    "date": "date", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz", "binary": "binary",
}


def _delta_type(t: str) -> str:
    base = t.strip().lower()
    m = re.match(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", base)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if base in _SPARK_TYPE:
        return _SPARK_TYPE[base]
    raise ValueError(f"unsupported column type in CREATE TABLE: {t!r}")


def _parse_props(text: str) -> dict[str, str]:
    props: dict[str, str] = {}
    for item in _split_top(text):
        m = re.match(
            r"^\s*(?:'([^']+)'|\"([^\"]+)\"|([\w.]+))\s*=\s*"
            r"(?:'([^']*)'|\"([^\"]*)\"|(\S+))\s*$",
            item,
        )
        if not m:
            raise ValueError(f"unparseable TBLPROPERTIES entry: {item!r}")
        k = m.group(1) or m.group(2) or m.group(3)
        v = next(g for g in m.groups()[3:] if g is not None)
        props[k] = v
    return props


def _balanced(text: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at ``open_idx`` (quote-aware)."""
    depth, q = 0, None
    for i in range(open_idx, len(text)):
        ch = text[i]
        if q:
            if ch == q:
                q = None
            continue
        if ch in ("'", '"', "`"):
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parentheses in statement")


def _create(spark: SparkSession, sql: str):
    from rtdl_spark.sources.delta_alter import create_delta_table_native

    m = re.match(
        rf"^\s*CREATE\s+(?P<rep>OR\s+REPLACE\s+)?TABLE\s+"
        rf"(?P<ine>IF\s+NOT\s+EXISTS\s+)?{_TBL}\s*(?=\()",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(
            "unparseable CREATE TABLE — expected CREATE [OR REPLACE] "
            "TABLE [IF NOT EXISTS] delta.`/path` (col TYPE ..., ...) "
            "[USING DELTA] [PARTITIONED BY (...)] [CLUSTER BY (...)] "
            "[COMMENT '...'] [TBLPROPERTIES (...)]"
        )
    or_replace = bool(m.group("rep"))
    if_not_exists = bool(m.group("ine"))
    if or_replace and if_not_exists:
        raise ValueError(
            "OR REPLACE and IF NOT EXISTS are mutually exclusive"
        )
    path = m.group("path")
    if if_not_exists:
        from rtdl_spark.sources.delta_writer import _table_exists

        if _table_exists(spark, path.rstrip("/")):
            return {"version": None, "created": False}
    open_idx = m.end()
    close_idx = _balanced(sql, open_idx)
    cols_text = sql[open_idx + 1 : close_idx]
    tail = sql[close_idx + 1 :].strip()
    tail = re.sub(r"^USING\s+DELTA\s*", "", tail, flags=re.IGNORECASE)
    fields, identity, generated, not_null = [], {}, {}, []
    col_comments: dict[str, str] = {}
    for coldef in _split_top(cols_text):
        cm = _COLDEF_RE.match(coldef)
        if not cm:
            raise ValueError(f"unparseable column definition: {coldef!r}")
        name = _unquote_ident(cm.group("name"))
        dtype = _delta_type(cm.group("type"))
        rest = cm.group("rest").strip()
        # COMMENT can trail any other column clause — strip it first
        cmt = re.search(
            r"\bCOMMENT\s+'((?:[^']|'')*)'", rest, re.IGNORECASE
        )
        if cmt:
            col_comments[name] = cmt.group(1).replace("''", "'")
            rest = (rest[: cmt.start()] + rest[cmt.end():]).strip()
        im = _IDENTITY_RE.match(rest)
        gm = _GENERATED_RE.match(rest)
        if im:
            identity[name] = {
                "start": int(im.group(2) or 1),
                "step": int(im.group(3) or 1),
                "always": im.group(1).upper() == "ALWAYS",
            }
            rest = rest[im.end():].strip()
        elif gm:
            generated[name] = gm.group("expr").strip()
            rest = ""
        if re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE):
            not_null.append(name)
            rest = re.sub(
                r"\bNOT\s+NULL\b", "", rest, flags=re.IGNORECASE
            ).strip()
        if rest:
            raise ValueError(
                f"unsupported column-definition clause {rest!r} on "
                f"{name!r}"
            )
        fields.append((name, dtype))
    opts = {
        "partition_by": None, "cluster_by": None,
        "table_properties": None,
    }
    tm = re.search(
        r"PARTITIONED\s+BY\s*\(([^)]*)\)", tail, re.IGNORECASE
    )
    if tm:
        opts["partition_by"] = [
            _unquote_ident(c) for c in _split_top(tm.group(1))
        ]
    tm = re.search(r"CLUSTER\s+BY\s*\(([^)]*)\)", tail, re.IGNORECASE)
    if tm:
        opts["cluster_by"] = [
            _unquote_ident(c) for c in _split_top(tm.group(1))
        ]
    tm = re.search(
        r"TBLPROPERTIES\s*\((.*)\)\s*$", tail, re.IGNORECASE | re.DOTALL
    )
    if tm:
        opts["table_properties"] = _parse_props(tm.group(1))
    table_comment = None
    tm = re.search(
        r"\bCOMMENT\s+'((?:[^']|'')*)'", tail, re.IGNORECASE
    )
    if tm:
        table_comment = tm.group(1).replace("''", "'")
    leftover = tail
    for pat in (
        r"PARTITIONED\s+BY\s*\([^)]*\)",
        r"CLUSTER\s+BY\s*\([^)]*\)",
        r"COMMENT\s+'(?:[^']|'')*'",
        r"TBLPROPERTIES\s*\(.*\)",
    ):
        leftover = re.sub(pat, "", leftover, flags=re.IGNORECASE | re.DOTALL)
    if leftover.strip():
        raise ValueError(
            f"unsupported CREATE TABLE clause: {leftover.strip()!r}"
        )
    # build the schema as a StructType so column COMMENTs ride the
    # field metadata into the committed schemaString
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": n,
                    "type": t,
                    "nullable": True,
                    "metadata": (
                        {"comment": col_comments[n]}
                        if n in col_comments
                        else {}
                    ),
                }
                for n, t in fields
            ],
        }
    )
    return create_delta_table_native(
        spark, path, schema,
        identity=identity or None,
        generated=generated or None,
        not_null=not_null or None,
        comment=table_comment,
        or_replace=or_replace,
        **opts,
    )


def _rewrite_delta_refs(spark: SparkSession, text: str):
    """Replace every ``delta.`path``` reference (with optional VERSION
    AS OF / TIMESTAMP AS OF time travel) in a SQL text with a temp view
    over the native reader; returns (rewritten text, n substituted)."""
    import uuid as _uuid

    from rtdl_spark.sources import delta_reader as R

    ref = re.compile(
        r"delta\.`([^`]+)`"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?",
        re.IGNORECASE,
    )

    def _sub(m2):
        path, v, tstr = m2.group(1), m2.group(2), m2.group(3)
        name = f"delta_sql_view_{_uuid.uuid4().hex[:10]}"
        R.read_delta_native(
            spark, path,
            version=int(v) if v is not None else None,
            timestamp=tstr,
        ).createOrReplaceTempView(name)
        return name

    return ref.subn(_sub, text)


def delta_sql(spark: SparkSession, sql: str):
    """Execute one Delta SQL statement against path tables
    (``delta.`<path>```). Returns what the underlying native API
    returns (a result dict), or a DataFrame for DESCRIBE statements.
    Unrecognized syntax raises naming the native API to use."""
    from rtdl_spark.sources import delta_alter as A
    from rtdl_spark.sources import delta_reader as R
    from rtdl_spark.sources import delta_writer as W

    s = sql.strip().rstrip(";").strip()

    m = re.match(
        rf"^CREATE\s+TABLE\s+{_TBL}\s+SHALLOW\s+CLONE\s+"
        rf"delta\.`(?P<src>[^`]+)`"
        rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?$",
        s, re.IGNORECASE,
    )
    if m:
        from rtdl_spark.sources.delta_clone import clone_delta_native

        return clone_delta_native(
            spark, m.group("src"), m.group("path"),
            version=int(m.group("v")) if m.group("v") else None,
        )

    if re.match(
        r"^CREATE\s+(OR\s+REPLACE\s+)?TABLE\b", s, re.IGNORECASE
    ):
        return _create(spark, s)

    m = re.match(
        rf"^ALTER\s+TABLE\s+{_TBL}\s+(?P<rest>.*)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        path, rest = m.group("path"), m.group("rest").strip()
        am = re.match(
            r"^SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if am:
            return A.alter_set_tblproperties(
                spark, path, _parse_props(am.group("props"))
            )
        am = re.match(
            r"^UNSET\s+TBLPROPERTIES\s*(?P<ife>IF\s+EXISTS\s*)?"
            r"\((?P<keys>.*)\)$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if am:
            keys = [
                _unquote_ident(k.strip().strip("'\""))
                for k in _split_top(am.group("keys"))
            ]
            return A.alter_unset_tblproperties(
                spark, path, keys, if_exists=bool(am.group("ife"))
            )
        am = re.match(
            r"^ADD\s+CONSTRAINT\s+(?P<name>\w+)\s+CHECK\s*"
            r"\((?P<expr>.*)\)$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if am:
            return A.alter_add_constraint(
                spark, path, am.group("name"), am.group("expr").strip()
            )
        am = re.match(
            r"^DROP\s+CONSTRAINT\s+(?P<ife>IF\s+EXISTS\s+)?(?P<name>\w+)$",
            rest, re.IGNORECASE,
        )
        if am:
            return A.alter_drop_constraint(
                spark, path, am.group("name"),
                if_exists=bool(am.group("ife")),
            )
        am = re.match(
            r"^ADD\s+COLUMNS?\s*\((?P<cols>.*)\)$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if am:
            cols = []
            for coldef in _split_top(am.group("cols")):
                cm = _COLDEF_RE.match(coldef)
                if not cm or cm.group("rest").strip():
                    raise ValueError(
                        f"ADD COLUMNS takes plain `name TYPE` entries, "
                        f"got {coldef!r}"
                    )
                cols.append(
                    (
                        _unquote_ident(cm.group("name")),
                        _delta_type(cm.group("type")),
                    )
                )
            return A.alter_add_columns(spark, path, cols)
        am = re.match(
            r"^RENAME\s+COLUMN\s+(?P<old>`[^`]+`|\w+)\s+TO\s+"
            r"(?P<new>`[^`]+`|\w+)$",
            rest, re.IGNORECASE,
        )
        if am:
            return A.alter_rename_column(
                spark, path,
                _unquote_ident(am.group("old")),
                _unquote_ident(am.group("new")),
            )
        am = re.match(
            r"^DROP\s+COLUMN\s+(?P<col>`[^`]+`|\w+)$", rest, re.IGNORECASE
        )
        if am:
            return A.alter_drop_column(
                spark, path, _unquote_ident(am.group("col"))
            )
        am = re.match(
            r"^CLUSTER\s+BY\s+NONE$", rest, re.IGNORECASE
        )
        if am:
            return A.alter_cluster_by(spark, path, None)
        am = re.match(
            r"^CLUSTER\s+BY\s*\((?P<cols>[^)]*)\)$", rest, re.IGNORECASE
        )
        if am:
            return A.alter_cluster_by(
                spark, path,
                [_unquote_ident(c) for c in _split_top(am.group("cols"))],
            )
        am = re.match(
            r"^ALTER\s+COLUMN\s+(?P<col>`[^`]+`|\w+)\s+SYNC\s+IDENTITY$",
            rest, re.IGNORECASE,
        )
        if am:
            return W.sync_identity_delta_native(
                spark, path, columns=[_unquote_ident(am.group("col"))]
            )
        raise ValueError(
            f"unsupported ALTER TABLE clause {rest!r} — see "
            "rtdl_spark.sources.delta_alter for the native APIs"
        )

    m = re.match(
        rf"^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?{_TBL}"
        rf"\s*(?:\((?P<cols>[^)]*)\)\s*)?"
        rf"(?P<body>(?:VALUES|SELECT|WITH)\b.+)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        # INSERT INTO / INSERT OVERWRITE: build the rows with Spark SQL
        # (delta.`path` refs in a SELECT source rewrite to native-reader
        # views), align positionally to the target columns, and append/
        # overwrite through the native writer — generated/identity
        # columns omitted via an explicit column list are computed by
        # the append lane as usual
        from rtdl_spark.sources.delta_reader import snapshot_actions

        import json as _json

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        body = m.group("body").strip()
        if re.match(r"^VALUES\b", body, re.IGNORECASE):
            src_df = spark.sql(f"SELECT * FROM {body}")
        else:
            rewritten, _n = _rewrite_delta_refs(spark, body)
            src_df = spark.sql(rewritten)
        _, meta, _, _, _ = snapshot_actions(spark, m.group("path"))
        schema = StructType.fromJson(_json.loads(meta["schemaString"]))
        if m.group("cols"):
            targets = [
                _unquote_ident(c) for c in _split_top(m.group("cols"))
            ]
            bad = [c for c in targets if c not in schema.fieldNames()]
            if bad:
                raise ValueError(
                    f"INSERT column(s) not in the table schema: {bad}"
                )
        else:
            targets = schema.fieldNames()
        if len(src_df.columns) != len(targets):
            raise ValueError(
                f"INSERT arity mismatch: {len(src_df.columns)} "
                f"value column(s) for {len(targets)} target column(s) "
                f"{targets}"
            )
        by_name = {f.name: f for f in schema.fields}
        aligned = src_df.select(
            *[
                F.col(f"`{src_df.columns[i]}`")
                .cast(by_name[t].dataType)
                .alias(t)
                for i, t in enumerate(targets)
            ]
        )
        version = W.write_delta_native(
            spark, aligned, m.group("path"),
            mode="append" if m.group("mode").upper() == "INTO"
            else "overwrite",
        )
        return {"version": version, "rows": None}

    m = re.match(
        rf"^DELETE\s+FROM\s+{_TBL}(?:\s+WHERE\s+(?P<cond>.+))?$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        # no WHERE = delete everything (delta-spark's DELETE FROM t)
        return W.delete_where_delta_native(
            spark, m.group("path"),
            m.group("cond").strip() if m.group("cond") else "true",
        )

    m = re.match(
        rf"^UPDATE\s+{_TBL}\s+SET\s+(?P<sets>.+?)"
        rf"(?:\s+WHERE\s+(?P<cond>.+))?$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        sets = {}
        for item in _split_top(m.group("sets")):
            em = re.match(
                r"^(`[^`]+`|\w+)\s*=\s*(.+)$", item, re.DOTALL
            )
            if not em:
                raise ValueError(f"unparseable SET clause: {item!r}")
            sets[_unquote_ident(em.group(1))] = em.group(2).strip()
        return W.update_where_delta_native(
            spark, m.group("path"),
            # no WHERE = update every row (delta-spark parity)
            m.group("cond").strip() if m.group("cond") else "true",
            sets,
        )

    m = re.match(
        rf"^MERGE\s+INTO\s+{_TBL}\s+(?:AS\s+)?(?P<talias>\w+)\s+"
        rf"USING\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|[\w.]+)\s+"
        rf"(?:AS\s+)?(?P<salias>\w+)\s+ON\s+(?P<on>.+?)\s+"
        rf"(?P<clauses>WHEN\s+.*)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        talias, salias = m.group("talias"), m.group("salias")
        on_cols = []
        for conj in re.split(
            r"\s+AND\s+", m.group("on"), flags=re.IGNORECASE
        ):
            em = re.match(
                rf"^\s*{talias}\.(`[^`]+`|\w+)\s*=\s*"
                rf"{salias}\.(`[^`]+`|\w+)\s*$",
                conj, re.IGNORECASE,
            )
            if not em or _unquote_ident(em.group(1)) != _unquote_ident(
                em.group(2)
            ):
                raise ValueError(
                    "MERGE ON must be a conjunction of t.col = s.col "
                    "equalities on the SAME column names (the native "
                    "merge keys on shared names) — got "
                    f"{conj.strip()!r}"
                )
            on_cols.append(_unquote_ident(em.group(1)))
        clauses_text = m.group("clauses").strip()
        # full clause grammar (r10): WHEN MATCHED [AND cond] THEN
        # UPDATE SET (*|assignments) | DELETE, and WHEN NOT MATCHED
        # [AND cond] THEN INSERT (*|(cols) VALUES (exprs)) — clause
        # ORDER is semantic (first condition that holds wins)
        clause_re = re.compile(
            r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
            r"(?P<bysrc>\s+BY\s+SOURCE)?"
            r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
            r"(?P<act>UPDATE\s+SET\s+.+?|DELETE|INSERT\s+.+?)"
            r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
            re.IGNORECASE | re.DOTALL,
        )
        matched_cl: list[dict] = []
        not_matched_cl: list[dict] = []
        by_source_cl: list[dict] = []
        consumed = 0
        for w in clause_re.finditer(clauses_text):
            consumed += 1
            cond = w.group("cond").strip() if w.group("cond") else None
            act = w.group("act").strip()
            act_u = re.sub(r"\s+", " ", act.upper())
            if w.group("not") and w.group("bysrc"):
                # WHEN NOT MATCHED BY SOURCE: UPDATE SET ... | DELETE
                # over target-only rows
                if act_u == "DELETE":
                    by_source_cl.append(
                        {"action": "delete", "condition": cond,
                         "set": None}
                    )
                    continue
                um = re.match(
                    r"^UPDATE\s+SET\s+(?P<sets>.+)$",
                    act, re.IGNORECASE | re.DOTALL,
                )
                if not um or um.group("sets").strip() == "*":
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE supports UPDATE "
                        "SET col = expr, ... (no *) or DELETE — got "
                        f"{act!r}"
                    )
                sets = {}
                for item in _split_top(um.group("sets").strip()):
                    em = re.match(
                        r"^(`[^`]+`|[\w.]+)\s*=\s*(.+)$",
                        item, re.DOTALL,
                    )
                    if not em:
                        raise ValueError(
                            f"unparseable SET clause: {item!r}"
                        )
                    col = _unquote_ident(em.group(1))
                    if col.lower().startswith(talias.lower() + "."):
                        col = col[len(talias) + 1:]
                    sets[col] = em.group(2).strip()
                by_source_cl.append(
                    {"action": "update", "condition": cond,
                     "set": sets}
                )
                continue
            if w.group("not"):
                im = re.match(
                    r"^INSERT\s*(?:\*|\((?P<cols>[^)]*)\)\s*VALUES"
                    r"\s*\((?P<vals>.*)\))$",
                    act, re.IGNORECASE | re.DOTALL,
                )
                if not im:
                    raise ValueError(
                        "WHEN NOT MATCHED supports INSERT * or "
                        f"INSERT (cols) VALUES (exprs) — got {act!r}"
                    )
                if im.group("cols") is None:
                    values = None
                else:
                    cols = [
                        _unquote_ident(c.strip())
                        for c in _split_top(im.group("cols"))
                    ]
                    exprs = [
                        e.strip() for e in _split_top(im.group("vals"))
                    ]
                    if len(cols) != len(exprs):
                        raise ValueError(
                            "INSERT column list and VALUES list have "
                            f"different lengths: {cols} vs {exprs}"
                        )
                    values = dict(zip(cols, exprs))
                not_matched_cl.append(
                    {"action": "insert", "condition": cond,
                     "values": values}
                )
            elif act_u == "DELETE":
                matched_cl.append(
                    {"action": "delete", "condition": cond, "set": None}
                )
            else:
                um = re.match(
                    r"^UPDATE\s+SET\s+(?P<sets>.+)$",
                    act, re.IGNORECASE | re.DOTALL,
                )
                if not um:
                    raise ValueError(
                        "WHEN MATCHED supports UPDATE SET ... or "
                        f"DELETE — got {act!r}"
                    )
                sets_text = um.group("sets").strip()
                if sets_text == "*":
                    sets = None
                else:
                    sets = {}
                    for item in _split_top(sets_text):
                        em = re.match(
                            r"^(`[^`]+`|[\w.]+)\s*=\s*(.+)$",
                            item, re.DOTALL,
                        )
                        if not em:
                            raise ValueError(
                                f"unparseable SET clause: {item!r}"
                            )
                        col = _unquote_ident(em.group(1))
                        # tolerate t.col = ... qualification
                        if col.lower().startswith(talias.lower() + "."):
                            col = col[len(talias) + 1:]
                        sets[col] = em.group(2).strip()
                matched_cl.append(
                    {"action": "update", "condition": cond, "set": sets}
                )
        n_when = len(
            re.findall(
                r"\bWHEN\s+(?:NOT\s+)?MATCHED\b",
                clauses_text, re.IGNORECASE,
            )
        )
        if consumed == 0 or consumed != n_when:
            raise ValueError(
                "could not parse every WHEN clause of the MERGE — "
                "supported: WHEN MATCHED [AND cond] THEN UPDATE SET "
                "(*|col = expr, ...) | DELETE, WHEN NOT MATCHED "
                "[AND cond] THEN INSERT (*|(cols) VALUES (exprs)), "
                "WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE "
                "SET col = expr, ... | DELETE"
            )
        src_text = m.group("src")
        source = (
            spark.sql(src_text[1:-1])
            if src_text.startswith("(")
            else spark.table(src_text)
        )
        return W.merge_into_delta_native(
            spark, m.group("path"), source, on=on_cols,
            when_matched=matched_cl or "ignore",
            when_not_matched=not_matched_cl or "ignore",
            when_not_matched_by_source=by_source_cl or None,
            aliases=(talias, salias),
        )

    m = re.match(
        r"^CONVERT\s+TO\s+DELTA\s+parquet\.`(?P<path>[^`]+)`"
        r"(?:\s+PARTITIONED\s+BY\s*\((?P<ps>[^)]*)\))?$",
        s, re.IGNORECASE,
    )
    if m:
        return W.convert_to_delta_native(
            spark, m.group("path"),
            partition_schema=m.group("ps"),
        )

    m = re.match(
        rf"^REORG\s+TABLE\s+{_TBL}\s+APPLY\s*\(\s*PURGE\s*\)$",
        s, re.IGNORECASE,
    )
    if m:
        return W.optimize_delta_native(
            spark, m.group("path"), purge_only=True
        )

    m = re.match(
        rf"^OPTIMIZE\s+{_TBL}"
        rf"(?:\s+WHERE\s+(?P<where>.+?))?"
        rf"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]*)\))?$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m:
        kwargs: dict = {}
        if m.group("z"):
            kwargs["zorder_by"] = [
                _unquote_ident(c) for c in _split_top(m.group("z"))
            ]
        if m.group("where"):
            where: dict[str, str] = {}
            for conj in re.split(
                r"\s+AND\s+", m.group("where"), flags=re.IGNORECASE
            ):
                em = re.match(
                    r"^\s*(`[^`]+`|\w+)\s*=\s*'?([^']*?)'?\s*$", conj
                )
                if not em:
                    raise ValueError(
                        "OPTIMIZE WHERE takes partition equality "
                        f"conjuncts, got {conj.strip()!r}"
                    )
                where[_unquote_ident(em.group(1))] = em.group(2)
            kwargs["where"] = where
        return W.optimize_delta_native(spark, m.group("path"), **kwargs)

    m = re.match(
        rf"^VACUUM\s+{_TBL}(?:\s+RETAIN\s+(?P<h>\d+)\s+HOURS)?"
        rf"(?:\s+(?P<dry>DRY\s+RUN))?$",
        s, re.IGNORECASE,
    )
    if m:
        kwargs = {}
        if m.group("h"):
            kwargs["retain_ms"] = int(m.group("h")) * 3600 * 1000
        if m.group("dry"):
            # delta-spark's VACUUM DRY RUN returns the deletable paths
            # as a one-column frame without deleting anything
            victims = W.vacuum_delta_native(
                spark, m.group("path"), dry_run=True, **kwargs
            )
            return spark.createDataFrame(
                [(p,) for p in victims], "path string"
            )
        return W.vacuum_delta_native(spark, m.group("path"), **kwargs)

    m = re.match(
        rf"^RESTORE\s+TABLE\s+{_TBL}\s+TO\s+"
        rf"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
        rf"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')$",
        s, re.IGNORECASE,
    )
    if m:
        if m.group("v") is not None:
            target = int(m.group("v"))
        else:
            target = R.version_at_timestamp(
                spark, m.group("path"), m.group("ts")
            )
        return W.restore_delta_native(spark, m.group("path"), target)

    m = re.match(
        rf"^DESCRIBE\s+HISTORY\s+{_TBL}$", s, re.IGNORECASE
    )
    if m:
        import json as _json

        hist = R.delta_history(spark, m.group("path"))
        return spark.createDataFrame(
            [
                (
                    h["version"], h["timestamp"], h["operation"],
                    _json.dumps(h.get("operationParameters") or {},
                                sort_keys=True),
                )
                for h in hist
            ],
            "version long, timestamp long, operation string, "
            "operationParameters string",
        )

    m = re.match(
        rf"^SHOW\s+TBLPROPERTIES\s+{_TBL}$", s, re.IGNORECASE
    )
    if m:
        from rtdl_spark.sources.delta_reader import snapshot_actions

        _, meta, _, _, _ = snapshot_actions(spark, m.group("path"))
        props = sorted((meta.get("configuration") or {}).items())
        return spark.createDataFrame(
            props or [("", "")], "key string, value string"
        ).filter("key <> ''")

    m = re.match(rf"^DESCRIBE\s+DETAIL\s+{_TBL}$", s, re.IGNORECASE)
    if m:
        d = R.describe_detail(spark, m.group("path"))
        import json as _json

        return spark.createDataFrame(
            [
                (
                    d["format"], d["id"], d["location"],
                    d["createdAt"], d["lastModified"], d["version"],
                    d["numFiles"], d["sizeInBytes"],
                    _json.dumps(d["partitionColumns"]),
                    _json.dumps(d["clusteringColumns"]),
                    _json.dumps(d["properties"], sort_keys=True),
                    d["minReaderVersion"], d["minWriterVersion"],
                    _json.dumps(d["tableFeatures"]),
                )
            ],
            "format string, id string, location string, createdAt long, "
            "lastModified long, version long, numFiles long, "
            "sizeInBytes long, partitionColumns string, "
            "clusteringColumns string, properties string, "
            "minReaderVersion int, minWriterVersion int, "
            "tableFeatures string",
        )

    if re.match(r"^(SELECT|WITH)\b", s, re.IGNORECASE):
        # plain SELECT/WITH: substitute every delta.`path` [VERSION AS
        # OF n | TIMESTAMP AS OF '...'] reference with a temp view over
        # the native reader (time travel included) and hand the
        # rewritten text to Spark SQL — the read half of "a delta-spark
        # user could paste their SQL"
        rewritten, n = _rewrite_delta_refs(spark, s)
        if n == 0:
            raise ValueError(
                "SELECT carries no delta.`<path>` reference — run it "
                "through spark.sql directly"
            )
        return spark.sql(rewritten)

    raise ValueError(
        f"unrecognized Delta SQL statement: {s[:80]!r}... — supported: "
        "CREATE TABLE [SHALLOW CLONE], ALTER TABLE (TBLPROPERTIES / "
        "CONSTRAINT / COLUMNS / CLUSTER BY / SYNC IDENTITY), DELETE "
        "FROM, UPDATE, MERGE INTO, OPTIMIZE, VACUUM, RESTORE TABLE, "
        "DESCRIBE HISTORY|DETAIL; plain SELECTs go through "
        "read_delta_native / the session catalog"
    )
