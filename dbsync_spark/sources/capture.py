"""Live-DB capture mode: trigger DDL generation, versioning, reconciliation.

The reference installs AFTER INSERT/UPDATE/DELETE row triggers that append
the JSON row image to sync_data, once per fan-out target, gated by the
per-op condition (S1-S3: dbopt/PgOperation.scala:110-268,
dbopt/MysqlOperation.scala:109-235). It hashes the trigger DDL to detect
config drift and rebuilds on mismatch (D2: PgOperation.scala:407-436),
drops triggers for removed rules (D3: job/SyncTrigger.scala:71-85), and
auto-creates the unique key index needed for upsert (D5:
SyncTrigger.scala:104-131).

Everything here is a pure function (config -> SQL strings / plans); a thin
JDBC executor runs them out-of-band — this is driver-side control plane,
not Spark data flow. Intended-semantics fixes vs the reference:
- MySQL U/D triggers gate on their OWN conditions (the reference reuses
  insertCondition: MysqlOperation.scala:160,202);
- index names are deterministic (the reference uses
  idx_<currentTimeMillis>: MysqlOperation.scala:505-512).
"""

from __future__ import annotations

from dbsync_spark.operators.partition import murmur3_spark_string
from dbsync_spark.operators.route import SyncRule

OPS = (("insert", "I", "NEW"), ("update", "U", "NEW"), ("delete", "D", "OLD"))


def trigger_name(rule: SyncRule, op: str) -> str:
    return f"dbsync_{rule.source_schema}_{rule.source_table}_{op}"


def _condition_for(rule: SyncRule, op: str) -> str:
    # per-op condition — intended semantics, not the reference's reuse of
    # insertCondition for U/D in the MySQL dialect
    return {
        "insert": rule.insert_condition,
        "update": rule.update_condition,
        "delete": rule.delete_condition,
    }[op]


def pg_trigger_ddl(rule: SyncRule, sys_schema: str, targets: list[str],
                   op: str) -> str:
    """PL/pgSQL trigger function + trigger for one op type; appends one
    sync_data row per fan-out target (row image via row_to_json)."""
    _, op_code, img = next(o for o in OPS if o[0] == op)
    cond = _condition_for(rule, op).replace("NEW.", f"{img}.").replace("OLD.", f"{img}.")
    name = trigger_name(rule, op)
    inserts = "\n    ".join(
        f"INSERT INTO {sys_schema}.sync_data "
        f"(\"sourceDb\", \"targetDb\", \"schema\", \"table\", operation, data) "
        f"VALUES ('{rule.source_db}', '{t}', '{rule.source_schema}', "
        f"'{rule.source_table}', '{op_code}', row_to_json({img}));"
        for t in targets
    )
    return f"""CREATE OR REPLACE FUNCTION {sys_schema}.{name}_fn() RETURNS trigger AS $$
BEGIN
  IF {cond} THEN
    {inserts}
  END IF;
  RETURN {img};
END;
$$ LANGUAGE plpgsql;
CREATE OR REPLACE TRIGGER {name}
AFTER {op.upper()} ON {rule.source_schema}.{rule.source_table}
FOR EACH ROW EXECUTE FUNCTION {sys_schema}.{name}_fn();"""


def mysql_trigger_ddl(rule: SyncRule, sys_schema: str, targets: list[str],
                      op: str, columns: list[str]) -> str:
    """MySQL trigger (no row_to_json: JSON_OBJECT built from introspected
    columns, the reference's INFORMATION_SCHEMA approach)."""
    _, op_code, img = next(o for o in OPS if o[0] == op)
    cond = _condition_for(rule, op).replace("NEW.", f"{img}.").replace("OLD.", f"{img}.")
    name = trigger_name(rule, op)
    json_pairs = ", ".join(f"'{c}', {img}.`{c}`" for c in columns)
    inserts = "\n    ".join(
        f"INSERT INTO `{sys_schema}`.`sync_data` "
        f"(sourceDb, targetDb, `schema`, `table`, operation, data) "
        f"VALUES ('{rule.source_db}', '{t}', '{rule.source_schema}', "
        f"'{rule.source_table}', '{op_code}', JSON_OBJECT({json_pairs}));"
        for t in targets
    )
    return f"""CREATE TRIGGER `{name}`
AFTER {op.upper()} ON `{rule.source_schema}`.`{rule.source_table}`
FOR EACH ROW
BEGIN
  IF {cond} THEN
    {inserts}
  END IF;
END"""


def trigger_version(ddl: str) -> str:
    """Config-drift hash of the DDL (the reference uses murmur3_32 of the
    trigger body, PgOperation.scala:152-160); stored in
    sync_trigger_version and compared each reconcile pass."""
    return format(murmur3_spark_string(ddl) & 0xFFFFFFFF, "08x")


def reconcile_triggers(desired: dict[str, str],
                       installed: dict[str, str]) -> dict[str, list[str]]:
    """D2+D3 reconciliation plan: desired/installed map trigger name ->
    version hash. Returns {create: [...], rebuild: [...], drop: [...]}."""
    create = sorted(n for n in desired if n not in installed)
    rebuild = sorted(n for n in desired
                     if n in installed and installed[n] != desired[n])
    drop = sorted(n for n in installed if n not in desired)
    return {"create": create, "rebuild": rebuild, "drop": drop}


def unique_index_name(rule: SyncRule) -> str:
    """Deterministic (reference quirk fix): derived from table + sorted keys."""
    ts, tt = rule.resolved_target()
    return f"dbsync_uk_{ts}_{tt}_" + "_".join(sorted(rule.source_keys))


def unique_index_ddl(rule: SyncRule, dialect: str = "postgresql") -> str:
    ts, tt = rule.resolved_target()
    cols = ", ".join(sorted(rule.source_keys))
    name = unique_index_name(rule)
    if dialect == "mysql":
        return f"CREATE UNIQUE INDEX `{name}` ON `{ts}`.`{tt}` ({cols})"
    return f"CREATE UNIQUE INDEX IF NOT EXISTS {name} ON {ts}.{tt} ({cols})"


def sys_table_ddl(sys_schema: str, dialect: str = "postgresql") -> list[str]:
    """D1 bootstrap: the four system tables (shapes per
    doc/systable.cn.md; engine-side we keep them as parquet/Delta, these
    are for live-DB capture mode)."""
    if dialect == "mysql":
        q = "`"
        auto = "BIGINT PRIMARY KEY AUTO_INCREMENT"
    else:
        q = '"'
        auto = "BIGSERIAL PRIMARY KEY"
    s = f"{q}{sys_schema}{q}"
    return [
        f"CREATE SCHEMA IF NOT EXISTS {s}",
        f"CREATE TABLE IF NOT EXISTS {s}.sync_data ("
        f"id {auto}, {q}sourceDb{q} VARCHAR(255), {q}targetDb{q} VARCHAR(255), "
        f"{q}schema{q} VARCHAR(255), {q}table{q} VARCHAR(255), "
        f"operation VARCHAR(1), data TEXT, "
        f"{q}createTime{q} TIMESTAMP DEFAULT CURRENT_TIMESTAMP)",
        f"CREATE TABLE IF NOT EXISTS {s}.sync_data_status ("
        f"{q}dataId{q} BIGINT PRIMARY KEY, status VARCHAR(3), message TEXT, "
        f"retry INT DEFAULT 0, {q}createTime{q} TIMESTAMP)",
        f"CREATE TABLE IF NOT EXISTS {s}.sync_trigger_version ("
        f"{q}schema{q} VARCHAR(255), {q}table{q} VARCHAR(255), "
        f"{q}trigger{q} VARCHAR(255), version VARCHAR(16), "
        f"{q}function{q} VARCHAR(255), {q}createTime{q} TIMESTAMP, "
        f"PRIMARY KEY ({q}schema{q}, {q}table{q}, {q}trigger{q}))",
        f"CREATE TABLE IF NOT EXISTS {s}.sync_polled ("
        f"{q}dataId{q} BIGINT PRIMARY KEY, {q}createTime{q} TIMESTAMP)",
    ]
