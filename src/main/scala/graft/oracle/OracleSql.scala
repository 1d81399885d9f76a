package graft.oracle

/** DuckDB-dialect oracle SQL for the driver's correctness gate.
  *
  * `baseCtes` mirrors [[graft.model.ObjectsModel]] EXACTLY (same constants —
  * see [[graft.model.ModelConf]]). Every oracle query is `WITH <baseCtes>
  * SELECT …`. DuckDB runs these over the registered parquet tables
  * (`events`, `lineitem`, …) at sf0.01; the driver hash-compares against the
  * Spark result, so column names AND value-level semantics must agree.
  *
  * Portability rules used throughout (validated against DuckDB 1.0):
  *  - integer division via CAST(floor(a/b) AS BIGINT) (both engines do
  *    float division on `/`);
  *  - counts/sums of doubles → CAST to DECIMAL before aggregating;
  *  - timestamps → epoch millis (`epoch_ms` / `unix_millis`);
  *  - md5-hex → 60-bit int: DuckDB `CAST('0x'||substr(md5(s),1,15) AS
  *    BIGINT)`, Spark `conv(substr(md5(s),1,15),16,10)`;
  *  - every query ends with a deterministic ORDER BY.
  */
object OracleSql {

  val baseCtes: String = """
changes AS (
  SELECT
    CAST(floor(event_id / 10) AS BIGINT) AS cp,
    '0x' || lpad(CAST(event_id % 1000 AS VARCHAR), 6, '0') AS _id,
    event_id AS version,
    CASE event_type WHEN 'signup' THEN 'created' WHEN 'purchase' THEN 'deleted' WHEN 'error' THEN 'wrapped' ELSE 'mutated' END AS change_kind,
    (event_type = 'purchase') AS deletion,
    CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'Address' WHEN 1 THEN 'Object' WHEN 2 THEN 'Shared' ELSE 'Immutable' END AS owner_kind,
    CASE WHEN user_id % 4 = 0 THEN '0xa' || lpad(CAST(user_id AS VARCHAR), 5, '0')
         WHEN user_id % 4 = 1 THEN '0x' || lpad(CAST((user_id * 7 + event_id % 13) % 1000 AS VARCHAR), 6, '0')
         ELSE NULL END AS owner,
    CASE WHEN user_id % 4 = 2 THEN event_id ELSE NULL END AS initial_shared_version,
    CASE WHEN user_id % 4 = 1
         THEN '0x2::dynamic_field::Field<0x1::string::String,' || ('0x' || CAST(user_id % 3 AS VARCHAR) || '::' || event_type || '::T' || CAST(event_id % 5 AS VARCHAR)) || '>'
         ELSE '0x' || CAST(user_id % 3 AS VARCHAR) || '::' || event_type || '::T' || CAST(event_id % 5 AS VARCHAR) END AS type_full,
    CASE WHEN user_id % 4 = 1
         THEN '{"name":{"type":"0x1::string::String","fields":{"k":"' || json_extract_string(props, '$.k') || '"}},"value":{"fields":{"owner":"' || ('0xa' || lpad(CAST(user_id AS VARCHAR), 5, '0')) || '","v":"' || CAST(event_id % 50 AS VARCHAR) || '"}}}'
         ELSE props END AS fields_json,
    base64(encode(props)) AS bcs_b64,
    CAST((event_id * 37) % 10000 AS VARCHAR) AS storage_rebate_str,
    'tx' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS previous_transaction,
    'dg' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS digest,
    (event_id % 2 = 0) AS has_public_transfer,
    epoch_ms(ts) AS ts_ms,
    epoch_ms(ts) + event_id % 500 AS ts_first_seen,
    CASE WHEN CAST(floor(event_id / 10) AS BIGINT) % 3 = 0 THEN 'poll' ELSE 'livescan' END AS ingested_via,
    user_id, event_type, value
  FROM events
),
kept AS (SELECT * FROM changes WHERE change_kind <> 'wrapped'),
failures AS (SELECT * FROM kept WHERE version % 97 = 13),
processed AS (SELECT * FROM kept WHERE version % 97 <> 13),
latest AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT k.*, row_number() OVER (PARTITION BY _id ORDER BY version DESC) AS rn FROM kept k
  ) WHERE rn = 1
),
objects0 AS (
  SELECT l.*, deletion AS deleted,
    CASE WHEN strpos(type_full,'<') > 0 THEN substr(type_full, 1, strpos(type_full,'<')-1) ELSE type_full END AS type_head,
    CASE WHEN strpos(type_full,'<') > 0 THEN substr(type_full, strpos(type_full,'<')+1, length(type_full)-strpos(type_full,'<')-1) ELSE NULL END AS type_generics_raw
  FROM latest l
),
objects AS (
  SELECT o.*,
    split_part(type_head,'::',1) AS type_package,
    split_part(type_head,'::',2) AS type_module,
    split_part(type_head,'::',3) AS type_struct,
    '0x' || lower(hex(version)) AS version_hex,
    CAST(storage_rebate_str AS BIGINT) AS storage_rebate
  FROM objects0 o
),
completed AS (
  SELECT cp AS _id FROM kept GROUP BY cp
  HAVING count(*) = sum(CASE WHEN version % 97 <> 13 THEN 1 ELSE 0 END)
)"""

  /** Wrap a SELECT with the shared model CTEs. */
  def withModel(sql: String): String = s"WITH $baseCtes\n$sql"
}
