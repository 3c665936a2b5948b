"""SQL front-end (icepack/sql.py): the reference docs' own statement
forms, run end-to-end against the warehouse.  Each test uses the
dialect exactly as the docs write it — CREATE ICEBERG TABLE with
PARTITION BY transforms (docs/01:182-205), the DML battery
(docs/08:84-141 incl. the conditional matched-DELETE MERGE), time
travel AT() (docs/05:57-72), maintenance ALTERs (docs/10), schema
evolution (docs/06:20-51), and metadata relations (docs/10:127-140)."""

import pytest

from icepack.sql import IceSQL, parse_predicate
from icepack.expr import col

from tests.conftest import rows_sorted


@pytest.fixture()
def isql(spark, warehouse):
    return IceSQL(spark, warehouse)


def _seed(isql):
    isql.sql(
        """
        CREATE ICEBERG TABLE db.items (
            id    INT NOT NULL,
            name  VARCHAR(64),
            value DOUBLE,
            ts    TIMESTAMP_NTZ
        )
        BASE_LOCATION = 'items/'
        """
    )
    isql.sql(
        "INSERT INTO db.items VALUES "
        "(1, 'a', 10.0, TIMESTAMP '2024-01-01 00:00:00'),"
        "(2, 'b', 20.0, TIMESTAMP '2024-01-02 00:00:00'),"
        "(3, 'c', 30.0, TIMESTAMP '2024-02-03 00:00:00')"
    )
    return isql


def test_create_insert_select(isql):
    _seed(isql)
    df = isql.sql("SELECT id, name, value FROM items ORDER BY id")
    assert [tuple(r) for r in df.collect()] == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)
    ]


def test_create_partitioned_with_transforms(isql, spark):
    t = isql.sql(
        """
        CREATE ICEBERG TABLE db.ev (
            event_id BIGINT NOT NULL,
            service  VARCHAR(256),
            payload  VARIANT,
            start_time TIMESTAMP_NTZ NOT NULL
        )
        PARTITION BY (DATE(start_time), service)
        """
    )
    spec = [(pf.transform) for pf in t.meta.spec.fields]
    assert spec == ["day", "identity"]
    # VARIANT lands as a JSON string column (queried via get_json_object)
    assert dict((f.name, f.type) for f in t.meta.schema.fields)["payload"] == "string"


def test_delete_where(isql):
    _seed(isql)
    isql.sql("DELETE FROM db.items WHERE value >= 20.0 AND name <> 'c'")
    assert sorted(r["id"] for r in isql.sql("SELECT id FROM items").collect()) == [1, 3]


def test_update_set_where(isql):
    _seed(isql)
    isql.sql("UPDATE db.items SET value = value + 10 WHERE name = 'a'")
    got = {r["id"]: r["value"] for r in isql.sql("SELECT id, value FROM items").collect()}
    assert got == {1: 20.0, 2: 20.0, 3: 30.0}


def test_merge_docs_form(isql, spark):
    """The docs/08:133-141 MERGE verbatim: conditional matched-DELETE,
    matched-UPDATE, not-matched-INSERT."""
    _seed(isql)
    spark.createDataFrame(
        [(2, 99.0, False), (3, 0.0, True), (4, 40.0, False)],
        "id int, value double, deleted boolean",
    ).createOrReplaceTempView("source_rows")
    isql.sql(
        """
        MERGE INTO db.items t
        USING (SELECT * FROM source_rows) s ON t.id = s.id
        WHEN MATCHED AND s.deleted THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.value = s.value
        WHEN NOT MATCHED THEN INSERT (id, value) VALUES (s.id, s.value)
        """
    )
    got = {r["id"]: r["value"] for r in isql.sql("SELECT id, value FROM items").collect()}
    assert got == {1: 10.0, 2: 99.0, 4: 40.0}


def test_time_travel_at_and_before(isql):
    _seed(isql)
    s1 = isql.sql("SELECT snapshot_id FROM db.items$SNAPSHOTS ORDER BY committed_at_ms ASC").collect()[0][0]
    isql.sql("DELETE FROM db.items WHERE id = 1")
    now = [tuple(r) for r in isql.sql("SELECT id FROM items ORDER BY id").collect()]
    assert now == [(2,), (3,)]
    back = isql.sql(
        f"SELECT id FROM db.items AT (SNAPSHOT => {s1}) ORDER BY id"
    )
    assert [r["id"] for r in back.collect()] == [1, 2, 3]
    # AT (TIMESTAMP => ...) far in the future resolves to current
    cur = isql.sql(
        "SELECT id FROM db.items AT (TIMESTAMP => '2099-01-01 00:00:00') ORDER BY id"
    )
    assert [r["id"] for r in cur.collect()] == [2, 3]
    # OFFSET => 0 (now) is the current snapshot too
    cur2 = isql.sql("SELECT COUNT(*) AS n FROM db.items AT (OFFSET => 0)")
    assert cur2.collect()[0]["n"] == 2


def test_schema_evolution_alters(isql):
    _seed(isql)
    isql.sql("ALTER ICEBERG TABLE db.items ADD COLUMN tier VARCHAR(8)")
    isql.sql("ALTER ICEBERG TABLE db.items RENAME COLUMN name TO item_name")
    isql.sql("ALTER ICEBERG TABLE db.items ALTER COLUMN id SET DATA TYPE BIGINT")
    df = isql.sql("SELECT id, item_name, tier FROM items ORDER BY id")
    assert df.schema["id"].dataType.simpleString() == "bigint"
    assert [tuple(r) for r in df.collect()] == [
        (1, "a", None), (2, "b", None), (3, "c", None)
    ]
    isql.sql("ALTER ICEBERG TABLE db.items DROP COLUMN tier")
    assert "tier" not in isql.sql("SELECT * FROM items").columns


def test_maintenance_alters(isql):
    _seed(isql)
    for i in range(3):
        isql.sql(f"INSERT INTO db.items VALUES ({10+i}, 'x', 1.0, TIMESTAMP '2024-03-01 00:00:00')")
    before = isql.sql("SELECT COUNT(*) AS n FROM db.items$FILES").collect()[0]["n"]
    isql.sql("ALTER ICEBERG TABLE db.items COMPACT DATA TARGET_FILE_SIZE_BYTES = 134217728")
    after = isql.sql("SELECT COUNT(*) AS n FROM db.items$FILES").collect()[0]["n"]
    assert after < before
    isql.sql("ALTER ICEBERG TABLE db.items REWRITE MANIFESTS")
    # docs/03:205-206 spelling (RETAIN LAST, no =)
    isql.sql("ALTER ICEBERG TABLE db.items EXPIRE SNAPSHOTS RETAIN LAST 1")
    assert isql.sql("SELECT COUNT(*) AS n FROM items").collect()[0]["n"] == 6
    assert isql.sql("SELECT COUNT(*) AS n FROM db.items$SNAPSHOTS").collect()[0]["n"] == 1
    isql.sql("ALTER ICEBERG TABLE db.items REMOVE ORPHAN FILES")
    # docs/03:187 bare-COMPACT spelling and table functions (docs/03:171-181)
    isql.sql("ALTER ICEBERG TABLE db.items COMPACT")
    n = isql.sql(
        "SELECT COUNT(*) AS n FROM TABLE(INFORMATION_SCHEMA.ICEBERG_TABLE_FILES('db.items'))"
    ).collect()[0]["n"]
    assert n >= 1
    info = isql.sql("SELECT SYSTEM$GET_ICEBERG_TABLE_INFORMATION('db.items')")
    assert info.filter("property = 'location'").count() == 1


def test_mor_property_switch(isql):
    """docs/08:108-110: ALTER ... SET ENABLE_ICEBERG_MERGE_ON_READ."""
    _seed(isql)
    isql.sql("ALTER ICEBERG TABLE db.items SET ENABLE_ICEBERG_MERGE_ON_READ = TRUE")
    isql.sql("DELETE FROM db.items WHERE id = 2")
    t = isql.catalog.load_table("db.items")
    deletes = [e for e in t.live_files(content="all") if e.content.endswith("-deletes")]
    assert deletes, "MOR delete should have written a delete file"
    assert sorted(r["id"] for r in isql.sql("SELECT id FROM items").collect()) == [1, 3]


def test_ctas_and_metadata_relations(isql):
    _seed(isql)
    isql.sql("CREATE ICEBERG TABLE db.big AS SELECT id, value * 2 AS value2 FROM items WHERE id > 1")
    assert sorted(
        tuple(r) for r in isql.sql("SELECT id, value2 FROM big").collect()
    ) == [(2, 40.0), (3, 60.0)]
    mans = isql.sql("SELECT * FROM db.big$MANIFESTS")
    assert mans.count() >= 1
    hist = isql.sql("SELECT * FROM db.big$HISTORY")
    assert hist.filter("is_current").count() == 1
    shown = isql.sql("SHOW ICEBERG TABLES")
    names = {r["name"] for r in shown.collect()}
    assert {"db.items", "db.big"} <= names
    desc = isql.sql("DESCRIBE ICEBERG TABLE db.big")
    assert desc.filter("property = 'location'").count() == 1


def test_drop_undrop(isql):
    _seed(isql)
    isql.sql("DROP ICEBERG TABLE db.items")
    assert "db.items" not in {r["name"] for r in isql.sql("SHOW ICEBERG TABLES").collect()}
    isql.sql("UNDROP ICEBERG TABLE db.items")
    assert isql.sql("SELECT COUNT(*) AS n FROM items").collect()[0]["n"] == 3


def test_predicate_parser_matches_python_expr(spark):
    """The SQL predicate subset parses to the same pruning Expr
    semantics as the Python col() DSL."""
    p = parse_predicate(
        "a >= 10 AND (b = 'x' OR b IN ('y', 'z')) AND c IS NOT NULL "
        "AND d BETWEEN 1 AND 5 AND NOT e = TRUE"
    )
    q = (
        (col("a") >= 10)
        & ((col("b") == "x") | col("b").isin("y", "z"))
        & col("c").is_not_null()
        & ((col("d") >= 1) & (col("d") <= 5))
        & ~(col("e") == True)  # noqa: E712
    )
    rows = [
        {"a": 10, "b": "y", "c": 0, "d": 3, "e": False},
        {"a": 9, "b": "x", "c": 0, "d": 3, "e": False},
        {"a": 10, "b": "q", "c": 0, "d": 3, "e": False},
        {"a": 10, "b": "x", "c": None, "d": 3, "e": False},
        {"a": 10, "b": "x", "c": 0, "d": 9, "e": False},
        {"a": 10, "b": "x", "c": 0, "d": 3, "e": True},
    ]
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], "a int, b string, c int, d int, e boolean"
    )
    assert rows_sorted(df.filter(p.to_column())) == rows_sorted(df.filter(q.to_column()))
    # and the file-stats evaluation agrees on a no-stats file (keep)
    assert p.may_match_file({}, 10) and q.may_match_file({}, 10)


def test_medallion_pipeline_docs_sql(isql):
    """The docs/12:94-126 bronze→silver→gold pipeline nearly verbatim:
    VARIANT path extraction with ::TYPE casts, incremental high-water
    filter, and the gold MERGE upsert with positional INSERT VALUES."""
    isql.sql(
        "CREATE ICEBERG TABLE bronze.events_raw (payload VARIANT, ingested_at TIMESTAMP_NTZ)"
    )
    isql.sql(
        """INSERT INTO bronze.events_raw VALUES
        ('{"event_id": 1, "event_type": "click", "user_id": 7, "event_time": "2024-01-01 10:00:00"}', TIMESTAMP '2024-01-01 10:00:01'),
        ('{"event_id": 2, "event_type": "click", "user_id": 8, "event_time": "2024-01-01 11:00:00"}', TIMESTAMP '2024-01-01 11:00:01'),
        ('{"event_id": 3, "event_type": "view",  "user_id": 7, "event_time": "2024-01-01 12:00:00"}', TIMESTAMP '2024-01-01 12:00:01')"""
    )
    isql.sql(
        "CREATE ICEBERG TABLE silver.events_cleaned "
        "(event_id BIGINT, event_type VARCHAR(32), user_id BIGINT, event_time TIMESTAMP_NTZ)"
    )
    silver_insert = """
        INSERT INTO silver.events_cleaned
        SELECT
          payload:event_id::BIGINT,
          payload:event_type::STRING,
          payload:user_id::BIGINT,
          payload:event_time::TIMESTAMP_NTZ
        FROM bronze.events_raw
        WHERE payload:event_time::TIMESTAMP_NTZ
              > (SELECT COALESCE(MAX(event_time), TIMESTAMP '1970-01-01')
                 FROM silver.events_cleaned)
    """
    isql.sql(silver_insert)
    assert isql.sql("SELECT COUNT(*) AS n FROM silver.events_cleaned").collect()[0]["n"] == 3
    # re-running moves nothing (high-water filter)
    isql.sql(silver_insert)
    assert isql.sql("SELECT COUNT(*) AS n FROM silver.events_cleaned").collect()[0]["n"] == 3

    isql.sql(
        "CREATE ICEBERG TABLE gold.daily_event_summary "
        "(event_date DATE, event_type VARCHAR(32), event_count BIGINT, unique_users BIGINT)"
    )
    gold_merge = """
        MERGE INTO gold.daily_event_summary AS target
        USING (
          SELECT
            DATE(event_time) as event_date,
            event_type,
            COUNT(*) as event_count,
            COUNT(DISTINCT user_id) as unique_users
          FROM silver.events_cleaned
          WHERE DATE(event_time) = DATE '2024-01-01'
          GROUP BY 1, 2
        ) AS source
        ON target.event_date = source.event_date
           AND target.event_type = source.event_type
        WHEN MATCHED THEN UPDATE SET
          event_count = source.event_count,
          unique_users = source.unique_users
        WHEN NOT MATCHED THEN INSERT VALUES (
          source.event_date, source.event_type,
          source.event_count, source.unique_users
        )
    """
    isql.sql(gold_merge)
    got = {
        (str(r["event_date"]), r["event_type"]): (r["event_count"], r["unique_users"])
        for r in isql.sql("SELECT * FROM gold.daily_event_summary").collect()
    }
    assert got == {
        ("2024-01-01", "click"): (2, 2),
        ("2024-01-01", "view"): (1, 1),
    }
    # late event arrives → silver increment → gold MERGE updates in place
    isql.sql(
        """INSERT INTO bronze.events_raw VALUES
        ('{"event_id": 4, "event_type": "click", "user_id": 9, "event_time": "2024-01-01 13:00:00"}', TIMESTAMP '2024-01-01 13:00:01')"""
    )
    isql.sql(silver_insert)
    isql.sql(gold_merge)
    got = {
        (str(r["event_date"]), r["event_type"]): (r["event_count"], r["unique_users"])
        for r in isql.sql("SELECT * FROM gold.daily_event_summary").collect()
    }
    assert got == {
        ("2024-01-01", "click"): (3, 3),
        ("2024-01-01", "view"): (1, 1),
    }


def test_docs_create_statements_verbatim(isql):
    """The reference's own CREATE ICEBERG TABLE statements, character
    for character (docs/01:182-205 OTel; docs/07:87-115)."""
    t = isql.sql("""
        CREATE OR REPLACE ICEBERG TABLE otel_traces (
            trace_id            VARCHAR(32)   NOT NULL,
            span_id             VARCHAR(16)   NOT NULL,
            parent_span_id      VARCHAR(16),
            trace_state         VARCHAR(512),
            span_name           VARCHAR(256)  NOT NULL,
            span_kind           VARCHAR(20),
            start_time          TIMESTAMP_NTZ NOT NULL,
            end_time            TIMESTAMP_NTZ NOT NULL,
            duration_ms         INT,
            status_code         VARCHAR(10),
            status_message      VARCHAR(1024),
            service_name        VARCHAR(256)  NOT NULL,
            service_namespace   VARCHAR(256),
            service_version     VARCHAR(64),
            resource_attributes VARIANT,
            span_attributes     VARIANT,
            events              VARIANT,
            links               VARIANT
        )
        CATALOG         = 'SNOWFLAKE'
        EXTERNAL_VOLUME = 'otel_traces_vol'
        BASE_LOCATION   = 'traces/'
        PARTITION BY (DATE(start_time), service_name)
    """)
    assert len(t.meta.schema.fields) == 18
    assert [pf.transform for pf in t.meta.spec.fields] == ["day", "identity"]
    assert t.meta.properties.get("external_volume") == "otel_traces_vol"

    t2 = isql.sql("""
        CREATE ICEBERG TABLE user_events (
          user_id BIGINT,
          event_time TIMESTAMP,
          event_data VARIANT
        )
          CATALOG = 'SNOWFLAKE'
          EXTERNAL_VOLUME = 'my_vol'
          BASE_LOCATION = 'user_events/'
          PARTITION BY (BUCKET(16, user_id), DATE(event_time))
    """)
    assert [pf.transform for pf in t2.meta.spec.fields] == ["bucket[16]", "day"]
    t3 = isql.sql("""
        CREATE ICEBERG TABLE orders2 (
          order_id BIGINT,
          order_date DATE,
          region STRING,
          amount DECIMAL(10,2)
        )
          PARTITION BY (region, order_date)
    """)
    assert dict((f.name, f.type) for f in t3.meta.schema.fields)["amount"] == "decimal(10,2)"
    assert [pf.transform for pf in t3.meta.spec.fields] == ["identity", "identity"]


def test_docs_external_volume_and_catalog_integration_verbatim(isql):
    """The reference's named-object DDL, character for character
    (docs/01:174-180 external volume; docs/04:58-93 Glue and REST
    catalog integrations) — created, listed, and describable."""
    isql.sql("""
        CREATE OR REPLACE EXTERNAL VOLUME otel_traces_vol
        STORAGE_LOCATIONS = ((
            NAME            = 's3_otel_data'
            STORAGE_PROVIDER = 'S3'
            STORAGE_BASE_URL = 's3://my-data-lake/otel/'
            STORAGE_AWS_ROLE_ARN = 'arn:aws:iam::123456789012:role/snowflake-iceberg-role'
        ))
    """)
    vol = isql.catalog.get_external_volume("otel_traces_vol")
    assert vol["storage_locations"][0]["STORAGE_BASE_URL"] == "s3://my-data-lake/otel/"

    isql.sql("""
        CREATE CATALOG INTEGRATION glue_catalog
          CATALOG_SOURCE = GLUE
          CATALOG_NAMESPACE = 'my_glue_database'
          TABLE_FORMAT = ICEBERG
          GLUE_AWS_ROLE_ARN = 'arn:aws:iam::123456789:role/glue-role'
          GLUE_CATALOG_ID = '123456789'
          ENABLED = TRUE
    """)
    isql.sql("""
        CREATE CATALOG INTEGRATION rest_catalog
          CATALOG_SOURCE = ICEBERG_REST
          TABLE_FORMAT = ICEBERG
          CATALOG_URI = 'https://my-catalog.example.com/api'
          WAREHOUSE = 'my_warehouse'
          ENABLED = TRUE
    """)
    glue = isql.catalog.get_catalog_integration("glue_catalog")
    assert glue["CATALOG_SOURCE"] == "GLUE" and glue["ENABLED"] == "TRUE"
    names = {r["name"] for r in isql.sql("SHOW CATALOG INTEGRATIONS").collect()}
    assert names == {"glue_catalog", "rest_catalog"}
    assert [r["name"] for r in isql.sql("SHOW EXTERNAL VOLUMES").collect()] == [
        "otel_traces_vol"
    ]
    props = {
        r["property"]: r["value"]
        for r in isql.sql("DESCRIBE EXTERNAL VOLUME otel_traces_vol").collect()
    }
    assert props["storage_location[0].STORAGE_PROVIDER"] == "S3"
    d = {
        r["property"]: r["value"]
        for r in isql.sql("DESCRIBE CATALOG INTEGRATION rest_catalog").collect()
    }
    assert d["CATALOG_URI"] == "https://my-catalog.example.com/api"


def test_docs_catalog_linked_table_stops_at_seam(isql):
    """docs/04's columnless CREATE (link to an externally-cataloged
    table) parses, validates its named objects, and — for a GLUE
    integration with NO endpoint (real AWS unreachable offline) —
    stops with the documented endpoint-seam error; an endpointed Glue
    integration resolves via gluecat.py (tests/test_gluecat.py)."""
    import pytest

    isql.sql("""
        CREATE CATALOG INTEGRATION glue_cat2
          CATALOG_SOURCE = GLUE
          TABLE_FORMAT = ICEBERG
          ENABLED = TRUE
    """)
    with pytest.raises(NotImplementedError, match="GLUE_ENDPOINT"):
        isql.sql("""
            CREATE ICEBERG TABLE my_table
              CATALOG = 'glue_cat2'
              CATALOG_TABLE_NAME = 'source_table'
        """)
    # REST integrations DO resolve (restcat.py) — a dead URI must fail
    # at the network layer, not with the seam error
    isql.sql("""
        CREATE CATALOG INTEGRATION rest_cat2
          CATALOG_SOURCE = ICEBERG_REST
          TABLE_FORMAT = ICEBERG
          CATALOG_URI = 'http://127.0.0.1:9'
          ENABLED = TRUE
    """)
    with pytest.raises(Exception, match="(?i)connection|refused|urlopen"):
        isql.sql("""
            CREATE ICEBERG TABLE my_table
              CATALOG = 'rest_cat2'
              CATALOG_TABLE_NAME = 'ns.source_table'
        """)
    with pytest.raises(ValueError, match="unknown catalog_integrations"):
        isql.sql("""
            CREATE ICEBERG TABLE my_table
              CATALOG = 'nope'
              CATALOG_TABLE_NAME = 'source_table'
        """)


def test_docs_hybrid_view_and_maintenance_task_verbatim(isql):
    """docs/12:169-172 (hybrid UNION ALL view — tracks base-table
    changes on every read), docs/10:174-183 (CREATE TASK + ALTER TASK
    RESUME; EXECUTE runs the body on demand — the engine stores tasks,
    an external scheduler owns the CRON tick), docs/05:94
    (SHOW PARAMETERS LIKE ... IN TABLE)."""
    isql.sql("CREATE ICEBERG TABLE native.recent_events (id INT, v DOUBLE)")
    isql.sql("CREATE ICEBERG TABLE iceberg.historical_events (id INT, v DOUBLE)")
    isql.sql("INSERT INTO native.recent_events VALUES (1, 1.0), (2, 2.0)")
    isql.sql("INSERT INTO iceberg.historical_events VALUES (10, 10.0)")

    isql.sql("""
        CREATE VIEW analytics.all_events AS
        SELECT * FROM native.recent_events
        UNION ALL
        SELECT * FROM iceberg.historical_events
    """)
    assert isql.sql("SELECT COUNT(*) AS n FROM analytics.all_events").collect()[0].n == 3
    # views are not frozen snapshots: new rows appear on the next read
    isql.sql("INSERT INTO iceberg.historical_events VALUES (11, 11.0)")
    assert isql.sql("SELECT COUNT(*) AS n FROM analytics.all_events").collect()[0].n == 4

    isql.sql("CREATE ICEBERG TABLE my_table (id INT, v DOUBLE)")
    isql.sql("INSERT INTO my_table VALUES (1, 1.0), (2, 2.0)")
    isql.sql("""
        CREATE TASK iceberg_maintenance_task
          WAREHOUSE = maintenance_wh
          SCHEDULE = 'USING CRON 0 2 * * 0 America/Los_Angeles'
        AS
          ALTER ICEBERG TABLE my_table COMPACT DATA
    """)
    task = isql.catalog._get_object("tasks", "iceberg_maintenance_task")
    assert task["state"] == "suspended" and "CRON 0 2" in task["schedule"]
    isql.sql("ALTER TASK iceberg_maintenance_task RESUME")
    assert (
        isql.catalog._get_object("tasks", "iceberg_maintenance_task")["state"]
        == "started"
    )
    before = len(isql.sql("SELECT * FROM my_table$SNAPSHOTS").collect())
    isql.sql("EXECUTE TASK iceberg_maintenance_task")
    after = len(isql.sql("SELECT * FROM my_table$SNAPSHOTS").collect())
    assert after == before + 1  # the compaction committed a snapshot

    rows = isql.sql(
        "SHOW PARAMETERS LIKE 'DATA_RETENTION%' IN TABLE my_table"
    ).collect()
    assert [(r.key, r.value) for r in rows] == [("DATA_RETENTION_TIME_IN_DAYS", "1")]


def test_docs_database_native_table_and_describe(isql):
    """docs/04:100-107 (catalog-linked CREATE DATABASE + USE DATABASE:
    unqualified creates land in the database namespace), docs/12:151-156
    (plain CREATE TABLE ... CLUSTER BY — the 'native' hot table — on
    the same table layer), docs/03:168 (DESCRIBE TABLE structure)."""
    isql.sql("""
        CREATE CATALOG INTEGRATION glue_catalog
          CATALOG_SOURCE = GLUE
          TABLE_FORMAT = ICEBERG
          ENABLED = TRUE
    """)
    isql.sql("CREATE DATABASE my_glue_db CATALOG = 'glue_catalog'")
    isql.sql("USE DATABASE my_glue_db")
    isql.sql("""
        CREATE ICEBERG TABLE new_table (
          id INT,
          value STRING
        )
    """)
    assert isql.catalog.table_exists("my_glue_db.new_table")

    isql.sql("""
        CREATE TABLE native.recent_events (
          event_id BIGINT,
          event_time TIMESTAMP,
          data VARIANT
        ) CLUSTER BY (DATE(event_time))
    """)
    t = isql.catalog.load_table("native.recent_events")
    assert t.meta.properties["table_type"] == "native"
    assert t.meta.properties["cluster_by"] == "event_time:day"

    rows = {r["name"]: r["type"] for r in isql.sql("DESCRIBE TABLE new_table").collect()}
    assert rows == {"id": "int", "value": "string"}


def test_docs_structured_types_ddl_verbatim(spark, tmp_path):
    """docs/06-schema-evolution.md:121-136 — the structured-type CREATE
    (OBJECT/ARRAY/MAP parametrized spellings) must produce REAL nested
    Iceberg columns (struct/array/map), not degrade to strings, and the
    whole write→scan path must work on them (footer-stat harvest skips
    nested paths; pruning keeps files with unknown stats)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql(
        """
        CREATE ICEBERG TABLE events_nested (
          event_id BIGINT,
          event_time TIMESTAMP,
          user OBJECT(
            id BIGINT,
            name STRING,
            tags ARRAY(STRING)
          ),
          properties MAP(STRING, STRING)
        )
        BASE_LOCATION = 'events/'
        """
    )
    t = isql.catalog.load_table("events_nested")
    types = {f.name: f.type for f in t.meta.schema.fields}
    assert types["user"] == "struct<id:bigint,name:string,tags:array<string>>"
    assert types["properties"] == "map<string,string>"
    isql.sql(
        "INSERT INTO events_nested SELECT 1, TIMESTAMP '2024-01-01 00:00:00',"
        " named_struct('id', 7L, 'name', 'ada', 'tags', array('a','b')),"
        " map('k','v')"
    )
    row = isql.sql(
        "SELECT event_id, user.name AS uname, user.tags[1] AS tag1,"
        " properties['k'] AS pk FROM events_nested"
    ).collect()[0]
    assert (row.event_id, row.uname, row.tag1, row.pk) == (1, "ada", "b", "v")
    # bare (semi-structured) spellings still land as VARIANT-style strings
    isql.sql("CREATE ICEBERG TABLE semi (v VARIANT, o OBJECT, a ARRAY)")
    semi = isql.catalog.load_table("semi")
    assert {f.type for f in semi.meta.schema.fields} == {"string"}


def test_docs_monitoring_query_history_verbatim(spark, tmp_path):
    """docs/09-query-performance.md:181-194 — the monitoring query over
    TABLE(INFORMATION_SCHEMA.QUERY_HISTORY()) runs verbatim, and the
    pruning metrics it exposes are REAL: a partition predicate on a
    single-table SELECT goes through manifest pruning (docs/09:17-44),
    so partitions_scanned < partitions_total, while an unparseable or
    alias-qualified predicate falls back to a full scan with identical
    results."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE ev (id BIGINT, cat STRING) PARTITION BY (cat)")
    isql.sql("INSERT INTO ev VALUES (1,'a'),(2,'b'),(3,'a')")
    pruned = isql.sql("SELECT id FROM ev WHERE cat = 'a'").collect()
    assert sorted(r.id for r in pruned) == [1, 3]
    # fallback shapes: alias-qualified and function predicates
    assert [r.id for r in isql.sql("SELECT id FROM ev AS x WHERE x.cat = 'b'").collect()] == [2]
    assert isql.sql("SELECT count(*) AS n FROM ev WHERE upper(cat) = 'A'").collect()[0].n == 2

    hist = isql.sql(
        """
        SELECT
          query_id,
          query_text,
          partitions_scanned,
          partitions_total,
          bytes_scanned,
          rows_produced
        FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())
        WHERE query_type = 'SELECT'
        ORDER BY start_time DESC
        """
    ).collect()
    by_text = {r.query_text: r for r in hist}
    p = by_text["SELECT id FROM ev WHERE cat = 'a'"]
    assert (p.partitions_scanned, p.partitions_total) == (1, 2)
    assert p.bytes_scanned > 0
    full = by_text["SELECT id FROM ev AS x WHERE x.cat = 'b'"]
    assert (full.partitions_scanned, full.partitions_total) == (2, 2)


def test_docs_information_schema_tables_verbatim(spark, tmp_path):
    """docs/11-multi-engine-compatibility.md:160-166 — format-version
    check through TABLE(INFORMATION_SCHEMA.TABLES)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE my_table (id BIGINT)")
    rows = isql.sql(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.TABLES) WHERE table_name = 'MY_TABLE'"
    ).collect()
    assert len(rows) == 1
    assert rows[0].table_format == "ICEBERG"


def test_star_join_where_prunes_fact_side(spark, tmp_path):
    """Per-table conjunct routing: in a fact-dim join, the WHERE's
    fact-only conjuncts reach the fact table's manifest pruning while
    dim conjuncts route to the dim — partitions_scanned drops below
    total in QUERY_HISTORY and results are unchanged.  Ambiguous and
    OR-spanning predicates must NOT be split (semantics first)."""
    from icepack.sql import IceSQL, _split_top_and

    # splitter semantics: OR at top level refuses to split; BETWEEN's
    # AND never splits; quoted ANDs are opaque
    assert _split_top_and("a = 1 AND b = 2") == ["a = 1", "b = 2"]
    assert _split_top_and("a = 1 OR b = 2 AND c = 3") == ["a = 1 OR b = 2 AND c = 3"]
    assert _split_top_and("x BETWEEN 1 AND 5 AND y = 2") == ["x BETWEEN 1 AND 5", "y = 2"]
    assert _split_top_and("(a = 1 OR b = 2) AND c = 3") == ["(a = 1 OR b = 2)", "c = 3"]
    assert _split_top_and("n = 'it''s AND x' AND z = 1") == ["n = 'it''s AND x'", "z = 1"]

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE fact (id BIGINT, fcat STRING, v DOUBLE) PARTITION BY (fcat)")
    isql.sql("CREATE ICEBERG TABLE dim (dcat STRING, label STRING)")
    isql.sql("INSERT INTO fact VALUES (1,'a',1.0),(2,'b',2.0),(3,'a',3.0)")
    isql.sql("INSERT INTO dim VALUES ('a','alpha'),('b','beta')")
    got = isql.sql(
        "SELECT f.id, d.label FROM fact f JOIN dim d ON f.fcat = d.dcat"
        " WHERE fcat = 'a' AND v < 2.5 AND label = 'alpha'"
    ).collect()
    assert [(r.id, r.label) for r in got] == [(1, "alpha")]
    h = isql.sql(
        "SELECT partitions_scanned, partitions_total FROM"
        " TABLE(INFORMATION_SCHEMA.QUERY_HISTORY()) WHERE query_type = 'SELECT'"
    ).collect()[-1]
    assert (h.partitions_scanned, h.partitions_total) == (1, 2)


def test_time_travel_select_prunes_like_current(spark, tmp_path):
    """AT()/BEFORE() scans get the same WHERE-conjunct manifest pruning
    ordinary SELECTs do (docs/09:17-44) — the file list just comes from
    the PINNED snapshot's manifests.  Before this, a time-travel audit
    query always scanned the full snapshot."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE tt (id BIGINT, cat STRING) PARTITION BY (cat)")
    isql.sql("INSERT INTO tt VALUES (1,'a'),(2,'b'),(3,'a')")
    snap_id = isql.sql("SELECT snapshot_id FROM tt$SNAPSHOTS").collect()[-1].snapshot_id
    isql.sql("INSERT INTO tt VALUES (4,'a'),(5,'c')")  # after the pin

    got = isql.sql(
        f"SELECT id FROM tt AT(SNAPSHOT => {snap_id}) WHERE cat = 'a'"
    ).collect()
    assert sorted(r.id for r in got) == [1, 3]  # snapshot-correct rows
    h = isql.sql(
        "SELECT partitions_scanned, partitions_total FROM"
        " TABLE(INFORMATION_SCHEMA.QUERY_HISTORY()) WHERE query_type = 'SELECT'"
    ).collect()[-1]
    assert (h.partitions_scanned, h.partitions_total) == (1, 2)


def test_parse_predicate_matches_spark_semantics(spark):
    """parse_predicate feeds file pruning, so a MIS-parse (rather than
    a refusal) is silent row loss: every parsed WHERE must select
    exactly the rows Spark's own `where(<string>)` selects; unsupported
    shapes must refuse (the router then skips pruning — safe)."""
    import datetime as dt

    from pyspark.sql import Row

    from icepack.sql import parse_predicate

    rows = [
        Row(
            id=i if i % 7 else None,
            cat=None if i % 5 == 0 else "abc"[i % 3],
            v=float(i) * 1.5,
            s=str(i),
            ts=dt.datetime(2024, 1, 1 + i % 9),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    wheres = [
        "id < 5", "id <= 5", "id > 30", "id >= 30", "id = 7", "id != 7",
        "id <> 7", "cat = 'a'", "cat != 'b'", "id BETWEEN 2 AND 6",
        "cat IN ('a','b')", "id IS NULL", "id IS NOT NULL", "NOT cat = 'a'",
        "NOT (id < 20)", "id < 5 AND cat = 'b'", "id < 2 OR id > 35",
        "(id < 3 OR id > 37) AND cat = 'a'",
        "ts >= TIMESTAMP '2024-01-03 00:00:00'", "ts < '2024-01-05'",
        "v > 10.5", "v <= 1.5", "s = '7'", "s > '25'", "id IN (1,2,3)",
    ]
    refusals = ["cat LIKE 'a%'", "id % 2 = 0", "upper(cat) = 'A'"]
    for w in wheres:
        e = parse_predicate(w)
        a = sorted(r.id for r in df.filter(e.to_column()).collect() if r.id is not None)
        b = sorted(r.id for r in df.where(w).collect() if r.id is not None)
        assert a == b, f"parse drift for {w!r}: parsed={a} spark={b}"
    for w in refusals:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_predicate(w)


def test_result_scan_replays_query_results(spark, tmp_path):
    """docs/09:92-99 — RESULT_SCAN('<query_id>') surfaces a prior
    statement's result set by the id QUERY_HISTORY reports; the
    LAST_QUERY_ID() spelling picks the most recent statement."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE rs (id BIGINT, v DOUBLE)")
    isql.sql("INSERT INTO rs VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    isql.sql("SELECT id, v FROM rs WHERE id >= 2")
    qid = isql.sql(
        "SELECT query_id FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
        " WHERE query_type = 'SELECT' ORDER BY start_time DESC"
    ).collect()[0].query_id
    replay = isql.sql(f"SELECT * FROM TABLE(RESULT_SCAN('{qid}'))")
    assert sorted((r.id, r.v) for r in replay.collect()) == [(2, 2.0), (3, 3.0)]
    # LAST_QUERY_ID() replays the RESULT_SCAN we just ran — same rows
    again = isql.sql("SELECT COUNT(*) AS n FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))")
    assert again.collect()[0].n == 2
    with pytest.raises(ValueError, match="no retained result"):
        isql.sql("SELECT * FROM TABLE(RESULT_SCAN('9999'))")


def test_dml_where_falls_back_to_spark_expressions(spark, tmp_path):
    """docs/12:179-186 tiering DML verbatim shape: WHERE clauses the
    pruning language refuses (DATEADD / CURRENT_DATE calls) fall back
    to Spark-evaluated predicates — no pruning, same correctness — for
    COW and MOR tables (MOR without identifier columns switches to
    position deletes, which need no keys)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    for name, props in [("cw", ""), ("mr", " TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")]:
        isql.sql(f"CREATE ICEBERG TABLE {name} (id BIGINT, event_time TIMESTAMP){props}")
        isql.sql(
            f"INSERT INTO {name} VALUES"
            " (1, TIMESTAMP '2020-01-01 00:00:00'),"  # ancient: tiered out
            " (2, TIMESTAMP '2020-01-02 00:00:00'),"
            " (3, TIMESTAMP '2099-01-01 00:00:00')"   # far future: stays
        )
        isql.sql(
            f"DELETE FROM {name} WHERE event_time < DATEADD(day, -30, CURRENT_DATE())"
        )
        assert sorted(r.id for r in isql.sql(f"SELECT id FROM {name}").collect()) == [3]
    # UPDATE with an opaque WHERE too
    isql.sql("UPDATE cw SET id = id + 10 WHERE event_time > DATEADD(day, 30, CURRENT_DATE())")
    assert sorted(r.id for r in isql.sql("SELECT id FROM cw").collect()) == [13]


def test_clustering_information_docs_verbatim(spark, tmp_path):
    """docs/07:168-173 — SYSTEM$CLUSTERING_INFORMATION over manifest
    stats: random layout shows deep overlaps, a CLUSTER BY rewrite
    drives average_depth toward 1 (pruning-effective bounds)."""
    import json as _json

    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE cl (id BIGINT, v DOUBLE)")
    spark.createDataFrame([(i, float(i)) for i in range(2000)], "id bigint, v double") \
        .createOrReplaceTempView("cl_src")
    isql.sql("INSERT INTO cl SELECT * FROM cl_src")
    t = isql.catalog.load_table("cl")
    t.compact(target_file_size=8 * 1024)  # several files, random-ish layout

    def info():
        row = isql.sql(
            "SELECT SYSTEM$CLUSTERING_INFORMATION('cl', '(id)')"
        ).collect()[0]
        return _json.loads(row.clustering_information)

    before = info()
    assert before["total_file_count"] > 1
    t.compact(target_file_size=8 * 1024, cluster_by=["id"])
    after = info()
    assert after["columns"]["id"]["average_depth"] <= before["columns"]["id"]["average_depth"]
    assert after["columns"]["id"]["average_overlaps"] <= 1.0  # clustered: near-disjoint


def test_before_statement_docs_verbatim(spark, tmp_path):
    """docs/05:66-72 — BEFORE (STATEMENT => '<query_id>') reads the
    table as it stood before that statement committed; the query id is
    the one QUERY_HISTORY reports for the DML, not a snapshot id."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE bs (id BIGINT, v DOUBLE)")
    isql.sql("INSERT INTO bs VALUES (1, 1.0), (2, 2.0)")
    isql.sql("DELETE FROM bs WHERE id = 1")
    qid = isql.sql(
        "SELECT query_id FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
        " WHERE query_type = 'DELETE'"
    ).collect()[-1].query_id
    assert [r.id for r in isql.sql("SELECT id FROM bs ORDER BY id").collect()] == [2]
    back = isql.sql(
        f"SELECT id FROM bs BEFORE (STATEMENT => '{qid}') ORDER BY id"
    )
    assert [r.id for r in back.collect()] == [1, 2]
    with pytest.raises(ValueError, match="query id unknown"):
        isql.sql("SELECT * FROM bs BEFORE (STATEMENT => '777')")


def test_opaque_delete_rewrites_only_true_hit_files(spark, tmp_path):
    """An opaque WHERE prunes nothing, so every file is a candidate —
    the hit-detection scan must keep the rewrite to files that actually
    contain matches (at 100 TB the difference between rewriting one
    file and rewriting the table)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE oh (id BIGINT, v DOUBLE)")
    for lo in (0, 100, 200):  # three files with disjoint id ranges
        spark.createDataFrame(
            [(lo + i, float(i)) for i in range(5)], "id bigint, v double"
        ).createOrReplaceTempView("oh_src")
        isql.sql("INSERT INTO oh SELECT * FROM oh_src")
    t = isql.catalog.load_table("oh")
    before = {f.path for f in t.live_files()}
    assert len(before) >= 3
    isql.sql("DELETE FROM oh WHERE id + 0 = 102")  # opaque: arithmetic
    t.refresh()
    after = {f.path for f in t.live_files()}
    # exactly the one file containing id=102 was rewritten
    assert len(before - after) == 1
    assert sorted(r.id for r in isql.sql("SELECT id FROM oh").collect()) == sorted(
        i for i in list(range(5)) + list(range(100, 105)) + list(range(200, 205))
        if i != 102
    )


def test_result_cache_hit_and_invalidation(spark, tmp_path):
    """Cross-query result caching (docs/01-table-format-architecture.md:163):
    identical statement + unchanged snapshot → the retained plan is
    reused (QUERY_HISTORY marks the hit); ANY commit to a referenced
    table invalidates; volatile statements and unknown relations are
    never cached."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE rc (id BIGINT, v DOUBLE)")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id bigint, v double"
    ).createOrReplaceTempView("rc_seed")
    isql.sql("INSERT INTO rc SELECT * FROM rc_seed")

    q = "SELECT id, v FROM rc WHERE id < 5"
    r1 = isql.sql(q)
    r2 = isql.sql(q)  # hit: same retained plan object
    assert r2 is r1
    hist = {
        r.query_id: r.cache_hit
        for r in isql.sql("SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())")
        .filter("query_text = '%s'" % q)
        .collect()
    }
    assert sorted(hist.values()) == [False, True]

    # commit invalidates: re-execution, not the stale plan
    isql.sql("INSERT INTO rc SELECT * FROM rc_seed")
    r3 = isql.sql(q)
    assert r3 is not r1
    assert r3.count() == 10  # fresh rows included

    # invalidation also sees commits from ANOTHER session
    isql2 = IceSQL(spark, str(tmp_path / "wh"))
    r4 = isql.sql(q)  # prime
    spark.createDataFrame([(100, 1.0)], "id bigint, v double").createOrReplaceTempView(
        "rc_seed2"
    )
    isql2.sql("INSERT INTO rc SELECT * FROM rc_seed2")
    assert isql.sql(q) is not r4

    # a statement referencing a session temp view is NOT cached (its
    # content can change without any snapshot moving)
    qq = "SELECT COUNT(*) AS n FROM rc JOIN rc_seed ON rc.id = rc_seed.id"
    a = isql.sql(qq)
    assert isql.sql(qq) is not a

    # volatile statements are not cached
    qv = "SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
    b = isql.sql(qv)
    assert isql.sql(qv) is not b


def test_result_cache_comma_join_temp_view_not_cached(spark, tmp_path):
    """FROM t1, t2 (comma join): the second relation must be checked
    too — a temp view there changes content without any snapshot
    moving, so the statement must never be served from cache (r5 audit)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE cj (id BIGINT)")
    spark.createDataFrame([(1,)], "id bigint").createOrReplaceTempView("cj_seed")
    isql.sql("INSERT INTO cj SELECT * FROM cj_seed")
    q = "SELECT COUNT(*) AS n FROM cj, cj_seed WHERE cj.id = cj_seed.id"
    a = isql.sql(q)
    assert a.first().n == 1
    # mutate ONLY the temp view; a (wrong) cache hit would still say 1
    spark.createDataFrame([(1,), (2,)], "id bigint").createOrReplaceTempView("cj_seed")
    b = isql.sql(q)
    assert b is not a


def test_result_cache_persists_across_sessions(spark, tmp_path):
    """docs/01:163 — the warehouse result cache survives sessions: a
    query that went HOT (second run) materializes under the warehouse;
    a brand-new IceSQL session over the same warehouse serves it with
    cache_hit=true and ZERO table scans; any commit on a referenced
    table invalidates (the fresh session recomputes)."""
    from icepack.sql import IceSQL

    wh = str(tmp_path / "wh")
    s1 = IceSQL(spark, wh)
    s1.sql("CREATE ICEBERG TABLE pc (id BIGINT, v DOUBLE)")
    spark.createDataFrame(
        [(1, 2.0), (2, 4.0)], "id bigint, v double"
    ).createOrReplaceTempView("pc_seed")
    s1.sql("INSERT INTO pc SELECT * FROM pc_seed")
    q = "SELECT id, v * 2 AS v2 FROM pc WHERE id > 0"
    want = sorted(map(tuple, s1.sql(q).collect()))
    s1.sql(q).collect()  # second run: hot → persisted to the warehouse

    s2 = IceSQL(spark, wh)  # FRESH session, cold in-session cache
    got = s2.sql(q)
    assert sorted(map(tuple, got.collect())) == want
    hist = {r["query_text"]: r for r in s2.sql(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
    ).collect()}
    assert hist[q]["cache_hit"] is True
    assert hist[q]["files_scanned"] is None  # served without scanning
    # a commit from ANOTHER session invalidates the persisted entry
    s1.sql("INSERT INTO pc SELECT id + 10, v FROM pc_seed")
    s3 = IceSQL(spark, wh)
    got3 = s3.sql(q)
    assert got3.count() == 4
    hist3 = {r["query_text"]: r for r in s3.sql(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
    ).collect()}
    assert hist3[q]["cache_hit"] is False
    # DDL (rename, no snapshot move) also invalidates cross-session:
    # version validation catches what snapshot ids cannot
    s3.sql(q)  # hot again → re-persisted at the new snapshot
    s4 = IceSQL(spark, wh)
    got4 = s4.sql(q)
    assert got4.count() == 4  # persisted hit at current state
    s1.sql("ALTER ICEBERG TABLE pc RENAME COLUMN v TO score")
    s5 = IceSQL(spark, wh)
    q5 = "SELECT id, score FROM pc"
    assert {r[0] for r in s5.sql(q5).select("id").collect()} == {1, 2, 11, 12}


def test_result_cache_invalidated_by_ddl_and_database_scoped(spark, tmp_path):
    """Schema-evolution DDL commits no snapshot yet changes what a
    cached SELECT means — any DDL clears the cache; and the cache key
    carries the active database so USE DATABASE can't serve a plan
    resolved against another namespace (r5 audit)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE dv (id BIGINT, v DOUBLE)")
    spark.createDataFrame([(1, 2.0)], "id bigint, v double").createOrReplaceTempView(
        "dv_seed"
    )
    isql.sql("INSERT INTO dv SELECT * FROM dv_seed")
    q = "SELECT * FROM dv"
    a = isql.sql(q)
    assert isql.sql(q) is a  # primed + hit
    isql.sql("ALTER ICEBERG TABLE dv RENAME COLUMN v TO score")  # snapshot UNCHANGED
    c = isql.sql(q)
    assert c is not a, "DDL must invalidate the result cache"
    assert "score" in c.columns


def test_alter_cherry_pick_snapshot(spark, tmp_path):
    """[ext] ALTER ICEBERG TABLE ... CHERRY-PICK SNAPSHOT <id> applies
    one branch commit onto main (docs/05:169-171)."""
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE cp (id BIGINT)")
    spark.createDataFrame([(1,), (2,)], "id bigint").createOrReplaceTempView("cp_seed")
    isql.sql("INSERT INTO cp SELECT * FROM cp_seed")
    t = isql._table(isql._resolve_name("cp"))
    t.create_branch("stage")
    b1 = t.append(spark.createDataFrame([(10,)], "id bigint"), branch="stage")
    t.append(spark.createDataFrame([(20,)], "id bigint"), branch="stage")
    isql.sql(f"ALTER ICEBERG TABLE cp CHERRY-PICK SNAPSHOT {b1.snapshot_id}")
    t.refresh()
    assert sorted(r.id for r in t.toDF().collect()) == [1, 2, 10]


def test_alter_convert_to_spec_primary(spark, tmp_path):
    """[ext] ALTER ICEBERG TABLE ... CONVERT TO SPEC PRIMARY migrates a
    populated native table to the shared spec-file tree metadata-only;
    subsequent SQL DML keeps working and the spec reader agrees."""
    import os

    from icepack.iceberg_import import read_iceberg
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE sp (id BIGINT, v DOUBLE)")
    spark.createDataFrame(
        [(1, 2.0), (2, 4.0), (3, 6.0)], "id bigint, v double"
    ).createOrReplaceTempView("sp_seed")
    isql.sql("INSERT INTO sp SELECT * FROM sp_seed")
    snap = isql.sql("ALTER ICEBERG TABLE sp CONVERT TO SPEC PRIMARY")
    assert snap.summary["converted-to"] == "spec-primary"
    isql.sql("DELETE FROM sp WHERE id = 2")
    t = isql._table(isql._resolve_name("sp"))
    t.refresh()
    assert t.spec_primary
    got = read_iceberg(spark, os.path.join(t.location, "metadata"))
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_alter_export_iceberg_metadata_and_scheduled(spark, tmp_path):
    """[ext] ALTER ICEBERG TABLE ... EXPORT ICEBERG METADATA writes a
    versioned spec export; a CREATE TASK can schedule it so the
    external view follows commits."""
    from icepack.iceberg_import import read_iceberg
    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE ex (id BIGINT)")
    spark.createDataFrame([(1,), (2,)], "id bigint").createOrReplaceTempView("ex_seed")
    isql.sql("INSERT INTO ex SELECT * FROM ex_seed")
    dest = str(tmp_path / "mirror")
    m1 = isql.sql(f"ALTER ICEBERG TABLE ex EXPORT ICEBERG METADATA TO '{dest}'")
    assert read_iceberg(spark, dest).count() == 2
    isql.sql("INSERT INTO ex SELECT id + 10 FROM ex_seed")
    m2 = isql.sql(f"ALTER ICEBERG TABLE ex EXPORT ICEBERG METADATA TO '{dest}'")
    assert m2.endswith("v2.metadata.json")
    assert read_iceberg(spark, dest).count() == 4
    # r11: FORMAT_VERSION = 3 routes to the v3 (deletion-vector) lane
    import json as _json

    dest3 = str(tmp_path / "mirror3")
    m3 = isql.sql(
        f"ALTER ICEBERG TABLE ex EXPORT ICEBERG METADATA TO '{dest3}' "
        "FORMAT_VERSION = 3"
    )
    md3 = _json.load(open(m3))
    assert md3["format-version"] == 3 and "next-row-id" in md3
    assert read_iceberg(spark, dest3).count() == 4


def test_alter_analyze_columns(spark, tmp_path):
    """[ext] ALTER ICEBERG TABLE ... ANALYZE COLUMNS (c) computes and
    persists the snapshot-keyed NDV/duplication stat (docs/04:45's
    automatic statistics collection made explicit)."""
    import json as _json

    from icepack.sql import IceSQL

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql("CREATE ICEBERG TABLE az (id BIGINT, txt STRING)")
    spark.createDataFrame(
        [(i, "dup" if i % 2 else f"u{i}") for i in range(40)], "id bigint, txt string"
    ).createOrReplaceTempView("az_seed")
    isql.sql("INSERT INTO az SELECT * FROM az_seed")
    out = isql.sql("ALTER ICEBERG TABLE az ANALYZE COLUMNS (txt)").collect()
    assert out[0]["column"] == "txt"
    # 20 dups of one value + 20 unique -> ratio ~ 40/21
    assert 1.5 <= out[0]["duplication_ratio"] <= 2.3
    t = isql._table(isql._resolve_name("az"))
    st = _json.loads(t.meta.properties["stats.ndv.txt"])
    assert st["snapshot-id"] == t.meta.current_snapshot_id
    assert st["rows"] == 40


def test_result_cache_cross_session_on_spec_primary(spark, tmp_path):
    """VERDICT r6 item 8: the persistent result cache validates
    (snapshot id, metadata version) — spec-primary tables version via
    version-hint.text/spec metadata.json, so pin the cross-session
    cycle on one: hit after a no-op (fresh session serves without
    scanning), miss + recompute after a commit from another session."""
    from icepack.sql import IceSQL

    wh = str(tmp_path / "wh sp")
    s1 = IceSQL(spark, wh)
    s1.sql(
        "CREATE ICEBERG TABLE spc (id BIGINT, v DOUBLE) "
        "TBLPROPERTIES ('format.spec-primary'='true')"
    )
    spark.createDataFrame(
        [(1, 2.0), (2, 4.0)], "id bigint, v double"
    ).createOrReplaceTempView("spc_seed")
    s1.sql("INSERT INTO spc SELECT * FROM spc_seed")
    # the table really is spec-primary on disk
    import os as _os

    t = s1.catalog.load_table("spc")
    assert t.spec_primary
    assert _os.path.exists(
        _os.path.join(t.location, "metadata", "version-hint.text")
    )
    q = "SELECT id, v * 3 AS v3 FROM spc WHERE id > 0"
    want = sorted(map(tuple, s1.sql(q).collect()))
    s1.sql(q).collect()  # hot -> persisted under the warehouse

    s2 = IceSQL(spark, wh)  # fresh session: served from the cache
    assert sorted(map(tuple, s2.sql(q).collect())) == want
    hist = {r["query_text"]: r for r in s2.sql(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
    ).collect()}
    assert hist[q]["cache_hit"] is True
    assert hist[q]["files_scanned"] is None
    # a spec-primary commit from another session invalidates
    s1.sql("INSERT INTO spc SELECT id + 10, v FROM spc_seed")
    s3 = IceSQL(spark, wh)
    assert s3.sql(q).count() == 4
    hist3 = {r["query_text"]: r for r in s3.sql(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
    ).collect()}
    assert hist3[q]["cache_hit"] is False
