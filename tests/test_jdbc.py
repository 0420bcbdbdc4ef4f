"""S3/F5: JDBC metadata scan against the embedded Derby engine — real
spark.read.jdbc round-trip, pushed predicates asserted in the plan, and the
reference's chunked-IN-list fan-out as parallel partitions."""

import pytest

from llacie_spark.jdbc import fetch_metadata, in_list_predicates, read_table

URL = "jdbc:derby:memory:edw;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE note_meta (note_id INT PRIMARY KEY, episode_id INT, "
        "note_type VARCHAR(16), quality_ok BOOLEAN)"
    )
    ps = conn.prepareStatement("INSERT INTO note_meta VALUES (?, ?, ?, ?)")
    for i in range(1, 201):
        ps.setInt(1, i)
        ps.setInt(2, (i - 1) // 2 + 1)
        ps.setString(3, "H&P" if i % 3 else "Progress")
        ps.setBoolean(4, i % 5 != 0)
        ps.executeUpdate()
    st.close()
    conn.close()
    yield URL


def test_jdbc_roundtrip_and_filter_pushdown(spark, derby):
    df = read_table(spark, derby, "note_meta", driver=DRIVER)
    assert df.count() == 200

    # F5-style quality predicate + F1 note type: both must reach the source
    filtered = df.where("quality_ok = true and note_type = 'H&P'").select(
        "note_id", "episode_id"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # both filters pushed into the source SQL, and the scan reads only the
    # two projected columns (Derby uppercases identifiers)
    assert "PushedFilters" in plan
    assert "EqualTo(QUALITY_OK,true)" in plan and "EqualTo(NOTE_TYPE,H&P)" in plan
    assert "ReadSchema: struct<NOTE_ID:int,EPISODE_ID:int>" in plan
    expected = sum(1 for i in range(1, 201) if i % 5 != 0 and i % 3 != 0)
    assert filtered.count() == expected


def test_in_list_chunking_parallel_partitions(spark, derby):
    keys = list(range(1, 41))
    preds = in_list_predicates("note_id", keys, chunk=10)
    assert len(preds) == 4 and preds[0].startswith("note_id IN (1,")

    df = fetch_metadata(spark, derby, "note_meta", "note_id", keys, chunk=10, driver=DRIVER)
    assert df.rdd.getNumPartitions() == 4  # one partition per IN-chunk
    assert df.count() == 40
    assert {r.NOTE_ID for r in df.collect()} == set(keys)  # Derby uppercases


def test_in_list_predicates_quote_strings(spark):
    preds = in_list_predicates("doc_id", ["a", "o'brien"], chunk=10)
    assert preds == ["doc_id IN ('a', 'o''brien')"]


def test_in_list_predicates_reject_bool_and_none():
    """bool is an int subclass — without an explicit check True renders as
    the bare word 'True' (invalid SQL in most warehouses); None as 'None'."""
    import pytest

    with pytest.raises(ValueError, match="unsupported IN-list key True"):
        in_list_predicates("flag", [True, False])
    with pytest.raises(ValueError, match="unsupported IN-list key None"):
        in_list_predicates("doc_id", [1, None])


def test_range_partitioned_read(spark, derby):
    df = read_table(
        spark, derby, "note_meta", driver=DRIVER,
        partition_column="note_id", lower_bound=1, upper_bound=201, num_partitions=8,
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 200
