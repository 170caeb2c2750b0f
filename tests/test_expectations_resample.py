"""quality_expectations / resample_ffill / JSONL source / partitioned
sink tests."""

import datetime
import json
import os

from pyspark.sql import functions as F


def test_quality_expectations_counts_and_single_scan(spark):
    from waka_spark.operators.curation import quality_expectations

    df = spark.createDataFrame(
        [(1, "ok", 5), (2, "", 5), (None, "ok", -1), (4, "ok", 5)],
        "id long, text string, n int")
    rules = [
        ("id_not_null", F.col("id").isNotNull()),
        ("text_nonempty", F.length("text") > 0),
        ("n_positive", F.col("n") > 0),
    ]
    got = {r["rule"]: r for r in quality_expectations(df, rules).collect()}
    assert got["id_not_null"]["n_violations"] == 1
    assert got["text_nonempty"]["n_violations"] == 1
    assert got["n_positive"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["id_not_null"]["violation_rate"] == 0.25
    assert not got["id_not_null"]["passed"]

    # one corpus scan regardless of rule count
    plan = (
        quality_expectations(df, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1


def test_resample_ffill_fills_gaps(spark):
    from waka_spark.operators.temporal import resample_ffill

    t = datetime.datetime(2024, 1, 1, 12)

    def d(days, hour=12):
        return t + datetime.timedelta(days=days, hours=hour - 12)

    events = spark.createDataFrame(
        [
            (0, d(0), 1, "x", 10.0),
            (1, d(0, 18), 1, "x", 11.0),   # later same day wins
            (2, d(3), 1, "x", 30.0),       # days 1-2 are gaps
            (3, d(1), 2, "x", 5.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = {(r["key"], str(r["day"])): (r["value_ffill"], r["observed"])
           for r in resample_ffill(events).collect()}
    assert got[(1, "2024-01-01")] == (11.0, True)
    assert got[(1, "2024-01-02")] == (11.0, False)   # forward-filled
    assert got[(1, "2024-01-03")] == (11.0, False)
    assert got[(1, "2024-01-04")] == (30.0, True)
    assert got[(2, "2024-01-02")] == (5.0, True)
    assert len(got) == 5  # user 1: 4 days, user 2: 1 day


def test_read_transcripts_jsonl_corrupt_and_dedup(spark, tmp_path):
    from waka_spark.sources.corpora import read_transcripts_jsonl

    lines = [
        json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user",
                    "text": "old", "tool": None,
                    "ts": "2024-01-01T00:00:00"}),
        json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user",
                    "text": "new", "tool": None,
                    "ts": "2024-01-02T00:00:00"}),  # redelivery, later ts
        json.dumps({"conv_id": "c1", "turn_idx": 1, "role": "assistant",
                    "text": "a", "tool": None, "ts": "2024-01-01T00:01:00"}),
        "{ this is not json",
    ]
    p = os.path.join(str(tmp_path), "t.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines))

    out = read_transcripts_jsonl(spark, p)
    good = out.filter(F.col("_corrupt").isNull())
    bad = out.filter(F.col("_corrupt").isNotNull())
    assert bad.count() == 1
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in good.collect()}
    assert rows == {("c1", 0): "new", ("c1", 1): "a"}


def test_write_partitioned_prunes_and_bounds_files(spark, tmp_path):
    from waka_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"t{i}") for i in range(40)],
        "doc_id long, lang string, text string")
    path = os.path.join(str(tmp_path), "out")
    write_partitioned(df, path, ["lang"], max_records_per_file=8)

    back = spark.read.parquet(path)
    assert back.count() == 40
    # partition pruning: a lang filter reads only that directory
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert back.filter(F.col("lang") == "en").count() == 20
    # maxRecordsPerFile bounds file sizes: 20 rows / 8 => >= 3 files
    en_files = [f for f in os.listdir(os.path.join(path, "lang=en"))
                if f.endswith(".parquet")]
    assert len(en_files) >= 3
