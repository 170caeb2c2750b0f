"""Tool-call analytics (operators/tools.py) over the full input_hint
transcript shape (conv_id, turn_idx, role, text, tool, ts)."""

import datetime as dt


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


_ROWS = [
    # c1: user → assistant → tool(ok, 5s) → assistant → tool(err, 9s)
    ("c1", 0, "user", "do the thing", None, _ts(0)),
    ("c1", 1, "assistant", "calling search", None, _ts(10)),
    ("c1", 2, "tool", "found 3 results", "search", _ts(15)),
    ("c1", 3, "assistant", "now browsing", None, _ts(20)),
    ("c1", 4, "tool", "Error: timeout", "browser", _ts(29)),
    # c2: three consecutive tool turns, middle two erroring
    ("c2", 0, "user", "go", None, _ts(0)),
    ("c2", 1, "tool", "ok", "search", _ts(4)),
    ("c2", 2, "tool", "  ERROR 500", "python", _ts(10)),
    ("c2", 3, "tool", "error again", "python", _ts(11)),
    ("c2", 4, "assistant", "giving up", None, _ts(12)),
]


def test_tool_usage_stats(spark):
    from waka_spark.operators.tools import tool_usage_stats

    got = {r["tool"]: r for r in
           tool_usage_stats(_tr(spark, _ROWS)).collect()}
    assert set(got) == {"search", "browser", "python"}
    s = got["search"]
    assert s["n_calls"] == 2 and s["n_convs"] == 2 and s["n_errors"] == 0
    assert s["error_rate"] == 0.0
    assert s["avg_latency_s"] == 4.5 and s["max_latency_s"] == 5  # 5s, 4s
    b = got["browser"]
    assert b["n_errors"] == 1 and b["error_rate"] == 1.0
    assert b["max_latency_s"] == 9
    p = got["python"]
    assert p["n_calls"] == 2 and p["n_convs"] == 1 and p["n_errors"] == 2


def test_tool_transitions(spark):
    from waka_spark.operators.tools import tool_transitions

    got = {(r["src_tool"], r["dst_tool"]): r for r in
           tool_transitions(_tr(spark, _ROWS)).collect()}
    # c1: search→browser; c2: search→python→python
    assert got[("search", "browser")]["n_transitions"] == 1
    assert got[("search", "python")]["n_transitions"] == 1
    assert got[("python", "python")]["n_transitions"] == 1
    assert got[("python", "python")]["n_convs"] == 1
    assert len(got) == 3


def test_turn_latency_stats(spark):
    from waka_spark.operators.tools import turn_latency_stats

    got = {r["role"]: r for r in
           turn_latency_stats(_tr(spark, _ROWS)).collect()}
    # first turn of each conv has no latency; roles with deltas only
    assert "user" not in got
    t = got["tool"]
    assert t["n_turns"] == 5          # c1:2 + c2:3
    assert t["max_latency_s"] == 9
    assert t["p50_latency_s"] == 5.0  # deltas 5,9,4,6,1
    a = got["assistant"]
    assert a["n_turns"] == 3          # deltas 10,5,1
    assert a["p50_latency_s"] == 5.0


def test_tool_error_streaks(spark):
    from waka_spark.operators.tools import tool_error_streaks

    got = tool_error_streaks(_tr(spark, _ROWS), min_len=2).collect()
    # only c2's python/python run qualifies; c1's lone browser error does not
    assert len(got) == 1
    r = got[0]
    assert r["conv_id"] == "c2" and r["tool"] == "python"
    assert r["start_turn"] == 2 and r["end_turn"] == 3
    assert r["streak_len"] == 2


def test_tool_error_streaks_breaks_on_ok_turn(spark):
    from waka_spark.operators.tools import tool_error_streaks

    rows = [
        # err, err, OK, err, err, err — two islands (2 and 3)
        ("c", 0, "tool", "error a", "x", _ts(0)),
        ("c", 1, "tool", "error b", "x", _ts(1)),
        ("c", 2, "tool", "fine", "y", _ts(2)),
        ("c", 3, "tool", "error c", "y", _ts(3)),
        ("c", 4, "tool", "error d", "z", _ts(4)),
        ("c", 5, "tool", "error e", "z", _ts(5)),
    ]
    got = sorted(
        tool_error_streaks(_tr(spark, rows), min_len=2).collect(),
        key=lambda r: r["start_turn"])
    assert [(r["start_turn"], r["end_turn"], r["streak_len"], r["tool"])
            for r in got] == [(0, 1, 2, "x"), (3, 5, 3, "y")]


def test_tool_retry_recovery(spark):
    import datetime as dt

    from waka_spark.operators.tools import tool_retry_recovery

    ts0 = dt.datetime(2024, 1, 1)
    rows = [
        # search: error at 0, retried at 2 (ok) -> recovered
        ("c1", 0, "tool", "error: boom", "search", ts0),
        ("c1", 2, "tool", "ok now", "search", ts0),
        # browser: error at 1, retry at 9 -> gap 8 > 6, not retried
        ("c1", 1, "tool", "Error: 500", "browser", ts0),
        ("c1", 9, "tool", "fine", "browser", ts0),
        # bash: error at 3, retried at 5 with another error
        ("c2", 3, "tool", "error x", "bash", ts0),
        ("c2", 5, "tool", "error y", "bash", ts0),
        # python: success only -> no row
        ("c2", 0, "tool", "ok", "python", ts0),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {r["tool"]: r for r in tool_retry_recovery(t).collect()}
    assert set(got) == {"search", "browser", "bash"}
    s = got["search"]
    assert (s["n_errors"], s["n_retried"], s["n_recovered"]) == (1, 1, 1)
    assert s["recovery_rate"] == 1.0
    b = got["browser"]
    assert (b["n_retried"], b["retry_rate"]) == (0, 0.0)
    assert b["recovery_rate"] is None  # no retries -> undefined, not 0
    ba = got["bash"]
    # second bash error has no successor: counted as unretried error
    assert (ba["n_errors"], ba["n_retried"], ba["n_recovered"]) == (2, 1, 0)


def test_tool_trigrams_consecutive_motifs(spark):
    import datetime as dt

    from waka_spark.operators.tools import tool_trigrams

    ts0 = dt.datetime(2024, 1, 1)
    seq = ["search", "browser", "python", "search", "browser", "python"]
    rows = [("c1", i, "tool", "ok", t, ts0) for i, t in enumerate(seq)]
    rows += [("c1", 10, "user", "hi", None, ts0)]  # non-tool: ignored
    rows += [("c2", i, "tool", "ok", t, ts0)
             for i, t in enumerate(["search", "browser", "python"])]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {(r["tool_1"], r["tool_2"], r["tool_3"]): r
           for r in tool_trigrams(t, min_count=2).collect()}
    key = ("search", "browser", "python")
    assert key in got
    assert got[key]["n_occurrences"] == 3 and got[key]["n_convs"] == 2
