"""D1 scorer registry + F6 term filter + the spark-submit job end-to-end
(including --scorer resolution and --redo-older-than staleness redo)."""

import json

import pyspark.sql.functions as F
import pytest

from llacie_spark.pipeline import filter_terms
from llacie_spark.scorer import GazetteerScorer, LLMScorer, find_scorers, get_scorer


def test_registry_resolves_and_globs(vocab):
    s = get_scorer("feature.presenting_sx.gazetteer", vocab=vocab)
    assert isinstance(s, GazetteerScorer)
    assert s.score_batch(["reports fever and chills"])[0]

    llm = get_scorer("feature.presenting_sx.llm", scorer_fn=lambda ts: [["x"]] * len(ts))
    assert isinstance(llm, LLMScorer)

    assert find_scorers("feature.presenting_sx.*") == [
        "feature.presenting_sx.gazetteer",
        "feature.presenting_sx.gazetteer.cached",
        "feature.presenting_sx.llm",
        "feature.presenting_sx.subprocess",
    ]
    with pytest.raises(ValueError, match="unknown scorer"):
        get_scorer("nope")
    with pytest.raises(ValueError, match="needs vocab"):
        get_scorer("feature.presenting_sx.gazetteer")


def test_filter_terms_list_and_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "fever"), (2, "chills"), (3, "rash")], "episode_id long, label_name string"
    )
    assert {r.label_name for r in filter_terms(df, ["fever", "rash"]).collect()} == {
        "fever", "rash",
    }
    assert {r.label_name for r in filter_terms(df, ["fever"], keep=False).collect()} == {
        "chills", "rash",
    }
    allowed = spark.createDataFrame([("chills",)], "term string")
    kept = filter_terms(df, allowed)
    assert [r.label_name for r in kept.collect()] == ["chills"]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_run_kg_job_with_scorer_and_redo(spark, tmp_path, capsys, monkeypatch):
    """The spark-submit entrypoint end-to-end in-process: fresh run, then a
    no-op resume, then a --redo-older-than re-extraction of everything."""
    import pyspark.sql as pys

    import jobs.run_kg as job

    # getOrCreate() inside main() reuses the test session; keep its stop()
    # from tearing down the shared fixture
    monkeypatch.setattr(pys.SparkSession, "stop", lambda self: None)
    base = [
        "--docs", "60", "--out", str(tmp_path / "graph"),
        "--stage-root", str(tmp_path / "stages"),
        "--scorer", "feature.presenting_sx.gazetteer",
    ]
    job.main(base)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["resumed_docs"] == 60 and first["edges"] > 0

    job.main(base)  # everything committed: nothing to redo
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["resumed_docs"] == 0
    assert second["edges"] == first["edges"]

    job.main(base + ["--redo-older-than", "9999-01-01 00:00:00"])
    redo = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert redo["resumed_docs"] == 60  # all rows stale -> full re-extraction
    assert redo["edges"] == first["edges"]

    # the argmin physical form is a CLI choice; both forms emit the same graph
    job.main(base + ["--argmin-strategy", "window_fat"])
    wf = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert wf["edges"] == first["edges"]
