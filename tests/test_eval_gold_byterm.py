"""Bootstrap CIs, gold import validation, and the byterm fan-out variant."""

import pytest
from pyspark.sql import functions as F

from llacie_spark.evaluate import ConfusionCounts, bootstrap_ci, metrics_with_ci


def test_bootstrap_ci_brackets_point_estimate():
    cc = ConfusionCounts(tp=140, fp=5, fn=5, tn=7900)
    point, (lo, hi) = bootstrap_ci(cc, "f1", n_resamples=500)
    assert lo <= point <= hi
    assert 0.9 < point < 1.0
    assert hi - lo < 0.1  # tight at this n


def test_metrics_with_ci_has_all_eight():
    cc = ConfusionCounts(tp=10, fp=2, fn=3, tn=100)
    m = metrics_with_ci(cc, n_resamples=200)
    assert set(m) == {
        "accuracy", "balanced_accuracy", "f1", "precision",
        "recall", "specificity", "npv", "kappa",
    }
    for point, (lo, hi) in m.values():
        assert lo <= hi


def test_gold_import_validates_and_explodes(spark, vocab):
    from llacie_spark.gold import UnknownLabelError, import_gold, explode_labels, validate_against_vocab

    concepts = spark.createDataFrame(vocab.to_rows())
    gold = import_gold(spark, "fixtures/gold_labels_admission100.csv", concepts)
    assert gold.count() == 145  # reference test_quickstart.py:25,280-281
    assert gold.select("episode_id").distinct().count() == 20

    bad = spark.createDataFrame(
        [(1, "fever | zorblax syndrome", "a1")],
        "episode_id long, human_labels string, annotator string",
    )
    with pytest.raises(UnknownLabelError, match="zorblax"):
        validate_against_vocab(explode_labels(bad), concepts)


def test_byterm_matches_direct_matcher(spark, vocab):
    from llacie_spark.operators.byterm import extract_mentions_byterm

    rows = [
        ("d1", "Patient reports fever, chills and pleuritic chest pain."),
        ("d2", "Denies everything; no content words here."),
        ("d3", None),
    ]
    sections = spark.createDataFrame(rows, "doc_id string, section_text string")
    out = {r.doc_id: list(r.mentions) for r in extract_mentions_byterm(sections, vocab).collect()}
    assert set(out["d1"]) == set(vocab.find_terms(rows[0][1]))
    assert "d3" not in out  # null sections skipped
    # d2: matcher semantics on the raw sentence (byterm has no denial logic,
    # like the reference byterm prompt relies on the model for that)
    assert out.get("d2", []) == sorted(vocab.find_terms(rows[1][1]))


def test_byterm_injectable_scorer(spark, vocab):
    from llacie_spark.operators.byterm import extract_mentions_byterm

    sections = spark.createDataFrame(
        [("d1", "whatever text")], "doc_id string, section_text string"
    )
    def fake(texts, term_lists):
        return [[t for t in ts if t == "fever"] for ts in term_lists]

    out = extract_mentions_byterm(sections, vocab, presence_scorer=fake).collect()
    assert list(out[0].mentions) == ["fever"]


def test_inter_rater_counts_and_kappa(spark):
    """Two-annotator agreement (reference llacie/app.py:257-269): annotator2
    evaluated as predictions vs annotator1 truth, universe restricted to
    episodes both labeled."""
    from llacie_spark.evaluate import inter_rater_counts

    rows = [
        # annotator1 labeled episodes 1,2,3; annotator2 labeled 2,3,4
        (1, "fever", "ann1"),
        (2, "fever", "ann1"), (2, "chills", "ann1"),
        (3, "cough", "ann1"),
        (2, "fever", "ann2"),
        (3, "cough", "ann2"), (3, "rash", "ann2"),
        (4, "fever", "ann2"),
    ]
    gold = spark.createDataFrame(rows, "episode_id long, label_name string, annotator string")
    cc = inter_rater_counts(gold, n_terms=5)
    # shared episodes {2,3}: TP = (2,fever),(3,cough); FN = (2,chills);
    # FP = (3,rash); TN = 2*5 - 4
    assert (cc.tp, cc.fp, cc.fn, cc.tn) == (2, 1, 1, 6)
    assert abs(cc.kappa - (0.8 - 0.58) / (1 - 0.58)) < 1e-9

    # explicit annotator selection flips roles
    cc_rev = inter_rater_counts(gold, n_terms=5, truth_annotator="ann2", other_annotator="ann1")
    assert (cc_rev.tp, cc_rev.fp, cc_rev.fn) == (2, 1, 1)


def test_inter_rater_requires_two_annotators(spark):
    from llacie_spark.evaluate import inter_rater_counts

    gold = spark.createDataFrame(
        [(1, "fever", "ann1")], "episode_id long, label_name string, annotator string"
    )
    with pytest.raises(ValueError, match="two annotators"):
        inter_rater_counts(gold, n_terms=3)
