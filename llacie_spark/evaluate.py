"""Evaluation: confusion matrix + metrics over episode×term boolean matrices.

Re-expresses the reference evaluator (``/root/reference/llacie/evaluate.py:
82-105``) relationally — no pivot to a dense matrix is materialized. The
semantics being preserved:

- truth = first annotator per episode (evaluate.py:12-19);
- the universe is (truth episodes) × (all canonical vocab terms) —
  predictions for episodes outside the truth set are ignored
  (evaluate.py:96-100), absent cells are False (create_vocab_matrix);
- predictions count only when ``line_number <= max_line_num`` (the "top N
  LLM responses" threshold, evaluate.py:92-93; the CLI reports both <=10
  and unlimited, app.py:223-232).

At scale this is a join + aggregate: TP/FP/FN come from a full outer join of
two sparse (episode, term) sets; TN is arithmetic (|episodes|*|terms| - the
rest) — never materialize the dense matrix.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class ConfusionCounts:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 0.0

    @property
    def accuracy(self) -> float:
        total = self.tp + self.fp + self.fn + self.tn
        return (self.tp + self.tn) / total if total else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def specificity(self) -> float:
        return self.tn / (self.tn + self.fp) if (self.tn + self.fp) else 0.0

    @property
    def npv(self) -> float:
        return self.tn / (self.tn + self.fn) if (self.tn + self.fn) else 0.0

    @property
    def balanced_accuracy(self) -> float:
        return (self.recall + self.specificity) / 2

    @property
    def kappa(self) -> float:
        total = self.tp + self.fp + self.fn + self.tn
        if not total:
            return 0.0
        po = (self.tp + self.tn) / total
        p_yes = ((self.tp + self.fp) / total) * ((self.tp + self.fn) / total)
        p_no = ((self.fn + self.tn) / total) * ((self.fp + self.tn) / total)
        pe = p_yes + p_no
        return (po - pe) / (1 - pe) if pe != 1 else 0.0

    def report(self) -> str:
        return (
            "                           Ground truth labels\n"
            "                           Present     Absent\n"
            f"{'Predicted label present':23} {self.tp:>10} {self.fp:>10}\n"
            f"{'Predicted label absent':23} {self.fn:>10} {self.tn:>10}\n"
            "--------------------------- Metric -------------\n"
            f"{'Accuracy':23} {self.accuracy:10.4f}\n"
            f"{'Balanced accuracy':23} {self.balanced_accuracy:10.4f}\n"
            f"{'F1 score':23} {self.f1:10.4f}\n"
            f"{'Precision aka PPV':23} {self.precision:10.4f}\n"
            f"{'Recall aka sensitivity':23} {self.recall:10.4f}\n"
            f"{'Specificity':23} {self.specificity:10.4f}\n"
            f"{'NPV':23} {self.npv:10.4f}\n"
            f"{'Cohen kappa':23} {self.kappa:10.4f}"
        )


def bootstrap_ci(
    cc: "ConfusionCounts",
    metric: str = "f1",
    n_resamples: int = 1000,
    confidence: float = 0.95,
    seed: int = 42,
) -> tuple[float, tuple[float, float]]:
    """Percentile-bootstrap confidence interval for any ConfusionCounts
    metric (the reference evaluates 8 metrics with 1000-resample percentile
    CIs, ``llacie/evaluate.py:51,108-117``).

    Resampling happens over the flattened episode×term cell population —
    which is fully described by the four counts, so each resample is one
    multinomial draw: no need to materialize the dense boolean vectors even
    at millions of episodes."""
    import numpy as np

    total = cc.tp + cc.fp + cc.fn + cc.tn
    if total == 0:
        return 0.0, (0.0, 0.0)
    rng = np.random.default_rng(seed)
    p = np.array([cc.tp, cc.fp, cc.fn, cc.tn]) / total
    draws = rng.multinomial(total, p, size=n_resamples)
    vals = np.array(
        [getattr(ConfusionCounts(tp=d[0], fp=d[1], fn=d[2], tn=d[3]), metric) for d in draws]
    )
    alpha = (1 - confidence) / 2
    lo, hi = np.quantile(vals, [alpha, 1 - alpha])
    return getattr(cc, metric), (float(lo), float(hi))


def metrics_with_ci(cc: "ConfusionCounts", n_resamples: int = 1000) -> dict:
    """The reference's 8-metric table with bootstrap CIs."""
    out = {}
    for name in [
        "accuracy",
        "balanced_accuracy",
        "f1",
        "precision",
        "recall",
        "specificity",
        "npv",
        "kappa",
    ]:
        out[name] = bootstrap_ci(cc, name, n_resamples)
    return out


def first_annotator_labels(gold: DataFrame) -> DataFrame:
    """Keep only the first annotator's rows per episode (evaluate.py:12-19).
    'First' is made deterministic by ordering on annotator name."""
    w = Window.partitionBy("episode_id").orderBy("annotator")
    return (
        gold.withColumn("_first", F.first("annotator").over(w))
        .where(F.col("annotator") == F.col("_first"))
        .drop("_first")
    )


def _sparse_confusion(truth: DataFrame, pred: DataFrame, n_eps: int, n_terms: int) -> ConfusionCounts:
    """TP/FP/FN from a full outer join of two sparse (episode, term) sets;
    TN is arithmetic over the n_eps × n_terms universe — the dense matrix is
    never materialized."""
    joined = truth.withColumn("t", F.lit(1)).join(
        pred.withColumn("p", F.lit(1)), ["episode_id", "label_name"], "full_outer"
    )
    agg = joined.agg(
        F.sum(F.when(F.col("t").isNotNull() & F.col("p").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("t").isNull() & F.col("p").isNotNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("t").isNotNull() & F.col("p").isNull(), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg.tp or 0, agg.fp or 0, agg.fn or 0
    return ConfusionCounts(tp=tp, fp=fp, fn=fn, tn=n_eps * n_terms - tp - fp - fn)


def confusion_counts(
    triples: DataFrame,
    gold: DataFrame,
    n_terms: int,
    max_line_num: int | None = 10,
) -> ConfusionCounts:
    """Sparse episode×term confusion counts.

    ``triples`` needs (episode_id, label_name, line_number); ``gold`` needs
    (episode_id, label_name, annotator). ``n_terms`` is the canonical
    vocabulary size (the matrix width, create_vocab_matrix semantics).
    """
    truth = first_annotator_labels(gold).select("episode_id", "label_name").distinct()
    truth_eps = truth.select("episode_id").distinct()

    pred = triples
    if max_line_num is not None:
        pred = pred.where(F.col("line_number") <= max_line_num)
    # predictions only count inside the truth episode universe (J10 semantics)
    pred = (
        pred.select("episode_id", "label_name")
        .distinct()
        .join(truth_eps, "episode_id", "left_semi")
    )
    return _sparse_confusion(truth, pred, truth_eps.count(), n_terms)


def inter_rater_counts(
    gold: DataFrame,
    n_terms: int,
    truth_annotator: str | None = None,
    other_annotator: str | None = None,
) -> ConfusionCounts:
    """Inter-labeler reliability: a second human's labels evaluated as
    predictions against the first human's truth (reference
    ``llacie/app.py:257-269``, the evaluator CLI's ``--also-labeled-by`` /
    second-human mode).

    Reference semantics preserved: the universe is restricted to episodes
    BOTH annotators labeled — the truth side is filtered to the other
    human's episodes ("don't penalize for any episodes not labeled by the
    other human") and vice versa. ``.kappa`` on the result is the
    inter-rater agreement the reference prints.

    Annotators default to the first two distinct ``annotator`` values in
    sort order."""
    if truth_annotator is None or other_annotator is None:
        names = [r.annotator for r in gold.select("annotator").distinct().orderBy("annotator").limit(2).collect()]
        if len(names) < 2:
            raise ValueError("inter-rater evaluation needs two annotators in the gold set")
        truth_annotator = truth_annotator or names[0]
        other_annotator = other_annotator or names[1]

    a = gold.where(F.col("annotator") == truth_annotator).select("episode_id", "label_name").distinct()
    b = gold.where(F.col("annotator") == other_annotator).select("episode_id", "label_name").distinct()
    shared_eps = a.select("episode_id").distinct().join(
        b.select("episode_id").distinct(), "episode_id", "left_semi"
    )
    truth = a.join(shared_eps, "episode_id", "left_semi")
    pred = b.join(shared_eps, "episode_id", "left_semi")
    return _sparse_confusion(truth, pred, shared_eps.count(), n_terms)
