"""Dev harness: evaluate GazetteerScorer + Vocab matcher against the gold
fixture (20 episodes, 145 exploded labels) with the reference's episode×term
matrix semantics. Run: python scripts/tune_scorer.py [-v] [ep ...]"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import csv
import re

from llacie_spark.scorer import GazetteerScorer
from llacie_spark.vocab import Vocab

vocab = Vocab.from_csv("fixtures/vocab_pres_sx_v2.csv")
gold = list(csv.DictReader(open("fixtures/gold_labels_admission100.csv")))
scorer = GazetteerScorer(canonicalize=lambda m: vocab.find_terms(m))

verbose = "-v" in sys.argv
only = {a for a in sys.argv[1:] if a.isdigit()}

tp = fp = fn = 0
for g in gold:
    ep = g["FK_episode_id"]
    if only and ep not in only:
        continue
    truth = {x for x in re.split(r"\s*[|]\s*", g["human_labels"].strip()) if x}
    mentions = scorer.score_one(g["section_value"])
    found = vocab.find_terms("\n".join(mentions))
    pred = set(found)
    tp += len(truth & pred)
    fp += len(pred - truth)
    fn += len(truth - pred)
    if pred != truth or verbose:
        print(f"ep{ep}: FP={sorted(pred - truth)} FN={sorted(truth - pred)}")
        if verbose:
            print("   mentions:", mentions)

P = tp / (tp + fp) if tp + fp else 0.0
R = tp / (tp + fn) if tp + fn else 0.0
print(f"\nTP={tp} FP={fp} FN={fn}  P={P:.4f} R={R:.4f}")
