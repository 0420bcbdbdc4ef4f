"""Stand-in inference binary for the SubprocessScorer bench (VERDICT r4 #5).

Speaks the SubprocessScorer line protocol (one JSON-encoded prompt string
per stdin line -> one JSON-encoded response string per stdout line, the
response string itself parsing as a JSON array of mentions) and answers
with the SAME gazetteer extraction the in-process path runs. Relocating
identical compute into a child process makes the kg_pipeline docs/sec
delta between the two paths a clean measurement of the U2/U3 execution
path's protocol cost: per-batch process spawn + model init (here: imports
+ vocab load, ~60 ms — a real llama.cpp pays seconds of model load, which
is why the reference keeps one persistent engine per GPU worker) + pipe
and JSON framing per prompt.

Import cost is deliberately tiny: llacie_spark.vocab/scorer do not import
pyspark.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from llacie_spark.scorer import GazetteerScorer  # noqa: E402
from llacie_spark.vocab import Vocab  # noqa: E402


def main() -> None:
    vocab = Vocab.from_csv(
        str(Path(__file__).resolve().parent.parent / "fixtures/vocab_pres_sx_v2.csv")
    )
    scorer = GazetteerScorer(canonicalize=vocab.find_terms)
    for line in sys.stdin:
        text = json.loads(line)
        mentions = scorer.score_one(text) if text else []
        print(json.dumps(json.dumps(mentions)))


if __name__ == "__main__":
    main()
