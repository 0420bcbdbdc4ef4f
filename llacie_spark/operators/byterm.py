"""ByTerm fan-out feature extraction (reference strategy U4/A8).

The reference's ``llama3_8b_byterm`` strategy asks the model one yes/no-list
question per 5-term vocabulary chunk per note (~81 prompts per note for 404
terms), then merges the boolean maps
(``/root/reference/llacie/strategies/feature/presenting_sx/llama3_8b_byterm.py:
96-155``); it compensates for the prompt blow-up by shrinking Slurm shards to
50 notes/job (:35). The Spark rendering:

- the (note × term-chunk) grid is an explode over a broadcast chunk table —
  no driver loop, no shard bookkeeping;
- the grid is repartitioned by size before the scorer so one task carries a
  bounded number of prompts (the reference's cost-aware shard-size lesson);
- the batched scorer runs once per Arrow batch; per-note results merge with
  one groupBy (``collect_list`` + flatten ≡ the reference's dict-update).

The deterministic scorer answers presence via the same dictionary matcher
(term present iff the matcher finds it in the section), memoizing per text
within a batch so the 81× fan-out costs one match per note, not 81.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..vocab import Vocab

CHUNK_SIZE = 5  # terms per prompt, reference byterm.py:85


def term_chunks(vocab: Vocab, chunk_size: int = CHUNK_SIZE) -> list[list[str]]:
    terms = vocab.terms
    return [terms[i : i + chunk_size] for i in range(0, len(terms), chunk_size)]


def extract_mentions_byterm(
    sections: DataFrame,
    vocab: Vocab,
    chunk_size: int = CHUNK_SIZE,
    presence_scorer=None,
    prompts_per_task: int = 4096,
) -> DataFrame:
    """sections(doc_id, section_text, ...) -> (doc_id, mentions array).

    ``presence_scorer(texts, term_lists) -> list[present_terms]`` is the
    injectable batched model; default = dictionary-matcher presence."""
    spark = sections.sparkSession
    chunks = term_chunks(vocab, chunk_size)
    chunk_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "chunk_id int, terms array<string>"
    )
    grid = sections.select("doc_id", "section_text").where(
        F.col("section_text").isNotNull()
    ).crossJoin(F.broadcast(chunk_df))
    # cost-aware sizing: bound prompts per task regardless of upstream layout
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        int(grid.count() / prompts_per_task) + 1,
    )
    grid = grid.repartition(n_parts, "doc_id", "chunk_id")

    vocab_dicts = vocab.ngram_dicts

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def presence_udf(texts: pd.Series, term_lists: pd.Series) -> pd.Series:
        if presence_scorer is not None:
            return pd.Series(presence_scorer(texts.tolist(), term_lists.tolist()))
        local = Vocab(ngram_dicts=vocab_dicts)
        memo: dict[str, set] = {}

        def one(text, terms):
            found = memo.get(text)
            if found is None:
                found = set(local.find_terms(text or ""))
                memo[text] = found
            return [t for t in terms if t in found]

        return pd.Series([one(t, ts) for t, ts in zip(texts, term_lists)])

    presence_udf = presence_udf.asNondeterministic()
    scored = grid.withColumn("present", presence_udf("section_text", "terms"))
    return (
        scored.groupBy("doc_id")
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("present")))).alias("mentions"))
    )
