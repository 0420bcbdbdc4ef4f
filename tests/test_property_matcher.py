"""Property-based testing (hypothesis): the greedy dictionary matcher.

Random dictionaries + random token streams probe the matching semantics far
beyond the fixture corpus: longest-first greediness, token consumption,
earliest-line-wins, combo emission. The pure-Python matcher is the oracle;
a reference-faithful naive reimplementation checks it, and the relational
Spark linker is checked against it on a sampled subset (Spark round-trips
are too slow for per-example property runs)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from llacie_spark.vocab import Vocab

WORDS = ["fever", "chest", "pain", "leg", "cough", "dry", "night", "sweats", "alpha", "beta"]


@st.composite
def vocab_and_text(draw):
    n_entries = draw(st.integers(2, 12))
    rows = []
    seen = set()
    for i in range(n_entries):
        n = draw(st.integers(1, 3))
        gram = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=n, max_size=n)))
        if (gram, len(gram.split())) in seen:
            continue
        seen.add((gram, len(gram.split())))
        combo = draw(st.sampled_from(["", f"combo-{i}"]))
        rows.append(
            {"ngram": gram, "n": str(len(gram.split())), "canonical_name": f"c{i}",
             "combo_symptom": combo}
        )
    n_lines = draw(st.integers(0, 4))
    lines = [
        " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=8)))
        for _ in range(n_lines)
    ]
    return rows, "\n".join(lines)


def naive_reference_matcher(rows, feature_value):
    """Literal transliteration of the reference algorithm (vocab.py:86-121),
    kept independent from the production implementation."""
    max_n = max((int(r["n"]) for r in rows), default=0)
    dicts = []
    for n in range(max_n, 0, -1):
        d = {}
        for r in rows:
            if int(r["n"]) != n:
                continue
            terms = [r["canonical_name"]]
            if r["combo_symptom"]:
                terms.append(r["combo_symptom"])
            d[tuple(r["ngram"].split(" "))] = terms
        dicts.append(d)
    import re

    lines = feature_value.split("\n")
    found = {}
    for line_no in range(len(lines) - 1, -1, -1):
        tokens = re.split(r"\s+", re.sub(r"[^a-z0-9]+", " ", lines[line_no].lower()).strip())
        while len(tokens) > 0:
            matches = None
            for i, d in enumerate(dicts):
                n = len(dicts) - i
                matches = d.get(tuple(tokens[0:n]))
                if matches is None:
                    continue
                for m in matches:
                    found[m] = line_no + 1
                tokens = tokens[n:]
                break
            if matches is None:
                tokens.pop(0)
    return found


@given(vocab_and_text())
@settings(max_examples=300, deadline=None)
def test_matcher_equals_reference_algorithm(case):
    rows, text = case
    if not rows:
        return
    assert Vocab.from_rows(rows).find_terms(text) == naive_reference_matcher(rows, text)


@pytest.mark.parametrize("seed", range(6))
def test_relational_linker_on_random_cases(spark, seed):
    """Sampled random dictionaries/texts through the Spark relational linker
    vs the greedy matcher. Duplicate-ngram dictionary rows are excluded: the
    dict build makes the last row win, while the join emits all — a
    documented divergence, irrelevant for real (deduplicated) vocabularies."""
    import random

    from llacie_spark.operators.linking import link_mentions_relational

    rng = random.Random(seed)
    rows = []
    used = set()
    for i in range(rng.randint(3, 10)):
        n = rng.randint(1, 3)
        gram = " ".join(rng.choice(WORDS) for _ in range(n))
        if gram in used:
            continue
        used.add(gram)
        rows.append({"ngram": gram, "n": str(n), "canonical_name": f"c{i}",
                     "combo_symptom": rng.choice(["", f"x{i}"])})
    vocab = Vocab.from_rows(rows)
    mentions = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 8)))
        for _ in range(rng.randint(1, 5))
    ]
    expected = vocab.find_terms("\n".join(mentions))
    df = spark.createDataFrame([("d1", mentions)], "doc_id string, mentions array<string>")
    concepts = spark.createDataFrame(vocab.to_rows())
    got = {
        r.label_name: r.line_number
        for r in link_mentions_relational(df, concepts).collect()
    }
    assert got == expected
