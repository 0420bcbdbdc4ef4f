"""Concept-matching semantics: longest-first backoff, combo terms,
earliest-line-wins, token consumption (reference llacie/vocab.py:100-121)."""

from llacie_spark.vocab import Vocab


def make_vocab(rows):
    return Vocab.from_rows(rows)


TINY = [
    {"ngram": "chest pain", "n": "2", "canonical_name": "chest pain", "combo_symptom": ""},
    {"ngram": "pain", "n": "1", "canonical_name": "pain", "combo_symptom": ""},
    {"ngram": "chest", "n": "1", "canonical_name": "chest-alone", "combo_symptom": ""},
    {
        "ngram": "pleuritic chest pain",
        "n": "3",
        "canonical_name": "chest pain",
        "combo_symptom": "pleuritic pain",
    },
    {"ngram": "fever", "n": "1", "canonical_name": "fever", "combo_symptom": ""},
]


def test_longest_match_wins_and_consumes_tokens():
    v = make_vocab(TINY)
    # "chest pain" must match the 2-gram, not chest-alone + pain
    assert v.find_terms("chest pain") == {"chest pain": 1}


def test_backoff_to_shorter_ngram():
    v = make_vocab(TINY)
    assert v.find_terms("chest ache") == {"chest-alone": 1}


def test_combo_emits_both_terms():
    v = make_vocab(TINY)
    assert v.find_terms("pleuritic chest pain") == {"chest pain": 1, "pleuritic pain": 1}


def test_earliest_line_wins():
    v = make_vocab(TINY)
    found = v.find_terms("stuff\nfever\nmore\nfever again")
    assert found["fever"] == 2  # line 2, not 4


def test_tokenization_strips_punctuation():
    v = make_vocab(TINY)
    assert v.find_terms("FEVER!!! (severe)") == {"fever": 1}


def test_empty_and_symbol_lines():
    v = make_vocab(TINY)
    assert v.find_terms("") == {}
    assert v.find_terms("@@@ ###\n\n!!!") == {}


def test_real_vocab_shape(vocab):
    # verified stats of the reference dictionary (SURVEY.md §1.2)
    assert vocab.max_n == 3
    assert len(vocab) == 404  # distinct canonical terms incl. combo targets
    total_ngrams = sum(len(d) for d in vocab.ngram_dicts)
    assert total_ngrams == 1054


def test_gold_labels_are_canonical(vocab, gold_rows):
    # importer validation: every human label must exist in the vocab
    # (reference llacie/db.py:739-742); 20 episodes / 145 exploded rows
    assert len(gold_rows) == 20
    labels = [lbl for g in gold_rows for lbl in g["labels"]]
    assert len(labels) == 145
    assert all(lbl in vocab for lbl in labels)


def test_to_rows_roundtrip(vocab):
    rows = vocab.to_rows()
    assert {r["canonical_name"] for r in rows} == set(vocab.terms)
    assert max(r["n"] for r in rows) == 3
