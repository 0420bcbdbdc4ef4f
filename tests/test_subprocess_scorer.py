"""U2/U3: the subprocess (llama.cpp-shaped) scorer, driven by a Python
stand-in binary speaking the line protocol — JSON-array responses, EOT
stripping, raw-output X3 fallback, and end-to-end through the pipeline UDF."""

import json
import sys
import textwrap

import pytest

from llacie_spark.scorer import SubprocessScorer, get_scorer

# stand-in "model": canned JSON array normally, a prose list for PROSE,
# junk for JUNK; one JSON-encoded response STRING per prompt line (so the
# multi-line prose response stays one line on the wire)
FAKE_LLM = textwrap.dedent(
    """
    import json, sys
    for line in sys.stdin:
        p = json.loads(line)
        if "PROSE" in p:
            out = "- fever\\n- chills<|eot|>"
        elif "JUNK" in p:
            out = "?? unparseable ??"
        else:
            out = json.dumps(["fever", "productive cough"]) + "<|eot|>"
        print(json.dumps(out))
    """
).strip()

ARGV = [sys.executable, "-c", FAKE_LLM]


def test_json_protocol_and_eot_strip():
    s = SubprocessScorer(ARGV, prompt_template="Extract: {input}", trim_eot_regex=r"<\|eot\|>$")
    out = s.score_batch(["pt has fever", None, "JUNK text"])
    assert out == [["fever", "productive cough"], ["fever", "productive cough"], []]


def test_raw_output_falls_back_to_listclean():
    s = SubprocessScorer(ARGV, trim_eot_regex=r"<\|eot\|>$", raw_output=True)
    assert s.score_batch(["PROSE please"]) == [["fever", "chills"]]


def test_response_count_mismatch_raises():
    drop_one = [
        sys.executable, "-c",
        "import sys; sys.stdin.read(); print(" + repr(json.dumps("[]")) + ")",
    ]
    s = SubprocessScorer(drop_one)
    with pytest.raises(RuntimeError, match="1 responses for 2"):
        s.score_batch(["a", "b"])


def test_non_string_response_line_raises():
    bad = [sys.executable, "-c", "import sys; sys.stdin.read(); print('[1,2]')"]
    s = SubprocessScorer(bad)
    with pytest.raises(RuntimeError, match="decode to a string"):
        s.score_batch(["a"])


def test_registry_and_pipeline_end_to_end(spark, vocab):
    from llacie_spark.corpus import reference_doc_meta, reference_documents
    from llacie_spark.pipeline import run_pipeline

    scorer = get_scorer(
        "feature.presenting_sx.subprocess",
        argv=ARGV,
        prompt_template="Extract: {input}",
        trim_eot_regex=r"<\|eot\|>$",
        max_tokens=2048,
    )
    docs = reference_documents(spark).limit(6)
    triples = run_pipeline(docs, reference_doc_meta(spark), vocab, scorer=scorer)
    labels = {r.label_name for r in triples.collect()}
    # the canned model always answers fever + productive cough; expected
    # labels = whatever the vocab canonicalizes that pair to
    expected = set(vocab.find_terms("fever\nproductive cough"))
    assert labels == expected and labels
