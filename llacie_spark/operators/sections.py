"""Section extraction: carve the short-HPI span out of each clinical note.

The two pattern constants below are a byte-compatible transcription of the
reference's section-boundary specification
(``/root/reference/llacie/strategies/section/hpi_short/regex.py:21-74``): the
regexes *are* the definition of where an HPI section starts and ends, so they
are kept identical (including ``re.VERBOSE`` quirks such as unescaped spaces
being ignored) to guarantee span-level parity with the reference's
``note_sections`` output. Everything around them — cleaning, vectorized
execution — is new Spark-first code.

These run as Arrow-batched pandas UDFs (Python ``re`` semantics don't map 1:1
to Java regex, so we deliberately stay in Python here; the UDF is the only
Python hop in the section stage and operates on a single projected column).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Start-of-HPI markers (reference regex.py:21-33).
HPI_START_REGEX = re.compile(
    r"""
    \b(
        HPI
        | (History|Central[ ]Elements)[ ]of[ ](the[ ])?(Present(ing)?[ ]Illness|Traumatic[ ]Injury)
        | Brief[ ]summary
    )\b( # Optional prefixes within the HPI text that should be excised
        :
        | \s+Comments:\s*
        | \s+HPI\b
        | \s+History[ ]of[ ](the[ ])?Present[ ]Illness
        | \s+Chief[ ]Complaint:[^\n]*
    )*
    """,
    re.VERBOSE | re.IGNORECASE,
)

# End-of-HPI markers (reference regex.py:37-74).
HPI_END_REGEX = re.compile(
    r"""
    (
        \n (
            History[ ]reviewed.[ ]+No[ ]pertinent[ ]past[ ]medical[ ]history.
        )
        | \n (
            Electronic[ ]Medical[ ]Records[ ]Reviewed
            | History[ ]provided[ ]by
            | (E[DWR]|Emergency[ ](Department|Room))[ ]Course
            | Current[ ]Assessment
            | Historical[ ]features
            | Focused[ ]COVID[ ]History
            | (ED[ ]Triage[ ])? (Vitals|Vital[ ]Signs)
            | (Plan|A[/&]P)
            | (Estimated[ ]Date[ ]of[ ]Delivery|EDD)
            | (Relevant|Pertinent[ ])? (Home[ ])? Medications
            | (Relevant|Pertinent[ ])? (Physical[ ])? Exam
            | Quality[ ]Bundle
        ) [:\n]
        | \n (
            Review[ ]of[ ]Systems
            | ROS
            | Past[ ](Medical[ ])?(History|Hx)
            | Patient[ ]Active[ ]Problem[ ]List
            | Medical (([/\s]+|[ ]+(\band\b|&)[ ]+)Surgical)? [ ](History|Hx)
            | PMH
            | (In[ ]|On[ ]arrival[ ](to|at)[ ]) (the[ ])? (\w+[ ])?
                (E[DWR]|Emergency[ ](Room|Department))
            | Data reviewed
            | ((Impression|Assessment)[ ]and[ ]) Plan
        ) \b
    )
    """,
    re.VERBOSE | re.IGNORECASE,
)

_SECTION_STRIP_CHARS = ":?-_ \xa0\n"


def clean_note_text(text: str) -> str:
    """Undo the EDW hard-wrap artifact: double spaces were newlines.

    Same normalization as the reference (regex.py:77-82): restore newlines,
    drop leading space/question-mark runs, collapse blank-line runs.
    """
    text = re.sub("  ", "\n", text)
    text = re.sub("\n[ ?]+", "\n", text)
    text = re.sub("\n\n+", "\n\n", text)
    return text.strip()


def extract_short_hpi(note_text: str) -> str | None:
    """Return the short-HPI span of a cleaned note, or None if no start marker.

    Semantics-equal to reference regex.py:85-97: first start marker, first end
    marker *after* it, strip ``:?-_ \\xa0\\n`` from both ends.
    """
    start = HPI_START_REGEX.search(note_text)
    if start is None:
        return None
    begin = start.end(0)
    end = HPI_END_REGEX.search(note_text[begin:])
    stop = end.start(0) + begin if end is not None else None
    return note_text[begin:stop].strip(_SECTION_STRIP_CHARS)


# --------------------------------------------------------------------- Spark


@pandas_udf(StringType())
def clean_note_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: clean_note_text(t) if t is not None else None)


@pandas_udf(StringType())
def extract_short_hpi_udf(texts: pd.Series) -> pd.Series:
    """Cleaned note text -> short-HPI section (null when not extractable)."""

    def _one(t):
        if t is None:
            return None
        hpi = extract_short_hpi(t)
        return hpi if hpi else None  # empty extraction counts as failure

    return texts.map(_one)
