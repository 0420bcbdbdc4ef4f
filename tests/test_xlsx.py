"""XLSX ingestion (S7/S8 fidelity): the reference's vocab and gold artifacts
are Excel workbooks (``llacie/vocab.py:86-97``, ``llacie/db.py:720-766``);
these tests synthesize workbook twins of the CSV fixtures with the stdlib
writer and require the loaders to produce byte-identical results."""

import csv

import pytest

VOCAB_CSV = "fixtures/vocab_pres_sx_v2.csv"
GOLD_CSV = "fixtures/gold_labels_admission100.csv"
VOCAB_COLS = [
    "ngram", "count", "n", "stop_word", "is_symptom",
    "combo_symptom", "synonym_of", "force_canonical_name", "canonical_name",
]
_INT_COLS = {"count", "n", "stop_word", "is_symptom", "FK_episode_id"}


def _csv_to_workbook_rows(path, cols):
    """CSV fixture rows -> typed dict rows as the real workbook stores them
    (numeric columns as numbers, blanks as omitted cells)."""
    with open(path, newline="") as f:
        out = []
        for r in csv.DictReader(f):
            d = {}
            for c in cols:
                v = r.get(c)
                if v in (None, ""):
                    d[c] = None
                elif c in _INT_COLS:
                    d[c] = int(v)
                else:
                    d[c] = v
            out.append(d)
        return out


def test_roundtrip_types_and_sparse_cells(tmp_path):
    from llacie_spark.xlsx import read_rows, sheet_names, write_rows

    p = str(tmp_path / "t.xlsx")
    rows = [
        {"a": 1, "b": "x", "c": 2.5, "d": None},
        {"a": 0, "b": "", "c": None, "d": True},
        {"a": -3, "b": "multi\nline & <chars>", "c": 1e6, "d": False},
    ]
    write_rows(p, rows, sheet="data")
    assert sheet_names(p) == ["data"]
    got = read_rows(p)
    assert got == rows  # including "" (inline string) and None (omitted cell)
    assert isinstance(got[0]["a"], int) and isinstance(got[0]["c"], float)


def test_roundtrip_property(tmp_path):
    """Property: any table of None/bool/int/float/str cells round-trips
    through write_rows -> read_rows exactly (floats restricted to exact
    binary fractions so repr/parse is lossless either way)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from llacie_spark.xlsx import read_rows, write_rows

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.integers(min_value=-(2**40), max_value=2**40).map(lambda n: n / 1024),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs", "Cc")
            ),
            max_size=40,
        ),
    )

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        cols=st.lists(
            st.text(st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
                    min_size=1, max_size=10),
            min_size=1, max_size=6, unique=True,
        ),
        data=st.data(),
    )
    def check(cols, data):
        rows = data.draw(
            st.lists(
                st.fixed_dictionaries({c: cell for c in cols}),
                min_size=0, max_size=8,
            )
        )
        # a float that is integral reads back as int; normalize expectation
        def norm(v):
            if isinstance(v, float) and v.is_integer():
                return int(v)
            return v

        p = str(tmp_path / "prop.xlsx")
        write_rows(p, rows, columns=cols)
        got = read_rows(p)
        want = [{c: norm(r[c]) for c in cols} for r in rows]
        # trailing all-None rows are dropped by contract
        while want and all(v is None for v in want[-1].values()):
            want.pop()
        assert got == want

    check()


def test_read_rows_unknown_sheet_raises(tmp_path):
    from llacie_spark.xlsx import read_rows, write_rows

    p = str(tmp_path / "t.xlsx")
    write_rows(p, [{"a": 1}], sheet="only")
    with pytest.raises(ValueError, match="'nope' not in"):
        read_rows(p, sheet="nope")


def test_vocab_from_xlsx_matches_csv(tmp_path):
    """A workbook twin of the vocab fixture loads to the identical
    vocabulary: same relational rows, same matcher tables."""
    from llacie_spark.vocab import Vocab
    from llacie_spark.xlsx import write_rows

    p = str(tmp_path / "vocab.xlsx")
    write_rows(p, _csv_to_workbook_rows(VOCAB_CSV, VOCAB_COLS),
               sheet="pres_sx", columns=VOCAB_COLS)
    from_xlsx = Vocab.from_xlsx(p, sheet="pres_sx")
    from_csv = Vocab.from_csv(VOCAB_CSV)
    assert from_xlsx.to_rows() == from_csv.to_rows()
    assert from_xlsx.term_synonyms == from_csv.term_synonyms
    # the matcher built from the workbook behaves identically
    text = "shortness of breath and fever\nchills"
    assert from_xlsx.find_terms(text) == from_csv.find_terms(text)


def test_gold_import_from_xlsx_matches_csv(spark, vocab, tmp_path):
    """import_gold on a workbook twin of the annotation sheet produces the
    same 145 exploded (episode, label) rows as the CSV path — including the
    vocabulary validation."""
    from llacie_spark.gold import import_gold
    from llacie_spark.xlsx import write_rows

    cols = ["FK_episode_id", "section_value", "human_labels"]
    p = str(tmp_path / "gold.xlsx")
    write_rows(p, _csv_to_workbook_rows(GOLD_CSV, cols), sheet="annot", columns=cols)
    concepts = spark.createDataFrame(vocab.to_rows())
    via_xlsx = import_gold(spark, p, concepts)
    via_csv = import_gold(spark, GOLD_CSV, concepts)
    assert via_xlsx.count() == 145
    key = lambda r: (r.episode_id, r.label_name, r.annotator)
    assert sorted(map(key, via_xlsx.collect())) == sorted(map(key, via_csv.collect()))


def test_read_rows_absolute_rel_target(tmp_path):
    """Some producers emit package-rooted relationship targets
    ('/xl/worksheets/sheet1.xml'); the reader must treat them as absolute,
    not re-prefix 'xl/' onto them (ADVICE r4)."""
    import zipfile

    from llacie_spark.xlsx import read_rows, write_rows

    p = str(tmp_path / "rel.xlsx")
    write_rows(p, [{"a": 1, "b": "x"}], sheet="data")
    q = str(tmp_path / "abs.xlsx")
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(q, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/_rels/workbook.xml.rels":
                assert b'Target="worksheets/' in data
                data = data.replace(
                    b'Target="worksheets/', b'Target="/xl/worksheets/'
                )
            zout.writestr(item, data)
    assert read_rows(q, "data") == [{"a": 1, "b": "x"}]
