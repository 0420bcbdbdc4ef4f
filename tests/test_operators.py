"""Operator tests: dedup, similarity, textstats, graph CC, multimodal."""

import pytest
from pyspark.sql import functions as F

from llacie_spark.operators import dedup, graph, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different text about spark pipelines and data"),
        (5, "El perro corre rápido y la casa es grande que es bueno"),
        (6, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_groups(docs_df):
    groups = dedup.exact_duplicate_groups(docs_df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [1, 2]


def test_jaccard_pairs_exact(docs_df):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(a < b for a, b in pairs)


def test_minhash_candidates_cover_exact_pairs(docs_df):
    exact = {(r.doc_a, r.doc_b) for r in dedup.jaccard_pairs(docs_df, threshold=0.8).collect()}
    mh = {(r.doc_a, r.doc_b) for r in dedup.minhash_dedup_pairs(docs_df, threshold=0.8).collect()}
    assert mh == exact  # verified candidates == exact result at this scale


def test_simhash_pairs(docs_df):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_pairs(docs_df, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0  # identical text -> identical signature
    assert all(h <= 3 for h in pairs.values())


def test_shingle_guard_short_docs(docs_df):
    sh = dedup.shingles(docs_df)
    assert sh.where("doc_id = 6").count() == 0  # 1 token < n, no error


# ------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 0.01, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb_df):
    out = similarity.brute_force_topk(emb_df.where("vec_id = 0"), emb_df, k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [4, 1]


def test_ann_lsh_finds_close_neighbor(emb_df):
    out = similarity.ann_lsh_topk(
        emb_df.where("vec_id = 0"), emb_df, k=3, n_planes=2, dim=4
    ).collect()
    # vec 4 is nearly identical to vec 0 -> same sign bucket w.h.p.
    assert 4 in {r.neighbor_id for r in out}


def test_embedding_cosine_pairs(emb_df):
    pairs = {(r.vec_a, r.vec_b) for r in
             similarity.embedding_cosine_pairs(emb_df, threshold=0.99, n_planes=2, dim=4).collect()}
    assert (0, 4) in pairs


# -------------------------------------------------------------- textstats


def test_token_and_char_counts(spark):
    df = spark.createDataFrame([("a bb  ccc",)], "text string")
    row = df.select(
        textstats.token_count("text").alias("t"),
        textstats.char_count("text").alias("c"),
    ).first()
    assert row.t == 3 and row.c == 9


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house is to go"),
         (2, "der hund und die katze ist nicht hier und der rest"),
         (3, "今天天气很好"),
         (4, "xyz qqq zzz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", textstats.lang_guess("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "zh", 4: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello,  WORLD!",), ("hello world",)], "text string")
    fps = [r.fp for r in df.select(textstats.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


# ------------------------------------------------------------------ graph


def test_connected_components_chain_and_clique(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        "src string, dst string",
    )
    comp = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["p"] == "p"


def test_connected_components_long_chain(spark):
    n = 33
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)], "src string, dst string"
    )
    comp = graph.connected_components(edges)
    assert comp.select("component").distinct().count() == 1


def test_connected_components_path_is_logarithmic(spark):
    """VERDICT r2 #5: the large-star/small-star alternation must converge in
    ~log2(n) rounds on a 1000-node PATH — the worst case for plain
    min-propagation, which needs ~n rounds there."""
    import math

    n = 1000
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)],
        "src string, dst string",
    )
    stats = {}
    # small_graph_limit=0 forces the distributed iteration (the small-graph
    # union-find fast path would otherwise handle a 999-edge graph)
    comp = graph.connected_components(edges, stats=stats, small_graph_limit=0)
    rows = comp.collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {"n0000"}
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 2, stats
    # the fast path must agree exactly on the same input
    fast = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert fast == {r.node: r.component for r in rows}


def test_canonical_map_resolves_synonyms(spark, vocab):
    from llacie_spark.schemas import CONCEPTS

    rows = [
        ("shortness of breath", 3, 0, "dyspnea", None, "dyspnea"),
        ("sob", 1, 0, "dyspnea", None, "dyspnea"),
        ("dyspnea", 1, 0, "dyspnea", None, None),
        ("fever", 1, 0, "fever", None, None),
    ]
    concepts = spark.createDataFrame(rows, CONCEPTS)
    m = {r.surface: r.canonical_id for r in graph.canonical_map(concepts).collect()}
    assert m["shortness of breath"] == m["sob"] == m["dyspnea"]
    assert m["fever"] != m["sob"]


# ------------------------------------------------------------- multimodal


def test_media_pipeline(spark):
    from llacie_spark.corpus import reference_documents

    docs = reference_documents(spark)
    media = multimodal.synthetic_media(spark, docs)
    n_media = media.count()
    assert n_media > 0
    feats = multimodal.extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == n_media
    types = {r.media_type for r in rows}
    assert types == {"image", "audio", "video"}, f"skewed media typing: {types}"
    for r in rows:
        assert r.n_bytes > 0 and len(r.content_sha256) == 64
        if r.media_type == "image":
            assert r.width >= 64 and r.height >= 64 and r.duration_s is None
        else:
            assert r.duration_s > 0 and r.width is None
        assert r.decoder == "fake-deterministic"


def test_png_roundtrip_pixels():
    """encode -> decode recovers the exact pixel bytes: the decoder really
    reconstructs scanlines (zlib + filters), it does not sniff metadata."""
    px = [
        [((x * 37) % 256, (y * 11) % 256, (x * y) % 256) for x in range(8)]
        for y in range(8)
    ]
    data = multimodal.encode_png(px)
    w, h, ch, raw = multimodal.decode_png(data)
    assert (w, h, ch) == (8, 8, 3)
    assert list(raw) == [c for row in px for p in row for c in p]


def test_png_decoder_reverses_all_filters():
    """A PNG whose scanlines use filters 1-4 (Sub/Up/Average/Paeth) must
    reconstruct to the same pixels as the filter-0 encoding."""
    import struct
    import zlib

    px = [[(x * 16 + y, 255 - x * 8, (x + y) * 7) for x in range(4)] for y in range(6)]
    flat = [bytes(c for p in row for c in p) for row in px]
    stride = 12
    lines = []
    prev = bytes(stride)
    for y, row in enumerate(flat):
        f = [1, 2, 3, 4, 0, 2][y]
        enc = bytearray()
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc.append((row[x] - pred) & 0xFF)
        lines.append(bytes([f]) + bytes(enc))
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    w, h, ch, raw = multimodal.decode_png(png)
    assert (w, h, ch) == (4, 6, 3)
    assert bytes(raw) == b"".join(flat)


def test_png_decoder_through_spark_plumbing(spark):
    """Real codec end-to-end: PNG payloads in the media table, decoded by
    mapInPandas with PngDecoder; width/height come from real pixel
    reconstruction, non-PNG payloads keep null dims (never a guess)."""
    px = [[(x * 30 % 256, y * 30 % 256, 7) for x in range(8)] for y in range(8)]
    png = multimodal.encode_png(px)
    rows = [
        ("d1", "m1", "image", bytearray(png)),
        ("d1", "m2", "image", bytearray(b"not-a-png")),
        ("d2", "m3", "audio", None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA)
    feats = {
        r.media_ref: r
        for r in multimodal.extract_media_features(
            media, decoder=multimodal.PngDecoder()
        ).collect()
    }
    assert feats["m1"].width == 8 and feats["m1"].height == 8
    assert feats["m1"].n_bytes == len(png)
    assert feats["m2"].width is None and feats["m2"].n_bytes == 9
    assert feats["m3"].n_bytes is None
    assert all(r.decoder == "png-stdlib" for r in feats.values())


def test_synthetic_png_media_dims_recovered(spark):
    """synthetic_png_media encodes real PNGs with hash-derived dims; the
    decoder must recover exactly those dims from the compressed pixels (the
    png_features oracle predicts them from the hash rule without decoding)."""
    from llacie_spark.corpus import reference_documents
    from llacie_spark.operators.porthash import portable_hash60

    docs = reference_documents(spark).limit(5)
    media = multimodal.synthetic_png_media(spark, docs)
    expected = {
        r.media_ref: (r.width, r.height)
        for r in docs.select(F.explode("spans").alias("s"))
        .where("s.kind = 'media'")
        .select(
            F.col("s.media_ref").alias("media_ref"),
            (F.lit(4) + F.pmod(portable_hash60(F.col("s.media_ref")), F.lit(13))).alias("width"),
            (F.lit(4) + F.pmod(F.shiftright(portable_hash60(F.col("s.media_ref")), 4), F.lit(11))).alias("height"),
        )
        .collect()
    }
    got = {
        r.media_ref: (r.width, r.height)
        for r in multimodal.extract_media_features(
            media, decoder=multimodal.PngDecoder()
        ).collect()
    }
    assert got and got == expected


def test_framestack_roundtrip_and_sampling_rule():
    frames = [multimodal.encode_png([[(i, 0, 0)] * 2] * 2) for i in range(5)]
    stack = multimodal.encode_framestack(frames)
    back = dict(multimodal.iter_framestack(stack))
    assert len(back) == 5 and all(back[i] == frames[i] for i in range(5))
    # uniform deterministic sample: floor(i*n/k), deduped; n<=k keeps all
    assert multimodal.sample_frame_indices(7, 3) == [0, 2, 4]
    assert multimodal.sample_frame_indices(2, 3) == [0, 1]
    assert multimodal.sample_frame_indices(3, 3) == [0, 1, 2]


def test_sample_frames_through_spark(spark):
    """Demux + sample + per-frame decode through mapInPandas: frame count,
    sampled indices, and dims must match the hash-derived generation rule
    (the frame_features oracle recomputes the same rule in SQL)."""
    from llacie_spark.corpus import reference_documents

    docs = reference_documents(spark).limit(20)
    media = multimodal.synthetic_video_media(spark, docs)
    rows = multimodal.sample_frames(media, k=3).collect()
    assert rows
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for ref, rs in by_ref.items():
        n = rs[0].n_frames
        assert 2 <= n <= 7
        assert sorted(r.frame_idx for r in rs) == multimodal.sample_frame_indices(n, 3)
        # all frames of one video share hash-derived dims; digests differ
        assert len({(r.width, r.height) for r in rs}) == 1
        if len(rs) > 1:
            assert len({r.frame_sha256 for r in rs}) == len(rs)


def test_sample_frames_skips_malformed_payloads(spark):
    """A corrupt container skips the payload (bad-byte policy), never the
    task; valid payloads in the same batch still produce rows."""
    good = multimodal.encode_framestack(
        [multimodal.encode_png([[(1, 2, 3)] * 2] * 2) for _ in range(2)]
    )
    rows = [
        ("d1", "ok", "video", bytearray(good)),
        ("d1", "bad-magic", "video", bytearray(b"garbage-not-a-stack")),
        ("d1", "truncated", "video", bytearray(good[: len(good) // 2])),
        ("d2", "null", "video", None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA)
    out = multimodal.sample_frames(media, k=3).collect()
    assert {r.media_ref for r in out} == {"ok"}
    assert sorted(r.frame_idx for r in out) == [0, 1]


def test_connected_components_raises_when_not_converged(spark):
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(32)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(edges, max_iterations=1, small_graph_limit=0)


def test_real_decoder_falls_back_to_stdlib_png():
    """RealDecoder no longer raises: without PIL it delegates PNG decode to
    the stdlib codec (the import guard just selects the backend)."""
    dec = multimodal.RealDecoder()
    png = multimodal.encode_png([[(1, 2, 3)] * 3] * 2)
    (meta,) = dec.decode_batch([png], ["image"])
    assert (meta["width"], meta["height"]) == (3, 2)


def test_cc_selfloop_rows_count_toward_fast_path_gate(spark):
    """The small-graph routing gate must count ALL collected rows — self-loop
    rows included — because the fast path collects `raw`. Gating on the
    non-self-loop edge count alone would let a graph with few real edges but
    an unbounded number of distinct self-loop rows through to an unbounded
    driver collect (ADVICE r4)."""
    from llacie_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)] + [(i, i) for i in range(100, 150)],
        "src long, dst long",
    )
    # 3 real edges but 53 raw rows: with limit 10 the distributed path runs
    stats = {}
    out = graph.connected_components(edges, stats=stats, small_graph_limit=10)
    assert not stats.get("small_graph_fast_path")
    comp = {r.node: r.component for r in out.collect()}
    assert comp[3] == 1 and comp[11] == 10 and comp[120] == 120
    # a roomy limit takes the fast path and agrees exactly
    stats2 = {}
    out2 = graph.connected_components(edges, stats=stats2, small_graph_limit=1000)
    assert stats2.get("small_graph_fast_path")
    assert {(r.node, r.component) for r in out2.collect()} == {
        (r.node, r.component) for r in out.collect()
    }
