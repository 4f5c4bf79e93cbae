"""Scale tools: bucketed co-located joins (exchange elimination — the
shard.rs:89 analog) and salted joins/aggregations for hot-key skew."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_stream_processor_spark.functions.skew import (
    salted_aggregate,
    salted_join,
)
from database_stream_processor_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame([(i % 50, i) for i in range(1000)],
                              "k int, v int")
    b = spark.createDataFrame([(i % 50, i * 2) for i in range(500)],
                              "k int, w int")
    write_bucketed(a, "bkt_a", ["k"], 8, sort_by=["k"])
    write_bucketed(b, "bkt_b", ["k"], 8, sort_by=["k"])
    try:
        # force a merge join: a broadcast would trivially avoid the
        # shuffle; the point is SMJ with no exchange on either side
        j = read_bucketed(spark, "bkt_a").hint("merge").join(
            read_bucketed(spark, "bkt_b"), on="k")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: zero shuffles
        assert n == 1000 * 10  # 20 rows/key on a, 10 on b, 50 keys
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # 90% of probe rows share one hot key
    probe = spark.createDataFrame(
        [((1 if i % 10 else i), i) for i in range(1000)], "k long, v long")
    build = spark.createDataFrame([(i, i * 100) for i in range(100)],
                                  "k long, w long")
    plain = {tuple(r) for r in probe.join(build, on="k").collect()}
    salted = {tuple(r) for r in
              salted_join(probe, build, ["k"], n_salts=8).collect()}
    # 900 hot-key rows + the 10 cold keys present in build (0,10,...,90)
    assert salted == plain and len(plain) == 910


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [((1 if i % 10 else i), float(i)) for i in range(1000)],
        "k long, v double")
    plain = {tuple(r) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    salted = {tuple(r) for r in
              salted_aggregate(df, ["k"], 8,
                               F.sum("v").alias("s"),
                               F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain


def test_connected_components_chains_rings_singletons(spark):
    """Min-label propagation + pointer jumping finds exact components
    on shapes that stress it: a long chain (deep label chains — the
    pointer-jump payoff), a ring, a star, and isolated nodes supplied
    only via ``nodes``."""
    from database_stream_processor_spark.functions.dedup import (
        connected_components)
    chain = [(i, i + 1) for i in range(10, 25)]          # comp -> 10
    ring = [(30, 31), (31, 32), (32, 33), (33, 30)]      # comp -> 30
    star = [(40, j) for j in range(41, 46)]              # comp -> 40
    edges = spark.createDataFrame(chain + ring + star,
                                  "id_a int, id_b int")
    nodes = spark.createDataFrame([(n,) for n in range(10, 50)] +
                                  [(99,)], "id int")
    got = {(r.id, r.component)
           for r in connected_components(edges, "id_a", "id_b",
                                         nodes=nodes, id_col="id")
           .collect()}
    want = {(n, 10) for n in range(10, 26)}
    want |= {(n, 30) for n in range(30, 34)}
    want |= {(n, 40) for n in range(40, 46)}
    want |= {(n, n) for n in list(range(26, 30)) +
             list(range(34, 40)) + list(range(46, 50)) + [99]}
    assert got == want


def test_deterministic_split_and_stratified_sample(spark):
    """hash_split partitions every row into exactly one split with
    id-stable assignments (a subset of the corpus gets identical
    assignments — the incremental-arrival property); stratified_sample
    keeps a deterministic per-stratum subset; both are pure projections
    (no Exchange in the plan)."""
    import pytest
    from database_stream_processor_spark.functions.sampling import (
        hash_split, stratified_sample)
    df = spark.createDataFrame([(i, ["en", "de", "fr"][i % 3])
                                for i in range(300)],
                               "doc_id long, lang string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r.doc_id: r.split for r in
          hash_split(df, ["doc_id"], fr).collect()}
    assert len(s1) == 300                        # total coverage
    assert set(s1.values()) == {"train", "val", "test"}
    # id-stability: a subset sees the same assignments
    sub = {r.doc_id: r.split for r in
           hash_split(df.filter("doc_id % 2 = 0"), ["doc_id"],
                      fr).collect()}
    assert all(s1[k] == v for k, v in sub.items())
    # rough proportions (hash-uniformity sanity, not exactness)
    assert sum(1 for v in s1.values() if v == "train") > 180

    kept = stratified_sample(df, ["lang"], {"en": 0.3}, ["doc_id"])
    k1 = {r.doc_id for r in kept.collect()}
    k2 = {r.doc_id for r in kept.collect()}      # rerun: identical
    assert k1 == k2
    by_lang = {r.doc_id: r.lang for r in df.collect()}
    assert all(by_lang[d] != "en" or d in k1 or True for d in by_lang)
    non_en = {d for d, l in by_lang.items() if l != "en"}
    assert non_en <= k1                          # default 1.0 keeps all
    en_kept = len([d for d in k1 if by_lang[d] == "en"])
    assert 10 < en_kept < 60                     # ~30% of 100

    # pure projections: no shuffle in either plan
    for plan_df in (hash_split(df, ["doc_id"], fr), kept):
        assert "Exchange" not in plan_df._jdf.queryExecution() \
            .executedPlan().toString()
    with pytest.raises(ValueError):
        hash_split(df, ["doc_id"], {"a": 0.5, "b": 0.6})


def test_embedding_quantization_codes_and_zero_vector(spark):
    """int8 quantization: codes bounded to [-127, 127], max-abs dim maps
    to ±127, zero vectors quantize to zero codes with scale 0, and
    dequantized values reconstruct within half a step — all as a pure
    projection (no Exchange)."""
    from database_stream_processor_spark.functions.similarity import (
        quantize_embeddings)
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])],
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert out[1].codes == [64, -127, 32]       # -1.0 is the max-abs dim
    assert out[1].scale == 1.0
    assert out[2].codes == [0, 0, 0] and out[2].scale == 0.0
    assert out[3].codes == [127]
    for r in out.values():
        assert all(-127 <= c <= 127 for c in r.codes)
        if r.scale:
            orig = {1: [0.5, -1.0, 0.25], 3: [2.0]}[r.vec_id]
            step = r.scale / 127
            for x, c in zip(orig, r.codes):
                assert abs(c * step - x) <= step / 2 + 1e-9
    plan = (quantize_embeddings(df, "vec_id", "embedding")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


@pytest.mark.slow
def test_cosine_search_on_quantized_codes(spark):
    """Cosine is scale-invariant, so similarity search runs directly on
    int8 codes: top-1 neighbors over the quantized corpus agree with
    top-1 over the original floats, and pairwise cosines agree within
    quantization error (≤ ~1/127 per dim)."""
    import math
    import random
    from database_stream_processor_spark.functions.similarity import (
        cosine, quantize_embeddings)
    random.seed(11)
    vecs = [(i, [random.uniform(-1, 1) for _ in range(16)])
            for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = quantize_embeddings(df, "vec_id", "embedding")
    a = df.selectExpr("vec_id AS ia", "embedding AS va")
    b = df.selectExpr("vec_id AS ib", "embedding AS vb")
    # codes/127 keeps values in the unit range the cosine helper's
    # decimal accumulators expect; cosine is scale-invariant anyway
    qa = q.selectExpr(
        "vec_id AS ia",
        "transform(codes, x -> CAST(x AS DOUBLE) / 127) AS ca")
    qb = q.selectExpr(
        "vec_id AS ib",
        "transform(codes, x -> CAST(x AS DOUBLE) / 127) AS cb")
    pairs = (a.crossJoin(b).filter("ia < ib")
             .join(qa, "ia").join(qb, "ib")
             .select("ia", "ib",
                     cosine(F.col("va"), F.col("vb")).alias("cf"),
                     cosine(F.col("ca"), F.col("cb")).alias("cq"))
             .collect())
    for r in pairs:
        assert abs(r.cf - r.cq) < 0.02, (r.ia, r.ib)
    # top-1 neighbor per vector agrees between float and code space
    best_f, best_q = {}, {}
    for r in pairs:
        for src, dst, cf, cq in ((r.ia, r.ib, r.cf, r.cq),
                                 (r.ib, r.ia, r.cf, r.cq)):
            if cf > best_f.get(src, (-2, None))[0]:
                best_f[src] = (cf, dst)
            if cq > best_q.get(src, (-2, None))[0]:
                best_q[src] = (cq, dst)
    agree = sum(1 for k in best_f if best_f[k][1] == best_q[k][1])
    assert agree >= len(best_f) - 2   # allow rare near-tie flips


def test_png_codec_roundtrip_all_filters(spark):
    """Real stdlib PNG codec: encode cycles scanline filters 0-4, decode
    must invert every one of them bit-exactly, for gray/RGB/RGBA."""
    import random
    from database_stream_processor_spark.functions.multimodal import (
        decode_png, encode_png, png_meta, resize_nearest)
    random.seed(42)
    for channels in (1, 3, 4):
        w, h = 13, 11                   # ≥5 rows -> all filters used
        px = bytes(random.randrange(256) for _ in range(w * h * channels))
        payload = encode_png(w, h, px, channels)
        assert png_meta(payload) == (w, h, 8, channels)
        dw, dh, dch, dpx = decode_png(payload)
        assert (dw, dh, dch) == (w, h, channels)
        assert dpx == px
        # nearest-neighbor resize preserves exact source pixels
        small = resize_nearest(px, w, h, channels, 5, 4)
        assert len(small) == 5 * 4 * channels
        for j in range(4):
            for i in range(5):
                so = ((j * h // 4) * w + (i * w // 5)) * channels
                do = (j * 5 + i) * channels
                assert small[do:do + channels] == px[so:so + channels]


def test_wav_codec_real_metadata(spark):
    from database_stream_processor_spark.functions.multimodal import (
        encode_wav, wav_meta)
    samples = bytes(range(256)) * 25          # 3200 16-bit mono frames
    payload = encode_wav(samples, rate=8000)
    assert wav_meta(payload) == (3200, 8000, 1, 2, 400)


def test_resize_images_real_png_path(spark):
    """resize_images sniffs PNG payloads and emits REAL resized PNGs —
    decoding the output parses actual target dimensions and the exact
    nearest-neighbor pixels; non-PNG rows keep the stub."""
    from database_stream_processor_spark.functions.multimodal import (
        PNG_SIG, decode_png, encode_png, resize_images, resize_nearest)
    px = bytes((i * 7) % 256 for i in range(16 * 12))
    rows = [(1, encode_png(16, 12, px, 1)), (2, b"not a png at all")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: bytes(r["payload"])
           for r in resize_images(df, "doc_id", "payload",
                                  width=8, height=6).collect()}
    assert out[1][:8] == PNG_SIG
    w, h, ch, small = decode_png(out[1])
    assert (w, h, ch) == (8, 6, 1)
    assert small == resize_nearest(px, 16, 12, 1, 8, 6)
    assert out[2][:8] != PNG_SIG and len(out[2]) == 32   # sha stub


def test_chunk_audio_real_wav_path(spark):
    """chunk_audio parses real WAVs: chunk boundaries come from the true
    sample rate and the emitted samples are the raw PCM slices."""
    from database_stream_processor_spark.functions.multimodal import (
        chunk_audio, encode_wav)
    frames = bytes((i * 3) % 256 for i in range(2 * 1000))  # 1000 frames
    payload = encode_wav(frames, rate=8000)                 # 125 ms
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    got = sorted((r["chunk_idx"], r["start_ms"], r["end_ms"],
                  bytes(r["samples"]))
                 for r in chunk_audio(df, "doc_id", "payload",
                                      chunk_ms=50).collect())
    # 8000 Hz * 50 ms = 400 frames/chunk -> chunks of 400/400/200 frames
    assert [(c, s, e, len(b) // 2) for c, s, e, b in got] == \
        [(0, 0, 50, 400), (1, 50, 100, 400), (2, 100, 125, 200)]
    assert got[0][3] == frames[:800] and got[2][3] == frames[1600:]


def test_decode_images_exact_pixel_stats(spark):
    from database_stream_processor_spark.functions.multimodal import (
        decode_images, encode_png)
    px1 = bytes((i * 11) % 256 for i in range(9 * 7))
    px2 = bytes((i * 5 + 1) % 256 for i in range(6 * 4 * 3))
    rows = [(1, encode_png(9, 7, px1, 1)), (2, encode_png(6, 4, px2, 3))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["channels"],
                         r["px_sum"], r["n_px"])
           for r in decode_images(df, "doc_id", "payload").collect()}
    assert got[1] == (9, 7, 1, sum(px1), len(px1))
    assert got[2] == (6, 4, 3, sum(px2), len(px2))


def test_chunk_tokens_windows_and_overlap(spark):
    from database_stream_processor_spark.functions.text import chunk_tokens
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "x")],
                               "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 chunk_tokens(df, "doc_id", "text",
                              chunk_size=4, overlap=1).collect())
    assert got == [(1, 0, "a b c d", 4), (1, 1, "d e f g", 4),
                   (1, 2, "g", 1), (2, 0, "x", 1)]
    import pytest
    with pytest.raises(ValueError):
        chunk_tokens(df, "doc_id", "text", chunk_size=4, overlap=4)
