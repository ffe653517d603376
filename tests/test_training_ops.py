"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # plant exact + near duplicates with known ids
    rows = base.limit(6).collect()
    extra = []
    for i, r in enumerate(rows[:3]):
        extra.append((10_000 + i, r.text, r.lang, r.source, r.n_chars))          # exact dup
    for i, r in enumerate(rows[3:6]):
        extra.append((20_000 + i, r.text + " extra tail", r.lang, r.source,
                      r.n_chars + 11))                                            # near dup
    extra_df = spark.createDataFrame(extra, schema=base.schema)
    return base.unionByName(extra_df).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    from kapra_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs).toPandas()
    dups = out[out["is_duplicate"]]
    assert set(dups["doc_id"]) >= {10000, 10001, 10002}
    for _, r in dups.iterrows():
        assert r["keeper_id"] < r["doc_id"]
    # near-dups (different text) are NOT exact dups
    assert not dups["doc_id"].isin([20000, 20001, 20002]).any()


def test_minhash_finds_planted_dups(spark, docs):
    from kapra_spark.operators.dedup import (lsh_candidate_pairs,
                                             minhash_signatures, shingle_df,
                                             verify_jaccard)

    sh = shingle_df(docs).cache()
    sig = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sig)
    verified = verify_jaccard(cand, sh, threshold=0.6).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in verified.itertuples()}
    # planted exact copies: id i cloned as 10000+i -> jaccard 1.0
    for i in range(3):
        assert got.get((i, 10000 + i)) == 1.0, (i, got.get((i, 10000 + i)))
    # planted near dups (appended tail): high but < 1
    for i in range(3):
        j = got.get((3 + i, 20000 + i))
        assert j is not None and 0.6 <= j < 1.0, (i, j)


def test_jaccard_matches_python_oracle(spark, docs):
    from kapra_spark.operators.dedup import (_char_shingle_hashes,
                                             shingle_df, verify_jaccard)

    pdf = docs.limit(4).toPandas()
    sh = shingle_df(docs)
    pairs = spark.createDataFrame(
        [(int(pdf.doc_id[0]), int(pdf.doc_id[1])),
         (int(pdf.doc_id[2]), int(pdf.doc_id[3]))], ["id_a", "id_b"])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in verify_jaccard(pairs, sh, threshold=0.0).collect()}
    for (ia, ib), j in got.items():
        ta = pdf[pdf.doc_id == ia].text.iloc[0]
        tb = pdf[pdf.doc_id == ib].text.iloc[0]
        sa = set(_char_shingle_hashes(ta, 5).tolist())
        sb = set(_char_shingle_hashes(tb, 5).tolist())
        expect = len(sa & sb) / len(sa | sb)
        assert abs(j - expect) < 1e-12


def test_minhash_approximates_jaccard(spark, docs):
    """MinHash signature agreement rate ~ true Jaccard (the estimator
    property that makes LSH banding sound)."""
    from kapra_spark.operators.dedup import (_char_shingle_hashes,
                                             minhash_signatures, shingle_df)

    sig = {r.doc_id: np.array(r.sig)
           for r in minhash_signatures(shingle_df(docs), 128).collect()}
    pdf = docs.toPandas().set_index("doc_id")
    for a, b in [(3, 20000), (4, 20001), (5, 20002)]:
        sa = set(_char_shingle_hashes(pdf.loc[a].text, 5).tolist())
        sb = set(_char_shingle_hashes(pdf.loc[b].text, 5).tolist())
        true_j = len(sa & sb) / len(sa | sb)
        est = (sig[a] == sig[b]).mean()
        assert abs(est - true_j) < 0.15


def test_cluster_pairs(spark):
    from kapra_spark.operators.dedup import cluster_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7, 9]], ["doc_id"])
    lab = {r.doc_id: r.keeper_id for r in cluster_pairs(pairs, ids).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 9: 7}


def test_simhash(spark, docs):
    from kapra_spark.operators.dedup import (shingle_df, simhash_near_dups,
                                             simhash_signatures)

    sh = shingle_df(docs)
    sim = simhash_signatures(sh)
    dups = simhash_near_dups(sim, max_hamming=3).toPandas()
    got = {(r.id_a, r.id_b): r.hamming for r in dups.itertuples()}
    for i in range(3):  # planted exact copies -> identical simhash
        assert got.get((i, 10000 + i)) == 0, (i, got.get((i, 10000 + i)))


def test_embedding_near_dups(spark, emb):
    from kapra_spark.operators.dedup import embedding_near_dups

    base = emb.limit(50)
    clones = (base.limit(3)
              .select((F.col("vec_id") + 90000).alias("vec_id"),
                      "embedding", "label"))
    df = base.unionByName(clones)
    out = embedding_near_dups(df, threshold=0.999).toPandas()
    found = set(out["id_b"])
    assert {90000, 90001, 90002} <= found


def test_topk_bruteforce_vs_numpy(spark, emb):
    from kapra_spark.operators.similarity import topk_cosine_bruteforce

    queries = emb.limit(3)
    got = topk_cosine_bruteforce(emb, queries, k=5).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for q in queries.collect():
        qi = np.nonzero(ids == q.vec_id)[0][0]
        cos = mat @ mat[qi]
        cos[qi] = -np.inf
        expect = ids[np.argsort(-cos)[:5]]
        mine = got[got["query_id"] == q.vec_id].sort_values("rank")["corpus_id"]
        assert list(mine) == list(expect)


def test_lsh_topk_recall(spark, emb):
    from kapra_spark.operators.similarity import (ann_recall,
                                                  topk_cosine_bruteforce,
                                                  topk_cosine_lsh)

    queries = emb.limit(5)
    exact = topk_cosine_bruteforce(emb, queries, k=10).cache()
    # these embeddings are near-unstructured (top-1 same-label rate
    # ~7%), so recall tracks the scanned fraction; single-table: 3
    # planes + multiprobe scans ~half the corpus
    r3 = ann_recall(exact, topk_cosine_lsh(emb, queries, k=10,
                                           n_planes=3, n_tables=1))
    r5 = ann_recall(exact, topk_cosine_lsh(emb, queries, k=10,
                                           n_planes=5, n_tables=1))
    assert r3 >= 0.6, r3
    assert r3 > r5  # fewer planes -> more candidates -> higher recall
    # OR-amplification: 8 tables of 5 planes must beat 1 table of 5
    r5x8 = ann_recall(exact, topk_cosine_lsh(emb, queries, k=10,
                                             n_planes=5, n_tables=8))
    assert r5x8 > r5, (r5x8, r5)


def test_textops(spark, docs):
    from kapra_spark.operators.textops import (detect_language, fingerprint,
                                               quality_features, token_count)

    out = token_count(docs.limit(20)).toPandas()
    for _, r in out.iterrows():
        assert r["n_tokens"] == len(r["text"].split())

    q = quality_features(docs.limit(20)).toPandas()
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    assert ((q["stopword_ratio"] >= 0) & (q["stopword_ratio"] <= 1)).all()

    lang = detect_language(spark.createDataFrame(
        [("the cat is in the house and it was good",),
         ("el perro es de la casa y en un día",),
         ("zzz qqq xxx",)], ["text"])).toPandas()
    assert lang["lang_detected"].tolist() == ["en", "es", "und"]

    fp = fingerprint(spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("different",)],
        ["text"])).toPandas()
    assert fp["fp_md5"][0] == fp["fp_md5"][1] != fp["fp_md5"][2]


def test_multimodal_plumbing(spark):
    from kapra_spark.operators.multimodal import (extract_features,
                                                  fake_media_df,
                                                  sample_frames, stub_decoder)

    media = fake_media_df(spark, 30).cache()
    feats = extract_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic: same payload -> same feature
    again = extract_features(media).toPandas().sort_values("media_id")
    a = feats.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["feature"], again.reset_index(drop=True)["feature"]):
        assert np.allclose(x, y)

    frames = sample_frames(media, every_ms=10000).toPandas()
    vids = media.filter("kind = 'video'").toPandas()
    expect = sum(v // 10000 + 1 for v in vids["duration_ms"])
    assert len(frames) == expect

    with pytest.raises(NotImplementedError):
        stub_decoder(b"xx", "hologram")


def test_lsh_highdim_plan_bounded(spark):
    """dim=1024 x 16 planes x 4 tables: the plane matrix ships in the
    UDF closure, so the Catalyst plan stays O(1) in dimension (the old
    literal-array construction created n_planes*dim = 16k plan nodes
    and died on analysis at real embedding dims)."""
    from kapra_spark.operators.similarity import topk_cosine_lsh

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(1024).tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.limit(2)
    out = topk_cosine_lsh(emb, queries, k=3, n_planes=16, n_tables=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000, len(plan)
    got = out.toPandas()
    assert set(got["query_id"]) <= {0, 1}
    assert (got.groupby("query_id").size() <= 3).all()


def test_embedding_neardup_multitable_recall(spark, emb):
    """multi-table OR-amplification: clones (cos ~1) must be caught by
    the LSH path itself, not just the exact verify."""
    from kapra_spark.operators.dedup import embedding_near_dups

    base = emb.limit(80)
    clones = (base.limit(10)
              .select((F.col("vec_id") + 90000).alias("vec_id"),
                      "embedding", "label"))
    out = embedding_near_dups(base.unionByName(clones),
                              threshold=0.999).toPandas()
    found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    expect = {(i, 90000 + i) for i in range(10)}
    assert expect <= found, expect - found


def test_ivf_topk(spark, emb):
    """IVF-flat: full probe (nprobe == n_cells) is EXACTLY brute force;
    partial probe trades recall for scanned fraction."""
    from kapra_spark.operators.similarity import (ann_recall,
                                                  topk_cosine_bruteforce,
                                                  topk_cosine_ivf)

    queries = emb.limit(5)
    exact = topk_cosine_bruteforce(emb, queries, k=10).cache()
    r_full = ann_recall(exact, topk_cosine_ivf(emb, queries, k=10,
                                               n_cells=16, nprobe=16))
    assert r_full == 1.0
    r_half = ann_recall(exact, topk_cosine_ivf(emb, queries, k=10,
                                               n_cells=16, nprobe=8))
    r_eighth = ann_recall(exact, topk_cosine_ivf(emb, queries, k=10,
                                                 n_cells=16, nprobe=2))
    assert r_half >= r_eighth
    assert r_half >= 0.4, r_half


# ---------------------------------------------------------------------------
# hot-bucket guard (VERDICT r2 finding 1)
# ---------------------------------------------------------------------------

def _doc_rows(texts):
    return [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]


_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_hot_bucket_guard_bounds_pairs_and_keeps_connectivity(spark):
    """300 identical docs, cap 20: the clique is capped to the 20
    smallest ids and the other 280 star-pair with the bucket min, so
    the candidate count collapses from 44850 to 470 while every doc
    still reaches the keeper through verification + clustering."""
    from kapra_spark.operators.dedup import (cluster_pairs,
                                             lsh_candidate_pairs,
                                             minhash_signatures, shingle_df,
                                             verify_jaccard)

    text = "the same boilerplate paragraph repeated verbatim everywhere"
    docs = spark.createDataFrame(_doc_rows([text] * 300), _DOC_SCHEMA)
    sh = shingle_df(docs).cache()
    sig = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sig, max_bucket_size=20).cache()
    n_cand = cand.count()
    assert n_cand == 20 * 19 // 2 + 280, n_cand  # capped clique + star
    verified = verify_jaccard(cand, sh, threshold=0.9)
    clusters = cluster_pairs(
        verified, docs.select(F.col("doc_id"))).toPandas()
    assert set(clusters["keeper_id"]) == {0}  # one cluster, min-id keeper
    assert len(clusters) == 300
    sh.unpersist()
    cand.unpersist()


def test_hot_bucket_guard_noop_on_normal_corpus(spark, docs):
    """Buckets at or under the cap are byte-identical to unguarded."""
    from kapra_spark.operators.dedup import (lsh_candidate_pairs,
                                             minhash_signatures, shingle_df)

    sig = minhash_signatures(shingle_df(docs)).cache()
    guarded = lsh_candidate_pairs(sig, max_bucket_size=2000)
    unguarded = lsh_candidate_pairs(sig, max_bucket_size=None)
    g = {(r.id_a, r.id_b) for r in guarded.collect()}
    u = {(r.id_a, r.id_b) for r in unguarded.collect()}
    assert g == u
    sig.unpersist()


def test_exact_first_defuses_planted_flood(spark):
    """5000 verbatim copies (the planted-flood 'done' criterion):
    exact_first collapses them to one representative before any
    banding, and the expanded clustering maps all 5000 to the min id."""
    from kapra_spark.operators.dedup import minhash_dedup

    text = "copy pasted cookie banner text appearing on every page"
    rng = np.random.default_rng(99)
    words = ["alpha", "bridge", "copper", "delta", "ember", "forest",
             "glacier", "harbor", "island", "jungle", "kernel", "lagoon",
             "meadow", "nebula", "orchid", "prairie"]
    uniq = [" ".join(rng.choice(words, size=12)) + f" {i}"
            for i in range(20)]
    docs = spark.createDataFrame(
        _doc_rows([text] * 5000 + uniq), _DOC_SCHEMA)
    out = minhash_dedup(docs, threshold=0.8, exact_first=True,
                        max_bucket_size=100).toPandas()
    assert len(out) == 5020
    flood = out[out["doc_id"] < 5000]
    assert set(flood["keeper_id"]) == {0}
    rest = out[out["doc_id"] >= 5000]
    assert (rest["keeper_id"] == rest["doc_id"]).all()


def test_simhash_hot_bucket_guard(spark):
    """Identical docs share the full simhash: star pairs verify at
    hamming 0, so the guard preserves exact connectivity."""
    from kapra_spark.operators.dedup import (cluster_pairs, shingle_df,
                                             simhash_near_dups,
                                             simhash_signatures)

    text = "repeated footer text with legal disclaimers and links"
    docs = spark.createDataFrame(_doc_rows([text] * 200), _DOC_SCHEMA)
    sim = simhash_signatures(shingle_df(docs))
    dups = simhash_near_dups(sim, max_hamming=3, max_bucket_size=15).cache()
    n = dups.count()
    assert n == 15 * 14 // 2 + 185, n
    assert dups.filter(F.col("hamming") != 0).count() == 0
    clusters = cluster_pairs(
        dups.select("id_a", "id_b"), docs.select("doc_id")).toPandas()
    assert set(clusters["keeper_id"]) == {0}
    dups.unpersist()


def test_ivf_at_rest_prunes_partitions(spark, emb, tmp_path):
    """ivf_store writes the index partitioned by cell; the at-rest
    probe applies a literal cell IN (...) filter, so the stored scan
    carries partition filters (reads only probed cells' files) and
    results equal the in-memory IVF with the same centroids."""
    from kapra_spark.operators.similarity import (ivf_store,
                                                  topk_cosine_ivf,
                                                  topk_cosine_ivf_at_rest)
    from kapra_spark.sources.table_store import TableStore

    store = TableStore(spark, str(tmp_path))
    cents = ivf_store(emb, store, "ivf_emb", n_cells=16)
    queries = emb.limit(4)

    at_rest = topk_cosine_ivf_at_rest(store, "ivf_emb", queries,
                                      k=5, nprobe=4)
    plan = at_rest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "cell" in pf and pf.strip() != "", pf

    in_mem = topk_cosine_ivf(emb, queries, k=5, n_cells=16, nprobe=4,
                             cents=cents)
    a = {(r.query_id, r.corpus_id, r.rank) for r in at_rest.collect()}
    b = {(r.query_id, r.corpus_id, r.rank) for r in in_mem.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# real stdlib codecs (PNG / WAV) for multimodal columns
# ---------------------------------------------------------------------------

def test_png_roundtrip_exact():
    from kapra_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.default_rng(3)
    for ch in (1, 3, 4):
        for ft in (0, 1, 2):
            img = rng.integers(0, 256, size=(11, 7, ch), dtype=np.uint8)
            out = png_decode(png_encode(img, filter_type=ft))
            assert out.shape == (11, 7, ch)
            assert np.array_equal(out, img), (ch, ft)


def test_png_unfilter_average_and_paeth():
    """Hand-filter scanlines with Average(3)/Paeth(4) per the PNG spec
    and check the decoder inverts them exactly."""
    import struct
    import zlib

    from kapra_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(4)
    h, w, ch = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w * ch), dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = 3 if y % 2 == 0 else 4
        raw.append(f)
        for i in range(w * ch):
            a = int(img[y][i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            pred = (a + b) // 2 if f == 3 else paeth(a, b, c)
            raw.append((int(img[y][i]) - pred) % 256)
        prev = img[y]

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    out = png_decode(payload)
    assert np.array_equal(out.reshape(h, w * ch), img.astype(np.uint8))


def test_wav_roundtrip():
    from kapra_spark.operators.multimodal import wav_decode, wav_encode

    rng = np.random.default_rng(5)
    mono = np.clip(rng.standard_normal(800) * 0.3, -1, 1)
    x, rate = wav_decode(wav_encode(mono, rate=8000))
    assert rate == 8000 and len(x) == 800
    assert np.abs(x - mono).max() <= 1.5 / 32768  # PCM16 quantization

    stereo = np.stack([mono, -mono], axis=1)
    x2, _ = wav_decode(wav_encode(stereo, rate=8000, channels=2))
    assert np.abs(x2).max() <= 1.5 / 32768  # L/R cancel in the mono mix


def test_real_decoder_features(spark):
    """End-to-end: REAL PNG/WAV decode inside the mapInPandas feature
    extractor over a table with valid payloads; video decodes REAL
    uncompressed AVIs."""
    from kapra_spark.operators.multimodal import (extract_features,
                                                  real_decoder,
                                                  synthetic_media_df)

    media = synthetic_media_df(spark, n=24)
    out = extract_features(media, decoder=real_decoder).toPandas()
    assert len(out) == 24
    by_kind = out.groupby("kind")["feature"].first()
    assert len(by_kind["image"]) == 16
    assert len(by_kind["audio"]) == 16
    assert len(by_kind["video"]) == 16  # real AVI decode
    # image feature head is [h, w, ch, mean, std] from real pixels
    img_feats = out[out["kind"] == "image"]["feature"]
    for f in img_feats:
        assert 8 <= f[0] <= 24 and 8 <= f[1] <= 24 and f[2] in (1, 3, 4)
        assert 0 <= f[3] <= 255
    # audio head: [duration_s, rms, zcr]; rms of 0.5*sine ~ 0.35
    au = out[out["kind"] == "audio"]["feature"]
    for f in au:
        assert 0.05 <= f[0] <= 0.6
        assert 0.2 <= f[1] <= 0.5
    # video head: [n_frames, h, w, dur_s, luma_mean, luma_std] from
    # really-decoded DIB frames of uniform-random pixels
    vid = out[out["kind"] == "video"]["feature"]
    for f in vid:
        assert 2 <= f[0] <= 5 and 6 <= f[1] <= 15 and 6 <= f[2] <= 16
        assert 100 <= f[4] <= 155  # uniform [0,256) luma mean ~127.5


def test_jaccard_ngram_join_exact_vs_python(spark, docs):
    """Prefix-filter join result == brute-force all-pairs bigram
    Jaccard computed in plain Python (exactness: no qualifying pair
    dropped, no extra pair, values exact)."""
    from kapra_spark.operators.dedup import jaccard_ngram_join
    import re

    thr = 0.6
    pdf = docs.select("doc_id", "text").toPandas()
    sets = {}
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        ws = [w for w in re.split(r"[^0-9a-z]+", text.lower()) if w]
        sets[did] = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
    ids = sorted(sets)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= thr:
                want.add((a, b, round(j, 6)))
    got = {(r.id_a, r.id_b, round(r.jaccard, 6))
           for r in jaccard_ngram_join(docs, threshold=thr, n=2).collect()}
    assert got == want and len(want) >= 3  # planted dups must appear


def test_jaccard_ngram_join_threshold_boundary(spark):
    """Handcrafted docs with known bigram Jaccard exercise the
    threshold boundary and the length filter: 4/6 passes 0.6, 2/6
    does not; the shorter-than-n doc contributes nothing."""
    from kapra_spark.operators.dedup import jaccard_ngram_join

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"),       # bigrams {ab,bc,cd,de,ef,fg}
         (2, "a b c d e f x"),       # shares {ab,bc,cd,de,ef} -> 5/7
         (3, "a b c x y z"),         # shares {ab,bc} with 1 -> 2/9
         (4, "solo")],               # < 2 words: no bigrams
        ["doc_id", "text"])
    got = {(r.id_a, r.id_b): round(r.jaccard, 4)
           for r in jaccard_ngram_join(docs, "text", "doc_id",
                                       threshold=0.6, n=2).collect()}
    assert got == {(1, 2): round(5 / 7, 4)}
    # at a lower threshold the weak pair appears too
    got2 = {(r.id_a, r.id_b)
            for r in jaccard_ngram_join(docs, "text", "doc_id",
                                        threshold=0.2, n=2).collect()}
    assert got2 == {(1, 2), (1, 3), (2, 3)}


def test_ngram_tokens_unigram_and_short_docs(spark):
    from kapra_spark.operators.dedup import ngram_tokens

    docs = spark.createDataFrame(
        [(1, "Hello, hello WORLD!"), (2, ""), (3, "  ...  ")],
        ["doc_id", "text"])
    out = {r.doc_id: sorted(r.toks)
           for r in ngram_tokens(docs, n=1).collect()}
    assert out == {1: ["hello", "world"]}  # empty-token docs dropped


def test_avi_roundtrip_exact():
    """avi_encode -> avi_decode is byte-exact for every frame,
    including odd widths (4-byte row stride padding) and 1x1."""
    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    rng = np.random.default_rng(3)
    for n, h, w, fps in [(3, 8, 8, 10), (2, 5, 7, 25), (4, 11, 13, 6),
                         (1, 1, 1, 1), (2, 16, 15, 30)]:
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        back, f2 = avi_decode(avi_encode(fr, fps=fps))
        assert back.shape == fr.shape and (back == fr).all()
        assert f2 == fps


def test_avi_decode_rejects_compressed_and_garbage():
    from kapra_spark.operators.multimodal import (avi_decode, avi_encode,
                                                  real_decoder)

    with pytest.raises(NotImplementedError):
        avi_decode(b"\x00" * 64)                     # not RIFF
    payload = bytearray(avi_encode(
        np.zeros((1, 4, 4, 3), dtype=np.uint8), fps=5))
    i = payload.index(b"strf") + 8 + 16              # biCompression field
    payload[i:i + 4] = b"MJPG"
    with pytest.raises(NotImplementedError):
        avi_decode(bytes(payload))                   # compressed codec
    # real_decoder falls back to the stub for undecodable video
    feat = real_decoder(b"\x89mp4-ish-garbage" * 8, "video")
    assert feat.shape == (8,)


def test_decode_sampled_frames_real_pixels(spark):
    """sample_frames plans the offsets; decode_sampled_frames decodes
    the REAL nearest AVI frame per offset — stats match a direct
    numpy decode of the same payloads."""
    from kapra_spark.operators.multimodal import (avi_decode,
                                                  decode_sampled_frames,
                                                  synthetic_media_df)

    media = synthetic_media_df(spark, n=24)
    got = decode_sampled_frames(media, every_ms=100).toPandas()
    vids = media.filter("kind = 'video'").select(
        "media_id", "payload", "duration_ms").toPandas()
    assert len(got) == sum(d // 100 + 1 for d in vids["duration_ms"])
    by_id = {m: avi_decode(bytes(p)) for m, p in
             zip(vids["media_id"], vids["payload"])}
    for r in got.itertuples():
        frames, fps = by_id[r.media_id]
        idx = min(len(frames) - 1, int(round(r.frame_ms / 1000.0 * fps)))
        assert r.frame_idx == idx
        luma = frames[idx].astype(np.float32).mean(axis=2)
        assert abs(r.luma_mean - float(luma.mean())) < 1e-4
        assert (r.height, r.width) == frames.shape[1:3]


def test_avi_decode_ignores_audio_stream_header():
    """An 'auds' strl appearing before the video stream must not have
    its strf (WAVEFORMATEX) parsed as the bitmap header."""
    import struct

    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    fr = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    payload = avi_encode(fr, fps=12)

    def chunk(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b"")

    def lst(t, d):
        return chunk(b"LIST", t + d)

    auds = lst(b"strl", chunk(b"strh", b"auds" + b"\x00" * 48)
               + chunk(b"strf", struct.pack("<2H2I2H", 1, 1, 8000,
                                            16000, 2, 16)))
    body = lst(b"hdrl", auds) + payload[12:]
    full = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    back, fps = avi_decode(full)
    assert (back == fr).all() and fps == 12
