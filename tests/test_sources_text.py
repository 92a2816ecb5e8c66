"""Sources (scene-id parsers, catalogs) + text/dedup/similarity operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_raster_spark.sources import scene_ids


# --- scene id parsing (pure python twins) -----------------------------------

def test_parse_landsat_collection1():
    r = scene_ids.parse_landsat_id("LC08_L1TP_042033_20170616_20170629_01_T1")
    assert r == ("LC", "p042r033", "20170616", 8)


def test_parse_landsat_precollection_yj():
    r = scene_ids.parse_landsat_id("LT50430331984121XXX02")
    assert r[0] == "LT" and r[1] == "p043r033" and r[3] == 5
    assert r[2] == "19840430"  # 1984 day 121


def test_parse_landsat_legacy_pr():
    r = scene_ids.parse_landsat_id("p042r033_7x20010714")
    assert r == ("", "p042r033", "20010714", 7)


def test_parse_hls_and_sentinel():
    assert scene_ids.parse_hls_id("HLS.S30.T10TEK.2020061.v1.4.hdf") == \
        ("S30", "T10TEK", "20200301")
    assert scene_ids.parse_sentinel2_tile(
        "S2A_MSIL2A_20200601T184921_N0214_R113_T10TEK_20200601T230152") == "10TEK"


def test_scene_id_cols_match_python(spark):
    ids = ["LC08_L1TP_042033_20170616_20170629_01_T1",
           "LE07_L1TP_042033_20010714_20170202_01_T1",
           "p042r033_20010714",
           "LC80420332017167LGN00totally"]
    df = spark.createDataFrame(pd.DataFrame({"scene_id": ids}))
    got = scene_ids.with_scene_id_cols(df).orderBy("scene_id").toPandas()
    for _, row in got.iterrows():
        py = scene_ids.parse_landsat_id(row["scene_id"])
        if py is None:
            assert row["pathrow"] is None
            continue
        assert row["pathrow"] == py[1], row["scene_id"]
        assert row["date_str"] == py[2], row["scene_id"]


# --- text operators ---------------------------------------------------------

def test_token_stats_and_quality(spark, sf_dir):
    from geo_raster_spark.operators import text
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    s = text.with_quality(text.with_token_stats(d)).toPandas()
    assert (s["n_tokens"] > 0).all()
    assert s["quality"].between(0, 1).all()
    # oracle one row
    row = s.iloc[0]
    toks = [t for t in __import__("re").split(r"[^a-z0-9']+", row["text"].lower()) if t]
    assert row["n_tokens"] == len(toks)


def test_lang_id_accuracy(spark):
    # NOTE: the driver's documents.lang labels are synthetic and do NOT
    # correlate with the text content (all docs share one English-ish
    # vocabulary) — so accuracy is asserted on real-language samples.
    from geo_raster_spark.operators import text
    samples = pd.DataFrame({
        "doc_id": range(4),
        "text": [
            "the cat is in the house and it was good for all of us to see",
            "der hund ist nicht in dem haus und ich bin mit einem freund auf",
            "le chien est dans les champs et une maison pour que nous",
            "el perro es en la casa y los gatos que un dia por aqui",
        ],
        "lang": ["en", "de", "fr", "es"]})
    got = text.with_lang_id(spark.createDataFrame(samples)) \
        .select("lang", "lang_pred").toPandas()
    assert (got["lang"] == got["lang_pred"]).all(), got.to_string()


def test_lang_id_und_for_gibberish(spark):
    from geo_raster_spark.operators import text
    d = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": ["zxqv wvut 12345 qqq"]}))
    assert text.with_lang_id(d).toPandas()["lang_pred"].iloc[0] == "und"


def test_fingerprint_deterministic(spark, sf_dir):
    from geo_raster_spark.operators import text
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    a = text.with_fingerprint(d).select("doc_id", "fingerprint").toPandas()
    b = text.with_fingerprint(d).select("doc_id", "fingerprint").toPandas()
    assert a.equals(b)
    assert a["fingerprint"].str.contains("-").all()


# --- jdbc (S11) ---------------------------------------------------------------

def test_jdbc_roundtrip_partitioned(spark):
    """S11: write -> partitioned parallel read against the in-JVM Derby DB
    (the only JDBC engine in this sandbox; same reader path as Postgres)."""
    from geo_raster_spark.sources import tabular
    url = "jdbc:derby:memory:gsr_s11;create=true"
    pdf = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "v": [f"row{i}" for i in range(100)]})
    tabular.write_jdbc(spark.createDataFrame(pdf), url, "t_s11",
                       mode="overwrite")
    got = tabular.read_jdbc(spark, url, "t_s11", partition_column="k",
                            lower_bound=0, upper_bound=100, num_partitions=4)
    assert got.rdd.getNumPartitions() == 4  # bounded range queries, parallel
    out = got.toPandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == list(range(100))
    assert out["v"].tolist() == pdf["v"].tolist()


# --- dedup ------------------------------------------------------------------

def test_exact_dedup_roundtrip(spark):
    from geo_raster_spark.operators import dedup
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["hello world", "foo bar", "hello world", "unique", "foo bar"]})
    d = spark.createDataFrame(pdf)
    groups = dedup.exact_dedup(d).toPandas()
    assert len(groups) == 2 and set(groups["n_dups"]) == {2}
    kept = dedup.drop_exact_dups(d).toPandas()
    assert sorted(kept["doc_id"]) == [1, 2, 4]


def test_minhash_finds_planted_near_dup(spark):
    from geo_raster_spark.operators import dedup
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest looking for food and shelter")
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, base.replace("lazy", "sleepy"),
                 "completely different content about spark and databases entirely"]})
    d = spark.createDataFrame(pdf)
    pairs = dedup.minhash_lsh(d, n_hashes=32, bands=16, jaccard_threshold=0.5).toPandas()
    assert ((pairs["id_a"] == 1) & (pairs["id_b"] == 2)).any()
    assert not ((pairs["id_b"] == 3)).any()
    # exact jaccard verification on the candidate
    jac = dedup.ngram_jaccard(d, spark.createDataFrame(
        pd.DataFrame({"id_a": [1], "id_b": [2]}))).toPandas()
    assert jac["jaccard"].iloc[0] > 0.5


def test_simhash_close_for_similar(spark):
    from geo_raster_spark.operators import dedup
    base = "spark makes distributed data processing simple and fast for everyone"
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, base + " truly", "numpy arrays vectorize numeric python code"]})
    sig = dedup.simhash_signature(spark.createDataFrame(pdf)).toPandas() \
        .set_index("doc_id")["simhash"]
    ham12 = bin(np.uint64(sig[1]) ^ np.uint64(sig[2])).count("1")
    ham13 = bin(np.uint64(sig[1]) ^ np.uint64(sig[3])).count("1")
    assert ham12 < ham13


def test_simhash_vectorized_matches_scalar(spark, sf_dir):
    """The NumPy padded-matrix FNV path must be BYTE-IDENTICAL to the scalar
    FNV-1a reference — both the token hashes and full document signatures
    (round-3 vectorization must not change any signature)."""
    from geo_raster_spark.operators import dedup
    # token-hash parity incl. empty + unicode + long tokens
    toks = [b"", b"a", b"hello", "héllo wörld".encode("utf-8"),
            b"x" * 200, b"the", b"splitmix"]
    got = dedup._fnv1a64_batch(toks)
    want = np.array([dedup._fnv1a64(t) for t in toks], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    # full signature parity vs a scalar per-doc recompute on real docs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    pdf = d.select("doc_id", "text").toPandas()
    sig = dedup.simhash_signature(spark.createDataFrame(pdf)).toPandas() \
        .set_index("doc_id")["simhash"]
    for _, r in pdf.iterrows():
        toks = str(r["text"]).lower().split()
        hs = np.array([dedup._fnv1a64(w.encode("utf-8")) for w in toks],
                      dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        want_sig = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                want_sig |= np.uint64(1) << np.uint64(b)
        assert np.int64(want_sig) == sig[r["doc_id"]], r["doc_id"]


# --- similarity -------------------------------------------------------------

def test_cosine_topk_matches_numpy(spark, sf_dir):
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    got = similarity.cosine_topk(emb, probe, k=5).toPandas()

    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    p = np.array(probe)
    cos = mat @ p / (np.linalg.norm(mat, axis=1) * np.linalg.norm(p) + 1e-30)
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    want = pdf["vec_id"].to_numpy()[order[:5]]
    assert list(got.sort_values("rank")["vec_id"]) == list(want)


def test_ivf_topk_recall(spark, sf_dir):
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    exact = set(similarity.cosine_topk(emb, probe, k=10).toPandas()["vec_id"])
    ann = set(similarity.ivf_topk(emb, probe, k=10, n_centroids=12,
                                  nprobe=4).toPandas()["vec_id"])
    assert len(exact & ann) >= 8  # IVF keeps clusters whole -> high recall


def test_lsh_topk_runs_and_partial_recall(spark, sf_dir):
    # sign-LSH fragments tight clusters: documented as the sparse/uniform-
    # data variant; on this clustered fixture only partial recall is
    # expected (IVF is the quality path, see test_ivf_topk_recall)
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    exact = set(similarity.cosine_topk(emb, probe, k=10).toPandas()["vec_id"])
    got = similarity.lsh_topk(emb, probe, k=10, n_planes=4,
                              multiprobe_bits=1).toPandas()
    assert len(got) > 0 and len(exact & set(got["vec_id"])) >= 2


def test_simhash_pairs_exact_vs_bruteforce(spark, sf_dir):
    """Hamming-join pairs must equal the brute-force all-pairs set (the
    pigeonhole bucketing guarantees 100% recall at the stated radius), on
    real docs plus planted near-dups so the check is non-vacuous."""
    from geo_raster_spark.operators import dedup
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").orderBy("doc_id").limit(40)
    planted = (d.limit(3)
                .select((F.col("doc_id") + 1000).alias("doc_id"),
                        F.concat("text", F.lit(" nearly the same text"))
                        .alias("text")))
    both = d.unionByName(planted).cache()
    t = 8
    got = dedup.simhash_pairs(both, max_hamming=t).toPandas()
    gotset = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}

    sigs = dedup.simhash_signature(both).toPandas().set_index("doc_id")["simhash"]
    ids = sorted(sigs.index)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(np.uint64(sigs[ids[i]]) ^ np.uint64(sigs[ids[j]])).count("1")
            if ham <= t:
                want.add((ids[i], ids[j]))
    assert gotset == want
    assert len(want) >= 1  # the planted dups make the check non-vacuous
    # hamming column values are correct
    for _, r in got.iterrows():
        ham = bin(np.uint64(sigs[r["id_a"]]) ^ np.uint64(sigs[r["id_b"]])).count("1")
        assert r["hamming"] == ham


def test_knn_pairs_exact_finds_planted_dups(spark):
    """knn_pairs_exact was only ever exercised on data with no near-dup pair
    (vacuous 0-row result) — plant exact duplicates and require recovery."""
    from geo_raster_spark.operators import similarity
    rng = np.random.default_rng(42)
    X = rng.normal(size=(40, 16))
    ids = list(range(40))
    # exact copies of vectors 3, 17, 29 under new ids (same LSH bucket by
    # construction, cosine exactly 1.0)
    for j, src in enumerate((3, 17, 29)):
        X = np.vstack([X, X[src]])
        ids.append(100 + j)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [r.tolist() for r in X]})
    emb = spark.createDataFrame(pdf)
    pairs = similarity.knn_pairs_exact(emb, dim=16, n_planes=6,
                                       threshold=0.95).toPandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(3, 100), (17, 101), (29, 102)} <= got
    # brute-force: random gaussians produce no organic pair at 0.95
    cos = (X @ X.T) / np.outer(np.linalg.norm(X, axis=1), np.linalg.norm(X, axis=1))
    organic = [(ids[i], ids[j]) for i in range(len(X)) for j in range(i + 1, len(X))
               if cos[i, j] >= 0.95]
    assert got == set(organic)
    # skew guard: a bucket cap of 1 prunes every bucket that could pair
    capped = similarity.knn_pairs_exact(emb, dim=16, n_planes=6,
                                        threshold=0.95, max_bucket=1).toPandas()
    assert len(capped) == 0
    # center= accepts a precomputed vector (no data_mean full pass) and,
    # with the true mean, returns the identical pair set
    mu = X.mean(axis=0)
    pre = similarity.knn_pairs_exact(emb, dim=16, n_planes=6,
                                     threshold=0.95, center=mu).toPandas()
    assert set(zip(pre["id_a"], pre["id_b"])) == got


def test_ivf_index_persisted_pruned_and_equal(spark, sf_dir, tmp_path):
    """A persisted IVF index must (a) answer identically to the in-session
    ivf_topk with the same centroids, and (b) read only the probed list
    partitions (ivf appears as a partition filter, not a data filter)."""
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    path = str(tmp_path / "ivf")
    C = similarity.build_ivf_index(emb, 64, path, n_centroids=12)

    got = similarity.ivf_topk_indexed(spark, path, probe, k=10, nprobe=4) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    want = similarity.ivf_topk(emb, probe, k=10, nprobe=4, centroids=C) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    assert list(got["vec_id"]) == list(want["vec_id"])
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=1e-8)

    cand = spark.read.parquet(f"{path}/assignments") \
        .where(F.col("ivf").isin([0, 1]))
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "ivf" in plan.split("PartitionFilters")[1].split("\n")[0]


def test_lsh_index_persisted_pruned_and_equal(spark, sf_dir, tmp_path):
    """A persisted LSH index must (a) answer identically to the in-session
    lsh_topk (same planes + same recentering mean), and (b) turn the probe's
    bucket set into a PARTITION filter — no per-query full-table pass."""
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    path = str(tmp_path / "lsh")
    mu = similarity.build_lsh_index(emb, 64, path, n_planes=6)

    got = similarity.lsh_topk_indexed(spark, path, probe, k=10,
                                      multiprobe_bits=1) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    want = similarity.lsh_topk(emb, probe, k=10, n_planes=6,
                               multiprobe_bits=1, center=mu) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    assert list(got["vec_id"]) == list(want["vec_id"])
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=1e-8)

    # the query-side scan must prune to the candidate bucket partitions
    cand = spark.read.parquet(f"{path}/assignments") \
        .where(F.col("bucket").isin([0, 3]))
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1].split("\n")[0]


def test_minhash_cross_build_deterministic(spark, sf_dir):
    """Regression: rebuilt plans must give identical signatures.

    Guards the HOF lambda-arity footgun (a 2-arg `lambda s, i=i` binds the
    array INDEX to i, poisoning salts with per-build variable names)."""
    from geo_raster_spark.operators import dedup
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    runs = []
    for _ in range(3):
        p = (d.select("doc_id", dedup.minhash_signature(
                dedup.shingles("text", 5), 16).alias("sig"))
             .toPandas().sort_values("doc_id"))
        runs.append([tuple(np.asarray(s).tolist()) for s in p["sig"]])
    assert runs[0] == runs[1] == runs[2]


def test_dbf_roundtrip(spark, tmp_path):
    """S10: dBase III attribute table write -> read (pandas + Spark paths),
    covering C/N(int)/N(dec)/L/D field types."""
    from geo_raster_spark.sources import dbf
    pdf = pd.DataFrame({
        "NAME": ["alpha", "beta", "gamma"],
        "ZONE_ID": np.array([1, 22, 333], dtype=np.int64),
        "AREA": np.array([1.5, 0.25, 1234.125], dtype=np.float64),
        "ACTIVE": np.array([True, False, True]),
        "ACQUIRED": pd.to_datetime(["2020-01-31", "1999-12-01", "2024-06-15"]),
    })
    path = str(tmp_path / "attrs.dbf")
    dbf.write_dbf(pdf, path)

    back = dbf.read_dbf_pandas(path)
    assert list(back.columns) == list(pdf.columns)
    assert list(back["NAME"]) == list(pdf["NAME"])
    assert list(back["ZONE_ID"]) == [1, 22, 333]
    np.testing.assert_allclose(back["AREA"], pdf["AREA"], rtol=1e-12)
    assert list(back["ACTIVE"]) == [True, False, True]
    assert [d.isoformat() for d in back["ACQUIRED"]] == \
        ["2020-01-31", "1999-12-01", "2024-06-15"]

    sdf = dbf.read_dbf(spark, path)
    assert sdf.count() == 3
    assert {r["NAME"] for r in sdf.collect()} == {"alpha", "beta", "gamma"}


def test_dbf_numeric_width_overflow_guard(tmp_path):
    """A float too wide for the N(19,8) field must shrink decimals to fit
    (not silently misalign every following field/row); a value too wide even
    at 0 decimals raises."""
    import pytest
    from geo_raster_spark.sources import dbf
    # 1e12 at .8f is 21 chars > width 19 -> decimals shrink until it fits
    pdf = pd.DataFrame({"BIG": np.array([1.0e12, 2.5], dtype=np.float64),
                        "TAIL": ["x", "y"]})
    path = str(tmp_path / "wide.dbf")
    dbf.write_dbf(pdf, path)
    back = dbf.read_dbf_pandas(path)
    np.testing.assert_allclose(back["BIG"], [1.0e12, 2.5], rtol=1e-12)
    assert list(back["TAIL"]) == ["x", "y"]   # following field stays aligned
    # even 0 decimals can't fit 1e25 in 19 chars -> loud failure
    with pytest.raises(ValueError, match="exceeds declared width"):
        dbf.write_dbf(pd.DataFrame({"BIG": [1.0e25]}),
                      str(tmp_path / "bad.dbf"))


def test_shp_kml_write_roundtrip(tmp_path):
    """S8: shapefile writer (public ESRI spec: .shp/.shx + dBase III .dbf)
    round-trips polygons, points and attributes; KML output is well-formed
    XML carrying the same coordinates."""
    from geo_raster_spark import geometry
    from geo_raster_spark.sources import vector

    rings = [geometry.bbox_to_ring((0.0, 0.0, 2.0, 1.0)),
             np.array([[5.0, 5.0], [7.0, 5.0], [6.0, 8.0]])]
    props = pd.DataFrame({"NAME": ["a", "b"],
                          "ZONE_ID": np.array([1, 2], dtype=np.int64)})
    shp = str(tmp_path / "zones.shp")
    vector.write_shp(shp, rings, props)
    geoms, attrs = vector.read_shp(shp)
    assert len(geoms) == 2
    for want, got in zip(rings, geoms):
        w = geometry.ring_close(want)
        # writer forces CW outer rings; compare as closed CW rings
        if geometry.ring_area(w) > 0:
            w = w[::-1]
        np.testing.assert_allclose(got, w)
        assert geometry.ring_area(got) <= 0
    assert list(attrs["NAME"]) == ["a", "b"]
    assert list(attrs["ZONE_ID"]) == [1, 2]
    # .shx index consistency: offsets point at the record headers
    import struct
    with open(str(tmp_path / "zones.shx"), "rb") as f:
        shx = f.read()
    with open(shp, "rb") as f:
        main = f.read()
    for i in range(2):
        off_w, len_w = struct.unpack_from(">ii", shx, 100 + 8 * i)
        recno, clen = struct.unpack_from(">ii", main, off_w * 2)
        assert recno == i + 1 and clen == len_w

    # points variant
    pts = [np.array([1.5, 2.5]), np.array([-3.0, 4.0])]
    vector.write_shp(str(tmp_path / "pts"), pts,
                     pd.DataFrame({"PID": [10, 20]}))
    g2, a2 = vector.read_shp(str(tmp_path / "pts.shp"))
    np.testing.assert_allclose(np.stack(g2), np.stack(pts))
    assert list(a2["PID"]) == [10, 20]

    # KML: well-formed, coordinates round-trip
    import xml.etree.ElementTree as ET
    kml = str(tmp_path / "zones.kml")
    vector.write_kml(kml, rings + pts,
                     [{"name": "a"}, {"name": "b"}, {"name": "p1"},
                      {"name": "p2"}], name_key="name")
    root = ET.parse(kml).getroot()
    ns = {"k": "http://www.opengis.net/kml/2.2"}
    pms = root.findall(".//k:Placemark", ns)
    assert len(pms) == 4
    c0 = pms[0].find(".//k:coordinates", ns).text.split()
    got0 = np.array([[float(v) for v in c.split(",")[:2]] for c in c0])
    np.testing.assert_allclose(got0, geometry.ring_close(rings[0]))
    cp = pms[2].find(".//k:coordinates", ns).text
    np.testing.assert_allclose([float(v) for v in cp.split(",")[:2]], pts[0])


def test_append_to_index_incremental_ivf_and_lsh(spark, sf_dir, tmp_path):
    """Round-5 verdict #4: build on HALF the table, append the rest with
    the EXISTING quantizer (no refit) — indexed queries must then answer
    identically to the non-indexed plan over the FULL table with the same
    centroids/planes, an appended vector must be findable at rank 1, and
    the drift stat must be ~1 for same-distribution appends."""
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    first = emb.orderBy("vec_id").limit(n // 2)
    rest = emb.join(first.select("vec_id"), "vec_id", "left_anti")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]

    # --- IVF ---
    path = str(tmp_path / "ivf_inc")
    C = similarity.build_ivf_index(first, 64, path, n_centroids=12)
    rep = similarity.append_to_index(spark, path, rest, kind="ivf")
    assert rep["n_appended"] == n - n // 2
    assert rep["mean_dist_build"] is not None
    assert 0.5 < rep["drift_ratio"] < 1.5  # same distribution -> ~1
    got = similarity.ivf_topk_indexed(spark, path, probe, k=10, nprobe=4) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    want = similarity.ivf_topk(emb, probe, k=10, nprobe=4, centroids=C) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    assert list(got["vec_id"]) == list(want["vec_id"])
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=1e-8)
    # an appended vector probes back at rank 1 (cosine 1 with itself)
    rv = rest.orderBy("vec_id").limit(1).collect()[0]
    hit = similarity.ivf_topk_indexed(spark, path,
                                      [float(x) for x in rv["embedding"]],
                                      k=1, nprobe=2).collect()[0]
    assert hit["vec_id"] == rv["vec_id"] and hit["rank"] == 1

    # --- sign-LSH ---
    lpath = str(tmp_path / "lsh_inc")
    mu = similarity.build_lsh_index(first, 64, lpath, n_planes=6)
    lrep = similarity.append_to_index(spark, lpath, rest, kind="lsh")
    assert lrep["n_appended"] == n - n // 2
    assert 0.5 < lrep["drift_ratio"] < 1.5
    lgot = similarity.lsh_topk_indexed(spark, lpath, probe, k=10,
                                      multiprobe_bits=1) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    lwant = similarity.lsh_topk(emb, probe, k=10, n_planes=6,
                                multiprobe_bits=1, center=mu) \
        .toPandas().sort_values("rank").reset_index(drop=True)
    assert list(lgot["vec_id"]) == list(lwant["vec_id"])
    np.testing.assert_allclose(lgot["cosine"], lwant["cosine"], atol=1e-8)

    import pytest as _pt
    with _pt.raises(ValueError, match="kind"):
        similarity.append_to_index(spark, path, rest, kind="flat")


def test_append_to_index_replay_idempotent(spark, sf_dir, tmp_path):
    """Round-6 verdict #1: a foreachBatch crash-replay re-delivers the SAME
    batch — with a stable batch_id the delivery must overwrite itself, so
    indexed top-k results stay identical and no duplicate ids appear."""
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    first = emb.orderBy("vec_id").limit(n // 2)
    rest = emb.join(first.select("vec_id"), "vec_id", "left_anti")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]

    for kind in ("ivf", "lsh"):
        path = str(tmp_path / f"{kind}_replay")
        if kind == "ivf":
            similarity.build_ivf_index(first, 64, path, n_centroids=12)
            topk = lambda k=10: similarity.ivf_topk_indexed(  # noqa: E731
                spark, path, probe, k=k, nprobe=4).toPandas()
        else:
            similarity.build_lsh_index(first, 64, path, n_planes=6)
            topk = lambda k=10: similarity.lsh_topk_indexed(  # noqa: E731
                spark, path, probe, k=k, multiprobe_bits=1).toPandas()
        r1 = similarity.append_to_index(spark, path, rest, kind=kind,
                                        batch_id="day-001")
        assert r1["batch_id"] == "day-001"
        assert r1["n_assignment_files"] > 0
        once = topk()
        rows_once = spark.read.parquet(f"{path}/assignments").count()
        # replay: same batch id, same rows -> scoped overwrite, no dups
        similarity.append_to_index(spark, path, rest, kind=kind,
                                   batch_id="day-001")
        rows_replayed = spark.read.parquet(f"{path}/assignments").count()
        assert rows_replayed == rows_once == n
        twice = topk()
        assert list(twice["vec_id"]) == list(once["vec_id"])
        np.testing.assert_allclose(twice["cosine"], once["cosine"],
                                   atol=1e-12)
        ids = spark.read.parquet(f"{path}/assignments") \
            .select("vec_id").toPandas()["vec_id"]
        assert ids.is_unique

    import pytest as _pt
    with _pt.raises(ValueError, match="batch_id"):
        similarity.append_to_index(spark, path, rest, kind="lsh",
                                   batch_id="__build__")
    with _pt.raises(ValueError, match="batch_id"):
        similarity.append_to_index(spark, path, rest, kind="lsh",
                                   batch_id="../evil")


def test_compact_index_folds_batches_and_dedups(spark, sf_dir, tmp_path):
    """Round-6 verdict #2 (index side): compaction must shrink the file
    count, drop replay-duplicated ids (an at-least-once source WITHOUT
    stable batch ids), keep query results identical, and make a late
    replay of a folded batch a no-op via the ledger."""
    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    first = emb.orderBy("vec_id").limit(n // 2)
    rest = emb.join(first.select("vec_id"), "vec_id", "left_anti")
    probe = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    path = str(tmp_path / "ivf_compact")
    similarity.build_ivf_index(first, 64, path, n_centroids=12)
    # the hazard compaction cleans: the same rows delivered under TWO
    # different batch ids (replay without a stable id) -> duplicate ids
    similarity.append_to_index(spark, path, rest, kind="ivf",
                               batch_id="day-001")
    clean = similarity.ivf_topk_indexed(spark, path, probe, k=10,
                                        nprobe=12).toPandas()
    similarity.append_to_index(spark, path, rest, kind="ivf",
                               batch_id="day-001-replayed")
    dup_ids = spark.read.parquet(f"{path}/assignments") \
        .select("vec_id").toPandas()["vec_id"]
    assert not dup_ids.is_unique          # the duplicate-insert hazard
    corrupted = similarity.ivf_topk_indexed(spark, path, probe, k=10,
                                            nprobe=12).toPandas()
    # ...and it REACHES query results: duplicate ids in the top-k
    assert not corrupted["vec_id"].is_unique

    rep = similarity.compact_index(spark, path, id_col="vec_id")
    assert rep["part_col"] == "ivf"
    assert rep["batches_folded"] == 2
    assert rep["files_after"] < rep["files_before"]
    assert rep["dup_rows_dropped"] == n - n // 2
    assert rep["rows_after"] == n
    ids = spark.read.parquet(f"{path}/assignments") \
        .select("vec_id").toPandas()["vec_id"]
    assert ids.is_unique
    after = similarity.ivf_topk_indexed(spark, path, probe, k=10,
                                        nprobe=12).toPandas()
    # nprobe=12 == n_centroids: exact top-k; results must match the
    # CLEAN single-delivery state exactly (dup rows were identical copies)
    assert list(after["vec_id"]) == list(clean["vec_id"])
    np.testing.assert_allclose(after["cosine"], clean["cosine"],
                               atol=1e-12)
    # partition pruning still holds on the compacted layout
    cand = spark.read.parquet(f"{path}/assignments") \
        .where(F.col("ivf").isin([0, 1]))
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    assert "ivf" in plan.split("PartitionFilters")[1].split("\n")[0]

    # late replay of a folded batch: skipped by the ledger, rows unchanged
    late = similarity.append_to_index(spark, path, rest, kind="ivf",
                                      batch_id="day-001")
    assert late["skipped_compacted"] and late["n_appended"] == 0
    assert spark.read.parquet(f"{path}/assignments").count() == n

    # rerun converges (idempotent maintenance): nothing left to fold
    rep2 = similarity.compact_index(spark, path, id_col="vec_id")
    assert rep2["dup_rows_dropped"] == 0 and rep2["rows_after"] == n


def test_index_rebuild_replay_guards_and_recovery(spark, sf_dir, tmp_path):
    """Round-7 review closures on the ANN index lifecycle:
    (a) a REBUILD clears the compacted-batches ledger, so replaying a
        previously-folded batch_id into the new index inserts its rows
        instead of silently no-opping (missing vectors forever);
    (b) rebuild overwrite is pinned to static partitionOverwriteMode —
        under a session-level dynamic default, stale append batches
        (assigned with the OLD quantizer) must not survive the rebuild;
    (c) appending into a pre-batch_id (legacy-layout) index raises
        loudly instead of mixing partition depths;
    (d) a compaction crashed between its two renames is recovered by the
        next append (the resident index is not orphaned)."""
    import os

    from geo_raster_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    first = emb.orderBy("vec_id").limit(n // 2)
    rest = emb.join(first.select("vec_id"), "vec_id", "left_anti")
    n_rest = n - n // 2
    path = str(tmp_path / "ivf_cycle")

    # (a) ledger must not survive a rebuild
    similarity.build_ivf_index(first, 64, path, n_centroids=8)
    similarity.append_to_index(spark, path, rest, kind="ivf",
                               batch_id="day-001")
    similarity.compact_index(spark, path)
    r_replay = similarity.append_to_index(spark, path, rest, kind="ivf",
                                          batch_id="day-001")
    assert r_replay.get("skipped_compacted") and r_replay["n_appended"] == 0
    similarity.build_ivf_index(first, 64, path, n_centroids=8)  # rebuild
    r_after = similarity.append_to_index(spark, path, rest, kind="ivf",
                                         batch_id="day-001")
    assert r_after["n_appended"] == n_rest, \
        "post-rebuild replay of a folded batch_id must INSERT"
    assert spark.read.parquet(f"{path}/assignments").count() == n

    # (b) rebuild under dynamic partitionOverwriteMode drops stale batches
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        similarity.build_ivf_index(first, 64, path, n_centroids=8)
        assert spark.read.parquet(f"{path}/assignments").count() == n // 2
        assert not any(e.startswith("batch_id=day")
                       for e in os.listdir(f"{path}/assignments"))
    finally:
        if old_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           old_mode)

    # (d) mid-swap compaction crash: live dir renamed away, old present.
    # A QUERY serves the pre-compaction view WITHOUT renaming (a reader
    # must not race an in-flight swap — review r7, third pass) ...
    apath = f"{path}/assignments"
    probe_q = [1.0] * 64
    before_crash = similarity.ivf_topk_indexed(
        spark, path, probe_q, k=5, nprobe=8).toPandas()
    os.rename(apath, apath + "__compact_old")
    lazy = similarity.ivf_topk_indexed(spark, path, probe_q, k=5, nprobe=8)
    during_crash = lazy.toPandas()
    assert list(during_crash["vec_id"]) == list(before_crash["vec_id"])
    assert not os.path.isdir(apath)            # reader left the crash be
    # ... and the next WRITER (append) performs the recovery
    r_rec = similarity.append_to_index(spark, path, rest, kind="ivf",
                                       batch_id="day-002")
    assert r_rec["n_appended"] == n_rest
    assert spark.read.parquet(apath).count() == n  # resident rows intact
    # the crashed-window result handle is eagerly materialized, so it
    # SURVIVES the recovery that just renamed its source directory away
    assert list(lazy.toPandas()["vec_id"]) == list(before_crash["vec_id"])

    # (c) legacy layout (no batch_id= level) -> loud raise
    lpath = str(tmp_path / "legacy_idx")
    (similarity.with_ivf_bucket(first,
                                similarity.load_ivf_centroids(spark, path))
        .write.mode("overwrite").partitionBy("ivf")
        .parquet(f"{lpath}/assignments"))
    spark.read.parquet(f"{path}/centroids").write.mode("overwrite") \
        .parquet(f"{lpath}/centroids")
    with pytest.raises(ValueError, match="batch_id= layout"):
        similarity.append_to_index(spark, lpath, rest, kind="ivf",
                                   batch_id="day-001")
    with pytest.raises(ValueError, match="batch_id= layout"):
        similarity.compact_index(spark, lpath)


def test_rebuild_clears_gc_residue(spark, sf_dir, tmp_path):
    """A crash inside _rmtree_atomic parks the old index generation
    under a __gc staging dir; a rebuild must clear it like every other
    compaction residue (review r7, fifth pass)."""
    import os

    from geo_raster_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    path = str(tmp_path / "gc_idx")
    similarity.build_ivf_index(emb, 64, path, n_centroids=4)
    os.makedirs(f"{path}/assignments__compact_old__gc/stale", exist_ok=True)
    similarity.build_ivf_index(emb, 64, path, n_centroids=4)
    assert not os.path.isdir(f"{path}/assignments__compact_old__gc")
