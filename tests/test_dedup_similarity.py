"""Dedup + similarity operator tests with planted duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
)
from spider_engine_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    lsh_bucket,
    make_planes,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm window sill in the afternoon sun with great interest"
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("afternoon", "morning")),  # near dup of 0
        (3, "completely different text about spark shuffles and parquet files and columnar storage engines"),
        (4, "another unrelated document mentioning inverted indexes and tokenizers and posting lists"),
        (5, BASE.replace("quick", "slow").replace("lazy", "sleepy")),  # near
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(planted_docs):
    out = exact_dedup(planted_docs, "doc_id", "text").collect()
    by_hash = {r["content_hash"]: r for r in out}
    dup_groups = [r for r in out if r["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["kept_doc_id"] == 0
    assert dup_groups[0]["n_copies"] == 2
    assert len(by_hash) == 5


def test_minhash_lsh_finds_planted_neardups(planted_docs):
    sigs = minhash_signatures(planted_docs, "doc_id", "text", k=16, n=3)
    pairs = minhash_lsh_pairs(sigs, "doc_id", bands=8)
    verified = jaccard_verify(pairs, planted_docs, "doc_id", "text", n=3)
    high = {
        (r["a"], r["b"])
        for r in verified.filter(F.col("jaccard") >= 0.5).collect()
    }
    assert (0, 1) in high  # exact dup -> jaccard 1.0
    assert (0, 2) in high and (1, 2) in high  # near dup
    assert (3, 4) not in high


def test_minhash_exact_dup_jaccard_one(planted_docs):
    sigs = minhash_signatures(planted_docs, "doc_id", "text", k=16, n=3)
    rows = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    assert rows[0] == rows[1]  # identical text -> identical signature


def test_simhash_finds_planted_neardups(planted_docs):
    pairs = simhash_pairs(planted_docs, "doc_id", "text", max_hamming=6)
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((0, 1)) == 0  # identical
    assert (0, 2) in got  # one-word swap: small hamming
    assert (3, 4) not in got


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype("float32")
    # vec 1 = near-copy of vec 0
    base[1] = base[0] + rng.standard_normal(16).astype("float32") * 0.01
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base,
    )


def test_brute_force_topk(vectors):
    df, base = vectors
    q = [float(x) for x in base[0]]
    rows = brute_force_topk(
        df.filter("vec_id <> 0"), "vec_id", "embedding", q, k=5
    ).collect()
    assert rows[0]["vec_id"] == 1  # the planted near-copy wins
    assert rows[0]["cosine"] > 0.99
    # exact numpy cross-check of the full ranking
    sims = {}
    qn = np.asarray(q, dtype=np.float64)
    for i in range(1, 40):
        v = base[i].astype(np.float64)
        sims[i] = float(
            np.dot(qn, v) / (np.linalg.norm(qn) * np.linalg.norm(v))
        )
    want = sorted(sims, key=lambda i: (-sims[i], i))[:5]
    assert [r["vec_id"] for r in rows] == want


def test_ann_lsh_recall(vectors):
    df, base = vectors
    q = [float(x) for x in base[0]]
    planes = make_planes(16, 6)
    bucketed = lsh_bucket(df.filter("vec_id <> 0"), "embedding", planes)
    ann = ann_topk_lsh(
        bucketed, "vec_id", "embedding", q, planes, k=5, probe_hamming=2
    ).collect()
    brute = brute_force_topk(
        df.filter("vec_id <> 0"), "vec_id", "embedding", q, k=5
    ).collect()
    ann_ids = {r["vec_id"] for r in ann}
    brute_ids = [r["vec_id"] for r in brute]
    # the planted near-copy (a true near-duplicate) MUST be found — LSH
    # recall is high where cosine is high; the remaining brute-force
    # "neighbors" of a random corpus sit near cosine 0 where recall
    # legitimately tracks the probed-bucket fraction.
    assert brute_ids[0] in ann_ids
    assert ann[0]["vec_id"] == brute_ids[0]
    assert len(ann_ids & set(brute_ids)) >= 2


def test_ivf_ann(vectors):
    from spider_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        sample_centroids,
    )

    df, base = vectors
    cents = sample_centroids(df, "embedding", 6, "vec_id")
    assigned = ivf_assign(df.filter("vec_id <> 0"), "vec_id", "embedding", cents)
    # every vector lands in exactly one list
    assert assigned.filter("ivf_list < 0").count() == 0
    q = [float(x) for x in base[0]]
    got = ivf_topk(assigned, "vec_id", "embedding", q, cents, k=5, n_probe=3)
    rows = got.collect()
    brute = brute_force_topk(
        df.filter("vec_id <> 0"), "vec_id", "embedding", q, k=5
    ).collect()
    # the planted near-copy is in a probed list and ranks first
    assert rows[0]["vec_id"] == brute[0]["vec_id"] == 1
    assert len({r["vec_id"] for r in rows} & {r["vec_id"] for r in brute}) >= 2


def test_hot_shingle_cap_bounds_candidates(spark):
    """A boilerplate shingle shared by many docs must not explode the
    shared-shingle candidate join: with the df cap active the candidate
    count drops from O(k^2) to the true near-dup pairs, and verified
    results are unchanged."""
    from spider_engine_spark.operators.dedup import shared_shingle_pairs

    boiler = "subscribe to our newsletter today"
    rows = [(i, f"unique{i} text body {i} " + boiler) for i in range(30)]
    # one true near-dup pair sharing non-boilerplate shingles
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = shared_shingle_pairs(docs, "doc_id", "text", n=3)
    capped = shared_shingle_pairs(docs, "doc_id", "text", n=3, max_df=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_uncapped >= 30 * 29 / 2  # boilerplate quadratic blowup
    assert n_capped < n_uncapped / 10
    got = [
        (r["a"], r["b"])
        for r in jaccard_verify(capped, docs, "doc_id", "text", n=3)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    ]
    assert got == [(100, 101)]  # true pair survives the cap


def test_simhash_signature_matches_pure_python(spark):
    """The JVM-native 60-bit md5 SimHash equals an independent pure-Python
    reimplementation of the same definition."""
    import hashlib

    from spider_engine_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_signatures,
    )

    texts = [
        "the quick brown fox",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox the quick",
    ]

    def py_simhash(text):
        counts = {}
        for t in text.split():
            if t:
                counts[t] = counts.get(t, 0) + 1
        acc = [0] * SIMHASH_BITS
        for t, c in counts.items():
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(SIMHASH_BITS):
                acc[b] += c if (h >> b) & 1 else -c
        return sum(1 << b for b in range(SIMHASH_BITS) if acc[b] > 0)

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["sim"]
        for r in simhash_signatures(docs, "doc_id", "text").collect()
    }
    assert got == {i: py_simhash(t) for i, t in enumerate(texts)}


def test_kmeans_improves_ivf_partition(spark):
    """Lloyd refinement must raise the spherical-k-means objective over
    the deterministic seed centroids, stay deterministic, and keep
    ivf_topk recall at least as good with the same n_probe."""
    from spider_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_inertia,
        ivf_topk,
        kmeans_centroids,
        sample_centroids,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding")
    seed = sample_centroids(emb, "embedding", 8, "vec_id")
    refined = kmeans_centroids(emb, "vec_id", "embedding", 8, iters=3)
    refined2 = kmeans_centroids(emb, "vec_id", "embedding", 8, iters=3)
    assert refined == refined2  # deterministic
    i0 = ivf_inertia(emb, "vec_id", "embedding", seed)
    i1 = ivf_inertia(emb, "vec_id", "embedding", refined)
    assert i1 > i0  # objective improved

    # recall vs brute force with refined lists
    qvec = list(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    )
    brute = {
        r["vec_id"]
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", qvec, 10
        ).collect()
    }
    assigned = ivf_assign(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", refined
    )
    got = {
        r["vec_id"]
        for r in ivf_topk(
            assigned, "vec_id", "embedding", qvec, refined, k=10, n_probe=4
        ).collect()
    }
    assert len(got & brute) >= 6  # decent recall at half the lists probed


def test_hot_shingle_cap_keeps_exact_dup_clusters(spark):
    """A duplicate cluster LARGER than max_df must keep all its pairs:
    every shingle in the cluster is hotter than the cap, but the exact
    shingle-set recovery join finds the jaccard=1.0 pairs anyway."""
    from spider_engine_spark.operators.dedup import shared_shingle_pairs

    text = "exactly the same boilerplate body for every copy here"
    rows = [(i, text) for i in range(30)]  # 30 > max_df=10
    rows += [(100 + i, f"unique doc {i} alpha beta gamma {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = shared_shingle_pairs(docs, "doc_id", "text", n=3, max_df=10)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    expected = {(i, j) for i in range(30) for j in range(i + 1, 30)}
    assert expected <= got  # all 435 exact-dup pairs survive the cap


def test_winnowing_shared_run_guarantees_shared_fingerprint(spark):
    """Winnowing's core guarantee: two docs sharing a sufficiently long
    token run (>= n+w-1 tokens) share at least one fingerprint; disjoint
    docs share none."""
    from spider_engine_spark.functions.text_analysis import (
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= 3+4-1
    docs = spark.createDataFrame(
        [
            (0, f"intro words here {shared} tail one"),
            (1, f"completely different head {shared}"),
            (2, "unrelated content with other tokens entirely present"),
            (3, "tiny doc"),  # < n+w-1 tokens -> empty fingerprint set
        ],
        "doc_id long, text string",
    )
    rows = docs.select(
        "doc_id", winnowing_fingerprints(F.col("text")).alias("fps")
    ).collect()
    fps = {r["doc_id"]: set(r["fps"]) for r in rows}
    assert fps[0] & fps[1]  # shared run -> shared fingerprint
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert fps[3] == set()


def test_ivf_persisted_index_probe_prunes_lists(spark, tmp_path_factory):
    """Round-3 advice #7: build the IVF index ONCE at rest (centroids in
    table meta, assignment hive-partitioned by ivf_list), probe twice
    with different query vectors, and assert each probe scans ONLY the
    probed list partitions (plan PartitionFilters + actual input files)."""
    import contextlib
    import io as _io
    import re

    from spider_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
    )
    from spider_engine_spark.sources.tableio import TableIO

    tio = TableIO(str(tmp_path_factory.mktemp("ivf")))
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cents = build_ivf_index(
        tio, "emb__ivf", emb, "vec_id", "embedding", k=8, iters=2
    )
    assert len(cents) == 8
    # centroids round-trip through the manifest meta exactly
    assert tio.meta("emb__ivf")["centroids"] == cents

    n_probe = 2
    qvecs = [
        list(emb.filter(F.col("vec_id") == i).collect()[0]["embedding"])
        for i in (0, 7)
    ]
    for qvec in qvecs:
        page = ivf_probe_index(
            spark, tio, "emb__ivf", qvec, k=5, n_probe=n_probe
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            page.explain("formatted")
        plan = buf.getvalue()
        # the pruning reaches the scan as a partition filter...
        assert re.search(r"PartitionFilters: \[ivf_list", plan), plan
        rows = page.collect()
        assert len(rows) == 5
        # ...and the EXECUTED scan read files from only n_probe of the k
        # list partitions (runtime metrics, not plan text)
        metrics = {}
        leaves = page._jdf.queryExecution().executedPlan().collectLeaves()
        for i in range(leaves.size()):
            it = leaves.apply(i).metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
        assert 0 < metrics["numPartitions"] <= n_probe, metrics
        assert 0 < metrics["numFiles"] <= n_probe, metrics
        # exact cosine within the probed lists: descending, tiebroken
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)

    # the two probes ranked different centroid lists (different queries
    # genuinely routed differently) or at minimum returned valid pages
    p0 = {r["vec_id"] for r in ivf_probe_index(
        spark, tio, "emb__ivf", qvecs[0], k=5, n_probe=n_probe
    ).collect()}
    assert 0 in p0  # a vector's own list always contains itself


def _py_gopher_tokens(text):
    import re as _re

    return [t for t in _re.split(r"\s+", text) if t]


def _py_top_ngram_char_fraction(text, n):
    from collections import Counter

    toks = _py_gopher_tokens(text)
    total = sum(len(t) for t in toks)
    if len(toks) < n or total == 0:
        return 0.0
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(grams)
    m = max(cnt.values())
    cover = max(c * (len(g) - (n - 1)) for g, c in cnt.items() if c == m)
    return min(cover / total, 1.0)


def _py_dup_ngram_char_fraction(text, n):
    from collections import Counter

    toks = _py_gopher_tokens(text)
    total = sum(len(t) for t in toks)
    if len(toks) < n or total == 0:
        return 0.0
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(grams)
    dup = {g for g, c in cnt.items() if c > 1}
    if not dup:
        return 0.0
    covered = 0
    for j in range(len(toks)):  # token j covered by grams [j-n+1 .. j]
        lo, hi = max(j - n + 1, 0), min(j, len(grams) - 1)
        if any(grams[i] in dup for i in range(lo, hi + 1)):
            covered += len(toks[j])
    return covered / total


def test_gopher_repetition_fractions_match_python_oracle(spark):
    """top/dup n-gram char fractions (Gopher quality rules) — JVM array
    exprs vs an independent pure-Python oracle, on hand-built edges and
    random repetitive docs."""
    import random

    import pytest as _pytest

    from spider_engine_spark.functions.text_analysis import (
        gopher_repetition,
        top_ngram_char_fraction,
    )

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gg", "d", "epsilon", "zzz"]
    corpus = [
        "",
        "one",
        "one two",
        "a a a a a",  # overlap: raw top-2gram cover > 1 -> clamp
        "x y x y x y x y",
        "no repeats at all here truly none",
        "spam spam spam spam ham spam spam spam spam",
        "  leading and   multiple   spaces here  ",
    ]
    for _ in range(40):
        k = rng.randrange(0, 30)
        corpus.append(" ".join(rng.choice(vocab) for _ in range(k)))
    # heavy-repetition docs (phrase stutter like boilerplate)
    for _ in range(10):
        phrase = " ".join(rng.choice(vocab) for _ in range(4))
        corpus.append(
            " ".join([phrase] * rng.randrange(2, 5) + [rng.choice(vocab)])
        )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id long, text string"
    )
    rows = (
        gopher_repetition(df, "text", top_ns=(3,), dup_ns=(2, 5))
        .select(
            "doc_id",
            # Column form and DataFrame ladder must agree (same law)
            top_ngram_char_fraction(F.col("text"), 2).alias("top2"),
            F.col("top_3gram_char_frac").alias("top3"),
            F.col("dup_2gram_char_frac").alias("dup2"),
            F.col("dup_5gram_char_frac").alias("dup5"),
        )
        .collect()
    )
    assert len(rows) == len(corpus)
    for r in rows:
        text = corpus[r["doc_id"]]
        for col, fn, n in (
            ("top2", _py_top_ngram_char_fraction, 2),
            ("top3", _py_top_ngram_char_fraction, 3),
            ("dup2", _py_dup_ngram_char_fraction, 2),
            ("dup5", _py_dup_ngram_char_fraction, 5),
        ):
            want = fn(text, n)
            assert r[col] == _pytest.approx(want, rel=1e-12, abs=1e-12), (
                f"doc {r['doc_id']} {col}: got {r[col]}, want {want} "
                f"for {text!r}"
            )
    # the filters separate boilerplate from clean text
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[4]["top2"] > 0.5  # "x y x y ..." is pure repetition
    assert by_id[5]["dup2"] == 0.0  # no repeated bigram


def test_contamination_pairs_flags_copied_spans(spark):
    """Decontamination: a corpus doc embedding a test-set span of
    >= n+w-1 tokens is flagged (winnowing guarantee); disjoint docs are
    not; the broadcast join keeps corpus rows unshuffled."""
    from spider_engine_spark.operators.dedup import contamination_pairs

    bench = "what is the capital of france paris obviously"  # 8 tokens
    corpus = spark.createDataFrame(
        [
            (0, f"crawl page mentions {bench} inside a longer article"),
            (1, "entirely unrelated content about spark shuffles"),
            (2, f"another copy: {bench}"),
            (3, "capital france paris"),  # shares words, no 6-token run
        ],
        "doc_id long, text string",
    )
    testset = spark.createDataFrame(
        [(100, bench), (101, "some other benchmark question here asked")],
        "doc_id long, text string",
    )
    got = {
        (r["corpus_id"], r["test_id"])
        for r in contamination_pairs(corpus, testset).collect()
    }
    assert (0, 100) in got and (2, 100) in got
    assert not any(c in (1, 3) for c, _ in got)
    assert not any(t == 101 for _, t in got)
    # plan: corpus side joins via BroadcastHashJoin (no corpus shuffle
    # before the join)
    plan = contamination_pairs(corpus, testset)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_filter_labels_each_rule(spark):
    """The composite quality gate: each planted violation trips its rule
    label; a clean doc passes with an empty reason list. Degenerate docs
    legitimately co-fire rules (a 2-token doc's top 2-gram IS the whole
    doc), so short/repeated fixtures assert membership, not equality."""
    from spider_engine_spark.functions.text_analysis import quality_filter

    clean = (
        "the quick brown fox jumps over a lazy dog while evening light "
        "settles on quiet rooftops and distant hills glow warmly tonight"
    )
    rows = [
        (0, clean),
        (1, "too short"),
        (2, "spam " * 40),  # top-2gram + dup-5gram + low distinct
        (3, "a b c d e f g h i j k l"),  # avg token length 1 < 2.0
        (4, "pneumonoultramicroscopicsilicovolcanoconiosis " * 12),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["quality_keep"], set(r["quality_reject_reasons"]))
        for r in quality_filter(df, "text").collect()
    }
    assert out[0] == (True, set())
    assert out[1][0] is False and "too_few_tokens" in out[1][1]
    assert out[2][0] is False
    assert {"top_2gram_repetition", "dup_5gram_repetition"} <= out[2][1]
    assert out[3] == (False, {"avg_token_too_short"})
    assert out[4][0] is False and "avg_token_too_long" in out[4][1]
    # no rule fires spuriously on a doc that can't have violated it
    assert "avg_token_too_long" not in out[1][1] | out[2][1] | out[3][1]
    assert "too_few_tokens" not in out[2][1] | out[3][1] | out[4][1]
    # kill-rate audit: one groupBy over the labeled reject stream
    from pyspark.sql import functions as FF

    audit = (
        quality_filter(df, "text")
        .select(FF.explode("quality_reject_reasons").alias("rule"))
        .groupBy("rule")
        .count()
        .collect()
    )
    assert {r["rule"] for r in audit} >= {"too_few_tokens", "avg_token_too_short"}


def test_quality_filter_rejects_null_text(spark):
    """NULL content = empty document: it must FAIL the gate via the
    min-token rule (previously every rule condition was NULL, no label
    survived, and the null doc sailed through as quality_keep=true)."""
    from spider_engine_spark.functions.text_analysis import quality_filter

    clean = (
        "the quick brown fox jumps over a lazy dog while evening light "
        "settles on quiet rooftops and distant hills glow warmly tonight"
    )
    df = spark.createDataFrame(
        [(0, None), (1, clean)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["quality_keep"], set(r["quality_reject_reasons"]))
        for r in quality_filter(df, "text").collect()
    }
    assert out[0][0] is False and "too_few_tokens" in out[0][1]
    assert out[1] == (True, set())


# ---------------------------------------------------------------------------
# connected_components (dedup clustering)
# ---------------------------------------------------------------------------


def _uf_components(pairs, nodes):
    """Union-find oracle: node -> min node id of its component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


@pytest.mark.parametrize("reliable", [False, True])
def test_connected_components_chain_clique_singleton(
    spark, tmp_path, reliable
):
    """Both checkpoint modes: localCheckpoint (single-box default) and
    reliable df.checkpoint() into a caller-owned dir (the cluster-scale
    option — survives executor loss, no block-manager bookkeeping)."""
    from spider_engine_spark.operators.dedup import connected_components

    ckpt = str(tmp_path / "cc_ckpt") if reliable else None
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(9)]
        + [("x1", "x2"), ("x2", "x3"), ("x1", "x3")],
        "a string, b string",
    )
    nodes = spark.createDataFrame(
        [("solo",)] + [(f"d{i}",) for i in range(10)]
        + [("x1",), ("x2",), ("x3",)],
        "node string",
    )
    got = {
        r.node: r.comp
        for r in connected_components(
            pairs, nodes=nodes, checkpoint_dir=ckpt
        ).collect()
    }
    if reliable:
        import os

        assert os.path.isdir(ckpt)  # rounds really went through the dir
    assert got["solo"] == "solo"
    assert all(got[f"d{i}"] == "d0" for i in range(10))  # chain: O(log d) rounds
    assert all(got[x] == "x1" for x in ("x1", "x2", "x3"))


def test_connected_components_matches_union_find_on_random_graph(spark):
    """Seeded random graph vs a pure-Python union-find oracle, plus
    determinism across two runs."""
    import random

    from spider_engine_spark.operators.dedup import connected_components

    rng = random.Random(20260817)
    n = 80
    nodes = [f"n{i:03d}" for i in range(n)]
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    expect = _uf_components(pairs, nodes)
    pdf = spark.createDataFrame(pairs, "a string, b string")
    ndf = spark.createDataFrame([(x,) for x in nodes], "node string")
    got1 = {r.node: r.comp for r in connected_components(pdf, nodes=ndf).collect()}
    got2 = {r.node: r.comp for r in connected_components(pdf, nodes=ndf).collect()}
    assert got1 == expect
    assert got2 == got1


def test_connected_components_endpoints_without_nodes_arg(spark):
    from spider_engine_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([("b", "a"), ("c", "d")], "a string, b string")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_connected_components_frees_intermediate_checkpoints(spark):
    """Only the RETURNED label snapshot may stay pinned: every per-round
    checkpoint and the edge list must be freed (localCheckpoint blocks
    are invisible to Dataset.unpersist — the operator frees them by RDD
    id), else a long session leaks one snapshot per round."""
    from spider_engine_spark.operators.dedup import (
        _pinned_rdd_ids,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(9)], "a string, b string"
    )
    before = _pinned_rdd_ids(spark)
    out = connected_components(pairs)
    assert out.count() == 10
    leaked = _pinned_rdd_ids(spark) - before
    assert len(leaked) == 1, (
        f"{len(leaked)} snapshots pinned after the run — expected only "
        "the returned labels"
    )


# ---------------------------------------------------------------------------
# token_rarity (unigram corpus-frequency quality score)
# ---------------------------------------------------------------------------


def test_token_rarity_hand_computed(spark):
    from spider_engine_spark.functions.text_analysis import token_rarity

    docs = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "a c"), ("d3", "")],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.sum_df, r.avg_df)
        for r in token_rarity(docs, "doc_id", "text").collect()
    }
    # corpus counts: a=3, b=1, c=1
    assert got["d1"] == (3, 2 * 3 + 1, 7 / 3)
    assert got["d2"] == (2, 3 + 1, 2.0)
    assert got["d3"] == (0, 0, None)  # zero-token doc: NULL score


def test_token_rarity_vocab_join_is_broadcast(spark):
    """The vocabulary side must broadcast: a shuffle join on `term`
    puts the full stopword skew on the exchange."""
    from spider_engine_spark.functions.text_analysis import token_rarity

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        token_rarity(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_ivf_append_incremental(spark, tmp_path_factory):
    """Appended vectors join the persisted index under the same
    centroids and partitioning: a planted power-of-two scaled copy of
    the query (same cosine, same list argmax — exact in IEEE) is found
    at rank 1 by the next probe, pruning intact, centroids unchanged."""
    from spider_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_probe_index,
    )
    from spider_engine_spark.sources.tableio import TableIO

    tio = TableIO(str(tmp_path_factory.mktemp("ivf_app")))
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cents = build_ivf_index(
        tio, "emb__ivf", emb, "vec_id", "embedding", k=8, iters=2
    )
    qvec = list(emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"])
    new_id = 10_000_000
    copy = [float(x) * 2.0 for x in qvec]  # power-of-two: cosine == 1.0
    ivf_append(
        tio,
        "emb__ivf",
        spark.createDataFrame(
            [(new_id, copy)], "vec_id long, embedding array<float>"
        ),
    )
    assert tio.meta("emb__ivf")["centroids"] == cents  # meta carried over
    page = ivf_probe_index(spark, tio, "emb__ivf", qvec, k=3, n_probe=2)
    rows = page.collect()
    # the scaled copy and the original tie at cosine 1.0; vec_id 3 wins
    # the deterministic tiebreak, the appended copy must be present
    top_ids = [r["vec_id"] for r in rows]
    assert top_ids[0] == 3 and new_id in top_ids[:2], top_ids
    assert abs(rows[1]["cosine"] - 1.0) < 1e-12
    # pruning still holds on the appended snapshot: the union has TWO
    # FileScan leaves (base dir + append dir) and EACH must prune to
    # <= n_probe list partitions (a dict keyed on metric name would
    # silently check only the last leaf)
    leaves = page._jdf.queryExecution().executedPlan().collectLeaves()
    per_leaf = []
    for i in range(leaves.size()):
        m = {}
        it = leaves.apply(i).metrics().iterator()
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        if "numPartitions" in m:
            per_leaf.append(m["numPartitions"])
    assert len(per_leaf) == 2, per_leaf
    assert all(0 < n <= 2 for n in per_leaf), per_leaf


def test_ivf_append_guards(spark, tmp_path_factory):
    """Empty batches are no-ops (a zero-row hive write commits a dir
    with no parquet files and bricks the table), wrong-dimension
    vectors raise instead of vanishing into list -1, and batch_id opts
    into the replay-idempotence law."""
    import pytest as _pytest

    from spider_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_probe_index,
    )
    from spider_engine_spark.sources.tableio import TableIO

    tio = TableIO(str(tmp_path_factory.mktemp("ivf_guard")))
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    build_ivf_index(tio, "ivf", emb, "vec_id", "embedding", k=4, iters=1)
    v0 = tio.versions("ivf")[-1]
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ivf_append(tio, "ivf", empty) is None
    assert tio.versions("ivf")[-1] == v0  # no version committed
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    # the table still reads fine and probes work
    assert ivf_probe_index(spark, tio, "ivf", qvec, k=3).count() == 3
    with _pytest.raises(ValueError, match="dim"):
        ivf_append(
            tio, "ivf",
            spark.createDataFrame(
                [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
            ),
        )
    # NULL vectors must hit the same guard: size(NULL) is NULL and
    # sum() skips NULLs, so without the isNull term the row would slip
    # through into the unsearchable list -1 fallback
    with _pytest.raises(ValueError, match="dim"):
        ivf_append(
            tio, "ivf",
            spark.createDataFrame(
                [(2, None)], "vec_id long, embedding array<float>"
            ),
        )
    # batch_id idempotence: the second delivery of batch 0 is a no-op
    one = spark.createDataFrame(
        [(777, qvec)], "vec_id long, embedding array<float>"
    )
    assert ivf_append(tio, "ivf", one, batch_id=0) is not None
    v1 = tio.versions("ivf")[-1]
    assert ivf_append(tio, "ivf", one, batch_id=0) is None
    assert tio.versions("ivf")[-1] == v1


def test_compaction_preserves_hive_partitioning(spark, tmp_path_factory):
    """compact/compact_small must rewrite WITH the table's recorded
    hive layout: flattening ivf_list would silently trade away the
    partition pruning the index exists for."""
    from spider_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_probe_index,
    )
    from spider_engine_spark.sources.tableio import TableIO

    tio = TableIO(str(tmp_path_factory.mktemp("ivf_comp")))
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    build_ivf_index(tio, "ivf", emb, "vec_id", "embedding", k=4, iters=1)
    qvec = list(emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"])
    ivf_append(
        tio, "ivf",
        spark.createDataFrame(
            [(5_000_000, [x * 2.0 for x in qvec])],
            "vec_id long, embedding array<float>",
        ),
    )
    meta = dict(tio.meta("ivf"))
    tio.compact(spark, "ivf", meta=meta)  # fold the append chain
    assert tio._entry("ivf")["partition_by"] == ["ivf_list"]
    page = ivf_probe_index(spark, tio, "ivf", qvec, k=3, n_probe=2)
    rows = page.collect()
    assert rows[0]["vec_id"] == 5 and 5_000_000 in [
        r["vec_id"] for r in rows[:2]
    ]
    # single compacted dir, pruned to n_probe list partitions
    leaves = page._jdf.queryExecution().executedPlan().collectLeaves()
    m = {}
    it = leaves.apply(0).metrics().iterator()
    while it.hasNext():
        kv = it.next()
        m[kv._1()] = kv._2().value()
    assert leaves.size() == 1
    assert 0 < m["numPartitions"] <= 2, m


@pytest.mark.parametrize("sf", ["0.001", "0.1"])
def test_lsh_recall_matches_exact_generator(spark, sf):
    """The dedup_minhash_lsh / dedup_clusters / streaming_neardup_pairs
    oracles are brute-force scans, so they assume LSH recall 1.0 on the
    test corpora. That is probabilistic in general ((1-j^2)^bands per
    pair — ~2.8e-4 at the 0.8 boundary), so AUDIT it: the LSH-verified
    pair set must equal the exact shared-shingle generator's verified
    set. sf0.1 is the leg that matters: its 256 pairs INCLUDE pairs at
    jaccard exactly 0.8 (sf0.001/sf0.01 bottom out at ~0.89/0.9, where
    the miss bound is <2e-6) — the boundary regime is the only place a
    recall miss is plausible. If new testdata ever breaks this, the
    oracle mismatch is a recall miss, not a scoring bug — retune
    k/bands."""
    from spider_engine_spark.operators.dedup import shared_shingle_pairs

    docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=3)
    lsh = {
        (r.a, r.b)
        for r in jaccard_verify(
            minhash_lsh_pairs(sigs, "doc_id", bands=8),
            docs, "doc_id", "text", n=3,
        ).filter(F.col("jaccard") >= 0.8).collect()
    }
    exact = {
        (r.a, r.b)
        for r in jaccard_verify(
            shared_shingle_pairs(docs, "doc_id", "text", n=3, max_df=None),
            docs, "doc_id", "text", n=3,
        ).filter(F.col("jaccard") >= 0.8).collect()
    }
    assert lsh == exact


def test_stream_ivf_ingest_real_readstream(spark, tmp_path_factory):
    """Embeddings stream into the persisted IVF index one file per
    micro-batch; a planted scaled copy streamed in is immediately
    probe-visible, and a checkpoint-resumed second query replays
    nothing (version count stable)."""
    from spider_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
    )
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.vectors import stream_ivf_ingest

    root = tmp_path_factory.mktemp("ivf_stream")
    state, src, ckpt = str(root / "state"), str(root / "src"), str(root / "ck")
    tio = TableIO(state)
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 400)
    build_ivf_index(tio, "ivf", base, "vec_id", "embedding", k=4, iters=1)
    qvec = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    # two input files -> two micro-batches; the second plants a copy
    emb.filter(F.col("vec_id") >= 400).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(
        [(8_000_000, [x * 2.0 for x in qvec])],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_ivf_ingest(spark, src, state, "ivf", ckpt)
    assert q.awaitTermination(120), "availableNow drain timed out"
    rows = ivf_probe_index(spark, tio, "ivf", qvec, k=3, n_probe=2).collect()
    ids = [r["vec_id"] for r in rows]
    assert ids[0] == 7 and 8_000_000 in ids[:2], ids
    # resume with no new files: the checkpoint replays nothing
    v = tio.versions("ivf")[-1]
    q2 = stream_ivf_ingest(spark, src, state, "ivf", ckpt)
    assert q2.awaitTermination(120)
    assert tio.versions("ivf")[-1] == v
    # a missing index is refused up front
    with pytest.raises(ValueError, match="build_ivf_index"):
        stream_ivf_ingest(spark, src, state, "nope", str(root / "ck2"))


def test_canonical_corpus_keeps_one_per_cluster(spark, planted_docs):
    """End-to-end dedup materialization: verified near-dup pairs in,
    deduplicated corpus out — min doc_id per cluster survives, all
    columns intact, non-duplicated docs untouched."""
    from spider_engine_spark.operators.dedup import canonical_corpus

    sigs = minhash_signatures(planted_docs, "doc_id", "text", k=16, n=3)
    pairs = (
        jaccard_verify(
            minhash_lsh_pairs(sigs, "doc_id", bands=8),
            planted_docs, "doc_id", "text", n=3,
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("a", "b")
    )
    kept = canonical_corpus(planted_docs, pairs)
    ids = sorted(r.doc_id for r in kept.collect())
    # docs 0/1/2/5 form one near-dup cluster (>=0.5) -> keep 0 only;
    # 3 and 4 are unrelated singletons
    assert ids == [0, 3, 4]
    assert kept.columns == planted_docs.columns


def test_canonical_corpus_does_not_force_broadcast(spark):
    """At web-scale dup fractions (20-50%+ of the corpus) the drop-list
    is NOT broadcast-sized: the anti-join must carry no join-strategy
    hint, letting AQE pick broadcast only when the runtime stats say it
    fits.  Built at an artificially high dup fraction (80% of rows are
    duplicates) to make the assumption explicit."""
    from spider_engine_spark.operators.dedup import canonical_corpus

    # 100 docs in 10 clusters of 10 -> drop-list = 90 rows (90%)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    pairs = spark.range(100).select(
        ((F.col("id") / 10).cast("long") * 10).alias("a"),
        F.col("id").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    kept = canonical_corpus(docs, pairs)
    analyzed = kept._jdf.queryExecution().analyzed().toString()
    optimized = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    assert "hint" not in optimized.lower(), optimized
    assert sorted(r.doc_id for r in kept.collect()) == list(range(0, 100, 10))


# ---------------------------------------------------------------------------
# exact substring (n-token span) dedup — Lee et al. 2021 law
# ---------------------------------------------------------------------------


def _xs_reference(docs, n):
    """Pure-Python reference of the exact-substring law: occurrences of
    any >1-count n-gram are removed except the (key,pos)-min one."""
    toks = {k: (t.split() if t else []) for k, t in docs}
    occ = {}
    for k, t in sorted(toks.items()):
        for p in range(max(len(t) - n + 1, 0)):
            occ.setdefault(tuple(t[p: p + n]), []).append((k, p))
    removed = {}
    for g, lst in occ.items():
        if len(lst) > 1:
            for k, p in sorted(lst)[1:]:
                removed.setdefault(k, set()).update(range(p, p + n))
    out = {}
    for k, t in toks.items():
        keep = [w for i, w in enumerate(t) if i not in removed.get(k, ())]
        out[k] = (len(t), len(keep), " ".join(keep) if t else None)
    return out


def test_exact_substring_dedup_hand_computed(spark):
    from spider_engine_spark.operators.dedup import exact_substring_dedup

    docs = [
        (1, "a b c d e"),
        (2, "x a b c y"),        # shares "a b c" -> loses tokens 1..3
        (3, "p q p q p q"),      # intra-doc repeats dedup too
        (4, "u v"),              # < n tokens: untouched
        (5, None),               # null: untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_dedup)
        for r in exact_substring_dedup(df, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (5, 5, "a b c d e")
    assert got[2] == (5, 2, "x y")
    assert got[3] == (6, 2, "p q")
    assert got[4] == (2, 2, "u v")
    assert got[5] == (0, 0, None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="span length"):
        exact_substring_dedup(df, "doc_id", "text", n=1)


def test_exact_substring_dedup_matches_python_reference(spark):
    """Random corpus with planted copied spans vs the pure-Python law,
    plus determinism under repartition."""
    import random

    from spider_engine_spark.operators.dedup import exact_substring_dedup

    rng = random.Random(20260818)
    vocab = [f"w{i}" for i in range(12)]
    base = [
        (k, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for k in range(30)
    ]
    # plant copied spans: doc 30..34 embed doc k's middle into fresh text
    docs = list(base)
    for j in range(5):
        src = base[j][1].split()
        span = src[1: 1 + min(12, len(src) - 1)]
        filler = [rng.choice(vocab) for _ in range(5)]
        docs.append((30 + j, " ".join(filler + span + filler)))
    expect = _xs_reference(docs, n=6)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for d in (df, df.repartition(13)):
        got = {
            r.doc_id: (r.n_tokens, r.n_kept, r.text_dedup)
            for r in exact_substring_dedup(d, "doc_id", "text", n=6).collect()
        }
        assert got == expect


def test_exact_substring_dedup_validates_key_and_pos(spark):
    """A string key would make every packed id NULL and silently remove
    NOTHING (review finding) — must raise; a position overflowing
    pos_bits would corrupt the (key,pos) order — must raise per-row."""
    from pyspark.sql.utils import AnalysisException

    from spider_engine_spark.operators.dedup import exact_substring_dedup

    sdocs = spark.createDataFrame(
        [("d1", "a b c d e f g h a b c d e f g h")],
        "doc_id string, text string",
    )
    with pytest.raises(TypeError, match="numeric key"):
        exact_substring_dedup(sdocs, "doc_id", "text", n=3)
    ldocs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="pos_bits"):
        exact_substring_dedup(
            ldocs, "doc_id", "text", n=3, pos_bits=2
        ).collect()


def test_canonical_corpus_reliable_checkpoint_mode(spark, tmp_path):
    from spider_engine_spark.operators.dedup import canonical_corpus

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    pairs = spark.createDataFrame([(0, 5), (5, 10)], "a long, b long")
    kept = canonical_corpus(
        docs, pairs, checkpoint_dir=str(tmp_path / "cc")
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == sorted(set(range(20)) - {5, 10})


def test_semantic_dedup_pairs_and_keep_law(spark):
    """Hand-built clusters: two exact-dup groups on opposite axes +
    singletons. Pairs form only within clusters; the min key of each
    dup group survives; singletons always survive."""
    from spider_engine_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rows = [
        # group A: colinear with +x (pairwise cosine exactly 1.0)
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [0.5, 0.0, 0.0]),
        # group B: colinear with +y
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 4.0, 0.0]),
        # singletons: near +x / +y but below threshold, and +z
        (20, [1.0, 0.5, 0.0]),
        (21, [0.0, 1.0, 1.0]),
        (30, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    pairs = {
        (r["a"], r["b"])
        for r in semantic_dedup_pairs(
            df, "vec_id", "embedding", cents, threshold=0.99
        ).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3), (10, 11)}
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", cents, threshold=0.99
        ).collect()
    }
    assert kept == {1, 10, 20, 21, 30}


def test_semantic_dedup_max_cluster_excludes_oversized(spark):
    """A degenerate cluster above the cap is excluded from pairing
    (documented recall trade) — its members all survive."""
    from spider_engine_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rows = [(k, [1.0 * (k + 1), 0.0]) for k in range(5)] + [
        (10, [0.0, 1.0]),
        (11, [0.0, 2.0]),
    ]
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    pairs = semantic_dedup_pairs(
        df, "vec_id", "embedding", cents, threshold=0.99, max_cluster=3
    )
    assert {(r["a"], r["b"]) for r in pairs.collect()} == {(10, 11)}
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", cents, threshold=0.99, max_cluster=3
        ).collect()
    }
    assert kept == {0, 1, 2, 3, 4, 10}


def test_semantic_dedup_within_cluster_only(spark):
    """A high-cosine pair SPLIT across clusters is not paired — the
    within-cluster restriction is the SemDeDup contract (recall comes
    from fitting k to the data, not from cross-cluster search)."""
    from spider_engine_spark.operators.dedup import semantic_dedup_pairs

    # two near-identical vectors straddling the 45° bisector of the two
    # centroids: each assigns to a different centroid
    df = spark.createDataFrame(
        [(1, [1.0, 0.9, 0.0]), (2, [0.9, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    assert (
        semantic_dedup_pairs(
            df, "vec_id", "embedding", cents, threshold=0.9
        ).count()
        == 0
    )


def test_semantic_dedup_plan_shapes(spark):
    """The sizes guard joins <= k rows — must be a broadcast; the
    self-join must be an equi-join on the cluster id, never a
    nested-loop/cartesian all-pairs."""
    from spider_engine_spark.operators.dedup import semantic_dedup_pairs

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).selectExpr("vec_id", "embedding")
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    pairs = semantic_dedup_pairs(
        emb, "vec_id", "embedding", cents, threshold=0.95, max_cluster=100
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    try:
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the attached handle must be the frame that actually holds the
        # cache (under max_cluster the join+filter rebind used to leak)
        assert pairs._spider_assigned.storageLevel.useMemory
    finally:
        pairs._spider_assigned.unpersist()
        assert not pairs._spider_assigned.storageLevel.useMemory


def test_paragraph_dedup_first_occurrence_law(spark):
    """Cross-doc and intra-doc duplicated paragraphs survive only at
    the smallest (doc_id, pos); docs reassemble in original order; a
    fully-duplicated doc comes back empty."""
    from spider_engine_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (10, "alpha beta.\nshared boiler line.\ngamma delta."),
            # intra-doc repeat: pos 0 wins globally? no — (10,1) is
            # smaller; both of doc 11's copies lose
            (11, "shared boiler line.\nunique here.\nshared boiler line."),
            (12, "only unique content.\nshared boiler line."),
            (13, "shared boiler line."),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert rows[10]["text_deduped"] == (
        "alpha beta.\nshared boiler line.\ngamma delta."
    )
    assert rows[11]["text_deduped"] == "unique here."
    assert (rows[11]["n_lines"], rows[11]["n_kept"]) == (3, 1)
    assert rows[12]["text_deduped"] == "only unique content."
    assert rows[13]["text_deduped"] == "" and rows[13]["n_kept"] == 0


def test_paragraph_dedup_guards(spark):
    from spider_engine_spark.operators.dedup import paragraph_dedup
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    sdf = spark.createDataFrame(
        [("a", "x.\ny.")], "doc_id string, text string"
    )
    with _pt.raises(TypeError, match="numeric key"):
        paragraph_dedup(sdf, "doc_id", "text")

    # pos overflowing pos_bits must fail loudly, not corrupt the order
    big = spark.createDataFrame(
        [(1, "a.\nb.\nc.\nd."), (2, "b.\nz.")], "doc_id long, text string"
    )
    with _pt.raises((Py4JJavaError, SparkRuntimeException)):
        paragraph_dedup(big, "doc_id", "text", pos_bits=1).collect()


def test_paragraph_dedup_unique_corpus_is_identity(spark):
    from spider_engine_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "a b.\nc d."), (2, "e f.\ng h.")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
    assert rows[1]["text_deduped"] == "a b.\nc d."
    assert rows[2]["text_deduped"] == "e f.\ng h."


def test_paragraph_dedup_literal_sep_and_nulls(spark):
    """sep is literal (regex metachars must not regex-split); NULL
    content is zero paragraphs, never NULL outputs."""
    from spider_engine_spark.operators.dedup import paragraph_dedup
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, "a.b|c.d"), (2, None), (3, "a.b|x")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, "doc_id", "text", sep="|").collect()
    }
    # '|' as regex would split every char; literal law keeps 'a.b'/'c.d'
    assert (rows[1]["n_lines"], rows[1]["text_deduped"]) == (2, "a.b|c.d")
    assert rows[3]["text_deduped"] == "x"  # a.b deduped vs doc 1
    assert (rows[2]["n_lines"], rows[2]["n_kept"], rows[2]["text_deduped"]) == (
        0,
        0,
        "",
    )
    with _pt.raises(ValueError, match="sep"):
        paragraph_dedup(df, "doc_id", "text", sep="x\\Ey")


def test_paragraph_dedup_key_magnitude_guard(spark):
    """key*2^pos_bits overflowing BIGINT must raise the documented
    guard, not wrap/ANSI-crash into a corrupted first-occurrence."""
    from spider_engine_spark.operators.dedup import paragraph_dedup
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    import pytest as _pt

    big = spark.createDataFrame(
        [(1 << 50, "a.\nb."), (7, "b.\nz.")], "doc_id long, text string"
    )
    with _pt.raises((Py4JJavaError, SparkRuntimeException), match="packed-BIGINT"):
        paragraph_dedup(big, "doc_id", "text").collect()


def test_exact_substring_dedup_boilerplate_doc_linear(spark):
    """The interval-merge rebuild (round-7): a fully-boilerplate long doc
    — every window duplicated, the O(L²/n) worst case of the former
    per-token × per-start mask — must (a) still match the pure-Python
    law on a small instance covering the merge edge cases (overlapping,
    adjacent-touching, and disjoint removal intervals) and (b) complete
    fast on a large one (~30k tokens ≈ 10^9 mask ops under the old
    shape; linear here)."""
    import time

    from spider_engine_spark.operators.dedup import exact_substring_dedup

    # (a) edge-case corpus: doc 2 is pure boilerplate of doc 1's grams;
    # doc 3 has two disjoint copied spans with a surviving gap between,
    # doc 4 an adjacent-touching pair of removal intervals
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j a b c d e f g h i j"),
        (3, "a b c d zz1 zz2 zz3 e f g h"),
        (4, "b c d e f g h i"),
    ]
    expect = _xs_reference(docs, n=4)
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_dedup)
        for r in exact_substring_dedup(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id", "text", n=4,
        ).collect()
    }
    assert got == expect

    # (b) two large identical boilerplate docs: every window duplicated
    big = " ".join(f"t{i % 7}" for i in range(30_000))
    bdf = spark.createDataFrame(
        [(1, big), (2, big)], "doc_id long, text string"
    )
    t0 = time.monotonic()
    rows = {
        r.doc_id: (r.n_tokens, r.n_kept)
        for r in exact_substring_dedup(bdf, "doc_id", "text", n=8).collect()
    }
    elapsed = time.monotonic() - t0
    # doc 1 keeps only the first window's coverage complement: its own
    # intra-doc repeats dedup too (period-7 text means every window
    # recurs); doc 2 loses everything
    assert rows[2] == (30_000, 0)
    assert rows[1][0] == 30_000 and rows[1][1] < 30
    assert elapsed < 60, f"boilerplate rebuild took {elapsed:.1f}s"
