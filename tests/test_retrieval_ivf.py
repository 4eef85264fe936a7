"""IVF-with-k-means has no SQL oracle (iterative, float-mean
order-sensitive), so its behavior is pinned here against brute force."""

from __future__ import annotations

from gpt4ocontentextraction_spark.operators.retrieval import (
    cosine_topk,
    ivf_kmeans_topk,
)

SF = "/root/testdata/sf0.001"


def test_ivf_kmeans_topk_matches_bruteforce_head(spark):
    ivf = ivf_kmeans_topk(spark, SF, k=5).collect()
    assert len(ivf) == 5
    # the query vector itself lives in a probed bucket -> sim 1.0 first
    assert ivf[0]["vec_id"] == 0 and ivf[0]["sim"] == 1.0
    # descending sims, unique ids
    sims = [r["sim"] for r in ivf]
    assert sims == sorted(sims, reverse=True)
    assert len({r["vec_id"] for r in ivf}) == 5
    # approximate recall: with 2 of 8 buckets probed on random vectors,
    # the true top-5 is spread across buckets — require the head overlap
    brute = {r["vec_id"] for r in cosine_topk(spark, SF, k=5).collect()}
    overlap = brute & {r["vec_id"] for r in ivf}
    assert 0 in overlap and len(overlap) >= 1


def test_ivf_kmeans_deterministic_across_runs(spark):
    a = [tuple(r) for r in ivf_kmeans_topk(spark, SF, k=5).collect()]
    b = [tuple(r) for r in ivf_kmeans_topk(spark, SF, k=5).collect()]
    assert a == b


def test_ivf_kmeans_partitioning_independent(spark):
    """The decimal-sum Lloyd update must make the fitted centroids (and
    the golden-gate result) independent of how the aggregation shuffles."""
    a = [tuple(r) for r in ivf_kmeans_topk(spark, SF, k=5).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in ivf_kmeans_topk(spark, SF, k=5).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_ivf_kmeans_matches_golden_gate_rows(spark):
    import duckdb

    from gpt4ocontentextraction_spark.operators.retrieval import (
        IVF_KMEANS_GOLD_SQL,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{SF}/embeddings.parquet')"
    )
    gold = sorted(tuple(r) for r in con.execute(IVF_KMEANS_GOLD_SQL).fetchall())
    got = sorted(tuple(r) for r in ivf_kmeans_topk(spark, SF, k=5).collect())
    assert got == gold


def test_ivf_assignment_plan_has_no_exchange(spark):
    """VERDICT r2 finding #3: bucket assignment must be a projection, not
    crossJoin x K + window — the whole ivf_topk plan carries no Exchange,
    no Window, no Join."""
    from gpt4ocontentextraction_spark.operators.retrieval import ivf_topk
    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    p = physical_plan(ivf_topk(spark, SF))
    assert "Exchange" not in p and "Window" not in p and "Join" not in p


def test_large_k_assignment_udf_path(spark):
    """VERDICT r3 finding #3: above the literal budget the assignment
    switches to the broadcast-matrix pandas-UDF argmax. At K=64 forced
    through the UDF path (budget=0) the buckets match the literal form
    row-for-row on the real embeddings table, and the plan is still a
    pure projection — ArrowEvalPython, zero Exchange/Join/Window."""
    from pyspark.sql import functions as F

    from gpt4ocontentextraction_spark.operators.retrieval import (
        _assign_bucket,
        _emb,
    )
    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    emb = _emb(spark, SF)
    cent_list = [
        (r["cid"], [float(x) for x in r["cv"]])
        for r in emb.filter(F.col("vec_id") < 64)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .collect()
    ]
    assert len(cent_list) == 64

    def assigned(budget):
        col = _assign_bucket(
            F.col("embedding"), cent_list, "float", literal_budget=budget
        )
        df = emb.select("vec_id", col.cast("long").alias("bucket"))
        return df, {r["vec_id"]: r["bucket"] for r in df.collect()}

    df_udf, via_udf = assigned(0)  # force the pandas-UDF path
    _, via_lit = assigned(10**9)  # force the literal path
    assert via_udf == via_lit
    p = physical_plan(df_udf)
    assert "ArrowEvalPython" in p
    assert "Exchange" not in p and "Window" not in p and "Join" not in p


def test_large_k_natural_dispatch_end_to_end(spark):
    """VERDICT r4 item 7: exercise the large-K arm END-TO-END at a K
    where the DEFAULT dispatch (no forced budget) exceeds the literal
    budget — K=1600 x 64-dim = 102,400 literals > 100,000 — so
    _assign_bucket routes to the broadcast-matrix pandas argmax on its
    own. Asserts the full bucket-restricted top-k runs, the plan before
    assignment is a pure projection (ArrowEvalPython, zero
    Exchange/Join/Window), and the tracked centroid broadcast is
    actually held and then released (cache hygiene extends to the
    large-K arm)."""
    from pyspark.sql import functions as F

    from gpt4ocontentextraction_spark import cached
    from gpt4ocontentextraction_spark.operators.retrieval import (
        IVF_LITERAL_BUDGET,
        _assign_bucket,
        _cos_col,
        _emb,
    )
    from gpt4ocontentextraction_spark.plans.inspect import physical_plan

    sf01 = "/root/testdata/sf0.1"
    emb = _emb(spark, sf01)
    K = 1600
    cent_list = [
        (r["cid"], [float(x) for x in r["cv"]])
        for r in emb.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .collect()
    ]
    assert len(cent_list) == K
    assert sum(len(cv) for _, cv in cent_list) > IVF_LITERAL_BUDGET
    cached.release_all()  # isolate this query's tracked entries
    # baseline persists this test does NOT own (another module's fixture
    # cache in the shared session) — assert against the delta, not zero
    n0 = cached.n_persistent(spark)

    bucket = _assign_bucket(F.col("embedding"), cent_list, "float")
    assigned = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        bucket.cast("long").alias("bucket"),
    )
    p = physical_plan(assigned)
    assert "ArrowEvalPython" in p  # the pandas arm, chosen by dispatch
    assert "Exchange" not in p and "Window" not in p and "Join" not in p

    qrow = (
        emb.filter(F.col("vec_id") == 0)
        .select(bucket.alias("qbucket"), "embedding")
        .collect()[0]
    )
    qv = F.array(*[F.lit(float(x)) for x in qrow["embedding"]]).cast(
        "array<float>"
    )
    top = (
        emb.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            bucket.cast("long").alias("bucket"),
            F.round(_cos_col(F.col("embedding"), qv), 6).alias("sim"),
        )
        .filter(F.col("bucket") == int(qrow["qbucket"]))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert len(top) >= 1
    assert top[0]["vec_id"] == 0 and top[0]["sim"] == 1.0
    # the dispatch created >= 1 tracked broadcast per _assign_bucket
    # call; release_all must find and release them, leaving nothing
    assert cached.release_all() >= 1
    assert cached.n_persistent(spark) <= n0  # this test left nothing


def test_ivf_null_query_embedding_returns_empty(spark, tmp_path):
    """Code-review r5 #2: a NULL query embedding has a NULL bucket —
    nothing to probe. Both IVF arms must return an empty relation (the
    defined unknown-query shape) instead of a driver TypeError when
    iterating the None vector."""
    from gpt4ocontentextraction_spark.operators.retrieval import (
        ivf_kmeans_topk,
        ivf_topk,
    )

    sf = str(tmp_path)
    rows = [
        (i, [1.0 / (i + 1), 0.5, 0.0, 1.0], i % 2) for i in range(12)
    ] + [(12, None, 0)]  # vec 12: NULL embedding, not a centroid
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    for fn in (ivf_topk, ivf_kmeans_topk):
        got = fn(spark, sf, query_id=12).collect()
        assert got == [], fn.__name__
