"""Profiling / integrity / HLL / fuzzy-join / PageRank operator tests.

Each operator's oracle parity runs in tools/verify_oracle.py; here we pin
the engine-independent invariants: lossless fuzzy blocking vs a brute
force, PageRank vs a pure-Python reference, HLL error bound + partition
invariance, orphan detection on injected bad data, and zlib equality.
"""

from __future__ import annotations

import zlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from jetstream_spark.queries.profiling import (
    COMPRESS_LEVEL,
    FUZZY_D,
    PR_DAMP,
    PR_ROUNDS,
    _copurchase_edges,
    fk_audit,
    q_compression_ratio,
    q_fuzzy_join_names,
    q_hll_distinct,
    q_pagerank_copurchase,
    q_profile_columns,
    q_quantile_norm,
)
from jetstream_spark.tables import table
from tests.conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_equals_brute_force(spark):
    """The two-band candidate generation (q-gram for long strings,
    length-band for short) must be lossless: the verified result equals
    an all-pairs brute force over the distinct names."""
    names = [
        r["p_name"]
        for r in table(spark, SF_DIR, "part").select("p_name").distinct().collect()
    ]
    expect = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            d = _lev(a, b)
            if d <= FUZZY_D:
                expect.add((min(a, b), max(a, b), d))
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in q_fuzzy_join_names(spark, SF_DIR).collect()
    }
    assert got == expect
    assert expect, "fixture must contain near-duplicate names"


def test_pagerank_matches_python_reference(spark):
    edges = [
        (r["s"], r["t"])
        for r in _copurchase_edges(table(spark, SF_DIR, "lineitem")).collect()
    ]
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    outd: dict[int, int] = {}
    inc: dict[int, list[int]] = {t: [] for t in nodes}
    for s, t in edges:
        outd[s] = outd.get(s, 0) + 1
        inc[t].append(s)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(PR_ROUNDS):
        rank = {
            v: (1.0 - PR_DAMP) / n + PR_DAMP * sum(rank[s] / outd[s] for s in inc[v])
            for v in nodes
        }
    got = {r["part_key"]: r["pagerank"] for r in q_pagerank_copurchase(spark, SF_DIR).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) <= 2e-9, v
    # rank mass conservation (symmetric graph, no dangling): sums to ~1
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_hll_error_bound_and_partition_invariance(spark):
    rows = q_hll_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # theoretical std error 1.04/sqrt(64) ~= 13%; allow 3 sigma
        assert abs(r["rel_err_pct"]) < 40.0, r
    # integer-scaled register sums: estimate is partition-invariant
    import jetstream_spark.queries.profiling as P

    one = q_hll_distinct(spark, SF_DIR).orderBy("event_type").collect()
    orig_table = P.table
    try:
        P.table = lambda s, d, name: orig_table(s, d, name).repartition(13)
        two = q_hll_distinct(spark, SF_DIR).orderBy("event_type").collect()
    finally:
        P.table = orig_table
    assert [tuple(r) for r in one] == [tuple(r) for r in two]


def test_fk_audit_detects_injected_orphans(spark):
    frames = {
        t: table(spark, SF_DIR, t)
        for t in ("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
    }
    clean = {r["relation"]: r for r in fk_audit(frames).collect()}
    assert all(r["orphan_rows"] == 0 for r in clean.values())
    # inject two lineitem rows pointing at a nonexistent order
    bad = frames["lineitem"].limit(2).withColumn("l_orderkey", F.lit(-999_999))
    frames["lineitem"] = frames["lineitem"].unionByName(bad)
    dirty = {r["relation"]: r for r in fk_audit(frames).collect()}
    edge = "lineitem.l_orderkey->orders.o_orderkey"
    assert dirty[edge]["orphan_rows"] == 2
    assert dirty[edge]["child_rows"] == clean[edge]["child_rows"] + 2
    # untouched edges stay clean
    assert dirty["orders.o_custkey->customer.c_custkey"]["orphan_rows"] == 0


def test_compression_ratio_matches_zlib(spark):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    expect = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        b = text.encode("utf-8")
        expect[doc_id] = (len(b), round(len(zlib.compress(b, COMPRESS_LEVEL)) / len(b), 6) if b else 1.0)
    got = q_compression_ratio(spark, SF_DIR).collect()
    assert len(got) == len(expect)
    for r in got:
        nb, ratio = expect[r["doc_id"]]
        assert r["n_bytes"] == nb
        assert abs(r["comp_ratio"] - ratio) < 1e-9
    # ratios are positive; the bulk of real prose lands under 1.0 (tiny
    # docs can exceed 1 — zlib header overhead dominates a few bytes)
    ratios = [r["comp_ratio"] for r in got]
    assert all(x > 0 for x in ratios)
    assert sum(x < 1.0 for x in ratios) > len(ratios) * 0.5


def test_profile_columns_matches_pyarrow(spark):
    got = {r["column_name"]: r for r in q_profile_columns(spark, SF_DIR).collect()}
    t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    assert all(r["n_rows"] == t.num_rows for r in got.values())
    for c in ("l_orderkey", "l_returnflag", "l_shipdate"):
        col = t.column(c)
        assert got[c]["n_nulls"] == col.null_count
        assert got[c]["n_distinct"] == len(col.combine_chunks().unique())


def test_quantile_norm_invariants(spark):
    rows = q_quantile_norm(spark, SF_DIR).orderBy("n_tokens", "doc_id").collect()
    lo_w = min(r["winsorized"] for r in rows)
    hi_w = max(r["winsorized"] for r in rows)
    raw_lo = min(r["n_tokens"] for r in rows)
    raw_hi = max(r["n_tokens"] for r in rows)
    # winsorization clamps the tails strictly inside the raw range
    assert raw_lo < lo_w <= hi_w < raw_hi
    pcts = [r["pct_rank"] for r in rows]
    assert pcts == sorted(pcts)
    assert pcts[0] == 0.0 and pcts[-1] == 1.0


def test_hll_small_range_correction_branch(spark, tmp_path):
    """A tiny key set forces the linear-counting branch (raw estimate <=
    2.5m with zero registers present); pin it against a pure-Python
    replication of the same md5 register arithmetic."""
    import hashlib
    import math

    from jetstream_spark.queries.profiling import HLL_M, _HLL_ALPHA, q_hll_distinct

    rows = [(i, "2024-03-01 10:00:00", i % 7, "click", 1.0, "{}") for i in range(200)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value", "props")
    d = tmp_path / "tiny"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))

    regs = {}
    for u in {r[2] for r in rows}:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        b, w = h & (HLL_M - 1), h >> 6
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    zint = sum(1 << (55 - m) for m in regs.values()) + (HLL_M - len(regs)) * (1 << 55)
    zeros = HLL_M - len(regs)
    raw = _HLL_ALPHA * HLL_M * HLL_M * float(2**55) / zint
    assert raw <= 2.5 * HLL_M and zeros > 0, "fixture must hit the correction branch"
    expect = round(HLL_M * math.log(HLL_M / zeros), 2)

    got = q_hll_distinct(spark, str(d)).collect()
    assert len(got) == 1
    assert got[0]["exact_distinct"] == 7
    assert abs(got[0]["hll_estimate"] - expect) <= 0.01


def test_profile_histogram_conservation(spark):
    from jetstream_spark.queries.profiling import HIST_BINS, q_profile_histogram

    rows = q_profile_histogram(spark, SF_DIR).collect()
    t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    per = {}
    for r in rows:
        assert 1 <= r["bin"] <= HIST_BINS + 1
        per[r["column_name"]] = per.get(r["column_name"], 0) + r["n"]
    # every row lands in exactly one bin
    assert set(per.values()) == {t.num_rows}
    # the max-boundary bucket (bin n+1) holds exactly the max-valued rows
    import pyarrow.compute as pc

    got_top = {r["column_name"]: r["n"] for r in rows if r["bin"] == HIST_BINS + 1}
    for c, n_top in got_top.items():
        col = t.column(c)
        mx = pc.max(col).as_py()
        assert n_top == pc.sum(pc.equal(col, mx)).as_py(), c


def test_profile_skew_matches_pyarrow(spark):
    from collections import Counter

    from jetstream_spark.queries.profiling import _SKEW_KEYS, q_profile_skew

    got = {r["key_column"]: r for r in q_profile_skew(spark, SF_DIR).collect()}
    t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    assert set(got) == set(_SKEW_KEYS)
    for c in _SKEW_KEYS:
        freq = Counter(t.column(c).to_pylist())
        assert got[c]["distinct_keys"] == len(freq)
        assert abs(got[c]["top_key_share"] - max(freq.values()) / t.num_rows) <= 1e-6
        assert got[c]["p99_over_avg"] > 0


def test_triangle_count_matches_python(spark):
    """Exact triangle/wedge counts vs a pure-Python recount on the
    collected edge set."""
    from itertools import combinations

    from jetstream_spark.queries.profiling import _copurchase_edges, q_triangle_count

    edges = {
        (r["s"], r["t"])
        for r in _copurchase_edges(table(spark, SF_DIR, "lineitem")).collect()
        if r["s"] < r["t"]
    }
    adj: dict[int, set] = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    tri = sum(
        1
        for s, t in edges
        for u in adj[s] & adj[t]
        if u > t  # s < t < u counts each triangle once
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    r = q_triangle_count(spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == len(adj)
    assert r["n_edges"] == len(edges)
    assert r["n_triangles"] == tri
    assert r["n_wedges"] == wedges
    assert abs(r["clustering_coeff"] - 3 * tri / wedges) <= 1e-6
    assert tri > 0


def test_degree_profile_conservation(spark):
    from jetstream_spark.queries.profiling import _copurchase_edges, q_degree_profile

    edges = [
        (r["s"], r["t"])
        for r in _copurchase_edges(table(spark, SF_DIR, "lineitem")).collect()
        if r["s"] < r["t"]
    ]
    deg: dict[int, int] = {}
    for s, t in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[t] = deg.get(t, 0) + 1
    rows = q_degree_profile(spark, SF_DIR).collect()
    assert sum(r["n_nodes"] for r in rows) == len(deg)
    assert max(r["max_degree"] for r in rows) == max(deg.values())
    for r in rows:  # bucket bounds actually bracket their members
        assert 2 ** r["log2_degree"] <= r["min_degree"] <= r["max_degree"] < 2 ** (r["log2_degree"] + 1)


def test_degree_orientation_bounds_hub_two_paths(spark):
    """The r5 refinement: orienting edges by (degree, id) instead of id
    must (a) preserve the exact triangle count and (b) collapse the
    2-path intermediate volume on a hub-skewed graph. Fixture: a star
    whose hub id sits in the MIDDLE of its spoke ids (the id-ordering
    worst case: in-edges x out-edges through the hub), plus one triangle."""
    from pyspark.sql import functions as F

    from jetstream_spark.queries.profiling import _degree_oriented

    hub, spokes = 50, [i for i in range(1, 101) if i != 50]
    pairs = [(min(i, hub), max(i, hub)) for i in spokes] + [(1, 2)]
    e = spark.createDataFrame(pairs, "s bigint, t bigint").localCheckpoint()
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("t").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )

    def two_paths(edges) -> int:
        e1, e2 = edges.alias("e1"), edges.alias("e2")
        return e1.join(e2, F.col("e2.s") == F.col("e1.t")).count()

    def triangles(edges) -> int:
        e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
        return (
            e1.join(e2, F.col("e2.s") == F.col("e1.t"))
            .join(e3, (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.t") == F.col("e2.t")))
            .count()
        )

    oriented = _degree_oriented(e, deg).localCheckpoint()
    # bijection on the edge set
    assert oriented.count() == e.count()
    assert (
        oriented.select(F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b"))
        .exceptAll(e.select(F.col("s").alias("a"), F.col("t").alias("b")))
        .isEmpty()
    )
    # id-ordering routes in_edges x out_edges 2-paths through the hub
    # (49 x 50 pairs); degree-ordering points every spoke edge INTO the
    # hub, so only the 1-2 triangle edge can start a 2-path
    assert two_paths(e) >= 49 * 50
    assert two_paths(oriented) <= 4
    # and the triangle count is identical either way
    assert triangles(e) == triangles(oriented) == 1
