"""Cluster-aware train/val/test split — leakage invariants checked
against an independent THIRD engine: a pure-Python (hashlib)
recomputation of the portable md5 hash family on a synthetic corpus
of known near-dup clone pairs (the DuckDB oracle already replays the
full LSH + closure; this pins the split semantics themselves)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from auto_trade_data_pipeline_spark.corpus import load_all

N_GROUPS = 30
N_SINGLETONS = 20


def _bucket(x: int) -> int:
    return int(hashlib.md5(f"split|{x}".encode()).hexdigest()[:15], 16) % 100


def _name(b: int) -> str:
    return "train" if b < 80 else ("val" if b < 90 else "test")


def _write_docs(tmp_path) -> str:
    """One clone PAIR per group (identical text -> certain LSH pair),
    word-disjoint across groups and singletons (zero shared 3-gram
    shingles -> no cross-group pairs survive the Jaccard verify)."""
    ids, texts = [], []
    for g in range(N_GROUPS):
        t = " ".join(f"g{g}w{k}" for k in range(12))
        ids += [g, 1000 + g]
        texts += [t, t]
    for i in range(N_SINGLETONS):
        ids.append(2000 + i)
        texts.append(" ".join(f"s{i}w{k}" for k in range(12)))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["srcA"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cluster_split_matches_python_recomputation(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    rows = {
        r["split"]: r
        for r in load_all()["cluster_aware_split"].fn(spark, sf_dir).collect()
    }

    # Independent expectation: clones split by the CLUSTER id (the
    # min doc_id = g), singletons by their own id.
    n_docs: dict[str, int] = {}
    clusters: dict[str, set[int]] = {}
    leak_naive: dict[str, int] = {}
    for g in range(N_GROUPS):
        s = _name(_bucket(g))
        n_docs[s] = n_docs.get(s, 0) + 2
        clusters.setdefault(s, set()).add(g)
        na, nb = _name(_bucket(g)), _name(_bucket(1000 + g))
        if na != nb:  # pair attributed to id_a's naive split
            leak_naive[na] = leak_naive.get(na, 0) + 1
    for i in range(N_SINGLETONS):
        s = _name(_bucket(2000 + i))
        n_docs[s] = n_docs.get(s, 0) + 1
        clusters.setdefault(s, set()).add(2000 + i)

    assert set(rows) == set(n_docs)
    for s, r in rows.items():
        assert r["n_docs"] == n_docs[s], s
        assert r["n_clusters"] == len(clusters[s]), s
        assert r["leaked_pairs_naive"] == leak_naive.get(s, 0), s
        # The whole point: cluster-keyed assignment cannot leak.
        assert r["leaked_pairs_cluster"] == 0, s
    # The synthetic corpus must actually demonstrate the naive leak.
    assert sum(leak_naive.values()) > 0
