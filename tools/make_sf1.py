"""Synthesize an sf1-equivalent dataset (VERDICT r6 #4) so the scaling
probe gets a third decade: 10 key-shifted replicas of sf0.1, written to
.scratch/sf1 (gitignored, regenerable).

Weak-scaling construction — data volume grows 10x while per-entity
density stays constant, so a growth factor >> 10 in the probe indicts
the IMPLEMENTATION, not the synthetic data:
* keyed tables replicate with key offsets (disjoint id spaces);
* document text gets a per-replica word-suffix rewrite (disjoint
  shingle spaces — otherwise every doc would have 9 exact cross-replica
  near-dups and the pair count would grow 45x by construction);
* embeddings circular-shift by the replica index (intra-replica cosine
  structure identical, cross-replica pairs decorrelated);
* region/nation stay single copies (enum-sized dims).

DuckDB does the rewrite (no Spark session needed). ~170 MB output.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
R = 10


def off(con, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]
    o = 1
    while o <= mx:
        o *= 10
    return o


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def rep(table: str, select_i: str) -> None:
        sql = " UNION ALL ".join(
            f"SELECT {select_i.format(i=i)} FROM read_parquet('{SRC}/{table}.parquet')"
            for i in range(R)
        )
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: done", file=sys.stderr)

    e_ev = off(con, "events", "event_id")
    e_us = off(con, "events", "user_id")
    rep(
        "events",
        "event_id + {i} * " + str(e_ev) + " AS event_id, ts, "
        "user_id + {i} * " + str(e_us) + " AS user_id, event_type, value, props",
    )

    d_doc = off(con, "documents", "doc_id")
    rep(
        "documents",
        "doc_id + {i} * " + str(d_doc) + " AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1~{i}', 'g') END AS text, "
        "lang, source, "
        "length(CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1~{i}', 'g') END) AS n_chars",
    )

    v_id = off(con, "embeddings", "vec_id")
    rep(
        "embeddings",
        "vec_id + {i} * " + str(v_id) + " AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding ELSE "
        "list_concat(embedding[{i}+1:], embedding[1:{i}]) END AS embedding, "
        "label",
    )

    o_ord = off(con, "orders", "o_orderkey")
    o_cus = off(con, "orders", "o_custkey")
    rep(
        "orders",
        "o_orderkey + {i} * " + str(o_ord) + " AS o_orderkey, "
        "o_custkey + {i} * " + str(o_cus) + " AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )

    l_prt = off(con, "lineitem", "l_partkey")
    l_sup = off(con, "lineitem", "l_suppkey")
    rep(
        "lineitem",
        "l_orderkey + {i} * " + str(o_ord) + " AS l_orderkey, "
        "l_partkey + {i} * " + str(l_prt) + " AS l_partkey, "
        "l_suppkey + {i} * " + str(l_sup) + " AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )

    rep(
        "customer",
        "c_custkey + {i} * " + str(o_cus) + " AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
    )
    rep(
        "part",
        "p_partkey + {i} * " + str(l_prt) + " AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice",
    )
    rep(
        "supplier",
        "s_suppkey + {i} * " + str(l_sup) + " AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal",
    )
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: done (single copy)", file=sys.stderr)

    for t in (
        "events documents embeddings orders lineitem customer part supplier "
        "region nation"
    ).split():
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
