"""Synthesize a weak-scaled replica decade for the scaling probe
(VERDICT r6 #4, generalized for the sf10 fifth decade in VERDICT r9 #1):
10 key-shifted replicas of SRC written to OUT (gitignored, regenerable).

Weak-scaling construction — data volume grows 10x while per-entity
density stays constant, so a growth factor >> 10 in the probe indicts
the IMPLEMENTATION, not the synthetic data:
* keyed tables replicate with key offsets (disjoint id spaces);
* document text gets a per-replica word-suffix rewrite (disjoint
  shingle spaces — otherwise every doc would have 9 exact cross-replica
  near-dups and the pair count would grow 45x by construction);
* embeddings are decorrelated per replica, two modes:
  - ``shift`` (the sf1 default): circular-shift by the replica index —
    intra-replica cosine structure identical, cross-replica pairs
    decorrelated. ONLY valid for ONE level: composing shifts collides
    mod dim (level-2 total shifts 0..99 wrap at dim=64, which would
    manufacture cosine-1.0 cross-replica pairs).
  - ``signmask``: multiply dimension p by ±1 from md5 parity of
    (replica, p). Signs cancel within a replica (s_p² = 1 ⇒ intra
    cosines EXACTLY preserved) while cross-replica cosines become
    random ±small sums — the correct second-level transform.
* region/nation stay single copies (enum-sized dims).

DuckDB does the rewrite (no Spark session needed). sf1 ≈ 170 MB;
sf10 ≈ 1.7 GB.

Usage:
    python tools/make_sf1.py                  # sf0.1 -> .scratch/sf1
    python tools/make_sf1.py .scratch/sf1 .scratch/sf10 \
        --embedding-mode signmask --suffix-sep '='   # sf1 -> sf10
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "out", nargs="?", default=os.path.join(_REPO, ".scratch", "sf1")
    )
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--embedding-mode", choices=("shift", "signmask"), default="shift"
    )
    ap.add_argument(
        "--suffix-sep",
        default="~",
        help="token-suffix separator for the document rewrite; use a "
        "DIFFERENT one per stacking level so shingle spaces stay "
        "disjoint across levels",
    )
    return ap.parse_args()


def off(con, src: str, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT MAX({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    o = 1
    while o <= mx:
        o *= 10
    return o


def _signmask_expr(i: int, dim: int) -> str:
    """Literal ±1-masked rebuild of the embedding list for replica i
    (md5 parity per (i, pos) — deterministic, no correlated subquery)."""
    terms = []
    for p in range(dim):
        h = hashlib.md5(f"sm:{i}:{p}".encode()).hexdigest()[0]
        sign = 1 if int(h, 16) % 2 == 0 else -1
        terms.append(
            f"CAST(embedding[{p + 1}]{' * -1' if sign < 0 else ''} AS FLOAT)"
        )
    return "list_value(" + ", ".join(terms) + ")"


def main() -> None:
    a = _args()
    src, out, r = a.src, a.out, a.replicas
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def rep(table: str, select_i) -> None:
        sql = " UNION ALL ".join(
            f"SELECT {select_i.format(i=i) if isinstance(select_i, str) else select_i(i)}"
            f" FROM read_parquet('{src}/{table}.parquet')"
            for i in range(r)
        )
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: done", file=sys.stderr)

    e_ev = off(con, src, "events", "event_id")
    e_us = off(con, src, "events", "user_id")
    rep(
        "events",
        "event_id + {i} * " + str(e_ev) + " AS event_id, ts, "
        "user_id + {i} * " + str(e_us) + " AS user_id, event_type, value, props",
    )

    d_doc = off(con, src, "documents", "doc_id")
    sep = a.suffix_sep
    rep(
        "documents",
        "doc_id + {i} * " + str(d_doc) + " AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1" + sep + "{i}', 'g') END AS text, "
        "lang, source, "
        "length(CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1" + sep + "{i}', 'g') END) AS n_chars",
    )

    v_id = off(con, src, "embeddings", "vec_id")
    if a.embedding_mode == "shift":
        emb_expr = (
            "CASE WHEN {i} = 0 THEN embedding ELSE "
            "list_concat(embedding[{i}+1:], embedding[1:{i}]) END"
        )
        rep(
            "embeddings",
            "vec_id + {i} * " + str(v_id) + " AS vec_id, "
            + emb_expr
            + " AS embedding, label",
        )
    else:
        dim = con.execute(
            f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet') LIMIT 1"
        ).fetchone()[0]

        def emb_select(i: int) -> str:
            e = "embedding" if i == 0 else _signmask_expr(i, dim)
            return (
                f"vec_id + {i} * {v_id} AS vec_id, {e} AS embedding, label"
            )

        rep("embeddings", emb_select)

    o_ord = off(con, src, "orders", "o_orderkey")
    o_cus = off(con, src, "orders", "o_custkey")
    rep(
        "orders",
        "o_orderkey + {i} * " + str(o_ord) + " AS o_orderkey, "
        "o_custkey + {i} * " + str(o_cus) + " AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )

    l_prt = off(con, src, "lineitem", "l_partkey")
    l_sup = off(con, src, "lineitem", "l_suppkey")
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
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: done (single copy)", file=sys.stderr)

    for t in (
        "events documents embeddings orders lineitem customer part supplier "
        "region nation"
    ).split():
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
