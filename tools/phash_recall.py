"""pHash banded-recall measurement (VERDICT r11 #1).

The aHash discipline, applied to pHash: compute EXACT per-Hamming
true-pair counts from the full 64-bit signatures (all-pairs over
UNIQUE signatures with multiplicity weights — signature duplication
makes this affordable even at sf10), then run the banded operator at
the wide-tier band width and report per-Hamming recall — the number
the 16-bit tier never had while ``PHASH_MAX_HAMMING = 10`` exceeded
its pigeonhole guarantee (4 bands ⇒ Hamming ≤ 3 only).

Usage:
    python tools/phash_recall.py [--sf DIR] [--band-bits 16]
        [--variants plain,multiprobe] [--max-hamming 10]

Output: one JSON line
    {"n_media": n, "n_unique_sigs": u, "true": {d: pairs},
     "variants": {name: {"found": {d: pairs}, "recall": {d: r},
                          "sec": t}}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logistics_data_pipeline_spark.adapters.testdata import load_table  # noqa: E402
from logistics_data_pipeline_spark.llm import multimodal as mm  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402

_POP16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 via four 16-bit LUT lookups
    (numpy 1.26 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=False)
    out = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for shift in (16, 32, 48):
        out += _POP16[
            ((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)
        ]
    return out


def exact_hamming_hist_fast(
    lo: np.ndarray, hi: np.ndarray, max_hamming: int, chunk: int = 512
) -> dict[int, int]:
    """EXACT per-Hamming true-pair counts over all C(n,2) pairs in
    O(u²) where u = #unique signatures: identical signatures group
    (d=0 pairs = ΣC(c,2)), cross-pairs weight by count products; a
    chunk of unique signatures broadcasts against the tail in one 2-D
    xor (no per-row Python loop)."""
    sig = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    uniq, counts = np.unique(sig, return_counts=True)
    u = len(uniq)
    c64 = counts.astype(np.int64)
    hist = np.zeros(max_hamming + 1, dtype=np.int64)
    hist[0] = int((c64 * (c64 - 1) // 2).sum())
    for start in range(0, u - 1, chunk):
        stop = min(start + chunk, u - 1)
        block = uniq[start:stop][:, None]  # (b, 1)
        tail = uniq[start + 1 :][None, :]  # (1, t)
        d = _popcount64((block ^ tail).ravel()).reshape(stop - start, -1)
        # mask the lower-left triangle (j <= i): for row gi = start+bi,
        # valid tail cols are those with global j > gi, i.e. col >= bi+1
        wb = c64[start:stop][:, None] * c64[start + 1 :][None, :]
        col = np.arange(d.shape[1])[None, :]
        valid = col >= np.arange(stop - start)[:, None]
        for dd in range(1, max_hamming + 1):
            hist[dd] += int(wb[valid & (d == dd)].sum())
    return {d: int(hist[d]) for d in range(max_hamming + 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--band-bits", type=int, default=16)
    # comma-separated band widths to run the (post-redesign, exact)
    # banded operator at; each should report recall 1.0 in every
    # non-empty Hamming bucket — the complete-multiprobe proof row
    ap.add_argument("--variants", default="16")
    ap.add_argument("--max-hamming", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark()
    docs = load_table(spark, args.sf, "documents")

    t0 = time.time()
    pdf = mm.media_phash_sigs(docs).toPandas()
    n_media = len(pdf)
    lo = pdf["lo"].to_numpy(dtype=np.int64)
    hi = pdf["hi"].to_numpy(dtype=np.int64)
    sig = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    n_unique = len(np.unique(sig))
    print(
        f"# sigs: {n_media} media, {n_unique} unique, {time.time()-t0:.1f}s",
        file=sys.stderr,
    )

    t0 = time.time()
    true_hist = exact_hamming_hist_fast(lo, hi, args.max_hamming)
    print(f"# exact all-pairs hist: {time.time()-t0:.1f}s", file=sys.stderr)

    out = {
        "sf": args.sf,
        "band_bits": args.band_bits,
        "n_media": n_media,
        "n_unique_sigs": n_unique,
        "true": true_hist,
        "variants": {},
    }
    for spec in args.variants.split(","):
        spec = spec.strip()
        if not spec:
            continue
        name = f"banded{spec}"
        t0 = time.time()
        res = mm.media_phash_neardup(docs, band_bits=int(spec))
        found = {
            int(r.hamming): int(r.cnt)
            for r in res.groupBy("hamming").agg(F.count("*").alias("cnt")).collect()
        }
        sec = time.time() - t0
        recall = {
            d: (found.get(d, 0) / true_hist[d]) if true_hist[d] else None
            for d in range(args.max_hamming + 1)
        }
        out["variants"][name] = {"found": found, "recall": recall, "sec": round(sec, 2)}
        print(f"# variant {name}: {sec:.1f}s", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
