#!/usr/bin/env python3
"""Synthetic fixture generator — scale clones of /root/testdata.

The driver-provided fixtures stop at sf0.1 and the directory is
read-only (TESTDATA.md). Scale sweeps beyond that (sf1 ~ 6M lineitem
rows) need a locally generated clone with the SAME schema and the same
distribution shapes, so every contract query exercises the same code
paths at 10x the rows. This reproduces the observed sf0.1
distributions (profiled 2026-08-15, seed-42 driver data):

- region/nation: fixed 5/25 rows, NATION_i, n_regionkey = i % 5.
- customer/supplier: Customer#%09d / Supplier#%09d, nationkey ~ U(25),
  acctbal ~ U(-1000, 10000) rounded to cents, mktsegment ~ U(5 values).
- part: "<adj> <noun>" names from 8x8 vocab, Brand#1..25, 6 types,
  p_size ~ U(1..50), p_retailprice ~ U(900, 1000).
- orders: o_custkey ~ U(#customers), status F/O/P, priority 5 values,
  o_totalprice ~ U(1000, 500000), o_orderdate midnight-uniform over
  1995-01-01..2001-08-01.
- lineitem: avg 4 lines/order via independent l_orderkey ~ U(#orders),
  l_linenumber ~ U(1..7), l_quantity integral U(1..50),
  l_extendedprice ~ U(900, 105000), discount 0..0.10 / tax 0..0.08 in
  cent steps, l_shipdate midnight-uniform 1995-01-02..2001-11-04.
- events: ts sorted uniform-us over 2024-01-01..2024-01-31 (written as
  TIMESTAMP(MICROS, isAdjustedToUTC=false) like the current fixtures;
  the nanos encoding path is covered by unit fixtures),
  user_id ~ U(#customers/10), 5 event types, value ~ Exp(50) rounded,
  props = '{"k": N}' with N ~ U(0..100).
- documents: 31-word vocab salads of U(10..100) words; ~4.7% of docs
  are NEAR-DUPS of an earlier doc (tail +/- one word, matching the
  observed prefix-identical pair structure) and ~0.16% exact dups —
  these rates drive the minhash/simhash bucket loads, so they scale
  proportionally; lang ~ {en: .41, de/es/fr/zh: ~.1475}, source =
  src{i % 20}.
- embeddings: 64-d unit vectors = normalize(N(0, I) + 0.56 * u_label)
  — reproduces the observed weak cluster structure (centroid norm
  ~0.07 after normalization, within-cluster std ~0.125).

Usage: python tools/gen_fixture.py --sf 1 --out /tmp/sf1 [--seed 42]

Row counts scale linearly from the sf0.1 reference counts. Output is
one snappy parquet per table with pyarrow's default row-group size
(sf1 gets multiple row groups — closer to cluster reality than the
single-row-group driver files; see CLAUDE.md scan-stage note).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Row counts at sf0.1 (the driver fixture this clones).
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _midnight_days(rng, n, start, end):
    """Uniform midnight timestamps (us) over [start, end] inclusive days."""
    lo = np.datetime64(start, "D").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64(end, "D").astype("datetime64[us]").astype(np.int64)
    days = (hi - lo) // DAY_US
    return (lo + rng.integers(0, days + 1, n) * DAY_US).astype("datetime64[us]")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def _zipf_keys(rng, n_keys, size, s):
    """``size`` draws over ``n_keys`` ids with zipf(s) rank weights
    (p(rank k) ∝ 1/k^s), via inverse-CDF searchsorted — O(size log
    n_keys), no giant choice() probability allocation at sf10. Ranks
    map to ids through a PERMUTATION so the hot keys are random ids:
    heat must not correlate with the parity-subset moduli (key % m)
    or with id-ordered seed selection, or the sweep would quietly
    test a special case."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** -float(s))
    cdf /= cdf[-1]
    idx = np.searchsorted(cdf, rng.random(size), side="right")
    return rng.permutation(n_keys)[np.minimum(idx, n_keys - 1)]


def gen(sf: float, out: str, seed: int = 42, ts_unit: str = "us",
        ts_jitter: bool = False, null_frac: float = 0.0,
        nan_frac: float = 0.0, skew_zipf: float = 0.0,
        text_garble: float = 0.0, orphan_frac: float = 0.0) -> dict:
    if ts_unit not in ("us", "ns"):
        raise ValueError(f"ts_unit must be us|ns, got {ts_unit!r}")
    if ts_jitter and ts_unit != "ns":
        raise ValueError("--ts-jitter requires --ts-unit ns")
    if not 0.0 <= null_frac < 1.0:
        raise ValueError(f"null_frac must be in [0, 1), got {null_frac}")
    if not 0.0 <= nan_frac < 1.0:
        raise ValueError(f"nan_frac must be in [0, 1), got {nan_frac}")
    if skew_zipf and not 0.5 <= skew_zipf <= 4.0:
        raise ValueError(f"skew_zipf must be in [0.5, 4], got {skew_zipf}")
    if not 0.0 <= text_garble < 1.0:
        raise ValueError(f"text_garble must be in [0, 1), got {text_garble}")
    if not 0.0 <= orphan_frac < 1.0:
        raise ValueError(f"orphan_frac must be in [0, 1), got {orphan_frac}")
    s = sf / 0.1
    n = {t: max(1, int(round(c * s))) for t, c in BASE.items()}
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    stats = {}

    def write(name, table):
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(table, path, compression="snappy")
        stats[name] = table.num_rows

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": _money(rng, nc, -1000, 10000),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": _money(rng, ns, -1000, 10000),
    }))

    npart = n["part"]
    adj = np.array(ADJS)[rng.integers(0, 8, npart)]
    noun = np.array(NOUNS)[rng.integers(0, 8, npart)]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, npart)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": _money(rng, npart, 900, 1000),
    }))

    # referential-dirt lever (round 13, VERDICT r12 #6): every prior
    # lever mutates VALUES; this one breaks REFERENCES. At rate f:
    # lineitem rows whose l_orderkey matches no order, events whose
    # user_id is absent from customer, embeddings whose vec_id has no
    # documents twin — plus DUPLICATE primary keys at f/4 in
    # orders.o_orderkey and customer.c_custkey (replacing a key with
    # an existing one, which also implicitly orphans that key's
    # children — real upstream dirt never orphans cleanly). Stresses
    # unmatched-row contracts in the join/as-of/attribution family,
    # 1:1 dedupe_right parity, and every expect_fk-style gate, which
    # had only ever seen clean keys at contract level.
    def _dup_pks(keys: np.ndarray) -> np.ndarray:
        if not orphan_frac:
            return keys
        keys = keys.copy()
        m = rng.random(len(keys)) < orphan_frac / 4.0
        keys[m] = keys[rng.integers(0, len(keys), int(m.sum()))]
        return keys

    def _orphan(keys: np.ndarray, domain: int) -> np.ndarray:
        if not orphan_frac:
            return keys
        keys = keys.copy()
        m = rng.random(len(keys)) < orphan_frac
        keys[m] = domain + rng.integers(0, domain, int(m.sum()))
        return keys

    if orphan_frac:
        # rewrite customer with duplicate c_custkeys (dimension-side
        # dup PKs break naive 1:1 broadcast-join assumptions)
        ckeys = _dup_pks(np.arange(nc))
        write("customer", pa.table({
            "c_custkey": pa.array(ckeys, pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
            "c_acctbal": _money(rng, nc, -1000, 10000),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
        }))

    no = n["orders"]
    write("orders", pa.table({
        "o_orderkey": pa.array(_dup_pks(np.arange(no)), pa.int64()),
        "o_custkey": pa.array(_zipf_keys(rng, nc, no, skew_zipf)
                              if skew_zipf else rng.integers(0, nc, no),
                              pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, no)]),
        "o_totalprice": _money(rng, no, 1000, 500000),
        "o_orderdate": pa.array(
            _midnight_days(rng, no, "1995-01-01", "2001-08-01")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    nl = n["lineitem"]
    write("lineitem", pa.table({
        "l_orderkey": pa.array(
            _orphan(_zipf_keys(rng, no, nl, skew_zipf)
                    if skew_zipf else rng.integers(0, no, nl), no),
            pa.int64()),
        "l_partkey": pa.array(_zipf_keys(rng, npart, nl, skew_zipf)
                              if skew_zipf else rng.integers(0, npart, nl),
                              pa.int64()),
        "l_suppkey": pa.array(_zipf_keys(rng, ns, nl, skew_zipf)
                              if skew_zipf else rng.integers(0, ns, nl),
                              pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": _money(rng, nl, 900, 105000),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, nl)]),
        "l_shipdate": pa.array(
            _midnight_days(rng, nl, "1995-01-02", "2001-11-04")),
    }))

    ne = n["events"]
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * DAY_US
    ts = np.sort(t0 + rng.integers(0, span, ne))
    if ts_unit == "ns":
        # the driver fixtures vary by generation between
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) and TIMESTAMP(NANOS)
        # (CLAUDE.md); the ns variant exercises the nanosAsLong read
        # path (epoch-ns longs -> nanos_to_timestamp) across the whole
        # query surface
        ts_ns = ts * 1000
        if ts_jitter:
            # sub-microsecond jitter (round 9): BOTH engines truncate
            # parquet NANOS to µs on read (Spark via nanosAsLong//1000,
            # DuckDB by mapping to its µs TIMESTAMP — verified, not
            # assumed), so live sub-µs digits guard that READ-path
            # agreement end-to-end across the whole oracle surface; a
            # future reader that starts surfacing ns (e.g. DuckDB
            # TIMESTAMP_NS mapping) would show up as sweep mismatches
            # rather than silently shifting tie orders
            ts_ns = np.sort(ts_ns + rng.integers(0, 1000, ne))
        ts_arr = pa.array(ts_ns.astype("datetime64[ns]"))
    else:
        ts_arr = pa.array(ts.astype("datetime64[us]"))
    if null_frac:
        # NULL-robustness variant (round 9): the driver fixtures never
        # carry NULL timestamps/embeddings, so every oracle's NULL
        # semantics (rolling's ts filter, the vector family's
        # exclusion contract) had been exercised only by unit tests —
        # this plants real NULLs so a full sweep checks the op and
        # its oracle agree row-for-row in the presence of NULLs
        mask = pa.array(rng.random(ne) < null_frac)
        ts_arr = pa.compute.if_else(mask, pa.nulls(ne, ts_arr.type), ts_arr)
    write("events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array(
            _orphan(_zipf_keys(rng, max(1, nc // 10), ne, skew_zipf)
                    if skew_zipf else rng.integers(0, max(1, nc // 10), ne),
                    nc),
            pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.exponential(50.0, ne), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 101, ne)]),
    }))

    nd = n["documents"]
    vocab = np.array(DOC_VOCAB)
    texts: list[str] = []
    for i in range(nd):
        r = rng.random()
        if i > 0 and r < 0.0016:  # exact dup
            texts.append(texts[rng.integers(0, i)])
        elif i > 0 and r < 0.047 + 0.0016:  # near dup: tail +/- 1 word
            words = texts[rng.integers(0, i)].split()
            if len(words) > 10 and rng.random() < 0.5:
                words = words[:-1]
            else:
                words = words + [vocab[rng.integers(0, len(vocab))]]
            texts.append(" ".join(words))
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    # NULL text / lang (round 11): the text-operator family had never
    # been NULL-TEXT swept — tokenizers, cleaners, dedup shinglers and
    # their oracles must agree on whether a NULL document is an empty
    # document or an absent one.
    text_list: list = [None if null_frac and rng.random() < null_frac
                       else t for t in texts]
    if text_garble:
        # adversarial text shapes (round 12): empty strings, the
        # chr(31) oracle concat separator, PNG-magic codepoints,
        # whitespace-only, quotes/backslashes/newlines, CJK + emoji,
        # one enormous unbroken token — every tokenizer, cleaner,
        # shingler, JSON extractor and md5-separator oracle must
        # agree on these byte-for-byte (the media stubs hash them;
        # the text family PARSES them)
        shapes = [
            "",
            "\x1f",
            "a\x1fb\x1fc",
            "\x89PNG\r\n\x1a\n garbage",
            "   \t  \n ",
            "\"quoted\" and \\backslash\\ and 'single'",
            "line one\nline two\r\nline three",
            "漢字とカタカナ \U0001f600",
            "x" * 4000,
            "NULL",
        ]
        for i in range(len(text_list)):
            if text_list[i] is not None and rng.random() < text_garble:
                text_list[i] = shapes[int(rng.integers(0, len(shapes)))]
    lang_arr = np.array(LANGS)[rng.choice(5, nd, p=LANG_P)].astype(object)
    if null_frac:
        lang_arr[rng.random(nd) < null_frac] = None
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": text_list,
        "lang": pa.array(list(lang_arr), pa.string()),
        "source": ([f"src{z}" for z in _zipf_keys(rng, 20, nd, skew_zipf)]
                   if skew_zipf else [f"src{i % 20}" for i in range(nd)]),
        "n_chars": pa.array(
            [len(t) if t is not None else None for t in text_list],
            pa.int64()),
    }))

    nv = n["embeddings"]
    # key-skew lever (round 12): a zipf label makes one embedding
    # CLUSTER hot (labels drive the cluster centers below), which is
    # what stresses per-cell quadratics (semdedup/knn_join max_cell
    # geometry) and by-label group scalars — the relational skew
    # rides the zipf foreign keys above
    label = (_zipf_keys(rng, 10, nv, skew_zipf).astype(np.int32)
             if skew_zipf else rng.integers(0, 10, nv).astype(np.int32))
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = rng.standard_normal((nv, 64)) + 0.56 * cents[label]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    emb_list: list = [None if null_frac and rng.random() < null_frac else v
                      for v in vecs]
    # NULL group keys too (round 11): groupBy/Window treat NULL as a
    # real group, so every by-label vector op and its oracle must be
    # NULL-safe on the key (nullsafe joinbacks, NULLS FIRST sorts) —
    # the embedding_outlier USING(label) joinback was latent until
    # this was planted.
    label_list: list = [None if null_frac and rng.random() < null_frac
                        else int(x) for x in label]
    if nan_frac:
        # adversarial-value variant (round 10): corrupt this fraction
        # of the NON-NULL vectors so a full sweep checks the valid_vec
        # contract (NaN/Inf/NULL components, zero-length arrays are
        # excluded like NULL embeddings) agrees row-for-row between
        # every vector op and its oracle. Corruption mix: NaN
        # component 40%, +Inf 20%, -Inf 20%, empty array 10%, NULL
        # component 10% — each hits a different engine-divergence mode
        # (Spark floor(NaN)->0 vs DuckDB NaN; min/max NaN ordering;
        # np.vstack raggedness; lambda-filter NULL semantics).
        for i in range(len(emb_list)):
            v = emb_list[i]
            if v is None or rng.random() >= nan_frac:
                continue
            r, pos = rng.random(), int(rng.integers(0, len(v)))
            if r < 0.4:
                bad: list = list(v); bad[pos] = float("nan")
            elif r < 0.6:
                bad = list(v); bad[pos] = float("inf")
            elif r < 0.8:
                bad = list(v); bad[pos] = float("-inf")
            elif r < 0.9:
                bad = []
            else:
                bad = list(v); bad[pos] = None
            emb_list[i] = bad
    # orphan vec_ids: remap a fraction to nd + vec_id — injective
    # (uniqueness preserved) and guaranteed past every doc_id, so the
    # remapped rows have no documents twin
    vids = np.arange(nv)
    if orphan_frac:
        m = rng.random(nv) < orphan_frac
        vids = np.where(m, nd + vids, vids)
    write("embeddings", pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array(emb_list, pa.list_(pa.float32())),
        "label": pa.array(label_list, pa.int32()),
    }))

    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ts-jitter", action="store_true",
                    help="ns mode only: add sub-µs jitter so DuckDB "
                         "sees digits Spark's µs read truncates")
    ap.add_argument("--ts-unit", choices=("us", "ns"), default="us",
                    help="events.ts parquet encoding (the driver "
                         "fixtures vary by generation)")
    ap.add_argument("--null-frac", type=float, default=0.0,
                    help="plant this fraction of NULLs in events.ts "
                         "and embeddings.embedding (NULL-robustness "
                         "sweep variant; driver fixtures have none)")
    ap.add_argument("--nan-frac", type=float, default=0.0,
                    help="corrupt this fraction of non-NULL embeddings "
                         "with NaN/Inf/NULL components or zero-length "
                         "arrays (valid_vec-contract sweep variant)")
    ap.add_argument("--text-garble", type=float, default=0.0,
                    help="replace this fraction of non-NULL texts with "
                         "adversarial shapes (empty, chr(31), PNG "
                         "magic, whitespace-only, quotes, CJK/emoji, "
                         "4k-char token)")
    ap.add_argument("--orphan-frac", type=float, default=0.0,
                    help="referential dirt: this fraction of lineitem "
                         "l_orderkeys match no order, events.user_ids "
                         "no customer, embeddings.vec_ids no document; "
                         "plus duplicate o_orderkey/c_custkey primary "
                         "keys at a quarter of the rate")
    ap.add_argument("--skew-zipf", type=float, default=0.0,
                    help="zipf exponent for key skew: o_custkey, "
                         "lineitem FKs, events.user_id, documents."
                         "source, embeddings.label draw zipf(s) ranks "
                         "over permuted ids (hot keys, hot clusters; "
                         "0 = uniform like the driver fixtures)")
    args = ap.parse_args()
    t0 = time.time()
    stats = gen(args.sf, args.out, args.seed, args.ts_unit,
                args.ts_jitter, args.null_frac, args.nan_frac,
                args.skew_zipf, args.text_garble, args.orphan_frac)
    print(json.dumps({"sf": args.sf, "out": args.out,
                      "seconds": round(time.time() - t0, 1),
                      "rows": stats}))


if __name__ == "__main__":
    main()
