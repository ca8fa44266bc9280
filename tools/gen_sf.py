#!/usr/bin/env python3
"""Generate a scaled synthetic dataset with the SAME schema and value
domains as the driver's /root/testdata tables (TESTDATA.md), for scale
factors the driver doesn't ship (sf1+). Deterministic: every table
draws from its own rng seeded [42, table-index], so generating a
SUBSET of tables (GEN_TABLES) yields byte-identical files to a full
run at the same sf — and regenerating one table never perturbs the
others. (Pre-round-9 dirs were drawn from one sequential stream;
they remain valid — the oracle recomputes over whatever dir it is
pointed at — but are not byte-comparable to regenerated ones.)

The correctness gate recomputes the DuckDB oracle over whatever parquet
dir it is pointed at, so distribution details don't need to match the
driver bit-for-bit — but schemas, column names/types, FK relationships,
and the literal domains queries filter on (event days in Jan-2024,
c_custkey=42, c_mktsegment='BUILDING', r_name='ASIA', order/ship dates
1995-2001, event_type='purchase', ...) must all hold.

Env:
  GEN_TABLES=documents,embeddings   write only these tables (default all)
  GEN_VOCAB=zipf    documents text from a Zipf-tailed vocabulary that
                    GROWS with corpus size (Heaps' law) instead of the
                    default ~30-word salad. The default saturates: at
                    sf10+ every 5-shingle's document frequency grows
                    linearly with the corpus, a worst case for shingle
                    dedup no real corpus exhibits (real text: Heaps
                    V ~= K*T^0.5, so df of the tail stays O(1)). Use
                    zipf for dedup-family scale probes; the default
                    stays for comparability with driver-shipped dirs.
  GEN_CHUNK_ROWS    lineitem streaming-chunk threshold (tests only)

Usage: python3 tools/gen_sf.py <sf> <outdir>   e.g. 1 target/testdata/sf1
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
os.makedirs(OUT, exist_ok=True)
S = lambda n: int(round(n * SF * 100))  # tables ship sf*100 of the sf0.01 counts

ONLY = {t for t in os.environ.get("GEN_TABLES", "").split(",") if t}
ALL = ["region", "nation", "customer", "supplier", "part", "orders",
       "lineitem", "events", "documents", "embeddings"]
want = lambda name: not ONLY or name in ONLY
# per-table rng: seeded by table position, independent of which subset runs
trng = {name: np.random.default_rng([42, i]) for i, name in enumerate(ALL)}

def write(name, table):
    # Spark parallelizes a parquet scan by ROW GROUP — a single-group
    # file is read by one task no matter how many cores exist. pyarrow's
    # 1M-row default left documents/embeddings as ONE group even at
    # sf10 (500k docs), serializing every per-document kernel onto a
    # single thread (measured: 31 idle cores, 4-5x "superlinear" text
    # scaling that was really zero scan parallelism). Target ~64 groups
    # per table, never smaller than 8k rows.
    rg = max(8192, min(1_000_000, table.num_rows // 64))
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=rg)
    print(f"{name}: {table.num_rows} rows ({-(-table.num_rows // rg)} row groups)")

# --- region / nation (fixed size at every sf) ---------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
if want("region"):
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
if want("nation"):
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# --- customer -----------------------------------------------------------
NC = S(1500)
if want("customer"):
    rng = trng["customer"]
    SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    write("customer", pa.table({
        "c_custkey": pa.array(range(NC), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(NC)],
        "c_nationkey": pa.array(rng.integers(0, 25, NC), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, NC), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, NC)])}))

# --- supplier -----------------------------------------------------------
NS = S(100)
if want("supplier"):
    rng = trng["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(NS), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
        "s_nationkey": pa.array(rng.integers(0, 25, NS), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 9999.99, NS), 2)}))

# --- part ---------------------------------------------------------------
NP = S(2000)
if want("part"):
    rng = trng["part"]
    ADJ = ["small", "red", "blue", "green", "large", "shiny", "matte", "plain"]
    NOUN = ["ring", "widget", "bolt", "gear", "cog", "pin", "cap", "rod"]
    TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    write("part", pa.table({
        "p_partkey": pa.array(range(NP), pa.int64()),
        "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(NP)],
        "p_brand": [f"Brand#{(i % 25) + 1}" for i in range(NP)],
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, NP)]),
        "p_size": pa.array(rng.integers(1, 51, NP), pa.int32()),
        # driver pattern: 900.0, 900.1, 900.2, ... keyed by partkey
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(NP), 2)}))

# --- orders -------------------------------------------------------------
NO = S(15000)
if want("orders") or want("lineitem"):
    rng = trng["orders"]
    STATUS = ["F", "O", "P"]
    PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    d0 = np.datetime64("1995-01-01")
    odates = d0 + rng.integers(0, (np.datetime64("2001-08-02") - d0).astype(int), NO)
if want("orders"):
    write("orders", pa.table({
        "o_orderkey": pa.array(range(NO), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, NC, NO), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUS)[rng.integers(0, 3, NO)]),
        "o_totalprice": np.round(rng.uniform(900.0, 550000.0, NO), 2),
        "o_orderdate": pa.array(odates.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, NO)])}))

# --- lineitem (~4 lines per order) --------------------------------------
NL = S(60000)
if want("lineitem"):
    rng = trng["lineitem"]
    lorder = np.sort(rng.integers(0, NO, NL)).astype(np.int64)
    # linenumber restarts per order: row index minus the index of the
    # order's first row (vectorized — the per-row Python loop this
    # replaces is O(minutes) at sf100's 600M rows)
    first = np.zeros(NL, np.int64)
    starts = np.flatnonzero(np.diff(lorder)) + 1
    first[starts] = starts
    np.maximum.accumulate(first, out=first)
    lnum = (np.arange(NL) - first + 1).astype(np.int32)
    del first, starts

    def lineitem_chunk(a, b):
        """Columns for rows [a, b) — rng consumed per chunk, so chunked
        and single-shot runs draw different (equally valid) streams."""
        m = b - a
        qty = rng.integers(1, 51, m).astype(np.float64)
        ship = (odates[lorder[a:b]].astype("datetime64[D]") +
                rng.integers(1, 122, m)).astype("datetime64[us]")
        return pa.table({
            "l_orderkey": pa.array(lorder[a:b]),
            "l_partkey": pa.array(rng.integers(0, NP, m), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, NS, m), pa.int64()),
            "l_linenumber": pa.array(lnum[a:b], pa.int32()),
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * rng.uniform(901.0, 2100.0, m), 2),
            "l_discount": np.round(rng.integers(0, 11, m) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, m) / 100.0, 2),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, m)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, m)]),
            "l_shipdate": pa.array(ship)})

    # Above ~200M rows the all-at-once numpy working set (~10 columns ×
    # 8 B × rows, plus pyarrow copies) no longer fits comfortably in RAM;
    # stream 100M-row chunks through one ParquetWriter instead. Threshold
    # keeps every sf ≤ 30 on the original single-shot rng stream.
    # (env override exists only so tests can exercise the chunked path
    # at a small sf)
    if NL > int(os.environ.get("GEN_CHUNK_ROWS", 200_000_000)):
        CH = max(1, int(os.environ.get("GEN_CHUNK_ROWS", 200_000_000)) // 2)
        t0 = lineitem_chunk(0, min(CH, NL))
        with pq.ParquetWriter(f"{OUT}/lineitem.parquet", t0.schema) as w:
            w.write_table(t0, row_group_size=1_000_000)
            del t0
            for a in range(CH, NL, CH):
                w.write_table(lineitem_chunk(a, min(a + CH, NL)),
                              row_group_size=1_000_000)
        print(f"lineitem: {NL} rows (chunked, {-(-NL // 1_000_000)} row groups)")
    else:
        write("lineitem", lineitem_chunk(0, NL))
    del lorder, lnum

# --- events (Jan 2024, ts increasing with event_id, ~sf*100 users) ------
if want("events"):
    rng = trng["events"]
    NE = S(10000)
    NU = S(150)
    span_us = 30 * 86400 * 1_000_000
    gaps = rng.exponential(span_us / NE, NE)
    # rescale (not clamp) the cumulative gaps onto the month: clamping piles
    # every overshooting tail event onto one identical microsecond (~50% of
    # seeds overshoot since the mean total equals the span), breaking the
    # "ts increasing with event_id" contract with a pileup at month end
    cum = np.cumsum(gaps)
    ets = (np.datetime64("2024-01-01T00:00:00", "us") +
           (cum / cum[-1] * (span_us - 1)).astype(np.int64))
    ETYPES = ["click", "view", "purchase", "signup", "error"]
    write("events", pa.table({
        "event_id": pa.array(range(NE), pa.int64()),
        "ts": pa.array(ets),
        "user_id": pa.array(rng.integers(0, NU, NE), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, NE)]),
        "value": np.round(rng.uniform(0.01, 500.0, NE), 2),
        # value-identical to json.dumps({"k": int(k)}) but vectorized — the
        # per-row dumps loop is ~an hour at sf100's 100M events
        "props": pa.array(np.char.mod('{"k": %d}', rng.integers(0, 100, NE)))}))

# --- documents (a few planted exact dups) -------------------------------
if want("documents"):
    rng = trng["documents"]
    ND = S(500)
    LANGS = np.array(["en", "en", "en", "en", "fr", "de", "es", "zh"])
    lens = rng.integers(8, 100, ND)
    if os.environ.get("GEN_VOCAB", "") == "zipf":
        # Zipf-tailed vocabulary sized by Heaps' law: V = K*T^0.5 over
        # the total token count T, so the vocabulary GROWS with the
        # corpus (sf0.01 ~5k words, sf10 ~104k, sf100 ~329k) and the
        # df of a typical shingle stays roughly CONSTANT across scale
        # points instead of growing linearly — the property that makes
        # shingle-dedup candidate mass ~linear on real corpora.
        # Frequencies P(rank r) ∝ r^-1.07 (English-like exponent).
        T = int(lens.sum())
        V = max(64, int(20 * T ** 0.5))
        w = 1.0 / np.power(np.arange(1, V + 1, dtype=np.float64), 1.07)
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        # rank→word through a permutation so frequency and lexicographic
        # order are uncorrelated (hash-order artifacts can't align)
        VOCAB = np.char.mod("w%07d", rng.permutation(V))
        ranks = np.searchsorted(cdf, rng.random(T), side="left")
        offs = np.concatenate(([0], np.cumsum(lens)))
        texts = [" ".join(VOCAB[ranks[offs[i]:offs[i + 1]]])
                 for i in range(ND)]
        print(f"documents vocab: zipf V={V} over T={T} tokens")
    else:
        VOCAB = np.array(("key agg row scan slow fast table value part hash batch window "
                          "spark order data column join small line customer query merge "
                          "stream group big vector sort filter a the").split())
        texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]) for n in lens]
    for i in range(0, ND, 500):  # ~0.2% planted exact duplicates
        if i + 1 < ND:
            texts[i + 1] = texts[i]
    write("documents", pa.table({
        "doc_id": pa.array(range(ND), pa.int64()),
        "text": texts,
        "lang": pa.array(LANGS[rng.integers(0, len(LANGS), ND)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, ND)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# --- embeddings (64-dim float32, 10 label clusters) ---------------------
if want("embeddings"):
    rng = trng["embeddings"]
    # driver scales embeddings sublinearly (500 @ sf0.01, 2000 @ sf0.1)
    NV = S(200) if SF >= 0.05 else S(500)
    labels = rng.integers(0, 10, NV)
    centers = rng.normal(0, 0.15, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.08, (NV, 64))).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(NV), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))

print(f"done -> {OUT}")
