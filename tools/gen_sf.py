#!/usr/bin/env python3
"""Local scale-factor generator (tooling only — never on the JVM path).

Produces a distribution-matched clone of the driver's deterministic
testdata layout at an arbitrary scale factor, for BENCH scale-curve
measurements beyond the provided sf0.1 (BASELINE.md addendum). All
distributions below were sampled from /root/testdata/sf0.1 (see
FIXTURES.md): events value ~ Exp(mean 50) rounded to 2dp (breach rate
~0.68), props = {"k": uniform 0..99}, documents = 10..100 uniform
tokens from the fixed 31-word vocab, embeddings = unit-normalized
64-dim gaussians, TPC-H-ish dims/facts with the same key fan-outs
(lineitem/orders ~ 4, orders/customer ~ 10, events.user ⊆ customer).

NOT the driver's generator: per-query golden counts do NOT transfer;
only timing does. Usage: python3 tools/gen_sf.py 1.0 /tmp/graft_sf1
Optional 3rd arg: embedding dimensionality (default 64) — the
BASELINE d-scaling row (r5 verdict #8) generates a d=512 twin.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    'a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
    'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
    'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
    'spark', 'stream', 'table', 'the', 'value', 'vector', 'window'])

EVENT_TYPES = np.array(['click', 'error', 'purchase', 'signup', 'view'])
SEGMENTS = np.array(['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY'])
PRIOS = np.array(['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'])
PTYPES = np.array(['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD'])
PNAME_A = np.array(['large', 'hot', 'blue', 'small', 'red', 'green', 'cold', 'dark'])
PNAME_B = np.array(['ring', 'bolt', 'screw', 'nut', 'washer', 'pin', 'clip', 'rod'])
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']


def write(out, name, table):
    # version 2.6 keeps TIMESTAMP(NANOS) physical for events.ts,
    # matching the driver fixture's layout quirk.
    # row_group_size: pyarrow's default writes ONE giant row group per
    # table, and Spark can only split parquet at row-group boundaries —
    # so every scan of a big-SF fixture ran as a single task no matter
    # the split size (measured: vocab_growth at sf10 had run_ms == wall,
    # parallelism 1.0). 16k-row groups restore the many-splits reality
    # of production data (real corpora arrive as many files anyway);
    # small-SF fixtures are unaffected (they fit one group regardless).
    pq.write_table(table, f'{out}/{name}.parquet', version='2.6',
                   row_group_size=16384)
    print(f'  {name}: {table.num_rows} rows')


def main(sf: float, out: str, emb_dim: int = 64) -> None:
    rng = np.random.default_rng(42)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)
    n_cust = int(150_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)

    import os
    os.makedirs(out, exist_ok=True)

    # events — ts uniform ns over 2024-01-01..2024-01-31
    t0 = np.datetime64('2024-01-01T00:00:00', 'ns').astype('int64')
    t1 = np.datetime64('2024-01-31T00:00:00', 'ns').astype('int64')
    ts = np.sort(rng.integers(t0, t1, n_events))
    k = rng.integers(0, 100, n_events)
    write(out, 'events', pa.table({
        'event_id': pa.array(np.arange(n_events, dtype='int64')),
        'ts': pa.array(ts, pa.timestamp('ns')),
        'user_id': pa.array(rng.integers(0, n_users, n_events)),
        'event_type': pa.array(EVENT_TYPES[rng.integers(0, 5, n_events)]),
        'value': pa.array(np.round(rng.exponential(50.0, n_events), 2)),
        'props': pa.array([f'{{"k": {v}}}' for v in k]),
    }))

    # documents — en is ~40% like the fixture; no exact dups by id salt
    ntok = rng.integers(10, 101, n_docs)
    texts = [' '.join(VOCAB[rng.integers(0, len(VOCAB), n)]) for n in ntok]
    lang = np.array(['en', 'de', 'es', 'fr', 'zh'])[
        np.searchsorted([0.4, 0.55, 0.7, 0.85], rng.random(n_docs))]
    write(out, 'documents', pa.table({
        'doc_id': pa.array(np.arange(n_docs, dtype='int64')),
        'text': pa.array(texts),
        'lang': pa.array(lang),
        'source': pa.array([f'src{i}' for i in rng.integers(0, 20, n_docs)]),
        'n_chars': pa.array(np.array([len(t) for t in texts], dtype='int64')),
    }))

    # embeddings — unit-normalized gaussians (std 1/8 per dim), f32
    emb = rng.standard_normal((n_vecs, emb_dim)).astype('float32')
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(out, 'embeddings', pa.table({
        'vec_id': pa.array(np.arange(n_vecs, dtype='int64')),
        'embedding': pa.array(list(emb), pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, n_vecs).astype('int32')),
    }))

    # dims
    write(out, 'region', pa.table({
        'r_regionkey': pa.array(np.arange(5, dtype='int32')),
        'r_name': pa.array(REGIONS)}))
    write(out, 'nation', pa.table({
        'n_nationkey': pa.array(np.arange(25, dtype='int32')),
        'n_name': pa.array([f'NATION_{i}' for i in range(25)]),
        'n_regionkey': pa.array((np.arange(25) % 5).astype('int32'))}))
    write(out, 'customer', pa.table({
        'c_custkey': pa.array(np.arange(n_cust, dtype='int64')),
        'c_name': pa.array([f'Customer#{i:09d}' for i in range(n_cust)]),
        'c_nationkey': pa.array(rng.integers(0, 25, n_cust).astype('int32')),
        'c_acctbal': pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        'c_mktsegment': pa.array(SEGMENTS[rng.integers(0, 5, n_cust)])}))
    write(out, 'supplier', pa.table({
        's_suppkey': pa.array(np.arange(n_supp, dtype='int64')),
        's_name': pa.array([f'Supplier#{i:09d}' for i in range(n_supp)]),
        's_nationkey': pa.array(rng.integers(0, 25, n_supp).astype('int32')),
        's_acctbal': pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2))}))
    write(out, 'part', pa.table({
        'p_partkey': pa.array(np.arange(n_part, dtype='int64')),
        'p_name': pa.array([f'{a} {b}' for a, b in zip(
            PNAME_A[rng.integers(0, 8, n_part)], PNAME_B[rng.integers(0, 8, n_part)])]),
        'p_brand': pa.array([f'Brand#{i}' for i in rng.integers(1, 26, n_part)]),
        'p_type': pa.array(PTYPES[rng.integers(0, 6, n_part)]),
        'p_size': pa.array(rng.integers(1, 51, n_part).astype('int32')),
        'p_retailprice': pa.array(np.round(rng.uniform(900, 1000, n_part), 2))}))

    # orders + lineitem with the fixture's fan-outs
    d0 = np.datetime64('1995-01-01', 'ms').astype('int64')
    d1 = np.datetime64('2001-08-01', 'ms').astype('int64')
    write(out, 'orders', pa.table({
        'o_orderkey': pa.array(np.arange(n_orders, dtype='int64')),
        'o_custkey': pa.array(rng.integers(0, n_cust, n_orders)),
        'o_orderstatus': pa.array(np.array(['F', 'O', 'P'])[rng.integers(0, 3, n_orders)]),
        'o_totalprice': pa.array(np.round(rng.uniform(1000, 500000, n_orders), 2)),
        'o_orderdate': pa.array(
            (rng.integers(d0, d1, n_orders) // 86400000 * 86400000),
            pa.timestamp('ms')),
        'o_orderpriority': pa.array(PRIOS[rng.integers(0, 5, n_orders)])}))

    okey = np.sort(rng.integers(0, n_orders, n_line))  # ~Binomial(4) lines/order
    # l_linenumber = 1..k within each order (okey is sorted)
    starts = np.flatnonzero(np.diff(okey, prepend=okey[0] - 1))
    linenum = np.arange(n_line) - np.repeat(starts, np.diff(np.append(starts, n_line))) + 1
    s0 = np.datetime64('1995-01-02', 'ms').astype('int64')
    s1 = np.datetime64('2001-11-04', 'ms').astype('int64')
    write(out, 'lineitem', pa.table({
        'l_orderkey': pa.array(okey),
        'l_partkey': pa.array(rng.integers(0, n_part, n_line)),
        'l_suppkey': pa.array(rng.integers(0, n_supp, n_line)),
        'l_linenumber': pa.array(linenum.astype('int32')),
        'l_quantity': pa.array(rng.integers(1, 51, n_line).astype('float64')),
        'l_extendedprice': pa.array(np.round(rng.uniform(900, 105000, n_line), 2)),
        'l_discount': pa.array(np.round(rng.uniform(0, 0.1, n_line), 2)),
        'l_tax': pa.array(np.round(rng.uniform(0, 0.08, n_line), 2)),
        'l_returnflag': pa.array(np.array(['A', 'N', 'R'])[rng.integers(0, 3, n_line)]),
        'l_linestatus': pa.array(np.array(['F', 'O'])[rng.integers(0, 2, n_line)]),
        'l_shipdate': pa.array(
            (rng.integers(s0, s1, n_line) // 86400000 * 86400000),
            pa.timestamp('ms'))}))


if __name__ == '__main__':
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f'/tmp/graft_sf{sys.argv[1]}'
    emb_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    main(sf, out, emb_dim)
