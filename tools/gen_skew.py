#!/usr/bin/env python3
"""Skewed join fixture generator (tooling only — never on the JVM
path). Produces the worst-case shape AQE's skew split and
SkewOps.saltedEquiJoin exist for: a fact table whose join key is
Zipf-degenerate (one key owns `hot_share` of all rows) against a
uniform dim. Usage:

  python3 tools/gen_skew.py /tmp/graft_skew [n_fact] [n_dim] [hot_share]

Defaults: 20M fact rows, 1M dim rows, hot key = 30% of the fact.
Deterministic (seed 42), matching gen_sf.py's discipline.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(out: str, n_fact: int, n_dim: int, hot_share: float) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    n_hot = int(n_fact * hot_share)
    k = np.concatenate([
        np.zeros(n_hot, dtype=np.int64),
        rng.integers(0, n_dim, n_fact - n_hot, dtype=np.int64)])
    rng.shuffle(k)
    v = np.round(rng.exponential(50.0, n_fact), 2)
    pq.write_table(pa.table({'k': k, 'v': v}), f'{out}/fact.parquet')
    pq.write_table(pa.table({
        'k': np.arange(n_dim, dtype=np.int64),
        'bucket': np.arange(n_dim, dtype=np.int64) % 100,
    }), f'{out}/dim.parquet')
    print(f'  fact: {n_fact} rows (hot key 0 = {n_hot}), dim: {n_dim} rows')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_skew',
         int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000,
         int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.3)
