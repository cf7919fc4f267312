#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
output directory against DuckDB on the same scale-factor tables and
compare per-query (rows, schema-width, values with columns sorted by name).

Usage: python3 tools/check.py [--cc-numpy] <sfDir> <verifyOutDir> [query ...]

--cc-numpy: verify i29_semdedup with the numpy union-find oracle
(tools/i29_sf1_oracle.py) instead of the DuckDB recursive CTE. REQUIRED
at sf>=1 — the CTE materializes the transitive closure of the 10x
clone's similarity cliques and disk-explodes (>79 GB observed); the
numpy oracle is exact for the same semantics and audits its rounding
margins. The sf0.01 driver gate keeps the pure-SQL path.
"""
import json, os, subprocess, sys, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cell(v):
    if pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def fast_equal(a: pd.Series, b: pd.Series) -> bool:
    """True only when the cell()-string compare would also pass; False
    means "don't know — run the canonical loop", never "mismatch"."""
    import numpy as np
    if a.dtype != b.dtype or len(a) != len(b):
        return False
    if a.dtype == np.float64:
        av, bv = a.to_numpy(), b.to_numpy()
        return bool(np.array_equal(av.view(np.int64), bv.view(np.int64)))
    if a.dtype == object:
        # Safe only when every non-null value is a plain str on both
        # sides (Decimal's == ignores scale; mixed types stay slow).
        an, bn = a.dropna(), b.dropna()
        if an.map(type).eq(str).all() and bn.map(type).eq(str).all():
            return a.equals(b)
        return False
    # int*/uint*/bool/datetime64 — exact-identity dtypes. Any other
    # floating width (float32 has the same -0.0 hazard) stays slow.
    if np.issubdtype(a.dtype, np.floating):
        return False
    return a.equals(b)


def main():
    argv = sys.argv[1:]
    cc_numpy = "--cc-numpy" in argv
    if cc_numpy:
        argv.remove("--cc-numpy")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # An in-memory DuckDB connection has NO temp directory, so an
    # oracle whose intermediates exceed the memory cap hard-fails
    # ("Out of Memory Error") instead of spilling — and the failed
    # query's buffers can poison the connection for the NEXT oracle's
    # trivial allocations (observed at sf10: i41 OOMs, then i42 fails
    # to allocate 16 KB). Give the oracle session a spill path, the
    # same courtesy the Spark side gets from its shuffle dirs.
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    paths = {}
    for t in TABLES:
        # Driver testdata ships single-file tables; GenScale (data/sf1)
        # writes Spark directory tables — accept both layouts.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        paths[t] = path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    # The driver's events.parquet stores ns-precision timestamps, which
    # DuckDB reads as TIMESTAMP at us precision. GenScale writes the same
    # ns instants as raw BIGINTs (Spark timestamps cap at us, so the 10x
    # clone keeps the longs); present them to the oracles exactly as the
    # driver layout reads — truncated to us.
    ts_type = con.execute(
        "SELECT data_type FROM duckdb_columns() "
        "WHERE table_name = 'events' AND column_name = 'ts'").fetchone()
    if ts_type and ts_type[0] == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT event_id, "
            "make_timestamp(ts // 1000) AS ts, user_id, event_type, value, "
            f"props FROM read_parquet('{paths['events']}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output written")
            n_fail += 1
            continue
        # Large-SF numpy oracles: i29's recursive-CTE SQL oracle
        # disk-explodes above sf0.1, and BOTH i29's and i24's SQL
        # oracles assign with the FLAT CTE while the Spark dispatcher
        # goes two-level at k >= 64 (sf1 up) — so at sf >= 1 these two
        # swap to dispatcher-mirroring numpy oracles (ADVICE r15).
        numpy_oracles = {"i29_semdedup": "i29_sf1_oracle.py",
                         "i24_embed_near_dup": "i24_sf1_oracle.py"}
        if cc_numpy and name in numpy_oracles:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), numpy_oracles[name]),
                 sf_dir, out_dir],
                capture_output=True, text=True)
            if r.returncode == 0:
                print(f"PASS {name} (numpy dispatcher-mirror oracle)")
                n_pass += 1
            else:
                print(f"FAIL {name}: numpy oracle mismatch\n{r.stdout[-500:]}")
                n_fail += 1
            continue
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            # Vectorized fast path (sf10 outputs reach 60M rows — the
            # per-cell Python loop costs hours there). A fast-path True
            # must IMPLY cell()-string equality, so each dtype gets the
            # strictest cheap test and anything uncertain falls through
            # to the canonical loop below (the driver-gate semantics):
            #   - float64: BITWISE equality (view as int64) — repr() is
            #     injective on doubles, and bit-equality refuses the
            #     -0.0==0.0 / NaN-payload cases `==` would wave through;
            #   - int/bool/datetime64 (same dtype both sides): .equals —
            #     exact value identity == str identity for these;
            #   - str objects: .equals — Python == on str IS cell
            #     equality (None/NaN treated NULL on both paths);
            #   - Decimals & anything else: no fast path (Decimal ==
            #     ignores scale, "1.0" vs "1.00" must still FAIL).
            if fast_equal(got[c], exp[c]):
                continue
            gv = [cell(v) for v in got[c]]
            ev = [cell(v) for v in exp[c]]
            if gv != ev:
                i = next(i for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
                bad = (c, i, gv[i], ev[i])
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: col {c} row {i}: spark={g!r} duckdb={e!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
