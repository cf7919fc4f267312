#!/usr/bin/env python3
"""Shared-materialization runner for the CC-family DuckDB oracles at
large SFs (VERDICT r16 ask #1 diagnosis): ten registry oracles rebuild
the SAME all-pairs token-intersection CTE (dtok -> pairs at jaccard
threshold 0.9) from scratch, and at sf10 that block alone costs ~25 min
of DuckDB wall PER QUERY (measured: i15 25 min, i36 35+ min). Running
the family sequentially through check.py would cost ~5 h for work that
is 10x redundant.

This runner materializes the shared blocks ONCE per connection
(dtok_mat, pairs_mat) and textually swaps each oracle's copy of the
block for a reference to the materialized table. The swap is validated
end-to-end at a small SF first: for every rewritten query, the original
SQL and the rewritten SQL must produce IDENTICAL frames at --validate
<smallSfDir> (the sf0.01 driver-gate data), which proves the rewrite is
pure common-subexpression factoring, not a semantic change. Comparison
against the Spark outputs then uses check.py's own canon/cell/fast
machinery, so a PASS here means exactly what a check.py PASS means.

Usage:
  python3 tools/check_heavy_cc.py <sfDir> <verifyOutDir> \
      [--validate <smallSfDir>] [query ...]

Query set: the eleven CC-family oracles that embed the shared block
(i36 i45 i66 i70 i71 i74 i79 i80 i82 i83 i84) when no names are given;
with names, ONLY the named queries run. Appends PASS/FAIL lines in
check.py's format to stdout.

NOTE on --validate: it is optional per invocation, but a PASS without
it rests on the regex rewrite alone — the round ritual runs the first
sweep of any query set WITH --validate (sf0.01) so the rewrite's
frame-identity is proven before the rewritten SQL is trusted as
ground truth at the big SF.
"""
import json
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, canon, cell, fast_equal

HEAVY = ["i36_near_dedup_incremental", "i45_delete_cascade",
         "i66_dedup_quality_canon", "i70_containment_dedup",
         "i71_minhash_estimate", "i74_pagerank_step", "i79_triangles",
         "i80_cluster_profile", "i82_label_propagation", "i83_kcore_peel",
         "i84_dedup_quality_shift"]

# The shared inner-join aggregate, normalized for whitespace. Alias
# `prs` (i71) and `pairs` (everyone else) both match; the directed i70
# variant (doc_a/doc_b, <>) is handled separately below.
SYM_PAIRS = re.compile(
    r"(?P<name>pairs|prs) AS \(\s*SELECT a\.doc_id AS doc_id1, "
    r"b\.doc_id AS doc_id2,\s*min\(a\.n_tok\) AS n1, min\(b\.n_tok\) AS n2, "
    r"count\(\*\) AS inter\s*FROM dtok a JOIN dtok b\s*ON a\.source = "
    r"b\.source AND a\.token = b\.token AND a\.doc_id < b\.doc_id\s*"
    r"GROUP BY 1, 2\)")
DIR_PAIRS = re.compile(
    r"pairs AS \(\s*SELECT a\.doc_id AS doc_a, b\.doc_id AS doc_b,\s*"
    r"min\(a\.n_tok\) AS na, count\(\*\)::BIGINT AS n_inter\s*"
    r"FROM dtok a JOIN dtok b\s*ON a\.source = b\.source AND a\.token = "
    r"b\.token\s*AND a\.doc_id <> b\.doc_id\s*GROUP BY 1, 2\)")
DTOK = re.compile(
    r"dtok AS \(\s*SELECT doc_id, source, token,\s*count\(\*\) OVER "
    r"\(PARTITION BY doc_id\) AS n_tok\s*FROM \(SELECT DISTINCT doc_id, "
    r"source,\s*unnest\(string_split\(text, ' '\)\) AS token\s*FROM "
    r"documents\)\)")

DTOK_SQL = ("SELECT doc_id, source, token, "
            "count(*) OVER (PARTITION BY doc_id) AS n_tok "
            "FROM (SELECT DISTINCT doc_id, source, "
            "unnest(string_split(text, ' ')) AS token FROM documents)")
PAIRS_SQL = ("SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, "
             "min(a.n_tok) AS n1, min(b.n_tok) AS n2, count(*) AS inter "
             "FROM dtok_mat a JOIN dtok_mat b "
             "ON a.source = b.source AND a.token = b.token "
             "AND a.doc_id < b.doc_id GROUP BY 1, 2")
# The directed (containment) pairs are the symmetric table read in both
# directions: (a,b,na,inter) with na = the FIRST doc's token count.
DIR_FROM_SYM = ("SELECT doc_id1 AS doc_a, doc_id2 AS doc_b, "
                "n1 AS na, inter::BIGINT AS n_inter FROM pairs_mat "
                "UNION ALL SELECT doc_id2, doc_id1, n2, inter::BIGINT "
                "FROM pairs_mat")


def rewrite(sql):
    """Swap the shared dtok/pairs blocks for materialized-table reads.
    Returns (rewritten_sql, used_shared: bool)."""
    out, n1 = DTOK.subn("dtok AS (SELECT * FROM dtok_mat)", sql)
    out, n2 = SYM_PAIRS.subn(
        lambda m: f"{m.group('name')} AS (SELECT * FROM pairs_mat)", out)
    out, n3 = DIR_PAIRS.subn(f"pairs AS ({DIR_FROM_SYM})", out)
    return out, (n1 > 0 and (n2 > 0 or n3 > 0))


def setup(con, sf_dir):
    # In-memory DuckDB hard-OOMs without a spill path at sf10 (the
    # reason check.py sets this), and THIS runner materializes the
    # heaviest block of all (pairs_mat) — so both the validate and the
    # main connection get the same spill directory (ADVICE r17).
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    con.execute(f"CREATE TEMP TABLE dtok_mat AS {DTOK_SQL}")
    con.execute(f"CREATE TEMP TABLE pairs_mat AS {PAIRS_SQL}")


def frames_equal(got, exp):
    if list(got.columns) != list(exp.columns):
        return f"columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} != {len(exp)}"
    for c in got.columns:
        if fast_equal(got[c], exp[c]):
            continue
        gv = [cell(v) for v in got[c]]
        ev = [cell(v) for v in exp[c]]
        if gv != ev:
            i = next(i for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
            return f"col {c} row {i}: {gv[i]!r} != {ev[i]!r}"
    return None


def main():
    argv = sys.argv[1:]
    validate_dir = None
    if "--validate" in argv:
        i = argv.index("--validate")
        validate_dir = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    names = argv[2:] or HEAVY
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    rewritten = {}
    for name in names:
        rw, used = rewrite(oracle[name])
        if not used:
            print(f"FAIL {name}: shared-block rewrite did not apply")
            sys.exit(1)
        rewritten[name] = rw

    if validate_dir:
        vcon = duckdb.connect()
        setup(vcon, validate_dir)
        for name in names:
            exp = canon(vcon.execute(oracle[name]).df())
            got = canon(vcon.execute(rewritten[name]).df())
            bad = frames_equal(got, exp)
            if bad:
                print(f"FAIL {name}: rewrite validation at {validate_dir}: {bad}")
                sys.exit(1)
            print(f"VALIDATED {name} rewrite at {validate_dir} ({len(got)} rows)")

    con = duckdb.connect()
    setup(con, sf_dir)
    n_pass = n_fail = 0
    for name in names:
        # Per-query isolation (ADVICE r17): a missing Spark output dir
        # or an oracle execution error FAILs that query and moves on,
        # mirroring check.py, instead of aborting the whole sweep.
        try:
            exp = canon(con.execute(rewritten[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}", flush=True)
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: no spark output written: {e}", flush=True)
            n_fail += 1
            continue
        bad = frames_equal(got, exp)
        if bad:
            print(f"FAIL {name}: {bad}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
