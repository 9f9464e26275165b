#!/usr/bin/env python3
"""Local pre-gate: replicate the driver's DuckDB-oracle comparison.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir tables registered as views. Compares values exactly (column order
normalized by name-sort, row order as produced). DEV TOOL ONLY — not part
of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def check_q54(con, out_dir):
    """q54 declares NO oracle (sketches are engine-specific), but its
    approximations are still boundable: recompute exact ndv/median in
    DuckDB and assert the documented error envelopes (approx_count_distinct
    rsd=0.02 -> 5%; percentile_approx(1000) -> 10%), mirroring
    InvariantSpec's q54 test so the driver-visible gate is stronger than
    "3 rows exist". Returns True on pass."""
    try:
        approx = {r[0]: (r[1], r[2]) for r in con.execute(
            f"SELECT l_returnflag, approx_orders, approx_median_price "
            f"FROM '{out_dir}/q54_approx_stats/*.parquet'").fetchall()}
        exact = {r[0]: (r[1], r[2]) for r in con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey), "
            "CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) "
            "FROM lineitem GROUP BY 1").fetchall()}
    except Exception as e:
        print(f"FAIL q54_approx_stats (bounded): execution error: {e}")
        return False
    if set(approx) != set(exact):
        print(f"FAIL q54_approx_stats (bounded): groups spark={sorted(approx)} "
              f"exact={sorted(exact)}")
        return False
    for k, (ad, am) in approx.items():
        ed, em = exact[k]
        if ed is None or em is None or ed == 0:
            # Missing exact values, or a zero ndv (empty group), can't be
            # bounded — FAIL rather than abort with ZeroDivisionError.
            # em == 0.0 is a legitimate median, handled below.
            print(f"FAIL q54_approx_stats (bounded): {k} exact ndv={ed} "
                  f"median={em} — cannot bound")
            return False
        if abs(ad - ed) / ed >= 0.05:
            print(f"FAIL q54_approx_stats (bounded): {k} HLL ndv {ad} "
                  f"off >5% from exact {ed}")
            return False
        # relative envelope when the exact median is nonzero; absolute
        # envelope at em == 0 (relative error is undefined there)
        if (abs(am - em) / abs(em) >= 0.10) if em != 0 else (abs(am) >= 0.10):
            print(f"FAIL q54_approx_stats (bounded): {k} approx median {am} "
                  f"off >10% from exact {em}")
            return False
    print(f"PASS q54_approx_stats (bounded: {len(approx)} groups, "
          f"HLL within 5%, median within 10% of exact)")
    return True


def check_q181(con, out_dir):
    """q181 declares NO oracle (DataSketches HLL binaries are
    engine-specific), but the estimates are boundable: lgK=12 gives
    rsd ≈ 1.6%, so every per-type estimate AND the merged union must sit
    within 6.5% (~4 sigma; 5% was ~3 sigma across 7 estimates per run on
    driver-regenerated data — a rare spurious miss was possible with no
    code change) of the exact distinct count. Returns True on pass."""
    try:
        est = {r[0]: r[1] for r in con.execute(
            f"SELECT event_type, est_users "
            f"FROM '{out_dir}/q181_hll_union/*.parquet'").fetchall()}
        exact = {r[0]: r[1] for r in con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) "
            "FROM events GROUP BY 1").fetchall()}
        exact["ALL"] = con.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    except Exception as e:
        print(f"FAIL q181_hll_union (bounded): execution error: {e}")
        return False
    if set(est) != set(exact):
        print(f"FAIL q181_hll_union (bounded): groups spark={sorted(est)} "
              f"exact={sorted(exact)}")
        return False
    for k, e in est.items():
        x = exact[k]
        if x == 0 or abs(e - x) / x > 0.065:
            print(f"FAIL q181_hll_union (bounded): {k} est={e} exact={x} "
                  f"(a marginal miss on freshly regenerated data may be "
                  f"sketch variance, not a regression — rsd 1.6% at lgK=12)")
            return False
    print(f"PASS q181_hll_union (bounded: {len(est) - 1} sketches + merged "
          f"union all within 6.5% of exact)")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = list(spark_rel.columns)
            s_types = dict(zip(s_cols, map(str, spark_rel.types)))
            s_rows = spark_rel.fetchall()
            o_rel = con.sql(oracles[name])
            o_cols = list(o_rel.columns)
            o_types = dict(zip(o_cols, map(str, o_rel.types)))
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: execution error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} "
                  f"oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        # The driver hashes TYPED values, so representation mismatches
        # (e.g. DuckDB promoting SUM(BIGINT) -> HUGEINT while Spark emits
        # int64) fail its gate even when every value compares equal in
        # Python. Enforce exact type equality per column so that failure
        # class can never again pass locally (round-5 q71/q72/q74 lesson).
        ty_bad = [(c, s_types[c], o_types[c])
                  for c in sorted(s_cols) if s_types[c] != o_types[c]]
        if ty_bad:
            msgs = [f"{c}: spark={st} oracle={ot}" for c, st, ot in ty_bad]
            print(f"FAIL {name}: column types differ: " + "; ".join(msgs[:4]))
            n_fail += 1
            continue
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        o_ix = [o_cols.index(c) for c in sorted(o_cols)]
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            sv = tuple(norm(sr[j]) for j in s_ix)
            ov = tuple(norm(orow[j]) for j in o_ix)
            if sv != ov:
                bad = (i, sv, ov)
                break
        if bad:
            i, sv, ov = bad
            cols = sorted(s_cols)
            diffs = [f"{cols[j]}: spark={sv[j]!r} oracle={ov[j]!r}"
                     for j in range(len(cols)) if sv[j] != ov[j]]
            print(f"FAIL {name}: row {i}: " + "; ".join(diffs[:4]))
            n_fail += 1
        elif len(s_rows) == 0:
            # 0 == 0 proves nothing — a broken query and a broken oracle
            # agree perfectly on the empty set (seen once with a stale
            # verify dump). Count as pass but shout.
            print(f"PASS {name} (0 rows — WARNING: vacuous, verify the query is meaningful)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    if not only or "q54_approx_stats" in only:
        if check_q54(con, out_dir):
            n_pass += 1
        else:
            n_fail += 1
    if not only or "q181_hll_union" in only:
        if check_q181(con, out_dir):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
