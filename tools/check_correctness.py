#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), replays the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables,
and compares: row count, column names (sorted), ARROW TYPES per column, and
values (rows sorted, exact match after canonicalization). This is a strict
local stand-in for CORRECTNESS_r{N}.json — if it passes here, the driver's
hash compare should pass too.

The arrow-type compare exists because the driver's hash is TYPE-sensitive
(r10/r11 post-mortem): DuckDB silently widens integer SUM / `//` to HUGEINT
(arrow decimal128(38,0)) where Spark emits int64, and a value-only compare
(fetchall() coerces HUGEINT to Python int) structurally cannot see it.
Rule: every oracle final-SELECT column gets an explicit CAST matching the
Spark output type.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Float-parity lint (a repo invariant, r10 post-mortem): a catalog query
# may emit a DOUBLE column ONLY if it is a pinned bit-identity class —
# (a) raw passthrough of a parquet double column, (b) a DECIMAL-exact
# aggregate cast back to double (QH.moneySum/moneyAvg), or (c) a
# deterministic parse of text. Engine-version-sensitive doubles (round(),
# interpolated percentiles, ceil/floor of double products) pass a local
# compare bit-exact yet hash-fail on the driver. Any (query, column) not
# listed below fails the gate; extend the list ONLY with a pinned class.
DOUBLE_OK = {
    "a11_sum_join_fill": {"total_bal"}, "a14_top1000_mean": {"avg_top"},
    "a16_date_sum": {"total_value"}, "a18_partial_agg_files": {"qty"},
    "a19_grouping_sets": {"sum_qty"}, "a1_groupby_stats": {"avg_qty"},
    "a2_whole_period_stats": {"avg_price"}, "a3_grand_total": {"total_qty"},
    "a4_rollup_multiscale": {"rev"}, "a8_rollup_chain": {"monthly_rev"},
    "a9_nested_outer_totals": {"order_rev"}, "dvf1_end_to_end": {"med_cents"},
    "f4_decimal_comma": {"parsed"}, "geo1_fix_coordinates": {"lon", "lat"},
    "j10_nway_outer": {"rev_f"}, "j14_range_join": {"total"},
    "j1_broadcast_dim_join": {"acct"}, "j2_large_join_agg": {"revenue"},
    "j5_coalesce_keys": {"order_rev", "item_rev"},
    "j6_join_preagg": {"o_totalprice", "qty"},
    "j7_semi_on_count": {"l_extendedprice"},
    "o1_multisort_limit": {"l_quantity"}, "o2_sort_by_derived": {"o_totalprice"},
    "o4_distinct_rows": {"l_quantity"}, "o8_exceptall_cdc": {"l_quantity"},
    "p1_project_rename": {"qty", "price"}, "p3_range_filter": {"rev"},
    "p4_null_predicates": {"avg_disc"}, "p7_conditional_column": {"total"},
    "prof1_table_profile": {"price_min", "price_max", "price_avg"},
    "r2_wide_metric_columns": {"revenue_O", "revenue_F", "revenue_P"},
    "r5_unpivot_metrics": {"total"}, "src4_orc_roundtrip": {"rev"},
    "src6_avro_roundtrip": {"rev"}, "w2_keep_one_priority": {"value"},
    "w3_dedup_keep_first": {"first_qty"}, "w5_topk_per_group": {"o_totalprice"},
    "w7_rolling_7day": {"roll7"},
}

# DECIMAL twin of the DOUBLE lint (r13 post-mortem): cons1 shipped a raw
# DECIMAL(18,2) output column — the only one across all 266 outputs — that
# passed this local replica bit-exact yet hash-failed on the driver (the
# driver's hasher canonicalizes DECIMAL values differently than the local
# compare). Catalog outputs are int64 / strings / pinned doubles — NEVER
# raw DECIMAL: render money as integer cents (value-exact for 2-dec
# DECIMAL) or a moneySum-class double. Any (query, column) not listed here
# fails the gate; extend ONLY with a pinned driver-hash-identity argument.
DECIMAL_OK = {}


def canon(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # exact repr: we demand bit-identical floats (driver hashes values)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("f", repr(float(v)))
    except Exception:
        pass
    return (type(v).__name__, str(v))


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def type_canon(t):
    """Canonical arrow-type string for the driver-faithful schema compare.

    Only representation-level aliases that cannot change a hashed value are
    folded (64-bit-offset string/binary variants); everything else —
    including decimal128 vs int64, int32 vs int64, timestamp units — must
    match exactly, because the driver's hash is type-sensitive.
    """
    import pyarrow.types as pt
    if pt.is_large_string(t) or pt.is_string_view(t):
        return "string"
    if pt.is_large_binary(t) or pt.is_binary_view(t):
        return "binary"
    return str(t)


def schema_diff(s_schema, d_schema):
    """Return [(col, spark_type, duckdb_type)] where arrow types disagree."""
    d_by_name = {f.name: f.type for f in d_schema}
    diffs = []
    for f in s_schema:
        if f.name in d_by_name:
            st, dt = type_canon(f.type), type_canon(d_by_name[f.name])
            if st != dt:
                diffs.append((f.name, st, dt))
    return diffs


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    def is_scaled_dir():
        # marker written by current ScaleGen runs; older scaled dirs lack
        # it, so ALSO detect structurally: base dirs carry events.ts as a
        # parquet timestamp, ScaleGen rewrites it as a plain INT64 of nanos
        if (sf_dir / "_SCALED_TS_NS").exists():
            return True
        ev = sf_dir / "events.parquet"
        if ev.exists():
            try:
                target = ev
                if ev.is_dir():  # Spark writes a DIRECTORY of part files
                    parts = sorted(ev.glob("*.parquet"))
                    if not parts:
                        return False
                    target = parts[0]
                ts = pq.read_schema(target).field("ts").type
                return not str(ts).startswith("timestamp")
            except Exception:
                return False
        return False
    if is_scaled_dir():
        sys.exit(f"{sf_dir} is a ScaleGen dir (events.ts is INT64 ns, not "
                 "TIMESTAMP_NS) — the DuckDB oracle only replays base dirs")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    # the oracle ENVIRONMENT is part of the record: a driver-vs-local hash
    # disagreement (r10: three round()-of-double queries) is attributable
    # only if each run states which DuckDB produced its reference values
    print(f"ORACLE duckdb=={duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = out_dir / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            st = pq.read_table(spark_path)
            s_cols = list(st.column_names)
            s_rows = [tuple(r[c] for c in s_cols) for r in st.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        # The driver sorts result frames with pandas, which crashes on
        # non-hashable cells (numpy arrays from list/struct columns) — see
        # h1 in CORRECTNESS_r03. Flat scalar outputs are the contract.
        import pyarrow.types as pt
        nested = [f.name for f in st.schema
                  if pt.is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: driver-fragile nested output columns {nested} "
                  "(pandas sort crashes on array/struct cells — flatten to scalars)")
            n_fail += 1
            continue
        floaty = [f.name for f in st.schema if pt.is_floating(f.type)
                  and f.name not in DOUBLE_OK.get(name, set())]
        if floaty:
            print(f"FAIL {name}: unlisted DOUBLE output columns {floaty} — "
                  "doubles are engine-version-sensitive unless a pinned "
                  "bit-identity class; emit fixed-point or add the "
                  "(query, column) to DOUBLE_OK with its class")
            n_fail += 1
            continue
        deccy = [f.name for f in st.schema if pt.is_decimal(f.type)
                 and f.name not in DECIMAL_OK.get(name, set())]
        if deccy:
            print(f"FAIL {name}: raw DECIMAL output columns {deccy} — the "
                  "driver's hasher canonicalizes DECIMAL differently than "
                  "this replica (r13 cons1); emit integer cents / fixed-"
                  "point int64 on BOTH engines, or add the (query, column) "
                  "to DECIMAL_OK with a pinned driver-hash-identity argument")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            # arrow fetch, not fetchall(): fetchall() coerces HUGEINT →
            # Python int and hides driver-visible type drift (r11 verdict)
            dt_tab = res.fetch_arrow_table()
            d_rows = [tuple(r[c] for c in d_cols) for r in dt_tab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        ok = True
        tdiffs = schema_diff(st.schema, dt_tab.schema)
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            ok = False
        elif tdiffs:
            for c, sty, dty in tdiffs:
                print(f"FAIL {name}: arrow type mismatch on '{c}': "
                      f"spark={sty} duckdb={dty} (driver hash is type-"
                      "sensitive — CAST the oracle column to the spark type)")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            ok = False
        else:
            sc = rows_canon(s_cols, s_rows)
            dc = rows_canon(d_cols, d_rows)
            if sc != dc:
                diffs = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at sorted-row idx {diffs}")
                for i in diffs[:2]:
                    print(f"  spark : {sc[i]}")
                    print(f"  duckdb: {dc[i]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
