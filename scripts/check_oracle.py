#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Registers each /root/testdata table as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet dump
in <verifyOutDir>/<name>/: schema (column names), row count, and a hash of
all values with columns sorted by name (mirroring the documented driver
compare). Exit 0 iff all queries match.
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Canonical type class mirroring the driver's type-sensitive hash.

    Round-3 driver evidence: HUGEINT (DuckDB int128 from uncast sum(CASE..))
    vs Spark BIGINT hash-mismatched even with identical values, while
    DECIMAL(2,1) vs DOUBLE hashed identically. So integer width class is
    significant; decimal-vs-float is not.
    """
    t = str(t)
    if t == "HUGEINT":
        return "int128"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
        return "float"
    return t


def type_mismatches(got_rel, exp_rel):
    gt = dict(zip(got_rel.columns, got_rel.types))
    et = dict(zip(exp_rel.columns, exp_rel.types))
    hard, soft = [], []
    for c in set(gt) & set(et):
        if str(gt[c]) == str(et[c]):
            continue
        entry = f"{c}: spark={gt[c]} oracle={et[c]}"
        if type_class(gt[c]) != type_class(et[c]):
            hard.append(entry)
        else:
            soft.append(entry)
    return hard, soft


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    for row in canon_rows:
        h.update(row.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            exp_rel = con.sql(sql)
            hard_types, soft_types = type_mismatches(got_rel, exp_rel)
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows = got.fetchall()
            got_cols = [d[0] for d in got.description]
            exp = con.execute(sql)
            exp_rows = exp.fetchall()
            exp_cols = [d[0] for d in exp.description]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: error {e}")
            continue
        if hard_types:
            failures.append(name)
            print(f"FAIL {name}: type divergence {hard_types} "
                  "(driver hash is type-sensitive)")
            continue
        if soft_types:
            print(f"     {name}: benign type diff {soft_types}")
        if sorted(got_cols) != sorted(exp_cols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        elif len(got_rows) != len(exp_rows):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
        elif table_hash(got_cols, got_rows) != table_hash(exp_cols, exp_rows):
            failures.append(name)
            print(f"FAIL {name}: hash mismatch ({len(got_rows)} rows)")
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            gs = sorted("|".join(canon(r[i]) for i in order) for r in got_rows)
            eo = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            es = sorted("|".join(canon(r[i]) for i in eo) for r in exp_rows)
            for g, e in zip(gs, es):
                if g != e:
                    print(f"  spark: {g[:200]}\n  duck : {e[:200]}")
                    break
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
