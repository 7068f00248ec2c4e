#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [--json OUT]

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: column names (sorted), ARROW TYPES per
column (sorted by name — this is what the driver's type-aware hash
sees: a DuckDB HUGEINT sum surfaces as decimal128(38,0) while Spark
emits int64, and the two must NOT be treated equal), row count, and
values (rows sorted, hashed). Exit 1 on any mismatch.

With --json OUT, also writes a machine-readable artifact in the
driver's CORRECTNESS_r{N}.json shape: one entry per query with
rows_match / schema_match / hash_match booleans (plus row counts) or
an "err" string. Committed per closing sweep under
correctness_snapshots/ so a driver-harness failure (e.g. the empty
CORRECTNESS_r10.json) leaves a checkable fallback record.
"""
import json, sys, math, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: every float the queries emit is either
        # Spark-round-emulated or derived from identical integer inputs
        # on both engines, so bit-equality is the contract — rounding
        # here would mask divergence the driver's hash would catch
        return repr(v)
    return repr(v)


def table_digest(cols, rows):
    """Sort columns by name, then rows; hash the whole thing."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    proj = [tuple(canon(r[i]) for i in order) for r in rows]
    proj.sort()
    h = hashlib.sha256()
    for row in proj:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def arrow_types(rel):
    """{column -> arrow type string} for a DuckDB relation result."""
    tbl = rel.arrow()
    return {f.name: str(f.type) for f in tbl.schema}, tbl


def rows_of(tbl):
    cols = tbl.column_names
    pyl = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    return cols, (list(zip(*pyl)) if pyl else [])


def main(outdir, sfdir, json_out=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        try:
            got_types, got_tbl = arrow_types(con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
            got_cols, got_rows = rows_of(got_tbl)
            want_types, want_tbl = arrow_types(con.execute(sql))
            want_cols, want_rows = rows_of(want_tbl)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            report[name] = {"err": str(e)}
            failures += 1
            continue
        schema_match = (sorted(got_cols) == sorted(want_cols)
                        and got_types == want_types)
        rows_match = len(got_rows) == len(want_rows)
        hash_match = False
        problems = []
        if sorted(got_cols) != sorted(want_cols):
            problems.append(f"cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
        elif got_types != want_types:
            diffs = {c: (got_types[c], want_types[c])
                     for c in got_types if got_types[c] != want_types.get(c)}
            problems.append(f"types spark-vs-oracle {diffs}")
        if not rows_match:
            problems.append(f"rows spark={len(got_rows)} oracle={len(want_rows)}")
        if not problems:
            hash_match = (table_digest(got_cols, got_rows)
                          == table_digest(want_cols, want_rows))
            if not hash_match:
                # find first differing row for the report
                order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order_w = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
                g = sorted(tuple(canon(r[i]) for i in order_g) for r in got_rows)
                w = sorted(tuple(canon(r[i]) for i in order_w) for r in want_rows)
                diff = next(((a, b) for a, b in zip(g, w) if a != b), None)
                problems.append(f"hash mismatch; first diff: spark={diff[0]} oracle={diff[1]}"
                                if diff else "hash mismatch (ordering?)")
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "rows_spark": len(got_rows),
                        "rows_oracle": len(want_rows)}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check.py <verify_out_dir> <sf_dir> [--json OUT] (--json needs OUT)")
        out = args[i + 1]
        del args[i:i + 2]
    if len(args) < 2:
        sys.exit("usage: check.py <verify_out_dir> <sf_dir> [--json OUT]")
    sys.exit(main(args[0], args[1], out))
