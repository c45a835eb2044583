#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's correctness gate:
runs each oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares against the engine's parquet dumps
(column names sorted, rows sorted, exact value equality with a float
report). Dev tooling only — NOT part of the shipped engine.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [--agghash]

--agghash: compare via DuckDB-side aggregates (row count + HUGEINT sum
of per-row struct hashes over name-sorted columns) instead of
materializing rows in Python. This is the ONLY feasible form for the
x100 pair-family gates (q22/q30 at sf10 emit ~600M rows; the tuple
compare would need >100 GB of Python objects). Order-insensitive by
construction (sum over a multiset) and duplicate-sensitive (sum, not
xor); prints PASS(agghash) so the weaker-than-tuple-compare mode is
visible in the log.
"""
import sys, json, math, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def agghash_check(con, name, sql, files, t0):
    """count + sum-of-row-hashes compare, fully inside DuckDB."""
    # materialize the final statement to a temp table (prior statements
    # in a multi-statement oracle are themselves temp-table creates;
    # no oracle SQL contains a literal ';')
    stmts = [s.strip() for s in sql.split(";") if s.strip()]
    for s in stmts[:-1]:
        con.execute(s)
    con.execute(f"CREATE OR REPLACE TEMP TABLE _graft_ora AS {stmts[-1]}")
    ocols = sorted(r[0] for r in con.execute(
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name = '_graft_ora'").fetchall())
    con.execute(f"CREATE OR REPLACE TEMP VIEW _graft_eng AS "
                f"SELECT * FROM read_parquet({files!r})")
    ecols = sorted(con.execute(
        "DESCRIBE _graft_eng").fetch_arrow_table().column(0).to_pylist())
    if ocols != ecols:
        print(f"FAIL {name}: columns differ\n  oracle={ocols}\n  engine={ecols}")
        return False
    packed = ", ".join(f'"{c}":="{c}"' for c in ocols)
    agg = (f"SELECT count(*) AS n, "
           f"sum(CAST(hash(struct_pack({packed})) AS HUGEINT)) AS h FROM ")
    on, oh = con.execute(agg + "_graft_ora").fetchone()
    en, eh = con.execute(agg + "_graft_eng").fetchone()
    if on != en:
        print(f"FAIL {name}: row count oracle={on} engine={en}")
        return False
    if oh != eh:
        print(f"FAIL {name}: row-hash sum differs over {on} rows "
              f"(oracle={oh} engine={eh})")
        return False
    print(f"PASS(agghash) {name} ({on} rows, {time.time()-t0:.1f}s)")
    return True


def main(sf_dir, out_dir, agghash=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # ScaleGen upscales are Spark-written DIRECTORIES of part
            # files; the driver testdata ships single files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output at {res_dir}")
            n_fail += 1
            continue
        t0 = time.time()
        if agghash:
            try:
                ok = agghash_check(con, name, sql, files, t0)
            except Exception as e:
                print(f"FAIL {name}: agghash error: {str(e)[:200]}")
                ok = False
            if ok:
                n_pass += 1
            else:
                n_fail += 1
            continue
        try:
            ora = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        eng = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()

        # Emulate the driver's comparator, which loads both frames into
        # pandas and sort_values() over every column: raw array/map cells
        # are unhashable there and fail with a harness error even when
        # values are right. Catch that class locally (only the sort/hash
        # error classes — anything else is a genuine checker bug and
        # should propagate).
        pdfs = {}
        try:
            for side, tbl in (("oracle", ora), ("engine", eng)):
                pdf = tbl.to_pandas()
                pdf.sort_values(by=sorted(pdf.columns), ignore_index=True)
                pdfs[side] = pdf
        except (TypeError, ValueError) as e:
            print(f"FAIL {name}: driver-style pandas sort would break: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            n_fail += 1
            continue

        ocols, ecols = sorted(ora.column_names), sorted(eng.column_names)
        if ocols != ecols:
            print(f"FAIL {name}: columns differ\n  oracle={ocols}\n  engine={ecols}")
            n_fail += 1
            continue

        # The driver's hash is dtype-sensitive: a DuckDB HUGEINT arrives
        # as decimal128 -> pandas object(Decimal) while the engine emits
        # int64, and the hashes differ even when values are equal
        # (round-4 q73). Compare pandas dtype KINDS per column (int32 vs
        # int64 hash identically for equal values — r4's q08 proved the
        # driver tolerates width drift — but object-vs-numeric or
        # float-vs-int does break the hash), and for object-dtype columns
        # the python type of the first non-null element, so that class
        # fails locally before the driver sees it.
        dtype_diffs = []
        for c in ocols:
            od, ed = pdfs["oracle"][c], pdfs["engine"][c]
            if od.dtype.kind != ed.dtype.kind:
                dtype_diffs.append(f"{c}: oracle={od.dtype} engine={ed.dtype}")
            elif str(od.dtype) == "object":
                onn, enn = od.dropna(), ed.dropna()
                if len(onn) and len(enn):
                    ot, et = type(onn.iloc[0]).__name__, type(enn.iloc[0]).__name__
                    if ot != et:
                        dtype_diffs.append(
                            f"{c}: oracle elem {ot} vs engine elem {et}")
        if dtype_diffs:
            print(f"FAIL {name}: DTYPE drift (driver hash is dtype-sensitive):")
            for d in dtype_diffs:
                print(f"  {d}")
            n_fail += 1
            continue
        o_rows = [tuple(norm(v) for v in row)
                  for row in zip(*[ora.column(c).to_pylist() for c in ocols])]
        e_rows = [tuple(norm(v) for v in row)
                  for row in zip(*[eng.column(c).to_pylist() for c in ecols])]
        if len(o_rows) != len(e_rows):
            print(f"FAIL {name}: row count oracle={len(o_rows)} engine={len(e_rows)}")
            n_fail += 1
            continue
        # driver sorts columns by name; row order must match our ORDER BYs —
        # compare both as-is AND sorted to spot ordering-only mismatches
        if o_rows == e_rows:
            print(f"PASS {name} ({len(o_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        if sorted(map(repr, o_rows)) == sorted(map(repr, e_rows)):
            print(f"WARN {name}: values match but ROW ORDER differs ({len(o_rows)} rows)")
            n_fail += 1
            continue
        diffs = [(i, o, e) for i, (o, e) in enumerate(zip(o_rows, e_rows)) if o != e]
        print(f"FAIL {name}: {len(diffs)}/{len(o_rows)} rows differ; first 3:")
        for i, o, e in diffs[:3]:
            print(f"  row {i}:\n    oracle={o}\n    engine={e}")
        n_fail += 1

    print(f"\n{n_pass} passed, {n_fail} failed / {len(oracles)} oracled queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--agghash" in sys.argv[3:]))
