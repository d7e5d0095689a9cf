#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the raw parquet tables, and
compares: column names (sorted), row count, and a canonical value hash.
"""
import sys, os, json, hashlib, math

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float formatting; driver-style rounding safety
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    h = hashlib.sha256()
    lines = []
    for r in rows:
        lines.append("\x1f".join(canon(r[i]) for i in order))
    # sort rows too, so output ordering doesn't matter
    for ln in sorted(lines):
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # iterate the UNION of produced dirs, declared oracles, and failure
    # markers: a query that crashed (no output dir) must count as FAIL,
    # not silently drop out of the comparison
    present = {d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d))}
    failed_markers = {fn[:-len("._FAILED")] for fn in os.listdir(out_dir)
                      if fn.endswith("._FAILED")}
    names = sorted(present | failed_markers | set(oracles))
    n_pass = n_fail = n_weak = 0
    for name in names:
        if name not in present:
            reason = ("crashed: see marker" if name in failed_markers
                      else "no output produced")
            print(f"FAIL       {name}: {reason}")
            n_fail += 1
            continue
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            status = "WEAK" if len(s_rows) > 0 else "WEAK-EMPTY"
            n_weak += 1
            print(f"{status:10s} {name}: rows={len(s_rows)} (no oracle)")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols = list(o_rel.columns)
            o_types = [str(t) for t in o_rel.types]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        problems = []
        # pandas-lossy oracle output types: the DRIVER fetches via pandas,
        # where HUGEINT (DuckDB's sum(BIGINT) result) becomes float64 and
        # hash-mismatches Spark's long even when values are identical.
        # fetchall() here would hide that, so fail on the type itself.
        # (round-5 finding: q155/q159/q160/q161/q164/q181 all lost their
        # driver hash to exactly this; fix is CAST(... AS BIGINT).)
        lossy = [f"{c}:{t}" for c, t in zip(o_cols, o_types)
                 if t in ("HUGEINT", "UHUGEINT", "UBIGINT")
                 or t.startswith("DECIMAL")]
        if lossy:
            problems.append(
                "pandas-lossy oracle type(s) " + ",".join(lossy)
                + " - CAST to BIGINT/DOUBLE in the oracle SQL")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            hs, ho = table_hash(s_rows, s_cols), table_hash(o_rows, o_cols)
            if hs != ho:
                problems.append("hash mismatch")
                # show first differing row for debugging
                so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                sl = sorted("\x1f".join(canon(r[i]) for i in so) for r in s_rows)
                ol = sorted("\x1f".join(canon(r[i]) for i in oo) for r in o_rows)
                for a, b in zip(sl, ol):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
                        break
        if problems:
            n_fail += 1
            print(f"FAIL       {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"           {p}")
        else:
            n_pass += 1
            print(f"PASS       {name}: rows={len(s_rows)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak-checked ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
