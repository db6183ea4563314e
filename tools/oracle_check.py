#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against views over the sf_dir
parquet tables, and compares: column names (sorted), row count, and a hash
of all values (rows sorted canonically, columns sorted by name).
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


# Output-column types every oracle mirror may produce. HUGEINT (DuckDB's
# untyped window-sum / 128-bit product result) and DECIMAL serialize
# differently across DuckDB versions at the driver's hash boundary — the
# km_retention/nelson_aalen r10-r11 red rows were the only two HUGEINT
# outputs in 264 mirrors. Cast window sums ::BIGINT and decimals ::DOUBLE.
TYPE_WHITELIST = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def lint_types(con, oracle):
    """DESCRIBE every mirror; fail on any non-whitelisted output type."""
    bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"LINT FAIL {name}: describe error: {str(e)[:150]}")
            bad += 1
            continue
        offenders = [(c, t) for c, t, *_ in desc if t not in TYPE_WHITELIST]
        if offenders:
            print(f"LINT FAIL {name}: non-portable output types {offenders}")
            bad += 1
    print(f"== type lint: {len(oracle) - bad} ok, {bad} fail ==")
    return bad


def make_con(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(outdir, sfdir):
    # The oracle's CASE/COALESCE type resolution is engine-version
    # sensitive (bare DECIMAL literals); record the replica version so a
    # hash mismatch is diagnosable from the artifact. Pinned: 1.0.0.
    print(f"== duckdb {duckdb.__version__} ==")
    con = make_con(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    fail += lint_types(con, oracle)
    for name in sorted(oracle):
        d = os.path.join(outdir, name)
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  fail += 1; continue
        import pyarrow as pa
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        scols = spark_tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in spark_tbl.to_pylist()]
        try:
            res = con.execute(oracle[name])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            fail += 1; continue
        hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sl = sorted("\x01".join(canon(r[i]) for i in order) for r in srows)
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dl = sorted("\x01".join(canon(r[i]) for i in dorder) for r in drows)
            shown = 0
            for a, b in zip(sl, dl):
                if a != b and shown < 3:
                    print(f"  spark: {a[:200]}\n  duck : {b[:200]}")
                    shown += 1
            fail += 1; continue
        print(f"OK   {name} ({len(srows)} rows)")
        ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    return 1 if fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--lint":
        # Standalone: python3 tools/oracle_check.py --lint <oracle_sql.json> <sf_dir>
        print(f"== duckdb {duckdb.__version__} ==")
        sys.exit(1 if lint_types(make_con(sys.argv[3]),
                                 json.load(open(sys.argv[2]))) else 0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
