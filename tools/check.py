#!/usr/bin/env python3
"""Local oracle harness mirroring the driver's t2 check: run Verify's parquet
dumps against DuckDB executions of oracle_sql.json over the same testdata.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [query ...]
"""
import duckdb, json, sys, glob, math
from decimal import Decimal
import pyarrow.parquet as pq

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    only = set(sys.argv[3:]) or None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            cur = con.sql(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f'FAIL {name}: ORACLE ERROR: {e}')
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(f'{out_dir}/{name}')
        except Exception as e:
            print(f'FAIL {name}: SPARK OUTPUT MISSING: {e}')
            n_fail += 1
            continue
        scols = tbl.column_names
        if sorted(scols) != sorted(ocols):
            print(f'FAIL {name}: COLUMNS spark={sorted(scols)} oracle={sorted(ocols)}')
            n_fail += 1
            continue
        srows = [tuple(r[c] for c in sorted(scols)) for r in tbl.to_pylist()]
        omap = [dict(zip(ocols, r)) for r in orows]
        orows2 = [tuple(r[c] for c in sorted(ocols)) for r in omap]
        if len(srows) != len(orows2):
            print(f'FAIL {name}: ROWS spark={len(srows)} oracle={len(orows2)}')
            n_fail += 1
            continue
        ordered_ok, detail = cmp_rows(srows, orows2)
        if ordered_ok:
            suffix = f' [{detail}]' if detail else ''
            print(f'PASS {name} ({len(srows)} rows){suffix}')
            n_pass += 1
        else:
            k = lambda row: tuple(str(x) for x in row)
            sorted_ok, detail2 = cmp_rows(sorted(srows, key=k), sorted(orows2, key=k))
            if sorted_ok:
                print(f'WARN {name}: order-only mismatch ({len(srows)} rows) — {detail}')
                n_pass += 1
            else:
                print(f'FAIL {name}: {detail2}')
                n_fail += 1
    print(f'== {n_pass} pass, {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)

def cmp_rows(a, b):
    max_float_diff = 0.0
    where = None
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (x, y) in enumerate(zip(ra, rb)):
            if x == y:
                continue
            if isinstance(x, bool) != isinstance(y, bool):
                return False, f'row {i} col {j}: bool-type {x!r} vs {y!r}'
            if isinstance(x, (int, float, Decimal)) and isinstance(y, (int, float, Decimal)):
                try:
                    d = abs(float(x) - float(y))
                except Exception:
                    return False, f'row {i} col {j}: {x!r} vs {y!r}'
                if d > 1e-9 * max(1.0, abs(float(x)), abs(float(y))):
                    return False, f'row {i} col {j}: {x!r} vs {y!r} (diff {d})'
                if d > max_float_diff:
                    max_float_diff = d
                    where = (i, j, x, y)
            else:
                return False, f'row {i} col {j}: {x!r} vs {y!r}'
    if where:
        return True, f'NOTE float residue {where} diff {max_float_diff}'
    return True, ''

if __name__ == '__main__':
    main()
