#!/usr/bin/env python3
"""At-scale oracle check (VERDICT r12 #4): compare a Verify dump made
against a scaled corpus with DuckDB re-derivations over the SAME scaled
parquet, for every scale-path query (CATALOG.md: stress = yes) whose
oracle is a full recompute. Queries whose DuckDB side exceeds the time
or memory budget are recorded intractable-with-reason, not silently
dropped.

Usage: oracle_at_scale.py <sfDir> <verifyOut> <resultJson> [onlyQuery...]
"""
import duckdb, json, glob, os, re, sys, time

sf, vout, out = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4:])

# scale-path queries with full oracles, from the generated catalog
rows = {}
for line in open('CATALOG.md'):
    m = re.match(r'\| `(q_\w+)` \|.*', line)
    if not m:
        continue
    cells = [c.strip() for c in line.split('|')]
    name, oracle, stress = cells[1].strip('`'), cells[4], cells[5]
    if stress == 'yes' and oracle.startswith('full recompute'):
        rows[name] = oracle
if only:
    rows = {k: v for k, v in rows.items() if k in only}

con = duckdb.connect()
con.sql("SET memory_limit='48GB'")
con.sql("SET threads=32")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):  # Spark-written table: a directory of part files
        p = f'{p}/*.parquet'
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(f'{vout}/oracle_sql.json'))

res = {}
for name in sorted(rows):
    if name not in oracle:
        res[name] = {'status': 'no-oracle-entry'}
        continue
    pq = glob.glob(f'{vout}/{name}/*.parquet')
    if not pq:
        res[name] = {'status': 'no-spark-output'}
        print('MISS', name, flush=True)
        continue
    t0 = time.time()
    try:
        # read the WHOLE part-file glob (ADVICE r13): a multi-part Spark
        # dump at larger SF compared via pq[0] alone would flag a spurious
        # hash-mismatch on a partial read
        got = con.sql(f"SELECT * FROM '{vout}/{name}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
        got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            res[name] = {'status': 'schema-mismatch',
                         'spark': list(got.columns), 'oracle': list(exp.columns)}
        else:
            gs = got.astype(str).apply('|'.join, axis=1).sort_values() \
                .reset_index(drop=True)
            es = exp.astype(str).apply('|'.join, axis=1).sort_values() \
                .reset_index(drop=True)
            ok = bool(gs.equals(es))
            res[name] = {'status': 'green' if ok else 'hash-mismatch',
                         'rows': int(len(got)), 'oracle_rows': int(len(exp)),
                         'oracle_sec': round(time.time() - t0, 1)}
    except Exception as e:
        res[name] = {'status': 'intractable',
                     'reason': f'{type(e).__name__}: {str(e)[:160]}',
                     'oracle_sec': round(time.time() - t0, 1)}
    print(res[name]['status'].upper().ljust(15), name,
          res[name].get('rows', ''), flush=True)

greens = sum(1 for r in res.values() if r['status'] == 'green')
summary = {'sf_dir': sf, 'n_checked': len(res), 'n_green': greens,
           'n_red': sum(1 for r in res.values()
                        if r['status'] in ('hash-mismatch', 'schema-mismatch',
                                           'no-spark-output')),
           'n_intractable': sum(1 for r in res.values()
                                if r['status'] == 'intractable'),
           'queries': res}
json.dump(summary, open(out, 'w'), indent=1)
print(f"\n{greens}/{len(res)} green -> {out}")
