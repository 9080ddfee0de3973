"""Full-precision float diff sweep: catches values that agree at %.6g
but differ in raw repr — latent driver reds if the driver's comparator
keeps more digits (the customer_cohort_ltv r5 class: a half-cent
rounding tie invisible to the local gate's 6-significant-digit
canonicalization).

Usage: python tools/float_sweep.py <query> ...
Run at round 6 over all 94 never-driver-checked entries: ALL BIT-EXACT.
"""
import os, sys, math, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import __spark_entry__ as entry
from bigdata_tag_system_spark import get_spark

SF = "/root/testdata/sf0.01"
NAMES = sys.argv[1:]
spark = get_spark(app_name="floatsweep")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
qs, oracles = entry._build_queries(), entry.oracle_sql()

def canonkey(row, order):
    # primary key canonicalizes floats at %.6g (matches the gate's view
    # of "the same row" on both sides); the FULL-precision repr is a
    # tiebreak so two rows that tie at 6 sig digits but differ in raw
    # value still sort identically on both sides — without it the zip
    # could misalign exactly the rows this sweep exists to catch
    coarse, fine = [], []
    for i in order:
        v = row[i]
        if isinstance(v, float):
            coarse.append(f"{v:.6g}")
            fine.append(repr(v))
        else:
            coarse.append(str(v))
            fine.append(str(v))
    return ("|".join(coarse), "|".join(fine))

for name in NAMES:
    if name not in oracles: 
        print(f"{name}: rows-only, skip"); continue
    try:
        df = qs[name](spark, SF)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as ex:
        print(f"{name}: ERR {str(ex)[:120]}"); continue
    if len(srows)!=len(orows):
        print(f"{name}: ROWCOUNT {len(srows)} vs {len(orows)}"); continue
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    s_sorted = sorted(srows, key=lambda r: canonkey(r, so))
    o_sorted = sorted(orows, key=lambda r: canonkey(r, oo))
    worst = 0.0; worst_where = None; exact_mismatch = 0
    for sr, orow in zip(s_sorted, o_sorted):
        for si, oi in zip(so, oo):
            a, b = sr[si], orow[oi]
            if isinstance(a, float) and isinstance(b, (int,float)):
                b = float(b)
                if math.isnan(a) and math.isnan(b): continue
                if a != b:
                    exact_mismatch += 1
                    d = abs(a-b)/max(abs(a),abs(b),1e-300)
                    if d > worst:
                        worst = d; worst_where = (scols[si], a, b)
    if exact_mismatch:
        print(f"{name}: {exact_mismatch} float cells differ raw; worst rel {worst:.2e} at {worst_where}")
    else:
        print(f"{name}: bit-exact")
