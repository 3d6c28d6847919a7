import sys, math, os
sys.path.insert(0, "/root/repo")
os.chdir("/tmp")  # foreign cwd like the driver might use
import duckdb, pandas as pd
import __spark_entry__ as E
from htrc_ingester_spark.session import get_spark

SF = "/root/testdata/sf0.01"
spark = get_spark("gate", cores=8, shuffle_partitions=8)
qs, osql = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 6) if not math.isnan(v) else "nan")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)

fails = []
for name in sorted(qs):
    try:
        got = qs[name](spark, SF).toPandas()
        if name in osql:
            want = con.sql(osql[name]).df()
            ok = sorted(got.columns) == sorted(want.columns) and len(got) == len(want) and canon(got) == canon(want)
            status = "MATCH" if ok else "MISMATCH"
        else:
            status = f"rows-only({len(got)})"
            ok = True
    except Exception as e:
        status, ok = f"ERROR: {repr(e)[:100]}", False
    if not ok: fails.append(name)
    print(f"{name:32s} {status}", flush=True)
print("FAILS:", fails)
