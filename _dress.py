from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e, duckdb, sys, traceback
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
sys.path.insert(0, "tests")
from conftest import assert_frames_match
names = list(qs)[:50]
bad = []
for name in names:
    try:
        spdf = qs[name](spark, sf).toPandas()
        if name in osql:
            assert_frames_match(spdf, con.execute(osql[name]).fetchdf(), name)
            print(name, "MATCH", len(spdf))
        else:
            print(name, "ROWS-ONLY", len(spdf))
    except Exception as ex:
        bad.append(name)
        print(name, "FAIL", repr(ex)[:200])
print("BAD:", bad)
