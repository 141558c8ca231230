import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
qs = E.queries()
sf = "/root/testdata/sf0.001"
rows = []
for name, fn in qs.items():
    try:
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        top = plan.splitlines()[0]
        has_sort = top.startswith("Sort") or top.startswith("GlobalLimit") or "Sort [" in plan.splitlines()[0]
        first_col = df.columns[0]
        n = df.count()
        nd = df.select(first_col).distinct().count()
        rows.append((name, has_sort, n, nd, first_col))
    except Exception as e:
        rows.append((name, None, None, None, f"ERR {type(e).__name__}: {e}"[:80]))
for r in rows:
    name, has_sort, n, nd, fc = r
    flag = ""
    if has_sort is False and n and nd and nd < n:
        flag = "  <<< TIED, NO SORT"
    print(f"{name:28s} sort={has_sort} rows={n} distinct_first={nd} first={fc}{flag}")
spark.stop()
