"""Ad-hoc per-query timing (noop sink, guide §1.4) — NOT the official
bench (bench.py is frozen for measurement). Usage:
    python bench_extra.py <query> [<query> ...]    # 3 interleaved reps
Env: SPARK_GRAFT_SF_DIR (default sf1.0 for optimization work),
     SPARK_GRAFT_CPUS, BENCH_REPS."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def main():
    from nebula_spark.session import get_spark
    import __spark_entry__ as entry
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    spark = get_spark("bench-extra", parallelism=cpus)
    qs = entry.queries()
    names = sys.argv[1:] or list(qs)
    rounds = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            rounds[n].append(round(time.time() - t0, 3))
    print(json.dumps({n: {"best": min(ts), "rounds": ts} for n, ts in rounds.items()}))

if __name__ == "__main__":
    main()
