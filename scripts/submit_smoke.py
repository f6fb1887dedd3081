"""spark-submit smoke job: a tiny end-to-end crawl, package FROM THE ZIP.

Run (see tests/test_spark_submit.py for the asserted form)::

    spark-submit --master local[2] \
        --py-files dist/inform_spark.zip scripts/submit_smoke.py

The job imports ``inform_spark`` (provided by --py-files, NOT the repo
checkout — the test runs it from an empty cwd to prove it), crawls the
deterministic 2-host synthetic web, and prints one JSON line with the
summary counters. Exit 0 iff pages were fetched and the span invariant
holds.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    import inform_spark  # from --py-files zip

    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.sources.pages import pages_dataframe, robots_dataframe

    spark = (
        SparkSession.builder.appName("inform-spark-submit-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    pages = pages_dataframe(spark, 2, 12)
    robots = robots_dataframe(spark, 2)
    cfg = CrawlConfig(
        seeds=["https://site0.test/", "https://site1.test/"],
        limit=20,
        use_bloom=True,
    )
    ck = tempfile.mkdtemp(prefix="submit-smoke-ck-")
    eng = CrawlEngine(spark, pages, robots, cfg, checkpoint_dir=ck)
    summary = eng.run()
    docs = eng.documents()
    n_docs = docs.count()
    n_spans = docs.selectExpr("sum(size(spans)) as n").collect()[0]["n"]
    print(
        json.dumps(
            {
                "pkg": inform_spark.__file__,
                "attempted": summary.attempted,
                "ok": summary.ok,
                "documents": n_docs,
                "spans": int(n_spans or 0),
            }
        )
    )
    spark.stop()
    return 0 if summary.ok > 0 and n_docs > 0 and (n_spans or 0) > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
