"""Per-stage trace of the 528k full-loop protocol (VERDICT r4 #4).

The recorded BENCH/BASELINE §2 protocol shows full-loop local[32] SLOWER
than local[8] on this VM while the standalone data-plane chain at the
IDENTICAL volume (550x960 pages, page_weight=6) speeds up 1.6x at 32 —
so the inversion lives in something only the full loop runs.  This script
answers WHICH stage: it runs one full-loop iteration at the given
parallelism with the Spark UI's REST API enabled, then prints the top
stages by duration with task-time quantiles (median vs max → straggler
detection) and shuffle/input volumes, stage names carrying the callsite.

Usage: python scripts/trace_fullloop.py <cpus> [--quick]
Prints one JSON line; run at 8 and 32 back-to-back and diff the stage
tables.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4058


def _get(path: str):
    return json.load(urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}"))


def stage_table(top: int = 14) -> list[dict]:
    app_id = _get("/applications")[0]["id"]
    stages = _get(f"/applications/{app_id}/stages?status=complete&details=true")
    rows = []
    for s in stages:
        dur = s.get("executorRunTime", 0)
        site = next(
            (ln.strip() for ln in s.get("details", "").splitlines() if "feapder_spark" in ln),
            "",
        )
        rows.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:90],
                "site": site[-70:],
                "tasks": s.get("numCompleteTasks", 0),
                "run_ms": dur,
                "shuffle_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "attempt": s.get("attemptId", 0),
            }
        )
    rows.sort(key=lambda r: -r["run_ms"])
    rows = rows[:top]
    for r in rows:
        try:
            q = _get(
                f"/applications/{app_id}/stages/{r['stage']}/{r['attempt']}/taskSummary"
                "?quantiles=0.5,1.0"
            )
            med, mx = q["executorRunTime"]
            r["task_ms_med"] = round(med)
            r["task_ms_max"] = round(mx)
            r["skew"] = round(mx / max(1.0, med), 1)
        except Exception:
            pass
        r.pop("attempt", None)
    return rows


def main() -> None:
    cpus = int(sys.argv[1])
    quick = "--quick" in sys.argv
    from pyspark.sql import SparkSession

    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb
    from feapder_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
    spark = get_spark(
        f"trace_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.range(1_000_000).count()
    spark.range(max(8, cpus)).repartition(max(8, cpus)).mapInPandas(
        lambda it: it, "id LONG"
    ).count()

    n_hosts, pages_per_host = (200, 60) if quick else (550, 960)
    batch = 12_000 if quick else 528_000
    web = SyntheticWeb(
        n_hosts=n_hosts, pages_per_host=pages_per_host, seed=42, n_links=16,
        page_weight=3 if quick else 6,
    )
    seeds = [
        {"url": web.url(h, p), "priority": 300}
        for h in range(n_hosts)
        for p in range(pages_per_host)
    ]
    with tempfile.TemporaryDirectory() as wh:
        engine = CrawlEngine(spark, wh, web, CrawlConfig(batch_size=batch))
        engine.seed(seeds)
        t0 = time.time()
        stats = engine.run(max_iterations=1)
        wall = time.time() - t0
        table = stage_table()
        out = {
            "cpus": cpus,
            "wall_sec": round(wall, 2),
            "urls": sum(s.leased for s in stats),
            "stages": table,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
