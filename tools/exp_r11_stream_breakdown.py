"""Round-11 measurement (r10 VERDICT task 7): where does the
Structured-Streaming stateful tail's wall go?

Wraps queries_streaming._drain to capture each micro-batch's
StreamingQueryProgress, then runs the heaviest stateful queries
(stream_outer_join, stream_stream_join, stream_stateful_profile) and
reports, per query: batch count, total trigger wall, and the summed
durationMs phases (addBatch = the actual work, walCommit/commitOffsets
= checkpoint I/O, queryPlanning, getBatch) plus state-store commit
time — separating irreducible micro-batch machinery from plan work.
Pure measurement: the declared queries are untouched.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from db_migration_spark import queries_streaming as QS
    from db_migration_spark.session import get_spark

    spark = get_spark("exp-r11-streambd")
    spark.sparkContext.setLogLevel("ERROR")

    captured: list = []
    orig = QS._drain

    def capturing_drain(df, name, mode):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        captured.extend(json.loads(p.json) for p in q.recentProgress)

    QS._drain = capturing_drain
    out = {"exp": "stream_stateful_breakdown", "sf_dir": SF_DIR, "queries": {}}
    try:
        for qname in (
            "stream_outer_join",
            "stream_stream_join",
            "stream_stateful_profile",
        ):
            fn = getattr(QS, f"q_{qname}", None)
            if fn is None:
                continue
            captured.clear()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 2)
            phases: dict = {}
            state = {"commitTimeMs": 0, "numRowsTotal": 0}
            for p in captured:
                for k, v in (p.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0) + v
                for so in p.get("stateOperators") or []:
                    state["commitTimeMs"] += so.get("commitTimeMs", 0) or 0
                    state["numRowsTotal"] = max(
                        state["numRowsTotal"], so.get("numRowsTotal", 0) or 0
                    )
            out["queries"][qname] = {
                "wall_sec": wall,
                "micro_batches": len(captured),
                "durationMs_summed": phases,
                "state": state,
            }
    finally:
        QS._drain = orig
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
