"""Round-14 driver-side profiler: run one query's full bench episode
(build + noop exec) under cProfile and print the top cumulative-time
Python frames — separates driver-side Python work (tmp clones, manifest
assembly, pure-Python bloom builds, py4j waits) from executor work.

Usage: python plans/r15/profile_driver_side.py <query> [<query> ...]
Not part of the engine; a measurement tool committed for judge review.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from aws_flight_data_pipeline_spark.functions.caching import release_tracked
from aws_flight_data_pipeline_spark.plans.registry import _ensure_loaded, resolve
from aws_flight_data_pipeline_spark.session import get_spark


def main(names: list[str]) -> None:
    _ensure_loaded()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("afdp-r15-driver-profile")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"r15-driver-profile: {name}")

        def episode() -> None:
            resolve(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        episode()  # warm-up (ensure-state, JIT, FS cache)
        release_tracked()
        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        episode()
        prof.disable()
        wall = time.perf_counter() - t0
        release_tracked()
        buf = io.StringIO()
        st = pstats.Stats(prof, stream=buf)
        st.sort_stats("cumulative").print_stats(40)
        print(f"\n===== {name}: wall {wall:.2f}s =====")
        print(buf.getvalue())


if __name__ == "__main__":
    main(sys.argv[1:])
