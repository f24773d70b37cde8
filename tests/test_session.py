"""Session-factory pins (round 17).

The driver-heap pre-touch (-Xms = spark.driver.memory plus
-XX:+AlwaysPreTouch) is a measured optimization, not a tuning whim:
without it G1 grows the heap lazily and touches freshly-committed pages
MID-QUERY, and on this guest those first-touch faults stall hard
(SCALING.md r17 "pentagon slow mode" — slow runs showed 35-50% guest sys
time and 12-18 s of summed GC in the 32-task pre-stage; with pre-touch
the same probe records 0.0-0.6 s GC and the GC-fault slow mode is gone).
Pin the conf so a refactor that drops it fails a test instead of
resurfacing as unexplained bench variance."""

import os


def test_driver_heap_pretouch_conf(spark):
    if os.environ.get("SPARK_GRAFT_PRETOUCH", "1") == "0":
        import pytest

        pytest.skip("pre-touch disabled via SPARK_GRAFT_PRETOUCH=0")
    opts = spark.conf.get("spark.driver.extraJavaOptions")
    assert "-XX:+AlwaysPreTouch" in opts
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    assert f"-Xms{mem}" in opts
