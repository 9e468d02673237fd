"""ANSI-mode full-execution sweep over the whole registry (r14;
VERDICT r13 "Next round" #7).

Context: Spark 4 defaults ``spark.sql.ansi.enabled=true``, so every
session this engine builds — tests, bench, the driver's gate — already
runs ANSI semantics (overflow/div-by-zero/invalid-cast RAISE instead
of returning null). The r12 waterfilling div-by-zero nevertheless hid
for a round because a lazily-evaluated CASE guarded the throwing
branch on the data at hand: PLANNING a query under ANSI proves
nothing, and even executing it at one SF only proves the branches that
data reaches. This sweep is the standing instrument for the class:

- asserts the session really is ANSI (fails loudly if a future config
  change turns it off — the sweep's guarantee would silently vanish);
- EXECUTES every registered builder end-to-end through the noop sink
  at the given SF (all partitions, all branches the data reaches —
  not .explain, not .limit);
- prints one line per failure with the ANSI error class, exits 1 on
  any failure, 0 on a clean sweep.

Usage: python tools/ansi_sweep.py [sf_dir]   (default sf0.001)

Recorded result (r14, sf0.001 AND sf0.01): zero failures — see
NOTES.md round-14 log.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="ansi-sweep",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # a real raise, not assert: python -O strips asserts, and a sweep
    # that silently ran non-ANSI would record a guarantee it never
    # checked (the load_all()/ADVICE r8 convention)
    if spark.conf.get("spark.sql.ansi.enabled") != "true":
        raise RuntimeError("session is not ANSI — the sweep would prove nothing")
    specs = load_all()
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for name, spec in specs.items():
        try:
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001 - report every class
            failures.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))
            print(f"FAIL {name}: {failures[-1][1]}")
    wall = round(time.time() - t0, 1)
    print(
        f"-- ansi sweep: {len(failures)} failed of {len(specs)} "
        f"at {sf_dir} in {wall}s (ansi.enabled=true)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
