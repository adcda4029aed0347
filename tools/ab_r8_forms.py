"""Round-11 watch-item adjudication (r10 verdict directive #2):
interleaved same-process min-of-3 A/B of the two watch rows against
their r8 forms.

- theil_sen_trend: the only code its path gained since r8 is the
  rank device's mixed-NULL tie cascade (commits 23c468b + 2c2ca24,
  r9). This script loads the r8 rankdev module STRAIGHT FROM GIT
  (git show <r8>:...rankdev.py), monkeypatches its
  grouped_row_number into the query's import site, and interleaves
  r8-form vs current-form executions round-robin in ONE process so a
  load burst hits both equally. Result equality is asserted first
  (collected rows bit-compared) — the A/B times two implementations
  of the same answer.
- betweenness_sampled: its query + centrality kernel are untouched
  since r8 (the r9 diff to adjacent.py only re-keys a plan memo), so
  there is no alternative form to run; it interleaves against the
  CONTROLS and its quiet-box r8 baseline instead — the creep the
  verdict flagged (2.67->2.96->3.23s officials) is adjudicated
  box-vs-code by where the quiet-box min lands.

Usage: python tools/ab_r8_forms.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kg_etl_spark.operators import rankdev as rankdev_current  # noqa: E402
from kg_etl_spark.queries import QUERIES  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

R8_COMMIT = "07a727d"  # "round 8: verdict/advice/correctness/bench"
CONTROLS = ["gopher_quality", "exact_dedup", "char_entropy"]
ROUNDS = 3


def load_r8_rankdev():
    src = subprocess.check_output(
        ["git", "show", f"{R8_COMMIT}:kg_etl_spark/operators/rankdev.py"],
        cwd=REPO,
        text=True,
    )
    path = os.path.join(tempfile.mkdtemp(prefix="ab_r8_"), "rankdev_r8.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("rankdev_r8", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-r8-forms")
    r8 = load_r8_rankdev()
    current_grn = rankdev_current.grouped_row_number
    variants = {"current": current_grn, "r8": r8.grouped_row_number}

    def run_theil(form: str) -> "list":
        rankdev_current.grouped_row_number = variants[form]
        try:
            return QUERIES["theil_sen_trend"](spark, sf_dir).collect()
        finally:
            rankdev_current.grouped_row_number = current_grn

    # result equality first: the two forms must be the same answer
    rows = {f: sorted(map(tuple, run_theil(f))) for f in variants}
    assert rows["current"] == rows["r8"], "r8/current theil_sen results differ!"
    print(f"# theil_sen_trend r8-vs-current results IDENTICAL "
          f"({len(rows['current'])} rows)", flush=True)

    # warm the non-theil legs
    QUERIES["betweenness_sampled"](spark, sf_dir).count()
    for c in CONTROLS:
        QUERIES[c](spark, sf_dir).count()

    load0 = os.getloadavg()[0]
    best: dict[str, float] = {}

    def timed(tag: str, fn) -> None:
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best[tag] = min(best.get(tag, dt), dt)

    for rnd in range(ROUNDS):
        # ALTERNATE which form runs first each round: a fixed order
        # hands the second form the JVM/GC state the first one paid
        # for — measured as a spurious ~1.5x on this box (r11: the
        # same pair flipped sign when the order flipped)
        forms = list(variants)
        if rnd % 2:
            forms.reverse()
        for form in forms:
            timed(f"theil_sen_trend[{form}]",
                  lambda f=form: run_theil(f))
        timed("betweenness_sampled",
              lambda: QUERIES["betweenness_sampled"](spark, sf_dir).count())
        for c in CONTROLS:
            timed(c, lambda q=c: QUERIES[q](spark, sf_dir).count())

    load1 = os.getloadavg()[0]
    print(f"# load_1m start={load0:.2f} end={load1:.2f} rounds={ROUNDS}")
    for tag, t in best.items():
        print(f"{tag}: {t:.3f}s")


if __name__ == "__main__":
    main()
