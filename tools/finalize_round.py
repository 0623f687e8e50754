"""End-of-round finalization in one step — the automation the round-4
and round-5 verdicts asked for after the final artifacts were left
uncommitted twice.

Runs, in order:

1. full pytest (fails fast if red),
2. full-catalog local gate -> CORRECTNESS_LOCAL.json,
3. the bench at the round SF -> BENCH_LOCAL.json (quiet-window rule:
   nothing else should run concurrently; the gate above has finished
   before the bench starts),
4. ``git add`` of every round artifact + a commit.

Usage:
    python tools/finalize_round.py            # pytest + gate + bench + commit
    python tools/finalize_round.py --no-bench # skip the bench re-run
    python tools/finalize_round.py --no-test  # skip pytest (already green)

Environment: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_BENCH_RUNS pass through
to bench.py.  Total wall time with defaults is ~12-15 min (400 s tests,
~190 s gate, ~2x190 s bench) — run it detached.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = [
    "CORRECTNESS_LOCAL.json",
    "BENCH_FINAL.json",
]
# round artifacts the driver writes (committed when present, any round)
DRIVER_GLOBS = ["BENCH_r", "CORRECTNESS_r", "VERDICT", "ADVICE", "COPYCHECK",
                "LEAKCHECK", "PROGRESS"]


def run(cmd: list[str], **kw) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True, **kw)


def main() -> None:
    args = set(sys.argv[1:])
    # no-dark-operator rule (round-7 verdict: the end-of-round snapshot
    # swept 1,392 unwired lines into main) — fail the finalize BEFORE
    # spending 15 min on tests/gate/bench.  pytest re-checks it too
    # (tests/test_catalog.py), but this pre-check survives --no-test.
    sys.path.insert(0, REPO)
    from timeseriesutils_spark.queries.governance import find_dark_operators

    dark = find_dark_operators()
    if dark:
        print("finalize: DARK twin-pair operators (wire a query or add "
              f"to governance.WIP_ALLOWLIST): {dark}", file=sys.stderr)
        sys.exit(1)
    # round-10 structural rules (VERDICT r9 items 1 & 3): every catalog
    # query must have a SURVEY.md mention, and every never-driver-
    # verified query must sit inside the catalog head-50 so the next
    # driver gate sees it.  pytest re-checks both; these survive --no-test.
    from timeseriesutils_spark.queries.governance import (
        find_unrotated_queries,
        find_unsurveyed_queries,
    )

    unsurveyed = find_unsurveyed_queries()
    if unsurveyed:
        print(f"finalize: catalog queries with no SURVEY.md row: "
              f"{unsurveyed}", file=sys.stderr)
        sys.exit(1)
    unrotated = find_unrotated_queries()
    if unrotated:
        print("finalize: never-driver-verified queries OUTSIDE the "
              f"catalog head-50: {unrotated}", file=sys.stderr)
        sys.exit(1)
    if "--no-test" not in args:
        run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gate_sf = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    run([sys.executable, "tools/check_oracle.py", "--json",
         "CORRECTNESS_LOCAL.json", gate_sf])
    # gate-record rule (round-8 verdict: 13 queries entered main with
    # no CORRECTNESS row anywhere, two of them broken): after the
    # refresh, EVERY cataloged query must have a clean row — a crashed
    # or partial sweep fails the finalize here
    from timeseriesutils_spark.queries.governance import find_ungated_queries

    ungated = find_ungated_queries()
    if ungated:
        print("finalize: UNGATED catalog queries (no clean row in "
              f"CORRECTNESS_LOCAL.json): {ungated}", file=sys.stderr)
        sys.exit(1)
    if "--no-bench" not in args:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        # quiet-window gating (VERDICT r13 #8: BENCH_r13 ran at loadavg
        # 4.3 with 71 pollution re-runs while a cleaner window existed):
        # wait up to ~10 min for 1-min loadavg to drop below the
        # threshold, then — if the finished map still shows a polluted
        # window (> 30 pollution re-runs) — re-run the bench ONCE and
        # keep the quieter map (fewer re-runs wins).
        import json
        import time

        for _ in range(20):
            try:
                if os.getloadavg()[0] < 2.0:
                    break
            except OSError:
                break
            print("finalize: loadavg "
                  f"{os.getloadavg()[0]:.1f} >= 2.0 — waiting 30 s "
                  "for a quiet bench window", flush=True)
            time.sleep(30)
        run([sys.executable, "bench.py"], env=env)
        bl = os.path.join(REPO, "BENCH_LOCAL.json")

        def _reruns(p):
            try:
                with open(p) as f:
                    return int(json.load(f).get("pollution_reruns", 0))
            except Exception:
                return 0

        first = _reruns(bl)
        if first > 30:
            print(f"finalize: polluted bench window ({first} pollution "
                  "re-runs) — one retry", flush=True)
            import shutil as _sh

            _sh.copyfile(bl, bl + ".try1")
            run([sys.executable, "bench.py"], env=env)
            if _reruns(bl) > first:
                _sh.copyfile(bl + ".try1", bl)  # first window was quieter
            os.remove(bl + ".try1")
    # BENCH_LOCAL.json is gitignored (r11: the DRIVER re-runs bench.py
    # after the final commit and its overwrite left two rounds ending
    # with a dirty tree) — the finalizer snapshots the quiet-window map
    # to the TRACKED BENCH_FINAL.json instead.
    bl = os.path.join(REPO, "BENCH_LOCAL.json")
    if os.path.exists(bl):
        import shutil

        shutil.copyfile(bl, os.path.join(REPO, "BENCH_FINAL.json"))
    to_add = list(ARTIFACTS)
    for f in sorted(os.listdir(REPO)):
        if any(f.startswith(g) for g in DRIVER_GLOBS):
            to_add.append(f)
    # Stage ONLY the round artifacts — `git add -A` would silently
    # sweep unrelated WIP into the finalize commit (round-6 ADVICE).
    # Skip gitignored artifacts (COPYCHECK/LEAKCHECK/PROGRESS are
    # driver-written but ignored): explicit ignored paths fail git add.
    stage = []
    for f in to_add:
        if not os.path.exists(os.path.join(REPO, f)):
            continue
        ignored = subprocess.run(
            ["git", "check-ignore", "-q", f], cwd=REPO
        ).returncode == 0
        if not ignored:
            stage.append(f)
    run(["git", "add", "--"] + stage)
    st = subprocess.run(["git", "diff", "--cached", "--name-only"], cwd=REPO,
                        capture_output=True, text=True).stdout.strip()
    if not st:
        print("finalize: no artifact changed, nothing to commit")
        return
    run(["git", "commit", "-m",
         "Finalize round artifacts: local gate + bench refresh\n\n"
         "No-Verification-Needed: artifact-only refresh produced by the "
         "verify gate itself"])
    print("finalize: done")


if __name__ == "__main__":
    main()
