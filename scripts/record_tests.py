"""Run the full pytest suite and append a status line to results.jsonl.

VERDICT r1 item 10: record the suite's pass count each round so the judge
can audit health without a ~13-minute rerun. Runs on the CPU backend with
8 virtual devices (tests/conftest.py sets the env); sequence this AFTER any
TPU bench job — the host has one core and concurrent compiles stall both.
"""
from __future__ import annotations

import re
import subprocess
import sys
import time


def main() -> int:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    counts = dict(
        (kind, int(num))
        for num, kind in re.findall(r"(\d+) (passed|failed|error|skipped)", tail)
    )
    from benchmark_spgemm_using_csr_tpu.utils.results import write_result

    entry = {
        "metric": "pytest_suite",
        "summary": tail,
        "wall_s": round(time.time() - t0, 1),
        "rc": proc.returncode,
        **counts,
    }
    write_result("results.jsonl", entry)
    print(entry)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
