"""Run the slow statistical-parity suite and commit-ready PARITY artifact.

Runs ``pytest -m slow`` (CPU, same conftest as CI) with per-test JUnit
timings and the ``BSSM_PARITY_OUT`` measurement hook (tests/parity_record.py),
then merges both into ``PARITY_r0N.json``: one row per parity test with
outcome, runtime, the measured posterior quantities, and the reference
targets/tolerances they were asserted against (BASELINE.md anchors).

Usage:  python benchmarks/parity_run.py [round_number]
"""
import json
import os
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(round_no: int) -> None:
    fd, measured_path = tempfile.mkstemp(suffix=".jsonl")
    os.close(fd)
    junit_path = measured_path + ".xml"
    env = dict(os.environ, BSSM_PARITY_OUT=measured_path)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "slow", "-q",
         "-p", "no:cacheprovider", f"--junitxml={junit_path}"],
        cwd=REPO, env=env)
    wall = time.time() - t0

    measured = {}
    if os.path.exists(measured_path):
        with open(measured_path) as fh:
            for line in fh:
                row = json.loads(line)
                measured[row["test"]] = row

    rows = []
    tree = ET.parse(junit_path)
    for case in tree.iter("testcase"):
        name = case.get("name")
        outcome = "passed"
        if case.find("failure") is not None:
            outcome = "failed"
        elif case.find("error") is not None:
            outcome = "error"
        elif case.find("skipped") is not None:
            outcome = "skipped"
        short = name.removeprefix("test_")
        rec = measured.get(short, {})
        rows.append({
            "test": name, "outcome": outcome,
            "runtime_s": round(float(case.get("time", 0.0)), 1),
            "measured": rec.get("measured"),
            "targets": rec.get("targets"),
        })

    artifact = {
        "round": round_no,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "suite": "pytest -m slow (CPU, x64, 8 virtual devices)",
        "wall_s": round(wall, 1),
        "all_passed": proc.returncode == 0,
        "tests": rows,
    }
    out_path = os.path.join(REPO, f"PARITY_r{round_no:02d}.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out_path} (all_passed={artifact['all_passed']})")
    os.unlink(measured_path)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
