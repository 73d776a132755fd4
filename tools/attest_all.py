"""Round-close attestation in ONE command (VERDICT-r6 #6): run the
driver-faithful correctness gate over the ENTIRE catalog at BOTH
sf0.01 and sf0.1 — no per-entry exceptions, no split runs — and print
one summary line per SF plus a combined verdict.

Each SF runs as a fresh subprocess of tools/check_correctness.py so
the two sweeps cannot share session state (the same isolation the
driver has), and the exit code is nonzero if ANY entry fails at ANY
SF.

Usage: python tools/attest_all.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    summaries: list[tuple[str, str, int]] = []
    for sf in sf_dirs:
        proc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "check_correctness.py"), sf],
            capture_output=True,
            text=True,
        )
        tail = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        summary = tail[-1] if tail else "(no output)"
        # surface per-entry FAIL lines immediately
        for ln in tail:
            if ln.startswith("FAIL"):
                print(f"[{sf}] {ln}")
        print(f"[{sf}] {summary}")
        m = re.match(r"(\d+) pass, (\d+) fail, (\d+) rows-only", summary)
        fails = int(m.group(2)) if m else 1
        if proc.returncode != 0 and fails == 0:
            fails = 1  # crashed sweep counts as failure
        summaries.append((sf, summary, fails))
    total_fails = sum(f for _, _, f in summaries)
    verdict = "ATTESTED" if total_fails == 0 else "FAILED"
    print(
        f"{verdict}: "
        + "; ".join(f"{os.path.basename(sf.rstrip('/'))} -> {s}" for sf, s, _ in summaries)
    )
    return 1 if total_fails else 0


if __name__ == "__main__":
    sys.exit(main())
