#!/usr/bin/env python3
"""Run the full golden-regression suite and emit the parity table.

The analog of the reference's ``run_test.sh``: runs every case in
``tests/golden_cases.py`` against the committed reference goldens and
prints a markdown table (the source of the README parity section), so no
parity claim exists without a reproducing run.

Usage:
    python tools/run_golden_suite.py [case ...] [--out DIR]
"""

import argparse
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="*", help="subset of case names")
    ap.add_argument("--out", default=None, help="output directory")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from golden_cases import CASES, run_and_compare

    cases = [c for c in CASES
             if not args.cases or c["case"] in args.cases]
    out_root = args.out or tempfile.mkdtemp(prefix="golden_suite_")
    rows = []
    for c in cases:
        d = os.path.join(out_root, c["case"])
        os.makedirs(d, exist_ok=True)
        t0 = time.time()
        try:
            n, bad_ref, bad_loose, shape_ok = run_and_compare(c, d)
            wall = time.time() - t0
            if not shape_ok:
                status = "FAIL (row count)"
            elif bad_ref == 0:
                status = "full pass"
            elif bad_loose == 0 and bad_ref <= c["max_bad"]:
                status = (f"{n - bad_ref}/{n} entries "
                          f"(rest within rtol {c['rtol_all']:g})")
            else:
                status = f"FAIL ({bad_ref}/{n} beyond rtol 1e-5)"
            known = f" [known open: {c['xfail']}]" if c["xfail"] else ""
            rows.append((c["case"], status + known, wall))
            print(f"{c['case']:38s} {status:40s} ({wall:.0f} s)",
                  flush=True)
        except Exception:
            wall = time.time() - t0
            rows.append((c["case"], "ERROR", wall))
            traceback.print_exc()
            print(f"{c['case']:38s} ERROR ({wall:.0f} s)", flush=True)

    print("\n## README parity table (markdown)\n")
    print("| case | result |")
    print("|---|---|")
    for name, status, _ in rows:
        print(f"| {name} | {status} |")
    print(f"\noutputs in {out_root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
