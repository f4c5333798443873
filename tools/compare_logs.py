#!/usr/bin/env python3
"""Numerically compare two regression-test logs.

Same contract as the reference's ``tools/compare_logs.py``: loads both logs
with numpy and compares with np.isclose(rtol=1e-5, atol=1e-8); exits
non-zero and prints the first mismatching columns on failure.
"""

import argparse
import sys

import numpy as np


def compare(f_a: str, f_b: str, rtol: float = 1e-5, atol: float = 1e-8,
            verbose: bool = True) -> bool:
    with open(f_a) as f:
        header_a = f.readline().split()
    with open(f_b) as f:
        header_b = f.readline().split()
    a = np.loadtxt(f_a, skiprows=1, ndmin=2)
    b = np.loadtxt(f_b, skiprows=1, ndmin=2)
    if header_a != header_b:
        if verbose:
            print(f"FAILED: headers differ:\n  {header_a}\n  {header_b}")
        return False
    if a.shape != b.shape:
        if verbose:
            print(f"FAILED: shapes differ: {a.shape} vs {b.shape}")
        return False
    ok = np.isclose(a, b, rtol=rtol, atol=atol)
    if ok.all():
        return True
    if verbose:
        bad = np.argwhere(~ok)
        print(f"FAILED: {len(bad)} of {a.size} entries differ")
        for r, c in bad[:10]:
            print(f"  row {r} col {c} ({header_a[c]}): "
                  f"{a[r, c]:.8E} vs {b[r, c]:.8E}")
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log_a")
    p.add_argument("log_b")
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--atol", type=float, default=1e-8)
    args = p.parse_args()
    if compare(args.log_a, args.log_b, args.rtol, args.atol):
        print("PASSED")
        sys.exit(0)
    sys.exit(1)


if __name__ == "__main__":
    main()
